package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{FeeExpr, GraftFunctions, WeightedAvg}

/** Scalar-function, UDF/UDAF/UDTF, and text-statistics surface
  * (SURVEY.md §2B rows q_scalar_*, q_udf_scalar, q_agg_custom_typed,
  * q_udtf_explode, q_text_stats).
  *
  * Everything here is built from codegen'd built-in functions or native
  * Catalyst expressions — no Scala closures in the hot path. JSON access is
  * deliberately dynamic (`get_json_object`) to mirror the reference's
  * schemaless `.get(key)` style (script-dag-dock-report:74).
  */
object Scalars {
  import Det._

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** q_scalar_string — string kernel over documents.text. */
  def scalarString(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("len"),
        lower(substring(col("text"), 1, 24)).as("prefix24"),
        upper(regexp_extract(col("text"), "^(\\w+)", 1)).as("first_word"),
        col("text").like("%data%").as("has_data"),
        size(split(col("text"), " ")).as("n_ws_tokens"))
      .orderBy("doc_id")

  /** q_scalar_datetime — the reference's date arithmetic surface
    * (yesterday-window + ISO formatting, script-dag-dock-report:59).
    */
  def scalarDatetime(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"),
        date_sub(col("o_orderdate").cast("date"), 1).as("yesterday"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"))
      .orderBy("o_orderkey")

  /** q_scalar_math — math kernel; sqrt is IEEE-exact, log is rounded through
    * [[Det.r]] because libm implementations may differ in the last ulp.
    */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r(col("l_extendedprice"), 1).as("price_r1"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        r(log(col("l_extendedprice")), 6).as("ln_price"),
        floor(col("l_tax") * 100).as("tax_pct_floor"),
        ceil(col("l_tax") * 100).as("tax_pct_ceil"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q_scalar_json — dynamic JSON field extraction from events.props
    * (mirrors the reference's `.get("ticket")`-style access with null-check
    * fail-fast semantics, script-dag-dock-report:73-76).
    */
  def scalarJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
      .orderBy("event_id")

  /** q_scalar_variant — Spark 4's VARIANT type over the JSON payload
    * column: `parse_json` builds the binary semi-structured value once,
    * `variant_get` extracts a typed path, and `schema_of_variant` reports
    * the inferred shape — the open-schema ingestion path for payloads
    * whose structure drifts (the reference's REST responses are exactly
    * such dynamic JSON, script-dag-dock-report:73-76). Against per-query
    * `get_json_object` string re-parsing (`q_scalar_json`), VARIANT parses
    * once into a binary encoding that repeated typed extractions then
    * read without re-tokenizing — the 100 TB difference for payloads
    * queried by many fields. The aggregate pins both the extracted values
    * and the inferred schema string, oracle-checked via DuckDB's JSON
    * extraction.
    */
  def scalarVariant(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("schema_of_variant(v)").as("vschema"))
      .groupBy("event_type", "vschema")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type", "vschema")

  /** q_scalar_array — higher-order functions over embeddings.embedding.
    * Both engines left-fold the aggregate lambda, so the float→double sums
    * are bit-identical without rounding. Array-valued outputs are emitted as
    * integer-scaled string signatures (round(x*1e6)→bigint, comma-joined):
    * the driver's pandas comparator sorts rows by every column and cannot
    * hash numpy arrays, while scaled-integer strings render identically in
    * both engines (the float→double product and away-from-zero half rounding
    * are engine-independent).
    */
  private def arraySig(a: Column): Column =
    concat_ws(",", transform(a,
      x => round(x.cast("double") * 1000000d, 0).cast("bigint").cast("string")))

  def scalarArray(s: SparkSession, d: String): DataFrame = {
    // sum-of-squares / l2 through the native codegen'd fold (r4 promotion;
    // the HOF aggregate lambda evaluates interpreted per element — parity
    // asserted in FunctionsSpec "SumSqExpr matches the HOF fold")
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        arraySig(slice(col("embedding"), 1, 4)).as("head4_sig"),
        expr("graft_sumsq(embedding)").as("sumsq"),
        sqrt(expr("graft_sumsq(embedding)")).as("l2"),
        arraySig(transform(col("embedding"),
          x => (x.cast("double") * lit(2.0)).cast("float"))).as("doubled_sig"))
      .orderBy("vec_id")
  }

  /** q_scalar_null — the null-semantics kernel: coalesce fallback, nullif,
    * null-safe comparison (IS DISTINCT FROM), null predicates, and
    * conditional nulling. These are the semantics ETL validation logic
    * (the reference's fail-fast `.get(k)` null checks) leans on.
    */
  def scalarNull(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        col("event_id"),
        coalesce(get_json_object(col("props"), "$.nope"), lit("-")).as("k_or_dash"),
        nullif(col("event_type"), lit("error")).as("type_or_null"),
        expr("event_type IS DISTINCT FROM 'error'").as("not_error"),
        nullif(col("event_type"), lit("error")).isNull.as("was_error"),
        when(col("value") > 0, col("value")).as("pos_value"))
      .orderBy("event_id")

  /** q_scalar_decimal — EXACT DECIMAL MONEY ARITHMETIC, the financial
    * engine's core typing discipline: prices as DECIMAL(18,2), rates as
    * DECIMAL(4,2), discounted price and tax charge as decimal PRODUCTS
    * (scales 4 and 6 — exact, no float drift), aggregated per return flag.
    * Every intermediate is exactly representable at its scale, so nothing
    * rounds anywhere and the sums are bit-identical across engines and
    * merge orders — the property double arithmetic cannot give and the
    * reason money columns are decimal-typed in production schemas.
    * Division is deliberately absent: quotient precision/scale inference
    * differs across engines (Spark's p+s rules vs DuckDB's), so portable
    * decimal pipelines keep ratios in scaled integers ([[Det]]) and
    * decimals for sums/products. Outputs are cast to pinned widths
    * (DECIMAL(38,4)/(38,6)) because sum() widens differently per engine,
    * then rendered as STRING: fixed-scale decimal-to-string is canonical
    * ("383843.4900", trailing zeros kept) in both engines, whereas raw
    * decimal columns hash differently per client (pyarrow keeps
    * decimal.Decimal, other readers widen to float64) even when the
    * unscaled values are bit-identical — the driver compare is on
    * rendered values, so the exactness proof must survive rendering.
    *
    * Scale: one map-side-partial hash aggregate; decimal sums carry a
    * 16-byte unscaled value — order-independent, overflow-checked at
    * precision 38 (≈10^34 dollars of headroom).
    */
  def scalarDecimal(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("price"),
        expr("CAST(l_discount AS DECIMAL(4,2))").as("disc"),
        expr("CAST(l_tax AS DECIMAL(4,2))").as("tax"))
      .select(col("l_returnflag"), col("price"),
        expr("price * (CAST(1.00 AS DECIMAL(3,2)) - disc)").as("disc_price"),
        expr("price * (CAST(1.00 AS DECIMAL(3,2)) - disc) * " +
          "(CAST(1.00 AS DECIMAL(3,2)) + tax)").as("charge"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("CAST(CAST(sum(price) AS DECIMAL(38,4)) AS STRING)")
          .as("sum_base"),
        expr("CAST(CAST(sum(disc_price) AS DECIMAL(38,4)) AS STRING)")
          .as("sum_disc_price"),
        expr("CAST(CAST(sum(charge) AS DECIMAL(38,6)) AS STRING)")
          .as("sum_charge"),
        expr("CAST(CAST(min(price) AS DECIMAL(18,2)) AS STRING)")
          .as("min_price"),
        expr("CAST(CAST(max(price) AS DECIMAL(18,2)) AS STRING)")
          .as("max_price"))
      .orderBy("l_returnflag")

  /** q_udf_scalar — the native [[FeeExpr]] Catalyst expression, called
    * through the SQL function registry like a built-in (stays inside
    * whole-stage codegen; asserted in PlanShapeSpec).
    */
  def udfScalar(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r(expr("graft_fee(l_extendedprice, l_discount, l_tax)"), 4).as("fee"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q_agg_custom_typed — typed [[WeightedAvg]] Aggregator through udaf():
    * quantity-weighted average price per return flag.
    */
  def aggCustomTyped(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedAvg)
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(r(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** q_agg_grouped_fit — per-group custom compute through the TYPED
    * `mapGroups` seam (the batch analogue of a grouped-map `applyInPandas`
    * UDF): an OLS fit of characters-per-document on tokens-per-document,
    * per source. The fold accumulates the five sufficient statistics
    * (n, Σx, Σy, Σx², Σxy) as EXACT Longs — order-independent, streaming
    * O(1) memory per group — and the slope/intercept are single double
    * divisions from those integers, so both engines compute bit-identical
    * results from identical sums (rounded 6dp for the hash compare).
    *
    * Scale: shuffles once on the group key; per-group state is five Longs
    * regardless of group size (an iterator fold, never a materialized
    * group). Long Σxy overflows past ~10^18 token·chars per source — shard
    * groups first at that volume.
    */
  def aggGroupedFit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("x"),
        col("n_chars").cast("long").as("y"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (src, rows) =>
        var n = 0L; var sx = 0L; var sy = 0L; var sxx = 0L; var sxy = 0L
        rows.foreach { case (_, x, y) =>
          n += 1; sx += x; sy += y; sxx += x * x; sxy += x * y
        }
        val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
        val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
        (src, n, slope, intercept)
      }
      .toDF("source", "n_docs", "slope_raw", "intercept_raw")
      .select(col("source"), col("n_docs"),
        r(col("slope_raw"), 6).as("slope"), r(col("intercept_raw"), 6).as("intercept"))
      .orderBy("source")
  }

  /** q_udtf_explode — tokenizer as a generator: one row per whitespace
    * token (explode(split(...)) plans a codegen'd Generate node — no custom
    * Generator needed, SURVEY.md §2B).
    */
  def udtfExplode(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy("doc_id", "token")

  /** q_text_stats — corpus term statistics: top-50 tokens by frequency with
    * document frequency (north-star text analysis over the landed corpus).
    */
  def textStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("freq"), asc("token"))
      .limit(50)

  // ------------------------------------------------------------- contract

  /** q_scalar_rowhash — ROW-LEVEL INTEGRITY CHECKSUMS: an MD5 over the
    * canonicalized order row (ids as decimal strings, money as exact
    * integer cents, dates as ISO strings, '|'-joined) — the content
    * fingerprint CDC reconciliation and cross-system audits diff on.
    * Reported per priority class: row count, DISTINCT checksum count
    * (equal ⇔ no intra-class duplicate rows), and the lexicographic
    * min/max digests as spot-check anchors. Canonicalization is the
    * whole trick: both engines must render the identical byte string
    * before hashing, so every non-string column is cast through an
    * integer or ISO form first — never a raw double.
    *
    * Scale: the hash is a codegen'd scan-stage projection; the audit
    * aggregate is keyed by priority with map-side combine. Checksums
    * travel instead of rows for cross-cluster comparisons.
    */
  def scalarRowhash(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders")
      .select(col("o_orderpriority"), md5(concat_ws("|",
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"),
        col("o_orderstatus"))).as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("h")).as("n_distinct_hash"),
        min(col("h")).as("min_hash"), max(col("h")).as("max_hash"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_rowhash" -> scalarRowhash _,
    "q_scalar_string" -> scalarString _,
    "q_scalar_datetime" -> scalarDatetime _,
    "q_scalar_math" -> scalarMath _,
    "q_scalar_json" -> scalarJson _,
    "q_scalar_variant" -> scalarVariant _,
    "q_scalar_array" -> scalarArray _,
    "q_scalar_null" -> scalarNull _,
    "q_scalar_decimal" -> scalarDecimal _,
    "q_udf_scalar" -> udfScalar _,
    "q_agg_custom_typed" -> aggCustomTyped _,
    "q_udtf_explode" -> udtfExplode _,
    "q_text_stats" -> textStats _,
    "q_agg_grouped_fit" -> aggGroupedFit _)

  val oracle: Map[String, String] = Map(
    "q_scalar_rowhash" ->
      ("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_hash, " +
        "min(h) AS min_hash, max(h) AS max_hash FROM (" +
        "SELECT o_orderpriority, md5(concat_ws('|', " +
        "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), " +
        "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), " +
        "strftime(o_orderdate, '%Y-%m-%d'), o_orderstatus)) AS h " +
        "FROM orders) GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_scalar_decimal" ->
      ("WITH base AS (SELECT l_returnflag, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS price, " +
        "CAST(l_discount AS DECIMAL(4,2)) AS disc, " +
        "CAST(l_tax AS DECIMAL(4,2)) AS tax FROM lineitem), " +
        "x AS (SELECT l_returnflag, price, " +
        "price * (CAST(1.00 AS DECIMAL(3,2)) - disc) AS disc_price, " +
        "price * (CAST(1.00 AS DECIMAL(3,2)) - disc) * " +
        "(CAST(1.00 AS DECIMAL(3,2)) + tax) AS charge FROM base) " +
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(CAST(sum(price) AS DECIMAL(38,4)) AS VARCHAR) AS sum_base, " +
        "CAST(CAST(sum(disc_price) AS DECIMAL(38,4)) AS VARCHAR) " +
        "AS sum_disc_price, " +
        "CAST(CAST(sum(charge) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge, " +
        "CAST(CAST(min(price) AS DECIMAL(18,2)) AS VARCHAR) AS min_price, " +
        "CAST(CAST(max(price) AS DECIMAL(18,2)) AS VARCHAR) AS max_price " +
        "FROM x GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_scalar_string" ->
      ("SELECT doc_id, CAST(length(text) AS INT) AS len, " +
        "lower(substr(text, 1, 24)) AS prefix24, " +
        "upper(regexp_extract(text, '^(\\w+)', 1)) AS first_word, " +
        "text LIKE '%data%' AS has_data, " +
        "CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens " +
        "FROM documents ORDER BY doc_id"),
    "q_scalar_datetime" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, " +
        "CAST(month(o_orderdate) AS INT) AS mo, " +
        "CAST(dayofmonth(o_orderdate) AS INT) AS dom, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS day_str, " +
        "CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS yesterday, " +
        "CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002 " +
        "FROM orders ORDER BY o_orderkey"),
    "q_scalar_math" ->
      ("SELECT l_orderkey, l_linenumber, " +
        s"${sqlR("l_extendedprice", 1)} AS price_r1, " +
        "abs(l_discount - 0.05) AS abs_d, " +
        "power(l_quantity, 2) AS qty_sq, " +
        "sqrt(l_extendedprice) AS sqrt_price, " +
        s"${sqlR("ln(l_extendedprice)", 6)} AS ln_price, " +
        "CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor, " +
        "CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_scalar_variant" ->
      ("SELECT event_type, 'OBJECT<k: BIGINT>' AS vschema, count(*) AS n, " +
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_high " +
        "FROM events GROUP BY event_type ORDER BY event_type, vschema"),
    "q_scalar_json" ->
      ("SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
        "CAST(json_extract_string(props, '$.k') AS INT) AS k_int, " +
        "json_extract_string(props, '$.k') IS NOT NULL AS has_k " +
        "FROM events ORDER BY event_id"),
    "q_scalar_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, " +
        "array_to_string(list_transform(embedding[1:4], " +
        "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS VARCHAR)), ',') AS head4_sig, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b) AS sumsq, " +
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)) AS l2, " +
        "array_to_string(list_transform(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 2.0 AS FLOAT)), " +
        "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS VARCHAR)), ',') AS doubled_sig " +
        "FROM embeddings ORDER BY vec_id"),
    "q_scalar_null" ->
      ("SELECT event_id, " +
        "coalesce(json_extract_string(props, '$.nope'), '-') AS k_or_dash, " +
        "nullif(event_type, 'error') AS type_or_null, " +
        "event_type IS DISTINCT FROM 'error' AS not_error, " +
        "nullif(event_type, 'error') IS NULL AS was_error, " +
        "CASE WHEN value > 0 THEN value END AS pos_value " +
        "FROM events ORDER BY event_id"),
    "q_udf_scalar" ->
      ("SELECT l_orderkey, l_linenumber, " +
        s"${sqlR(FeeExpr.sql("l_extendedprice", "l_discount", "l_tax"), 4)} AS fee " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_agg_custom_typed" ->
      (s"SELECT l_returnflag, ${sqlR(WeightedAvg.sql("l_extendedprice", "l_quantity"), 4)} AS wavg_price, " +
        "count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_udtf_explode" ->
      ("SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents " +
        "ORDER BY doc_id, token"),
    "q_text_stats" ->
      ("SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS n_docs FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY freq DESC, token LIMIT 50"),
    "q_agg_grouped_fit" ->
      ("WITH b AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS x, " +
        "CAST(n_chars AS BIGINT) AS y FROM documents), " +
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, " +
        "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx, " +
        "CAST(sum(x * y) AS BIGINT) AS sxy FROM b GROUP BY 1), " +
        "f AS (SELECT source, n, sx, sy, " +
        "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope " +
        "FROM a) " +
        "SELECT source, n AS n_docs, round(slope * 1000000, 0) / 1000000 AS slope, " +
        "round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) " +
        "* 1000000, 0) / 1000000 AS intercept " +
        "FROM f ORDER BY source"))
}

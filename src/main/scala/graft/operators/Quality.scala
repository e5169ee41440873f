package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Financial data-quality / reconciliation operators — the control surface a
  * production landing pipeline runs AFTER files land (reference README.md:9
  * "organized and accessible for further analysis"; the reference itself has
  * no data-plane checks beyond non-null field validation at
  * script-dag-dock-report:74-79, which `q_dq_rules` generalizes).
  *
  * All four are oracle-checked (CAST-to-BIGINT on every integer aggregate —
  * DuckDB promotes integer `sum()` to HUGEINT, Spark stays BIGINT, and the
  * driver's hash compare is type-sensitive).
  *
  * Scale posture (100 TB):
  *   - [[reconcileDiff]]/[[cdcApply]] shuffle each input ONCE on the business
  *     key — the information-theoretic minimum for a full-snapshot diff /
  *     changelog fold; with both sides bucketed on the key (q_join_bucketed's
  *     layout) the exchanges disappear entirely.
  *   - [[dqRules]] evaluates all scan-local rules in ONE pass (sum-of-CASE
  *     partial aggregates, map-side combined) plus ONE join pass for the
  *     referential rules — rule count does not multiply scan count.
  *   - [[anomalyZscore]] is the classic two-pass: tiny per-group stats table
  *     (|event_type| rows) broadcast back over one more scan; per-row state
  *     is O(1) and the outlier test is exact integer arithmetic, so the
  *     flagging is bit-identical regardless of partitioning or merge order.
  */
object Quality {
  import Det._

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // ------------------------------------------------------------- reconcile

  /** q_reconcile_diff — SNAPSHOT RECONCILIATION: full-outer diff of two
    * versions of the orders table into added/removed/changed/unchanged
    * classes with per-class row counts and key checksums. The daily recon
    * every financial lake runs between yesterday's and today's landing
    * (the reference re-lands a full daily report file, report:59 — recon is
    * how you audit what the re-land changed). v2 is derived deterministically
    * from v1 so both engines agree on it: keys ≡0 (mod 101) deleted, keys
    * ≡0 (mod 97) repriced (+10.50), keys ≡0 (mod 103) re-keyed +1e8 as
    * inserts. One sort-merge join on the key = one shuffle per side; AQE
    * handles the skew; bucketed layout would make it exchange-free.
    */
  def reconcileDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
    val v2 = v1.where(col("o_orderkey") % 101 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 10.5)
          .otherwise(col("o_totalprice")))
      .unionByName(
        v1.where(col("o_orderkey") % 103 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_totalprice")))
    val a = v1.as("a"); val b = v2.as("b")
    a.join(b, col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      .select(
        coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("k"),
        when(col("a.o_orderkey").isNull, "added")
          .when(col("b.o_orderkey").isNull, "removed")
          .when(col("a.o_totalprice") =!= col("b.o_totalprice"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("key_sum"))
      .orderBy("status")
  }

  // -------------------------------------------------------------- dq rules

  /** q_dq_rules — DECLARATIVE DATA-QUALITY RULE ENGINE over lineitem: six
    * rules (not-null, two range checks, a domain check, a cross-table date
    * ordering, and foreign-key integrity) evaluated as ONE scan-aggregate
    * pass for the scan-local rules plus ONE left-join pass for the
    * referential pair — never one scan per rule. Violation counts come out
    * of sum-of-CASE partial aggregates (map-side combined; the reduced state
    * is one row regardless of input size), then `stack` unpivots the single
    * wide row into the (rule, n_violations, n_checked) report. This is the
    * generalization of the reference's landing validation — it nulls-checks
    * three fields and fails the task (report:74-79); here the rule outcomes
    * land as a queryable report instead.
    */
  def dqRules(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val v = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val scanLocal = li.agg(
        count(lit(1)).as("n"),
        v(col("l_orderkey").isNull).as("v_null_key"),
        v(!(col("l_quantity") > 0 && col("l_quantity") <= 45)).as("v_qty"),
        v(!(col("l_discount") >= 0 && col("l_discount") <= 0.08)).as("v_disc"),
        v(!col("l_returnflag").isin("A", "N", "R")).as("v_flag"))
      .select(expr(
        """stack(4,
          |  'discount_range', v_disc,
          |  'flag_domain',    v_flag,
          |  'not_null_orderkey', v_null_key,
          |  'qty_range',      v_qty) AS (rule, n_violations)""".stripMargin),
        col("n").as("n_checked"))
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val referential = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(o, li("l_orderkey") === o("o_orderkey"), "left_outer")
      .agg(
        count(lit(1)).as("n"),
        v(col("o_orderkey").isNull).as("v_fk"),
        v(col("o_orderkey").isNotNull &&
          col("l_shipdate") < col("o_orderdate")).as("v_ship"))
      .select(expr(
        """stack(2,
          |  'fk_orders',        v_fk,
          |  'ship_after_order', v_ship) AS (rule, n_violations)""".stripMargin),
        col("n").as("n_checked"))
    scanLocal.unionByName(referential).orderBy("rule")
  }

  // -------------------------------------------------------------- z-score

  /** q_anomaly_zscore — PER-GROUP OUTLIER FLAGGING with exact arithmetic:
    * per event_type, count values whose population z-score exceeds 2 in
    * magnitude. The naive formulation (stddev_samp then compare doubles) is
    * order-dependent in floating point and can disagree across engines on
    * boundary rows; instead values are scaled to integer cents and the test
    *   |z| > 2  ⟺  (n·v − S)² > 4·(n·Q − S²)
    * (S = Σv, Q = Σv² in cents) is evaluated in exact decimal(38,0) /
    * HUGEINT arithmetic — bit-identical regardless of partitioning, shuffle
    * order, or engine. Two passes: a |event_type|-row stats aggregate is
    * broadcast back over the scan (classic 100 TB shape: the second pass is
    * embarrassingly parallel, per-row state O(1)). Bound: the widest
    * intermediate is S² ≤ (n·|v|max)², so at |v| ≤ 2^26 cents the exact
    * form holds for groups up to n ≈ 10^19/2^26 ≈ 1.5·10^11 rows
    * (decimal(38,0) tops out near 10^38); past that, pre-scale values to
    * coarser units or switch the stats pass to Welford partials — the
    * per-row outlier test itself is unchanged.
    */
  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val c = t(s, d, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("v"))
    val st = c.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("s"),
      sum(col("v").cast(dec) * col("v").cast(dec)).as("q"))
    val nD = col("n").cast(dec)
    val lhs = nD * col("v").cast(dec) - col("s")
    val outlier = lhs * lhs > lit(4).cast(dec) * (nD * col("q") - col("s") * col("s"))
    c.join(broadcast(st), "event_type")
      .groupBy("event_type")
      .agg(
        max(col("n")).as("n"),
        sum(when(outlier, 1L).otherwise(0L)).as("n_outliers"),
        r(max(col("s")).cast("double") / 100.0 / max(col("n")), 2).as("mean_value"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------ mad

  /** q_anomaly_mad — ROBUST OUTLIER FLAGGING via MEDIAN ABSOLUTE DEVIATION:
    * the breakdown-resistant complement of [[anomalyZscore]] — mean/stddev
    * move with the outliers they're meant to find (one fat-finger trade
    * shifts the whole gate); the median and MAD do not, up to 50%
    * contamination. Per event_type: exact integer-cent median (smallest
    * value whose cumulative count reaches half — the same crossing-point
    * formulation as `q_agg_weighted_median`, deterministic on both
    * engines), then the MAD as the same statistic over |v − med|, then
    * flag |v − med| > 3·1.4826·MAD via the integer cross-multiplication
    * 10000·|v−med| > 44478·MAD (3·1.4826·10000 — an earlier 444780 made
    * the gate 10× too lax, caught by review in r10) — no float ratio can
    * flip on rounding.
    *
    * Ground truth: events with event_id ≡ 0 (mod 997) are repriced ×50
    * BEFORE the statistics (the injected-PII / injected-footer
    * discipline) — genuine fat-finger magnitudes at ~0.1% contamination.
    * At the correctly-calibrated gate the fixture's natural heavy tail
    * ALSO crosses 4.45·MAD (expected: 3σ-equivalent cutoffs are
    * calibrated for Gaussian cores, and event values are skewed), so the
    * flag set is injected ∪ natural tail; QualitySpec asserts a full
    * driver-side recompute of the statistic AND that the median/MAD gate
    * itself barely moved under injection (the robustness claim,
    * measured).
    *
    * Scale: two two-pass rounds (value-grain count aggregate + crossing
    * filter), each over the REDUCED (group, distinct-value) table, and a
    * final broadcast of the |event_type|-row med/MAD table over one more
    * scan. All exact integers end to end.
    */
  def anomalyMad(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = t(s, d, "events")
      .select(col("event_type"),
        (round(col("value") * 100, 0).cast("long") *
          when(col("event_id") % 997 === 0, 50L).otherwise(1L)).as("v"))
    def medianOf(df: DataFrame, valueCol: String): DataFrame = {
      val g = df.groupBy(col("event_type"), col(valueCol).as("mv"))
        .agg(count(lit(1)).as("w"))
      val cum = Window.partitionBy("event_type").orderBy("mv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("event_type")
      g.withColumn("cumw", sum(col("w")).over(cum))
        .withColumn("totw", sum(col("w")).over(tot))
        .where(col("cumw") * 2 >= col("totw"))
        .groupBy("event_type").agg(min(col("mv")).as("med"))
    }
    val med = medianOf(c, "v")
    val dev = c.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v") - col("med")).as("ad"))
    val mad = medianOf(dev, "ad").withColumnRenamed("med", "mad")
    c.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(abs(col("v") - col("med")) * 10000 > col("mad") * 44478, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------ cdc apply

  /** q_cdc_apply — CHANGELOG APPLICATION (CDC compaction): fold an ordered
    * insert/update/delete stream down to final table state. The changelog is
    * derived deterministically from orders (seq 0 inserts everything, seq 1
    * reprices keys ≡0 mod 5 at +5.00, seq 2 deletes keys ≡0 mod 7); apply =
    * keep each key's highest-seq record, drop it if that record is a delete.
    * Implemented as `max(struct(seq, …))` — an aggregate with map-side
    * partial combine (state per key is ONE struct), NOT a window: the
    * window formulation shuffles EVERY changelog row and sorts each
    * post-shuffle partition by (key, seq), while the partial fold bounds
    * the exchange to one reduced row per key per input partition. Spark
    * plans the fold as SortAggregate (struct buffers aren't
    * hash-aggregable), so the local pre-reduction key-sorts remain — but
    * nothing downstream ever holds or sorts the full changelog. Seq is
    * unique per key so the struct comparison is total. This is the batch
    * half of the engine's CDC story — the streaming half is
    * `q_stream_foreach_upsert`'s idempotent lake merge.
    */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders").select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"))
    val log = base.select(col("k"), lit(0).as("seq"), lit("I").as("op"), col("price"))
      .unionByName(base.where(col("k") % 5 === 0)
        .select(col("k"), lit(1).as("seq"), lit("U").as("op"),
          (col("price") + 5.0).as("price")))
      .unionByName(base.where(col("k") % 7 === 0)
        .select(col("k"), lit(2).as("seq"), lit("D").as("op"),
          lit(null).cast("double").as("price")))
    log.groupBy("k")
      .agg(max(struct(col("seq"), col("op"), col("price"))).as("last"))
      .where(col("last.op") =!= "D")
      .select(col("k"), col("last.seq").as("applied_seq"), col("last.price").as("price"))
      .orderBy("k")
  }

  // -------------------------------------------------------------- benford

  /** Benford expected first-digit frequencies, log10(1+1/d) in integer
    * millionths (floor) — hardcoded identically in the oracle SQL so the
    * comparison is exact-integer on both engines.
    */
  private val benfordMicro: Map[Int, Long] = Map(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** q_dq_benford — BENFORD'S-LAW FIRST-DIGIT AUDIT over order totals: the
    * classic financial forensic screen (fabricated amounts skew the leading
    * digit away from log10(1+1/d)). The digit is extracted through exact
    * integer cents → decimal string → first char — never via floating
    * log10, whose boundary behavior differs across engines. Output per
    * digit: count, observed frequency in integer millionths (floor
    * division), the hardcoded Benford expectation, and |deviation|. One
    * scan-aggregate (map-side combined, 9-row result) plus a broadcast of
    * the 1-row total — O(1) reduced state at any scale, and the only
    * full-scan pass is the digit histogram.
    */
  def dqBenford(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digit = substring(round(col("o_totalprice") * 100, 0).cast("long")
      .cast("string"), 1, 1).cast("int").as("digit")
    val counts = t(s, d, "orders").select(digit)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = benfordMicro.foldLeft(lit(null).cast("long")) {
      case (acc, (dg, micro)) => when(col("digit") === dg, micro).otherwise(acc)
    }
    // total via a global window over the ALREADY-REDUCED 9-row aggregate —
    // one scan total; a crossJoin(counts.agg(sum)) would re-derive the
    // histogram from a second full pass over orders
    counts.withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("(1000000 * n) div total").as("obs_millionths"),
        expected.as("exp_millionths"))
      .withColumn("dev_millionths",
        abs(col("obs_millionths") - col("exp_millionths")))
      .orderBy("digit")
  }

  // ------------------------------------------------------------ k-anonymity

  /** q_privacy_kanon — K-ANONYMITY AUDIT with a two-level generalization
    * ladder (k = 10) over the quasi-identifier (market segment, nation):
    * the data-governance gate a training-data or reporting pipeline runs
    * before release. Cells meeting k publish at nation grain; failing
    * cells GENERALIZE — their members re-aggregate to (segment, region) —
    * and region cells still under k are SUPPRESSED into one per-segment
    * bucket. Output is the released cell table (grain, segment, geo, n):
    * every row has n ≥ k or grain='suppressed', and members are counted
    * exactly once (the spec proves both invariants).
    *
    * Scale: cell tables are |quasi-identifier-domain|-sized (tiny) after
    * one keyed count of the subject table; the ladder is pure arithmetic
    * on cells — no second scan of subjects, no per-row state. Nation and
    * region dims broadcast.
    */
  def privacyKanon(s: SparkSession, d: String): DataFrame = {
    val k = 10
    val dims = broadcast(t(s, d, "nation")
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name")))
    val cells = t(s, d, "customer")
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("n_name"), col("r_name"))
      .agg(count(lit(1)).as("n"))
    val natOk = cells.where(col("n") >= k)
      .select(lit("nation").as("grain"), col("seg"), col("n_name").as("geo"), col("n"))
    val regCells = cells.where(col("n") < k)
      .groupBy("seg", "r_name").agg(sum(col("n")).as("n"))
    val regOk = regCells.where(col("n") >= k)
      .select(lit("region").as("grain"), col("seg"), col("r_name").as("geo"), col("n"))
    val suppressed = regCells.where(col("n") < k)
      .groupBy("seg").agg(sum(col("n")).as("n"))
      .select(lit("suppressed").as("grain"), col("seg"), lit("*").as("geo"), col("n"))
    natOk.unionByName(regOk).unionByName(suppressed)
      .orderBy("grain", "seg", "geo")
  }

  // -------------------------------------------------------------- drift

  /** q_dq_drift — POPULATION-STABILITY drift monitor (PSI): week 1 of the
    * event stream is the reference window; the rest of the month is the
    * candidate. A deterministic mix shift is INJECTED into the candidate
    * (every second small-ticket event, `value < 50 AND event_id % 2 = 0`,
    * is withheld — a payments-mix change hitting the POPULATED bins, so the
    * gate is non-vacuous) and PSI = Σ (p_ref − p_cur)·(log₁₀p_ref −
    * log₁₀p_cur), the standard pre-deploy drift gate on a model feature.
    * Amounts bin into 10 fixed $50 buckets and each side's shares are
    * Laplace-smoothed (c+1)/(t+10) so empty bins stay finite. The alarm is
    * the conventional 0.1-nat threshold expressed in the micro-log10 units
    * used throughout this repo: 0.1/ln(10) = 43429 micro.
    *
    * Cross-engine determinism: counts are exact integers; each log10 is
    * fixed-point-rounded to an integer micro-log BEFORE the product (the
    * unigram-LM precedent); the share difference is an exact double
    * division/subtraction; and the per-bin contribution re-rounds to an
    * integer micro-PSI, so the total is an order-independent integer sum.
    *
    * Scale: ONE conditional-aggregation pass over the stream (10 grouped
    * keys, map-side partials) plus a broadcast of the two totals — drift
    * monitoring costs one scan regardless of bin count or corpus size, and
    * composes with the incremental-agg pattern (store per-bin counts,
    * re-derive PSI without rescanning history).
    */
  def dqDrift(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .where(expr("ts < TIMESTAMP '2024-01-08 00:00:00' " +
        "OR NOT (value < 50 AND event_id % 2 = 0)"))
      .select(expr("CAST(least(9, CAST(floor(value / 50) AS INT)) AS INT)").as("bin"),
        expr("ts < TIMESTAMP '2024-01-08 00:00:00'").as("is_ref"))
    val counts = ev.groupBy("bin").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    // totals via an unbounded window over the 10-row bin table — NOT an
    // agg+crossJoin, which would re-derive (and re-scan) the event pipeline
    // on the second branch; this keeps the whole monitor one source pass
    // (asserted in PlanShapeSpec)
    counts
      .withColumn("t_ref", expr("sum(c_ref) OVER ()"))
      .withColumn("t_cur", expr("sum(c_cur) OVER ()"))
      .withColumn("p_ref", expr("(c_ref + 1.0) / (t_ref + 10.0)"))
      .withColumn("p_cur", expr("(c_cur + 1.0) / (t_cur + 10.0)"))
      .withColumn("lr_micro", expr("CAST(round(log10(p_ref) * 1000000) AS BIGINT)"))
      .withColumn("lc_micro", expr("CAST(round(log10(p_cur) * 1000000) AS BIGINT)"))
      .withColumn("psi_part_micro",
        expr("CAST(round((p_ref - p_cur) * (lr_micro - lc_micro)) AS BIGINT)"))
      .withColumn("psi_total_micro", expr("sum(psi_part_micro) OVER ()"))
      .select(col("bin"), col("c_ref"), col("c_cur"), col("psi_part_micro"),
        col("psi_total_micro"),
        (col("psi_total_micro") > 43429L).as("is_drifted"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------- registration

  // ------------------------------------------------------------ referential

  /** q_dq_referential — REFERENTIAL-INTEGRITY AUDIT across the whole star
    * schema: for every FK edge (lineitem→orders/part/supplier,
    * orders→customer, customer/supplier→nation, nation→region), row count,
    * orphan count, and orphan rate in exact micro-units. The fixture is
    * referentially clean, so each child side INJECTS deterministic orphan
    * keys (negative keys, mirrored literally in the oracle SQL) — the audit
    * provably detects what it claims to detect instead of vacuously
    * reporting zero.
    *
    * Scale shape: the three lineitem FK checks run from ONE projection of
    * the fact table — (l_orderkey, l_partkey, l_suppkey) with the probe
    * rows appended — left-joined against all three parents (orders
    * shuffles once on the key and becomes exchange-free under the bucketed
    * layout; part/supplier broadcast), with every orphan count taken from
    * a single aggregation: one fact scan, not three. The dim-side checks
    * stay child-key → LEFT ANTI → count with broadcast parents. All checks
    * union into ONE plan / one action, so the scheduler overlaps them.
    */
  def dqReferential(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def check(label: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String, inject: Seq[Long]): DataFrame = {
      val keys = child.select(col(key).as("k"))
        .union(inject.toDF("k"))
      val orphans = keys.join(parent.select(col(pkey).as("pk")),
          col("k") === col("pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      keys.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
        .select(lit(label).as("fk"), col("n_rows"), col("n_orphans"),
          expr("(1000000 * n_orphans) div n_rows").as("orphan_micro"))
    }
    val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
    val c = t(s, d, "customer"); val su = t(s, d, "supplier")
    val p = t(s, d, "part"); val n = t(s, d, "nation"); val r = t(s, d, "region")
    // one fact pass: each injected row carries all three probe keys, so
    // every lineitem check still sees +3 rows / +3 provable orphans —
    // byte-identical to the per-check Seq(-1,-2,-3) injection it replaces
    val liKeys = li
      .select(col("l_orderkey").as("ko"), col("l_partkey").as("kp"),
        col("l_suppkey").as("ks"))
      .union(Seq((-1L, -1L, -1L), (-2L, -2L, -2L), (-3L, -3L, -3L))
        .toDF("ko", "kp", "ks"))
    // parent key sets are DISTINCT'd before the probes: an audit must not
    // assume the very invariant it exists to check — a duplicated parent
    // primary key would otherwise fan out child rows and corrupt all
    // three counts. With clean parents the distinct is a no-op pass.
    val probed = liKeys
      .join(o.select(col("o_orderkey").as("po")).distinct(),
        col("ko") === col("po"), "left")
      .join(broadcast(p.select(col("p_partkey").as("pp")).distinct()),
        col("kp") === col("pp"), "left")
      .join(broadcast(su.select(col("s_suppkey").as("ps")).distinct()),
        col("ks") === col("ps"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("po").isNull, 1)).as("orph_o"),
        count(when(col("pp").isNull, 1)).as("orph_p"),
        count(when(col("ps").isNull, 1)).as("orph_s"))
    val liChecks = probed
      .select(explode(array(
        struct(lit("lineitem.l_orderkey->orders").as("fk"),
          col("n_rows"), col("orph_o").as("n_orphans")),
        struct(lit("lineitem.l_partkey->part").as("fk"),
          col("n_rows"), col("orph_p").as("n_orphans")),
        struct(lit("lineitem.l_suppkey->supplier").as("fk"),
          col("n_rows"), col("orph_s").as("n_orphans")))).as("e"))
      .select(col("e.fk").as("fk"), col("e.n_rows").as("n_rows"),
        col("e.n_orphans").as("n_orphans"),
        expr("(1000000 * e.n_orphans) div e.n_rows").as("orphan_micro"))
    Seq(
      check("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey", Seq(-1L)),
      liChecks,
      check("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey", Seq(-1L)),
      check("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey", Seq(-1L, -2L)),
      check("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey", Seq(-1L)))
      .reduce(_ unionByName _)
      .orderBy("fk")
  }

  /** q_privacy_ldiversity — L-DIVERSITY AUDIT, the release gate k-anonymity
    * ([[privacyKanon]]) misses: a (nation, segment) cell can hold ≥ k
    * customers yet expose them all if the SENSITIVE attribute (here the
    * account-balance band, $1000 granularity) is uniform inside the cell.
    * Reports per cell: size, distinct sensitive values (exact), and the
    * l ≥ 3 release flag — publish only `ok` cells.
    *
    * Scale: one keyed agg over the customer dimension (dims broadcast);
    * the exact distinct runs inside the same aggregation (Spark's expand
    * path), grain-bounded by |nations|×|segments| output cells.
    */
  def privacyLdiversity(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .groupBy(col("n_name"), col("seg"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band")).as("l_distinct"))
      .select(col("n_name"), col("seg"), col("n"), col("l_distinct"),
        (col("l_distinct") >= 3).as("ok"))
      .orderBy("n_name", "seg")
  }

  /** t-closeness release threshold in micro-TVD units (0.25): classes whose
    * sensitive-value distribution sits within total-variation 0.25 of the
    * global distribution may publish. Mirrored literally by the oracle. */
  private val tcloseMicro = 250000L

  /** q_privacy_tclose — T-CLOSENESS AUDIT (Li–Li–Venkatasubramanian,
    * ICDE'07), the third privacy gate: a cell can pass k-anonymity
    * ([[privacyKanon]]) and l-diversity ([[privacyLdiversity]]) yet still
    * leak by SKEW — holding many distinct sensitive values whose
    * distribution differs sharply from the population's (membership in
    * the cell then shifts an attacker's posterior). Reports per
    * (nation, segment) cell the TOTAL-VARIATION DISTANCE between the
    * cell's balance-band distribution and the global one — the
    * categorical EMD the paper prescribes — as an EXACT integer:
    * TVD = Σ_b |c_b·N − g_b·n| / (2·n·N), computed as one integer
    * numerator sum with a single final integer division to micro units
    * (no per-band float ratios to drift), and the ≤ 0.25 release flag.
    *
    * Scale: the audit grid is CELL×BAND grain (|nations·segments| ×
    * |bands| — control-plane-sized regardless of row count), built by
    * crossing the cell table with the broadcast global band histogram
    * and left-joining observed cell-band counts; the corpus is scanned
    * once for the two keyed aggregates. The c_b·N exact form holds to
    * ~10⁹ rows per side; past that the same audit runs on per-mille
    * rates (the `q_text_classify_train` discipline), trading the last
    * micro digit for overflow headroom.
    */
  def privacyTclose(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val global = base.groupBy("band").agg(count(lit(1)).as("g"))
    val tot = base.agg(count(lit(1)).as("nn"))
    val classes = base.groupBy("n_name", "seg").agg(count(lit(1)).as("n"))
    val cellBand = base.groupBy("n_name", "seg", "band")
      .agg(count(lit(1)).as("c"))
    classes.crossJoin(broadcast(global))
      .join(cellBand, Seq("n_name", "seg", "band"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .groupBy(col("n_name"), col("seg"), col("n"))
      .agg(sum(abs(col("c") * col("nn") - col("g") * col("n"))).as("num"),
        max(col("nn")).as("nn"))
      .select(col("n_name"), col("seg"), col("n"),
        expr("(num * 1000000) div (2 * n * nn)").as("tvd_micro"))
      .withColumn("ok", col("tvd_micro") <= lit(tcloseMicro))
      .orderBy("n_name", "seg")
  }

  /** Shared Spark/DuckDB SQL fragments for [[privacyDpCount]] — ONE string
    * evaluated by both engines, so the mechanism cannot drift between the
    * operator and its oracle.
    *
    * `dpHexV`: first 3 hex digits of the group's keyed md5 as an integer in
    * [0, 4096) via instr-table lookup (both engines lack a portable
    * hex-parse; instr/substr/md5 are identical in both).
    * `dpNoiseCase`: inverse-CDF ladder of the TWO-SIDED GEOMETRIC (discrete
    * Laplace) distribution with α = 1/2 (ε = ln 2): P(k) = (1/3)·2^−|k| in
    * exact /12288 units over the 4096-value draw (·3), tails beyond |k| = 8
    * lumped into +9 (32/12288 ≈ 0.26% mass, documented truncation).
    */
  private val dpHexV: String = {
    def digit(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"(${digit(1)} * 256 + ${digit(2)} * 16 + ${digit(3)})"
  }

  private val dpNoiseCase: String = {
    // cumulative thresholds in /12288 units, draw v scaled by 3
    val ladder = Seq(0L -> 4096L) ++ (1 to 8).flatMap { k =>
      Seq(k.toLong -> (4096L >> k), -k.toLong -> (4096L >> k))
    }
    val (cases, _) = ladder.foldLeft((Seq.empty[String], 0L)) {
      case ((acc, cum), (k, mass)) =>
        (acc :+ s"WHEN v * 3 < ${cum + mass} THEN CAST($k AS BIGINT)", cum + mass)
    }
    s"CASE ${cases.mkString(" ")} ELSE CAST(9 AS BIGINT) END"
  }

  /** q_privacy_local_dp — LOCAL differential privacy via RANDOMIZED
    * RESPONSE (Warner 1965; the RAPPOR/telemetry paradigm — r16,
    * completing the privacy family's second production model: the
    * curator never sees a truthful bit): each customer's sensitive bit
    * ("high-balance") is randomized ON THE ROW before any aggregation —
    * report the truth if coin₁ = 0, else report coin₂ — giving
    * P(report = truth's value) = 3/4, i.e. ε = ln 3 per user. The
    * segment-level estimate DEBIASES the aggregate:
    * n̂ = 2·reported − n/2, held exact as quarters
    * (est_quarters = 8·reported − 2n). Coins are the first two hex
    * digits of a keyed md5 of the user id (deterministic draw, the
    * [[privacyDpCount]] discipline — a sealed per-user seed swaps in
    * structurally unchanged). `n_true` is emitted for the gate; a real
    * deployment never materializes it (that is the POINT of the local
    * model: the truthful column need never leave the device).
    *
    * Scale: the randomization is a scan-stage projection (per-row hash +
    * two bit tests); the release is one hash aggregate at segment grain
    * — local DP costs the same as the raw GROUP BY at any corpus size,
    * and unlike the central mechanisms there is no sensitive
    * intermediate to protect.
    */
  def privacyLocalDp(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_mktsegment").as("seg"),
        (col("c_acctbal") >= 5000d).as("truth"),
        expr("md5(concat('graftldp:', CAST(c_custkey AS STRING)))").as("h"))
      .withColumn("coin1",
        expr("(instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 2"))
      .withColumn("coin2",
        expr("(instr('0123456789abcdef', substr(h, 2, 1)) - 1) % 2"))
      .withColumn("reported",
        when(col("coin1") === 0, col("truth")).otherwise(col("coin2") === 1))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        sum(when(col("truth"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("reported"), 1L).otherwise(0L)).as("n_reported"))
      .select(col("seg"), col("n"), col("n_true"), col("n_reported"),
        (lit(8L) * col("n_reported") - lit(2L) * col("n")).as("est_quarters"))
      .orderBy("seg")

  /** q_privacy_dp_count — DIFFERENTIALLY-PRIVATE COUNT RELEASE via the
    * geometric mechanism (Ghosh–Roughgarden–Sundararajan: the discrete
    * Laplace, utility-optimal for counts): per (segment, nation) cell,
    * count + two-sided-geometric noise at ε = ln 2, clamped at 0. The
    * "draw" is a keyed md5 of the cell — deterministic so the release is
    * reproducible and the oracle replays it; a production release would
    * swap in a sealed RNG seed, changing nothing structural. `n_true` is
    * emitted for the correctness gate (a real release drops it).
    *
    * Scale: one hash aggregate over the joined scan; noise is a scan-side
    * projection on CELL-grain rows (|segments|×|nations|), so the noisy
    * release costs the same as the raw GROUP BY at any corpus size.
    */
  def privacyDpCount(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("geo"))
      .agg(count(lit(1)).as("n_true"))
    cells
      .withColumn("h", expr("md5(concat('graftdp:', seg, ':', geo))"))
      .withColumn("v", expr(dpHexV))
      .withColumn("noise", expr(dpNoiseCase))
      .withColumn("n_dp", greatest(col("n_true") + col("noise"), lit(0L)))
      .select("seg", "geo", "n_true", "noise", "n_dp")
      .orderBy("seg", "geo")
  }

  /** q_privacy_dp_sum — DIFFERENTIALLY-PRIVATE SUM RELEASE: per
    * (segment, nation) cell, total order value with each ORDER's
    * contribution CLIPPED at a fixed cap (the standard bounded-sensitivity
    * move — without clipping a single whale order makes the sum's
    * sensitivity unbounded and no finite noise privatizes it), then
    * two-sided-geometric noise SCALED BY THE CAP added to the clipped sum
    * (sensitivity = cap ⟹ noise · cap preserves the count mechanism's ε).
    * Same deterministic keyed-md5 draw and inverse-CDF ladder as
    * [[privacyDpCount]] (different salt, so the two releases draw
    * independently); `sum_true`/`n_clipped` are emitted for the gate — a
    * production release drops them.
    *
    * Scale: clipping is a scan-stage `least()`; the release costs one hash
    * aggregate at cell grain regardless of corpus size, like dp_count.
    */
  def privacyDpSum(s: SparkSession, d: String): DataFrame = {
    val cap = 500000L // cents — $5k per-order contribution bound
    val cells = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("seg"), col("n_name").as("geo"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("seg", "geo")
      .agg(sum(col("cents")).as("sum_true"),
        sum(least(col("cents"), lit(cap))).as("sum_clipped"),
        sum(when(col("cents") > cap, 1L).otherwise(0L)).as("n_clipped"))
    cells
      .withColumn("h", expr("md5(concat('graftdpsum:', seg, ':', geo))"))
      .withColumn("v", expr(dpHexV))
      .withColumn("noise", expr(dpNoiseCase))
      .withColumn("sum_dp",
        greatest(col("sum_clipped") + col("noise") * lit(cap), lit(0L)))
      .select("seg", "geo", "sum_true", "sum_clipped", "n_clipped", "noise",
        "sum_dp")
      .orderBy("seg", "geo")
  }

  /** q_privacy_dp_topk — PRIVATE HEAVY HITTERS: release the top-10 part
    * types by order volume, each count perturbed by the geometric
    * mechanism and the release STABILITY-THRESHOLDED (only noisy counts
    * ≥ τ are eligible — the standard guard that keeps rare categories,
    * whose membership is itself sensitive, out of the release even when
    * noise inflates them). Ranking happens on the NOISY counts with a
    * deterministic name tie-break, so the released ORDER leaks nothing
    * beyond the noisy values themselves. Same keyed-md5 draw discipline as
    * [[privacyDpCount]] (salt `graftdptopk:`).
    *
    * Scale: category grain (~150 part types) after one fact-side hash
    * aggregate; the noise projection, threshold, and top-10 sort all run
    * on that bounded relation.
    */
  def privacyDpTopk(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type").as("cat"))
      .agg(count(lit(1)).as("n_true"))
    cells
      .withColumn("h", expr("md5(concat('graftdptopk:', cat))"))
      .withColumn("v", expr(dpHexV))
      .withColumn("noise", expr(dpNoiseCase))
      .withColumn("n_dp", greatest(col("n_true") + col("noise"), lit(0L)))
      .where(col("n_dp") >= 20L)
      .orderBy(col("n_dp").desc, col("cat"))
      .limit(10)
      .select("cat", "n_true", "noise", "n_dp")
  }

  /** q_privacy_dp_quantile — DIFFERENTIALLY-PRIVATE MEDIAN via the
    * EXPONENTIAL MECHANISM (McSherry–Talwar — the OTHER canonical DP
    * primitive; the geometric releases add noise to VALUES, this one
    * samples an OUTPUT by utility): per segment, account balances land in
    * a fixed 64-bucket grid over the clipped domain (bounded domain =
    * bounded sensitivity, the dp_sum clipping move), each bucket k is
    * scored by median rank loss |n − 2·cum≤k| (sensitivity 1), weighted
    * 4096 >> min(loss, 12) — the exact dyadic form of exp(−loss·ln 2),
    * i.e. ε = 2 ln 2, with the ≥ 12 tail floored at weight 1 so a
    * degenerate distribution still releases — and the released bucket is
    * drawn by the deterministic keyed-md5 draw ([[privacyDpCount]]'s
    * discipline, salt `graftdpq:`): smallest k with 4096·cumw > v·totw.
    * True-median columns ride along for the gate; a real release drops
    * them.
    *
    * Scale: one hash aggregate to the (segment, 64-bucket) histogram;
    * everything after — losses, weights, cumulative draw — is window
    * arithmetic on ≤ 64 rows per segment. The released value never
    * touches row grain, which is the point of the mechanism.
    */
  def privacyDpQuantile(s: SparkSession, d: String): DataFrame = {
    val lo = -102400L // cents; grid covers [-1024.00, 10035.20) in 64 steps
    val w = 17280L
    val hist = t(s, d, "customer")
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
      .withColumn("bucket", expr(
        s"least(greatest((cents - ($lo)) div $w, CAST(0 AS BIGINT)), " +
          "CAST(63 AS BIGINT))"))
      .groupBy("seg", "bucket").agg(count(lit(1)).as("cnt"))
    val dense = hist.select("seg").distinct()
      .select(col("seg"), explode(sequence(lit(0L), lit(63L))).as("bucket"))
      .join(hist, Seq("seg", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
    val ord = Window.partitionBy("seg").orderBy("bucket")
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("seg")
    val scored = dense
      .withColumn("cumle", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(all))
      .withColumn("loss", abs(col("n") - lit(2L) * col("cumle")))
      .withColumn("wt", expr(
        "shiftright(CAST(4096 AS BIGINT), CAST(least(loss, 12) AS INT))"))
      .withColumn("cumw", sum(col("wt")).over(cum))
      .withColumn("totw", sum(col("wt")).over(all))
      .withColumn("h", expr("md5(concat('graftdpq:', seg))"))
      .withColumn("v", expr(dpHexV))
    val released = scored.where(expr("4096 * cumw > v * totw"))
      .withColumn("rk", row_number().over(ord))
      .where(col("rk") === 1)
      .select(col("seg"), col("n"), col("v").cast("long").as("draw"),
        col("bucket").as("released_bucket"),
        col("loss").as("released_loss"),
        (lit(lo) + col("bucket") * lit(w) + lit(w / 2)).as("released_cents"))
    val truem = scored.where(expr("2 * cumle >= n"))
      .withColumn("rk", row_number().over(ord))
      .where(col("rk") === 1)
      .select(col("seg"), col("bucket").as("true_bucket"))
    released.join(truem, "seg")
      .select("seg", "n", "draw", "released_bucket", "released_loss",
        "released_cents", "true_bucket")
      .orderBy("seg")
  }

  /** q_dq_freshness — PARTITION-FRESHNESS AUDIT: per nation, the most
    * recent order date, its staleness in days against the corpus
    * watermark (the global max — the reference's daily cadence makes
    * "how far behind is each feed" the operational question,
    * report:59's yesterday-window semantics), and an SLA boolean at
    * 7 days. The monitor a daily-ingest lake runs before trusting a
    * partition.
    *
    * Scale: nation-grain aggregate; the watermark is a 1-row aggregate
    * broadcast back — no window over the corpus.
    */
  def dqFreshness(s: SparkSession, d: String): DataFrame = {
    val perGeo = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("geo"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("n_orders"))
    perGeo
      .crossJoin(broadcast(perGeo.agg(max(col("last_day")).as("watermark"))))
      .select(col("geo"),
        date_format(col("last_day"), "yyyy-MM-dd").as("last_day"),
        col("n_orders"),
        datediff(col("watermark"), col("last_day")).cast("long").as("days_stale"))
      .withColumn("fresh", col("days_stale") <= 7L)
      .orderBy("geo")
  }

  /** q_anomaly_iqr — TUKEY-FENCE OUTLIER AUDIT per market segment: Q1/Q3
    * of order values (interpolated quantiles — Spark `percentile` ≡ DuckDB
    * `quantile_cont`), fences at 1.5·IQR, and the count + extremes of the
    * rows outside them. The rank-based robust complement to
    * [[anomalyZscore]] (moment-based, masks under heavy tails) and
    * [[anomalyMad]] (median-based): three detectors, three breakdown
    * points, one family.
    *
    * Scale: quantiles reduce at segment grain; the fence pass is a second
    * scan-stage filter against broadcast fences — two passes total, both
    * keyed, no sort of the corpus.
    */
  def anomalyIqr(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val fences = v.groupBy("seg")
      .agg(expr("percentile(cents, 0.25)").as("q1"),
        expr("percentile(cents, 0.75)").as("q3"),
        count(lit(1)).as("n"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    v.join(broadcast(fences), "seg")
      .groupBy("seg")
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1"),
        max(col("q3")).as("q3"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(when(col("cents") > col("hi"), col("cents"))).as("max_outlier"))
      .orderBy("seg")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_privacy_dp_count" -> privacyDpCount _,
    "q_privacy_local_dp" -> privacyLocalDp _,
    "q_privacy_dp_sum" -> privacyDpSum _,
    "q_privacy_dp_topk" -> privacyDpTopk _,
    "q_privacy_dp_quantile" -> privacyDpQuantile _,
    "q_dq_freshness" -> dqFreshness _,
    "q_anomaly_iqr" -> anomalyIqr _,
    "q_privacy_ldiversity" -> privacyLdiversity _,
    "q_privacy_tclose" -> privacyTclose _,
    "q_dq_referential" -> dqReferential _,
    "q_dq_drift" -> dqDrift _,
    "q_privacy_kanon" -> privacyKanon _,
    "q_reconcile_diff" -> reconcileDiff _,
    "q_dq_rules" -> dqRules _,
    "q_anomaly_zscore" -> anomalyZscore _,
    "q_cdc_apply" -> cdcApply _,
    "q_dq_benford" -> dqBenford _,
    "q_anomaly_mad" -> anomalyMad _)

  val oracle: Map[String, String] = Map(
    // the SAME dpHexV/dpNoiseCase strings the operator evaluates
    // the per-row randomized response replayed digit for digit, then the
    // same debiasing arithmetic
    "q_privacy_local_dp" ->
      ("WITH r AS (SELECT c_mktsegment AS seg, c_acctbal >= 5000 AS truth, " +
        "md5(concat('graftldp:', CAST(c_custkey AS VARCHAR))) AS h " +
        "FROM customer), " +
        "b AS (SELECT seg, truth, " +
        "(instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 2 AS coin1, " +
        "(instr('0123456789abcdef', substr(h, 2, 1)) - 1) % 2 AS coin2 FROM r), " +
        "rep AS (SELECT seg, truth, " +
        "CASE WHEN coin1 = 0 THEN truth ELSE coin2 = 1 END AS reported FROM b) " +
        "SELECT seg, count(*) AS n, " +
        "CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true, " +
        "CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT) AS n_reported, " +
        "CAST(8 * sum(CASE WHEN reported THEN 1 ELSE 0 END) " +
        "- 2 * count(*) AS BIGINT) AS est_quarters " +
        "FROM rep GROUP BY seg ORDER BY seg"),
    "q_privacy_dp_count" ->
      ("WITH cells AS (SELECT c_mktsegment AS seg, n_name AS geo, " +
        "CAST(count(*) AS BIGINT) AS n_true " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2), " +
        "hv AS (SELECT seg, geo, n_true, " +
        "md5(concat('graftdp:', seg, ':', geo)) AS h FROM cells), " +
        s"nv AS (SELECT seg, geo, n_true, $dpHexV AS v FROM hv), " +
        s"nz AS (SELECT seg, geo, n_true, $dpNoiseCase AS noise FROM nv) " +
        "SELECT seg, geo, n_true, noise, " +
        "greatest(n_true + noise, 0) AS n_dp FROM nz ORDER BY seg, geo"),
    "q_privacy_dp_sum" ->
      ("WITH cells AS (SELECT c_mktsegment AS seg, n_name AS geo, " +
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_true, " +
        "CAST(sum(least(CAST(round(o_totalprice * 100, 0) AS BIGINT), 500000)) " +
        "AS BIGINT) AS sum_clipped, " +
        "CAST(sum(CASE WHEN CAST(round(o_totalprice * 100, 0) AS BIGINT) > 500000 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2), " +
        "hv AS (SELECT *, md5(concat('graftdpsum:', seg, ':', geo)) AS h FROM cells), " +
        s"nv AS (SELECT *, $dpHexV AS v FROM hv), " +
        s"nz AS (SELECT *, $dpNoiseCase AS noise FROM nv) " +
        "SELECT seg, geo, sum_true, sum_clipped, n_clipped, noise, " +
        "greatest(sum_clipped + noise * 500000, 0) AS sum_dp " +
        "FROM nz ORDER BY seg, geo"),
    "q_privacy_dp_topk" ->
      ("WITH cells AS (SELECT p_type AS cat, CAST(count(*) AS BIGINT) AS n_true " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1), " +
        "hv AS (SELECT cat, n_true, md5(concat('graftdptopk:', cat)) AS h FROM cells), " +
        s"nv AS (SELECT cat, n_true, $dpHexV AS v FROM hv), " +
        s"nz AS (SELECT cat, n_true, $dpNoiseCase AS noise FROM nv), " +
        "rel AS (SELECT cat, n_true, noise, " +
        "greatest(n_true + noise, 0) AS n_dp FROM nz) " +
        "SELECT cat, n_true, noise, n_dp FROM rel WHERE n_dp >= 20 " +
        "ORDER BY n_dp DESC, cat LIMIT 10"),
    // the exponential mechanism replayed: same grid, same dyadic weights,
    // same keyed draw and cumulative pick
    "q_privacy_dp_quantile" ->
      ("WITH cust AS (SELECT c_mktsegment AS seg, " +
        "CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer), " +
        "hist AS (SELECT seg, " +
        "least(greatest((cents - (-102400)) // 17280, 0), 63) AS bucket, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY 1, 2), " +
        "dense AS (SELECT sg.seg, sg.b AS bucket, coalesce(h.cnt, 0) AS cnt " +
        "FROM (SELECT s.seg, g.b FROM (SELECT DISTINCT seg FROM hist) s, " +
        "range(0, 64) g(b)) sg " +
        "LEFT JOIN hist h ON h.seg = sg.seg AND h.bucket = sg.b), " +
        "sc AS (SELECT seg, bucket, cnt, " +
        "CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumle, " +
        "CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS n FROM dense), " +
        "wts AS (SELECT *, abs(n - 2 * cumle) AS loss, " +
        "CAST(4096 >> CAST(least(abs(n - 2 * cumle), 12) AS INT) AS BIGINT) " +
        "AS wt FROM sc), " +
        "cw AS (SELECT *, CAST(sum(wt) OVER (PARTITION BY seg ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw, " +
        "CAST(sum(wt) OVER (PARTITION BY seg) AS BIGINT) AS totw, " +
        "md5(concat('graftdpq:', seg)) AS h FROM wts), " +
        s"dv AS (SELECT *, $dpHexV AS v FROM cw), " +
        "rel AS (SELECT seg, n, v AS draw, bucket AS released_bucket, " +
        "loss AS released_loss, " +
        "-102400 + bucket * 17280 + 8640 AS released_cents, " +
        "row_number() OVER (PARTITION BY seg ORDER BY bucket) AS rk " +
        "FROM dv WHERE 4096 * cumw > v * totw), " +
        "tm AS (SELECT seg, bucket AS true_bucket, " +
        "row_number() OVER (PARTITION BY seg ORDER BY bucket) AS rk " +
        "FROM dv WHERE 2 * cumle >= n) " +
        "SELECT r.seg, r.n, r.draw, r.released_bucket, r.released_loss, " +
        "r.released_cents, t.true_bucket " +
        "FROM rel r JOIN tm t ON t.seg = r.seg AND t.rk = 1 " +
        "WHERE r.rk = 1 ORDER BY r.seg"),
    "q_dq_freshness" ->
      ("WITH pg AS (SELECT n_name AS geo, " +
        "max(CAST(o_orderdate AS DATE)) AS last_day, " +
        "CAST(count(*) AS BIGINT) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1), " +
        "wm AS (SELECT max(last_day) AS watermark FROM pg) " +
        "SELECT geo, strftime(last_day, '%Y-%m-%d') AS last_day, n_orders, " +
        "CAST(datediff('day', last_day, watermark) AS BIGINT) AS days_stale, " +
        "datediff('day', last_day, watermark) <= 7 AS fresh " +
        "FROM pg, wm ORDER BY geo"),
    "q_anomaly_iqr" ->
      ("WITH v AS (SELECT c_mktsegment AS seg, " +
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "f AS (SELECT seg, quantile_cont(cents, 0.25) AS q1, " +
        "quantile_cont(cents, 0.75) AS q3, CAST(count(*) AS BIGINT) AS n " +
        "FROM v GROUP BY seg), " +
        "fe AS (SELECT *, q1 - 1.5 * (q3 - q1) AS lo, " +
        "q3 + 1.5 * (q3 - q1) AS hi FROM f) " +
        "SELECT v.seg, max(fe.n) AS n, max(fe.q1) AS q1, max(fe.q3) AS q3, " +
        "max(fe.lo) AS lo, max(fe.hi) AS hi, " +
        "CAST(sum(CASE WHEN v.cents < fe.lo OR v.cents > fe.hi THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_outliers, " +
        "max(CASE WHEN v.cents > fe.hi THEN v.cents END) AS max_outlier " +
        "FROM v JOIN fe ON v.seg = fe.seg GROUP BY v.seg ORDER BY v.seg"),
    "q_privacy_tclose" ->
      ("WITH base AS (SELECT n_name, c_mktsegment AS seg, " +
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS band " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey), " +
        "g AS (SELECT band, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY band), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base), " +
        "cls AS (SELECT n_name, seg, CAST(count(*) AS BIGINT) AS n " +
        "FROM base GROUP BY n_name, seg), " +
        "cb AS (SELECT n_name, seg, band, CAST(count(*) AS BIGINT) AS c " +
        "FROM base GROUP BY n_name, seg, band) " +
        "SELECT n_name, seg, n, tvd_micro, tvd_micro <= 250000 AS ok FROM (" +
        "SELECT cls.n_name, cls.seg, cls.n, " +
        "(CAST(sum(abs(coalesce(cb.c, 0) * tot.nn - g.g * cls.n)) AS BIGINT) " +
        "* 1000000) // (2 * cls.n * max(tot.nn)) AS tvd_micro " +
        "FROM cls CROSS JOIN g CROSS JOIN tot " +
        "LEFT JOIN cb ON cb.n_name = cls.n_name AND cb.seg = cls.seg " +
        "AND cb.band = g.band " +
        "GROUP BY cls.n_name, cls.seg, cls.n) ORDER BY n_name, seg"),
    "q_privacy_ldiversity" ->
      ("SELECT n_name, c_mktsegment AS seg, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) " +
        "AS BIGINT) AS l_distinct, " +
        "count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3 AS ok " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name, c_mktsegment ORDER BY n_name, seg"),
    "q_dq_referential" -> {
      def chk(label: String, childSel: String, child: String,
          parent: String, pkey: String, inject: String) =
        s"SELECT '$label' AS fk, CAST(count(*) AS BIGINT) AS n_rows, " +
          s"CAST(sum(CASE WHEN p.$pkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans, " +
          s"(1000000 * CAST(sum(CASE WHEN p.$pkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)) " +
          s"// CAST(count(*) AS BIGINT) AS orphan_micro " +
          s"FROM (SELECT $childSel AS k FROM $child UNION ALL " +
          s"SELECT * FROM (VALUES $inject) v(k)) ck " +
          s"LEFT JOIN $parent p ON ck.k = p.$pkey"
      Seq(
        chk("customer.c_nationkey->nation", "c_nationkey", "customer",
          "nation", "n_nationkey", "(-1)"),
        chk("lineitem.l_orderkey->orders", "l_orderkey", "lineitem",
          "orders", "o_orderkey", "(-1),(-2),(-3)"),
        chk("lineitem.l_partkey->part", "l_partkey", "lineitem",
          "part", "p_partkey", "(-1),(-2),(-3)"),
        chk("lineitem.l_suppkey->supplier", "l_suppkey", "lineitem",
          "supplier", "s_suppkey", "(-1),(-2),(-3)"),
        chk("nation.n_regionkey->region", "n_regionkey", "nation",
          "region", "r_regionkey", "(-1)"),
        chk("orders.o_custkey->customer", "o_custkey", "orders",
          "customer", "c_custkey", "(-1),(-2)"),
        chk("supplier.s_nationkey->nation", "s_nationkey", "supplier",
          "nation", "n_nationkey", "(-1)"))
        .mkString("", " UNION ALL ", " ORDER BY fk")
    },
    "q_dq_drift" ->
      ("WITH ev AS (SELECT CAST(least(9, CAST(floor(value / 50) AS INT)) AS INT) AS bin, " +
        "ts < TIMESTAMP '2024-01-08 00:00:00' AS is_ref FROM events " +
        "WHERE ts < TIMESTAMP '2024-01-08 00:00:00' " +
        "OR NOT (value < 50 AND event_id % 2 = 0)), " +
        "counts AS (SELECT bin, " +
        "CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref, " +
        "CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_cur " +
        "FROM ev GROUP BY bin), " +
        "tot AS (SELECT bin, c_ref, c_cur, " +
        "CAST(sum(c_ref) OVER () AS BIGINT) AS t_ref, " +
        "CAST(sum(c_cur) OVER () AS BIGINT) AS t_cur FROM counts), " +
        "p AS (SELECT bin, c_ref, c_cur, " +
        "(c_ref + 1.0) / (t_ref + 10.0) AS p_ref, " +
        "(c_cur + 1.0) / (t_cur + 10.0) AS p_cur FROM tot), " +
        "q AS (SELECT bin, c_ref, c_cur, p_ref, p_cur, " +
        "CAST(round(log10(p_ref) * 1000000) AS BIGINT) AS lr_micro, " +
        "CAST(round(log10(p_cur) * 1000000) AS BIGINT) AS lc_micro FROM p), " +
        "r AS (SELECT bin, c_ref, c_cur, " +
        "CAST(round((p_ref - p_cur) * (lr_micro - lc_micro)) AS BIGINT) AS psi_part_micro " +
        "FROM q) " +
        "SELECT bin, c_ref, c_cur, psi_part_micro, " +
        "CAST(sum(psi_part_micro) OVER () AS BIGINT) AS psi_total_micro, " +
        "CAST(sum(psi_part_micro) OVER () AS BIGINT) > 43429 AS is_drifted " +
        "FROM r ORDER BY bin"),
    "q_privacy_kanon" ->
      ("WITH cells AS (SELECT c_mktsegment AS seg, n_name, r_name, " +
        "CAST(count(*) AS BIGINT) AS n " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2, 3), " +
        "nat_ok AS (SELECT 'nation' AS grain, seg, n_name AS geo, n " +
        "FROM cells WHERE n >= 10), " +
        "reg_cells AS (SELECT seg, r_name, CAST(sum(n) AS BIGINT) AS n " +
        "FROM cells WHERE n < 10 GROUP BY 1, 2), " +
        "reg_ok AS (SELECT 'region' AS grain, seg, r_name AS geo, n " +
        "FROM reg_cells WHERE n >= 10), " +
        "supp AS (SELECT 'suppressed' AS grain, seg, '*' AS geo, " +
        "CAST(sum(n) AS BIGINT) AS n FROM reg_cells WHERE n < 10 GROUP BY 1, 2, 3) " +
        "SELECT * FROM (SELECT * FROM nat_ok UNION ALL SELECT * FROM reg_ok " +
        "UNION ALL SELECT * FROM supp) ORDER BY grain, seg, geo"),
    "q_reconcile_diff" ->
      ("WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders), " +
        "v2 AS (SELECT o_orderkey, CASE WHEN o_orderkey % 97 = 0 " +
        "THEN o_totalprice + 10.5 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 101 <> 0 " +
        "UNION ALL SELECT o_orderkey + 100000000, o_totalprice " +
        "FROM orders WHERE o_orderkey % 103 = 0), " +
        "j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k, " +
        "CASE WHEN a.o_orderkey IS NULL THEN 'added' " +
        "WHEN b.o_orderkey IS NULL THEN 'removed' " +
        "WHEN a.o_totalprice <> b.o_totalprice THEN 'changed' " +
        "ELSE 'unchanged' END AS status " +
        "FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey) " +
        "SELECT status, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum " +
        "FROM j GROUP BY status ORDER BY status"),
    "q_dq_rules" ->
      ("WITH b AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.08) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc, " +
        "CAST(sum(CASE WHEN NOT l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag, " +
        "CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null_key, " +
        "CAST(sum(CASE WHEN NOT (l_quantity > 0 AND l_quantity <= 45) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty " +
        "FROM lineitem), " +
        "j AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_fk, " +
        "CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL AND l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v_ship " +
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey) " +
        "SELECT 'discount_range' AS rule, v_disc AS n_violations, n AS n_checked FROM b " +
        "UNION ALL SELECT 'flag_domain', v_flag, n FROM b " +
        "UNION ALL SELECT 'not_null_orderkey', v_null_key, n FROM b " +
        "UNION ALL SELECT 'qty_range', v_qty, n FROM b " +
        "UNION ALL SELECT 'fk_orders', v_fk, n FROM j " +
        "UNION ALL SELECT 'ship_after_order', v_ship, n FROM j " +
        "ORDER BY rule"),
    "q_anomaly_zscore" ->
      ("WITH c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v FROM events), " +
        "st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s, " +
        "CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q " +
        "FROM c GROUP BY event_type) " +
        "SELECT c.event_type, max(st.n) AS n, " +
        "CAST(sum(CASE WHEN (st.n * c.v - st.s) * (st.n * c.v - st.s) > " +
        "4 * (st.n * st.q - st.s * st.s) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "round(CAST(max(st.s) AS DOUBLE) / 100.0 / max(st.n) * 100, 0) / 100 AS mean_value " +
        "FROM c JOIN st ON c.event_type = st.event_type " +
        "GROUP BY c.event_type ORDER BY c.event_type"),
    "q_cdc_apply" ->
      ("WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders), " +
        "log AS (SELECT k, 0 AS seq, 'I' AS op, price FROM base " +
        "UNION ALL SELECT k, 1, 'U', price + 5.0 FROM base WHERE k % 5 = 0 " +
        "UNION ALL SELECT k, 2, 'D', CAST(NULL AS DOUBLE) FROM base WHERE k % 7 = 0), " +
        "last AS (SELECT k, seq, op, price, " +
        "row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM log) " +
        "SELECT k, seq AS applied_seq, price FROM last " +
        "WHERE rn = 1 AND op <> 'D' ORDER BY k"),
    "q_dq_benford" ->
      ("WITH dg AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) " +
        "AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM orders), " +
        "c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY digit), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c), " +
        "e AS (SELECT c.digit, c.n, " +
        "CAST((1000000 * c.n) // t.total AS BIGINT) AS obs_millionths, " +
        "CAST(CASE c.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 " +
        "WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181 " +
        "WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152 " +
        "WHEN 9 THEN 45757 END AS BIGINT) AS exp_millionths FROM c, t) " +
        "SELECT digit, n, obs_millionths, exp_millionths, " +
        "abs(obs_millionths - exp_millionths) AS dev_millionths " +
        "FROM e ORDER BY digit"),
    "q_anomaly_mad" ->
      ("WITH c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) * " +
        "CASE WHEN event_id % 997 = 0 THEN 50 ELSE 1 END AS v FROM events), " +
        "g1 AS (SELECT event_type, v AS mv, CAST(count(*) AS BIGINT) AS w " +
        "FROM c GROUP BY 1, 2), " +
        "x1 AS (SELECT event_type, mv, " +
        "CAST(sum(w) OVER (PARTITION BY event_type ORDER BY mv " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw, " +
        "CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS totw FROM g1), " +
        "med AS (SELECT event_type, min(mv) AS med FROM x1 " +
        "WHERE cumw * 2 >= totw GROUP BY event_type), " +
        "dev AS (SELECT c.event_type, abs(c.v - med.med) AS ad " +
        "FROM c JOIN med ON c.event_type = med.event_type), " +
        "g2 AS (SELECT event_type, ad AS mv, CAST(count(*) AS BIGINT) AS w " +
        "FROM dev GROUP BY 1, 2), " +
        "x2 AS (SELECT event_type, mv, " +
        "CAST(sum(w) OVER (PARTITION BY event_type ORDER BY mv " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw, " +
        "CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS totw FROM g2), " +
        "mad AS (SELECT event_type, min(mv) AS mad FROM x2 " +
        "WHERE cumw * 2 >= totw GROUP BY event_type) " +
        "SELECT c.event_type, CAST(count(*) AS BIGINT) AS n, " +
        "max(med.med) AS median_cents, max(mad.mad) AS mad_cents, " +
        "CAST(sum(CASE WHEN abs(c.v - med.med) * 10000 > mad.mad * 44478 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM c JOIN med ON c.event_type = med.event_type " +
        "JOIN mad ON c.event_type = mad.event_type " +
        "GROUP BY c.event_type ORDER BY c.event_type"))
}

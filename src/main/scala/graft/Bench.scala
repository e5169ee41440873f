package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Prints ONE machine-readable JSON line as the very
  * last stdout bytes, sized to survive the driver's 2000-char tail capture:
  *
  *   - r1–r3 post-mortem: the driver keeps only the final 2000 characters
  *     of stdout. 87 full query names alone are 1,389 chars; with values
  *     the canonical line is ~2.1–2.2 KB, so every previous round lost the
  *     leading entries AND the `"metric":"total"` header (parsed: null).
  *   - Fix: the stdout line drops the shared `q_` name prefix (declared
  *     via `"prefix":"q_"`) and degrades precision ms→cs→ds→s until the
  *     line fits; past ~100 queries no full map fits at any precision, so
  *     the line keeps the SLOWEST entries up to the byte budget plus an
  *     `"elided"` count AND an `"isolated"` map (the 3-pass re-measures
  *     of the 10 slowest — reserved in the budget first, so the honest
  *     numbers always survive the tail capture even when sweep entries
  *     are elided). `build.sbt` sets `run / outputStrategy :=
  *     StdoutOutput` (no sbt `[info]` prefix on the line) and
  *     `Global / showSuccess := false` (no `[success] Total time …`
  *     trailer after it).
  *   - The complete canonical record (full `q_*` names, 3-decimal seconds,
  *     per-query + total) is additionally written to `bench_full.json` in
  *     the working directory so the full data survives regardless of the
  *     capture window.
  *
  * A failed query records -1 (−1000 ms) rather than masquerading as fast.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional args: bench only these query names (local iteration aid;
    // the driver passes none → full run)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4 defaults, pinned: docs/SCALING.md prescribes runtime
      // re-planning + skew-split as part of the 100 TB posture
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optimization-round measurement aid (guide §1.5): SPARK_GRAFT_PROFILE=1
    // prints one stderr line per Spark job (wall ms + description) so a hot
    // query's time decomposes into its constituent jobs without the UI.
    // Inert unless the env var is set — the driver's runs never see it.
    val profiling = sys.env.contains("SPARK_GRAFT_PROFILE")
    if (profiling) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          t0.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description")).getOrElse("") +
              " stages=" + js.stageInfos.size))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(t0.remove(je.jobId)).foreach { case (t, desc) =>
            // absolute start/end stamps let a reader compute the DRIVER
            // gaps between jobs (planning/codegen/analysis), not just the
            // job wall — the r19 er_resolve hunt needed exactly this
            System.err.println(
              f"[prof] job ${je.jobId}%4d ${(System.nanoTime() - t) / 1e6}%8.1f ms  " +
                f"start=${t / 1000000}%d end=${System.nanoTime() / 1000000}%d  $desc")
          }
      })
    }
    // Untimed warm-up. Whichever query runs first otherwise absorbs ~4.5 s
    // of one-time session cost (codegen JIT, file-format writer/committer
    // init): r3's "q_source_orc_roundtrip regressed 4.5x" was exactly this
    // attribution artifact — 5.8 s as the session's first query, 1.4 s
    // steady-state (docs/PLANS.md "r4 bench warm-up").
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_warm").toString
      val warm = spark.range(0, 100000)
        .selectExpr("id", "cast(id as string) s", "cast(id as double) d")
      warm.groupBy(org.apache.spark.sql.functions.expr("id % 7")).count().count()
      Seq("parquet", "orc", "csv", "json").foreach { f =>
        val p = s"$tmp/$f"
        warm.limit(1000).write.format(f).mode("overwrite").save(p)
        spark.read.format(f).load(p).count()
      }
      // streaming infra warm-up (StreamExecution, memory sink, state store
      // providers — HDFSBacked default AND RocksDB, which
      // q_stream_stateful_tws needs): a 2-row windowed aggregate per
      // provider, nothing resembling the timed queries' plans
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col, window}
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      implicit val evEnc: org.apache.spark.sql.Encoder[graft.streaming.Ev] =
        org.apache.spark.sql.Encoders.product[graft.streaming.Ev]
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val defaultProvider = spark.conf.get(providerKey)
      Seq(defaultProvider,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .foreach { prov =>
          spark.conf.set(providerKey, prov)
          try {
            val ms = MemoryStream[graft.streaming.Ev]
            val q = ms.toDF().withWatermark("ts", "1 minute")
              .groupBy(window(col("ts"), "1 minute")).count()
              .writeStream.outputMode("append").format("memory")
              .queryName("graft_bench_warm_stream").start()
            ms.addData(graft.streaming.Ev(1L,
              java.time.Instant.parse("2024-01-01T00:00:00Z"), 1L, "w", 1.0))
            q.processAllAvailable()
            ms.addData(graft.streaming.Ev(2L,
              java.time.Instant.parse("2030-01-01T00:00:00Z"), 1L, "w", 1.0))
            q.processAllAvailable()
            q.stop()
          } finally spark.conf.set(providerKey, defaultProvider)
        }
    }
    // args given → run exactly those, IN ARG ORDER (lets local iteration
    // choose which family member pays a shared memo build); no args → the
    // driver's full run, name-sorted for stable attribution
    val results: Seq[(String, Double)] = (
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else args.toSeq.distinct.flatMap(n => SparkEntry.queries.get(n).map(n -> _)))
      .map { case (name, fn) =>
        if (profiling) System.err.println(s"[prof] >>> $name")
        val t0 = System.nanoTime()
        val sec =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        name -> sec
      }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).filter(_ >= 0).sum
    // ISOLATED RE-MEASURE (full runs only): the 10 slowest sweep entries
    // re-run sequentially after the sweep, 3 passes each, keeping the
    // fastest pass. Full-sweep numbers inherit one-time session costs,
    // shared memo/staged-index builds, page-cache state from the ~225
    // queries before them, and whatever else the sandbox runs concurrently
    // — the r9 driver run showed five 4–10× "regressions" that re-measured
    // clean in isolation (docs/SCALING.md "bench variance protocol").
    // Recording both numbers per round makes a contention artifact
    // distinguishable from a real regression without any external
    // re-measure: isolated ≪ sweep ⇒ contention; isolated ≈ sweep ⇒ real.
    // Each pass drops the session memo first — the re-measure shares the
    // sweep's JVM, so a memoized query would otherwise be timed as a cache
    // read (q_dedup_cluster: 0.06 s "isolated" vs a 9 s sweep entry in
    // r10), voiding the inference above. Cleared-memo isolation means a
    // family member that amortized a shared build in the sweep pays it
    // standalone here, so isolated > sweep is possible and honest; staged
    // on-disk indices and trained codebooks are retained (they persist
    // across JVMs, so both numbers reuse them alike).
    val isolated: Seq[(String, Double)] =
      if (args.nonEmpty) Seq.empty
      else results.filter(_._2 >= 0).sortBy(-_._2).take(10).map { case (name, _) =>
        val fn = SparkEntry.queries(name)
        val passes = (0 until 3).map { _ =>
          graft.operators.LlmData.clearMemo(spark)
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch {
            case e: Throwable =>
              // same diagnostics as the sweep path — a -1.0 in the
              // canonical record must be explainable from the log
              System.err.println(s"[bench] isolated $name failed: ${e.getMessage}")
              Double.MaxValue
          }
        }
        name -> (if (passes.min == Double.MaxValue) -1.0 else passes.min)
      }
    // r18 verdict item 9: keys whose ISOLATED re-measure reads a
    // driver-held model cache deliberately retained across clearMemo
    // (trained PQ/IVF codebooks, the OPQ model, the incremental batch
    // count) or a staged on-disk index — for these the isolated number is
    // a warm-model read and the sweep number carries the build; naming
    // them in the record stops a reader from quoting isolated as full
    // cost. Retention is intentional: the artifacts persist across JVMs
    // anyway, so both numbers reuse them ALIKE only when they are on
    // disk — the JVM-held models are the asymmetry this flags.
    def memoRetained(name: String): Boolean =
      name.startsWith("q_simsearch_") || name == "q_embed_pq" ||
        name == "q_dedup_incremental"
    val retainedPart = {
      val names = isolated.map(_._1).filter(memoRetained)
      if (names.isEmpty) ""
      else names.map(n => s""""${n.stripPrefix("q_")}"""")
        .mkString(""","memo_retained":[""", ",", "]")
    }
    // complete canonical record — full names, seconds — to a repo file.
    // bench_full.json is cross-round comparable ONLY for full runs, so a
    // subset run (args given) writes bench_subset.json instead of
    // clobbering the canonical record with incomparable totals.
    //
    // r16 verdict item 8: the file is JSONL with a "role" field per line —
    // the CANONICAL record (the best clean full run at the CURRENT key
    // count, carried forward verbatim across runs) plus this run's SWEEP
    // record — so a host-contended driver sweep no longer overwrites the
    // clean number and cross-round diffs compare canonical-to-canonical.
    // A run over a different key count resets the canonical (totals are
    // only comparable at equal n).
    val fullQs = results.map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val isoQs =
      (if (isolated.isEmpty) ""
      else isolated.map { case (k, v) => s"\"$k\":${fmt(v)}" }
        .mkString(""","isolated":{""", ",", "}")) + retainedPart
    // key-set fingerprint: totals are only comparable over the SAME keys —
    // equal counts with one key swapped for another would otherwise carry
    // an incomparable canonical forward (r17 advisory)
    val kset = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(results.map(_._1).sorted.mkString(",").getBytes("UTF-8"))
      md.digest().take(4).map("%02x".format(_)).mkString
    }
    def record(role: String): String =
      s"""{"role":"$role","metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"kset":"$kset","queries":$fullQs$isoQs,"sf":"$sfDir"}"""
    val recordFile = if (args.isEmpty) "bench_full.json" else "bench_subset.json"
    // prior canonical at the same key count and a lower-or-equal total
    // survives; otherwise this run becomes the canonical
    val priorCanonical: Option[(Double, Long, Option[String], String)] =
      try {
        val p = java.nio.file.Paths.get(recordFile)
        if (!java.nio.file.Files.exists(p)) None
        else {
          import scala.jdk.CollectionConverters._
          val vRe = """"value":([0-9.]+)""".r
          val nRe = """"n":(\d+)""".r
          val kRe = """"kset":"([0-9a-f]+)"""".r
          java.nio.file.Files.readAllLines(p).asScala
            .find(_.contains("\"role\":\"canonical\""))
            .flatMap { line =>
              for {
                v <- vRe.findFirstMatchIn(line).map(_.group(1).toDouble)
                n <- nRe.findFirstMatchIn(line).map(_.group(1).toLong)
              } yield (v, n, kRe.findFirstMatchIn(line).map(_.group(1)), line)
            }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] prior record unreadable: $e"); None
      }
    // carry the prior canonical ONLY over an identical key set (a prior
    // record without a fingerprint resets — safe, never incomparable)
    val (canonicalLine, canonicalTotal) = priorCanonical match {
      case Some((v, n, Some(k), line))
        if n == results.size && k == kset && v <= total => (line, v)
      case _ => (record("canonical"), total)
    }
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(recordFile),
        (canonicalLine + "\n" + record("sweep") + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    val canonPart =
      s""""canonical_total":${fmt(canonicalTotal)},"canonical_n":${results.size},"""
    // compact stdout line — must fit the 2000-char tail window whole
    def compact(scale: Long, unit: String): String = {
      val qs = results.map { case (k, v) =>
        s"\"${k.stripPrefix("q_")}\":${math.round(v * scale)}"
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$canonPart"qunit":"$unit","prefix":"q_","queries":$qs}"""
    }
    // Degrade precision until the line fits the window. If even integer
    // seconds overflow (96 queries put the cs line at 2052 chars in r4;
    // 104 put the s line past it too), keep the SLOWEST queries — the
    // entries a reader acts on — up to the byte budget and say how many
    // were elided; bench_full.json above carries the canonical record.
    def slowest(scale: Long, unit: String): String = {
      // mean_ms normalizes totals across rounds with growing query counts
      val meanMs = if (results.nonEmpty) math.round(total * 1000 / results.size) else 0L
      // the isolated re-measures ride the CANONICAL stdout line (r10
      // verdict item 7): the sweep's tail entries are contention-noisy,
      // and without isolated_ms beside them every reader must re-derive
      // which "regressions" are artifacts — the honest numbers are
      // reserved in the byte budget FIRST, sweep entries fill what's left
      val isoPart =
        (if (isolated.isEmpty) ""
        else isolated.map { case (k, v) =>
          s"\"${k.stripPrefix("q_")}\":${math.round(v * scale)}"
        }.mkString(""","isolated":{""", ",", "}")) + retainedPart
      val header = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$canonPart"qunit":"$unit","prefix":"q_","n":${results.size},"mean_ms":$meanMs,"queries_file":"bench_full.json","slowest":{"""
      val entries = results.sortBy(-_._2).iterator
        .map { case (k, v) => s"\"${k.stripPrefix("q_")}\":${math.round(v * scale)}" }
      val sb = new StringBuilder(header)
      var n = 0
      var done = false
      entries.takeWhile(_ => !done).foreach { e =>
        val sep = if (n == 0) 0 else 1
        // +40 slack for the closing `},"elided":NNN}` tail
        if (sb.length + sep + e.length + 40 + isoPart.length <= 1990) {
          if (n > 0) sb.append(',')
          sb.append(e); n += 1
        } else done = true
      }
      sb.append(s"""},"elided":${results.size - n}$isoPart}""").toString
    }
    val line = Seq(compact(1000L, "ms"), compact(100L, "cs"),
        compact(10L, "ds"), compact(1L, "s"))
      .find(_.length <= 1990).getOrElse(slowest(1000L, "ms"))
    println(line)
    spark.stop()
  }
}

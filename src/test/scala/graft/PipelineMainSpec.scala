package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdkHttpTransport, PipelineMain, Zip}

/** Integration test for the composed driver: both reference DAG chains run
  * end-to-end over real HTTP (stub Dock API + production JdkHttpTransport),
  * the real landing fixtures, the distributed transfer, and the ingest
  * core — the chain at script-dag-dock-report:263-269 as one program.
  */
class PipelineMainSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark

  private def withStubApi[A](landing: java.nio.file.Path)(
      body: String => A): A = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    // first auth/report attempts fail: the chain must survive via Retry
    val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/oauth2/token", (ex: HttpExchange) =>
      if (flaky.getAndIncrement() == 0) reply(ex, "{}") // missing token → retry
      else reply(ex, """{"access_token": "tok-it"}"""))
    server.createContext("/report", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("ticket=")) reply(ex, """{"file": "balance_00.zip"}""")
      else reply(ex, """{"ticket": "T-42"}""")
    })
    server.createContext("/accounts", (ex: HttpExchange) => {
      val acct = ex.getRequestURI.getPath.split("/")(2)
      val idx = math.abs(acct.hashCode) % 4
      reply(ex, s"""{"fileName": "balance_0$idx.zip"}""")
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("q_source_gzip_roundtrip actually lands gzip files (no silent codec fallback)") {
    val out = sources.PipelineIngest.queries("q_source_gzip_roundtrip")(
      s, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_out", "q_source_gzip")
    val st = java.nio.file.Files.list(dir)
    val dataFiles =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toList
      } finally st.close()
    assert(dataFiles.nonEmpty)
    assert(dataFiles.forall(_.endsWith(".json.gz")),
      s"codec must land as .json.gz, saw: $dataFiles")
  }

  test("report DAG runs end-to-end and lands the exact fixture aggregate") {
    val landing = Fixtures.ensure(
      Paths.get(sys.props("java.io.tmpdir"), "graft_landing"))(
      Zip.writeLandingFixtures(_))
    val workDir = Fixtures.tempDirCleanedAtExit("graft_pipeline_it_")
    val got = withStubApi(landing) { base =>
      PipelineMain.runReportDag(s, new JdkHttpTransport(), base,
        "client", "secret", landing, workDir,
        java.time.LocalDate.of(2024, 1, 5), retryDelayMs = 10)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(2)))
    }
    // same formula that generates the fixtures (integer cents → exact)
    val want = (0 until 4).map { dayIdx =>
      val cents = (0 until 1000).filter(_ % 4 == dayIdx)
        .map(i => (i * 37) % 1000).sum
      (f"2024-01-${1 + dayIdx}%02d", 250L,
        BigDecimal(cents).setScale(2) / 100)
    }
    assert(got.toSeq === want)
    // the transfer stage really ran: the transferred copy is on disk
    assert(Files.exists(workDir.resolve("transferred").resolve("balance_00.zip")))
  }

  test("statements DAG fans out per account and senses every landed file") {
    val landing = Fixtures.ensure(
      Paths.get(sys.props("java.io.tmpdir"), "graft_landing"))(
      Zip.writeLandingFixtures(_))
    val rows = withStubApi(landing) { base =>
      PipelineMain.runStatementsDag(s, new JdkHttpTransport(), base,
        "client", "secret", Seq("acct-a", "acct-b"), landing,
        java.time.LocalDate.of(2024, 1, 5), retryDelayMs = 10)
        .collect()
    }
    assert(rows.map(_.getString(0)).toSeq === Seq("acct-a", "acct-b"))
    rows.foreach { r =>
      assert(r.getString(1).matches("balance_0[0-3]\\.zip"))
      assert(r.getLong(2) > 0)
    }
  }

  test("backfill lands a 3-day range idempotently (sequential max_active_runs=1 loop)") {
    val d = TestSpark.sf
    val out = Fixtures.tempDirCleanedAtExit("graft_backfill_")
      .resolve("lake").toString
    // the first three calendar days the fixture actually contains
    val fixtureDays = Tables(s, d, "events")
      .select(to_date(col("ts")).as("day")).distinct().orderBy("day")
      .collect().map(_.getDate(0).toLocalDate)
    assert(fixtureDays.length >= 3, "fixture must span at least 3 days")
    val from = fixtureDays.head
    val span = (fixtureDays(2).toEpochDay - from.toEpochDay + 1).toInt
    val first = PipelineMain.backfillDays(s, d, out, from, span)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the lake holds exactly the backfilled days, with the fixture's values
    val want = Tables(s, d, "events")
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
      .where(col("day").between(
        java.sql.Date.valueOf(from), java.sql.Date.valueOf(fixtureDays(2))))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0)).cast("long").as("sum_cents"))
      .withColumn("day", col("day").cast("string")).orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(first === want)
    assert(first.map(_._1).toSet ===
      fixtureDays.take(3).map(_.toString).toSet,
      "the lake must contain ONLY the backfilled range")
    // IDEMPOTENCE: a second full backfill over the same range re-overwrites
    // each day with identical content — byte-identical terminal state
    val second = PipelineMain.backfillDays(s, d, out, from, span)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(second === first)
  }

  test("backfill of a range with no source events returns an empty audit, not a crash") {
    val d = TestSpark.sf
    val out = Fixtures.tempDirCleanedAtExit("graft_backfill_empty_")
      .resolve("lake").toString
    // a decade before the fixture's span: every per-day landing is an empty
    // dynamic overwrite, so no parquet footer ever exists to read back —
    // the documented all-days-empty no-op must still produce the audit shape
    val audit = PipelineMain.backfillDays(
      s, d, out, java.time.LocalDate.of(1990, 1, 1), nDays = 3)
    assert(audit.columns.toSeq === Seq("day", "n", "sum_cents"))
    assert(audit.count() === 0L)
  }
}

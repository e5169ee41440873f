package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two reference DAGs composed as one runnable driver program — the
  * chain the reference declares at script-dag-dock-report:263-269
  * (`auth >> request >> ticket >> sense >> transfer >> unzip >> ingest`)
  * and script-dag-dock-statements.py:240-245, each stage under the retry
  * policy (`default_args`, script-dag-dock-report:21-22) with the fire time
  * from the daily cron (script-dag-dock-report:227).
  *
  * Every stage is the engine's own operator: [[RestIngest]] over an
  * injectable [[HttpTransport]] (the [[JdkHttpTransport]] in production),
  * [[LandingSensor.await]] for the SFTP sensor, [[Transfer.transferDir]]
  * for the distributed byte-copy with in-engine integrity proof, and
  * [[PipelineIngest.ingestLanding]] for decompress→parse→validate→land.
  *
  * `main` is self-contained for this sandbox (no external endpoints
  * exist): it serves the Dock API shapes from an in-process HTTP stub and
  * drives BOTH DAGs through the real [[JdkHttpTransport]] over real
  * sockets, against the deterministic landing fixtures.
  */
object PipelineMain extends Logging {

  /** Balance-report DAG end-to-end. Returns the landed daily aggregate
    * (same shape as q_pipeline_ingest). `today` is a parameter so the
    * yesterday-window arithmetic (script-dag-dock-report:59) is
    * deterministic under test.
    */
  def runReportDag(s: SparkSession, http: HttpTransport, baseUrl: String,
      clientId: String, secret: String, landing: Path, workDir: Path,
      today: java.time.LocalDate, attempts: Int = 3,
      retryDelayMs: Long = 1000, sensorTimeoutMs: Long = 5000): DataFrame = {
    val ingest = new RestIngest(http, baseUrl)
    // each REST stage under the reference's retry budget; the token is
    // re-acquired INSIDE each retried attempt (the reference
    // re-authenticates per task, script-dag-dock-report:97) — a token that
    // expires mid-DAG must not poison every remaining retry, which a
    // single token captured up front would
    val day = today.minusDays(1).toString
    val ticket = Retry.withRetry(attempts, retryDelayMs)(
      ingest.requestReport(ingest.authenticate(clientId, secret), day))
    val file = Retry.withRetry(attempts, retryDelayMs)(
      ingest.getTicketFile(ingest.authenticate(clientId, secret), ticket))
    logInfo(s"report DAG: day=$day ticket=$ticket file=$file")

    // sense_file on the EXACT file the ticket promised
    require(LandingSensor.await(landing.resolve(file),
      timeoutMs = sensorTimeoutMs, pokeIntervalMs = 250),
      s"landed file $file did not appear within the sensor timeout")

    // transfer_file: distributed copy + in-engine integrity proof; a
    // checksum mismatch aborts the run before ingest sees a byte
    val transferred = workDir.resolve("transferred")
    val integrity = Transfer.transferDir(s, landing.toString, transferred.toString)
    // NULL-safe gate: a full_outer row where the file exists on only one
    // side has NULL match flags — `!NULL` is NULL and a plain WHERE drops
    // it, counting a MISSING file as not-broken; anything not provably
    // matched is broken
    val broken = integrity
      .where(not(col("bytes_match") <=> true) ||
        not(col("checksum_match") <=> true)).count()
    require(broken == 0, s"$broken file(s) failed transfer integrity")

    PipelineIngest.ingestLanding(s, transferred.toString,
      workDir.resolve("report_out").toString)
  }

  /** Statements DAG: authenticate once, fan the statement request out over
    * the account list (script-dag-dock-statements.py:240-245 runs one task
    * per account), sense each produced file. Returns one row per account
    * with the landed file and its size — the DAG's terminal state.
    */
  def runStatementsDag(s: SparkSession, http: HttpTransport, baseUrl: String,
      clientId: String, secret: String, accountIds: Seq[String],
      landing: Path, today: java.time.LocalDate, attempts: Int = 3,
      retryDelayMs: Long = 1000, sensorTimeoutMs: Long = 5000): DataFrame = {
    import s.implicits._
    val ingest = new RestIngest(http, baseUrl)
    val landed = accountIds.map { acct =>
      // token re-acquired inside each attempt (same rationale as the
      // report DAG): a stale token must not poison the retry budget
      val file = Retry.withRetry(attempts, retryDelayMs)(
        ingest.requestStatements(
          ingest.authenticate(clientId, secret), acct, today))
      require(LandingSensor.await(landing.resolve(file),
        timeoutMs = sensorTimeoutMs, pokeIntervalMs = 250),
        s"statements file $file for $acct did not appear")
      (acct, file, Files.size(landing.resolve(file)))
    }
    landed.toDF("account_id", "file", "bytes").orderBy("account_id")
  }

  /** BACKFILL driver — the operational piece the reference leaves switched
    * off (`catchup=False`, script-dag-dock-report:228): deliberately re-land
    * a closed date range, one day per run. Semantics mirror what an Airflow
    * backfill with `max_active_runs=1` (script-dag-dock-report:229) would
    * do over the per-day `replace=True` landing the reference's loader uses:
    *
    *  - STRICTLY SEQUENTIAL — one day's run completes (lands and is
    *    readable) before the next starts; no two runs write concurrently.
    *    Within each run the landing itself is fully distributed; it is the
    *    RUNS that serialize, exactly like `max_active_runs=1`.
    *  - PARTITION-SCOPED — each run is a dynamic-partition overwrite
    *    carrying exactly one day, so it replaces that day and cannot touch
    *    any other (the `q_upsert_partition` primitive in a loop).
    *  - IDEMPOTENT — re-running any subrange overwrites those days with
    *    identical content; a day with no source rows is a no-op run (the
    *    dynamic overwrite of an empty frame replaces nothing), matching a
    *    scheduler firing on a day with no data.
    *
    * Returns the lake's per-day terminal state (count + exact cent sum),
    * the audit a backfill operator reads to confirm the re-land.
    */
  def backfillDays(s: SparkSession, sfDir: String, out: String,
      from: java.time.LocalDate, nDays: Int): DataFrame = {
    require(nDays >= 1, s"backfill range must be non-empty, got $nDays")
    val ev = graft.Tables(s, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      (0 until nDays).map(from.plusDays(_)).foreach { day =>
        logInfo(s"backfill: landing $day into $out")
        ev.where(col("day") === lit(java.sql.Date.valueOf(day)))
          .write.mode("overwrite").partitionBy("day").parquet(out)
      }
    } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // ONE audit shape for both exits — a schema change cannot silently
    // diverge the empty-range result from the normal one
    def audit(df: DataFrame): DataFrame = df
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0)).cast("long").as("sum_cents"))
      .withColumn("day", col("day").cast("string"))
      .orderBy("day")
    // a range whose every day landed zero rows leaves no parquet footer to
    // infer a schema from (or no lake dir at all) — that is the documented
    // all-days-empty no-op, so return the empty audit instead of letting
    // the read throw
    try audit(s.read.parquet(out))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Unable to infer schema") ||
            e.getMessage.contains("Path does not exist") =>
        audit(ev.limit(0))
    }
  }

  /** In-process Dock API stub serving the reference's response shapes, so
    * `main` exercises the production transport over real HTTP.
    */
  private def startStubApi(landing: Path): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/oauth2/token",
      (ex: HttpExchange) => reply(ex, """{"access_token": "tok-stub"}"""))
    server.createContext("/report", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("ticket=")) reply(ex, """{"file": "balance_00.zip"}""")
      else reply(ex, """{"ticket": "T-1"}""")
    })
    // statements: each account maps to one of the landed fixture archives
    server.createContext("/accounts", (ex: HttpExchange) => {
      val acct = ex.getRequestURI.getPath.split("/")(2)
      // floorMod: math.abs(Int.MinValue) is still negative — a hashCode of
      // Int.MinValue would otherwise mint a nonexistent file name
      val idx = java.lang.Math.floorMod(acct.hashCode, 4)
      reply(ex, s"""{"fileName": "balance_0$idx.zip"}""")
    })
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("graft-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val landing = graft.Fixtures.ensure(
      Paths.get(sys.props("java.io.tmpdir"), "graft_landing"))(
      Zip.writeLandingFixtures(_))
    val workDir = graft.Fixtures.tempDirCleanedAtExit("graft_pipeline_main_")
    // next fire of the reference's daily cron, logged the way a scheduler
    // banner would (catchup=False → single next run)
    val now = System.currentTimeMillis() / 1000
    val fireAt = CronSchedule.nextAfter("30 8 * * *", now)
    println(s"[pipeline] next scheduled fire (30 8 * * * UTC): epoch $fireAt " +
      s"(in ${fireAt - now}s); running now")
    val api = startStubApi(landing)
    try {
      val base = s"http://127.0.0.1:${api.getAddress.getPort}"
      val http = new JdkHttpTransport()
      val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      val report = runReportDag(spark, http, base, "client", "secret",
        landing, workDir, today)
      println("[pipeline] report DAG daily aggregate:")
      report.show(truncate = false)
      val stmts = runStatementsDag(spark, http, base, "client", "secret",
        Seq("acct-1", "acct-2", "acct-3"), landing, today)
      println("[pipeline] statements DAG landed files:")
      stmts.show(truncate = false)
    } finally {
      api.stop(0)
      spark.stop()
    }
  }
}

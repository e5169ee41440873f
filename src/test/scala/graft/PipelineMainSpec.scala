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
}

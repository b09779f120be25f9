package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import graft.registry.CubeRegistry
import graft.server.GraftServer

/** Serving-throughput artifact: requests/sec and latency percentiles for
  * the HTTP facade at the reference's record-limit page size (500 cells,
  * slicer.ini:9), published into COVERAGE.md next to the recall tables.
  * ServerSpec proves a concurrent storm is CORRECT; this records how fast
  * the served path actually is, so regressions in the per-request
  * plan-build + collect cost are visible round over round. The floor only
  * catches the mechanism collapsing (single-digit reqs/sec would mean a
  * full re-scan per request crept in).
  */
class ServerThroughputSpec extends SparkSpec {

  private lazy val registry = {
    val r = new CubeRegistry
    r.register(TestCubes.lineitemModel, TestCubes.lineitemDf(spark, sf()))
    r
  }
  private lazy val server = { val s = new GraftServer(registry); s.start(); s }
  private lazy val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def get(path: String): Int = {
    val req = HttpRequest.newBuilder(
      URI.create(s"http://localhost:${server.boundPort}$path")).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  test("gated throughput at 500-cell aggregate pages; COVERAGE.md block refreshed") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    // l_orderkey drilldown at sf0.001 has ~1.4k groups; pagesize 500 is
    // the reference record limit — a full slicer-sized page per request
    val path = "/cube/lineitem/aggregate?drilldown=l_orderkey&page=0&pagesize=500"
    assert(get(path) == 200)
    (1 to 3).foreach(_ => get(path)) // warmup: codegen + plan cache
    val concurrency = 4
    val perThread = 15
    val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val lats = Await.result(Future.traverse(1 to concurrency) { _ =>
      Future {
        (1 to perThread).map { _ =>
          val s = System.nanoTime()
          assert(get(path) == 200)
          (System.nanoTime() - s) / 1e3 // µs
        }
      }
    }, 5.minutes).flatten.sorted
    val wallSec = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    val n = lats.size
    val rps = n / wallSec
    def pct(p: Double): Double = lats((p * (n - 1)).round.toInt) / 1e3 // ms
    info(f"$n reqs, concurrency $concurrency: $rps%.1f req/s, " +
      f"p50 ${pct(0.50)}%.0f ms, p95 ${pct(0.95)}%.0f ms")
    assert(rps > 1.0, f"served path collapsed: $rps%.2f req/s")

    val begin = "<!-- server-throughput:begin -->"
    val end = "<!-- server-throughput:end -->"
    val block =
      s"""$begin
         |Measured by ServerThroughputSpec on the live HTTP facade:
         |${n} aggregate requests (drilldown=l_orderkey, pagesize=500 — the
         |reference record limit, slicer.ini:9) at concurrency $concurrency
         |over the sf0.001 lineitem cube, after 3 warmup requests.
         |
         || metric | value |
         ||---|---|""".stripMargin + "\n" +
        f"| requests/sec | $rps%.1f |%n" +
        f"| p50 latency | ${pct(0.50)}%.0f ms |%n" +
        f"| p95 latency | ${pct(0.95)}%.0f ms |%n" +
        f"| p99 latency | ${pct(0.99)}%.0f ms |%n" +
        end
    val p = Paths.get("COVERAGE.md")
    val current = new String(Files.readAllBytes(p), "UTF-8")
    val updated =
      if (current.contains(begin))
        current.substring(0, current.indexOf(begin)) + block +
          current.substring(current.indexOf(end) + end.length)
      else
        current + s"\n## Server throughput (spec-generated)\n\n$block\n"
    Files.write(p, updated.getBytes("UTF-8")): Unit
  }
}

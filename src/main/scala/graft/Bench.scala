package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Queries run in sorted-name order
  * after one untimed warmup query, so per-query numbers aren't polluted by
  * JVM/codegen warmup landing on whichever query ran first.
  */
object Bench {

  private def load1: Option[Double] =
    try Some(java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .trim.split("\\s+")(0).toDouble)
    catch { case _: Throwable => None }

  /** Load-gate: ambient load swings bench totals 2-3× on a shared box
    * (three rounds of BENCH files needed an idle re-run to interpret), so
    * REFUSE to start while load1 exceeds the threshold — sleep-retry a
    * bounded number of times and report how long we waited. If the box
    * never quiets down we run anyway (a stamped-but-noisy line beats no
    * line) — the emitted `load1` field still tells the reader.
    */
  private def awaitQuietBox(threshold: Double, maxAttempts: Int,
      sleepSec: Int): Int = {
    var attempts = 0
    while (attempts < maxAttempts && load1.exists(_ > threshold)) {
      System.err.println(s"[bench] load1=${load1.getOrElse(-1.0)} > " +
        s"$threshold; waiting ${sleepSec}s (${attempts + 1}/$maxAttempts)")
      Thread.sleep(sleepSec * 1000L)
      attempts += 1
    }
    attempts
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gateAttempts = awaitQuietBox(threshold = 2.0, maxAttempts = 20,
      sleepSec = 30)
    // ambient load BEFORE Spark starts: the end-of-run stamp includes the
    // bench's own 32 threads (a 95 s burst alone pushes load1 to 3-6), so
    // only the pre-run number measures what ELSE the box was doing
    val loadStart = load1.getOrElse(-1.0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("a03_summary")(spark, sfDir).count() // warmup
    catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // release operator-persisted intermediates between queries so cached
      // blocks don't accumulate across the run (storage-memory churn)
      graft.engine.CacheScope.drain()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // machine-state stamp: ambient load swings totals 2-3x on this box, so
    // a bench line is only interpretable next to the load it ran under
    val load = try {
      val parts = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")
      s""","load1":${parts(0)},"load5":${parts(1)},"load15":${parts(2)}"""
    } catch { case _: Throwable => "" }
    val up = try {
      val secs = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/uptime")).trim.split("\\s+")(0)
      s""","uptime_sec":$secs"""
    } catch { case _: Throwable => "" }
    val gate = s""","load1_start":$loadStart,"load_gate_attempts":$gateAttempts,"load_gate_threshold":2.0"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$load$up$gate}""")
    spark.stop()
  }
}

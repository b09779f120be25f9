package graft

import org.apache.spark.sql.SparkSession

/** Scratch experiment harness for the r14 optimization round. */
object OptLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("LAB_CKPT_FM").filter(_.nonEmpty)
      .fold(b0)(c => b0.config(
        "spark.sql.streaming.checkpointFileManagerClass", c))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[lab] pid=${ProcessHandle.current().pid()}")
    for (r <- 1 to 3; q <- Seq("x123_stream_ewma", "x84_stream_interval_join",
        "x20_stream_tumbling")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      if (r > 1) println(f"[lab] $q run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.engine.CacheScope.drain()
    }
    spark.stop()
  }
}

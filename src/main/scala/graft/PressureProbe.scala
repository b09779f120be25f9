package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe: runs the heaviest x-tail queries under a
  * deliberately starved execution-memory budget and reports whether they
  * SPILL (the correct behavior under pressure) or die. This is the one
  * 100 TB risk class the empirical 10× growth runs cannot see — at sf1
  * everything fits in the 8 GiB bench heap, so shuffle/aggregate/sort
  * operators never exercise their spill paths there.
  *
  * Mechanics: `SPARK_DRIVER_MEM` shrinks the JVM heap (build.sbt wires it
  * to -Xmx) and `SPARK_GRAFT_MEM_FRACTION` shrinks
  * `spark.memory.fraction` — the unified execution+storage pool — so
  * per-task execution memory is a small slice of an already-small heap
  * (e.g. 3g × 0.15 / 32 threads ≈ 14 MiB/task, the same order a 100 TB
  * shuffle partition sees on a contended executor). A task that needs
  * more must spill through UnsafeExternalSorter/ExternalAppendOnlyMap;
  * the probe asserts rows were produced and prints the accumulated
  * task-level spill metrics as one JSON line per query (memory spilled =
  * in-memory size of spilled data, disk = bytes written; peak = max
  * single-task execution memory).
  *
  * Usage:
  *   SPARK_DRIVER_MEM=3g SPARK_GRAFT_MEM_FRACTION=0.15 \
  *     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.PressureProbe [names…]"
  */
object PressureProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.15")
    val names: Seq[String] =
      if (args.nonEmpty) args.toIndexedSeq
      else Seq("x74_substring_dedup", "x86_pagerank", "x87_triangles",
        "x92_ppjoin_pairs")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.fraction", fraction)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val peakExec = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled): Unit
          spillDisk.addAndGet(m.diskBytesSpilled): Unit
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
          peakExec.getAndAccumulate(m.peakExecutionMemory, math.max): Unit
        }
      }
    })

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    names.foreach { name =>
      spillMem.set(0); spillDisk.set(0); peakExec.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try {
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          Right(n)
        } catch { case e: Throwable => Left(e.toString.take(200)) }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously (private bus — no public
      // drain hook); a short settle keeps the counters honest for these
      // multi-second probes where the tail events land in milliseconds
      Thread.sleep(500)
      val status = outcome match {
        case Right(n) => s""""rows":$n,"ok":true"""
        case Left(err) => s""""ok":false,"error":${graft.util.Json.str(err)}"""
      }
      println(s"""{"probe":"$name",$status,"sec":${f"$sec%.1f"},""" +
        s""""heap_mb":$heapMb,"memory_fraction":$fraction,""" +
        s""""spill_mem_mb":${spillMem.get / (1024 * 1024)},""" +
        s""""spill_disk_mb":${spillDisk.get / (1024 * 1024)},""" +
        s""""shuffle_write_mb":${shuffleWrite.get / (1024 * 1024)},""" +
        s""""peak_task_exec_mb":${peakExec.get / (1024 * 1024)}}""")
      graft.engine.CacheScope.drain()
    }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Fault-injection for the connected-components loop (Dedup.components),
  * the one iterative driver-coordinated operator in the engine: on a
  * 1000-executor cluster a 20-round loop WILL see executor churn, and the
  * reliable-checkpoint flavor exists exactly for that. These specs prove
  * the recovery paths rather than assuming them:
  *
  *  - task-level churn: the edge source throws on its first attempts
  *    (as a killed executor's tasks would); local[4,4] retries must
  *    absorb it and the result must be exact;
  *  - storage-level churn: every persisted block is repeatedly dropped
  *    WHILE the loop runs (what losing an executor's block manager does
  *    to cached/localCheckpoint state); reliable checkpoints re-read
  *    from the checkpoint filesystem instead of dying with the blocks.
  */
class ChaosSpec extends SparkSpec {

  /** 40 chains of 60 nodes: component of node g*1000+j is g*1000. 2360
    * edges — collectThreshold=0 forces the distributed loop anyway.
    */
  private def chainEdges: DataFrame = {
    import spark.implicits._
    (0 until 40).flatMap(g => (0 until 59).map(j =>
      (g * 1000L + j, g * 1000L + j + 1)))
      .toDF("a", "b")
  }

  private def expected: Map[Long, Long] =
    (0 until 40).flatMap(g => (0 until 60).map(j =>
      (g * 1000L + j) -> g * 1000L)).toMap

  private def assertExact(result: DataFrame): Unit = {
    val got = result.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "component labels diverged after chaos")
  }

  test("component loop absorbs task failures at the source (executor kill → retry)") {
    import spark.implicits._
    ChaosSpec.failsInjected.set(0)
    val src = chainEdges.as[(Long, Long)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          ChaosSpec.failsInjected.getAndIncrement() < 3)
        throw new RuntimeException("chaos: simulated lost executor task")
      it
    }.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-chaos-ckpt")
    val out = Dedup.components(src, "a", "b", collectThreshold = 0L,
      checkpointDir = Some(dir.toString))
    assertExact(out)
    assert(ChaosSpec.failsInjected.get() >= 3, "injection never fired")
    graft.engine.CacheScope.drain()
  }

  test("component loop converges while persisted blocks are dropped mid-loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chaos-ckpt2")
    @volatile var stop = false
    // the block-manager chaos monkey: what an executor loss does to every
    // cached partition that executor held — here ALL of them, repeatedly
    val monkey = new Thread(() => {
      while (!stop) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(r => try r.unpersist(false) catch { case _: Throwable => })
        Thread.sleep(50)
      }
    })
    monkey.setDaemon(true)
    monkey.start()
    try {
      val out = Dedup.components(chainEdges, "a", "b", collectThreshold = 0L,
        checkpointDir = Some(dir.toString))
      assertExact(out)
    } finally {
      stop = true
      monkey.join()
      graft.engine.CacheScope.drain()
    }
  }
}

object ChaosSpec {
  val failsInjected = new AtomicInteger(0)
}

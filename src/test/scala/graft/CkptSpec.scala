package graft

import org.apache.spark.sql.functions._

import graft.engine.{CacheScope, Ckpt}
import graft.operators.Graph

/** The r15 checkpoint device: reliable-mode equivalence (the cluster
  * durability switch must not change any result) and deterministic
  * lifecycle (barriers register with CacheScope; drain releases them).
  */
class CkptSpec extends SparkSpec {

  import spark.implicits._

  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    .toDF("src", "dst")

  test("SPARK_GRAFT_CKPT=reliable mode computes identical results") {
    // pageRank exercises the full device surface: setup barriers,
    // per-round barriers, per-round free of the superseded round
    val local = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    CacheScope.drain()
    sys.props("graft.ckpt") = "reliable"
    try {
      assert(Ckpt.reliable, "system-property override must engage")
      val reliable = Graph.pageRank(edges, "src", "dst", iters = 3)
        .as[(Long, Double)].collect().toMap
      assert(reliable == local,
        s"reliable checkpoint changed pageRank: $reliable vs $local")
    } finally {
      sys.props.remove("graft.ckpt")
      CacheScope.drain()
    }
    assert(!Ckpt.reliable)
  }

  test("barriers register their RDDs and drain releases them") {
    CacheScope.drain()
    val before = CacheScope.trackedRddCount
    val df = Ckpt(edges.select(col("src").as("u"), col("dst").as("v")))
    assert(CacheScope.trackedRddCount == before + 1,
      "a barrier must register its backing RDD for the per-query drain")
    assert(df.count() == 5)
    CacheScope.drain()
    assert(CacheScope.trackedRddCount == before,
      "drain must release registered checkpoint RDDs")
  }

  test("free releases a superseded round's blocks without touching results") {
    val a = Ckpt(edges.select(col("src")))
    val b = Ckpt(a.select((col("src") * 2).as("s")))
    Ckpt.free(a) // a is dead: b has materialized from it
    assert(b.as[Long].collect().sorted.toSeq == Seq(2L, 2L, 4L, 6L, 8L))
    CacheScope.drain()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

object GraphSpec {
  val fails = new java.util.concurrent.atomic.AtomicInteger(0)
}

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pagerank on a path graph matches a local fixed-point computation") {
    // 1 - 2 - 3: symmetrized degrees (1,2,1); replicate the operator's
    // exact quantized arithmetic locally
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val n = 3.0
    val tele = (1.0 - 0.85) / n
    def q(x: Double) = math.floor(x * 1e12 + 0.5) / 1e12
    var r = Map(1L -> q(1.0 / n), 2L -> q(1.0 / n), 3L -> q(1.0 / n))
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0)
    val in = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    for (_ <- 1 to 5)
      r = r.keys.map { v =>
        val s = in(v).map(u => math.floor(r(u) / deg(u) * 1e12 + 0.5).toLong).sum
        v -> q(tele + 0.85 * (s / 1e12))
      }.toMap
    assert(got == r, s"got $got expected $r")
    // ends have identical rank by symmetry; center dominates
    assert(got(1L) == got(3L) && got(2L) > got(1L))
  }

  test("triangleStats counts a hand-checked fixture") {
    // triangle 1-2-3 plus pendant 4 off node 3; edges fed unordered +
    // duplicated to exercise canonicalization
    val edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (4L, 3L), (1L, 2L))
      .toDF("u", "v")
    val r = Graph.triangleStats(edges, "u", "v")
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 1L, 1L)), s"(edges, wedges, triangles) = $r")
  }

  test("localClusteringStats on a hand-checked fixture") {
    // triangle 1-2-3 + pendant 4 off 3: lcc = (1, 1, 1/3), node 4 has
    // no defined coefficient; ticks (1e9, 1e9, 333333333) → avg 0.777778
    val edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (4L, 3L), (1L, 2L))
      .toDF("u", "v")
    val r = Graph.localClusteringStats(edges, "u", "v").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L,
      s"(n_nodes, n_closed) = (${r.getLong(0)}, ${r.getLong(1)})")
    assert(math.abs(r.getDouble(2) - 0.777778) < 1e-9,
      s"avg_lcc = ${r.getDouble(2)}")
  }

  test("localClusteringStats ≡ driver adjacency enumeration (real graph)") {
    val po = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = po.as("a").join(po.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val r = Graph.localClusteringStats(edges, "u", "v").head()
    val es = edges.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    es.foreach { case (u, v) => adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    val nodes = adj.keys.filter(x => adj(x).size >= 2).toSeq
    var slq = 0L
    var closed = 0L
    nodes.foreach { x =>
      val ns = adj(x).toSeq
      var t = 0L
      for (i <- ns.indices; j <- i + 1 until ns.length)
        if (adj(ns(i)).contains(ns(j))) t += 1
      if (t > 0) closed += 1
      val d = ns.length
      // the operator's exact tick chain: t / (d·(d−1)/2) · 1e9, floored
      slq += math.floor(t.toDouble /
        (d.toDouble * (d - 1) / 2.0) * 1e9 + 0.5).toLong
    }
    val avg = math.floor(slq.toDouble / 1e9 / nodes.length * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == nodes.length.toLong, "n_nodes")
    assert(r.getLong(1) == closed, "n_closed")
    assert(math.abs(r.getDouble(2) - avg) < 1e-9,
      s"avg_lcc ${r.getDouble(2)} vs driver $avg")
  }

  test("compact-forward triangle count equals the naive a<b<c enumeration") {
    val po = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val und = po.as("a").join(po.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct().persist()
    val oriented = Graph.triangleStats(und, "u", "v")
      .select("n_triangles").as[Long].head()
    val naive = und.as("e1")
      .join(und.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .count()
    und.unpersist()
    assert(oriented == naive && oriented > 0,
      s"compact-forward $oriented vs naive $naive")
  }

  test("pagerank is bit-exact under injected task failures (executor churn)") {
    // the determinism claim behind the oracle: integer-tick contribution
    // sums are order-independent, so a re-computed partition (what a lost
    // executor's retry does) must reproduce the identical ranks. Inject
    // first-attempt failures at the edge source and compare bit-for-bit
    // against the undisturbed run.
    import org.apache.spark.TaskContext
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val clean = Graph.pageRank(base, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    GraphSpec.fails.set(0)
    val chaotic = base.as[(Long, Long)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          GraphSpec.fails.getAndIncrement() < 3)
        throw new RuntimeException("chaos: simulated lost executor task")
      it
    }.toDF("src", "dst")
    val got = Graph.pageRank(chaotic, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(got == clean, s"ranks diverged after chaos: $got vs $clean")
  }

  test("random walks take only real edges and are reproducible") {
    val edges = Tables.table(spark, sf(), "lineitem")
      .select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
    val walks = Graph.randomWalks(edges, "src", "dst", steps = 3)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst"), col("src"))).distinct()
    // every consecutive (a, b) in every path must be an und edge
    val hopPairs = walks
      .select(col("walk_id"), split(col("path"), ">").as("p"))
      .select(col("walk_id"), expr(
        "explode(transform(sequence(1, size(p) - 1), " +
          "i -> struct(CAST(element_at(p, i) AS BIGINT) AS a, " +
          "CAST(element_at(p, i + 1) AS BIGINT) AS b)))").as("h"))
      .select(col("h.a").as("src"), col("h.b").as("dst"))
    assert(hopPairs.join(und, Seq("src", "dst"), "left_anti").count() == 0,
      "walk used a non-edge")
    // hash-draw determinism: a second invocation is string-identical
    val again = Graph.randomWalks(edges, "src", "dst", steps = 3)
    assert(walks.exceptAll(again).isEmpty && again.exceptAll(walks).isEmpty)
  }

  test("pagerank mass stays ~1 and every node keeps a rank row") {
    val edges = Tables.table(spark, sf(), "lineitem")
      .select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 3)
    val nNodes = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().count()
    assert(ranks.count() == nNodes)
    val mass = ranks.agg(sum(col("rank"))).head().getDouble(0)
    // quantization drift is bounded by n * 1e-12 per round
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
  }

  test("hits: star hub dominates; bipartite sides separate; L1 mass ~1") {
    // hub 1 points at parts 11,13,15; hub 3 at 11 only → 1 out-hubs 3,
    // 11 out-auths 13/15 (it draws from both hubs)
    val edges = Seq((1L, 11L), (1L, 13L), (1L, 15L), (3L, 11L))
      .toDF("src", "dst")
    val ha = Graph.hits(edges, "src", "dst", iters = 3).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(ha(1L)._1.get > ha(3L)._1.get, "broad hub must outrank narrow hub")
    assert(ha(11L)._2.get > ha(13L)._2.get, "two-hub part must outrank one-hub part")
    assert(ha(13L)._2 == ha(15L)._2, "symmetric parts tie")
    // sources carry no auth, sinks no hub (bipartite separation)
    assert(ha(1L)._2.isEmpty && ha(11L)._1.isEmpty)
    val hubMass = ha.values.flatMap(_._1).sum
    val authMass = ha.values.flatMap(_._2).sum
    assert(math.abs(hubMass - 1.0) < 1e-9 && math.abs(authMass - 1.0) < 1e-9,
      s"hub mass $hubMass auth mass $authMass")
  }

  test("hits on the real bipartite graph: masses ~1, every node one row") {
    val edges = Tables.table(spark, sf(), "lineitem")
      .select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
    val ha = Graph.hits(edges, "src", "dst", iters = 3)
    val nNodes = edges.select(col("src")).union(edges.select(col("dst")))
      .distinct().count()
    assert(ha.count() == nNodes)
    val m = ha.agg(sum(col("hub")).as("h"), sum(col("auth")).as("a")).head()
    assert(math.abs(m.getDouble(0) - 1.0) < 1e-6, s"hub mass ${m.getDouble(0)}")
    assert(math.abs(m.getDouble(1) - 1.0) < 1e-6, s"auth mass ${m.getDouble(1)}")
  }
}

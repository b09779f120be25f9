package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical node-growth scaling for the graph operators (BASELINE.md's
  * 10× validation, graph edition). `ScaleUp` holds dimension keys fixed —
  * the realistic corpus mode — so the co-purchase graph under it grows in
  * SCAN volume but not in nodes/edges. This main instead replicates the
  * supplier↔part graph itself `factor`× (disjoint copies, ids remapped
  * collision-free), then times pageRank and triangleStats at 1× and at
  * `factor`× — growth here is attributable to |V| and |E| alone.
  *
  * Usage: GraphScale <sfDir> [factor=10]. Prints one line per scale.
  */
object GraphScale {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$src/lineitem.parquet")

    def rep(f: Int) = explode(array((0 until f).map(lit): _*))

    // x86's bipartite graph, replicated: node ids (2·supp)·f + rep and
    // (2·part+1)·f + rep are disjoint across reps and families for any f
    def bipartite(f: Int) = li
      .withColumn("rep", rep(f))
      .select((col("l_suppkey") * 2 * f + col("rep")).as("src"),
        ((col("l_partkey") * 2 + 1) * f + col("rep")).as("dst"))

    // x87's co-purchase graph, replicated: order AND part keys remapped
    // per rep, so each rep derives a disjoint copy with real triangles
    def coPurchase(f: Int) = {
      val po = li.withColumn("rep", rep(f))
        .select((col("l_orderkey") * f + col("rep")).as("ok"),
          (col("l_partkey") * f + col("rep")).as("pk"))
        .distinct()
      po.as("a").join(po.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    }

    for (f <- Seq(1, factor)) {
      val t0 = System.nanoTime
      val nRanks = operators.Graph.pageRank(bipartite(f), "src", "dst", iters = 5).count()
      val t1 = System.nanoTime
      val st = operators.Graph.triangleStats(coPurchase(f), "src", "dst").collect().head
      val t2 = System.nanoTime
      engine.CacheScope.drain()
      println(f"""{"factor":$f,"pr_nodes":$nRanks,"tri_edges":${st.getLong(0)},""" +
        f""""wedges":${st.getLong(1)},"triangles":${st.getLong(2)},""" +
        f""""pagerank_s":${(t1 - t0) / 1e9}%.2f,"triangles_s":${(t2 - t1) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-min sketch invariants: the overcount guarantee, exactness when the
  * sketch is wide enough to be collision-free, layout-independence of the
  * merge, and JVM/SQL agreement on the bucket function. The cross-engine
  * gate (DuckDB re-derives every cell) is x55 through Verify.
  */
class CountMinSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sf(), "documents")

  test("bucket: JVM aggregator and SQL lookup expression agree") {
    import spark.implicits._
    val terms = Seq("the", "of", "ergo", "Zebra", "müller", "a b", "")
    val df = terms.toDF("term")
    for (d <- 0 until 4; width <- Seq(64, 512)) {
      val sql = df.select(col("term"),
        CountMin.bucketCol(d, col("term"), width).as("b")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.foreach { t =>
        assert(sql(t) == CountMin.bucket(d, t, width).toLong,
          s"bucket mismatch for '$t' at d=$d w=$width")
      }
    }
  }

  test("estimates: est >= exact always; est == exact when width kills collisions") {
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    toks.persist()
    val exact = toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      // narrow sketch: collisions certain, overcount-only must still hold
      val narrow = toks.agg(CountMin.sketchUdaf(4, 64)(col("term")).as("sk"))
        .collect().head.getAs[scala.collection.Seq[Long]]("sk")
      val estNarrow = toks.select(col("term")).distinct()
        .select(col("term"),
          CountMin.estimate(typedlit(narrow.toSeq), col("term"), 4, 64).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      estNarrow.foreach { case (t, est) =>
        assert(est >= exact(t), s"undercount for '$t': est=$est exact=${exact(t)}")
      }
      assert(estNarrow.exists { case (t, est) => est > exact(t) },
        "a 4x64 sketch over this vocab should collide somewhere")
      // wide sketch: vocab << width² across 4 rows → min over rows exact
      val wide = toks.agg(CountMin.sketchUdaf(4, 65536)(col("term")).as("sk"))
        .collect().head.getAs[scala.collection.Seq[Long]]("sk")
      val estWide = toks.select(col("term")).distinct()
        .select(col("term"),
          CountMin.estimate(typedlit(wide.toSeq), col("term"), 4, 65536).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wrong = estWide.count { case (t, est) => est != exact(t) }
      assert(wrong == 0, s"$wrong wide-sketch estimates differ from exact")
    } finally toks.unpersist()
  }

  test("merge: sketch is layout-independent (repartition changes nothing)") {
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val one = toks.coalesce(1)
      .agg(CountMin.sketchUdaf(4, 256)(col("term")).as("sk"))
      .collect().head.getAs[scala.collection.Seq[Long]]("sk")
    val many = toks.repartition(17)
      .agg(CountMin.sketchUdaf(4, 256)(col("term")).as("sk"))
      .collect().head.getAs[scala.collection.Seq[Long]]("sk")
    assert(one.toSeq == many.toSeq)
    assert(one.sum == toks.count() * 4) // every token lands once per row
  }

  test("HLL (x81): partial-sketch union == direct sketch; estimate within 5% of exact") {
    import spark.implicits._
    // 10k distinct keys, each appearing 1-3 times — distinct is what the
    // sketch must see through the duplication
    val ids = (0 until 10000).flatMap(i => Seq.fill(1 + i % 3)(i.toLong))
    val df = ids.toDF("user_id")
    val direct = df.agg(hll_sketch_estimate(
      hll_sketch_agg(col("user_id"))).as("e")).collect().head.getLong(0)
    // MERGEABILITY — the 100 TB property: per-partition sketches union
    // associatively to the same registers as a single-pass build (HLL
    // merge is register-wise max), so estimate equality is EXACT
    val merged = df.withColumn("p", col("user_id") % 13)
      .groupBy(col("p")).agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect().head.getLong(0)
    assert(merged == direct,
      s"union-of-partials $merged != direct $direct — sketch merge broke")
    assert(math.abs(direct - 10000L) <= 500L,
      s"estimate $direct off true 10000 by >5%")
  }
}

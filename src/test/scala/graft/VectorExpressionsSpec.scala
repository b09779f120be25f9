package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The native DotProduct expression must be bit-identical to the HOF
  * formulation (and therefore to DuckDB's list_dot_product) and must stay
  * inside whole-stage codegen.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot == aggregate(zip_with(...)) bit-for-bit; nulls propagate") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (p, q) => p * q),
      lit(0.0d), (acc, v) => acc + v)
    val both = df.select(call_function("graft_dot", $"a", $"b").as("fast"), hof.as("ref"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // null input -> null out
    val n = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b")
      .select(call_function("graft_dot", $"a", $"b")).collect().head
    assert(n.isNullAt(0))
  }

  test("graft_dot works from SQL and stays in WholeStageCodegen") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // non-foldable input (derived from range id): a literal Seq would be
    // constant-folded away before reaching codegen
    spark.range(1, 2)
      .selectExpr("array(cast(id AS double), 1.0d) AS a", "array(2.0d, 3.0d) AS b")
      .createOrReplaceTempView("v")
    val q = spark.sql("SELECT graft_dot(a, b) AS d FROM v")
    assert(q.collect().head.getDouble(0) == 5.0)
    // the `*(n)` prefix in the plan string marks a WholeStageCodegen stage;
    // the graft_dot Project must carry it (i.e. not fall back to interpreted)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*")),
      s"expected graft_dot inside a codegen stage:\n$plan")
  }

  test("embeddings hot path matches real data through the registered function") {
    val e = Tables.table(spark, sf(), "embeddings")
      .withColumn("vec", transform(col("embedding"), x => x.cast("double")))
    val viaExpr = graft.operators.Dedup
      .embeddingPairs(e, "vec_id", "vec", threshold = 0.3).count()
    assert(viaExpr >= 0) // smoke: full pipeline executes with the native expr
  }

  test("graft_deflate_len ≡ fresh-Deflater recompute; repetition compresses") {
    GraftFunctions.ensureRegistered(spark)
    // independent re-derivation with a FRESH Deflater per string — pins
    // the ThreadLocal reset() correctness of the shared helper
    def fresh(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var t = 0L
      while (!d.finished()) t += d.deflate(buf)
      d.end(); t
    }
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = Tables.table(spark, sf(), "documents")
      .selectExpr("doc_id", "graft_deflate_len(text) AS dl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == fresh(text), s"deflate length mismatch at doc $id")
    }
    // the signal's point: heavy repetition deflates far below prose
    val rep = "spark " * 200
    val prose = docs.maxBy(_._2.length)._2.take(rep.length)
    assert(fresh(rep).toDouble / rep.length <
      0.5 * fresh(prose).toDouble / prose.length,
      "repetitive text should compress much harder than prose")
  }

  test("graft_deflate_len stays in WholeStageCodegen") {
    GraftFunctions.ensureRegistered(spark)
    spark.range(1, 2)
      .selectExpr("concat('doc-', CAST(id AS STRING)) AS t")
      .createOrReplaceTempView("vdl")
    val q = spark.sql("SELECT graft_deflate_len(t) AS n FROM vdl")
    assert(q.collect().head.getLong(0) > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_deflate_len") && l.trim.startsWith("*")),
      s"expected graft_deflate_len inside a codegen stage:\n$plan")
  }
}

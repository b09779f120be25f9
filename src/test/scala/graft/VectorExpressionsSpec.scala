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
}

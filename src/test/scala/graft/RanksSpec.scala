package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Pins the bucket-prefix-sum rank device (Ranks) to the naive global
  * window it replaces: identical row_number and identical ntile on
  * adversarial inputs (heavy ties across bucket boundaries, negative
  * values for the descending-order negated key, N < k). x63/x139/x193
  * ride this device in their DEFAULT path; their DuckDB oracles keep the
  * naive forms, so the per-round hash gate re-proves losslessness at SF —
  * this spec is the unit-level proof on shapes the corpus may not hit.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  // scores engineered so several share one bucket and tie groups span
  // bucket boundaries: floor(v*1024) collapses 0.0009765625-wide ranges
  private val rows: Seq[(Long, Double)] = {
    val base = (0L until 97L).map { i =>
      (i, math.sin(i.toDouble) * 3.0) // negatives included
    }
    val ties = (100L until 140L).map(i => (i, 0.25)) // one fat tie group
    base ++ ties
  }

  test("globalRowNumber ≡ naive global row_number (asc, ties, negatives)") {
    val df = rows.toDF("id", "v")
    val naive = df.withColumn("rk",
      row_number().over(Window.orderBy($"v".asc, $"id".asc)).cast("long"))
    val dev = Ranks.globalRowNumber(df, floor($"v" * 1024.0),
      Seq($"v".asc, $"id".asc), "rk")
    val a = naive.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = dev.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("globalRowNumber ≡ naive for DESC order via negated bucket key") {
    val df = rows.toDF("id", "v")
    val naive = df.withColumn("rk",
      row_number().over(Window.orderBy($"v".desc, $"id".asc)).cast("long"))
    val dev = Ranks.globalRowNumber(df, -floor($"v" * 1024.0),
      Seq($"v".desc, $"id".asc), "rk")
    val a = naive.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = dev.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ntileOfRank ≡ ntile for k=10 and uneven N") {
    val df = rows.toDF("id", "v") // N = 137, not divisible by 10
    val naive = df.withColumn("d",
      ntile(10).over(Window.orderBy($"v".asc, $"id".asc)).cast("long"))
    val dev = Ranks.globalRowNumber(df, floor($"v" * 1024.0),
        Seq($"v".asc, $"id".asc), "rk")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
      .withColumn("d", Ranks.ntileOfRank("rk", "nn", 10).cast("long"))
    val a = naive.select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = dev.select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ntileOfRank handles N < k (one row per bucket, no div-by-zero)") {
    val df = rows.take(4).toDF("id", "v") // N = 4 < k = 10
    val naive = df.withColumn("d",
      ntile(10).over(Window.orderBy($"v".asc, $"id".asc)).cast("long"))
    val dev = Ranks.globalRowNumber(df, floor($"v" * 1024.0),
        Seq($"v".asc, $"id".asc), "rk")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
      .withColumn("d", Ranks.ntileOfRank("rk", "nn", 10).cast("long"))
    val a = naive.select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = dev.select("id", "d").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("device plan carries no rows-scale unpartitioned sort") {
    val df = rows.toDF("id", "v")
    val dev = Ranks.globalRowNumber(df, floor($"v" * 1024.0),
      Seq($"v".asc, $"id".asc), "rk")
    dev.collect()
    // the only unpartitioned window runs over per-BUCKET counts (one row
    // per bucket), never over the input rows: assert the window whose
    // partitionSpec is empty consumes an Aggregate, not the base relation
    val plan = dev.queryExecution.optimizedPlan
    val globalWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.nonEmpty)
    globalWindows.foreach { w =>
      val feedsFromAgg = w.child.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      }.getOrElse(false)
      assert(feedsFromAgg, "unpartitioned window must run on bucket counts")
    }
  }
}

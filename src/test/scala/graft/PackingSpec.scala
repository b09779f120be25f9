package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {

  test("start-based first-fit: per-shard running totals place every doc exactly once") {
    import spark.implicits._
    val d = Seq((0L, 4L), (1L, 10L), (2L, 5L), (3L, 1L), (4L, 3L), (6L, 9L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(d, "doc_id", "n_tokens",
        budget = 10, shards = 2, shardExpr = Some(pmod(col("doc_id"), lit(2L))))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("start_offset")))
      .sortBy(_._1).toSeq
    // shard 0: ids 0(4) 2(5) 4(3) 6(9) -> starts 0,4,9,12
    // shard 1: ids 1(10) 3(1)          -> starts 0,10
    assert(out == Seq(
      (0L, 0L, 0L, 0L), (1L, 1L, 0L, 0L), (2L, 0L, 0L, 4L),
      (3L, 1L, 1L, 0L), (4L, 0L, 0L, 9L), (6L, 0L, 1L, 2L)))
  }

  test("default xxhash64 sharding is uniform-ish and in range; assignment is deterministic") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, 1L + i % 7)).toDF("doc_id", "n_tokens")
    val a = Packing.packSequences(d, "doc_id", "n_tokens", budget = 128, shards = 8)
    val rows = a.collect()
    assert(rows.length == 1000)
    val byShard = rows.groupBy(_.getAs[Long]("shard")).view.mapValues(_.length).toMap
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // hash sharding balances within a loose factor
    assert(byShard.values.max < 3 * byShard.values.min,
      s"shard skew: $byShard")
    // deterministic across runs
    val b = Packing.packSequences(d, "doc_id", "n_tokens", budget = 128, shards = 8)
      .collect()
    assert(rows.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // offsets always inside the budget
    assert(rows.forall { r =>
      val off = r.getAs[Long]("start_offset"); off >= 0 && off < 128
    })
  }
}

package graft

import java.security.MessageDigest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Shards

/** Epoch shuffle/sharding invariants: the bucketed two-level rank must be
  * byte-identical to the naive global sort, shards must be exactly full
  * (last one ragged), and the permutation must be layout-independent and
  * seed-sensitive.
  */
class ShardsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val ids = {
    import spark.implicits._
    (0L until 5000L).toDF("id")
  }

  test("two-level rank equals the naive global ticket sort") {
    val got = Shards.epochShards(ids, "id", seed = "t1", shardSize = 64)
      .select(col("id"), col("epoch_rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 5000L).sortBy(i => (md5hex(s"t1:$i"), i))
      .zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
    assert(got == want, "bucketed rank diverged from the global sort")
  }

  test("shards are exactly shardSize (last ragged); pos covers 0..n-1") {
    val rows = Shards.epochShards(ids, "id", seed = "t1", shardSize = 64)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"),
        min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val last = rows.map(_._1).max
    rows.foreach { case (shard, n, lo, hi) =>
      val expected = if (shard == last) 5000L % 64 else 64L
      assert(n == expected, s"shard $shard has $n rows, want $expected")
      assert(lo == 0L && hi == n - 1, s"shard $shard pos range [$lo,$hi]")
    }
    assert(rows.length == (5000 + 63) / 64)
  }

  test("layout-independent; bucket width does not change the permutation; seeds differ") {
    def ranks(df: org.apache.spark.sql.DataFrame, seed: String, hex: Int) =
      Shards.epochShards(df, "id", seed, shardSize = 64, bucketHexChars = hex)
        .select(col("id"), col("epoch_rank")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = ranks(ids, "t1", 2)
    assert(ranks(ids.repartition(17), "t1", 2) == base,
      "permutation changed under repartitioning")
    assert(ranks(ids, "t1", 3) == base,
      "bucket width is supposed to be invisible")
    assert(ranks(ids, "t2", 2) != base, "seeds must give distinct epochs")
  }

  test("property: equals the local sort at random sizes/seeds/shard sizes (seeded)") {
    import org.scalacheck.Gen
    import spark.implicits._
    val caseGen = for {
      n <- Gen.oneOf(0, 1, 5, 63, 64, 65, 200)
      size <- Gen.oneOf(1, 7, 64)
      seed <- Gen.oneOf("pa", "pb", "pc")
    } yield (n, size, seed)
    val cases = Iterator.iterate(org.scalacheck.rng.Seed(23L))(_.next)
      .map(s => caseGen.apply(Gen.Parameters.default, s))
      .collect { case Some(c) => c }.take(12).toSeq.distinct
    for (((n, size, seed), ci) <- cases.zipWithIndex) {
      val df = (0L until n.toLong).toDF("id")
      val got = Shards.epochShards(df, "id", seed, size)
        .select(col("id"), col("epoch_rank"), col("shard"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._2)
      val want = (0L until n.toLong).sortBy(i => (md5hex(s"$seed:$i"), i))
        .zipWithIndex.map { case (id, r) =>
          (id, r.toLong, r.toLong / size, r.toLong % size) }
      assert(got.toSeq == want.toSeq,
        s"case $ci (n=$n size=$size seed=$seed) diverged")
    }
  }

  test("curriculum: bands order first (desc), ticket shuffles within each band") {
    import spark.implicits._
    val df = ids.withColumn("band", col("id") % 3)
    val got = Shards.curriculumShards(df, "id", col("band"),
        descending = true, seed = "c1", shardSize = 64)
      .select(col("id"), col("band"), col("epoch_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (0L until 5000L)
      .sortBy(i => (-(i % 3), md5hex(s"c1:$i"), i))
      .zipWithIndex.map { case (id, r) => (id, id % 3, r.toLong) }
    assert(got.sortBy(_._3).toSeq == want.toSeq,
      "curriculum rank diverged from the local (band desc, ticket) sort")
  }

  test("source interleave: ragged sources drop out of the rotation; closed form == naive") {
    import spark.implicits._
    // deliberately ragged: sizes 7, 3, 5 — source b exhausts after round 3,
    // c after round 5, the tail is pure a
    val df = ((0L until 7L).map(i => (i, "a")) ++
      (100L until 103L).map(i => (i, "b")) ++
      (200L until 205L).map(i => (i, "c"))).toDF("id", "src")
    val got = Shards.interleaveBySource(df, "id", "src", seed = "ix")
      .select(col("id"), col("src"), col("src_rank"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // naive truth: rank within source by (md5 ticket, id), then global
    // row_number over (src_rank, source)
    val naive = got.map { case (id, s, _, _) => (id, s) }
      .groupBy(_._2).toSeq.flatMap { case (s, rows) =>
        rows.map(_._1).sortBy(i => (md5hex(s"ix:$i"), i)).zipWithIndex
          .map { case (id, r) => (id, s, r.toLong) }
      }.sortBy { case (_, s, r) => (r, s) }
      .zipWithIndex.map { case ((id, s, r), p) => (id, s, r, p.toLong) }
    assert(got.sortBy(_._4).toSeq == naive,
      s"interleave diverged:\n${got.sortBy(_._4).mkString("\n")}\nvs\n${naive.mkString("\n")}")
    // the balance property itself: the first 3 rounds contain every source
    val bySrcFirst9 = got.sortBy(_._4).take(9).map(_._2)
    assert(Seq("a", "b", "c").forall(s => bySrcFirst9.count(_ == s) == 3),
      s"first 3 rounds not balanced: $bySrcFirst9")
  }

  test("no global single-partition exchange in the plan") {
    val plan = Shards.epochShards(ids, "id", seed = "t1", shardSize = 64)
      .queryExecution.executedPlan.toString
    // the only allowed SinglePartition exchange is the one feeding the
    // 256-row bucket-offset window, which sits UNDER a broadcast; the
    // row-scale side must never gather to one partition
    val gathers = "Exchange SinglePartition".r.findAllIn(plan).length
    val bcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(bcasts >= 1, s"offsets should broadcast:\n$plan")
    assert(gathers <= 1, s"row-scale data gathered to one partition:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must change the shuffle distribution, never the answer. */
class SkewSpec extends SparkSpec {

  private lazy val li = Tables.table(spark, sf(), "lineitem")

  test("saltedCountDistinct == countDistinct on every group") {
    val plain = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_distinct"))
    val salted = Skew.saltedCountDistinct(li, Seq("l_returnflag"),
      "l_orderkey", buckets = 8)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedCountDistinct ignores nulls like countDistinct") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(1)), ("b", None))
      .toDF("k", "v")
    val res = Skew.saltedCountDistinct(df, Seq("k"), "v", buckets = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact countDistinct parity: all-null group b reports 0, not absence
    assert(res == Map("a" -> 1L, "b" -> 0L))
  }

  test("saltedJoin == plain join, including a hot key") {
    import spark.implicits._
    // hot key: 90% of big rows share one key
    val big = spark.range(10000)
      .select((when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(99L)))
        .as("k"), col("id").as("payload"))
    val small = Seq.tabulate(100)(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}

package graft

import graft.operators.Snm

class SnmSpec extends SparkSpec {

  import spark.implicits._

  test("window-adjacent near-dups are found; out-of-window pairs are not") {
    // docs 1/2 share a prefix (sort-adjacent) and most tokens; doc 9's
    // text is similar to 1's but its prefix sorts far away, with more
    // than w distinct-prefix docs between — the documented SNM miss
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (9L, "zz alpha beta gamma delta epsilon")) ++
      (3L to 8L).map(i => (i, s"mid$i u$i v$i w$i x$i")))
      .toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val got = Snm.pairs(docs, "doc_id", "text", "lang",
      w = 2, prefixLen = 10, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), got.toString)
    // jaccard(1,2) = 4 shared / 6 union
    assert(math.abs(got.head._3 - 4.0 / 6.0) < 1e-3)
  }

  test("pairs are canonical (id_a < id_b) and unique") {
    val pairs = Snm.pairs(Tables.table(spark, sf(), "documents"),
      "doc_id", "text", "lang", w = 5, prefixLen = 24, threshold = 0.5)
    val n = pairs.count()
    assert(n > 0)
    assert(pairs.filter($"id_a" >= $"id_b").count() == 0)
    assert(pairs.select("id_a", "id_b").distinct().count() == n)
  }
}

package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("mergeOnce applies left-to-right greedy merges") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }

  test("train learns the classic merges on a hand-checked corpus") {
    // Sennrich's running example shape: low(5) lower(2) newest(6) widest(3)
    val docs = Seq(
      ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3))
      .toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    // pair counts round 0: (e,s)=9, (s,t)=9, (w,e)=8(newest6+lower2)... —
    // (e,s) wins the (count, pair) tie-break over (s,t)
    assert(merges.head.left == "e" && merges.head.right == "s" &&
      merges.head.n_occ == 9L)
    // round 1: ("es","t") now counts 9 and wins
    assert(merges(1).left == "es" && merges(1).right == "t" &&
      merges(1).n_occ == 9L)
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("train is deterministic under ties and stops on exhausted vocab") {
    val docs = Seq("ab ab cd cd").toDF("text")
    val m1 = Bpe.train(docs, "text", nMerges = 10)
    val m2 = Bpe.train(docs, "text", nMerges = 10)
    assert(m1 == m2)
    // (a,b) and (c,d) both count 2 — lexicographic tie-break picks (a,b)
    assert(m1.head.left == "a" && m1.head.right == "b")
    // only 2 mergeable pairs exist; the loop must stop early, not spin
    assert(m1.length == 2, s"expected 2 merges, got ${m1.length}")
  }

  test("pairCounts equals a local recount on the real corpus") {
    val docs = Tables.table(spark, sf(), "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 200)
    val got = Bpe.pairCounts(docs, "text", k = 20)
      .as[(String, Long)].collect()
    val local = scala.collection.mutable.Map.empty[String, Long]
    docs.select("text").as[String].collect().foreach { t =>
      t.split("\\s+").filter(_.nonEmpty).foreach { w =>
        w.sliding(2).filter(_.length == 2).foreach { p =>
          val key = s"${p(0)} ${p(1)}"
          local(key) = local.getOrElse(key, 0L) + 1L
        }
      }
    }
    val expected = local.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expected)
  }
}

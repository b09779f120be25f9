package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Edge-case tests for the text-analysis expressions (SURVEY.md §2.C). */
class TextFunctionsSpec extends SparkSpec {

  private def one(textValue: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(textValue).toDF("text").select(c.as("v")).collect().head.get(0)
  }

  test("cleanText strips tags and control chars, collapses whitespace") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val out = Seq("<p>Hello <b>world</b></p>  spaced\t\tout ")
      .toDF("t").select(TextFunctions.cleanText($"t")).collect().head.getString(0)
    assert(out == "Hello world spaced out")
  }

  test("tokens: trims, collapses whitespace runs, drops empties") {
    assert(one("  a  b\tc\nd ", tokenCount(col("text"))) == 4)
    assert(one("", tokenCount(col("text"))) == 0)
    assert(one("   ", tokenCount(col("text"))) == 0)
    assert(one("single", tokenCount(col("text"))) == 1)
  }

  test("regex tokenizer splits letter/digit/symbol runs") {
    assert(one("ab12!cd", regexTokens(col("text"))) ==
      Seq("ab", "12", "!", "cd"))
  }

  test("shingles: k consecutive tokens, distinct, short docs -> empty") {
    assert(one("a b c d", shingles(col("text"), 3)) == Seq("a b c", "b c d"))
    assert(one("a b", shingles(col("text"), 3)) == Seq())
    // repeated shingles dedup
    assert(one("x y x y x y", shingles(col("text"), 2)) == Seq("x y", "y x"))
  }

  test("langId: marker voting with fixed tie order, und for no hits") {
    assert(one("the cat sat on the mat", langId(col("text"))) == "en")
    assert(one("der hund ist nicht da und das ist gut", langId(col("text"))) == "de")
    assert(one("xyzzy plugh", langId(col("text"))) == "und")
    // tie between en and de ('a'∈en...'und'∉de): construct a real tie
    assert(one("the der", langId(col("text"))) == "en") // tie -> first in order
  }

  test("quality components behave") {
    assert(one("", punctRatio(col("text"))) == 0.0)
    assert(one("!!!", punctRatio(col("text"))) == 1.0)
    assert(one("ab cd", punctRatio(col("text"))).asInstanceOf[Double] == 0.0)
    assert(one("ab cdef", meanTokenLen(col("text"))) == 3.0)
    val q = one("the quick brown fox jumps over the lazy dog and runs on", qualityScore(col("text"))).asInstanceOf[Double]
    assert(q >= 0.0 && q <= 1.0)
  }

  test("fingerprint is whitespace/case insensitive but content sensitive") {
    val a = one("Hello   World", fingerprint(col("text")))
    val b = one("hello world", fingerprint(col("text")))
    val c = one("hello worlds", fingerprint(col("text")))
    assert(a == b)
    assert(a != c)
  }

  test("approx quantiles (x26 scale path) stay within rank-error of exact") {
    // percentile_approx(acc): rank error <= n/acc; with n << acc on the
    // test corpus the sketch keeps every value, so the approx quantile is
    // an exact data point — within one inter-element gap of the exact
    // interpolated percentile
    val docs = Tables.table(spark, sf(), "documents")
      .select(graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
    val Array(exact25, exact50, exact75) = docs
      .agg(percentile(col("q"), lit(0.25)), percentile(col("q"), lit(0.5)),
        percentile(col("q"), lit(0.75)))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val approx = docs.agg(percentile_approx(col("q"),
      array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)))
      .collect().head.getSeq[Double](0)
    for (((a, e), p) <- approx.zip(Seq(exact25, exact50, exact75)).zip(Seq(.25, .5, .75)))
      assert(math.abs(a - e) <= 0.05,
        s"approx p$p=$a vs exact $e — beyond tolerance")
  }

  test("repetition signals (x73): hand-computed fractions; short docs keep") {
    import spark.implicits._
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → top 'a b' ×3 of
    // 5 grams, n=6 tokens → top2 = 2·3/6 = 1.0; trigrams = [aba, bab,
    // aba, bab] → all positions duplicated → dup3 = 1.0 → filtered.
    // "w x y z w q": bigrams all distinct → top2 = 2/6 ≈ 0.333 > 0.2 is
    // false? 2·1/6 = 0.333 — above the 0.20 gate → keep=false even
    // though nothing repeats: short docs saturate the top-1 fraction,
    // exactly why Gopher gates apply to long documents; the engine
    // reports the raw signal and leaves length-conditioning to callers.
    // "a" (1 token): no grams → fractions 0, keep.
    val df = Seq((1L, "a b a b a b"), (2L, "w x y z w q"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = graft.operators.Repetition.signals(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).toMap
    assert(out(1L) == ((1.0, 1.0, false)))
    assert(math.abs(out(2L)._1 - 0.333333) < 1e-6)
    assert(out(2L)._2 == 0.0 && !out(2L)._3)
    assert(out(3L) == ((0.0, 0.0, true)))
  }

  test("vocab encode (x99): ordered alternation = greedy longest-listed match") {
    import spark.implicits._
    // hand-segmented with the x99 vocabulary:
    // "the rationing of interesting reports" →
    //   the | r·ation·ing | of | in·ter·est·ing | re·p·or·t·s  = 14 pieces,
    //   10 multi-char, 32 letters
    val df = Seq((1L, "The Rationing of INTERESTING reports!"))
      .toDF("doc_id", "text")
    val r = ExtensionQueries.vocabEncode(df).collect().head
    assert(r.getLong(1) == 14L, s"n_pieces ${r.getLong(1)}")
    assert(r.getLong(2) == 10L, s"n_multi ${r.getLong(2)}")
    assert(r.getLong(3) == 32L, s"n_alpha ${r.getLong(3)}")
  }

  test("property: vocab encode == local greedy longest-listed scan (seeded)") {
    import org.scalacheck.Gen
    import spark.implicits._
    // the regex-semantics cross-check: an independent imperative scan with
    // the SAME vocab order must agree with the engine's ordered-alternation
    // match on arbitrary ASCII text (mixed case, punctuation, digits)
    def local(text: String): (Long, Long, Long) = {
      val t = text.toLowerCase(java.util.Locale.ROOT)
      var i = 0; var pieces = 0L; var multi = 0L; var alpha = 0L
      while (i < t.length) {
        if (t(i) >= 'a' && t(i) <= 'z') {
          ExtensionQueries.SubwordVocab.find(v => t.startsWith(v, i)) match {
            case Some(v) =>
              pieces += 1; if (v.length > 1) multi += 1
              alpha += v.length; i += v.length
            case None => pieces += 1; alpha += 1; i += 1
          }
        } else i += 1
      }
      (pieces, multi, alpha)
    }
    val tokenGen = Gen.oneOf(
      Gen.oneOf(ExtensionQueries.SubwordVocab),
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
      Gen.oneOf(" ", ", ", "! ", "42 ", "-", "  "))
    val textGen = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString)
    val texts = Iterator.iterate(org.scalacheck.rng.Seed(11L))(_.next)
      .map(s => textGen.apply(Gen.Parameters.default, s))
      .collect { case Some(t) => t }.take(40).toSeq
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = ExtensionQueries.vocabEncode(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == local(t), s"doc $i diverged: '${t.take(60)}'")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Oracle-independent checks for the round-13 gated approx swaps
  * (x251/x252/x253) — each sketch estimate is re-verified on the driver
  * against an EXACT brute-force recomputation (hand md5 fingerprints,
  * full sorts), so the error-bound claim does not rest solely on the
  * DuckDB oracle's tolerance filter.
  */
class ApproxSwapSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf()).collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x251 exact uniqueness ≡ hand md5 fingerprints; HLL estimate within 5σ") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exact = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.map { case (_, text) =>
        md5hex(text.trim.split("\\s+").filter(_.nonEmpty)
          .mkString(" ").toLowerCase)
      }.distinct.length.toLong
    }
    val got = q("x251_hll_unique")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      val (nUnique, hll) = got(src)
      assert(nUnique == n, s"exact count for $src")
      assert(math.abs(hll - n).toDouble <= 0.10 * n,
        s"HLL estimate $hll for $src outside 10% of exact $n")
    }
  }

  test("x252 estimate's true rank sits in the GK ±1% window; n exact") {
    val ev = Tables.events(spark, sf())
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = q("x252_approx_median")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == ev.keySet)
    got.foreach { case (tpe, n, est) =>
      val vs = ev(tpe)
      assert(n == vs.length.toLong, s"n for $tpe")
      val cle = vs.count(_ <= est)
      val clt = vs.count(_ < est)
      assert(cle >= math.floor(0.49 * n),
        s"$tpe: estimate $est below the GK window (cle=$cle, n=$n)")
      assert(clt <= math.ceil(0.51 * n) + 1,
        s"$tpe: estimate $est above the GK window (clt=$clt, n=$n)")
    }
  }

  test("x253 buckets partition the corpus, ranges are disjoint-monotone, counts within the GK bound") {
    val rows = q("x253_approx_deciles")
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    // exact recomputation of the q distribution for the bound check
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScoreOf(
          graft.functions.TextFunctions.tokens(col("text")),
          col("text")).as("q"))
      .collect().map(_.getDouble(1))
    val nn = docs.length
    assert(rows.map(_._2).sum == nn.toLong, "buckets must partition the corpus")
    val tmax = docs.groupBy(identity).values.map(_.length).max
    val bound = 2.0 * nn / 50.0 + tmax + 1
    rows.foreach { case (b, n, _, _, _) =>
      assert(math.abs(n - nn / 10.0) <= bound,
        s"bucket $b count $n outside GK bound $bound of ${nn / 10.0}")
    }
    // ranges must be disjoint and ordered: hi(k) <= lo(k+1)
    rows.sliding(2).foreach {
      case Array((_, _, _, Some(hi), _), (b2, _, Some(lo2), _, _)) =>
        assert(hi <= lo2, s"bucket ranges overlap at $b2")
      case _ => ()
    }
  }
}

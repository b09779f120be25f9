package graft

import org.apache.spark.sql.functions._

/** Oracle-independent checks for the round-12 batch x222–x227. Each
  * query's scale-safe formulation is re-derived on the driver via a
  * DIFFERENT algorithm where one exists (a hand parser instead of the
  * regex chain for x222, brute-force pair loops for x223, the classic
  * stack PAV instead of the minimax identity for x224, two-pass
  * variance instead of the moment chain for x225/x226/x227), so the
  * engine arithmetic cannot hide behind a DuckDB oracle that mirrors
  * it.
  */
class EvalOpsSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf()).collect()

  // ---- x222: hand URL parser vs the regex canonical chain ----

  private def canonNaive(u: String): String = {
    val hostEnd = u.indexOf('/', u.indexOf("://") + 3)
    val schemeHost = u.substring(0, hostEnd).toLowerCase
    val rest = u.substring(hostEnd).takeWhile(_ != '#')
    val qIdx = rest.indexOf('?')
    val (path, query) =
      if (qIdx < 0) (rest, "") else (rest.substring(0, qIdx), rest.substring(qIdx + 1))
    val params = if (query.isEmpty) Nil
      else query.split("&").toList.filterNot(_.startsWith("utm_"))
    val path2 = if (path.endsWith("/")) path.dropRight(1) else path
    schemeHost + path2 +
      (if (params.isEmpty) "" else "?" + params.mkString("&"))
  }

  test("x222 per-domain dedup stats ≡ hand-parsed canonicalization") {
    val ids = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val urls = ids.map { id =>
      val host = Seq("Example.COM", "news.example.com", "Blog.Example.org",
        "cdn.example.net")((id % 4).toInt)
      val qs =
        if (id % 15 == 0) "?utm_source=feed&ref=home&utm_medium=rss"
        else if (id % 3 == 0) "?utm_source=feed&utm_medium=rss"
        else if (id % 5 == 0) "?ref=home" else ""
      s"https://$host/p/${id % 97}" + (if (id % 2 == 0) "/" else "") + qs +
        (if (id % 7 == 0) "#sec2" else "")
    }
    val canon = urls.map(canonNaive)
    val byDomain = canon.groupBy(c => c.substring(c.indexOf("://") + 3)
      .takeWhile(ch => ch != '/' && ch != '?' && ch != '#'))
    val got = q("x222_url_canonical").map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == byDomain.keySet)
    byDomain.foreach { case (dom, cs) =>
      val (n, nc, nd) = got(dom)
      assert(n == cs.length.toLong, s"n_docs for $dom")
      assert(nc == cs.distinct.length.toLong, s"n_canonical for $dom")
      assert(nd == n - nc, s"n_dups for $dom")
    }
    // the chain genuinely unifies variants: some domain must have dups
    assert(got.values.map(_._3).sum > 0, "synthesized variants never collide")
  }

  // ---- x223: brute-force pair loop vs the grid algebra ----

  test("x223 Kendall τ-b ≡ brute-force O(n²) pair count") {
    val v = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_quantity", "l_discount").collect()
      .map(r => (math.floor(r.getDouble(0) + 0.5).toLong,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- v.indices; j <- (i + 1) until v.length) {
      val (qi, di) = v(i); val (qj, dj) = v(j)
      if (qi == qj) tx += 1
      if (di == dj) ty += 1
      if (qi != qj && di != dj) {
        if ((qj - qi) * (dj - di) > 0) conc += 1 else disc += 1
      }
    }
    val n = v.length.toLong
    val n0 = n * (n - 1) / 2
    val tau = (conc - disc).toDouble /
      (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
    val Array(r) = q("x223_kendall_tau")
    assert(r.getLong(0) == n && r.getLong(1) == n0)
    assert(r.getLong(2) == conc, s"conc: got ${r.getLong(2)}, naive $conc")
    assert(r.getLong(3) == disc, s"disc: got ${r.getLong(3)}, naive $disc")
    assert(r.getLong(4) == tx && r.getLong(5) == ty, "tie terms")
    assert(math.abs(r.getDouble(6) - tau) < 1e-6, "tau_b")
  }

  // ---- x224: classic stack PAV vs the minimax identity ----

  /** Weighted pool-adjacent-violators over (weight, value) points. */
  private def pav(pts: Seq[(Long, Double)]): Seq[Double] = {
    case class Block(w: Double, sum: Double) { def avg: Double = sum / w }
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
    pts.foreach { case (w, y) =>
      var blk = (Block(w.toDouble, w * y), 1)
      while (stack.nonEmpty && stack.last._1.avg >= blk._1.avg) {
        val (b, c) = stack.remove(stack.length - 1)
        blk = (Block(b.w + blk._1.w, b.sum + blk._1.sum), c + blk._2)
      }
      stack += blk
    }
    stack.toSeq.flatMap { case (b, c) => Seq.fill(c)(b.avg) }
  }

  test("x224 minimax isotonic fit ≡ stack PAV, and is monotone") {
    val rows = q("x224_isotonic").sortBy(_.getLong(0))
    val iso = rows.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-9 },
      "isotonic output is not monotone")
    // PAV over the same weighted bins (exact np/n, not the rounded
    // frac_pos: reconstruct the integer np from n * frac_pos)
    val pts = rows.map { r =>
      val n = r.getLong(1)
      val np = math.round(r.getDouble(3) * n)
      (n, np.toDouble / n)
    }
    val expected = pav(pts.toSeq)
    iso.zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 2e-6,
        s"bin $i: minimax $got vs PAV $exp")
    }
    // the raw reliability curve must actually violate monotonicity
    // somewhere (otherwise the fit is vacuous) OR match iso exactly
    val raw = pts.map(_._2)
    val violates = raw.zip(raw.tail).exists { case (a, b) => a > b }
    val identical = raw.zip(iso).forall { case (a, b) => math.abs(a - b) < 2e-6 }
    assert(violates || identical, "PAV input neither violates nor matches")
  }

  // ---- x225: two-pass variance + share bound ----

  test("x225 Neyman allocation: exact total, within 1 of real shares") {
    val byS = spark.read.parquet(sf() + "/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val sd = byS.map { case (s, xs) =>
      val v = xs.map(_._2.toDouble)
      val m = v.sum / v.length
      s -> math.sqrt(v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val w = byS.map { case (s, xs) => s -> xs.length * sd(s) }
    val tw = w.values.sum
    val rows = q("x225_neyman_alloc")
    assert(rows.map(_.getLong(3)).sum == 10000L, "allocation must telescope")
    rows.foreach { r =>
      val s = r.getString(0)
      assert(math.abs(r.getDouble(2) - sd(s)) < 1e-6 * (1 + sd(s)),
        s"sd for $s: got ${r.getDouble(2)}, two-pass ${sd(s)}")
      val share = 10000.0 * w(s) / tw
      assert(math.abs(r.getLong(3) - share) < 1.0 + 1e-6,
        s"alloc for $s: ${r.getLong(3)} not within 1 of share $share")
    }
  }

  // ---- x226: two-pass moments + the z-constant relation ----

  test("x226 MDE ≡ two-pass Welch SE times (z_0.975 + z_0.8)") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value")).collect()
      .map { r =>
        val variant = {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"ab1:${r.getLong(0)}".getBytes("UTF-8"))
          val hex = h.take(2).map("%02x".format(_)).mkString
          if (hex < "8000") "b" else "a"
        }
        (variant, math.floor(r.getDouble(1) * 1e6 + 0.5) / 1e6)
      }
    def stats(vt: String) = {
      val v = ev.filter(_._1 == vt).map(_._2)
      val m = v.sum / v.length
      (v.length.toLong, m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (na, ma, va) = stats("a"); val (nb, mb, vb) = stats("b")
    val se = math.sqrt(va / na + vb / nb)
    val Array(r) = q("x226_ab_power_mde")
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(math.abs(r.getDouble(2) - ma) < 1e-6, "mean_a")
    assert(math.abs(r.getDouble(4) - se) < 1e-6, "se")
    assert(math.abs(r.getDouble(5) - (1.959964 + 0.841621) * se) < 2e-6,
      "mde_abs = (z_a/2 + z_pow) * se")
    assert(math.abs(r.getDouble(6) - r.getDouble(5) / ma) < 2e-6, "mde_rel")
  }

  // ---- x227: decomposition identities ----

  test("x227 Murphy decomposition: identity and bin consistency") {
    val Array(r) = q("x227_brier_decomp")
    val (brier, rel, res, unc, resid) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // the decomposition identity holds by construction of residual
    assert(math.abs(brier - (rel - res + unc + resid)) < 3e-6, "identity")
    assert(rel >= -1e-9 && res >= -1e-9, "rel/res are sums of squares")
    assert(unc > 0 && unc <= 0.25 + 1e-9, "uncertainty = obar(1-obar)")
    // cross-check uncertainty against the x224 bins' positive mass
    val bins = q("x224_isotonic")
    val n = bins.map(_.getLong(1)).sum
    val np = bins.map(b => math.round(b.getDouble(3) * b.getLong(1))).sum
    val obar = np.toDouble / n
    assert(math.abs(unc - obar * (1 - obar)) < 2e-6,
      s"uncertainty $unc vs obar(1-obar) ${obar * (1 - obar)}")
    assert(r.getLong(0) == n, "doc totals agree across x224/x227")
  }
}

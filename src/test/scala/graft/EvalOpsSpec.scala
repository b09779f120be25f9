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

  // ---- x228: two-pass (centered) covariance vs the moment chain ----

  test("x228 CUPED ≡ two-pass covariance over driver-built user frames") {
    val cutoff = 1705363200000000L
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect()
    val users = ev.groupBy(_.getLong(0)).map { case (uid, rows) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab1:$uid".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      val variant = if (hex < "8000") "b" else "a"
      def side(pre: Boolean) = rows
        .filter(r => (r.getLong(2) < cutoff) == pre)
        .map(r => math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).sum / 1e6
      (variant, side(pre = true), side(pre = false))
    }.toSeq
    val n = users.length
    val mx = users.map(_._2).sum / n
    val my = users.map(_._3).sum / n
    val cxy = users.map(u => (u._2 - mx) * (u._3 - my)).sum
    val vx = users.map(u => (u._2 - mx) * (u._2 - mx)).sum
    val vy = users.map(u => (u._3 - my) * (u._3 - my)).sum
    val theta = cxy / vx
    def m(vt: String, f: ((String, Double, Double)) => Double) = {
      val v = users.filter(_._1 == vt); v.map(f).sum / v.length
    }
    val diffRaw = m("b", _._3) - m("a", _._3)
    val diffAdj = (m("b", _._3) - theta * m("b", _._2)) -
      (m("a", _._3) - theta * m("a", _._2))
    val Array(r) = q("x228_cuped")
    assert(r.getLong(0) == n.toLong, "n")
    assert(r.getLong(1) + r.getLong(2) == n.toLong, "n_a + n_b = n")
    assert(math.abs(r.getDouble(3) - theta) < 1e-5, "theta")
    assert(math.abs(r.getDouble(4) - diffRaw) < 1e-5, "diff_raw")
    assert(math.abs(r.getDouble(5) - diffAdj) < 1e-5, "diff_cuped")
    val rho2 = cxy * cxy / (vx * vy)
    assert(math.abs(r.getDouble(6) - rho2) < 1e-5, "var_reduction = rho^2")
    assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1 + 1e-9,
      "variance reduction is a squared correlation")
    // the CUPED identity: adjusted lift = raw lift − θ·(pre-period lift)
    val preDiff = m("b", _._2) - m("a", _._2)
    assert(math.abs(r.getDouble(5) -
      (r.getDouble(4) - r.getDouble(3) * preDiff)) < 2e-5, "CUPED identity")
  }

  // ---- x229: confusion cells re-derived via driver loops ----

  test("x229 per-group TPR/FPR and gaps ≡ driver confusion arithmetic") {
    def r6(x: Double): Double =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val model = graft.operators.QualityFilter.fit(docs, "doc_id", "text",
      isTarget = col("source") === "src0")
    val scored = graft.operators.QualityFilter
      .logits(docs, "doc_id", "text", model)
      .select(col("id").as("doc_id"), col("logit"))
      .join(docs.select(col("doc_id"), col("lang"),
        (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
      .collect()
    val byLang = scored.groupBy(_.getString(2)).map { case (lang, rows) =>
      val pred = rows.map(r => (r6(r.getDouble(1)) >= 0.0, r.getLong(3) == 1L))
      val np = pred.count(_._2).toLong
      val nn = pred.count(!_._2).toLong
      val tp = pred.count(p => p._1 && p._2).toLong
      val fp = pred.count(p => p._1 && !p._2).toLong
      lang -> (np, nn,
        if (np > 0) Some(r6(tp.toDouble / np)) else None,
        if (nn > 0) Some(r6(fp.toDouble / nn)) else None)
    }
    val tprs = byLang.values.flatMap(_._3)
    val fprs = byLang.values.flatMap(_._4)
    val tg = r6(tprs.max - tprs.min)
    val fg = r6(fprs.max - fprs.min)
    val rows = q("x229_equalized_odds")
    assert(rows.length == byLang.size, "one row per lang")
    rows.foreach { r =>
      val (np, nn, tpr, fpr) = byLang(r.getString(0))
      assert(r.getLong(1) == np && r.getLong(2) == nn, s"cells ${r.getString(0)}")
      assert(tpr.forall(t => math.abs(r.getDouble(3) - t) < 1e-9), "tpr")
      assert(fpr.forall(f => math.abs(r.getDouble(4) - f) < 1e-9), "fpr")
      assert(math.abs(r.getDouble(5) - tg) < 1e-9, "tpr_gap")
      assert(math.abs(r.getDouble(6) - fg) < 1e-9, "fpr_gap")
    }
  }

  // ---- x231: WOE/IV re-derived via driver rank/bin/fold loops ----

  test("x231 WOE and IV ≡ driver binning over independent scoring") {
    def r6(x: Double): Double =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val model = graft.operators.QualityFilter.fit(docs, "doc_id", "text",
      isTarget = col("source") === "src0")
    val scored = graft.operators.QualityFilter
      .logits(docs, "doc_id", "text", model)
      .select(col("id").as("doc_id"), col("logit"))
      .join(docs.select(col("doc_id"),
        (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r6(r.getDouble(1)), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    val n = scored.length
    val bins = scored.zipWithIndex
      .groupBy { case (_, rk) => rk.toLong * 10 / n }
      .map { case (b, rows) =>
        b -> (rows.length.toLong, rows.map(_._1._3).sum)
      }
    val tnp = bins.values.map(_._2).sum.toDouble
    val tnn = bins.values.map(v => v._1 - v._2).sum.toDouble
    def woe(np: Long, nn: Long): Double =
      math.log(((np + 0.5) / (tnp + 5.0)) / ((nn + 0.5) / (tnn + 5.0)))
    val iv = bins.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, (bn, np))) =>
      acc + ((np + 0.5) / (tnp + 5.0) - (bn - np + 0.5) / (tnn + 5.0)) *
        woe(np, bn - np)
    }
    val rows = q("x231_woe_iv")
    assert(rows.length == 10, "ten deciles")
    assert(rows.map(_.getLong(1)).sum == n.toLong, "bins partition the corpus")
    rows.foreach { r =>
      val (bn, np) = bins(r.getLong(0))
      assert(r.getLong(1) == bn && r.getLong(2) == np,
        s"bin ${r.getLong(0)} cells")
      assert(math.abs(r.getDouble(3) - woe(np, bn - np)) < 1e-6, "woe")
      assert(math.abs(r.getDouble(4) - iv) < 1e-5, "iv")
    }
    assert(rows.head.getDouble(4) >= -1e-9,
      "IV is a sum of same-sign products, never negative")
  }

  // ---- x232: driver tokenizer + conditional sums ----

  test("x232 context-fit ≡ driver tokenize/threshold arithmetic") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong))
    val rows = q("x232_context_fit")
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size, "one row per source")
    rows.foreach { r =>
      val nts = bySource(r.getString(0)).map(_._2)
      assert(r.getLong(1) == nts.length.toLong, "n_docs")
      assert(r.getLong(2) == nts.sum, "n_tokens")
      ExtensionQueries.ContextBudgets.zipWithIndex.foreach { case (b, i) =>
        assert(r.getLong(3 + 2 * i) == nts.count(_ <= b).toLong, s"fit_$b")
        assert(r.getLong(4 + 2 * i) == nts.map(nt => math.max(nt - b, 0L)).sum,
          s"lost_$b")
      }
    }
  }

  // ---- x233: driver projection loops + the JL mean-ratio property ----

  test("x233 JL distortion ≡ driver ±1 projection; mean ratio near 1") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val s = ExtensionQueries.JlSigns.map(_.toArray).toArray
    def proj(v: Array[Double]): Array[Double] =
      (0 until 16).map { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += s(j)(i) * v(i); i += 1 }
        acc / 4.0
      }.toArray
    val byId = e.toMap
    val ticks = e.flatMap { case (id, v) =>
      byId.get(id + 1).flatMap { w =>
        var d2o = 0.0
        var d2p = 0.0
        val (py, qy) = (proj(v), proj(w))
        for (i <- 0 until 64) d2o += (v(i) - w(i)) * (v(i) - w(i))
        for (i <- 0 until 16) d2p += (py(i) - qy(i)) * (py(i) - qy(i))
        if (d2o > 0.0) Some(math.floor(d2p / d2o * 1e6 + 0.5).toLong) else None
      }
    }
    val Array(r) = q("x233_jl_distortion")
    assert(r.getLong(0) == ticks.length.toLong, "n_pairs")
    val mean = math.floor(
      ticks.sum.toDouble / 1e6 / ticks.length * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getDouble(1) - mean) < 1e-9, "mean_ratio")
    assert(math.abs(r.getDouble(2) - ticks.min / 1e6) < 1e-9, "min_ratio")
    assert(math.abs(r.getDouble(3) - ticks.max / 1e6) < 1e-9, "max_ratio")
    // the JL property the probe exists to measure: E[ratio] = 1, and at
    // k = 16 the per-pair spread stays within the (1 ± ~3/√k) envelope
    assert(r.getDouble(1) > 0.7 && r.getDouble(1) < 1.3,
      s"mean ratio ${r.getDouble(1)} should concentrate near 1")
  }

  // ---- x234: driver replay of the mSPRT recursion ----

  test("x234 always-valid p ≡ driver day-loop replay; p never increases") {
    def r6(x: Double): Double =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
      .collect()
      .map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ab1:${r.getLong(0)}".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        (if (hex < "8000") "b" else "a",
          math.floor(r.getDouble(1) * 1e6 + 0.5).toLong,
          r.getDate(2).toLocalDate.toEpochDay -
            java.time.LocalDate.parse("2024-01-01").toEpochDay + 1)
      }
    def mom(vt: String) = {
      val v = ev.filter(_._1 == vt).map(_._2 / 1e6)
      val m = v.sum / v.length
      v.map(x => (x - m) * (x - m)).sum / (v.length - 1)
    }
    val sig2 = (mom("a") + mom("b")) / 2.0
    val days = ev.map(_._3).distinct.sorted
    var runMax = Long.MinValue
    val expect = days.map { d =>
      val upTo = ev.filter(_._3 <= d)
      val (na, nb) = (upTo.count(_._1 == "a").toLong,
        upTo.count(_._1 == "b").toLong)
      val (sa, sb) = (upTo.filter(_._1 == "a").map(_._2).sum,
        upTo.filter(_._1 == "b").map(_._2).sum)
      val theta = (sb / 1e6) / nb - (sa / 1e6) / na
      val v = sig2 * (1.0 / na + 1.0 / nb)
      val lnlr = 0.5 * math.log(v / (v + 0.01)) +
        (theta * theta * 0.01) / (2.0 * v * (v + 0.01))
      val lt = math.floor(lnlr * 1e9 + 0.5).toLong
      runMax = math.max(runMax, lt)
      val p = if (runMax > 0) math.exp(-runMax / 1e9) else 1.0
      d -> (na, nb, r6(theta), r6(lt / 1e9), r6(p))
    }.toMap
    val rows = q("x234_msprt")
    assert(rows.length == days.length, "one row per active day")
    var prevP = 2.0
    rows.sortBy(_.getLong(0)).foreach { r =>
      val (na, nb, theta, lnlr, p) = expect(r.getLong(0))
      assert(r.getLong(1) == na && r.getLong(2) == nb, s"day ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - theta) < 1e-9, "theta")
      assert(math.abs(r.getDouble(4) - lnlr) < 1e-9, "ln_lr")
      assert(math.abs(r.getDouble(5) - p) < 1e-9, "p")
      assert(r.getDouble(5) <= prevP + 1e-12,
        "always-valid p is non-increasing")
      prevP = r.getDouble(5)
      assert(r.getLong(6) == (if (p <= 0.05) 1L else 0L), "reject flag")
    }
  }

  // ---- x235: driver class-size loops ----

  test("x235 k-anonymity audit ≡ driver equivalence-class arithmetic") {
    val cust = spark.read.parquet(sf() + "/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nat",
        "c_mktsegment", "CAST(c_acctbal AS DOUBLE) AS bal")
      .collect()
    val classes = cust.groupBy { r =>
      (r.getLong(1), r.getString(2), math.floor(r.getDouble(3) / 1000.0).toLong)
    }.iterator.map { case (_, rows) =>
      val ls = rows.map { r =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"sens:${r.getLong(0)}".getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString.substring(0, 1)
      }.toSet.size.toLong
      (rows.length.toLong, ls)
    }.toSeq
    val nr = classes.map(_._1).sum
    val rows = q("x235_k_anonymity")
    assert(rows.length == 3, "one row per k policy")
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == classes.length.toLong, "n_classes")
      assert(r.getLong(2) == classes.count(_._1 < k).toLong, "violating classes")
      val vr = classes.filter(_._1 < k).map(_._1).sum
      assert(r.getLong(3) == vr, "violating rows")
      assert(math.abs(r.getDouble(4) - math.floor(
        vr.toDouble / nr * 1e6 + 0.5) / 1e6) < 1e-9, "share")
      assert(r.getLong(5) == classes.map(_._2).min, "min_l")
    }
  }

  // ---- x236: brute-force retrieval metrics in driver loops ----

  test("x236 MRR/recall@10 ≡ driver brute-force ranking") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
        "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = e.map(t => t._1 -> math.sqrt(dot(t._2, t._2))).toMap
    val queries = e.filter(_._1 % 25 == 0)
    val metrics = queries.map { case (qid, qv, ql) =>
      val ranked = e.filter(_._1 != qid)
        .map(t => (t._1, t._3, dot(t._2, qv) / (norms(t._1) * norms(qid))))
        .sortBy(t => (-t._3, t._1)).take(10)
      val fr = ranked.zipWithIndex.collectFirst {
        case ((_, l, _), i) if l == ql => i + 1 }
      val hits = ranked.count(_._2 == ql).toLong
      val nrel = e.count(t => t._3 == ql && t._1 != qid).toLong
      (math.floor(fr.map(1.0 / _).getOrElse(0.0) * 1e6 + 0.5).toLong,
        math.floor((if (nrel > 0) hits.toDouble / nrel else 0.0) * 1e6 + 0.5).toLong,
        math.floor(hits.toDouble / 10.0 * 1e6 + 0.5).toLong)
    }
    val n = metrics.length
    val Array(r) = q("x236_mrr_recall")
    assert(r.getLong(0) == n.toLong, "n_queries")
    def m6(s: Long) = math.floor(s.toDouble / 1e6 / n * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getDouble(1) - m6(metrics.map(_._1).sum)) < 1e-9, "mrr")
    assert(math.abs(r.getDouble(2) - m6(metrics.map(_._2).sum)) < 1e-9,
      "recall@10")
    assert(math.abs(r.getDouble(3) - m6(metrics.map(_._3).sum)) < 1e-9,
      "precision@10")
  }

  // ---- x237: driver Holt recursion ----

  test("x237 Holt level/trend ≡ driver recursion per event type") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2)))
    val rows = q("x237_holt")
    val byType = daily.groupBy(_._1)
    assert(rows.length == byType.size, "one row per event type")
    rows.foreach { r =>
      val xs = byType(r.getString(0)).sortBy(_._2).map(_._3)
      assert(r.getLong(1) == xs.length.toLong, "n_days")
      var l = xs(1)
      var b = xs(1) - xs(0)
      xs.drop(2).foreach { x =>
        val l2 = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (l2 - l) + 0.9 * b
        l = l2
      }
      def r6(x: Double) =
        math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(2) - r6(l)) < 1e-9, "level")
      assert(math.abs(r.getDouble(3) - r6(b)) < 1e-9, "trend")
      assert(math.abs(r.getDouble(4) - r6(l + b)) < 1e-9, "fc_1")
      assert(math.abs(r.getDouble(5) - r6(l + 7.0 * b)) < 1e-9, "fc_7")
    }
  }

  // ---- x239: driver tokenizer + greedy encoder loops ----

  test("x239 fertility ≡ driver whitespace/greedy-subword counting") {
    val vocab = ExtensionQueries.SubwordVocab
    def encode(text: String): Long = {
      val s = text.toLowerCase
      var i = 0
      var n = 0L
      while (i < s.length) {
        if (s(i) >= 'a' && s(i) <= 'z') {
          // greedy longest-match: longer units precede in the vocab
          val hit = vocab.find(u => s.regionMatches(i, u, 0, u.length))
          i += hit.map(_.length).getOrElse(1)
          n += 1
        } else i += 1
      }
      n
    }
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = q("x239_fertility")
    val byLang = docs.groupBy(_._1)
    assert(rows.length == byLang.size, "one row per lang")
    rows.foreach { r =>
      val ds = byLang(r.getString(0))
      val nt = ds.map(d =>
        d._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
      val np = ds.map(d => encode(d._2)).sum
      val na = ds.map(_._2.toLowerCase.count(c => c >= 'a' && c <= 'z').toLong).sum
      assert(r.getLong(1) == ds.length.toLong, "n_docs")
      assert(r.getLong(2) == nt, "n_tokens")
      assert(r.getLong(3) == np, "n_pieces (greedy regex ≡ hand scanner)")
      def r6(x: Double) =
        math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(4) - r6(np.toDouble / nt)) < 1e-9, "ppt")
      assert(math.abs(r.getDouble(5) - r6(na.toDouble / np)) < 1e-9, "app")
    }
  }

  // ---- x240: two-pass Welch over driver user diffs + DiD identity ----

  test("x240 DiD ≡ two-pass Welch on user-level diff-of-diffs") {
    val cutoff = 1705363200000000L
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect()
    val users = ev.groupBy(_.getLong(0)).iterator.map { case (uid, rows) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab1:$uid".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      def side(pre: Boolean) = rows
        .filter(r => (r.getLong(2) < cutoff) == pre)
        .map(r => math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).sum / 1e6
      (if (hex < "8000") "b" else "a", side(pre = true), side(pre = false))
    }.toSeq
    def stats(vt: String) = {
      val d = users.filter(_._1 == vt).map(u => u._3 - u._2)
      val m = d.sum / d.length
      (d.length.toLong, m,
        d.map(x => (x - m) * (x - m)).sum / (d.length - 1))
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val did = mb - ma
    val se = math.sqrt(va / na + vb / nb)
    val Array(r) = q("x240_did")
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    def meanPre(vt: String) = {
      val v = users.filter(_._1 == vt); v.map(_._2).sum / v.length
    }
    assert(math.abs(r.getDouble(2) - meanPre("a")) < 1e-5, "pre_a")
    assert(math.abs(r.getDouble(3) - meanPre("b")) < 1e-5, "pre_b")
    assert(math.abs(r.getDouble(4) - did) < 1e-5, "did")
    assert(math.abs(r.getDouble(5) - se) < 1e-5, "se")
    assert(math.abs(r.getDouble(6) - did / se) < 2e-4, "t = did/se")
    // DiD consistency vs x228's frame: did = (post diff) − (pre diff)
    val postDiff = users.filter(_._1 == "b").map(_._3).sum /
      users.count(_._1 == "b") -
      users.filter(_._1 == "a").map(_._3).sum / users.count(_._1 == "a")
    assert(math.abs(did - (postDiff - (meanPre("b") - meanPre("a")))) < 1e-9,
      "DiD identity")
  }

  // ---- x242: driver entropy loops over the planted-secret stream ----

  test("x242 secret scan ≡ driver char-entropy arithmetic; plants flagged") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def entTicks(tok: String): Long = {
      val n = tok.length
      tok.groupBy(identity).values.map { g =>
        val c = g.length
        math.floor((c.toDouble / n) * math.log(n.toDouble / c) * 1e12 + 0.5)
          .toLong
      }.sum
    }
    val perSource = docs.groupBy(_._2).iterator.map { case (src, ds) =>
      val cands = ds.flatMap { case (id, _, text) =>
        val t2 = if (id % 7 == 0) text + " sk_" + md5hex(s"sk:$id") else text
        t2.trim.split("\\s+").filter(_.nonEmpty).filter(t =>
          t.length >= 16 && t.exists(_.isDigit) &&
            t.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      }
      val flagged = cands.map(entTicks).filter(_ >= 2500000000000L)
      src -> (cands.length.toLong, flagged.length.toLong, flagged.sum)
    }.toMap
    val rows = q("x242_secret_scan")
    assert(rows.length == perSource.size, "one row per source with candidates")
    var anyFlagged = 0L
    rows.foreach { r =>
      val (nc, nf, sht) = perSource(r.getString(0))
      assert(r.getLong(1) == nc && r.getLong(2) == nf,
        s"cells for ${r.getString(0)}")
      anyFlagged += nf
      def r6(x: Double) =
        math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(3) - r6(nf.toDouble / nc)) < 1e-9, "rate")
      if (nf > 0)
        assert(math.abs(r.getDouble(4) - r6(sht / 1e12 / nf)) < 1e-9, "mean H")
    }
    assert(anyFlagged > 0, "the planted hex secrets must be flagged")
    // a long natural word stays under the threshold
    assert(entTicks("internationalization") < 2500000000000L,
      "natural words are below the entropy gate")
  }

  // ---- x243: driver quantile interpolation per dimension ----

  test("x243 robust scale ≡ driver quantile_cont interpolation") {
    val vecs = spark.read.parquet(sf() + "/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    def qc(sorted: Array[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val rows = q("x243_robust_scale")
    assert(rows.length == 64, "one row per dimension")
    def r6(x: Double) =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val dim = r.getLong(0).toInt - 1
      val xs = vecs.map(_(dim)).sorted
      assert(r.getLong(1) == vecs.length.toLong, "n")
      assert(math.abs(r.getDouble(2) - r6(qc(xs, 0.5))) < 1e-9, s"median d$dim")
      assert(math.abs(r.getDouble(3) -
        r6(qc(xs, 0.75) - qc(xs, 0.25))) < 1e-9, s"iqr d$dim")
    }
  }

  // ---- x244: driver triple-rank quintile coding ----

  test("x244 RFM cells ≡ driver sorts and quintile codes") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value"), to_date(col("ts")).as("day"))
      .collect()
    val anchor = java.time.LocalDate.parse("2024-01-31").toEpochDay
    val users = ev.groupBy(_.getLong(0)).iterator.map { case (uid, rows) =>
      (uid,
        anchor - rows.map(_.getDate(2).toLocalDate.toEpochDay).max,
        rows.length.toLong,
        rows.map(r => math.floor(r.getDouble(1) * 1e6 + 0.5).toLong).sum)
    }.toArray
    val n = users.length
    def codes(ranked: Array[Long]): Map[Long, Long] =
      ranked.zipWithIndex.map { case (uid, i) =>
        uid -> (i.toLong * 5 / n + 1)
      }.toMap
    val rc = codes(users.sortBy(u => (-u._2, u._1)).map(_._1))
    val fc = codes(users.sortBy(u => (u._3, u._1)).map(_._1))
    val mc = codes(users.sortBy(u => (u._4, u._1)).map(_._1))
    val cells = users.groupBy(u => (rc(u._1), fc(u._1), mc(u._1)))
      .view.mapValues(us => (us.length.toLong, us.map(_._4).sum)).toMap
    val rows = q("x244_rfm")
    assert(rows.length == cells.size, "cell count")
    rows.foreach { r =>
      val (nu, sm) = cells((r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(r.getLong(3) == nu, s"n_users at ${(r.getLong(0), r.getLong(1), r.getLong(2))}")
      def r6(x: Double) =
        math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(4) - r6(sm.toDouble / 1e6 / nu)) < 1e-9,
        "mean_monetary")
    }
    // quintiles are equal-frequency: each axis's code counts differ ≤ 1·⌈n/5⌉
    val perR = users.map(u => rc(u._1)).groupBy(identity).view.mapValues(_.length)
    assert(perR.values.max - perR.values.min <= 1, "balanced R quintiles")
  }

  // ---- x245: driver sessionize + ordered-pair loops + order fixture ----

  test("x245 sequential rules ≡ driver session replay; order-aware") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val bySess = ev.groupBy(_._1).iterator.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { r =>
        if (prev == Long.MinValue || r._2 - prev > 1800000000L) seq += 1
        prev = r._2
        ((uid, seq), r)
      }
    }.toSeq.groupBy(_._1).values
    val firsts = bySess.map(_.map(_._2).sortBy(r => (r._2, r._3))
      .distinctBy(_._4).map(r => (r._4, r._2, r._3)))
    val nA = firsts.flatten.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ordered = firsts.flatMap { fs =>
      for (a <- fs; b <- fs
        if a._1 != b._1 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
        yield (a._1, b._1)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = ordered.filter(_._2 >= 5).toSeq.map { case ((a, b), no) =>
      val conf = math.floor(no.toDouble / nA(a) * 1e6 + 0.5) / 1e6
      (a, b, nA(a), no, conf)
    }.sortBy(t => (-t._5, t._1, t._2)).take(20)
    val rows = q("x245_seq_rules").map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == expect.length, "page size")
    rows.zip(expect).foreach { case (got, exp) =>
      assert(got._1 == exp._1 && got._2 == exp._2 &&
        got._3 == exp._3 && got._4 == exp._4, s"rule $got vs $exp")
      assert(math.abs(got._5 - exp._5) < 1e-9, "confidence")
    }
    // order-awareness: A→B and B→A counts are independent cells
    val ab = ordered.keySet
    assert(ab.exists { case (a, b) =>
      ordered.get((a, b)) != ordered.get((b, a)) },
      "some pair must be asymmetric, or the data cannot distinguish order")
  }

  // ---- x246: driver ESS arithmetic over the engine's weights ----

  test("x246 ESS ≡ driver Kish arithmetic; bounds hold") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val w = graft.operators.Sampling.dsirWeights(docs, "doc_id", "text",
        isTarget = col("source") === "src0", dim = 64)
      .select("weight").collect().map(_.getDouble(0))
    val wmax = w.max
    val ut = w.map(x => math.floor(math.exp(x - wmax) * 1e9 + 0.5).toLong)
    val su = ut.map(BigInt(_)).sum
    val su2 = ut.map(t => BigInt(t) * BigInt(t)).sum
    val ess = (su.toDouble / 1e9) * (su.toDouble / 1e9) / (su2.toDouble / 1e18)
    val Array(r) = q("x246_dsir_ess")
    def r6(x: Double) =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == w.length.toLong, "n_docs")
    assert(math.abs(r.getDouble(1) - r6(ess)) < 1e-9, "ess")
    assert(math.abs(r.getDouble(2) - r6(ess / w.length)) < 1e-9, "fraction")
    assert(math.abs(r.getDouble(3) -
      r6(ut.max.toDouble / su.toDouble)) < 1e-9, "max_share")
    // Kish bounds: 1 ≤ ESS ≤ n; the max weight's share is ≥ 1/n
    assert(r.getDouble(1) >= 1.0 - 1e-6 &&
      r.getDouble(1) <= w.length + 1e-6, "ESS in [1, n]")
    assert(r.getDouble(3) >= 1.0 / w.length - 1e-9, "max share lower bound")
  }

  // ---- x248: driver sort-and-trim vs the histogram device ----

  test("x248 trimmed A/B ≡ driver sort/trim per variant") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("value")).collect()
      .map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ab1:${r.getLong(0)}".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        (if (hex < "8000") "b" else "a",
          math.floor(r.getDouble(1) * 100 + 0.5).toLong)
      }
    def trim(vt: String): (Long, Long, Double) = {
      val xs = ev.filter(_._1 == vt).map(_._2).sorted
      val k = math.floor(xs.length * 0.05).toInt
      val kept = xs.slice(k, xs.length - k)
      (xs.length.toLong, kept.length.toLong,
        kept.map(BigInt(_)).sum.toDouble / kept.length / 100.0)
    }
    val (na, nka, tma) = trim("a")
    val (nb, nkb, tmb) = trim("b")
    val Array(r) = q("x248_robust_ab")
    def r6(x: Double) =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == na && r.getLong(1) == nb, "n per variant")
    assert(r.getLong(2) == nka && r.getLong(3) == nkb, "kept per variant")
    assert(math.abs(r.getDouble(4) - r6(tma)) < 1e-6, "tm_a")
    assert(math.abs(r.getDouble(5) - r6(tmb)) < 1e-6, "tm_b")
    assert(math.abs(r.getDouble(6) - r6(tmb - tma)) < 2e-6, "trimmed_lift")
  }

  // ---- x249: driver quantile interpolation per event type ----

  test("x249 value SLO ≡ driver percentile interpolation") {
    val ev = Tables.events(spark, sf())
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def qc(sorted: Array[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    def r6(x: Double) =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val rows = q("x249_value_slo")
    val byType = ev.groupBy(_._1)
    assert(rows.length == byType.size, "one row per type")
    rows.foreach { r =>
      val xs = byType(r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) == xs.length.toLong, "n")
      assert(math.abs(r.getDouble(2) - r6(qc(xs, 0.5))) < 1e-9, "p50")
      assert(math.abs(r.getDouble(3) - r6(qc(xs, 0.95))) < 1e-9, "p95")
      assert(math.abs(r.getDouble(4) - r6(qc(xs, 0.99))) < 1e-9, "p99")
      assert(math.abs(r.getDouble(5) - r6(xs.last)) < 1e-9, "max")
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-12 &&
        r.getDouble(3) <= r.getDouble(4) + 1e-12 &&
        r.getDouble(4) <= r.getDouble(5) + 1e-12, "monotone percentiles")
    }
  }

  // ---- x250: driver sort-based quantiles vs the histogram walk ----

  test("x250 streamed percentiles ≡ driver sort-based interpolation") {
    val ev = Tables.events(spark, sf())
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 1e6 + 0.5) / 1e6))
    def qc(sorted: Array[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    def r6(x: Double) =
      math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val rows = q("x250_stream_slo")
    val byType = ev.groupBy(_._1)
    assert(rows.length == byType.size * ExtensionQueries.SloPs.size,
      "types x levels rows")
    rows.foreach { r =>
      val xs = byType(r.getString(0)).map(_._2).sorted
      assert(r.getLong(2) == xs.length.toLong, "n")
      assert(math.abs(r.getDouble(3) - r6(qc(xs, r.getDouble(1)))) < 1e-9,
        s"${r.getString(0)} p=${r.getDouble(1)}")
    }
  }
}

package graft

import org.apache.spark.sql.Row

/** Adversarial (oracle-independent) checks for the round-12 robust-stats
  * and corpus-profile operators: each query's scale-safe formulation is
  * re-derived NAIVELY on the driver from the collected base data at
  * sf0.001, so a histogram/rank-arithmetic bug cannot hide behind a
  * DuckDB oracle that mirrors the same arithmetic.
  */
class RobustStatsSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf()).collect()

  test("x215 trimmed mean ≡ naive sort-and-trim (to the cent)") {
    val rows = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1)
    val expected = rows.map { case (flag, fs) =>
      val cents = fs.map(_._2).sorted
      val k = math.floor(cents.length * 0.05).toInt
      val kept = cents.slice(k, cents.length - k)
      flag -> (cents.length.toLong, k.toLong, kept.length.toLong,
        kept.map(BigInt(_)).sum.toDouble / kept.length / 100.0)
    }
    val got = q("x215_trimmed_mean")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (flag, (n, k, nk, mean)) =>
      val (gn, gk, gnk, gmean) = got(flag)
      assert(gn == n && gk == k && gnk == nk, s"counts differ for $flag")
      assert(math.abs(gmean - mean) < 1e-6,
        s"trimmed mean for $flag: got $gmean, naive $mean")
    }
  }

  test("x211 Theil–Sen slope ≡ brute-force pairwise-slope median") {
    val daily = spark.read.parquet(sf() + "/events.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
      (daily(j)._1 - daily(i)._1).toDouble).sorted
    val nn = slopes.length
    val median = (slopes((nn + 1) / 2 - 1) + slopes((nn + 2) / 2 - 1)) / 2
    val Array(r) = q("x211_theil_sen")
    assert(r.getLong(0) == daily.length.toLong, "n_days")
    assert(r.getLong(1) == nn.toLong, "n_pairs")
    assert(math.abs(r.getDouble(2) - median) < 1e-6,
      s"slope: got ${r.getDouble(2)}, naive $median")
  }

  test("x212 JSD is in [0, ln 2], covers every source pair once") {
    val rows = q("x212_jsd_matrix")
    val sources = spark.read.parquet(sf() + "/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length == sources * (sources - 1) / 2, "pair count")
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9,
        s"jsd out of range: ${r.getString(0)}/${r.getString(1)} = $j")
      assert(r.getString(0) < r.getString(1), "upper triangle only")
    }
  }

  test("x213 allocation telescopes to the budget and respects caps") {
    val rows = q("x213_budget_alloc").map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val budget = total / 2
    assert(rows.map(_._4).sum == budget,
      s"allocated ${rows.map(_._4).sum} != budget $budget")
    rows.foreach { case (src, n, _, a) =>
      assert(a >= 0 && a <= n, s"$src alloc $a outside [0, $n]")
    }
    // greedy prefix property: in quality-desc (source-asc) order, every
    // source before the boundary is fully funded, everything after is 0
    val ordered = rows.sortBy { case (src, _, qq, _) => (-qq, src) }
    val fracs = ordered.map { case (_, n, _, a) =>
      if (a == n) 2 else if (a > 0) 1 else 0 }
    assert(fracs.sliding(2).forall(p => p(0) >= p(1)),
      s"allocation is not a greedy prefix: ${ordered.mkString(", ")}")
  }

  test("x210 repetition stats are consistent with a driver recount") {
    val got = q("x210_repetition")
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toMap
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2).trim.split("\\s+")
        .filter(_.nonEmpty)))
      .filter(_._2.length >= 3)
    val repqs = docs.map { case (src, ts) =>
      val tris = ts.sliding(3).map(_.mkString(" ")).toSeq
      val repq = math.floor(
        (tris.size - tris.distinct.size).toDouble / tris.size * 1e6 + 0.5)
        .toLong
      (src, repq)
    }.groupBy(_._1)
    assert(got.keySet == repqs.keySet)
    repqs.foreach { case (src, xs) =>
      val (nDocs, avg, mx, flagged) = got(src)
      assert(nDocs == xs.length.toLong, s"$src n_docs")
      assert(math.abs(avg - xs.map(_._2).sum.toDouble / xs.length / 1e6) < 1e-6)
      assert(math.abs(mx - xs.map(_._2).max / 1e6) < 1e-6)
      assert(flagged == xs.count(_._2 > 500000).toLong, s"$src n_flagged")
    }
  }

  test("x218 median and MAD ≡ naive per-flag sort computation") {
    val rows = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1)
    def med2Of(xs: Array[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val got = q("x218_mad").map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach { case (flag, fs) =>
      val cents = fs.map(_._2)
      val med2 = med2Of(cents)
      val mad4 = med2Of(cents.map(c => math.abs(2 * c - med2)))
      val (n, gmed, gmad) = got(flag)
      assert(n == cents.length.toLong)
      assert(math.abs(gmed - med2 / 200.0) < 1e-6, s"$flag median")
      assert(math.abs(gmad - mad4 / 400.0) < 1e-6, s"$flag mad")
    }
  }

  test("x217 Spearman/Pearson ≡ naive driver computation") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select("n_chars", "text").collect()
      .map(r => (r.getLong(0).toDouble,
        r.getString(1).trim.split("\\s+").count(_.nonEmpty).toDouble))
    def pearson(xs: Array[Double], ys: Array[Double]): Double = {
      val n = xs.length
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      num / den
    }
    def avgRanks(v: Array[Double]): Array[Double] = {
      val groups = v.zipWithIndex.groupBy(_._1)
      val out = new Array[Double](v.length)
      var below = 0L
      groups.toSeq.sortBy(_._1).foreach { case (_, g) =>
        val r = below + (g.length + 1) / 2.0
        g.foreach { case (_, i) => out(i) = r }
        below += g.length
      }
      out
    }
    val Array(r) = q("x217_spearman")
    assert(r.getLong(0) == d.length.toLong)
    val rho = pearson(avgRanks(d.map(_._1)), avgRanks(d.map(_._2)))
    val pr = pearson(d.map(_._1), d.map(_._2))
    assert(math.abs(r.getDouble(1) - rho) < 1e-6,
      s"spearman: got ${r.getDouble(1)}, naive $rho")
    assert(math.abs(r.getDouble(2) - pr) < 1e-6,
      s"pearson: got ${r.getDouble(2)}, naive $pr")
  }

  test("x216 HLL estimate lands within sketch error of the exact count") {
    val rows = q("x216_hll_distinct")
    rows.foreach { r =>
      val (exact, est, relErr) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      // p=9 → 512 registers → σ ≈ 1.04/√512 ≈ 4.6%; 4σ bound with room
      assert(math.abs(relErr) < 0.20,
        s"${r.getString(0)}: est $est vs exact $exact (rel $relErr)")
      // est is rounded to 2 dp and rel_err to 6 dp — allow both slacks
      assert(math.abs(est / exact - 1.0 - relErr) < 0.005 / exact + 1e-6,
        "rel_err consistency")
    }
  }

  test("x220 robust outlier counts ≡ naive modified-z rule") {
    val rows = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1)
    def med2Of(xs: Array[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val got = q("x220_robust_outliers")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (flag, fs) =>
      val cents = fs.map(_._2)
      val med2 = med2Of(cents)
      val mad4 = med2Of(cents.map(c => math.abs(2 * c - med2)))
      val out = cents.count(c => 13490L * math.abs(2 * c - med2) > 35000L * mad4)
      val (n, gout) = got(flag)
      assert(n == cents.length.toLong && gout == out.toLong,
        s"$flag: got $gout outliers of $n, naive $out")
    }
  }

  test("x219 confusion cells partition each truth language") {
    val rows = q("x219_langid_eval")
    val perLang = spark.read.parquet(sf() + "/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byTruth = rows.groupBy(_.getString(0))
    assert(byTruth.keySet == perLang.keySet)
    byTruth.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(2)).sum == perLang(lang), s"$lang cell sum")
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4,
        s"$lang shares")
    }
  }

  test("x214 shares sum to 1 per unit; buckets stay in range") {
    val rows = q("x214_seasonality")
    val byUnit = rows.groupBy(_.getString(0))
    assert(byUnit.keySet == Set("dow", "hour"))
    byUnit.foreach { case (unit, rs) =>
      val hi = if (unit == "dow") 7L else 24L
      rs.foreach { r =>
        assert(r.getLong(1) >= 0L && r.getLong(1) < hi, s"$unit bucket")
      }
      val share = rs.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$unit shares sum to $share")
    }
  }
}

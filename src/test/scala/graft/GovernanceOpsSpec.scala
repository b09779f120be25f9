package graft

import org.apache.spark.sql.functions._

/** Oracle-independent checks for the round-13 batches x254–x261: each
  * statistic re-derived on the driver by a DIFFERENT algorithm (hand
  * md5/inverse-CDF arithmetic, brute per-source sorts, adjacency-set
  * triangle counting, per-doc gram maps, per-class EMD loops, kernel pairing), so the engine arithmetic
  * cannot hide behind a DuckDB oracle that mirrors it.
  */
class GovernanceOpsSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf()).collect()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs() = spark.read.parquet(sf() + "/documents.parquet")
    .select("source", "doc_id", "text").collect()
    .map(r => (r.getString(0), r.getLong(1),
      r.getString(2).trim.split("\\s+").filter(_.nonEmpty).toSeq))

  test("x254 DP counts ≡ hand Laplace inverse-CDF over the md5 tickets") {
    val counts = docs().groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def noise(src: String, lab: String, eps: Double): Double = {
      val ut = java.lang.Long.parseLong(
        md5hex(s"dp1:$src:$lab").substring(0, 8), 16)
      val u = ut.toDouble / 4294967296.0
      val sign = if (ut >= 2147483648L) 1.0 else -1.0
      -(1.0 / eps) * sign * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val got = q("x254_dp_counts")
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.size == counts.size * 2)
    counts.foreach { case (src, n) =>
      for ((lab, eps) <- Seq(("e01", 0.1), ("e10", 1.0))) {
        val expect = BigDecimal(n + noise(src, lab, eps))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((src, eps)) - expect) < 1e-9,
          s"$src eps=$eps: ${got((src, eps))} vs $expect")
      }
    }
    // the release actually perturbs: some count must move, and the
    // tight budget must move it further on average than the loose one
    val moved = counts.toSeq.map { case (src, n) =>
      (math.abs(got((src, 0.1)) - n), math.abs(got((src, 1.0)) - n))
    }
    assert(moved.exists(_._1 > 0.5))
    assert(moved.map(_._1).sum > moved.map(_._2).sum)
    // the stream twin maintains the additive counts and applies the SAME
    // read-time mechanism — released rows must be identical
    val streamed = q("x263_stream_dp_counts")
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(streamed == got, "stream DP release drifted from batch")
    // the ticket salt is LIVE: a different (production-secret-shaped)
    // salt must re-draw the noise — if any released value survived a
    // salt change, the draw wouldn't depend on the salt and the
    // documented secret-salt production mode would be a no-op
    val countsDf = spark.read.parquet(sf() + "/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val resalted = ExtensionQueries
      .dpCountRelease(countsDf, ticketSalt = "prod-secret-3f9a")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(resalted.keySet == got.keySet)
    assert(resalted.forall { case (k, v) => v != got(k) },
      "a release value survived a salt change — salt not wired into the draw")
  }

  test("x255 per-source Gini ≡ brute per-source sort; x258 stream twin identical") {
    val bySrc = docs().groupBy(_._1)
    val expect = bySrc.map { case (src, rows) =>
      val xs = rows.map(r => (r._3.length.toLong, r._2)).sortBy(identity)
        .map(_._1)
      val n = xs.length
      val sx = xs.sum
      val srx = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      src -> (n.toLong, sx,
        (2.0 * srx - (n + 1.0) * sx) / (n.toDouble * sx))
    }
    def check(rows: Array[org.apache.spark.sql.Row]): Unit = {
      assert(rows.length == expect.size)
      rows.foreach { r =>
        val (n, sx, g) = expect(r.getString(0))
        assert(r.getLong(1) == n && r.getLong(2) == sx)
        assert(math.abs(r.getDouble(3) - g) < 5e-7, r.toString)
      }
    }
    val batch = q("x255_source_gini")
    check(batch)
    val streamed = q("x258_stream_gini")
    check(streamed)
    assert(batch.map(_.toString).sorted.sameElements(
      streamed.map(_.toString).sorted), "stream twin drifted from batch")
  }

  test("x256 DOULION estimate ≡ brute adjacency-set count on the hash-sampled graph; within 6σ of brute exact") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.distinct.groupBy(_._1).values
    val und = byOrder.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    def triangles(edges: Set[(Long, Long)]): Long = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
        .withDefaultValue(Set.empty)
      edges.foreach { case (u, v) => adj(u) += v } // u < v: forward only
      edges.iterator.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum
    }
    val sampled = und.filter { case (u, v) =>
      java.lang.Long.parseLong(md5hex(s"$u:$v").substring(0, 8), 16) % 4 == 0
    }
    val r = q("x256_approx_triangles").head
    assert(r.getLong(0) == und.size.toLong, "full edge count")
    assert(r.getLong(1) == sampled.size.toLong, "sampled edge count")
    assert(r.getLong(2) == triangles(sampled), "sampled triangle count")
    assert(r.getLong(3) == r.getLong(2) * 64, "estimator scale")
    val exact = triangles(und)
    assert(math.abs(r.getLong(3) - exact).toDouble <=
      6.0 * math.sqrt(63.0 * exact) + 64,
      s"estimate ${r.getLong(3)} vs exact $exact outside the DOULION bound")
  }

  test("x259 t-closeness ≡ brute per-class EMD over the 16-value sensitive domain") {
    val rows = spark.read.parquet(sf() + "/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal", "c_custkey")
      .collect().map { r =>
        val band = math.floor(r.getDouble(2) / 1000.0).toLong
        ((r.getInt(0), r.getString(1), band),
          md5hex(s"sens:${r.getLong(3)}").substring(0, 1))
      }
    val domain = "0123456789abcdef".map(_.toString)
    val glob = domain.map(d => rows.count(_._2 == d).toLong)
    val nTot = rows.length.toLong
    val expect = rows.groupBy(_._1).map { case (cls, members) =>
      val n = members.length.toLong
      val cs = domain.map(d => members.count(_._2 == d).toLong)
      var cum = 0L
      var sad = 0L
      cs.zip(glob).foreach { case (c, g) =>
        cum += c * nTot - g * n; sad += math.abs(cum)
      }
      cls -> (n, sad.toDouble / (n.toDouble * nTot * 15.0))
    }
    val got = q("x259_t_closeness").map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (cls, (n, t)) =>
      assert(got(cls)._1 == n, s"$cls size")
      assert(math.abs(got(cls)._2 - t) < 5e-7, s"$cls t: ${got(cls)._2} vs $t")
    }
    // the statistic must vary across classes (a leak-free corpus would
    // make the audit vacuous)
    assert(expect.values.map(_._2).toSet.size > 1)
  }

  test("x260 weighted reservoir ≡ hand A-ES top-50; long docs overrepresented") {
    val all = docs().map { case (_, id, ts) => (id, ts.length.toLong) }
      .filter(_._2 > 0)
    val keyed = all.map { case (id, w) =>
      val ut = java.lang.Long.parseLong(
        md5hex(s"res1:$id").substring(0, 8), 16)
      (id, w, math.log((ut.toDouble + 1.0) / 4294967296.0) / w)
    }
    val expect = keyed.sortBy(t => (-t._3, t._1)).take(50)
    val got = q("x260_weighted_reservoir")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    got.zip(expect).foreach { case ((_, w, k), (_, ew, ek)) =>
      assert(w == ew)
      assert(math.abs(k - ek) < 5e-10)
    }
    // weighting bites: the sample's mean weight exceeds the corpus mean
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("x261 linear MMD² ≡ hand kernel pairing; the shifted contrast separates") {
    val ev = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    def mmd(shift: Boolean): (Long, Double) = {
      val xs = ev.filter(_._1 % 2 == 0).map(_._2)
      val ys0 = ev.filter(_._1 % 2 == 1).map(_._2)
      val ys = if (!shift) ys0
        else ys0.map(v => v.updated(0, v(0) + 0.5))
      val m = math.min(xs.length, ys.length)
      def k(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0
        var i = 0
        while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
        math.exp(-d / 128.0)
      }
      val hs = (0 until m / 2).map { j =>
        val (x1, y1, x2, y2) = (xs(2 * j), ys(2 * j), xs(2 * j + 1), ys(2 * j + 1))
        k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1)
      }
      (hs.length.toLong, hs.map(h => math.floor(h * 1e9 + 0.5)).sum / 1e9 / hs.length)
    }
    val got = q("x261_mmd_drift")
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((label, shift) <- Seq("same" -> false, "shifted" -> true)) {
      val (m, v) = mmd(shift)
      assert(got(label)._1 == m, s"$label pair count")
      assert(math.abs(got(label)._2 - v) < 5e-7,
        s"$label: ${got(label)._2} vs $v")
    }
    assert(got("shifted")._2 > got("same")._2 + 1e-4,
      "the shifted contrast must separate from the null split")
  }

  test("x264 IPW ≡ hand Horvitz–Thompson; the synthesized confounding biases naive, IPW de-biases") {
    val ev = Tables.events(spark, sf())
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    var (n, nt, syT, syC) = (0L, 0L, 0L, 0L)
    var (swT, swC) = (BigInt(0), BigInt(0))
    var (swnT, swnC) = (0L, 0L)
    ev.foreach { case (uid, v) =>
      val g = (uid % 4).toInt
      val ut = java.lang.Long.parseLong(
        md5hex(s"trt1:$uid").substring(0, 8), 16)
      val t = ut.toDouble / 4294967296.0 < (g + 1).toDouble / 5.0
      val ym = math.floor((v + g * 100.0) * 1e6 + 0.5).toLong
      val w12 = if (t) 60 / (g + 1) else 60 / (4 - g)
      n += 1
      if (t) { nt += 1; syT += ym; swT += BigInt(ym) * w12; swnT += w12 }
      else { syC += ym; swC += BigInt(ym) * w12; swnC += w12 }
    }
    val naive = (syT.toDouble / nt - syC.toDouble / (n - nt)) / 1e6
    val ipw = (swT.toDouble / swnT - swC.toDouble / swnC) / 1e6
    val r = q("x264_ipw_ate").head
    assert(r.getLong(0) == n && r.getLong(1) == nt)
    assert(math.abs(r.getDouble(2) - naive) < 5e-7)
    assert(math.abs(r.getDouble(3) - ipw) < 5e-7)
    // the design's whole point: treatment skews toward high-g strata,
    // the outcome carries a g shift, so the naive contrast is biased
    // while the true effect is 0 — IPW must land much closer to 0
    assert(math.abs(r.getDouble(3)) < math.abs(r.getDouble(2)) / 2,
      s"IPW ${r.getDouble(3)} did not de-bias naive ${r.getDouble(2)}")
  }

  test("x265 dispersion ≡ hand day-spine variance; synthetic arrivals sit near Poisson") {
    val ev = Tables.events(spark, sf())
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val days = ev.map(_._2)
    val (lo, hi) = (days.min, days.max)
    val spine = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(hi)).toSeq
    val got = q("x265_overdispersion").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val perDay = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cs = spine.map(d => perDay.getOrElse(d, 0L))
      val nd = cs.length.toDouble
      val mean = cs.sum / nd
      val varc = cs.map(c => (c - mean) * (c - mean)).sum / (nd - 1.0)
      val (gd, ge, gdisp) = got(tpe)
      assert(gd == cs.length.toLong && ge == cs.sum)
      assert(math.abs(gdisp - varc / mean) < 5e-6, s"$tpe dispersion")
      // uniform synthetic arrivals: D must sit in a sane Poisson band
      assert(gdisp > 0.3 && gdisp < 3.0, s"$tpe D=$gdisp")
    }
  }

  test("x257 gram novelty ≡ per-doc gram maps with first-occurrence origin") {
    val grams = docs().filter(_._3.length >= 5).map { case (_, id, ts) =>
      id -> ts.sliding(5).map(_.mkString(" ")).toSet
    }
    val firstOf = grams.flatMap { case (id, gs) => gs.iterator.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = q("x257_gram_novelty")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == grams.map(_._1).toSet)
    grams.foreach { case (id, gs) =>
      val (n, novel) = got(id)
      assert(n == gs.size.toLong, s"doc $id gram count")
      assert(novel == gs.count(g => firstOf(g) == id).toLong, s"doc $id novel")
    }
    // the signal separates: some doc must be fully novel, some not
    assert(got.values.exists { case (n, nv) => nv == n })
    assert(got.values.exists { case (n, nv) => nv < n })
  }
}

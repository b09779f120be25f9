package graft

import org.apache.spark.sql.functions._

/** Oracle-independent checks for the round-13 batch x254–x258: each
  * statistic re-derived on the driver by a DIFFERENT algorithm (hand
  * md5/inverse-CDF arithmetic, brute per-source sorts, adjacency-set
  * triangle counting, per-doc gram maps), so the engine arithmetic
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

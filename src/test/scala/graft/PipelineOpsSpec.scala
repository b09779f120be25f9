package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-9 dataloader/curation operators (x107-x112):
  * bucketed batching geometry, token-budget greediness, epoch-mixture
  * accounting, robust-outlier counts vs a driver-side recompute, Markov
  * probability mass, and the matryoshka overlap bounds. The bit-exact
  * cross-engine check is the DuckDB oracle (tools/check_oracle.py); these
  * lock the properties the hash compare cannot name.
  */
class PipelineOpsSpec extends SparkSpec {

  private def run(name: String) =
    ExtensionQueries.queries(name)(spark, sf())

  test("x107: batch geometry — <=8 rows, max<=cap, waste nonneg, partition-complete") {
    val rows = run("x107_length_batching").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cap, nRows, maxTok, waste) =
        (r.getAs[Long]("cap"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("max_tok"), r.getAs[Long]("pad_waste"))
      assert(nRows >= 1 && nRows <= 8, s"batch of $nRows rows")
      assert(maxTok <= cap && maxTok > cap - 64, s"max $maxTok outside ($cap-64,$cap]")
      assert(waste >= 0 && waste <= nRows * 63, s"waste $waste vs rows $nRows")
    }
    // every doc with tokens lands in exactly one batch
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val docs = Tables.table(spark, sf(), "documents")
      .filter(graft.functions.TextFunctions.tokenCount(col("text")) > 0).count()
    assert(total == docs, s"batched $total of $docs docs")
    // within a cap, only the LAST batch may be ragged
    rows.groupBy(_.getAs[Long]("cap")).foreach { case (cap, bs) =>
      val byBatch = bs.sortBy(_.getAs[Long]("batch"))
      assert(byBatch.map(_.getAs[Long]("batch")).toSeq ==
        byBatch.indices.map(_.toLong), s"cap $cap batches not contiguous")
      byBatch.dropRight(1).foreach(b =>
        assert(b.getAs[Long]("n_rows") == 8, s"cap $cap non-final ragged batch"))
    }
  }

  test("x108: greedy budget — per-source cum monotone, total <= 2000, next doc would overflow") {
    val rows = run("x108_token_budget").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val cums = rs.map(_.getAs[Long]("cum_tok")).sorted
      val toks = rs.map(_.getAs[Long]("n_tok")).sum
      assert(cums.last == toks, s"$src cum/nTok mismatch")
      assert(cums.last <= 2000L, s"$src busts the budget: ${cums.last}")
    }
  }

  test("x109: mixture accounting — reps contiguous; per-source plan inside (budget-max, budget]") {
    val rows = run("x109_epoch_mixture").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Long]("rep")).sorted.toSeq ==
        (0L until rs.length.toLong), s"doc $id reps not 0..n-1")
    }
    val docTok = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    rows.groupBy(r => docTok(r.getAs[Long]("doc_id"))._1).foreach { case (src, rs) =>
      val planned = rs.map(r => docTok(r.getAs[Long]("doc_id"))._2).sum
      val maxTok = docTok.values.filter(_._1 == src).map(_._2).max
      assert(planned <= 10000L, s"$src planned $planned > budget")
      assert(planned > 10000L - maxTok,
        s"$src left ${10000L - planned} unspent >= a whole doc ($maxTok)")
    }
  }

  test("x110: median/MAD outlier counts match a driver-side exact recompute") {
    val got = run("x110_robust_outliers").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"))).toMap
    val raw = Tables.events(spark, sf()).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    raw.groupBy(_._1).foreach { case (t, vs) =>
      val values = vs.map(_._2)
      val med = median(values)
      val mad = median(values.map(v => math.abs(v - med)))
      val out = values.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      assert(got(t) == (values.length.toLong, out.toLong),
        s"$t: got ${got(t)}, want (${values.length},$out)")
    }
  }

  test("x111: probability mass sums to ~1 per cur; transition count = events - users") {
    val rows = run("x111_markov_transitions").collect()
    rows.groupBy(_.getAs[String]("cur_type")).foreach { case (cur, rs) =>
      val mass = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$cur mass $mass")
    }
    val e = Tables.events(spark, sf())
    val want = e.count() - e.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == want)
  }

  test("x112: overlap in [0,10]; recall field consistent; all 5 queries present") {
    val rows = run("x112_matryoshka_recall").collect()
    assert(rows.map(_.getAs[Long]("query_id")).sorted.toSeq == (0L until 5L))
    rows.foreach { r =>
      val o = r.getAs[Long]("overlap")
      assert(o >= 0 && o <= 10)
      assert(math.abs(r.getAs[Double]("recall_at_10") - o / 10.0) < 1e-9)
    }
  }

  test("x113: bucket-prefix-sum global rank — norm is a permutation-free monotone remap") {
    val rows = run("x113_quantile_normalize").collect()
    val docs = Tables.table(spark, sf(), "documents").count()
    assert(rows.length == docs, "every doc gets a normalized value")
    // within a source, normalization preserves the (n_chars, doc_id) order
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val norms = sorted.map(_.getAs[Long]("norm_chars"))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b },
        s"$src norm not monotone in source rank")
    }
    // the max-rank doc of every source maps to the global max value
    val globalMax = rows.map(_.getAs[Long]("n_chars")).max
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val top = rs.maxBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      assert(top.getAs[Long]("norm_chars") == globalMax,
        s"$src top doc normalized to ${top.getAs[Long]("norm_chars")}, want $globalMax")
    }
  }

  test("x114: datacard internal consistency vs direct recomputes") {
    val rows = run("x114_datacard").collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val want = Tables.table(spark, sf(), "documents")
      .filter(graft.functions.TextFunctions.tokenCount(col("text")) > 0).count()
    assert(nDocs == want, s"datacard covers $nDocs of $want non-empty docs")
    rows.foreach { r =>
      assert(r.getAs[Double]("dup_rate") >= 0.0 && r.getAs[Double]("dup_rate") < 1.0)
      assert(r.getAs[Double]("mean_quality") > 0.0 && r.getAs[Double]("mean_quality") <= 1.0)
      assert(r.getAs[Long]("n_langs") >= 1)
    }
  }

  test("x115: rbo in [0,1]; identical rankings give rbo = truncated-mass bound") {
    val rows = run("x115_rbo").collect()
    assert(rows.map(_.getAs[Long]("query_id")).sorted.toSeq == (0L until 5L))
    // truncated RBO_min at depth 10 with perfect agreement:
    // (1-p)/p * Σ p^d = (1-p)/p * p(1-p^10)/(1-p) = 1 - p^10 ≈ 0.6513
    val perfect = 1.0 - math.pow(0.9, 10)
    rows.foreach { r =>
      val v = r.getAs[Double]("rbo")
      assert(v >= 0.0 && v <= perfect + 1e-9, s"rbo $v outside [0, $perfect]")
    }
    // rbo must be consistent with x112's set overlap: zero overlap ⇒ 0
    val overlap = run("x112_matryoshka_recall").collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("overlap")).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      if (overlap(q) == 0L) assert(r.getAs[Double]("rbo") == 0.0)
      if (overlap(q) == 10L) assert(r.getAs[Double]("rbo") > 0.0)
    }
  }

  test("x117: co-purchase cosine matches a driver-side recompute on a sample") {
    val rows = run("x117_copurchase_sim").collect()
    assert(rows.nonEmpty, "no co-purchase pairs with c_ab >= 3")
    val li = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val marg = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    rows.take(20).foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val cab = byOrder.count(s => s.contains(a) && s.contains(b)).toLong
      assert(r.getAs[Long]("c_ab") == cab, s"($a,$b) c_ab")
      val want = cab / math.sqrt((marg(a) * marg(b)).toDouble)
      assert(math.abs(r.getAs[Double]("sim") - want) < 1e-6, s"($a,$b) sim")
    }
  }

  test("x118: z-order blocks give tighter 2-D spans than a single-column sort layout") {
    // sf0.1: 5000 parts x 100 suppliers — at sf0.001 the supplier keyspace
    // (10 keys) is so small every layout spans it fully and the locality
    // claim is vacuous
    val rows = ExtensionQueries.queries("x118_zorder_blocks")(spark, sf("sf0.1"))
      .collect()
    assert(rows.length > 1)
    // z-curve correctness on a sample: interleave recomputed bitwise
    val z = ExtensionQueries.zorderExpr("pk", "sk", "div")
    import spark.implicits._
    val sample = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (1L, 2L))
      .toDF("pk", "sk").withColumn("z", expr(z)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sample.foreach { case (pk, sk, got) =>
      var want = 0L
      for (i <- 0 until 16)
        want |= (((pk >> i) & 1L) << (2 * i)) | (((sk >> i) & 1L) << (2 * i + 1))
      assert(got == want, s"z($pk,$sk) = $got, want $want")
    }
    // locality: mean sk-span within z-blocks must beat blocks of the
    // pk-sorted layout (which scrambles sk) — the data-skipping claim
    val skSpan = rows.map(r => r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min"))
      .sum.toDouble / rows.length
    val li = Tables.table(spark, sf("sf0.1"), "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .orderBy(col("l_partkey"), col("l_suppkey"))
      .withColumn("rn", monotonically_increasing_id())
    val naive = li.withColumn("block", expr("rn div 1000"))
      .groupBy(col("block"))
      .agg((max(col("l_suppkey")) - min(col("l_suppkey"))).as("span"))
      .agg(avg(col("span"))).head().getDouble(0)
    assert(skSpan < naive,
      s"z-block sk span $skSpan not tighter than pk-sort layout $naive")
  }

  test("x119: ppr mass conserved; teleport concentrates rank on the seed side") {
    val rows = run("x119_ppr").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    // symmetrized graph has no dangling mass: Σ rank ≈ 1 (12-dp ticks)
    val mass = rows.values.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass")
    val seeds = Seq(0L, 2L, 4L, 6L).filter(rows.contains)
    assert(seeds.nonEmpty)
    val seedMean = seeds.map(rows).sum / seeds.size
    val restMean = (rows -- seeds).values.sum / (rows.size - seeds.size)
    assert(seedMean > 5 * restMean,
      s"seeds $seedMean not concentrated vs rest $restMean")
  }

  test("x120: estimates gated within 15% of exact; exact overlaps match a recompute") {
    val rows = run("x120_hll_overlap").collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Boolean]("within_15pct")), "an estimate busts 15%")
    val docs = Tables.table(spark, sf(), "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty).toSet
    }
    rows.foreach { r =>
      val want = (vocab(r.getAs[String]("source_a")) &
        vocab(r.getAs[String]("source_b"))).size.toLong
      assert(r.getAs[Long]("overlap_exact") == want)
    }
  }

  test("x121: ewma lies within each type's daily-count envelope") {
    val rows = run("x121_ewma_daily").collect()
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val ns = daily.filter(_._1 == t).map(_._2)
      val e = r.getAs[Double]("ewma")
      assert(e >= ns.min - 1e-9 && e <= ns.max + 1e-9, s"$t ewma $e outside envelope")
      assert(r.getAs[Long]("n_days") == ns.length)
    }
  }

  test("x122: every pair within threshold; distances match a driver-side recompute") {
    val rows = run("x122_edit_pairs").collect()
    assert(rows.nonEmpty, "edit-distance verify never fires — dead test")
    val texts = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    rows.take(10).foreach { r =>
      val d = lev(texts(r.getAs[Long]("id_a")), texts(r.getAs[Long]("id_b")))
      assert(r.getAs[Long]("dist") == d && d <= 60)
    }
  }

  test("x123: stream-maintained EWMA equals the batch x121 row for row") {
    val batch = run("x121_ewma_daily").collect().map(_.toSeq)
    val stream = run("x123_stream_ewma").collect().map(_.toSeq)
    assert(batch.nonEmpty && batch.toSeq == stream.toSeq,
      "stream-maintained daily counts diverged from the batch aggregate")
  }

  test("x124: grid is complete, zero-filled, and count-preserving") {
    val rows = run("x124_gap_fill").collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val slots = rows.length / types.length
    assert(rows.length == types.length * slots, "ragged grid")
    // hours are contiguous within each type (1h = 3_600_000_000 us)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val hs = rs.map(_.getAs[Long]("hour_us")).sorted
      assert(hs.zip(hs.tail).forall { case (a, b) => b - a == 3600000000L },
        s"$t grid not hour-contiguous")
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf()).count(), "counts not preserved")
    assert(rows.exists(r => !r.getAs[Boolean]("observed")), "no gaps — dead fill test")
    assert(rows.filter(!_.getAs[Boolean]("observed"))
      .forall(_.getAs[Long]("n") == 0L))
  }

  test("x125: first bucket is all-new; new counts sum to the global vocabulary") {
    val rows = run("x125_vocab_novelty").collect()
    val first = rows.minBy(_.getAs[Long]("bucket"))
    assert(first.getAs[Double]("novelty") == 1.0, "bucket 0 must be 100% new")
    val vocab = Tables.table(spark, sf(), "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == vocab,
      "first-seen counts must partition the vocabulary")
  }

  test("x126: welch t matches a driver-side recompute from raw values") {
    val r = run("x126_ab_welch").collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(s0: String) = md.digest(s0.getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    val vals = Tables.events(spark, sf())
      .select(col("user_id"), col("value")).collect()
      .map(x => (hex4(s"ab1:${x.getLong(0)}") < "8000", x.getDouble(1)))
    def stats(xs: Array[Double]) = {
      val vm = xs.map(v => math.floor(v * 1e6 + 0.5).toLong)
      val n = vm.length.toDouble
      val m = (vm.sum.toDouble / 1e6) / n
      val q = vm.map(x => BigInt(x) * BigInt(x)).sum
      val v = (q.toDouble / 1e12 - n * m * m) / (n - 1)
      (n, m, v)
    }
    val (na, ma, va) = stats(vals.filter(!_._1).map(_._2))
    val (nb, mb, vb) = stats(vals.filter(_._1).map(_._2))
    val t = (mb - ma) / math.sqrt(va / na + vb / nb)
    assert(r.getAs[Long]("n_a") == na.toLong && r.getAs[Long]("n_b") == nb.toLong)
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-5,
      s"t ${r.getAs[Double]("t")} vs recomputed $t")
  }

  test("x127: funnel is monotone non-increasing and stage-count consistent") {
    val rows = run("x127_pipeline_funnel").collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 5)
    val ns = rows.map(_.getAs[Long]("n_docs"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, "funnel grew")
    assert(ns.head == Tables.table(spark, sf(), "documents")
      .filter(col("doc_id") % 50 =!= 0).count())
    assert(ns.last > 0, "everything filtered — dead funnel")
    rows.tail.foreach { r =>
      assert(r.getAs[Double]("retention") > 0.0 &&
        r.getAs[Double]("retention") <= 1.0)
    }
  }

  test("x128: exactly K=100 rows; per-source picks within quota; quotas near-proportional") {
    val rows = run("x128_quota_sample").collect()
    assert(rows.length == 100, s"got ${rows.length} rows, want exactly 100")
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      assert(rs.length.toLong == quota, s"$src picked ${rs.length} of quota $quota")
    }
    // largest-remainder property: every quota within 1 of the exact share
    val d = Tables.table(spark, sf(), "documents")
      .filter(graft.functions.TextFunctions.tokenCount(col("text")) > 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = d.values.sum.toDouble
    bySrc.foreach { case (src, rs) =>
      val share = 100.0 * d(src) / total
      assert(math.abs(rs.length - share) < 1.0 + 1e-9,
        s"$src quota ${rs.length} vs share $share")
    }
  }

  test("x129: scd2 tier join matches a driver-side interval replay") {
    val got = run("x129_scd2_tiers").collect()
      .map(r => r.getAs[Long]("tier") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("amount"))).toMap
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val want = scala.collection.mutable.Map[Long, (Long, Long)]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        val vm = math.floor(r._5 * 1e6 + 0.5).toLong
        cum += vm
        val tier = if (cum < 100000000L) 0L else if (cum < 500000000L) 1L else 2L
        if (r._4 == "purchase") {
          val (n, s0) = want.getOrElse(tier, (0L, 0L))
          want(tier) = (n + 1, s0 + vm)
        }
      }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (tier, (n, s0)) =>
      assert(got(tier)._1 == n, s"tier $tier n_purchases")
      assert(math.abs(got(tier)._2 - s0 / 1e6) < 1e-5, s"tier $tier amount")
    }
  }

  test("x130: k-core peel cascades over multiple rounds on a planted graph") {
    import spark.implicits._
    // 4-clique (the 3-core) + a pendant triangle-ish tail: 5-(4,6,7),
    // 6-(5,7), 7-(5,6). Round 1 peels 6,7 (deg 2); only THEN 5 drops
    // below 3 — a genuine multi-round cascade.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L))
      .toDF("src", "dst")
    val one = graft.operators.Graph.kCore(edges, "src", "dst", k = 3, rounds = 1)
      .collect().map(_.getAs[Long]("node")).toSet
    assert(one.contains(5L), "node 5 must survive round 1 (deg 3 before the peel)")
    val fix = graft.operators.Graph.kCore(edges, "src", "dst", k = 3, rounds = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(fix == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the clique, got $fix")
    // fixpoint: more rounds change nothing
    val more = graft.operators.Graph.kCore(edges, "src", "dst", k = 3, rounds = 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(more == fix)
  }

  test("x131: sign words match a bitwise driver recompute; overlap bounded") {
    val rows = run("x131_sign_bits_recall").collect()
    assert(rows.map(_.getAs[Long]("query_id")).sorted.toSeq == (0L until 5L))
    rows.foreach(r => assert(r.getAs[Long]("overlap") >= 0 &&
      r.getAs[Long]("overlap") <= 10))
    // recompute the packed words for a few vectors through the shared
    // expression builder vs plain Scala bit logic
    val vecs = Tables.table(spark, sf(), "embeddings").limit(3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    import spark.implicits._
    vecs.foreach { case (id, v) =>
      val df = Seq(Tuple1(v.map(_.toDouble))).toDF("vec")
        .withColumn("w1", expr(ExtensionQueries.signWordExpr(
          j => s"element_at(vec, $j)", 0)))
        .withColumn("w2", expr(ExtensionQueries.signWordExpr(
          j => s"element_at(vec, $j)", 32)))
        .collect().head
      def word(lo: Int) = (0 until 32).map { j =>
        if (v(lo + j) > 0) 1L << j else 0L
      }.sum
      assert(df.getAs[Long]("w1") == word(0) && df.getAs[Long]("w2") == word(32),
        s"vec $id sign words diverge")
    }
  }

  test("x132: hard negatives always cross labels and rank by true cosine") {
    val rows = run("x132_hard_negatives").collect()
    assert(rows.length == 15, "5 queries x top-3")
    val labels = Tables.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("query_id")) != labels(r.getAs[Long]("item_id")),
        "a hard negative shares the query's label")
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q negatives not cosine-ordered")
    }
  }

  test("x133: separation report covers every label; cosine means bounded") {
    val rows = run("x133_class_separation").collect()
    val nLabels = Tables.table(spark, sf(), "embeddings")
      .select(col("label")).distinct().count()
    assert(rows.length == nLabels)
    val total = Tables.table(spark, sf(), "embeddings").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      Seq("intra_cos", "inter_cos").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6, s"$c = $v")
      }
      assert(math.abs(r.getAs[Double]("margin") -
        (r.getAs[Double]("intra_cos") - r.getAs[Double]("inter_cos"))) < 1e-5)
    }
  }

  test("x134: ks statistic matches an exact driver-side CDF sweep") {
    val r = run("x134_ks_drift").collect().head
    val vs = Tables.events(spark, sf())
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0) % 2 == 0, math.floor(x.getDouble(1) * 1e6 + 0.5).toLong))
    val a = vs.filter(_._1).map(_._2).sorted
    val b = vs.filterNot(_._1).map(_._2).sorted
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val ks = (a ++ b).distinct.sorted.map { v =>
      val cuma = a.count(_ <= v).toLong
      val cumb = b.count(_ <= v).toLong
      math.abs(cuma * nb - cumb * na)
    }.max.toDouble / (na * nb)
    assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
    assert(math.abs(r.getAs[Double]("ks") - ks) < 1e-6,
      s"ks ${r.getAs[Double]("ks")} vs $ks")
  }

  test("x135: chi2 matches a driver-side contingency recompute") {
    val r = run("x135_chi2_drift").collect().head
    val cells = Tables.events(spark, sf())
      .select(col("event_type"), (col("event_id") % 2).as("half")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = cells.values.sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (h, m) => h -> m.values.sum }
    val chi2 = cells.toSeq.sortBy(_._1).map { case ((t, h), o) =>
      val e = rt(t) * ct(h) / n
      (o - e) * (o - e) / e
    }.sum
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("dof") == rt.size - 1)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4,
      s"chi2 ${r.getAs[Double]("chi2")} vs $chi2")
  }

  test("x136: transition coverage complete; perplexity positive") {
    val rows = run("x136_behavior_perplexity").collect()
    val e = Tables.events(spark, sf())
    val want = e.count() - e.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_tr")).sum == want,
      "per-user transition counts must partition all transitions")
    rows.foreach(r => assert(r.getAs[Double]("mean_nlp") > 0.0))
  }

  test("x137: greedy gains non-increasing; coverage accumulates; first pick is argmax") {
    val rows = run("x137_greedy_cover").collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to 5L))
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      "greedy gains must be non-increasing (submodularity)")
    val cov = rows.map(_.getAs[Long]("covered_total"))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a })
    assert(cov.head == gains.head, "step 1 covers exactly its own gain")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 5)
    val best = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"),
        size(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .cast("long").as("g"))
      .orderBy(col("g").desc, col("doc_id")).limit(1).collect().head
    assert(rows.head.getAs[Long]("doc_id") == best.getLong(0) &&
      gains.head == best.getLong(1))
  }

  test("x138: fused ranking is score-ordered and consistent with both sources") {
    val rows = run("x138_rrf_fusion").collect()
    assert(rows.length == 50, "5 queries x top-10")
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q fusion not score-ordered")
      // max possible RRF with both rank-1 hits; min with one rank-10 hit
      assert(byRank.head <= 2.0 / 61.0 + 1e-9 && byRank.last >= 1.0 / 70.0 - 1e-9)
    }
  }

  test("x139: equal-frequency bins partition the corpus; means monotone; gap consistent") {
    val rows = run("x139_calibration").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L),
      "equal-frequency binning must produce all 10 bins")
    val docs = Tables.table(spark, sf(), "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == docs)
    // equal-frequency: bin sizes differ by at most 1 from N/10
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n") - docs / 10) <= 1))
    val means = rows.map(_.getAs[Double]("mean_pred"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      "score-ordered bins must have non-decreasing mean predicted p")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("gap") -
        (r.getAs[Double]("mean_pred") - r.getAs[Double]("frac_pos"))) < 1e-5)
      assert(r.getAs[Double]("mean_pred") > 0.0 && r.getAs[Double]("mean_pred") < 1.0)
    }
  }

  test("x140: confusion partitions the corpus; kappa matches a driver recompute") {
    val r = run("x140_cohens_kappa").collect().head
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"), r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n == n11 + n10 + n01 + n00)
    assert(n == Tables.table(spark, sf(), "documents").count())
    val po = (n11 + n00).toDouble / n
    val pa = (n11 + n10).toDouble / n
    val pb = (n11 + n01).toDouble / n
    val pe = pa * pb + (1 - pa) * (1 - pb)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-5)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("x141: rule arithmetic consistent; one rule matches a driver recount") {
    val rows = run("x141_assoc_rules").collect()
    assert(rows.nonEmpty)
    val nu = Tables.events(spark, sf())
      .select(col("user_id")).distinct().count()
    rows.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab >= 5 && nab <= math.min(na, nb))
      assert(math.abs(r.getAs[Double]("support") - nab.toDouble / nu) < 1e-5)
      assert(math.abs(r.getAs[Double]("confidence") - nab.toDouble / na) < 1e-5)
      assert(math.abs(r.getAs[Double]("lift") -
        nab.toDouble * nu / (na.toDouble * nb)) < 1e-4)
    }
    // spot-recount the first rule from the raw baskets
    val first = rows.minBy(r => (r.getAs[String]("ante"), r.getAs[String]("cons")))
    val baskets = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type")).distinct().collect()
      .groupBy(_.getLong(0)).map { case (_, v) => v.map(_.getString(1)).toSet }
    val want = baskets.count(b =>
      b.contains(first.getAs[String]("ante")) && b.contains(first.getAs[String]("cons")))
    assert(first.getAs[Long]("n_ab") == want)
  }

  test("x142: Zipf slope negative and matches a driver-side OLS recompute") {
    val r = run("x142_zipf_fit").collect().head
    val counts = Tables.table(spark, sf(), "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(100)
      .collect().map(_.getAs[Long]("c"))
    assert(r.getAs[Long]("n_terms") == counts.length,
      "fit must cover min(100, vocab) terms")
    val slope = r.getAs[Double]("slope")
    assert(slope < 0.0, s"Zipf slope must be negative, got $slope")
    val pts = counts.zipWithIndex.map { case (c, i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - want) < 1e-3, s"slope $slope vs local $want")
    val wantB = (sy - want * sx) / n
    assert(math.abs(r.getAs[Double]("intercept") - wantB) < 1e-3)
  }

  test("x143: dow frame complete; indices average to 1 under event weights") {
    val rows = run("x143_seasonal_index").collect()
    assert(rows.map(_.getAs[Long]("dow")).sorted.toSeq == (0L to 6L))
    val total = Tables.events(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0.0))
    // Σ n·index / N = 1 by construction (ratio-to-overall)
    val wmean = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("seasonal_index")).sum / total
    assert(math.abs(wmean - 1.0) < 1e-3, s"weighted mean index $wmean != 1")
  }

  test("x144: changepoint matches a driver-side CUSUM recompute") {
    val r = run("x144_cusum_changepoint").collect().head
    val daily = Tables.events(spark, sf())
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getAs[java.sql.Date]("day"), x.getAs[Long]("c")))
      .sortBy(_._1.toString)
    val dd = daily.length.toLong
    val tt = daily.map(_._2).sum
    assert(r.getAs[Long]("n_days") == dd && r.getAs[Long]("total") == tt)
    var cum = 0L
    val sds = daily.zipWithIndex.map { case ((day, c), i) =>
      cum += c; (day, cum * dd - (i + 1) * tt) }
    val best = sds.maxBy(s => (math.abs(s._2), -s._1.getTime))
    assert(r.getAs[java.sql.Date]("at_day").toString == best._1.toString)
    assert(math.abs(r.getAs[Double]("cusum") - best._2.toDouble / dd) < 1e-4)
  }

  test("x145: every graph node labeled exactly once with a node id; communities shrink labels") {
    val rows = run("x145_label_prop").collect()
    val po = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nodes = po.as("a").join(po.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .select(explode(array(col("a.pk"), col("b.pk"))).as("n"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(rows.length == nodes.size, "one labeled row per graph node")
    assert(rows.map(_.getAs[Long]("node")).toSet == nodes)
    val labels = rows.map(_.getAs[Long]("label")).toSet
    assert(labels.subsetOf(nodes), "labels must be node ids")
    assert(labels.size < nodes.size, "propagation must merge at least one label")
  }

  test("x146: AA pairs share orders; one score matches a driver recompute") {
    val rows = run("x146_adamic_adar").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("u") < r.getAs[Long]("v"))
      assert(r.getAs[Long]("n_common") >= 1)
      assert(r.getAs[Double]("aa_score") > 0.0)
    }
    // driver recompute of the top pair's score from the raw baskets
    val orders = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, v) => v.map(_._2).toSet }
      .filter(_.size >= 2).toSeq
    val top = rows.head
    val (u, v) = (top.getAs[Long]("u"), top.getAs[Long]("v"))
    val shared = orders.filter(o => o.contains(u) && o.contains(v))
    val want = shared.map(o =>
      math.floor(1e6 / math.log(o.size.toDouble) + 0.5).toLong).sum
    assert(top.getAs[Long]("n_common") == shared.size)
    assert(math.abs(top.getAs[Double]("aa_score") - want / 1e6) < 1e-5)
  }

  test("x147: scores descend; one doc matches a driver-side BM25 recompute") {
    val rows = run("x147_bm25").collect()
    assert(rows.length == 50)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")
        .filter(_.nonEmpty).toSeq).filter(_._2.nonEmpty)
    val nn = docs.length.toDouble
    val tt = docs.map(_._2.length).sum.toDouble
    val q = ExtensionQueries.Bm25Query
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val top = rows.head
    val toks = docs.find(_._1 == top.getAs[Long]("doc_id")).get._2
    val dl = toks.length.toDouble
    val want = q.filter(toks.contains).map { t =>
      val tf = toks.count(_ == t).toDouble
      math.log((nn - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
        (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl * nn / tt)))
    }.sum
    assert(math.abs(top.getAs[Double]("bm25") - want) < 1e-4,
      s"bm25 ${top.getAs[Double]("bm25")} vs local $want")
    assert(top.getAs[Long]("dl") == toks.length)
  }

  test("x148: ndcg bounded, consistent with dcg, and <= 1 with equality iff perfect order") {
    val rows = run("x148_ndcg").collect()
    assert(rows.length == 5)
    val idcg = (1 to 10).map(r => (11 - r) / (math.log(r + 1.0) / math.log(2.0))).sum
    rows.foreach { r =>
      val (dcg, ndcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("ndcg"))
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(math.abs(ndcg - dcg / idcg) < 1e-4)
    }
  }

  test("x149: stream-maintained CUSUM equals the batch x144 row") {
    val batch = run("x144_cusum_changepoint").collect().head
    val stream = run("x149_stream_cusum").collect().head
    assert(stream.getAs[java.sql.Date]("at_day").toString ==
      batch.getAs[java.sql.Date]("at_day").toString)
    assert(stream.getAs[Long]("n_days") == batch.getAs[Long]("n_days"))
    assert(stream.getAs[Long]("total") == batch.getAs[Long]("total"))
    assert(stream.getAs[Double]("cusum") == batch.getAs[Double]("cusum"))
  }

  test("x150: exact F2 matches a driver recompute; AMS median is a sane estimate") {
    val r = run("x150_ams_f2").collect().head
    val counts = Tables.table(spark, sf(), "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(_.getAs[Long]("c"))
    assert(r.getAs[Long]("n_tokens") == counts.length)
    assert(r.getAs[Long]("f2") == counts.map(c => c * c).sum)
    val (f2, med) = (r.getAs[Long]("f2").toDouble, r.getAs[Double]("ams_med"))
    assert(med > 0.0 && med < 10.0 * f2,
      s"AMS median $med implausible vs F2 $f2")
    assert(math.abs(r.getAs[Double]("rel_err") - (med - f2) / f2) < 1e-5)
  }

  test("x151: gini in [0,1) and matches a driver recompute") {
    val r = run("x151_gini_concentration").collect().head
    val counts = Tables.table(spark, sf(), "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getAs[Long]("c"), x.getAs[String]("t")))
      .sortBy(identity)
    val n = counts.length.toLong
    val total = counts.map(_._1).sum
    val src = counts.zipWithIndex.map { case ((c, _), i) => (i + 1) * c }.sum
    val want = (2 * src - (n + 1) * total).toDouble / (n * total).toDouble
    assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("total") == total)
    assert(math.abs(r.getAs[Double]("gini") - want) < 1e-5)
    assert(want >= 0.0 && want < 1.0)
  }

  test("x152: coverage shares monotone in k and bounded by 1") {
    val rows = run("x152_coverage_curve").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq ==
      ExtensionQueries.CoverageKs.sorted)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    shares.foreach(sh => assert(sh > 0.0 && sh <= 1.0))
    rows.foreach(r => assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("k")))
    assert(rows.last.getAs[Long]("mass") <=
      rows.last.getAs[Long]("n_vocab") * Long.MaxValue) // type sanity
  }

  test("x153: Hill alpha positive and matches a driver recompute") {
    val r = run("x153_hill_tail").collect().head
    val counts = Tables.table(spark, sf(), "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getAs[Long]("c"), x.getAs[String]("t")))
      .sortBy { case (c, t) => (-c, t) }.take(51)
    val k = counts.length - 1
    val cref = counts.last._1
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("c_ref") == cref)
    val slm = counts.take(k).map { case (c, _) =>
      math.floor(math.log(c.toDouble / cref) * 1e6 + 0.5).toLong }.sum
    assert(math.abs(r.getAs[Double]("alpha") - k.toDouble * 1e6 / slm) < 1e-4)
    assert(r.getAs[Double]("alpha") > 0.0)
  }

  test("x154: modularity matches a driver recompute over the x145 labels") {
    val r = run("x154_modularity").collect().head
    val labels = run("x145_label_prop").collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Long]("label")).toMap
    val po = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = po.as("a").join(po.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk"), col("b.pk")).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val m = edges.length.toLong
    assert(r.getAs[Long]("m") == m)
    val sec = edges.count { case (u, v) => labels(u) == labels(v) }.toLong
    val dc = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(labels).map { case (_, v) => v.length.toLong }
    assert(r.getAs[Long]("n_communities") == labels.values.toSet.size)
    val want = (4 * m * sec - dc.map(d => d * d).sum).toDouble / (4 * m * m).toDouble
    assert(math.abs(r.getAs[Double]("q") - want) < 1e-5)
    assert(want > -0.5 && want <= 1.0)
  }

  test("x155: bootstrap CI ordered, brackets plausible, deterministic") {
    val r1 = run("x155_poisson_bootstrap").collect().head
    val r2 = run("x155_poisson_bootstrap").collect().head
    assert(r1 == r2, "md5-driven bootstrap must be rerun-identical")
    val (mean, lo, hi) = (r1.getAs[Double]("mean"),
      r1.getAs[Double]("boot_lo"), r1.getAs[Double]("boot_hi"))
    assert(lo <= hi)
    assert(math.abs(hi - lo) < math.abs(mean).max(1.0),
      s"CI [$lo,$hi] implausibly wide vs mean $mean")
    assert(mean >= lo - (hi - lo) && mean <= hi + (hi - lo),
      s"mean $mean far outside CI [$lo,$hi]")
    val n = Tables.events(spark, sf()).count()
    assert(r1.getAs[Long]("n_events") == n)
  }

  test("x156: 5 distinct picks per query; pick 1 is the exact top-1; scores bounded") {
    val rows = run("x156_mmr_diversify").collect()
    assert(rows.length == 25, "5 queries x 5 picks")
    val eD = Tables.table(spark, sf(), "embeddings")
      .withColumn("vec", transform(col("embedding"), x => x.cast("double")))
    val top1 = graft.operators.Similarity.bruteForceTopK(
      eD, "vec_id", "vec", eD.filter(col("vec_id") < 5), "vec_id", "vec",
      k = 1)
      .collect().map(r =>
        r.getAs[Long]("query_id") -> r.getAs[Long]("item_id")).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val picks = rs.sortBy(_.getAs[Long]("pick_no")).map(_.getAs[Long]("item_id"))
      assert(picks.distinct.length == 5, s"query $q picked a duplicate")
      assert(picks.head == top1(q),
        s"query $q pick 1 ${picks.head} != exact top-1 ${top1(q)}")
      val scores = rs.sortBy(_.getAs[Long]("pick_no")).map(_.getAs[Double]("mmr_score"))
      // pick 1 score is 0.7*rel(top1) <= 0.7; later picks carry a
      // diversity penalty so they are bounded by 0.7 too
      scores.foreach(sc => assert(sc <= 0.7 + 1e-9 && sc >= -1.0))
      assert(scores.head >= scores.last - 1e-9,
        s"query $q first MMR score below last — penalty inverted")
    }
  }

  test("x157: pairs ordered and above threshold; one pair matches a driver idf recompute") {
    val rows = run("x157_weighted_jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("wjaccard") >= 0.3 - 1e-9)
      assert(r.getAs[Double]("wjaccard") <= 1.0 + 1e-9)
    }
    // driver recompute of the first pair
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).distinct.toSet)
      .toMap
    val nn = docs.size
    val df = docs.values.flatten.groupBy(identity).map { case (t, v) => t -> v.size }
    def wm(t: String): Long =
      math.floor(math.log((nn + 1).toDouble / (df(t) + 1)) * 1e6 + 0.5).toLong
    val first = rows.minBy(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val (a, b) = (docs(first.getAs[Long]("id_a")), docs(first.getAs[Long]("id_b")))
    val si = (a & b).toSeq.map(wm).sum
    val su = a.toSeq.map(wm).sum + b.toSeq.map(wm).sum - si
    assert(math.abs(first.getAs[Double]("wjaccard") - si.toDouble / su) < 1e-5)
  }

  test("x158: every user is 'new' exactly once; states partition active weeks") {
    val rows = run("x158_lifecycle_cohorts").collect()
    val states = rows.map(_.getAs[String]("state")).toSet
    assert(states.subsetOf(Set("new", "retained", "resurrected")))
    val users = Tables.events(spark, sf())
      .select(col("user_id")).distinct().count()
    assert(rows.filter(_.getAs[String]("state") == "new")
      .map(_.getAs[Long]("n_users")).sum == users,
      "each user must be classified 'new' exactly once")
    val weeklyActive = Tables.events(spark, sf())
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == weeklyActive,
      "states must partition all (user, active week) rows")
    // the earliest week is all-new
    val firstWk = rows.map(_.getAs[java.sql.Date]("wk").toString).min
    rows.filter(_.getAs[java.sql.Date]("wk").toString == firstWk)
      .foreach(r => assert(r.getAs[String]("state") == "new"))
  }

  test("x159: top skip-gram pair matches a driver recount; score identity holds") {
    val rows = run("x159_skipgram_pairs").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val want = (r.getAs[Long]("n1") * 1000000L + r.getAs[Long]("n2") * 500000L)
        .toDouble / 1e6
      assert(math.abs(r.getAs[Double]("score") - want) < 1e-6,
        "score must equal the integer weight identity")
    }
    val top = rows.head
    val (a, b) = (top.getAs[String]("a"), top.getAs[String]("b"))
    val toks = Tables.table(spark, sf(), "documents")
      .select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    val n1 = toks.map(_.sliding(2).count(w =>
      w.length == 2 && w(0) == a && w(1) == b)).sum
    val n2 = toks.map(_.sliding(3).count(w =>
      w.length == 3 && w(0) == a && w(2) == b)).sum
    assert(top.getAs[Long]("n1") == n1 && top.getAs[Long]("n2") == n2)
  }

  test("x160: per-query top-10 descending; results share vocabulary with the query") {
    val rows = run("x160_tfidf_search").collect()
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSet).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.length == 10)
      val coss = byRank.map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
      coss.foreach(c => assert(c > 0.0 && c <= 1.0 + 1e-9))
      byRank.foreach(r => assert(
        (docs(q) & docs(r.getAs[Long]("doc_id"))).nonEmpty,
        "a tf-idf match must share at least one token"))
      assert(!byRank.exists(_.getAs[Long]("doc_id") == q), "self excluded")
    }
  }

  test("x161: eval counts consistent; f1 is the harmonic identity") {
    val r = run("x161_simhash_eval").collect().head
    val (tp, np, nt) = (r.getAs[Long]("tp"), r.getAs[Long]("n_pred"),
      r.getAs[Long]("n_truth"))
    assert(tp <= math.min(np, nt))
    assert(r.getAs[Double]("precision") >= 0.0 && r.getAs[Double]("precision") <= 1.0)
    assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
    assert(math.abs(r.getAs[Double]("f1") - 2.0 * tp / (np + nt)) < 1e-5)
    assert(nt > 0, "truth pairs must exist or the eval is vacuous")
  }

  test("x162: threshold is an observed score; F1 beats the accept-all baseline") {
    val r = run("x162_optimal_threshold").collect().head
    val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"))
    assert(math.abs(r.getAs[Double]("f1") -
      math.floor(2.0 * tp / (2 * tp + fp + fn) * 1e6 + 0.5) / 1e6) < 1e-6)
    val docs = Tables.table(spark, sf(), "documents")
    val n = docs.count()
    val p = docs.filter(col("source") === "src0").count()
    assert(tp + fn == p, "tp+fn must equal the positive count")
    val f1All = 2.0 * p / (n + p)
    assert(r.getAs[Double]("f1") >= f1All - 1e-9,
      "argmax F1 must be at least the accept-all baseline")
  }

  test("x163: lp negative; transitions partition all char trigrams") {
    val rows = run("x163_char_trigram_lm").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("mean_lp") < 0.0,
      "add-1 char-LM log-probs must be negative"))
    val want = Tables.table(spark, sf(), "documents")
      .select(regexp_replace(lower(col("text")), "[^a-z ]", "").as("cs"))
      .filter(length(col("cs")) >= 3)
      .agg(sum(length(col("cs")) - 2)).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tri")).sum == want,
      "per-doc trigram counts must partition the corpus")
  }

  test("x164: keeper accounting consistent; totals match the corpus") {
    val rows = run("x164_dedup_impact").collect()
    val docs = Tables.table(spark, sf(), "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val distinctTexts = docs.select(col("text")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctTexts,
      "global keepers must equal distinct texts")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_removed") >= 0)
      val pct = r.getAs[Double]("pct_removed")
      assert(pct >= 0.0 && pct < 1.0)
    }
  }

  test("x165: estimate error small; sample bounded by min(2000, SNM candidates)") {
    val r = run("x165_minhash_estimate").collect().head
    val cand = graft.operators.Snm.pairs(
      Tables.table(spark, sf(), "documents"), "doc_id", "text",
      blockCol = "lang", w = 5, prefixLen = 24, threshold = 0.0).count()
    assert(r.getAs[Long]("n_pairs") <= math.min(2000L, cand))
    assert(r.getAs[Long]("n_pairs") > 0)
    // 128 hashes: SE of the estimate is ~sqrt(j(1-j)/128) <= 0.045 —
    // the MEAN abs error across pairs must sit well inside that
    assert(r.getAs[Double]("mean_abs_err") < 0.06,
      s"mean |est-J| ${r.getAs[Double]("mean_abs_err")} implausibly high for 128 hashes")
    assert(r.getAs[Double]("max_abs_err") <= 0.5)
  }

  test("x166: psi nonneg per source (same-sign terms); doc accounting closes") {
    val rows = run("x166_psi_drift").collect()
    val bySource = Tables.table(spark, sf(), "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == bySource.size, "one row per source")
    rows.foreach { r =>
      // (p−q) and ln(p/q) always share a sign, so PSI ≥ 0 exactly
      assert(r.getAs[Double]("psi") >= 0.0,
        s"${r.getAs[String]("source")} psi ${r.getAs[Double]("psi")} < 0")
      assert(r.getAs[Long]("n_docs") == bySource(r.getAs[String]("source")))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == bySource.values.sum)
  }

  test("x167: wasserstein matches an exact driver-side CDF integral") {
    val r = run("x167_wasserstein_drift").collect().head
    val vs = Tables.events(spark, sf())
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0) % 2 == 0, math.floor(x.getDouble(1) * 1e6 + 0.5).toLong))
    val a = vs.filter(_._1).map(_._2)
    val b = vs.filterNot(_._1).map(_._2)
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val grid = (a ++ b).distinct.sorted
    val num = grid.zip(grid.tail).map { case (v, nxt) =>
      val cuma = a.count(_ <= v).toLong
      val cumb = b.count(_ <= v).toLong
      BigInt(math.abs(cuma * nb - cumb * na)) * BigInt(nxt - v)
    }.sum
    val w1 = (BigDecimal(num) / (BigDecimal(na) * nb * 1000000L)).toDouble
    assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
    assert(math.abs(r.getAs[Double]("w1") - w1) < 1e-6,
      s"w1 ${r.getAs[Double]("w1")} vs $w1")
    assert(r.getAs[Double]("w1") >= 0.0)
  }

  test("x168: naive bayes beats the majority-prior baseline; accounting closes") {
    val rows = run("x168_naive_bayes").collect()
    val bySource = Tables.table(spark, sf(), "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == bySource(r.getAs[String]("source")))
      assert(r.getAs[Long]("n_correct") >= 0 &&
        r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val correct = rows.map(_.getAs[Long]("n_correct")).sum.toDouble
    // predicting the single most-common source would score maxShare;
    // a trained classifier on 20 roughly-balanced sources must beat it
    val maxShare = bySource.values.max.toDouble / total
    assert(correct / total > math.max(2 * maxShare, 0.10),
      s"accuracy ${correct / total} vs majority baseline $maxShare")
  }

  test("x170: heaps fit matches an exact driver-side OLS recompute") {
    val r = run("x170_heaps_law").collect().head
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).sortBy(_._1)
    val seen = collection.mutable.Set[String]()
    var (nk, vk) = (0L, 0L)
    val pts = docs.flatMap { case (_, text) =>
      val ts = text.trim.split("\\s+").filter(_.nonEmpty)
      nk += ts.length
      vk += ts.count(seen.add)
      if (nk > 0 && vk > 0)
        Some((math.floor(math.log(nk.toDouble) * 1e9 + 0.5).toLong,
          math.floor(math.log(vk.toDouble) * 1e9 + 0.5).toLong))
      else None
    }
    val n = pts.length.toLong
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val beta = (BigDecimal(n * sxy - sx * sy) /
      BigDecimal(n * sxx - sx * sx)).toDouble
    assert(r.getAs[Long]("n_points") == n)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-5,
      s"beta ${r.getAs[Double]("beta")} vs $beta")
    // a growth exponent is a rate in [0, 1); the synthetic corpus's
    // fixed vocab saturates (β≈0) — web corpora sit near 0.5
    assert(r.getAs[Double]("beta") >= 0.0 && r.getAs[Double]("beta") < 1.0)
  }

  test("x171: bh ordering/prefix invariants; chi2 matches a driver recompute") {
    val rows = run("x171_bh_fdr").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("chi2") >= b.getAs[Double]("chi2"))
      assert(a.getAs[Double]("thr_chi2") >= b.getAs[Double]("thr_chi2"))
      // step-up rejections form a prefix of the ranking
      assert(a.getAs[Boolean]("rejected") || !b.getAs[Boolean]("rejected"))
    case _ => ()
    }
    // recompute the top source's chi2 from the quality scores
    val quality = run("x03_quality").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val src = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bands = quality.toSeq.map { case (id, qv) =>
      (src(id), math.min(2L, math.floor(qv * 10000 + 0.5).toLong / 3334)) }
    val top = rows.head.getAs[String]("source")
    val nn = bands.size.toDouble
    val nsrc = bands.count(_._1 == top).toDouble
    val chi2 = (0L to 2L).flatMap { b =>
      val g = bands.count(_._2 == b).toDouble
      if (g == 0) Nil
      else Seq(("in", bands.count(x => x._1 == top && x._2 == b).toDouble, nsrc),
        ("out", bands.count(x => x._1 != top && x._2 == b).toDouble, nn - nsrc))
        .map { case (_, o, ct) => val e = g * ct / nn; (o - e) * (o - e) / e }
    }.sum
    assert(math.abs(rows.head.getAs[Double]("chi2") - chi2) < 1e-5,
      s"chi2 ${rows.head.getAs[Double]("chi2")} vs $chi2")
  }

  test("x172: accounting closes; halves match a driver-side split; deterministic") {
    val rows = run("x172_mixed_lang").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, nm) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_mixed"))
      assert(nm >= 0 && nm <= nd, s"n_mixed $nm outside [0, $nd]")
      val pct = math.floor(nm.toDouble / nd * 10000 + 0.5) / 10000
      assert(math.abs(r.getAs[Double]("pct_mixed") - pct) < 1e-9)
    }
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // every >=2-token doc is counted in exactly one source row
    val eligible = docs.count(_._2.trim.split("\\s+").count(_.nonEmpty) >= 2)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == eligible)
    // recompute n_mixed with the halves sliced DRIVER-side (checks the
    // query's slice arithmetic), lang-id'd by the engine on half-strings
    import spark.implicits._
    val halves = docs.toSeq.flatMap { case (src, text) =>
      val ts = text.trim.split("\\s+").filter(_.nonEmpty)
      if (ts.length < 2) None
      else {
        val h = (ts.length + 1) / 2
        Some((src, ts.take(h).mkString(" "), ts.drop(h).mkString(" ")))
      }
    }.toDF("source", "ha", "hb")
    val mixed = halves.select(col("source"),
        graft.functions.TextFunctions.langId(col("ha")).as("la"),
        graft.functions.TextFunctions.langId(col("hb")).as("lb"))
      .collect()
      .filter(r => r.getString(1) != r.getString(2)
        && r.getString(1) != "und" && r.getString(2) != "und")
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.length.toLong }
    rows.foreach(r => assert(r.getAs[Long]("n_mixed") ==
      mixed.getOrElse(r.getAs[String]("source"), 0L),
      s"${r.getAs[String]("source")} n_mixed mismatch"))
    // the half-split is a pure function of the token stream — rerun-identical
    val again = run("x172_mixed_lang").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("x173: g2 nonneg descending; top term counts, direction and G2 match a recompute") {
    val rows = run("x173_keyness").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Double]("g2") >= 0.0))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("g2") >= b.getAs[Double]("g2"))
      case _ => ()
    }
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
    val ta = docs.filter(_._1 == "src0").map(d => toks(d._2).length.toLong).sum
    val tb = docs.filter(_._1 != "src0").map(d => toks(d._2).length.toLong).sum
    val top = rows.head
    val term = top.getAs[String]("term")
    val a = docs.filter(_._1 == "src0")
      .map(d => toks(d._2).count(_ == term).toLong).sum
    val b = docs.filter(_._1 != "src0")
      .map(d => toks(d._2).count(_ == term).toLong).sum
    assert(top.getAs[Long]("n_target") == a && top.getAs[Long]("n_rest") == b)
    assert(top.getAs[String]("dir") == (if (a * tb > b * ta) "src0" else "rest"))
    def term0(o: Long, t: Long) =
      if (o == 0) 0.0
      else o * math.log(o.toDouble * (ta + tb) / ((a + b).toDouble * t))
    val g2 = 2 * (term0(a, ta) + term0(b, tb))
    assert(math.abs(top.getAs[Double]("g2") - g2) < 1e-5,
      s"g2 ${top.getAs[Double]("g2")} vs $g2")
  }

  test("x174: 9-digit spine; p_obs sums to 1; chi2 constant, nonneg, matches recompute") {
    val rows = run("x174_benford").collect().sortBy(_.getAs[Long]("digit"))
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val chi2s = rows.map(_.getAs[Double]("chi2")).distinct
    assert(chi2s.length == 1, "chi2 must be the one corpus-level statistic")
    assert(chi2s.head >= 0.0)
    assert(math.abs(rows.map(_.getAs[Double]("p_obs")).sum - 1.0) < 1e-5)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toInt
      val p = math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getAs[Double]("p_benford") - p) < 1e-9)
    }
    // leading digits recomputed driver-side from the raw totals
    val lead = Tables.table(spark, sf(), "orders")
      .selectExpr("CAST(floor(o_totalprice) AS BIGINT) AS v").collect()
      .map(_.getLong(0).toString.head.asDigit.toLong)
    assert(rows.map(_.getAs[Long]("n_obs")).sum == lead.length)
    val n = lead.length.toDouble
    val chi2 = (1 to 9).map { d =>
      val o = lead.count(_ == d).toDouble
      val e = n * math.log10(1.0 + 1.0 / d)
      (o - e) * (o - e) / e
    }.sum
    rows.foreach(r => assert(r.getAs[Long]("n_obs") ==
      lead.count(_ == r.getAs[Long]("digit"))))
    assert(math.abs(chi2s.head - chi2) < 1e-5, s"chi2 ${chi2s.head} vs $chi2")
  }

  test("x175: burstiness nonneg descending; floors honored; top term matches VMR recompute") {
    val rows = run("x175_burstiness").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") >= 50L, "support floor tf >= 50")
      assert(r.getAs[Long]("df") >= 2L, "support floor df >= 2")
      // D·Σm² ≥ (Σm)² by Cauchy-Schwarz — VMR burstiness cannot go negative
      assert(r.getAs[Double]("burstiness") >= 0.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("burstiness") >= b.getAs[Double]("burstiness"))
      case _ => ()
    }
    val texts = Tables.table(spark, sf(), "documents")
      .select(col("text")).collect().map(_.getString(0))
    val term = rows.head.getAs[String]("term")
    val ms = texts.map(_.trim.split("\\s+").count(_ == term).toLong)
    val dd = texts.length
    val sm = ms.sum
    val sm2 = ms.map(m => m * m).sum
    assert(rows.head.getAs[Long]("tf") == sm)
    assert(rows.head.getAs[Long]("df") == ms.count(_ > 0).toLong)
    val b = (dd.toDouble * sm2 - sm.toDouble * sm) / (dd.toDouble * sm)
    assert(math.abs(rows.head.getAs[Double]("burstiness") - b) < 1e-5,
      s"burstiness ${rows.head.getAs[Double]("burstiness")} vs $b")
  }

  test("x178: jsd in [0, ln2]; full pair matrix; one pair matches a driver recompute") {
    val rows = run("x178_jsd_matrix").collect()
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nSrc = docs.map(_._1).distinct.length
    assert(rows.length == nSrc * (nSrc - 1) / 2, "upper-triangular pair matrix")
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val j = r.getAs[Double]("jsd")
      // per-term combined contributions are >= 0 (log-sum inequality),
      // and JSD is bounded by ln 2
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9, s"jsd $j out of range")
    }
    // driver recompute for the first pair
    val top = rows.head
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
    def dist(src: String): Map[String, Long] = docs.filter(_._1 == src)
      .flatMap(d => toks(d._2)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val (da, db) = (dist(top.getAs[String]("src_a")), dist(top.getAs[String]("src_b")))
    val (na, nb) = (da.values.sum.toDouble, db.values.sum.toDouble)
    val jsd = (da.keySet ++ db.keySet).toSeq.map { t =>
      val pa = da.getOrElse(t, 0L) / na
      val pb = db.getOrElse(t, 0L) / nb
      val m = (pa + pb) / 2
      (if (pa > 0) pa * math.log(pa / m) else 0.0) +
        (if (pb > 0) pb * math.log(pb / m) else 0.0)
    }.sum / 2
    assert((da.keySet ++ db.keySet).size == top.getAs[Long]("n_terms"))
    assert(math.abs(top.getAs[Double]("jsd") - jsd) < 1e-5,
      s"jsd ${top.getAs[Double]("jsd")} vs $jsd")
  }

  test("x179: distinct-n bounds and a driver recompute for one source") {
    val rows = run("x179_distinct_ngrams").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("d_unigrams") <= r.getAs[Long]("n_unigrams"))
      assert(r.getAs[Long]("d_bigrams") <= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Double]("distinct1") > 0.0 && r.getAs[Double]("distinct1") <= 1.0)
      assert(r.getAs[Double]("distinct2") >= 0.0 && r.getAs[Double]("distinct2") <= 1.0)
      // a corpus with any repetition has distinct2 >= distinct1 almost
      // surely false in general — only the count identity is invariant:
      // per-source bigram count = unigram count - docs with >= 1 token
      assert(r.getAs[Long]("n_bigrams") <= r.getAs[Long]("n_unigrams"))
    }
    val src0 = rows.head.getAs[String]("source")
    val texts = Tables.table(spark, sf(), "documents")
      .filter(col("source") === src0).select(col("text")).collect()
      .map(_.getString(0))
    val unis = texts.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
    val bis = texts.flatMap { t =>
      val ts = t.trim.split("\\s+").filter(_.nonEmpty)
      ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }
    assert(rows.head.getAs[Long]("n_unigrams") == unis.length.toLong)
    assert(rows.head.getAs[Long]("d_unigrams") == unis.distinct.length.toLong)
    assert(rows.head.getAs[Long]("n_bigrams") == bis.length.toLong)
    assert(rows.head.getAs[Long]("d_bigrams") == bis.distinct.length.toLong)
  }

  test("x180: matrix canonical; pair accounting closes against the pair frame") {
    val rows = run("x180_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b")))
    assert(math.abs(rows.map(_.getAs[Double]("pct")).sum - 1.0) < 1e-4)
    val pairs = graft.operators.Dedup.minhashPairs(
      Tables.table(spark, sf(), "documents"), "doc_id", "text",
      k = 3, threshold = 0.8).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs)
    graft.engine.CacheScope.drain()
  }

  test("x181: mean pairwise cosine matches a brute-force driver recompute") {
    val r = run("x181_embedding_diversity").collect().head
    val mc = r.getAs[Double]("mean_cos")
    assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9)
    val vecs = Tables.table(spark, sf(), "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .filter(v => math.sqrt(v.map(x => x * x).sum) > 0)
    assert(r.getAs[Long]("n_vectors") == vecs.length.toLong)
    val units = vecs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    var s = 0.0
    for (i <- units.indices; j <- units.indices if i != j)
      s += units(i).zip(units(j)).map { case (a, b) => a * b }.sum
    val brute = s / (units.length.toDouble * (units.length - 1))
    // quantization at 1e-6 per component bounds the statistic error well
    // inside 1e-4
    assert(math.abs(mc - brute) < 1e-4, s"mean_cos $mc vs brute $brute")
  }

  test("x182: histogram accounting — docs partition into clusters; sizes >= 1") {
    val rows = run("x182_cluster_sizes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 1L)
      assert(r.getAs[Long]("n_clusters") > 0L)
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
    val docs = Tables.table(spark, sf(), "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs,
      "every doc lands in exactly one cluster (incl. singletons)")
    graft.engine.CacheScope.drain()
  }

  test("x183: shares sum to 1 and members account for every vector; inertia nonneg") {
    val rows = run("x183_cluster_report").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 0L)
      assert(r.getAs[Double]("mean_d2") >= 0.0)
      assert(r.getAs[Double]("share") >= 0.0 && r.getAs[Double]("share") <= 1.0)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val nVecs = Tables.table(spark, sf(), "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nVecs,
      "every vector lands in exactly one cluster")
    graft.engine.CacheScope.drain()
  }

  test("x184: counts match a driver regex recompute; flesch is the closed form") {
    val rows = run("x184_readability").collect()
    assert(rows.nonEmpty)
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val src0 = rows.head.getAs[String]("source")
    val mine = docs.filter(_._1 == src0).map(_._2)
      .map { t =>
        val w = t.trim.split("\\s+").count(_.nonEmpty).toLong
        val se = math.max(1L, "[.!?]+".r.findAllIn(t).length.toLong)
        val sy = "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong
        (w, se, sy)
      }.filter(_._1 > 0)
    val (w, se, sy) = (mine.map(_._1).sum, mine.map(_._2).sum, mine.map(_._3).sum)
    val top = rows.head
    assert(top.getAs[Long]("n_words") == w)
    assert(top.getAs[Long]("n_sentences") == se)
    assert(top.getAs[Long]("n_syllables") == sy)
    val flesch = 206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w)
    assert(math.abs(top.getAs[Double]("flesch") - flesch) < 1e-3)
  }

  test("x185: entropies nonneg; h_cond = h_bigram - h_unigram and bounded by h_unigram-ish recompute") {
    val rows = run("x185_entropy_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h1, h2, hc) = (r.getAs[Double]("h_unigram"),
        r.getAs[Double]("h_bigram"), r.getAs[Double]("h_cond"))
      assert(h1 >= 0.0 && h2 >= 0.0)
      assert(math.abs(hc - (h2 - h1)) < 1e-5)
      // conditioning cannot increase entropy: H(next|cur) <= H(next)
      // (equality iff independence); tolerance covers the quantization
      assert(hc <= h1 + 1e-4, s"h_cond $hc > h_unigram $h1")
      assert(hc >= -1e-9)
    }
    // driver recompute of h_unigram for the first source
    val src0 = rows.head.getAs[String]("source")
    val toks = Tables.table(spark, sf(), "documents")
      .filter(col("source") === src0).select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    val n = toks.length.toDouble
    val h1 = toks.groupBy(identity).values
      .map(g => -(g.length / n) * math.log(g.length / n)).sum
    assert(math.abs(rows.head.getAs[Double]("h_unigram") - h1) < 1e-5)
  }

  test("x186: moments match a driver recompute over the x98 permutation") {
    val r = run("x186_shard_balance").collect().head
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1).trim.split("\\s+")
        .count(_.nonEmpty).toLong).toMap
    val perm = run("x98_epoch_shards").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("shard"))
    val per = perm.groupBy(_._2).values.map(_.map(p => docs(p._1)).sum).toSeq
    assert(r.getAs[Long]("n_shards") == per.length.toLong)
    assert(r.getAs[Long]("min_tokens") == per.min)
    assert(r.getAs[Long]("max_tokens") == per.max)
    val mean = per.sum.toDouble / per.length
    assert(math.abs(r.getAs[Double]("mean_tokens") - mean) < 1e-3)
    val cv = math.sqrt(per.map(t => (t - mean) * (t - mean)).sum / per.length) / mean
    assert(math.abs(r.getAs[Double]("cv") - cv) < 1e-5, s"cv ${r.getAs[Double]("cv")} vs $cv")
  }

  test("x188: KN log-probs negative; accounting closes; one doc matches a driver recompute") {
    val rows = run("x188_kneser_ney").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // P_KN sums to 1 over the full vocab, so every materialized
      // probability is < 1 ⇒ mean log-prob < 0
      assert(r.getAs[Double]("kn_lp") < 0.0)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bigrams(t: String) = {
      val ts = t.trim.split("\\s+").filter(_.nonEmpty)
      ts.zip(ts.drop(1))
    }
    // every >=2-token doc scored exactly once
    assert(rows.length == docs.values.count(bigrams(_).nonEmpty))
    // full-model driver recompute, scored on the first doc
    val all = docs.values.toSeq.flatMap(bigrams)
    val bc = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cw1 = bc.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val r1 = bc.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val l2 = bc.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val bt = bc.size.toDouble
    val first = rows.head
    val bs = bigrams(docs(first.getAs[Long]("doc_id")))
    val lps = bs.map { b =>
      val p = (bc(b) - 0.75) / cw1(b._1) +
        (0.75 * r1(b._1) / cw1(b._1)) * (l2(b._2) / bt)
      math.floor(math.log(p) * 1e9 + 0.5)
    }
    assert(first.getAs[Long]("n_bigrams") == bs.length.toLong)
    val mean = lps.sum / 1e9 / bs.length
    assert(math.abs(first.getAs[Double]("kn_lp") - mean) < 1e-6,
      s"kn_lp ${first.getAs[Double]("kn_lp")} vs $mean")
  }

  test("x189: Mann-Kendall S/var/z and Sen slope match a driver recompute; z tracks sign(S)") {
    val rows = run("x189_mann_kendall").collect()
    assert(rows.nonEmpty)
    // exact micro-tick daily series, recomputed row-by-row like the engine
    val daily = Tables.events(spark, sf())
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate))
      .map { case (k, rs) =>
        k -> rs.map(r => math.floor(r.getAs[Double]("value") * 1e6 + 0.5).toLong).sum }
    assert(rows.length == daily.keys.map(_._1).toSet.size, "one row per event_type")
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.collect { case ((e, d), v) if e == et => (d, v) }
        .toSeq.sortBy(_._1.toEpochDay)
      val pairs = for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield {
        val gap = series(j)._1.toEpochDay - series(i)._1.toEpochDay
        val dv = series(j)._2 - series(i)._2
        (java.lang.Long.signum(dv).toLong,
          math.floor(dv.toDouble * 1e3 / gap + 0.5).toLong)
      }
      val s = pairs.map(_._1).sum
      assert(r.getAs[Long]("s_stat") == s)
      assert(r.getAs[Long]("n_days") == series.length.toLong)
      val n = series.length.toLong
      val tcorr = series.groupBy(_._2).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varNum = n * (n - 1) * (2 * n + 5) - tcorr
      assert(r.getAs[Long]("var_num") == varNum)
      assert(varNum >= 0, "tie correction can never exceed the untied variance")
      // Sen: median of the nano-quantized pairwise slopes (avg of the two
      // middle ranks — identical for odd pair counts)
      val sl = pairs.map(_._2).sorted
      val np = sl.length
      val med = (sl((np - 1) / 2) + sl(np / 2)) / 2.0
      def away6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getAs[Double]("sen_slope") - away6(med / 1e9)) < 1e-9,
        s"$et sen_slope ${r.getAs[Double]("sen_slope")} vs ${away6(med / 1e9)}")
      val z = if (varNum <= 0 || s == 0) 0.0
        else (s.toDouble - java.lang.Long.signum(s)) / math.sqrt(varNum.toDouble / 18.0)
      assert(math.abs(r.getAs[Double]("z") - away6(z)) < 1e-9,
        s"$et z ${r.getAs[Double]("z")} vs ${away6(z)}")
      assert(java.lang.Long.signum(s).toDouble * math.signum(r.getAs[Double]("z")) >= 0.0,
        "z must carry S's sign (or be 0)")
    }
  }

  test("x190: ACF matches a driver recompute; |r_k| <= 1; pair counts close") {
    val rows = run("x190_acf").collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf())
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate))
      .map { case (k, rs) =>
        k -> rs.map(r => math.floor(r.getAs[Double]("value") * 1e6 + 0.5).toLong).sum }
    def away6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    // exactly the (type, lag) combos with >=1 calendar-day pair appear
    val types: Seq[String] = daily.keys.map(_._1).toSet.toSeq
    val want = types.flatMap { et =>
      val series = daily.collect { case ((e, d), v) if e == et => (d, v) }
      (1L to 7L).filter(k =>
        series.keys.exists(d => series.contains(d.plusDays(k)))).map(k => (et, k))
    }
    assert(rows.length == want.length, s"${rows.length} rows vs ${want.length} expected")
    rows.foreach { r =>
      val (et, k) = (r.getAs[String]("event_type"), r.getAs[Long]("lag_days"))
      assert(k >= 1L && k <= 7L)
      val series = daily.collect { case ((e, d), v) if e == et => (d, v) }
      val pairs = series.toSeq.flatMap { case (d, va) =>
        series.get(d.plusDays(k)).map(vb => (va, vb)) }
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, s"$et lag $k pair count")
      // driver recompute in the engines' shared evaluation order
      val n = series.size
      val sv = series.values.map(BigInt(_)).sum
      val svv = series.values.map(v => BigInt(v) * BigInt(v)).sum
      val acf =
        if (BigInt(n) * svv == sv * sv) 0.0
        else {
          val m = sv.toDouble / n
          val cxy = pairs.map { case (a, b) => BigInt(a) * BigInt(b) }.sum.toDouble
          val hx = pairs.map(p => BigInt(p._1)).sum.toDouble
          val tx = pairs.map(p => BigInt(p._2)).sum.toDouble
          (cxy - m * hx - m * tx + pairs.length * m * m) / (svv.toDouble - n * m * m)
        }
      assert(math.abs(r.getAs[Double]("acf") - away6(acf)) < 1e-9,
        s"$et lag $k acf ${r.getAs[Double]("acf")} vs ${away6(acf)}")
      // Cauchy-Schwarz: each pair sum ranges over a subset of the series
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9, s"$et lag $k |acf| > 1")
    }
  }

  test("x191: KM curve matches a driver recompute; S in (0,1] non-increasing; risk sets consistent") {
    val rows = run("x191_kaplan_meier").collect()
    assert(rows.nonEmpty)
    // driver gaps-and-islands streak recompute
    val days = Tables.events(spark, sf())
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay))
    val wend = days.map(_._2).max
    val streaks = days.groupBy(_._1).values.flatMap { ds =>
      val sorted = ds.map(_._2).sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (len, last)
      var start = sorted.head
      var prev = sorted.head
      for (d <- sorted.tail) {
        if (d != prev + 1) { runs += ((prev - start + 1, prev)); start = d }
        prev = d
      }
      runs += ((prev - start + 1, prev))
      runs.toSeq
    }.toSeq
    val byT = streaks.groupBy(_._1).map { case (t, ss) =>
      t -> (ss.size.toLong, ss.count(_._2 < wend).toLong) }
    val deathTs = byT.filter(_._2._2 > 0L).keys.toSeq.sorted
    assert(rows.length == deathTs.length, "one row per death time")
    def away6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    var cum = 0L
    var dead = false
    var prevSurv = 1.0
    rows.sortBy(_.getAs[Long]("t_days")).zip(deathTs).foreach { case (r, t) =>
      assert(r.getAs[Long]("t_days") == t)
      val nRisk = streaks.count(_._1 >= t).toLong
      val d = byT(t)._2
      assert(r.getAs[Long]("n_risk") == nRisk, s"t=$t risk set")
      assert(r.getAs[Long]("d_churned") == d, s"t=$t deaths")
      assert(d >= 1L && d <= nRisk)
      if (d >= nRisk) dead = true
      else cum += math.floor(math.log(1.0 - d.toDouble / nRisk) * 1e9 + 0.5).toLong
      val surv = if (dead) 0.0 else away6(math.exp(cum.toDouble / 1e9))
      assert(math.abs(r.getAs[Double]("survival") - surv) < 1e-9,
        s"t=$t survival ${r.getAs[Double]("survival")} vs $surv")
      assert(surv >= 0.0 && surv <= 1.0)
      assert(surv <= prevSurv + 1e-9, s"t=$t survival increased")
      prevSurv = surv
    }
  }

  /** The x88/x192/x193/x196 scored-and-labeled frame, re-derived through
    * the same public calls (the Fitted memo returns the identical model).
    */
  private def scoredLab(): Seq[(Long, Double, Long)] = {
    val docs = Tables.table(spark, sf(), "documents")
    val model = graft.operators.Fitted.getOrFit(spark,
      graft.operators.Fitted.key(sf(), "qlr",
        "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
      graft.operators.QualityFilter.fit(docs, "doc_id", "text",
        isTarget = col("source") === "src0")
    }
    graft.operators.QualityFilter.logits(docs, "doc_id", "text", model)
      .select(col("id").as("doc_id"),
        graft.functions.EngineMath.roundAway(col("logit"), 6).as("score"))
      .join(docs.select(col("doc_id"),
        (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Long]("pos"))).toSeq
  }

  private def away6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  test("x192: PR-AUC matches a driver trapezoid recompute; in [0,1]; accounting closes") {
    val r = run("x192_pr_auc").collect().head
    val lab = scoredLab()
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == lab.length.toLong)
    assert(r.getAs[Long]("n_pos") == lab.count(_._3 == 1L).toLong)
    val groups = lab.groupBy(_._2).map { case (s, rs) =>
      (s, rs.length.toLong, rs.count(_._3 == 1L).toLong) }
      .toSeq.sortBy(-_._1)
    assert(r.getAs[Long]("n_thresholds") == groups.length.toLong)
    val p = lab.count(_._3 == 1L).toLong
    var (tp, fp) = (0L, 0L)
    var sn = 0L
    groups.foreach { case (_, n, np) =>
      val (tpp, fpp) = (tp, fp)
      tp += np; fp += n - np
      val precP = if (tpp + fpp == 0) 1.0 else tpp.toDouble / (tpp + fpp)
      sn += math.floor(((tp - tpp).toDouble / p) *
        ((tp.toDouble / (tp + fp) + precP) / 2.0) * 1e12 + 0.5).toLong
    }
    val want = away6(sn.toDouble / 1e12)
    assert(math.abs(r.getAs[Double]("pr_auc") - want) < 1e-9,
      s"pr_auc ${r.getAs[Double]("pr_auc")} vs $want")
    assert(r.getAs[Double]("pr_auc") >= 0.0 && r.getAs[Double]("pr_auc") <= 1.0)
  }

  test("x193: gains deciles match a driver ntile recompute; capture monotone to 1") {
    val rows = run("x193_gains").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty)
    val lab = scoredLab().sortBy(t => (-t._2, t._1))
    val n = lab.length
    // SQL ntile: first (n mod 10) buckets get one extra row
    val base = n / 10
    val extra = n % 10
    val sizes = (1 to 10).map(i => base + (if (i <= extra) 1 else 0))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n.toLong)
    val p = lab.count(_._3 == 1L).toLong
    var off = 0
    var cum = 0L
    rows.zip(sizes).zipWithIndex.foreach { case ((r, sz), i) =>
      assert(r.getAs[Long]("decile") == (i + 1).toLong)
      assert(r.getAs[Long]("n_docs") == sz.toLong, s"decile ${i + 1} size")
      val np = lab.slice(off, off + sz).count(_._3 == 1L).toLong
      assert(r.getAs[Long]("n_pos") == np, s"decile ${i + 1} positives")
      off += sz; cum += np
      assert(math.abs(r.getAs[Double]("capture") - away6(cum.toDouble / p)) < 1e-9)
      val lift = (np.toDouble / sz) / (p.toDouble / n)
      assert(math.abs(r.getAs[Double]("lift") - away6(lift)) < 1e-9,
        s"decile ${i + 1} lift")
    }
    assert(math.abs(rows.last.getAs[Double]("capture") - 1.0) < 1e-9,
      "full capture at decile 10")
  }

  test("x194: silhouette matches a driver recompute; |s| <= 1; members account for all vectors") {
    val rows = run("x194_silhouette").collect()
    assert(rows.nonEmpty)
    val cents = graft.operators.Fitted.getOrFit(spark,
      graft.operators.Fitted.key(sf(), "ivf", "k" -> 8, "maxIter" -> 5)) {
      graft.operators.Ivf.fit(
        Tables.table(spark, sf(), "embeddings")
          .withColumn("vec", transform(col("embedding"), x => x.cast("double"))),
        "vec", k = 8, maxIter = 5)
    }.collect().map(r => (r.getAs[Long]("centroid_id"),
      r.getAs[scala.collection.Seq[Double]]("cvec").toSeq)).sortBy(_._1)
    val vecs = Tables.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq))
    def d2m(v: Seq[Double], c: Seq[Double]): Long =
      math.floor(v.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x - y) * (x - y) } * 1e6 + 0.5).toLong
    val per = vecs.map { case (_, v) =>
      val ds = cents.map { case (cid, c) => (d2m(v, c), cid) }.sorted
      val (a2, cid) = ds.head
      val b2 = ds(1)._1
      val sn = if (b2 == 0L) 0L
        else math.floor((math.sqrt(b2.toDouble / 1e6) - math.sqrt(a2.toDouble / 1e6)) /
          math.sqrt(math.max(a2, b2).toDouble / 1e6) * 1e9 + 0.5).toLong
      (cid, sn)
    }
    assert(rows.map(_.getAs[Long]("n_members")).sum == vecs.length.toLong)
    rows.foreach { r =>
      val cid = r.getAs[Long]("centroid_id")
      val mine = per.filter(_._1 == cid)
      assert(r.getAs[Long]("n_members") == mine.length.toLong, s"cluster $cid size")
      val want = away6(mine.map(_._2).sum.toDouble / 1e9 / mine.length)
      assert(math.abs(r.getAs[Double]("mean_silhouette") - want) < 1e-9,
        s"cluster $cid s ${r.getAs[Double]("mean_silhouette")} vs $want")
      assert(math.abs(r.getAs[Double]("mean_silhouette")) <= 1.0 + 1e-9)
    }
    graft.engine.CacheScope.drain()
  }

  test("x195: assortativity matches a driver recompute off exact integer sums") {
    val r = run("x195_assortativity").collect().head
    val po = Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = po.groupBy(_._1).values.flatMap { g =>
      val pks = g.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_nodes") == deg.size.toLong)
    val m = BigInt(2) * edges.size
    var (sx, sxx, sxy) = (BigInt(0), BigInt(0), BigInt(0))
    edges.foreach { case (u, v) =>
      val (du, dv) = (BigInt(deg(u)), BigInt(deg(v)))
      sx += du + dv; sxx += du * du + dv * dv; sxy += 2 * du * dv
    }
    val want =
      if (m * sxx == sx * sx) 0.0
      else away6((m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble)
    assert(math.abs(r.getAs[Double]("assortativity") - want) < 1e-9,
      s"r ${r.getAs[Double]("assortativity")} vs $want")
    assert(math.abs(r.getAs[Double]("assortativity")) <= 1.0 + 1e-9)
  }

  test("x196: conformal qhat/coverage match a driver recompute; split accounting closes") {
    val r = run("x196_conformal").collect().head
    val lab = scoredLab()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nc = lab.map { case (id, score, pos) =>
      val pTrue = if (pos == 1L) 1.0 / (1.0 + math.exp(-score))
        else 1.0 - 1.0 / (1.0 + math.exp(-score))
      val ncn = math.floor((1.0 - pTrue) * 1e9 + 0.5).toLong
      (ncn, md5hex(s"conf:$id").take(4) < "8000")
    }
    val cal = nc.filter(_._2).map(_._1).sorted
    val ev = nc.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_cal") == cal.length.toLong)
    assert(r.getAs[Long]("n_eval") == ev.length.toLong)
    assert(cal.length + ev.length == lab.length)
    val k = math.min(math.ceil((cal.length + 1) * 0.9).toLong, cal.length.toLong)
    val qn = cal((k - 1).toInt)
    assert(math.abs(r.getAs[Double]("qhat") - away6(qn.toDouble / 1e9)) < 1e-9)
    val cov = ev.count(_ <= qn).toDouble / ev.length
    assert(math.abs(r.getAs[Double]("coverage") - away6(cov)) < 1e-9,
      s"coverage ${r.getAs[Double]("coverage")} vs ${away6(cov)}")
    assert(r.getAs[Double]("coverage") >= 0.0 && r.getAs[Double]("coverage") <= 1.0)
    assert(r.getAs[Double]("qhat") >= 0.0 && r.getAs[Double]("qhat") <= 1.0)
  }

  test("x198: log-rank O-E/V/z match a driver recompute; accounting closes with x191") {
    val r = run("x198_logrank").collect().head
    // the same gaps-and-islands streaks as the x191 test, plus start day
    val days = Tables.events(spark, sf())
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(x => (x.getLong(0), x.getAs[java.sql.Date]("day").toLocalDate.toEpochDay))
    val wend = days.map(_._2).max
    // (t, firstDay, died)
    val streaks = days.groupBy(_._1).values.flatMap { ds =>
      val sorted = ds.map(_._2).sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
      var start = sorted.head
      var prev = sorted.head
      for (d <- sorted.tail) {
        if (d != prev + 1) { runs += ((prev - start + 1, start, prev < wend)); start = d }
        prev = d
      }
      runs += ((prev - start + 1, start, prev < wend))
      runs.toSeq
    }.toSeq
    // Monday-anchored weekend flag: 1970-01-05 is epoch day 4
    def weekend(fd: Long): Boolean = ((fd - 4) % 7 + 7) % 7 >= 5
    val a = streaks.filter(s => weekend(s._2))
    val b = streaks.filterNot(s => weekend(s._2))
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    assert(r.getAs[Long]("deaths_a") == a.count(_._3).toLong)
    assert(r.getAs[Long]("deaths_b") == b.count(_._3).toLong)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == streaks.length.toLong,
      "cohorts partition the streak set")
    val deathTs = streaks.filter(_._3).map(_._1).distinct.sorted
    assert(r.getAs[Long]("n_death_times") == deathTs.length.toLong)
    var (se, sv) = (0L, 0L)
    deathTs.foreach { t =>
      val na = a.count(_._1 >= t).toLong
      val nb = b.count(_._1 >= t).toLong
      val da = a.count(s => s._1 == t && s._3).toLong
      val db = b.count(s => s._1 == t && s._3).toLong
      val (d, n) = (da + db, na + nb)
      se += math.floor((da.toDouble - d.toDouble * na / n) * 1e9 + 0.5).toLong
      if (n > 1)
        sv += math.floor(d.toDouble * (na.toDouble / n) * (nb.toDouble / n) *
          ((n - d).toDouble / (n - 1)) * 1e9 + 0.5).toLong
    }
    assert(math.abs(r.getAs[Double]("o_minus_e") - away6(se.toDouble / 1e9)) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance") - away6(sv.toDouble / 1e9)) < 1e-9)
    val z = if (sv <= 0) 0.0 else (se.toDouble / 1e9) / math.sqrt(sv.toDouble / 1e9)
    assert(math.abs(r.getAs[Double]("z") - away6(z)) < 1e-9,
      s"z ${r.getAs[Double]("z")} vs ${away6(z)}")
    assert(r.getAs[Double]("variance") >= 0.0)
  }

  test("x200: sliced W1 matches a driver recompute per slice; w1 >= 0; cohorts account") {
    val rows = run("x200_sliced_w1").collect().sortBy(_.getAs[Long]("slice"))
    assert(rows.length == ExtensionQueries.SlicedW1Dirs.length)
    val vecs = Tables.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq))
    rows.zip(ExtensionQueries.SlicedW1Dirs).foreach { case (r, dv) =>
      // same left fold as the engines' shared projection
      val pts = vecs.map { case (id, v) =>
        val proj = v.zip(dv).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
        (math.floor(proj * 1e6 + 0.5).toLong, id % 2 == 0)
      }
      val na = pts.count(_._2).toLong
      val nb = pts.count(!_._2).toLong
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      // exact integer W1: sum over value gaps of |cumA·nb − cumB·na|·Δv
      val byV = pts.groupBy(_._1).map { case (v, ps) =>
        (v, ps.count(_._2).toLong, ps.count(!_._2).toLong) }.toSeq.sortBy(_._1)
      var (cuma, cumb) = (0L, 0L)
      var st = BigInt(0)
      byV.zip(byV.drop(1)).foreach { case ((v, ca, cb), (nxt, _, _)) =>
        cuma += ca; cumb += cb
        st += (BigInt(cuma) * nb - BigInt(cumb) * na).abs * (nxt - v)
      }
      val want = {
        val x = st.toDouble / (na.toDouble * nb.toDouble * 1e6)
        math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
      }
      assert(math.abs(r.getAs[Double]("w1") - want) < 1e-9,
        s"slice ${r.getAs[Long]("slice")} w1 ${r.getAs[Double]("w1")} vs $want")
      assert(r.getAs[Double]("w1") >= 0.0)
    }
    graft.engine.CacheScope.drain()
  }

  test("x201: per-fold held-out AUC matches a driver rank recompute; folds partition the corpus") {
    val rows = run("x201_cv_auc").collect().sortBy(_.getAs[Long]("fold"))
    assert(rows.map(_.getAs[Long]("fold")).toSeq == (0L until 5L))
    val docs = Tables.table(spark, sf(), "documents")
    assert(rows.map(_.getAs[Long]("n_test")).sum == docs.count(),
      "every doc held out exactly once")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fold(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"cv:$id").take(12), 16) % 5
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      // rebuild the fold's scored frame through the same public calls
      // (the Fitted memo returns the identical per-fold model)
      val model = graft.operators.Fitted.getOrFit(spark,
        graft.operators.Fitted.key(sf(), "qlrcv", "fold" -> f.toInt,
          "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
        fail(s"fold $f model must already be memoized by the query run")
      }
      val scored = graft.operators.QualityFilter
        .logits(docs, "doc_id", "text", model)
        .select(col("id").as("doc_id"),
          graft.functions.EngineMath.roundAway(col("logit"), 6).as("score"))
        .join(docs.select(col("doc_id"),
          (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
        .collect()
        .filter(x => fold(x.getAs[Long]("doc_id")) == f)
        .map(x => (x.getAs[Double]("score"), x.getAs[Long]("pos")))
      assert(r.getAs[Long]("n_test") == scored.length.toLong)
      val p = scored.count(_._2 == 1L).toLong
      assert(r.getAs[Long]("n_pos") == p)
      // tie-averaged Mann-Whitney off midranks — the statistic itself,
      // independent of the engines' grouped-cumulative formulation
      val want =
        if (p == 0L || p == scored.length.toLong) 0.5
        else {
          val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1)
          var below = 0L
          var rankSum2 = 0L // Σ over positives of 2×midrank
          byScore.foreach { case (_, g) =>
            val n = g.length.toLong
            val np = g.count(_._2 == 1L).toLong
            rankSum2 += np * (2 * below + n + 1)
            below += n
          }
          (rankSum2 - p * (p + 1)).toDouble / (2 * p * (scored.length - p)).toDouble
        }
      assert(math.abs(r.getAs[Double]("auc") - want) < 1e-12,
        s"fold $f auc ${r.getAs[Double]("auc")} vs $want")
      assert(r.getAs[Double]("auc") >= 0.0 && r.getAs[Double]("auc") <= 1.0)
    }
  }

  test("x202: group split never straddles; naive straddles match a driver recompute") {
    val r = run("x202_split_leakage").collect().head
    assert(r.getAs[Long]("n_straddle_group") == 0L,
      "a group-keyed split can never separate a near-dup pair")
    assert(r.getAs[Long]("n_straddle_naive") >= 0L &&
      r.getAs[Long]("n_straddle_naive") <= r.getAs[Long]("n_pairs"))
    // driver recompute of the naive straddle count from the same pair
    // source (public op) and the same md5 split arithmetic
    val docs = Tables.table(spark, sf(), "documents")
    val pairs = graft.operators.Dedup
      .minhashPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.getAs[Long]("n_pairs") == pairs.length.toLong)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // mirror of Sampling.assignSplit over 0.8/0.1/0.1 (cum 0.8, 0.9)
    def split(key: Long): String = {
      val t = md5hex(s"spl:$key").take(4)
      if (t < "cccc") "train" else if (t < "e666") "val" else "test"
    }
    val straddle = pairs.count { case (a, b) => split(a) != split(b) }.toLong
    assert(r.getAs[Long]("n_straddle_naive") == straddle,
      s"naive straddles ${r.getAs[Long]("n_straddle_naive")} vs $straddle")
    val want = if (pairs.isEmpty) 0.0
      else straddle.toDouble / pairs.length
    def away6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getAs[Double]("leak_rate_naive") - away6(want)) < 1e-9)
    graft.engine.CacheScope.drain()
  }

  test("x203: selection rates match a driver recompute; threshold is the p75 order statistic") {
    val rows = run("x203_selection_bias").collect()
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = scoredLab().map { case (id, score, _) => (id, score, docs(id)) }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scored.length.toLong)
    // threshold: the ceil(0.75 N)-th smallest score; selected = strictly above
    val sortedScores = scored.map(_._2).sorted
    val k = math.ceil(0.75 * scored.length).toLong
    val thr = sortedScores((k - 1).toInt)
    def away6(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = scored.filter(_._3 == src)
      val sel = mine.count(_._2 > thr).toLong
      assert(r.getAs[Long]("n_docs") == mine.length.toLong, s"$src docs")
      assert(r.getAs[Long]("n_selected") == sel, s"$src selected")
      assert(math.abs(r.getAs[Double]("sel_rate") -
        away6(sel.toDouble / mine.length)) < 1e-9, s"$src rate")
      assert(r.getAs[Double]("sel_rate") >= 0.0 && r.getAs[Double]("sel_rate") <= 1.0)
    }
    // strictly-above semantics: at most N - k docs can be selected overall
    assert(rows.map(_.getAs[Long]("n_selected")).sum <= scored.length - k)
  }

  test("x197: skew stats match a driver recompute for every audited key column") {
    val rows = run("x197_skew_audit").collect()
    assert(rows.length == 5)
    val frames = Map(
      "lineitem.l_orderkey" -> Tables.table(spark, sf(), "lineitem")
        .select(col("l_orderkey").cast("string")),
      "lineitem.l_partkey" -> Tables.table(spark, sf(), "lineitem")
        .select(col("l_partkey").cast("string")),
      "lineitem.l_suppkey" -> Tables.table(spark, sf(), "lineitem")
        .select(col("l_suppkey").cast("string")),
      "orders.o_custkey" -> Tables.table(spark, sf(), "orders")
        .select(col("o_custkey").cast("string")),
      "events.user_id" -> Tables.table(spark, sf(), "events")
        .select(col("user_id").cast("string")))
    rows.foreach { r =>
      val name = r.getAs[String]("key_col")
      val counts = frames(name).collect().map(_.getString(0))
        .groupBy(identity).map(_._2.length.toLong).toSeq
      assert(r.getAs[Long]("n_rows") == counts.sum)
      assert(r.getAs[Long]("n_keys") == counts.length.toLong)
      assert(r.getAs[Long]("max_cnt") == counts.max)
      assert(math.abs(r.getAs[Double]("top_share") -
        away6(counts.max.toDouble / counts.sum)) < 1e-9)
      // p99: smallest per-key count covering >= 99% of keys
      val k = math.ceil(0.99 * counts.length).toLong
      val sorted = counts.sorted
      assert(r.getAs[Long]("p99_cnt") == sorted((k - 1).toInt), s"$name p99")
      assert(r.getAs[Long]("p99_cnt") <= r.getAs[Long]("max_cnt"))
    }
  }

  test("x116: hit counts match a driver-side recompute; gate threshold honored") {
    val rows = run("x116_blocklist_gate").collect()
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val block = ExtensionQueries.BlocklistTerms.toSet
    assert(rows.exists(_.getAs[Long]("n_hits") > 0), "blocklist never fires — dead test")
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).trim.split("\\s+").filter(_.nonEmpty)
      val hits = toks.count(block.contains)
      assert(r.getAs[Long]("n_hits") == hits)
      assert(r.getAs[Boolean]("blocked") == (hits.toDouble > toks.length.toDouble * 0.1))
    }
  }

  test("x206: systematic resample counts telescope to exactly N; " +
      "resampled mass tracks the weight share") {
    val rows = run("x206_systematic_resample").collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val resampled = rows.map(_.getAs[Long]("n_resampled")).sum
    assert(resampled == nDocs,
      s"systematic draws must telescope: $resampled vs $nDocs")
    val shares = rows.map(r => (r.getAs[Double]("resample_share"),
      r.getAs[Double]("weight_share")))
    assert(math.abs(shares.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(shares.map(_._2).sum - 1.0) < 1e-4)
    // systematic sampling error per stratum is < 1 draw either way per
    // boundary; with per-source masses ≫ 1 draw, shares track closely
    shares.foreach { case (rs, ws) =>
      assert(math.abs(rs - ws) < 0.02, s"resample $rs vs weight $ws")
    }
  }

  test("x208: Good-Turing histogram accounting and smoothing identities") {
    val rows = run("x208_good_turing").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val byR = rows.map(r => r.getAs[Long]("r") -> r).toMap
    assert(byR.contains(1L), "a Zipf trigram tail must have hapax mass")
    rows.foreach { r =>
      val nr = r.getAs[Long]("n_r"); val nn = r.getAs[Long]("n_r_next")
      assert(nr > 0)
      // adjacent-count consistency: n_r_next here == n_r of the r+1 row
      byR.get(r.getAs[Long]("r") + 1).foreach { next =>
        assert(next.getAs[Long]("n_r") == nn)
      }
      Option(r.getAs[java.lang.Double]("r_star")).foreach { rs =>
        val expect = (r.getAs[Long]("r") + 1).toDouble * nn / nr
        assert(math.abs(rs - expect) <= 2e-6)
      }
      val p0 = r.getAs[Double]("p0")
      assert(p0 > 0 && p0 < 1)
      assert(math.abs(p0 - byR(1L).getAs[Long]("n_r").toDouble /
        r.getAs[Long]("n_tokens")) <= 2e-6)
    }
  }

  test("x209: semantic-decon bins partition the corpus side exactly") {
    val rows = run("x209_semantic_decon").collect()
    assert(rows.nonEmpty)
    val e = Tables.table(spark, sf(), "embeddings")
    val nCorpus = e.filter(col("vec_id") % 50 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nCorpus,
      "every corpus vector lands in exactly one max-cos bin")
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= -10 && b <= 10, s"cos bin $b outside [-10, 10]")
    }
  }

  test("x207: DeLong CI brackets the AUC and agrees with x88's point estimate") {
    val r = run("x207_delong_auc_ci").collect().head
    val auc = r.getAs[Double]("auc")
    val se = r.getAs[Double]("se")
    assert(se > 0.0, "two-class corpus must have positive SE")
    assert(r.getAs[Double]("ci_lo") <= auc && auc <= r.getAs[Double]("ci_hi"))
    assert(math.abs(r.getAs[Double]("ci_hi") - auc - 1.96 * se) <= 2e-6)
    // same staged weights, same scores → DeLong's point estimate must
    // equal x88's tie-averaged Mann-Whitney AUC to rounding
    val x88 = run("x88_model_auc").collect().head.getAs[Double]("auc")
    assert(math.abs(auc - x88) <= 2e-6, s"DeLong $auc vs x88 $x88")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Mechanism tests for dedup + similarity over the sf0.001 testdata, plus
  * hand-planted duplicates. The oracle-scale equivalents run through
  * Verify/check_oracle (x05-x11).
  */
class DedupSimilaritySpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sf(), "documents")
  private lazy val embs = Tables.table(spark, sf(), "embeddings")
    .withColumn("vec", transform(col("embedding"), x => x.cast("double")))

  test("x262 recall certification ≡ hand brute-force intersection; production floor holds") {
    val rows = SparkEntry.queries("x262_ann_recall_cert")(spark, sf())
      .collect().sortBy(_.getAs[Long]("query_id"))
    assert(rows.length == 5)
    // the brute half re-derived on the driver: plain double loops, no
    // Spark (the LSH half is mechanism-locked by the tests below; here
    // we prove the CERTIFICATION arithmetic over the two sides)
    val vecs = embs.select("vec_id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val lsh = Similarity.lshTopK(embs, "vec_id", "vec",
      embs.filter(col("vec_id") < 5), "vec_id", "vec", k = 10,
      numPlanes = 6, numTables = 16,
      probeRadius = Similarity.adaptiveProbeRadius(vecs.size.toLong))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val brute = vecs.keysIterator.filter(_ != qid).toSeq
        .map(id => (id, cos(vecs(id), vecs(qid))))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      assert(r.getAs[Long]("n_true") == 10L)
      val nHit = brute.count(id => lsh.contains((qid, id)))
      assert(r.getAs[Long]("n_hit") == nHit.toLong,
        s"query $qid: engine n_hit ${r.getAs[Long]("n_hit")} vs hand $nHit")
      assert(r.getAs[Double]("recall") ==
        BigDecimal(nHit / 10.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // the bound the oracle enforces by row-dropping, asserted directly
      assert(nHit * 10 >= 80,
        s"query $qid below the 0.8 certification floor on the gated corpus")
    }
  }

  test("exactDeduplicate keeps exactly one row per content, smallest id") {
    import spark.implicits._
    val withDups = docs.select("doc_id", "text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val deduped = Dedup.exactDeduplicate(withDups, "doc_id", "text")
    assert(deduped.count() == docs.count())
    assert(deduped.filter($"doc_id" >= 100000).count() == 0) // keepers are the originals
  }

  test("line dedup: boilerplate drops from EVERY doc, order preserved, emptied docs keep their row") {
    import spark.implicits._
    // lineTokens=3: "x x x" is a full line shared by three docs → boilerplate
    val docs = Seq(
      (1L, "x x x a b c"),
      (2L, "x x x d e f"),
      (3L, "x x x"),          // nothing but boilerplate
      (4L, "p q r x x x s t u")). // boilerplate mid-document
      toDF("doc_id", "text")
    val out = Dedup.lineDeduplicate(docs, "doc_id", "text",
        lineTokens = 3, maxDocFreq = 1)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((2L, 1L, "a b c")))
    assert(out(2L) == ((2L, 1L, "d e f")))
    // the all-boilerplate doc is RECORDED as emptied, not lost
    assert(out(3L) == ((1L, 0L, "")))
    // middle line removed, surrounding order intact
    assert(out(4L) == ((3L, 2L, "p q r s t u")))
    // a higher tolerance keeps the shared line everywhere ("x x x" sits
    // in all 4 docs)
    val lax = Dedup.lineDeduplicate(docs, "doc_id", "text",
        lineTokens = 3, maxDocFreq = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_kept")).toMap
    assert(lax == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 3L))
  }

  test("prefix-filtered jaccard (ppjoin) ≡ the all-pairs truth, with real pruning") {
    // losslessness: identical pairs AND identical scores at t=0.8
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
    val pp = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", k = 3, threshold = 0.8)
    assert(pp.exceptAll(truth).isEmpty && truth.exceptAll(pp).isEmpty,
      "prefix filter changed the result set")
    // pruning: prefix tables keep only |s| - ceil(0.8|s|) + 1 shingles, so
    // prefix-shingle rows must be a small fraction of all shingle rows
    val all = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s"))
      .count()
    val prefixLen = docs.select(
      sum(size(graft.functions.TextFunctions.shingles(col("text"), 3)) -
        ceil(lit(0.8) * size(graft.functions.TextFunctions.shingles(col("text"), 3))) + 1))
      .head().getLong(0)
    assert(prefixLen * 3 < all,
      s"prefix rows $prefixLen not a small fraction of $all shingle rows")
  }

  test("minhash LSH candidates cover all true high-jaccard pairs") {
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.9)
      .select("id_a", "id_b")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", k = 3,
      bands = 4, rowsPerBand = 3)
    // every true near-dup pair must be an LSH candidate (recall = 1 here;
    // P(miss) at j≥0.9 with b=4,r=3 is (1-0.9³)⁴ ≈ 5e-3 per pair — the
    // planted pairs sit at j≈0.99 where it is ~1e-5)
    assert(truth.join(cands, Seq("id_a", "id_b"), "left_anti").count() == 0)
  }

  test("simhash: near-dup pairs are close in Hamming space, random pairs far") {
    import spark.implicits._
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.9)
    val withDist = truth
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
      .select(Dedup.hammingDistance($"sh_a", $"sh_b").as("d"))
    val dupDists = withDist.collect().map(_.getInt(0)) // bit_count returns int
    assert(dupDists.nonEmpty && dupDists.forall(_ <= 12),
      s"near-dup hamming distances too large: ${dupDists.mkString(",")}")
    // random-pair baseline: consecutive non-dup ids
    val rnd = sh.as("a").join(sh.as("b"), col("a.doc_id") + 7 === col("b.doc_id"))
      .select(Dedup.hammingDistance(col("a.sh"), col("b.sh")).as("d"))
      .agg(avg($"d")).collect().head.getDouble(0)
    assert(rnd > 15, s"random-pair mean hamming distance suspiciously low: $rnd")
  }

  test("winnowing: shared substring ≥ w+k−1 ⇒ shared fingerprint; disjoint docs share none") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog near the river bank"
    val df = Seq(
      (1L, s"AAAA bbbb cccc $common dddd eeee"),
      (2L, s"zzzz yyyy $common xxxx wwww vvvv uuuu"),
      (3L, "completely different content with no overlap whatsoever here")
    ).toDF("id", "text")
    val pairs = Dedup.winnowOverlapPairs(df, "id", "text", k = 5, w = 4,
      minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 1 and 2 share a 63-char substring >> w+k-1 = 8 → many shared fps
    val p12 = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.isDefined && p12.get._3 >= 5, s"pairs: ${pairs.mkString(",")}")
    // 3 overlaps nobody
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs.mkString(","))
    // determinism + shape: re-run yields identical fingerprints
    val fp1 = Dedup.winnowFingerprints(df, "id", "text").collect().toSet
    val fp2 = Dedup.winnowFingerprints(df, "id", "text").collect().toSet
    assert(fp1 == fp2 && fp1.nonEmpty)
    // short document (< w grams): fingerprints as its single overall min
    val short = Seq((9L, "abcdef")).toDF("id", "text") // 2 grams at k=5
    assert(Dedup.winnowFingerprints(short, "id", "text").count() == 1)
  }

  test("containment finds sub-document duplication that Jaccard misses") {
    import spark.implicits._
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 200).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, para),                 // the paragraph alone
      (2L, s"$filler $para"),     // pasted into a much larger doc
      (3L, "entirely different text with no shared trigrams at all")
    ).toDF("id", "text")
    val cont = Dedup.containmentPairs(df, "id", "text", k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    // every trigram of doc 1 appears in doc 2 → c_ab = 1.0
    val p12 = cont.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.isDefined && p12.get._3 == 1.0, cont.mkString(","))
    assert(p12.get._4 < 0.1) // asymmetric: doc 2 is mostly NOT doc 1
    assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
    // and Jaccard at the same threshold indeed misses the pair
    assert(Dedup.jaccardPairs(df, "id", "text", k = 3, threshold = 0.9)
      .filter($"id_a" === 1L && $"id_b" === 2L).count() == 0)
  }

  test("components: chains close transitively, keepers are minima") {
    import spark.implicits._
    // a-b, b-c chain + isolated pair (10,11): {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs, "id_a", "id_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the distributed label-propagation path (forced) must agree with the
    // driver union-find path (the small-graph default)
    val compDist = Dedup.components(pairs, "id_a", "id_b", collectThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compDist == comp)
    val groups = Dedup.pairGroups(pairs, "id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 1L, 3L), (10L, 10L, 2L)))
    // dedup view: keepers + untouched singletons survive
    val df = (1L to 12L).toDF("id")
    val kept = Dedup.deduplicateByPairs(df, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("components: a LONG CHAIN converges distributed in O(log n) rounds") {
    import spark.implicits._
    // a 2000-node chain has diameter 1999: min-label propagation would need
    // 1999 rounds; the large-star/small-star alternation must close it
    // within the default maxIter (~log2 n alternations). collectThreshold=0
    // forces the distributed path.
    val n = 2000L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(chain, "id_a", "id_b", collectThreshold = 0L)
    assert(comp.count() == n)
    assert(comp.filter(col("component") =!= 0L).count() == 0,
      "chain did not collapse to the minimum id")
  }

  test("keep-best dedup keeps the highest score per group, id on ties, singletons untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // group {1,2,3}: 2 wins on score
      (10L, 5L), (11L, 5L),            // group {10,11}: tie -> smaller id
      (42L, 1L))                       // singleton: passes through
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.deduplicateByPairsKeepBest(docs, "id", pairs, col("score"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 42L))
    // min-id convention (deduplicateByPairs) differs exactly where the
    // score ranking does
    val minId = Dedup.deduplicateByPairs(docs, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 10L, 42L))
  }

  test("incremental dedup: batch-vs-index pairs ≡ whole-corpus minhash pairs restricted to cross pairs") {
    import org.apache.spark.sql.functions.col
    // same seed/banding on both paths → the cross-corpus operator must
    // find exactly the even↔odd subset of the whole-corpus pair set
    val corpus = Dedup.minhashIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", k = 3)
    val batch = Dedup.minhashIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", k = 3)
    val cross = Dedup.minhashPairsBetween(batch, corpus, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = Dedup.minhashPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 != b % 2 }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) } // (new, corpus)
      .toSet
    assert(cross == whole, s"cross-corpus pairs $cross != restricted whole-corpus $whole")
    assert(cross.nonEmpty, "fixture plants no cross-parity near-dups?")
    // mismatched index parameters are a loud error, not silent bad recall
    intercept[IllegalArgumentException](Dedup.minhashPairsBetween(
      batch, Dedup.minhashIndex(docs, "doc_id", "text", k = 3, bands = 2, rowsPerBand = 6),
      threshold = 0.8))
    graft.engine.CacheScope.drain()
  }

  test("banded composition: minhashPairs → keep-best/group-split ≡ the jaccardPairs composition") {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // the production (banded) pair source must drive the SAME downstream
    // keeper selection and leakage-safe split as the quadratic oracle
    // source — x43/x44 gate the logic, this gates the composition
    val base = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val banded = Dedup.minhashPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8)
    def keptIds(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.deduplicateByPairsKeepBest(base, "doc_id", pairs, col("n_tokens"))
        .collect().map(_.getLong(0)).toSet
    assert(keptIds(banded) == keptIds(exact))
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Dedup.groupAwareSplit(base.select(col("doc_id")), "doc_id",
      banded, weights)
    // no-straddle: both endpoints of every banded near-dup pair land in
    // the same split
    val straddlers = banded.select(col("id_a"), col("id_b"))
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sp_a")), Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sp_b")), Seq("id_b"))
      .filter(col("sp_a") =!= col("sp_b"))
    assert(straddlers.count() == 0)
    graft.engine.CacheScope.drain()
  }

  test("components: RELIABLE checkpointing runs the star-alternation loop to the same fixpoint") {
    import spark.implicits._
    // executor-churn-safe variant: rounds persist to the checkpoint
    // filesystem instead of executor-local blocks. Same contract —
    // identical components — plus evidence the loop actually wrote
    // reliable checkpoints (RDD checkpoint files under the dir).
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt-").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 11L))
      .toDF("id_a", "id_b")
    val comp = Dedup.components(pairs, "id_a", "id_b",
        collectThreshold = 0L, checkpointDir = Some(ckpt))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString.startsWith("part-")).count()
    assert(wrote > 0, s"no reliable checkpoint files under $ckpt")
  }

  test("two-chunk simhash banding shrinks candidate buckets vs single-chunk") {
    // at maxDist=10 single chunks are 5-6 bits (<= 64 values) — candidate
    // buckets grow ~n²/2^5.45; pairing on chunk PAIRS doubles the key
    // entropy. Verify the candidate-pair count shrinks and stays a
    // superset of the true pairs (completeness is the d=10 case of the
    // banding test above).
    val sh = graft.engine.CacheScope.persistTracked(
      Dedup.simhashTable(docs, "doc_id", "text"))
    def candidates(spec: Seq[(Int, Int, Long)], pairKeys: Boolean): Long = {
      val keys =
        if (!pairKeys) spec.map { case (c, off, mask) =>
          struct(lit(c).as("chunk"),
            shiftright(col("sh"), off).bitwiseAND(mask).as("v1"), lit(0L).as("v2")) }
        else for { (c1, o1, m1) <- spec; (c2, o2, m2) <- spec if c2 > c1 }
          yield struct(lit(c1 * 64 + c2).as("chunk"),
            shiftright(col("sh"), o1).bitwiseAND(m1).as("v1"),
            shiftright(col("sh"), o2).bitwiseAND(m2).as("v2"))
      val ck = sh.select(col("id"), explode(array(keys: _*)).as("ck"))
        .select(col("id"), col("ck.chunk"), col("ck.v1"), col("ck.v2"))
      ck.as("a").join(ck.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.v1") === col("b.v1") &&
            col("a.v2") === col("b.v2") && col("a.id") < col("b.id"))
        .select("a.id", "b.id").distinct().count()
    }
    val single = candidates(Dedup.simhashChunkSpec(10), pairKeys = false)
    val double = candidates(
      // the two-chunk layout the engine uses at maxDist=10 (12 chunks)
      Dedup.simhashChunkSpec(10 + 1), pairKeys = true)
    assert(double < single,
      s"two-chunk candidates ($double) not smaller than single-chunk ($single)")
    graft.engine.CacheScope.drain()
  }

  test("simhashPairs is COMPLETE at its maxDist (pigeonhole banding)") {
    import spark.implicits._
    // ground truth: brute-force every pair's Hamming distance
    val sh = Dedup.simhashTable(docs, "doc_id", "text")
    def truthAt(d: Int) = sh.as("a").join(sh.as("b"),
        col("a.id") < col("b.id") &&
          Dedup.hammingDistance(col("a.sh"), col("b.sh")) <= d)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // maxDist=10 was the silent-recall-loss case: 4 fixed chunks only
    // guarantee d<=3, so distance-4..10 pairs spanning all chunks vanished
    for (d <- Seq(3, 10)) {
      val found = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = d)
        .select("id_a", "id_b")
      val missed = truthAt(d).join(found, Seq("id_a", "id_b"), "left_anti").count()
      assert(missed == 0, s"maxDist=$d: banding missed $missed true pairs")
      // and no false positives: every returned pair is within d
      val extra = found.join(truthAt(d), Seq("id_a", "id_b"), "left_anti").count()
      assert(extra == 0, s"maxDist=$d: $extra pairs beyond the bound")
    }
  }

  test("simhashTable (packed-counter aggregate) == simhash Column expr") {
    import spark.implicits._
    val viaExpr = docs.select($"doc_id".as("id"), Dedup.simhash($"text").as("e"))
    val viaTable = Dedup.simhashTable(docs, "doc_id", "text")
    // the fast whole-table path must be bit-identical to the per-row
    // expression (simhashPairs' hamming distances depend on it)
    assert(viaTable.join(viaExpr, Seq("id"))
      .filter($"sh" =!= $"e").count() == 0)
  }

  test("embedding near-dup pairs are symmetric-safe and thresholded") {
    val pairs = Dedup.embeddingPairs(embs, "vec_id", "vec", threshold = 0.4)
      .collect()
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.4))
  }

  test("IVF ANN: ranks well-formed; recall beats the hyperplane LSH sieve") {
    import graft.operators.Ivf
    val queries = embs.filter(col("vec_id") < 5)
    val centroids = Ivf.fit(embs, "vec", k = 8)
    assert(centroids.count() == 8)
    val ivf = Ivf.topK(embs, "vec_id", "vec", queries, "vec_id", "vec",
      k = 10, centroids, nProbe = 3).collect()
    // mechanism: per query, ranks 1..n, cosines non-increasing
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
    }
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "vec",
      queries, "vec_id", "vec", k = 10).collect()
    val bruteSet = brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    val ivfSet = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    val recall = (bruteSet & ivfSet).size.toDouble / bruteSet.size
    info(f"IVF ANN recall@10 vs brute force (nProbe=3/8): $recall%.2f")
    // probing 3/8 buckets scans ~38% of the corpus; true neighbors
    // concentrate in the probed buckets, so recall must beat that fraction
    assert(recall >= 0.4)
  }

  test("PQ: codes well-formed; ADC == exact distance to the reconstruction; recall beats chance") {
    import org.apache.spark.sql.functions.{col, lit}
    val m = 4; val ksub = 16; val dim = 64
    val cb = graft.operators.Pq.fit(embs, "vec", dim, m, ksub, maxIter = 5)
    assert(cb.count() == m.toLong * ksub)
    val codes = graft.operators.Pq.encode(embs, "vec_id", "vec", cb, dim, m)
    codes.cache().count()
    // m codes per item, every code a valid centroid id
    val byItem = codes.groupBy(col("id")).count().collect()
    assert(byItem.forall(_.getLong(1) == m))
    assert(codes.filter(col("code") < 0 || col("code") >= ksub).count() == 0)
    val q = embs.filter(col("vec_id") < 5)
    val top = graft.operators.Pq.topK(codes, cb, q, "vec_id", "vec",
      k = 10, dim, m).collect()
    // ADC identity: the approximate distance IS the exact squared distance
    // between the query and the item's reconstruction (concatenated
    // nearest centroids) — check one (query, item) pair end-to-end
    val cbL = cb.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val codeL = codes.collect().groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.sortBy(_.getInt(1)).map(r => (r.getInt(1), r.getLong(2))) }
    val qv = q.filter(col("vec_id") === 0).select(col("vec"))
      .collect().head.getSeq[Double](0)
    val probe = top.filter(_.getLong(0) == 0L).minBy(_.getLong(1))
    val recon = codeL(probe.getLong(2)).flatMap { case (sub, code) => cbL((sub, code)) }
    val exact = qv.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(exact - probe.getDouble(3)) < 1e-9,
      s"ADC ${probe.getDouble(3)} != reconstruction distance $exact")
    // recall vs brute-force euclidean top-10 well above chance (10/500)
    val brute = embs.as("a").crossJoin(q.select(col("vec_id").as("qid"),
        col("vec").as("qv")))
      .select(col("qid"), col("vec_id").as("item_id"),
        graft.operators.Dedup.cosine(col("vec"), col("qv")).as("cos"))
      .collect().groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.sortBy(-_.getDouble(2)).take(10).map(_.getLong(1)).toSet }
    val recall = top.groupBy(_.getLong(0)).map { case (qid, rs) =>
      rs.map(_.getLong(2)).toSet.intersect(brute(qid)).size / 10.0 }
    val mean = recall.sum / recall.size
    assert(mean > 0.2, s"PQ mean recall $mean not above chance")
    codes.unpersist()
    graft.engine.CacheScope.drain()
  }

  test("IVF × PQ composition: ADC over only the probed buckets, candidate set actually shrinks") {
    import org.apache.spark.sql.functions.col
    // the full billion-vector architecture: coarse IVF partitions prune
    // the candidate set, PQ codes score what survives — memory-bounded
    // AND scan-bounded. Composition here: assign items to IVF buckets,
    // keep only items in each query's probed buckets, ADC-score those.
    val m = 4; val ksub = 16; val dim = 64
    val centroids = graft.operators.Ivf.fit(embs, "vec", k = 8, maxIter = 5)
    val assign = graft.operators.Ivf.assign(embs, "vec_id", "vec", centroids)
    val cb = graft.operators.Pq.fit(embs, "vec", dim, m, ksub, maxIter = 5)
    val codes = graft.operators.Pq.encode(embs, "vec_id", "vec", cb, dim, m)
    val q = embs.filter(col("vec_id") < 5)
    val probes = graft.operators.Ivf.assignProbes(q, "vec_id", "vec",
      centroids, nProbe = 3).select(col("query_id"), col("centroid_id"))
    // candidate items per query = items in probed buckets (at scale this
    // is partition pruning over the centroid_id layout)
    val cand = assign.join(probes, Seq("centroid_id"))
      .select(col("query_id"), col("id"))
    val total = embs.count() * q.count()
    val candN = cand.count()
    assert(candN < total, s"probing pruned nothing: $candN of $total")
    val composed = graft.operators.Pq.topKWithin(cand, codes, cb, q,
      "vec_id", "vec", k = 10, dim, m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // equivalence: composed == full-PQ ranking restricted to each query's
    // candidate set (probing changes WHICH items compete, not their score)
    val candSets = cand.collect().groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.map(_.getLong(1)).toSet }
    val fullPairs = graft.operators.Pq.topK(codes, cb, q, "vec_id", "vec",
      k = embs.count().toInt, dim, m)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expected = fullPairs.toSeq.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
      rs.filter(r => candSets(qid).contains(r._2))
        .sortBy(r => (r._3, r._2)).take(10).zipWithIndex
        .map { case ((_, item, ad2), i) => (qid, (i + 1).toLong, item, ad2) }
    }.toSet
    assert(composed.toSet == expected,
      s"composed IVF x PQ != full PQ restricted to probed candidates")
    graft.engine.CacheScope.drain()
  }

  test("int8 quantization: values bounded, high cosine fidelity, zero-safe") {
    import spark.implicits._
    val v = embs.select(col("vec_id"), col("vec"),
      Similarity.quantizeScale(col("vec")).as("scale"))
    val q = v.select(col("vec_id"), col("scale"),
      Similarity.quantize(col("vec"), col("scale")).as("q"),
      Similarity.dequantize(
        Similarity.quantize(col("vec"), col("scale")), col("scale")).as("dq"),
      col("vec"))
    // every quantized component within int8 range
    assert(q.select(explode(col("q"))).filter(abs(col("col")) > 127).count() == 0)
    // fidelity: dequantized vectors stay within 1% cosine of the originals
    val minCos = q.select((Dedup.cosine(col("vec"), col("dq"))).as("c"))
      .agg(min(col("c"))).collect().head.getDouble(0)
    assert(minCos > 0.99, s"min cosine fidelity $minCos")
    // zero vector → zeros, no div-by-zero
    val z = Seq((Seq(0.0, 0.0), 0.0)).toDF("vec", "scale")
      .select(Similarity.quantize(col("vec"), col("scale"))).collect().head.getSeq[Byte](0)
    assert(z == Seq(0, 0))
  }

  test("LSH ANN: results are correctly ranked true cosines; recall reported") {
    val queries = embs.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "vec",
      queries, "vec_id", "vec", k = 10).collect()
    val lsh = Similarity.lshTopK(embs, "vec_id", "vec",
      queries, "vec_id", "vec", k = 10).collect()
    // mechanism: per query, LSH ranks are 1..n without gaps and cosines
    // are non-increasing
    val byQ = lsh.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val cosines = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // recall@10 against brute force: 8 tables × 8 planes with 1-bit
    // multi-probe on random 64-d data (miss only if missed in EVERY table)
    val bruteSet = brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    val lshSet = lsh.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("item_id"))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    info(f"LSH ANN recall@10 vs brute force: $recall%.2f")
    assert(recall >= 0.25)
  }

  test("simhash banding maxBucket cap: boilerplate cliques dropped, distinct near-dups survive") {
    import spark.implicits._
    // 100 byte-identical docs (a boilerplate clique: every bucket they
    // occupy holds ≥100 signatures) + one true near-dup pair of unique
    // content (its buckets hold 2)
    val boiler = (0 until 100).map(i =>
      (i.toLong, "the same boilerplate footer text repeated verbatim across pages"))
    val pair = Seq(
      (1000L, "entirely unique alpha bravo charlie delta echo foxtrot golf"),
      (1001L, "entirely unique alpha bravo charlie delta echo foxtrot hotel"))
    val df = (boiler ++ pair).toDF("doc_id", "text")
    val sh = graft.engine.CacheScope.persistTracked(
      Dedup.simhashTable(df, "doc_id", "text"))
    val uncapped = Dedup.simhashPairsOf(sh, maxDist = 10).collect()
    val capped = Dedup.simhashPairsOf(sh, maxDist = 10, maxBucket = 10)
      .collect()
    def hasPair(rows: Array[org.apache.spark.sql.Row]) = rows.exists(r =>
      r.getLong(0) == 1000L && r.getLong(1) == 1001L)
    // uncapped finds the clique's ~100·99/2 pairs AND the near-dup pair
    assert(uncapped.length >= 100 * 99 / 2)
    assert(hasPair(uncapped))
    // capped: every clique bucket exceeds 10 → clique pairs gone; the
    // near-dup pair's buckets hold 2 ≤ 10 → it survives
    assert(hasPair(capped))
    assert(capped.count(r => r.getLong(0) < 100L) == 0,
      "boilerplate-clique pairs leaked past the bucket cap")
    graft.engine.CacheScope.drain()
  }

  test("substring dedup (x74): shared 8-gram spans cut from BOTH docs, islands merge, reassembly exact") {
    import spark.implicits._
    // docs 1/2 share a 9-token run (two overlapping duplicated 8-grams →
    // ONE merged island of 9 tokens); doc 3 is clean
    val shared = (1 to 9).map(i => s"dup$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four"),
      (3L, "no duplicated content here at all just unique words")
    ).toDF("doc_id", "text")
    val out = graft.operators.SubstringDedup.dedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: 13 tokens, the 9 shared removed as one island
    assert(out(1L)._1 == 13 && out(1L)._2 == 1 && out(1L)._3 == 9)
    assert(out(2L)._1 == 13 && out(2L)._2 == 1 && out(2L)._3 == 9)
    assert(out(3L)._2 == 0 && out(3L)._3 == 0)
    // reassembly: md5 of the survivors in original order
    def fp(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out(1L)._4 == fp("alpha beta gamma delta"))
    assert(out(2L)._4 == fp("one two three four"))
    graft.engine.CacheScope.drain()
  }

  test("property: substring dedup invariants on random corpora (seeded)") {
    import org.scalacheck.Gen
    import spark.implicits._
    // small vocab forces real cross-doc 8-gram collisions
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.choose(8, 40)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
    val corpusGen = Gen.choose(6, 12).flatMap(k => Gen.listOfN(k, docGen))
    val cases = Iterator.iterate(org.scalacheck.rng.Seed(7L))(_.next)
      .map(s => corpusGen.apply(Gen.Parameters.default, s))
      .collect { case Some(c) => c }.take(5).toSeq
    for ((texts, ci) <- cases.zipWithIndex) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.SubstringDedup.dedup(df, "doc_id", "text")
        .collect()
      assert(out.length == texts.size, s"case $ci lost documents")
      // invariants per doc: removal bounded by length; spans imply
      // removal ≥ k and vice versa; zero spans ⇒ fingerprint of the
      // intact token stream
      def fp(s: String) = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      out.foreach { r =>
        val (n, spans, removed, cfp) = (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))
        assert(removed <= n, s"case $ci: removed $removed > n $n")
        assert((spans == 0) == (removed == 0), s"case $ci: spans/removed disagree")
        if (spans > 0) assert(removed >= 8, s"case $ci: span shorter than a gram")
        if (spans == 0) {
          val toks = texts(r.getLong(0).toInt).trim.split("\\s+")
            .filter(_.nonEmpty).mkString(" ")
          assert(cfp == fp(toks), s"case $ci: untouched doc fingerprint drifted")
        }
      }
      // symmetry: a duplicated gram is duplicated in ≥2 docs, so the
      // total removal count can never be confined to a single doc
      val affected = out.count(_.getLong(2) > 0)
      assert(affected != 1, s"case $ci: exactly one doc affected — dup not symmetric")
      graft.engine.CacheScope.drain()
    }
  }

  test("contaminationScanBloom ≡ contaminationScan (no false negatives; exact join removes bloom FPs)") {
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.contaminationScan(corpus, bench, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    val bloom = Dedup.contaminationScanBloom(corpus, bench, "doc_id", "text",
      k = 5, fpp = 0.05) // coarse filter on purpose: FPs must still vanish
      .orderBy("doc_id").collect()
    assert(exact.nonEmpty, "fixture produced no contaminated docs")
    assert(bloom.toSeq == exact.toSeq)
  }

  test("semanticPairs = embeddingPairs restricted to shared clusters; skew cap drops loudly") {
    import graft.operators.{Ivf, SemDedup}
    val centroids = Ivf.fit(embs, "vec", k = 4, maxIter = 5)
    val assign = SemDedup.assign(embs, "vec_id", "vec", centroids)
    val semantic = SemDedup.semanticPairs(embs, "vec_id", "vec", assign,
      threshold = 0.4)
    // ground truth: ALL cosine pairs ≥ τ, then keep those sharing a cluster
    val allPairs = Dedup.embeddingPairs(embs, "vec_id", "vec", threshold = 0.4)
    val a = assign.select(col("id").as("id_a"), col("centroid_id").as("ca"))
    val b = assign.select(col("id").as("id_b"), col("centroid_id").as("cb"))
    val expected = allPairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .filter(col("ca") === col("cb"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = semantic.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no within-cluster near-dups")
    // cluster-size cap: capping below the largest cluster must drop its
    // pairs and report the cluster
    val sizes = assign.groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.max - 1
    val over = SemDedup.oversizedClusters(assign, cap).collect()
      .map(_.getLong(0)).toSet
    assert(over == sizes.filter(_._2 > cap).keySet)
    val capped = SemDedup.semanticPairs(embs, "vec_id", "vec", assign,
      threshold = 0.4, maxClusterSize = Some(cap))
      .select("centroid_id").distinct().collect().map(_.getLong(0)).toSet
    assert(capped.intersect(over).isEmpty)
  }

  test("scaledK holds expected cluster size constant; cappedAssignments drops exactly the oversized clusters") {
    import graft.operators.{Ivf, SemDedup}
    // K ∝ N at target 64: the sf0.01 gate (n=500) resolves to the minK=8
    // floor (same fit the ANN queries memoize); 10× data → ~10× K, so
    // within-cluster pair work stays N·target/2 — linear
    assert(SemDedup.scaledK(500) == 8)
    assert(SemDedup.scaledK(2000) == 32)
    assert(SemDedup.scaledK(20000) == 313)
    assert(SemDedup.scaledK(100L * 1000 * 1000 * 1000) == 65536)
    val centroids = Ivf.fit(embs, "vec", k = 4, maxIter = 5)
    val assign = SemDedup.assign(embs, "vec_id", "vec", centroids)
    val sizes = assign.groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.max - 1
    val keepClusters = sizes.filter(_._2 <= cap).keySet
    val got = SemDedup.cappedAssignments(assign, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = assign.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => keepClusters(p._2)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < assign.count())
  }
}

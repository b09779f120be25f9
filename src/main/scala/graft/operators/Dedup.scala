package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines (SURVEY.md §2.C) —
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design (the point of every choice here):
  *  - exact dedup is one hash-groupBy — a single shuffle on a 16-byte key.
  *  - the all-pairs Jaccard join exists as the small-data oracle; the scale
  *    path is MinHash banding, whose cost is O(docs × K hashes) + a shuffle
  *    on band keys, and whose candidate set is tiny compared to the cross
  *    product (pairs agreeing on ≥1 of B bands).
  *  - ubiquitous shingles are the skew hazard in the shingle self-join: a
  *    shingle in f docs contributes f² candidate rows. `maxDocFreq` caps it
  *    (drop boilerplate shingles), the standard trick before salting.
  *  - the exact-dedup fingerprint is md5 so it is engine-portable (same
  *    value in Spark, DuckDB, anything) — deterministic oracles. The
  *    MinHash/SimHash internals use codegen'd `xxhash64` longs instead:
  *    those hashes only steer candidate generation (verification is exact),
  *    so the cheapest good hash family wins — no hex-string allocation, no
  *    interpreted md5 per shingle.
  */
object Dedup {

  /** Ensure at least the session's shuffle parallelism before compute-heavy
    * per-row expressions. A small parquet input arrives as 1-2 partitions,
    * which would serialize the expensive text expressions on 1-2 cores; on
    * a real cluster the input already has ≥ target partitions and this is
    * a no-op (no shuffle inserted).
    */
  private[operators] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  // ---- exact ------------------------------------------------------------

  /** Exact duplicate groups by normalised-text fingerprint: one row per
    * distinct content, keeping the smallest id (`keep_id`), with the
    * duplicate count. Single hash-aggregate; scales to any size.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated view: rows whose id is the keeper of its group. */
  def exactDeduplicate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("fingerprint")).orderBy(col(idCol))))
      .filter(col("__rn") === 1).drop("__rn", "fingerprint")

  // ---- n-gram Jaccard (exact all-pairs — the oracle path) ---------------

  /** (id, shingle) long table; distinct per doc. `maxDocFreq` drops
    * shingles occurring in more than that many documents (skew guard — at
    * 100 TB a boilerplate shingle in 10⁶ docs would otherwise emit 10¹²
    * join rows).
    */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, k: Int,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val base = widen(df)
      .select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), k)).as("shingle"))
    maxDocFreq match {
      case None => base
      case Some(cap) =>
        val freq = base.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("shingle")
        base.join(freq, Seq("shingle")) // inner: keeps only rare-enough shingles
    }
  }

  /** (id_a, id_b, common, sz_a, sz_b) for every pair sharing ≥ 1 shingle —
    * the overlap statistics both Jaccard and containment derive from.
    */
  private def overlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Option[Long]): DataFrame = {
    // persisted: the shingle expression is the expensive part and this
    // subtree feeds three consumers (sizes + both self-join sides) — without
    // the persist Spark recomputes it per consumer (measured 3× cost).
    // Tracked in CacheScope; the query runner drains after its action.
    // the self-join keys on xxhash64(shingle) longs, not the shingle
    // strings: 8-byte fixed-width shuffle keys and comparisons instead of
    // ~25-byte UTF8 strings. The hash only pairs up rows (the count is of
    // matching hashes); a cross-document collision would need two distinct
    // shingles with equal xxhash64 in the same doc pair — P ≈ 2⁻⁶⁴ per
    // co-occurring shingle pair, negligible even at 100 TB.
    val sh = graft.engine.CacheScope.persistTracked(
      shingleTable(df, idCol, textCol, k, maxDocFreq)
        .select(col("id"), xxhash64(col("shingle")).as("shash")))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shash") === col("b.shash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
  }

  /** Exact n-gram Jaccard pairs ≥ threshold via shingle self-join:
    * |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|. Quadratic in the worst
    * case — use `minhashPairs` at scale; this is the ground truth.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, maxDocFreq: Option[Long] = None): DataFrame =
    overlapPairs(df, idCol, textCol, k, maxDocFreq)
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), graft.functions.EngineMath.roundAway(col("jaccard"), 4).as("jaccard"))

  /** Asymmetric shingle CONTAINMENT pairs: C(A⊆B) = |A∩B| / |A|. Catches
    * sub-document duplication Jaccard misses — a paragraph pasted into a
    * much larger document has high containment but low Jaccard (the size
    * imbalance dilutes the union). Emits both directions for pairs where
    * either containment ≥ threshold; same cost shape as `jaccardPairs`
    * (one shingle self-join), same skew guard (`maxDocFreq`).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, maxDocFreq: Option[Long] = None): DataFrame =
    overlapPairs(df, idCol, textCol, k, maxDocFreq)
      .withColumn("c_ab", col("common").cast("double") / col("sz_a"))
      .withColumn("c_ba", col("common").cast("double") / col("sz_b"))
      .filter(greatest(col("c_ab"), col("c_ba")) >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.EngineMath.roundAway(col("c_ab"), 4).as("c_ab"),
        graft.functions.EngineMath.roundAway(col("c_ba"), 4).as("c_ba"))

  // ---- MinHash + banded LSH (the scale path) ----------------------------

  /** MinHash signature: `numHashes` independent permutations simulated by
    * min over xxhash64(i, shingle) — seeding with the permutation index as
    * an extra hash input gives independent families; 64-bit longs make the
    * array_min and band hashing integer ops (no hex-string allocation).
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    minhashSignatureOf(TextFunctions.shingles(text, k), numHashes)

  private def minhashSignatureOf(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** (id, band, bandKey): one row per document per band; bandKey hashes
    * `rowsPerBand` consecutive signature components. Documents sharing any
    * (band, bandKey) are candidates. Probability a pair with Jaccard j
    * collides: 1 − (1 − j^r)^b.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String, k: Int,
      bands: Int, rowsPerBand: Int): DataFrame =
    bandsOf(sigFrame(df, idCol, textCol, k, bands * rowsPerBand),
      bands, rowsPerBand)

  /** (id, sh, sig), with the shingle set persisted first: Catalyst's
    * CollapseProject inlines a projected alias into every consumer and
    * lambda-bearing expressions are excluded from subexpression
    * elimination, so WITHOUT the materialization barrier the shingle HOF
    * would be re-evaluated once per hash function (measured 10-20×
    * slow-down). The persist caps that at exactly one evaluation per doc.
    */
  private def sigFrame(df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int): DataFrame = {
    val docs = graft.engine.CacheScope.persistTracked(
      widen(df).select(col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), k).as("sh")))
    docs.select(col("id"), col("sh"),
      minhashSignatureOf(col("sh"), numHashes).as("sig"))
  }

  /** (id, band, band_key) from an (id, sig) frame: band_key is xxhash64 of
    * the band's `rowsPerBand` signature longs (an integer-only hash).
    */
  private def bandsOf(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col("id"), explode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
            .as("band_key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))

  /** Candidate pairs from banded LSH: distinct (id_a < id_b) sharing a
    * band bucket. The self-join shuffles on (band, band_key) — tiny keys,
    * and bucket sizes stay small unless documents truly collide.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String, k: Int,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val bk = minhashBands(df, idCol, textCol, k, bands, rowsPerBand)
    bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH dedup pairs: LSH candidates verified with the exact
    * Jaccard of their shingle sets. The verification joins the (id,
    * shingle-set) frame onto the candidate pairs and intersects arrays
    * directly — it touches O(candidates) pairs, not O(n²), and the
    * expensive md5 signature is computed exactly once per document.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    // one pass: shingle set per doc, persisted — it feeds the signature AND
    // both sides of the verification join (3 consumers)
    val withSig = sigFrame(df, idCol, textCol, k, bands * rowsPerBand)
    val docs = withSig.select(col("id"), col("sh"))
    val bk = bandsOf(withSig, bands, rowsPerBand)
    val cand = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verify on the candidate pairs via set intersection — same
    // Jaccard value as the explode/self-join oracle path (both distinct sets)
    cand
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), graft.functions.EngineMath.roundAway(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** The low 60 bits of xxhash64 — the per-token hash both simhash
    * variants share (must be value-identical between them).
    */
  private def tokenHash60(t: Column): Column =
    xxhash64(t).bitwiseAND((1L << 60) - 1)

  /** 60-bit SimHash over whitespace tokens: per token take the low 60 bits
    * of xxhash64; output bit j is 1 iff more tokens set bit j than clear
    * it. Near-duplicates land within a small Hamming distance. Pure
    * expression — no UDF. (Column form, for per-row use; `simhashTable`
    * is the fast path for whole-table computation.)
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => tokenHash60(t))
    val n = size(hashes)
    // for each bit j: set iff 2 * count_of_ones > n (majority vote).
    // call_function("shiftright", …) because the Scala API only takes a
    // literal Int shift; the SQL expression accepts a column.
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, j) => {
        val ones = aggregate(hashes, lit(0L),
          (c, h) => c + call_function("shiftright", h, j).bitwiseAND(1L))
        acc + when(ones * 2 > n,
          call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (id, simhash) via explode + hash-aggregate — the FAST path: the same
    * majority-vote simhash as `simhash(Column)`, but computed as one
    * codegen'd HashAggregate with 60 bit-count sums instead of a 60-way
    * nested higher-order-function expression per row (which executes
    * interpreted and quadratically). Documents with zero tokens get
    * simhash 0, matching the Column version.
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Bit-sliced counting: the 60 per-bit counters are packed 4-per-long as
    // 16-bit fields (safe for documents up to 65535 tokens), so the
    // HashAggregate has 16 agg columns instead of 61 — a far smaller
    // generated class (Janino compile time was the dominant cold cost) and
    // a quarter of the aggregation buffer.
    val slots = 4; val w = 16; val groups = 15 // 15 longs × 4 counters
    val tok = widen(df).select(col(idCol).as("id"),
      explode_outer(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", when(col("tok").isNotNull,
        tokenHash60(col("tok"))).otherwise(lit(null)))
    val packs = (0 until groups).map { g =>
      sum((0 until slots).map(s =>
        shiftright(col("h"), g * slots + s).bitwiseAND(1L) * lit(1L << (w * s)))
        .reduce(_ + _)).as(s"p$g")
    }
    val agg = tok.groupBy(col("id"))
      .agg(count(col("h")).as("n"), packs: _*)
    val sh = (0 until 60).map { j =>
      val cnt = shiftright(col(s"p${j / slots}"), w * (j % slots))
        .bitwiseAND((1L << w) - 1)
      when(cnt * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("id"), sh.as("sh"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found by
    * pigeonhole banding: the 60-bit hash is split into `maxDist + 1`
    * chunks, so any pair within distance ≤ maxDist differs in at most
    * maxDist chunks and therefore agrees exactly on ≥ 1 chunk — the join
    * on (chunk, chunk_val) is COMPLETE, not approximate (Manku et al.,
    * WWW'07 §3). The exact `hamming ≤ maxDist` filter after the join
    * removes false candidates, so the result is exact.
    *
    * Scale note: chunk width is 60/(maxDist+1) bits, so large maxDist
    * means coarse chunks and bigger candidate buckets (maxDist=10 → 5-6
    * bit chunks → ≤ 64 distinct values per chunk). At billions of rows
    * keep maxDist ≤ 5, or pre-partition by a second chunk before the
    * per-bucket pair expansion.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    // persisted: the simhash aggregate feeds both self-join sides
    simhashPairsOf(graft.engine.CacheScope.persistTracked(
      simhashTable(df, idCol, textCol)), maxDist)

  /** The pigeonhole chunk layout for a given distance bound: (chunk index,
    * bit offset, value mask). Uneven split — the first (60 % nChunks)
    * chunks get one extra bit. Shared by the banding join AND the oracle
    * SQL builder, so the two cannot drift.
    */
  def simhashChunkSpec(maxDist: Int): Seq[(Int, Int, Long)] = {
    val nChunks = maxDist + 1
    require(nChunks >= 1 && nChunks <= 60,
      s"maxDist must be in [0, 59], got $maxDist")
    val base = 60 / nChunks; val rem = 60 % nChunks
    val widths = (0 until nChunks).map(c => if (c < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    (0 until nChunks).map(c => (c, offsets(c), (1L << widths(c)) - 1))
  }

  /** The banding + verification over an existing (id, sh) simhash table —
    * the downstream half of [[simhashPairs]], callable over a staged/
    * persisted signature frame (the per-doc signature computation is the
    * engine-specific part; everything from here is relational algebra).
    */
  def simhashPairsOf(sh: DataFrame, maxDist: Int): DataFrame = {
    val chunked = sh.select(col("id"), col("sh"), explode(
      array(simhashChunkSpec(maxDist).map { case (c, off, mask) =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), off).bitwiseAND(mask).as("chunk_val"))
      }: _*)).as("ck"))
      .select(col("id"), col("sh"), col("ck.chunk"), col("ck.chunk_val"))
    val pairs = chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    pairs
  }

  // ---- winnowing (rolling-hash local fingerprints) -----------------------

  /** Winnowing fingerprints (the MOSS scheme): hash every character k-gram
    * (rolling hash via [[TextFunctions.charGramHashes]]), slide a window of
    * `w` consecutive gram hashes, keep each window's minimum, dedup.
    * Guarantee: any shared substring of length ≥ w+k−1 between two
    * documents yields at least one shared fingerprint — local, position-
    * independent overlap detection, unlike the whole-document
    * `TextFunctions.fingerprint`.
    *
    * Shape: explode the gram array once, take the sliding min with a
    * window function (one shuffle on id, each gram hashed exactly once),
    * then distinct. A nested-HOF formulation would re-evaluate the gram
    * array per window — O(n²) per document (the CSE trap, see `sigFrame`).
    *
    * Output: (id, fp) — one row per distinct selected fingerprint.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame =
    winnowFingerprintsOf(winnowGrams(df, idCol, textCol, k), w)

  /** (id, pos, g): the positional k-gram rolling-hash table — the
    * engine-specific half of winnowing (xxhash64 per char k-gram), staged
    * separately so the selection logic below can be oracle-checked over it.
    */
  def winnowGrams(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    // persist the normalised text FIRST: charGramHashes' lambda captures
    // its input per element, so it must see a materialised attribute, not
    // the tokenizer expression (else O(n²) per doc — see its Scaladoc)
    val norm = graft.engine.CacheScope.persistTracked(
      widen(df).select(col(idCol).as("id"),
        TextFunctions.normalizedText(col(textCol)).as("t")))
    norm.select(col("id"),
      posexplode(TextFunctions.charGramHashes(col("t"), k))
        .as(Seq("pos", "g")))
  }

  /** Window-min fingerprint selection over an (id, pos, g) gram table —
    * the downstream half of [[winnowFingerprints]] (plain relational
    * algebra: one window pass + distinct).
    */
  def winnowFingerprintsOf(grams: DataFrame, w: Int): DataFrame = {
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    grams
      .withColumn("wmin", min(col("g")).over(win))
      // rows before the first full window only contribute for documents
      // shorter than w grams (their single overall min is the fingerprint)
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("id"))))
      .filter(col("pos") >= w - 1 || (col("ng") < w && col("pos") === col("ng") - 1))
      .select(col("id"), col("wmin").as("fp"))
      .distinct()
  }

  /** Documents sharing ≥ `minShared` winnow fingerprints — the local-
    * overlap near-dup relation (finds partial plagiarism/quotation overlap
    * that whole-document similarity misses). Self-join on fp: the skew
    * guard is the same df-cap idea as shingles — drop ubiquitous
    * fingerprints via `maxDocFreq`.
    */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxDocFreq: Option[Long] = None): DataFrame =
    winnowOverlapPairsOf(winnowFingerprints(df, idCol, textCol, k, w),
      minShared, maxDocFreq)

  /** Pairing over an existing (id, fp) fingerprint frame — the downstream
    * half of [[winnowOverlapPairs]]. Persists its input: the fp frame
    * feeds the doc-frequency count and both self-join sides.
    */
  def winnowOverlapPairsOf(fingerprints: DataFrame, minShared: Int = 2,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val fps0 = graft.engine.CacheScope.persistTracked(fingerprints)
    val fps = maxDocFreq match {
      case None => fps0
      case Some(cap) =>
        val rare = fps0.groupBy("fp").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("fp")
        fps0.join(rare, Seq("fp"))
    }
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---- connected components (pairs → dedup groups) ----------------------

  /** Connected components over an undirected pair list: every node gets the
    * smallest id reachable from it (`component`). Near-dup PAIRS only
    * become droppable once closed transitively — a≈b, b≈c must collapse to
    * one keeper even when a≉c directly.
    *
    * Algorithm: min-label propagation — each round every node takes the min
    * of its own label and its neighbors'; converges in O(component
    * diameter) rounds. Near-dup clusters are shallow (duplicates of a
    * common source), so this is 2-4 shuffles in practice; the driver loop
    * only coordinates (one count per round), all data work is distributed.
    * For graphs with long chains swap in the large-star/small-star
    * alternation — same contract.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, collectThreshold: Long = 5000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // Size-adaptive: the candidate-pair graph is tiny relative to the
    // corpus (it exists only where near-dups exist), so up to
    // `collectThreshold` edges a driver-side union-find (milliseconds)
    // beats an iterative distributed loop (seconds of per-job fixed cost).
    // Above the threshold — or for non-long ids — the label-propagation
    // loop below is the scale path.
    val longIds = pairs.schema(aCol).dataType == LongType &&
      pairs.schema(bCol).dataType == LongType
    // persist BEFORE the size probe: the threshold count and the
    // local-path collect (or the distributed loop's first pass) would
    // otherwise evaluate the full upstream pair computation twice
    val cachedPairs = graft.engine.CacheScope.persistTracked(
      pairs.select(col(aCol), col(bCol)))
    if (longIds &&
        cachedPairs.limit((collectThreshold + 1).toInt).count() <= collectThreshold)
      return componentsLocal(cachedPairs, aCol, bCol)
    // edges pre-partitioned on the probe key: the cached InMemoryRelation
    // keeps its outputPartitioning, so each iteration's join reshuffles
    // only the (much smaller) label frame
    val edges = cachedPairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(cachedPairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("dst")).persist()
    var cached = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    var labels = cached
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // one pass computes the new label AND whether it moved — the changed
      // count is a metric on this frame, not a second join
      val step = labels.as("l")
        .join(nbrMin, col("l.id") === nbrMin("src"), "left")
        .select(col("l.id").as("id"), col("l.label").as("old_label"),
          least(col("l.label"), coalesce(col("nbr_label"), col("l.label")))
            .as("label"))
        .persist()
      changed = step.filter(col("label") =!= col("old_label")).count()
      cached.unpersist() // unpersist the FRAME that holds the cache, not a projection
      cached = step
      labels = step.select(col("id"), col("label"))
      i += 1
    }
    edges.unpersist()
    // the loop unpersists each superseded step; the FINAL step must stay
    // cached until the caller's action — hand it to CacheScope
    graft.engine.CacheScope.track(cached)
    labels.select(col("id"), col("label").as("component"))
  }

  /** Driver-side union-find with path compression + union-by-min: the
    * component of each node is its smallest reachable id — identical
    * contract to the distributed loop, O(E α(E)) on collected edges.
    */
  private def componentsLocal(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by MIN root so the component id is the min id
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "component")
  }

  /** One row per near-dup GROUP (component, keep_id = smallest member,
    * n_members), given a pair list. Singletons are not listed — they are
    * trivially their own keepers.
    */
  def pairGroups(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_members"))

  /** The deduplicated view: drop every row whose id belongs to a component
    * but is not its keeper. Rows in no pair pass through untouched.
    */
  def deduplicateByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val drop = components(pairs, aCol, bCol)
      .filter(col("id") =!= col("component")) // non-keepers
      .select(col("id").as("__drop_id"))
    df.join(drop, df(idCol) === col("__drop_id"), "left_anti")
  }

  // ---- embedding cosine -------------------------------------------------

  /** Cosine similarity of two float-array columns — built-in `zip_with` +
    * `aggregate`, fully codegen-compatible, no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold). All-pairs — the
    * small-data oracle; the scale path is `Similarity.lshBuckets` banding
    * or an IVF pre-cluster, both reducing the candidate space before this
    * verification step.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // native codegen'd dot product (graft.functions.DotProduct): the HOF
    // aggregate(zip_with(…)) allocates per pair and runs interpreted —
    // measured 3-4× slower on the all-pairs join
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    // norms once per ROW (not per pair): cos = dot / (norm_a * norm_b) is
    // the identical double arithmetic to dot/(sqrt(dot_aa)*sqrt(dot_bb)),
    // at a third of the per-pair flops
    // widen: the `a.id < b.id` join is a nested-loop whose parallelism is
    // the stream side's partition count — a single-file input would
    // otherwise run the whole cross product on one core
    val v = widen(df).select(col(idCol).as("id"), col(vecCol).as("vec"),
      sqrt(dot(col(vecCol), col(vecCol))).as("norm"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos",
        dot(col("a.vec"), col("b.vec")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.EngineMath.roundAway(col("cos"), 4).as("cos"))
  }
}

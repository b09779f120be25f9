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
  *  - hash functions are md5-based so results are engine-portable (same
  *    values in Spark, DuckDB, anything) — deterministic tests and oracles.
  */
object Dedup {

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
    val base = df
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

  /** Exact n-gram Jaccard pairs ≥ threshold via shingle self-join:
    * |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|. Quadratic in the worst
    * case — use `minhashPairs` at scale; this is the ground truth.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, k, maxDocFreq)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- MinHash + banded LSH (the scale path) ----------------------------

  /** MinHash signature: `numHashes` independent permutations simulated by
    * min over md5("<i>:" + shingle) — a string min is as good as an integer
    * min for the MinHash property, and md5 is portable across engines.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val sh = TextFunctions.shingles(text, k)
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i:"), s))))
    }: _*)
  }

  /** (id, band, bandKey): one row per document per band; bandKey hashes
    * `rowsPerBand` consecutive signature components. Documents sharing any
    * (band, bandKey) are candidates. Probability a pair with Jaccard j
    * collides: 1 − (1 − j^r)^b.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String, k: Int,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), k, bands * rowsPerBand).as("sig"))
      .select(col("id"), explode(
        array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
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
    val numHashes = bands * rowsPerBand
    // one pass: shingle set + signature per doc
    val docs = df.select(col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), k).as("sh"))
    val sig = docs.select(col("id"), col("sh"), array((0 until numHashes).map { i =>
      array_min(transform(col("sh"), s => md5(concat(lit(s"$i:"), s))))
    }: _*).as("sig"))
    val bk = sig.select(col("id"), explode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
            .as("band_key"))
      }: _*)).as("bkk"))
      .select(col("id"), col("bkk.band"), col("bkk.band_key"))
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
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 60-bit SimHash over whitespace tokens: per token take the top 15 hex
    * chars of md5 as a 60-bit integer; output bit j is 1 iff more tokens
    * set bit j than clear it. Near-duplicates land within a small Hamming
    * distance. Pure expression (conv + bit ops) — no UDF.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
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
    val tok = df.select(col(idCol).as("id"),
      explode_outer(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("h", when(col("tok").isNotNull,
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")).otherwise(lit(null)))
    val bitSums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1L)).as(s"b$j"))
    val agg = tok.groupBy(col("id"))
      .agg(count(col("h")).as("n"), bitSums: _*)
    val sh = (0 until 60).map(j =>
      when(col(s"b$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("id"), sh.as("sh"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found by
    * 4-chunk banding (15 bits per chunk): any pair within distance ≤ 3
    * agrees on ≥1 chunk (pigeonhole), so the join is on chunk values, not
    * all pairs.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sh = simhashTable(df, idCol, textCol)
    val chunked = sh.select(col("id"), col("sh"), explode(
      array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * 15).bitwiseAND((1L << 15) - 1).as("chunk_val"))
      }: _*)).as("ck"))
      .select(col("id"), col("sh"), col("ck.chunk"), col("ck.chunk_val"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
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
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sqrt(dot(col(vecCol), col(vecCol))).as("norm"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos",
        dot(col("a.vec"), col("b.vec")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 4).as("cos"))
  }
}

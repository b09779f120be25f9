package graft

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Beyond-reference extension queries (SURVEY.md §2.C/§7.6): text analysis,
  * deduplication, similarity search — the operations a large-scale
  * training-data pipeline needs, each oracle-checked against DuckDB where
  * SQL-expressible (md5-based hashing keeps the hash paths portable).
  */
object ExtensionQueries {

  /** documents with vectors cast to double (float accumulation differs
    * between engines; double-double is exact-comparable).
    */
  private def embeddingsD(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .withColumn("vec", transform(col("embedding"), x => x.cast("double")))

  /** The ANN index artifacts over the embeddings corpus — coarse k-means
    * centroids (IVF / SemDeDup share one clustering, per SemDedup.scala's
    * design note) and PQ codebooks — fit ONCE per (JVM, corpus) via
    * [[graft.operators.Fitted]] and consumed by every query that needs
    * them (x13/x52/x54 the centroids; x51/x52 the codebooks). Seeded fits
    * make the memoization result-invisible; it only deletes the per-query
    * re-fit an index build would never do.
    */
  private def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    semCentroids(s, dir, 8)

  /** [[ivfCentroids]] at caller-chosen K — x54 scales K with the corpus
    * ([[graft.operators.SemDedup.scaledK]]); at the sf0.01 gate that
    * resolves to the same k=8 fit the ANN queries memoize.
    */
  private def semCentroids(s: SparkSession, dir: String, k: Int): DataFrame =
    graft.operators.Fitted.getOrFit(s,
      graft.operators.Fitted.key(dir, "ivf", "k" -> k, "maxIter" -> 5)) {
      graft.operators.Ivf.fit(embeddingsD(s, dir), "vec", k = k, maxIter = 5)
    }

  private def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    pqCodebooksM(s, dir, 4)

  /** [[pqCodebooks]] at caller-chosen sub-quantizer count. m=4 (16 dims
    * per sub, 4 bytes/vec) is the max-compression point x53's streaming
    * index maintains; m=8 (8 dims per sub, 8 bytes/vec) is the
    * PRODUCTION retrieval point — the finer codebook sharpens the ADC
    * ordering enough that, with the C=1000 re-rank pool, recall@10
    * reaches 0.90 (AnnFrontier, COVERAGE.md) where m=4/C=300 sat at
    * 0.5–0.7.
    */
  private def pqCodebooksM(s: SparkSession, dir: String, m: Int): DataFrame =
    graft.operators.Fitted.getOrFit(s,
      graft.operators.Fitted.key(dir, "pq",
        "dim" -> 64, "m" -> m, "ksub" -> 16, "maxIter" -> 5)) {
      graft.operators.Pq.fit(embeddingsD(s, dir), "vec", dim = 64, m = m,
        ksub = 16, maxIter = 5)
    }

  /** The PRODUCTION IVF geometry (x13/x52): K ∝ N via
    * [[graft.operators.SemDedup.scaledK]] (the x54 device — constant
    * expected bucket size, so probe cost per query stays flat as the
    * corpus grows) with nProbe = K/2 — the recall-targeted point the
    * AnnFrontier sweep measured at 0.96 recall@10 (COVERAGE.md). At the
    * sf0.01 gate scaledK resolves to the same k=8 fit the legacy point
    * memoized; count() is parquet-metadata-cheap and the fit itself is
    * [[graft.operators.Fitted]]-memoized per (JVM, corpus, K).
    */
  private def scaledIvf(s: SparkSession, dir: String): (DataFrame, Int) = {
    val k = graft.operators.SemDedup.scaledK(embeddingsD(s, dir).count())
    (semCentroids(s, dir, k), math.max(4, k / 2))
  }

  /** Sketch geometry + the shared x55/x61 candidate read: exact top-20
    * terms scored against a collected sketch — ONE definition so the
    * "same top-20 read, same oracle" coupling between the batch-built and
    * stream-merged sketches cannot drift.
    */
  private val CmsDepth = 4
  private val CmsWidth = 512
  private def cmsTop20(terms: DataFrame, sk: Seq[Long]): DataFrame =
    terms.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc).limit(20)
      .select(col("term"), col("n"),
        graft.functions.CountMin.estimate(
          typedlit(sk), col("term"), CmsDepth, CmsWidth).as("est"))
      .orderBy(col("n").desc, col("term").asc)

  /** The scored-and-labeled ranker-eval frame shared by x88/x192/x193/
    * x196: the x70 quality-model logits (memoized fit — one model per
    * (JVM, corpus), like [[ivfCentroids]]) rounded to 6 dp, labeled by
    * the training target. Each consumer stages the weights under its own
    * key so its oracle re-derives the IDENTICAL scores independently
    * ([[scoredLabCtes]] is the oracle half of this definition).
    */
  private def qlrScoredLab(s: SparkSession, dir: String,
      stageKey: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val model = graft.operators.Fitted.getOrFit(s,
      graft.operators.Fitted.key(dir, "qlr",
        "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
      graft.operators.QualityFilter.fit(docs, "doc_id", "text",
        isTarget = col("source") === "src0")
    }
    Stage.write(model, dir, stageKey)
    graft.operators.QualityFilter.logits(docs, "doc_id", "text", model)
      .select(col("id").as("doc_id"),
        graft.functions.EngineMath.roundAway(col("logit"), 6).as("score"))
      .join(docs.select(col("doc_id"),
        (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
  }

  /** x99's fixed subword vocabulary, longest-first (then lexicographic).
    * Greedy longest-match encoding falls out of ordered regex alternation:
    * both java.util.regex and DuckDB's RE2 use leftmost-FIRST alternation,
    * so listing longer units before their prefixes makes the first
    * matching alternative the longest vocabulary unit at each position,
    * and the single-letter fallback guarantees every letter is consumed
    * by exactly one piece. One shared constant builds BOTH engines'
    * patterns — the ordering is the semantics, so it cannot drift.
    */
  private[graft] val SubwordVocab = Seq(
    "ation", "tion", "ing", "ent", "ous", "ers", "est", "the", "and",
    "ter", "er", "in", "on", "an", "re", "at", "or", "es", "en", "ed",
    "to", "it", "is", "of")
  // the raw mkString below is spliced into BOTH the Spark regex and the
  // single-quoted DuckDB oracle SQL — enforce the two invariants the
  // splice silently depends on, so a future vocab edit cannot break the
  // greedy-longest-match semantics or the SQL string
  require(SubwordVocab.forall(_.matches("[a-z]+")),
    "SubwordVocab units must be plain lowercase-letter literals (no regex " +
      "metachars or quotes — the pattern is spliced into quoted oracle SQL)")
  require(SubwordVocab.sliding(2).forall(p => p(0).length >= p(1).length),
    "SubwordVocab must be sorted by descending length: leftmost-FIRST " +
      "alternation only yields greedy longest-match when longer units precede")
  private val SubwordPattern =
    SubwordVocab.mkString("(?:", "|", "|[a-z])")

  /** The x99 projection, factored so the spec can run it on a hand-built
    * frame: greedy subword piece count, multi-char piece count, and letter
    * coverage (every letter is consumed by exactly one piece).
    */
  private[graft] def vocabEncode(docs: DataFrame): DataFrame = {
    val pieces = regexp_extract_all(
      lower(col("text")), lit(SubwordPattern), lit(0))
    docs.select(
      col("doc_id"),
      size(pieces).cast("long").as("n_pieces"),
      size(filter(pieces, p => length(p) > lit(1)))
        .cast("long").as("n_multi"),
      length(regexp_replace(lower(col("text")), "[^a-z]", ""))
        .cast("long").as("n_alpha"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x01: token counting — whitespace + BPE-ish regex pre-tokenizer
    "x01_token_count" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.regexTokenCount(col("text")).cast("long").as("n_pieces"))
        .orderBy(col("doc_id"))),
    // x02: language-ID by marker-word voting — tokens materialized once
    // (langId over raw text would re-tokenize per language's marker scan)
    "x02_lang_id" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(TextFunctions.tokens(col("text")).as("ts")))
      toks.select(TextFunctions.langIdOf(col("ts")).as("lang_guess"))
        .groupBy(col("lang_guess")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_guess"))
    }),
    // x03: quality scoring — length/punct/stopword ratios over one
    // materialized tokens column (the ratios would otherwise each
    // re-tokenize; ~10 tokenizations/row → 1)
    "x03_quality" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      toks.select(
        col("doc_id"),
        graft.functions.EngineMath.roundAway(TextFunctions.stopwordRatioOf(col("ts")), 4).as("stop_ratio"),
        graft.functions.EngineMath.roundAway(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"),
        graft.functions.EngineMath.roundAway(TextFunctions.meanTokenLenOf(col("ts")), 4).as("mean_tok_len"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),
    // x24: pre-tokenization text cleaning (HTML strip, control chars,
    // whitespace collapse) — regex chain identical in Java regex and RE2
    "x24_clean_text" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        length(TextFunctions.cleanText(col("text"))).cast("long").as("clean_len"),
        TextFunctions.tokenCount(TextFunctions.cleanText(col("text")))
          .cast("long").as("clean_tokens"))
        .orderBy(col("doc_id"))),
    // x25: int8 embedding quantization — per-vector scale + cosine error
    // of the dequantized vector vs the original
    "x25_quantize" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        call_function("graft_dot", a, b)
      val v = embeddingsD(s, dir).select(col("vec_id"), col("vec"),
        Similarity.quantizeScale(col("vec")).as("scale"))
      val dq = v.select(col("vec_id"), col("vec"), col("scale"),
        Similarity.dequantize(
          Similarity.quantize(col("vec"), col("scale")), col("scale")).as("dq"))
      dq.select(col("vec_id"), graft.functions.EngineMath.roundAway(col("scale"), 6).as("scale"),
        graft.functions.EngineMath.roundAway(dot(col("vec"), col("dq")) /
          (sqrt(dot(col("vec"), col("vec"))) * sqrt(dot(col("dq"), col("dq")))), 4)
          .as("cos_fidelity"))
        .orderBy(col("vec_id"))
    }),
    // x16: quality-score quantiles per language — exact interpolated
    // percentiles (Spark `percentile` == DuckDB `quantile_cont`)
    "x16_quality_quantiles" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val q = toks.select(
        TextFunctions.langIdOf(col("ts")).as("lang"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"))
      q.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        graft.functions.EngineMath.roundAway(percentile(col("q"), lit(0.25)), 4).as("q25"),
        graft.functions.EngineMath.roundAway(percentile(col("q"), lit(0.5)), 4).as("q50"),
        graft.functions.EngineMath.roundAway(percentile(col("q"), lit(0.75)), 4).as("q75"))
        .orderBy(col("lang"))
    }),
    // x17: heavy hitters — top-5 tokens per language by frequency with a
    // deterministic tie-break. The per-doc lang column is persisted BEFORE
    // the explode: as a plain expression it would be re-evaluated per
    // emitted token (the HOF-inlining trap — 20s+ instead of ~1s)
    "x17_top_tokens" -> ((s, dir) => {
      // tokens materialized ONCE; lang derived from the same array (langId
      // over raw text would tokenize 4x, and the explode would re-split a
      // 5th time). The persist stays load-bearing: without it the lang
      // expression would be re-evaluated per EMITTED token under the
      // explode (the HOF-inlining trap — 20s+ instead of ~1s)
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(TextFunctions.tokens(col("text")).as("ts")))
      val byDoc = graft.engine.CacheScope.persistTracked(
        toks.select(TextFunctions.langIdOf(col("ts")).as("lang"), col("ts")))
      val tok = byDoc.select(col("lang"), explode(col("ts")).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("tok").asc)
      tok.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .orderBy(col("lang"), col("rank"))
    }),
    // x37: repetition quality signals (the Gopher-style filters): fraction
    // of repeated tokens and the most-frequent-bigram share. The bigram
    // mode is computed DISTRIBUTED (explode → per-(doc,bigram) count →
    // per-doc max), not as a per-row nested HOF — O(tokens) rows through
    // two hash aggregates instead of O(tokens²) per document
    "x37_repetition" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("ts")))
      val base = toks.select(col("doc_id"),
        size(col("ts")).as("n_tokens"),
        size(array_distinct(col("ts"))).as("n_distinct"))
      val top = toks
        .select(col("doc_id"),
          explode(TextFunctions.bigramsOf(col("ts"))).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bg"))
      base.join(top, Seq("doc_id"), "left")
        .select(col("doc_id"),
          graft.functions.EngineMath.roundAway(
            when(col("n_tokens") > 0, lit(1.0) -
              col("n_distinct").cast("double") / col("n_tokens").cast("double"))
              .otherwise(lit(0.0)), 4).as("dup_token_frac"),
          graft.functions.EngineMath.roundAway(
            coalesce(col("top_c").cast("double") / col("n_bg").cast("double"),
              lit(0.0)), 4).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),
    // x39: document chunking — fixed token windows with stride/overlap,
    // the doc→training-sequence fan-out; one posexplode, no shuffle
    "x39_chunk" -> ((s, dir) =>
      graft.operators.Chunking.chunkDocs(
        table(s, dir, "documents"), "doc_id", "text",
        window = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    // x40: benchmark decontamination — corpus docs sharing 5-gram shingles
    // with the benchmark split (every 50th doc); benchmark grams broadcast,
    // corpus grams never shuffled before the per-doc aggregation
    "x40_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.operators.Dedup.contaminationScan(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 5)
        .orderBy(col("doc_id"))
    }),
    // x41: sequence packing — documents assigned to fixed token-budget
    // training sequences, sharded prefix sums (no global-order task);
    // modulo shard key so the assignment is oracle-portable
    "x41_pack" -> ((s, dir) =>
      graft.operators.Packing.packSequences(
        table(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048, shards = 8,
        shardExpr = Some(pmod(col("doc_id"), lit(8L))))
        .orderBy(col("doc_id"))),
    // x42: TF-IDF top terms per document — ONE linear plan: the exploded
    // token table aggregates to per-(doc, term) tf, document frequency is
    // a count over a term-partitioned window on that SAME frame (no second
    // aggregate + self-join — the round-4 shape referenced the persisted
    // token table twice in one plan, the exact DeduplicateRelations
    // cache-substitution trap that bit a17). Ranked on INTEGER keys
    // (tf desc, df asc, term) so the ranking is engine-exact; the tfidf
    // value itself is rounded. At scale the term window concentrates a
    // stopword-grade hot term in one task — the same skew the
    // groupBy(term)+join shape had; a production df over a skewed corpus
    // would two-phase it with a salt (operators/Skew.scala pattern).
    "x42_tfidf" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val tf = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      val total = docs.agg(count(lit(1)).as("__N"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.withColumn("df", count(lit(1)).over(wTerm))
        .crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
          graft.functions.EngineMath.roundAway(
            col("tf").cast("double") *
              log(col("__N").cast("double") / col("df").cast("double")), 4)
            .as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),
    // x45: chunk→pack composition — the end-to-end training-sequence
    // builder: documents into 64-token chunks (stride=window: exact
    // partition), chunks packed into 256-token sequences sharded by DOC
    // (a document's chunks stay on one shard, ordered by chunk_key).
    // One posexplode + one sharded window; per-sequence stats gate it
    "x45_chunk_pack" -> ((s, dir) => {
      val chunks = graft.operators.Chunking.chunkDocs(
        table(s, dir, "documents"), "doc_id", "text",
        window = 64, stride = 64)
        // composite (doc, chunk) order as ONE sortable key. The multiplier
        // bounds chunk_idx at 1M chunks/doc (= 64M tokens at window 64)
        // before keys could collide; the guard makes a longer document a
        // loud error instead of a silently misordered packing
        .withColumn("chunk_idx", when(col("chunk_idx") >= 1000000L,
          raise_error(concat(lit("chunk_key overflow: doc "),
            col("doc_id"), lit(" has >= 1M chunks")))).otherwise(col("chunk_idx")))
        .withColumn("chunk_key", col("doc_id") * 1000000L + col("chunk_idx"))
      graft.operators.Packing.packSequences(chunks, "chunk_key", "n_tokens",
        budget = 256, shards = 4,
        shardExpr = Some(pmod(col("doc_id"), lit(4L))))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("seq_tokens"),
          min(col("chunk_key")).as("first_chunk"))
        .orderBy(col("shard"), col("seq_id"))
    }),
    // x38: PII pattern scan + redaction accounting — email/phone patterns
    // counted and redacted per document. The corpus carries no PII, so
    // deterministic markers are synthesized in-query (the b20 precedent);
    // regexes are fixed-shape and behave identically in Java regex and
    // DuckDB's RE2
    "x38_pii_scan" -> ((s, dir) => {
      val t = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.org now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit(" call 555-123-4567 today")).otherwise(lit("")))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      table(s, dir, "documents").select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          length(regexp_replace(
            regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).cast("long").as("redacted_len"))
        .orderBy(col("doc_id"))
    }),
    // x04: document fingerprinting (normalised md5)
    "x04_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
    // x05: exact dedup groups (hash-groupBy)
    "x05_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(table(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("fingerprint"))),
    // x06: exact n-gram Jaccard near-dup pairs (the all-pairs ground truth)
    "x06_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(table(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),
    // x07: MinHash+LSH near-dup pairs — banded candidates + exact verify;
    // oracle = the all-pairs truth (at j≥0.8 with 4 bands × 3 rows the
    // miss probability is <1e-4 per pair; the planted pairs sit at j≈0.99)
    "x07_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(table(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8, bands = 4, rowsPerBand = 3)
        .orderBy(col("id_a"), col("id_b"))),
    // x18: as-of join — each click event picks up the user's most recent
    // prior-or-simultaneous purchase; oracle = DuckDB's native ASOF JOIN
    "x18_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = graft.operators.AsOf.latestPerKeyTime(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value")),
        Seq("user_id"), "ts", tieBreak = "value")
      graft.operators.AsOf.asofJoin(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Map("ts" -> "purchase_ts", "value" -> "purchase_value"))
        .withColumn("purchase_value", graft.functions.EngineMath.roundAway(col("purchase_value"), 2))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // x19: bucketized range join — every event assigned to the session
    // interval containing it (equi-key user_id + ts∈[start,end]); the
    // nested-loop-free interval join, oracle = plain BETWEEN join
    "x19_range_join" -> ((s, dir) => {
      val sess = graft.streaming.StreamOps
        .sessionizeBatch(Tables.events(s, dir), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          unix_micros(col("session_start")).as("lo"),
          unix_micros(col("session_end")).as("hi"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      graft.operators.RangeJoin.intervalJoin(ev, sess, Seq("user_id"),
        pointCol = "t", loCol = "lo", hiCol = "hi",
        bucketWidth = 30L * 60 * 1000000) // 30 min in micros ≈ session gap
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_seq"))
    }),
    // x15: winnowing local-overlap pairs (rolling-hash fingerprints, MOSS
    // scheme). The positional gram-hash table (the engine-specific xxhash64
    // half) is STAGED to parquet; the window-min selection + pairing run
    // over the staged table and are oracle-checked in DuckDB over the same
    // files (gram-hash correctness itself is locked by DedupSimilaritySpec)
    "x15_winnow_overlap" -> ((s, dir) => {
      val grams = graft.engine.CacheScope.persistTracked(
        Dedup.winnowGrams(table(s, dir, "documents"), "doc_id", "text", k = 7))
      Stage.write(grams, dir, "x15_grams")
      Dedup.winnowOverlapPairsOf(Dedup.winnowFingerprintsOf(grams, w = 8),
        minShared = 2, maxDocFreq = Some(20))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x14: near-dup pairs closed into dedup groups (connected components,
    // min-label propagation); oracle = DuckDB recursive-CTE reachability
    "x14_dedup_groups" -> ((s, dir) =>
      Dedup.pairGroups(
        Dedup.jaccardPairs(table(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.8), "id_a", "id_b")
        .orderBy(col("component"))),
    // x43: keeper selection by SCORE — keep the LONGEST member of each
    // near-dup group (the production policy; min-id is x14's convention).
    // Integer score + id tie-break keeps the selection engine-exact. The
    // pair source here is the exact oracle path (x06); at scale the same
    // keeper composes with minhashPairs (x07) unchanged.
    "x43_keep_best" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.8)
      Dedup.deduplicateByPairsKeepBest(docs, "doc_id", pairs, col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),
    // x44: LEAKAGE-SAFE split — the md5 split keyed by near-dup GROUP, so
    // duplicates can never straddle train/test (the eval-contamination
    // failure of id-keyed splits)
    "x44_group_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.8)
      Dedup.groupAwareSplit(docs.select(col("doc_id")), "doc_id", pairs,
        splitWeights)
        .orderBy(col("doc_id"))
    }),
    // x46: the BANDED-SOURCE composition — x43/x44 gate keeper selection
    // and the leakage-safe split over the quadratic jaccardPairs ORACLE
    // source; this gates the same downstream logic over the PRODUCTION
    // pair source (MinHash+LSH banding, the 100 TB path). The banded pair
    // table is staged so DuckDB re-derives components, keeper choice, and
    // the no-straddle split from exactly the pairs the engine found.
    "x46_banded_keep_split" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val pairs = graft.engine.CacheScope.persistTracked(
        Dedup.minhashPairs(d, "doc_id", "text", k = 3, threshold = 0.8))
      Stage.write(pairs.select(col("id_a"), col("id_b")), dir, "x46_pairs")
      val base = d.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val kept = Dedup.deduplicateByPairsKeepBest(base, "doc_id", pairs,
          col("n_tokens"))
        .select(col("doc_id"), lit(true).as("__kept"))
      Dedup.groupAwareSplit(base, "doc_id", pairs, splitWeights)
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("__kept"), lit(false)).as("kept"),
          col("group_key"), col("split"))
        .orderBy(col("doc_id"))
    }),
    // x47: INCREMENTAL cross-corpus dedup — the 100 TB "dedup the new
    // crawl batch against the existing corpus index" shape: even doc_ids
    // play the indexed corpus, odd ones the incoming batch; only the
    // batch is signed fresh, candidates join its band keys against the
    // reusable index, verification is the exact shingle Jaccard. All four
    // engine-specific tables (bands + shingle sets per side) are staged;
    // DuckDB re-derives candidates, intersection counts, and the
    // threshold independently.
    "x47_incremental_dedup" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val corpus = Dedup.minhashIndex(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 3)
      val batch = Dedup.minhashIndex(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", k = 3)
      Stage.write(corpus.bands, dir, "x47_corpus_bands")
      Stage.write(corpus.shingles, dir, "x47_corpus_sh")
      Stage.write(batch.bands, dir, "x47_batch_bands")
      Stage.write(batch.shingles, dir, "x47_batch_sh")
      Dedup.minhashPairsBetween(batch, corpus, threshold = 0.8)
        .orderBy(col("id_new"), col("id_corpus"))
    }),
    // x49: STREAMING incremental dedup — x47's shape as the crawl lands:
    // odd doc_ids stream in, each micro-batch signs itself and joins the
    // static even-id corpus index (foreachBatch; batch_id-partitioned
    // idempotent append). The staged batch-side tables recompute the same
    // deterministic signatures the stream computes per batch (minhash is
    // a pure function of text), so the DuckDB re-derivation is exact.
    "x49_stream_incr_dedup" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val corpus = Dedup.minhashIndex(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 3)
      val batch = Dedup.minhashIndex(
        d.filter(col("doc_id") % 2 === 1), "doc_id", "text", k = 3)
      Stage.write(corpus.bands, dir, "x49_corpus_bands")
      Stage.write(corpus.shingles, dir, "x49_corpus_sh")
      Stage.write(batch.bands, dir, "x49_batch_bands")
      Stage.write(batch.shingles, dir, "x49_batch_sh")
      val pairsDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-incrdedup-${Integer.toHexString(dir.hashCode)}-" +
          ProcessHandle.current().pid()).toString
      graft.streaming.StreamOps.incrementalDedupStream(s,
        s"$dir/documents.parquet", "doc_id", "text", corpus,
        threshold = 0.8, pairsDir = pairsDir,
        where = col("doc_id") % 2 === 1)
        .orderBy(col("id_new"), col("id_corpus"))
    }),
    // x67: STREAMING ANN index maintenance — embeddings stream in,
    // each micro-batch IVF-assigns + PQ-encodes against the fitted
    // (Fitted-cached) models and appends batch_id-partitioned index rows
    // (exactly-once dynamic overwrite). Assignment/encoding are per-item
    // pure functions of (vector, model), so the stream-built index must
    // equal the batch build ROW FOR ROW: the staged batch index IS the
    // oracle.
    "x67_stream_index" -> ((s, dir) => {
      val centroids = ivfCentroids(s, dir)
      val cb = pqCodebooks(s, dir)
      val e = embeddingsD(s, dir)
      Stage.write(
        graft.operators.Ivf.assign(e, "vec_id", "vec", centroids)
          .join(graft.operators.Pq.encode(e, "vec_id", "vec", cb,
            dim = 64, m = 4), Seq("id")),
        dir, "x67_batch_index")
      val idxDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-streamindex-${Integer.toHexString(dir.hashCode)}-" +
          ProcessHandle.current().pid()).toString
      graft.streaming.StreamOps.indexMaintenanceStream(s,
        s"$dir/embeddings.parquet", "vec_id", "vec", centroids, cb,
        dim = 64, m = 4, indexDir = idxDir,
        prep = b => b.withColumn("vec",
          transform(col("embedding"), x => x.cast("double"))),
        maxFilesPerTrigger = Some(1))
        .select(col("id").as("vec_id"), col("centroid_id"), col("sub"),
          col("code"))
        .orderBy(col("vec_id"), col("sub"))
    }),
    // x08: SimHash near-dup pairs. The (id, simhash) signature table (the
    // engine-specific xxhash64 majority-vote half) is STAGED to parquet;
    // the pigeonhole banding + hamming verification run over the staged
    // table and are oracle-checked in DuckDB (BIGINT bit ops) over the
    // same files (signature semantics locked by DedupSimilaritySpec)
    "x08_simhash_pairs" -> ((s, dir) => {
      val sh = graft.engine.CacheScope.persistTracked(
        Dedup.simhashTable(table(s, dir, "documents"), "doc_id", "text"))
      Stage.write(sh, dir, "x08_simhash")
      Dedup.simhashPairsOf(sh, maxDist = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x09: embedding-cosine near-dup pairs
    "x09_embed_pairs" -> ((s, dir) =>
      Dedup.embeddingPairs(embeddingsD(s, dir), "vec_id", "vec",
        threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),
    // x10: brute-force cosine top-k ANN baseline (5 query vectors, k=10)
    "x10_knn_brute" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      Similarity.bruteForceTopK(
        e, "vec_id", "vec",
        e.filter(col("vec_id") < 5), "vec_id", "vec", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),
    // x11: LSH-bucketed ANN at the PRODUCTION parameters (r14): planes=6
    // tables=16 — shorter signatures double each neighbor's per-table
    // collision odds and twice the tables double the independent chances
    // (recall 1−(1−p^planes)^tables), measured 1.00 recall@10 at both
    // SFs for ~12% extra cost over the old planes=8/tables=8 point
    // (AnnFrontier sweep, COVERAGE.md — the old point stays in the
    // frontier as the cheaper reference). The per-table bucket
    // assignments and the multi-probe set (the engine-specific
    // hyperplane-sign half) are STAGED; the candidate join +
    // exact-cosine top-k ranking over them is oracle-checked in DuckDB
    // against the same embeddings — the staged buckets carry the
    // parameters, so the oracle is parameter-agnostic (recall vs x10
    // additionally locked by DedupSimilaritySpec)
    "x11_knn_lsh" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      // index-build-time policy: small corpora probe radius 2 (sparse
      // buckets), large keep 1 — the count is an index-side one-off, and
      // the staged probe buckets carry the choice so the oracle's bucket
      // join is radius-agnostic
      val radius = Similarity.adaptiveProbeRadius(e.count())
      Stage.write(Similarity.lshItemBuckets(e, "vec_id", "vec",
        numPlanes = 6, numTables = 16), dir, "x11_item_buckets")
      Stage.write(Similarity.lshProbeBuckets(q, "vec_id", "vec",
        numPlanes = 6, numTables = 16, probeRadius = radius),
        dir, "x11_probe_buckets")
      Similarity.lshTopK(e, "vec_id", "vec", q, "vec_id", "vec", k = 10,
        numPlanes = 6, numTables = 16, probeRadius = radius)
        .orderBy(col("query_id"), col("rank"))
    }),
    // x13: IVF ANN. The item→centroid assignments and the nProbe bucket
    // probes (the engine-specific k-means half) are STAGED; the bucket
    // join + exact-cosine top-k ranking is oracle-checked in DuckDB
    // against the same embeddings (recall vs brute force additionally
    // locked by DedupSimilaritySpec)
    // x51: product-quantization ANN (the memory-bounded billion-vector
    // path): per-subspace codebooks + integer codes staged; ADC recalls a
    // top-C candidate pool from the broadcast query↔centroid sub-distance
    // table, then the final k are picked by EXACT re-rank on the original
    // vectors (IVFADC+R — compressed-domain ranks alone recall ~0.06 on
    // near-random embeddings). All float folds are sequential in a
    // defined order (dims, then subs) so DuckDB re-derives bit-exactly.
    // r14: PRODUCTION parameters m=8 / C=1000 (was m=4 / C=300) — the
    // finer codebook (8 dims per sub, still 16 centroids each) sharpens
    // the ADC ordering and the bigger re-rank pool recovers neighbors
    // the coarse ordering buried: measured 0.90 recall@10 (AnnFrontier,
    // COVERAGE.md). C is corpus-size-independent, so the re-rank cost is
    // FLAT at scale; the staged codebooks/codes carry m, and only the
    // oracle's sub-slice width and pool cutoff mirror the two constants.
    "x51_knn_pq" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val cb = pqCodebooksM(s, dir, 8)
      val codes = graft.engine.CacheScope.persistTracked(
        graft.operators.Pq.encode(e, "vec_id", "vec", cb, dim = 64, m = 8))
      Stage.write(cb, dir, "x51_codebooks")
      Stage.write(codes, dir, "x51_codes")
      graft.operators.Pq.topKRerank(codes, cb, e, "vec_id", "vec",
        q, "vec_id", "vec", k = 10, dim = 64, m = 8, candMult = 100)
        .withColumn("d2", graft.functions.EngineMath.roundAway(col("d2"), 6))
        .orderBy(col("query_id"), col("rank"))
    }),
    // x52: the COMPOSED three-level ANN (IVF coarse pruning × PQ ADC
    // fine scoring × exact re-rank of the ADC top-C) — candidates are
    // each query's probed buckets, scored by ADC over integer codes,
    // finalists re-scored on original vectors. All three engine-specific
    // tables staged; DuckDB re-derives the restricted ranking bit-exactly.
    // r14: PRODUCTION parameters K ∝ N / nProbe = K/2 / m=8 / C=1000
    // (was K=8 / nProbe=3 / m=4 / C=300) — measured 0.90 recall@10
    // (AnnFrontier, COVERAGE.md). The staged candidate table carries the
    // IVF geometry, codebooks/codes carry m; the oracle mirrors only the
    // sub-slice width and pool cutoff.
    "x52_knn_ivfpq" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val (centroids, nProbe) = scaledIvf(s, dir)
      val cand = graft.engine.CacheScope.persistTracked(
        graft.operators.Ivf.assign(e, "vec_id", "vec", centroids)
          .join(graft.operators.Ivf
            .assignProbes(q, "vec_id", "vec", centroids, nProbe = nProbe)
            .select(col("query_id"), col("centroid_id")), Seq("centroid_id"))
          .select(col("query_id"), col("id")))
      val cb = pqCodebooksM(s, dir, 8)
      val codes = graft.engine.CacheScope.persistTracked(
        graft.operators.Pq.encode(e, "vec_id", "vec", cb, dim = 64, m = 8))
      Stage.write(cand, dir, "x52_cand")
      Stage.write(cb, dir, "x52_codebooks")
      Stage.write(codes, dir, "x52_codes")
      graft.operators.Pq.topKWithinRerank(cand, codes, cb, e, "vec_id",
        "vec", q, "vec_id", "vec", k = 10, dim = 64, m = 8, candMult = 100)
        .withColumn("d2", graft.functions.EngineMath.roundAway(col("d2"), 6))
        .orderBy(col("query_id"), col("rank"))
    }),
    // r14: PRODUCTION geometry K ∝ N / nProbe = K/2 (was K=8/nProbe=3):
    // constant expected bucket size keeps the probed fraction's COST
    // flat as the corpus grows while the finer partition stops splitting
    // true neighborhoods — measured 0.96 recall@10 at sf0.1 (AnnFrontier,
    // COVERAGE.md; the K=8 point stays in the frontier as reference).
    // maxIter 5: converged enough for bucketing at ~40% of the fit cost.
    // The staged assignment/probe tables carry the geometry, so the
    // oracle is parameter-agnostic.
    "x13_knn_ivf" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val (centroids, nProbe) = scaledIvf(s, dir)
      Stage.write(graft.operators.Ivf.assign(e, "vec_id", "vec", centroids),
        dir, "x13_item_assign")
      Stage.write(graft.operators.Ivf
        .assignProbes(q, "vec_id", "vec", centroids, nProbe = nProbe)
        .select(col("query_id"), col("centroid_id")), dir, "x13_probes")
      graft.operators.Ivf.topK(e, "vec_id", "vec", q, "vec_id", "vec",
        k = 10, centroids, nProbe = nProbe)
        .orderBy(col("query_id"), col("rank"))
    }),
    // x12: multimodal binary-column pipeline — partition-batched decode
    // (STUBBED codec, real plumbing; graft.multimodal)
    "x12_multimodal_decode" -> ((s, dir) =>
      graft.multimodal.Multimodal
        .decodePipeline(s, table(s, dir, "documents"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("n_bytes"))
        .orderBy(col("media_id"))),
    // x69: IMAGE near-dup pairs — the PRODUCTION default. Routes through
    // Multimodal.imageNearDupPairs, i.e. the wide 120-bit dHash + wide
    // hamming banding: round 8 measured the old 60-bit default quadratic
    // at any duplicate density (candidates a constant fraction of ALL
    // pairs), so round 9 made the scale-safe signature the default
    // surface. The 60-bit path survives only as the documented
    // counter-example (MultimodalSpec pins the candidate-volume gap).
    // The oracle re-derives the ENTIRE wide pipeline independently:
    // 132-cell byte-grid downsample, per-row gradient bits, two 60-bit
    // folds, all-pairs summed hamming — the banding is an engine
    // optimization; the pair SET is the contract. (x79 keeps the
    // explicitly-named wide path as the structural A/B measurement pin
    // from BASELINE.md §10×; x69 is the default-surface routing of the
    // same contract.)
    "x69_image_dhash" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.toMedia(
        graft.multimodal.Multimodal.mediaTable(table(s, dir, "documents")))
      graft.multimodal.Multimodal.imageNearDupPairs(media, maxDist = 14)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x79: the x69 STRUCTURAL SCALE FIX — same image near-dup search at
    // the same absolute bound (hamming ≤ 14) over a 120-bit two-long
    // dHash (11×12 grid). Twice the signature bits at the same bound
    // doubles every pigeonhole band's key entropy (~15 key bits vs
    // ~7.5), so bucket occupancy — and with it candidate volume, which
    // the 60-bit scheme measured as a constant fraction of ALL pairs —
    // shrinks by ~2^7.5. Oracle re-derives the whole pipeline: 132-cell
    // byte grid, per-row gradient bits, two 60-bit folds, all-pairs
    // summed hamming (the banding is an engine optimization; the pair
    // SET is the contract).
    "x79_image_dhash_wide" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.toMedia(
        graft.multimodal.Multimodal.mediaTable(table(s, dir, "documents")))
      val dh = graft.engine.CacheScope.persistTracked(
        graft.multimodal.Multimodal.dhashTableWide(media))
      Dedup.simhashPairsOfWide(dh, maxDist = 14)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x102: MP4 sample-table walker, oracle-gated end to end. Per document
    // a structurally-real ISO-BMFF container is SYNTHESIZED from pure
    // integer arithmetic over (doc_id, text) (Mp4.synthesize: real stsd/
    // stsz/stsc/stco/stss boxes, 2-chunk layout, every-3rd-sample stss),
    // then PARSED back by the independent walker (Mp4.parse) and the
    // keyframe payloads pulled through the stsz×stsc×stco offset math
    // (Mp4.keyframeBytes). The oracle re-derives every output column —
    // dims, sample count, keyframe count/bytes, and the keyframe payload
    // BYTE SUM (mdat byte j = text byte j % len, so ord() over text
    // reconstructs the payload without touching a BLOB) — from the same
    // arithmetic. Generation and parsing are independent code paths; the
    // hash breaks if either drifts. Per-row map, no shuffle — pipelines
    // with the scan at any scale.
    "x102_mp4_keyframes" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Mp4
      table(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .filter(_._2.nonEmpty)
        .map { case (docId, text) =>
          val blob = Mp4.synthesize(docId, text.getBytes("UTF-8"))
          val t = Mp4.parse(blob)
          val kfs = t.keyframes
          val kfByteSum = kfs.iterator.flatMap(k =>
            Mp4.keyframeBytes(blob, k).iterator).map(b => (b & 0xff).toLong).sum
          (docId, t.codec, t.width, t.height, t.sampleCount.toLong,
            kfs.length.toLong, kfs.map(_.size.toLong).sum, kfByteSum)
        }
        .toDF("media_id", "codec", "width", "height", "n_samples",
          "n_keyframes", "kf_bytes_total", "kf_byte_sum")
        .orderBy(col("media_id"))
    }),
    // x20: tumbling-window streaming aggregate (actual readStream +
    // AvailableNow + memory sink); oracle = the batch-equivalent SQL
    "x20_stream_tumbling" -> ((s, dir) =>
      graft.streaming.StreamOps
        .tumblingAggStreaming(s, s"$dir/events.parquet", "1 hour")
        .orderBy(col("window_start"), col("event_type"))),
    // x21: batch sessionization (gaps-and-islands, 30-min gap)
    "x21_sessionize_batch" -> ((s, dir) =>
      graft.streaming.StreamOps
        .sessionizeBatch(Tables.events(s, dir), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_seq"))),
    // x22: streaming sessionization via flatMapGroupsWithState (rows-only;
    // equality with the batch result is locked by StreamingSpec)
    "x22_stream_sessionize" -> ((s, dir) =>
      graft.streaming.StreamOps
        .sessionizeStreaming(s, s"$dir/events.parquet", gapMinutes = 30)
        .orderBy(col("user_id"), col("session_seq"))),
    // x23: incremental cube maintenance — foreachBatch upsert with dynamic
    // partition overwrite (replaces the reference's full rebuild,
    // update_olap.sh:12-16); oracle = the batch aggregate over all events
    "x23_incremental_cube" -> ((s, dir) => {
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-x23-${new java.io.File(dir).getName}")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(tmp) // fresh maintenance run per invocation
      graft.streaming.StreamOps.incrementalCubeMaintenance(s,
        s"$dir/events.parquet", s"$tmp/cube", s"$tmp/ckpt")
      graft.streaming.StreamOps.readCube(s, s"$tmp/cube")
        .select(col("day"), col("event_type"), col("n"),
          graft.functions.EngineMath.roundAway(col("value_sum"), 2).as("value_sum"))
        .orderBy(col("day"), col("event_type"))
    }),
    // x26: APPROX quality quantiles per language — the scale path for x16:
    // percentile_approx is a bounded-memory mergeable sketch (one partial
    // agg pass, no per-group sort/collect), the right call at 100 TB where
    // exact `percentile` must buffer each group. Oracle: with accuracy
    // 10000 ≫ group size the GK summary retains every sample (compression
    // needs g_i + g_{i+1} + Δ ≤ 2·n/10000 < 2, impossible with g ≥ 1), so
    // the query returns EXACTLY the ceil(q·n)-th order statistic — which
    // DuckDB selects directly by row_number. The error bound of the truly
    // lossy regime is additionally locked by TextFunctionsSpec.
    "x26_quantiles_approx" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val q = toks.select(
        TextFunctions.langIdOf(col("ts")).as("lang"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"))
      // the order-statistic oracle is valid only while the GK summary is
      // lossless, i.e. every group stays under the accuracy — fail loudly
      // instead of letting a bigger corpus surface as a baffling oracle
      // mismatch (the sketch would be within-error but not exact). Gated on
      // Stage.enabled (the Verify runner): Bench and production runs keep
      // percentile_approx's approximate-but-in-bounds behavior — the guard
      // protects only the EXACTNESS claim the oracle compare depends on,
      // and it costs an extra driver-side job that doesn't belong in a
      // timed or production plan.
      if (graft.Stage.enabled) {
        val maxGroup = q.groupBy(col("lang")).count()
          .agg(max(col("count"))).collect().head.getLong(0)
        require(maxGroup < 10000,
          s"x26 oracle needs every language group < accuracy 10000 rows for " +
            s"GK exactness; largest group has $maxGroup — raise the accuracy")
      }
      q.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        percentile_approx(col("q"), array(lit(0.25), lit(0.5), lit(0.75)),
          lit(10000)).as("qs"))
        .select(col("lang"), col("n"),
          col("qs").getItem(0).as("q25"),
          col("qs").getItem(1).as("q50"),
          col("qs").getItem(2).as("q75"))
        .orderBy(col("lang"))
    }),
    // x27: deterministic stratified sampling + train/val/test split via
    // md5-threshold tickets (operators/Sampling) — reproducible across
    // engines/reruns/repartitioning; the DuckDB oracle computes the
    // IDENTICAL selection, which no RNG-based sample could match
    // x48: WEIGHTED sampling without replacement (Efraimidis–Spirakis) —
    // importance/temperature sampling over a per-row weight (here token
    // count: longer documents proportionally likelier). Deterministic
    // 48-bit md5 ticket → identical draw in DuckDB; ranks rounded for the
    // float gate, ordering computed on the unrounded value in both engines
    // x50: corpus-LM quality scoring — the CCNet-style quality-filter
    // signal as an honest in-engine unigram proxy: pass 1 aggregates
    // corpus term counts (the Zipf head, count >= floor, broadcasts;
    // the tail scores AT the floor, so the broadcast stays small at any
    // corpus size), pass 2 scores every document by its mean token
    // log-probability. Two deliberate scans — the stats table is a
    // maintained artifact in a real pipeline, not a per-query subtree
    // (and sharing one scan would re-trip the double-reference cache
    // trap). FP determinism: per-doc log-probs re-assemble in TOKEN
    // ORDER (sort_array over (pos, lp)) and fold sequentially, the same
    // adds in the same order DuckDB's list_reduce performs.
    "x50_unigram_logprob" -> ((s, dir) => {
      val minCount = 3
      val docs = table(s, dir, "documents")
      def toks(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
      val counts = toks(docs).groupBy(col("term")).agg(count(lit(1)).as("c"))
      val vocab = counts.filter(col("c") >= minCount)
      val nTotal = counts.agg(sum(col("c"))).collect().head.getLong(0)
      toks(docs)
        .join(broadcast(vocab), Seq("term"), "left")
        .withColumn("lp", log(
          coalesce(col("c"), lit(minCount.toLong)).cast("double") /
            lit(nTotal.toDouble)))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("lps"))
        .select(col("doc_id"),
          size(col("lps")).cast("long").as("n_tokens"),
          graft.functions.EngineMath.roundAway(
            aggregate(transform(col("lps"), x => x("lp")), lit(0.0d),
              (a, v) => a + v) / size(col("lps")), 4).as("lm_score"))
        .orderBy(col("doc_id"))
    }),
    // x53: corpus DRIFT detection — add-1-smoothed unigram KL divergence
    // between two corpus snapshots (even doc_ids = reference, odd = new
    // crawl): the "did the incoming data shift the token distribution"
    // gate a refresh pipeline runs before accepting a drop. Exact-count
    // aggregations; the final Σ p·ln(p/q) folds in TERM order (binary
    // string sort, identical in DuckDB) so the scalar compares exactly.
    // The deterministic global fold is the ORACLE shape; production at a
    // billion-term vocab would tree-sum contributions and accept FP
    // reorder on the monitoring metric.
    "x53_corpus_drift" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      def counts(parity: Int) = docs.filter(col("doc_id") % 2 === parity)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      val joined = counts(0).withColumnRenamed("c", "ca")
        .join(counts(1).withColumnRenamed("c", "cb"), Seq("term"), "full_outer")
        .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      val t = joined.agg(count(lit(1)).as("v"), sum(col("ca")).as("na"),
        sum(col("cb")).as("nb")).collect().head
      val (v, na, nb) = (t.getLong(0), t.getLong(1), t.getLong(2))
      val p = (col("ca") + lit(1.0)) / lit((na + v).toDouble)
      val q = (col("cb") + lit(1.0)) / lit((nb + v).toDouble)
      joined
        .select(col("term"), (p * log(p / q)).as("contrib"))
        .agg(sort_array(collect_list(struct(col("term"), col("contrib"))))
          .as("cs"))
        .select(lit(v).as("vocab_size"), lit(na).as("n_ref"), lit(nb).as("n_new"),
          graft.functions.EngineMath.roundAway(
            aggregate(transform(col("cs"), x => x("contrib")), lit(0.0d),
              (a, x) => a + x), 6).as("kl_ref_new"))
    }),
    // x54: SemDeDup semantic near-duplicate pairs — k-means clusters
    // (engine-specific half, STAGED as the assignment table) restrict the
    // quadratic cosine scan to within-cluster pairs; the oracle re-derives
    // every within-cluster pair + cosine from the staged assignments in
    // DuckDB. The exact all-pairs twin is x09; this is its scale path —
    // and BOTH scale guards are wired: K ∝ N (SemDedup.scaledK, the
    // published SemDeDup shape — fixed K would make the scan N²/K =
    // quadratic on ANY corpus) and the over-dense-cluster cap
    // (cappedAssignments, observe-logged drops). The STAGED frame is the
    // capped assignment, so the oracle sees exactly the clusters the
    // engine scanned. Work: N·target/2 pair candidates — linear in N.
    "x54_semantic_pairs" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val k = graft.operators.SemDedup.scaledK(e.count())
      val centroids = semCentroids(s, dir, k)
      val assign = graft.engine.CacheScope.persistTracked(
        graft.operators.SemDedup.cappedAssignments(
          graft.operators.SemDedup.assign(e, "vec_id", "vec", centroids),
          cap = graft.operators.SemDedup.defaultClusterCap))
      Stage.write(assign, dir, "x54_assign")
      graft.operators.SemDedup.semanticPairs(e, "vec_id", "vec", assign,
        threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x55: count-min-sketch heavy hitters — the sketch folds the token
    // stream into a fixed 4×512 long matrix via the typed mergeable
    // Aggregator (map-side partial aggregation: only 16 KB arrays shuffle,
    // never tokens); the top-20-by-exact-count candidates then read their
    // estimates from the collected sketch (one row — collected rather than
    // cross-joined so the candidate plan never references the token table
    // twice; the a17/x42 double-reference lesson). The oracle rebuilds the
    // ENTIRE sketch independently in DuckDB (cells = tokens grouped by
    // (row, md5 bucket); est = min over rows) — est must match cell-exactly,
    // and est >= n is the CMS overcount guarantee.
    "x55_cms_heavy_hitters" -> ((s, dir) => {
      val toksT = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("term")))
      val sk = toksT
        .agg(graft.functions.CountMin.sketchUdaf(CmsDepth, CmsWidth)(col("term")).as("sk"))
        .collect().head.getAs[scala.collection.Seq[Long]]("sk")
      cmsTop20(toksT, sk.toSeq)
    }),
    // x56: bloom-pruned decontamination — identical INPUTS and OUTPUT to
    // x40 (same oracle SQL): the corpus gram stream is pre-filtered by a
    // broadcast BloomFilter of the benchmark grams before the exact join,
    // the shape for benchmark sets too big to broadcast exactly. Equality
    // with the exact path IS the gate (bloom admits no false negatives;
    // the exact join removes its false positives).
    "x56_bloom_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.operators.Dedup.contaminationScanBloom(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 5)
        .orderBy(col("doc_id"))
    }),
    // x57: content-defined chunking — boundaries where the md5 ticket of
    // the trailing token window lands in 1/16 of hash space, so chunk
    // edges survive insertions (the rsync/FastCDC property; ChunkingSpec
    // pins shift-invariance). Fully SQL-expressible: DuckDB re-derives
    // every boundary from the same md5.
    "x57_cdc_chunk" -> ((s, dir) =>
      graft.operators.Chunking.chunkByContent(
        table(s, dir, "documents"), "doc_id", "text",
        window = 3, divisor = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    // x60: repeated-span accounting (the token-level exact-substring
    // duplication signal of "Deduplicating Training Data Makes LMs
    // Better"): per document, how many of its 8-token spans occur ≥2
    // times corpus-wide. ONE linear plan like x42: positional k-grams →
    // per-(doc,gram) counts → corpus totals as a gram-window sum — no
    // self-join, no second scan. At scale the gram key would be
    // xxhash64'd to 8-byte shuffle keys (the x06 trick); the skew-heavy
    // boilerplate gram concentrates one window partition → salt as in
    // operators/Skew.
    "x60_repeated_spans" -> ((s, dir) => {
      val k = 8
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= k)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("ts")) - (k - 1)),
          i => array_join(slice(col("ts"), i, lit(k)), " "))).as("gram"))
      val perDoc = grams.groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("c"))
      val wG = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
      perDoc.withColumn("tot", sum(col("c")).over(wG))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_spans"),
          sum(when(col("tot") >= 2, col("c")).otherwise(lit(0L))).as("n_repeated"))
        .select(col("doc_id"), col("n_spans"), col("n_repeated"),
          graft.functions.EngineMath.roundAway(
            col("n_repeated") / col("n_spans"), 4).as("repeated_frac"))
        .orderBy(col("doc_id"))
    }),
    // x61: STREAM-maintained count-min sketch — per-micro-batch sketches
    // merged by element-wise sum (CMS merge is exact), scored with the
    // same top-20 candidate read as x55 and gated by the SAME oracle:
    // stream-merge ≡ batch build is the claim, and DuckDB's independent
    // sketch rebuild is the judge.
    "x61_stream_cms" -> ((s, dir) => {
      val skDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-cms-${Integer.toHexString(dir.hashCode)}-" +
          ProcessHandle.current().pid()).toString
      val sk = graft.streaming.StreamOps.sketchStream(
        s, s"$dir/documents.parquet", "text", CmsDepth, CmsWidth, skDir)
      cmsTop20(table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term")), sk.toSeq)
    }),
    // x62: cross-source duplication MATRIX — who duplicates whom: near-dup
    // pairs from the banded MinHash scale path, joined to each side's
    // source and aggregated per unordered source pair (least/greatest
    // canonicalization). The contamination-audit view a multi-source
    // corpus runs before setting mixture weights. Pairs staged; DuckDB
    // re-derives the matrix from them + the documents table.
    "x62_source_dup_matrix" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val pairs = graft.engine.CacheScope.persistTracked(
        Dedup.minhashPairs(d, "doc_id", "text", k = 3, threshold = 0.8))
      Stage.write(pairs.select(col("id_a"), col("id_b")), dir, "x62_pairs")
      val src = d.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          Seq("id_b"))
        .select(least(col("sa"), col("sb")).as("source_x"),
          greatest(col("sa"), col("sb")).as("source_y"))
        .groupBy(col("source_x"), col("source_y"))
        .agg(count(lit(1)).as("n_dup_pairs"))
        .orderBy(col("source_x"), col("source_y"))
    }),
    // x63: quality-decile CURRICULUM map — documents ntile'd by the x03
    // quality score (total order: score, then doc_id), per-decile count,
    // score range, token mass. The exact ntile assignment is closed-form
    // off a global rank (Ranks.ntileOfRank), and the rank itself is the
    // x113 bucket-prefix-sum device keyed by floor(q·1024) — monotone in
    // q, so bucket order ≡ score order and NO rows-scale one-task sort
    // survives in the plan. The DuckDB oracle keeps the naive ntile(10),
    // so the hash match proves the decomposition is lossless.
    "x63_quality_deciles" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val q = toks.select(col("doc_id"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"),
        size(col("ts")).as("n_tokens"))
      graft.operators.Ranks.globalRowNumber(q,
          floor(col("q") * lit(1024.0)),
          Seq(col("q").asc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(q.agg(count(lit(1)).as("nn"))))
        .withColumn("decile",
          graft.operators.Ranks.ntileOfRank("rk", "nn", 10).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("q")).as("q_lo"), max(col("q")).as("q_hi"),
          sum(col("n_tokens")).as("tokens_total"))
        .orderBy(col("decile"))
    }),
    // x64: feature-hashing (hashing-trick) TF vectorizer — tokens hashed
    // into a fixed 64-dim count vector, L2-normalized: the vocabulary-free
    // text→vector bridge (Weinberger et al. 2009) that feeds embedding
    // operators (x09-x13 ANN, x54 semantic dedup) without a fitted vocab.
    // Scale shape: explode → per-(doc,bucket) count → per-doc dense
    // rebuild — two hash aggregates, no vocabulary table, no fit; dim is
    // a constant so row width is bounded. Bucket hash = the CountMin md5
    // bucket (row 0), so DuckDB re-derives every vector exactly.
    // Output is the exploded (doc_id, dim_idx, weight) triple form — the
    // natural sparse exchange shape for a TF matrix, and hashable by any
    // comparator (an array<double> column is not).
    "x64_hashed_tf" -> ((s, dir) => {
      val dim = 64
      graft.functions.GraftFunctions.ensureRegistered(s)
      val b = table(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .select(col("doc_id"),
          graft.functions.CountMin.bucketCol(0, col("term"), dim).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val m = b.groupBy(col("doc_id"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("b"), col("c")))))
          .as("m"))
      val counts = transform(sequence(lit(0L), lit((dim - 1).toLong)),
        i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
      m.select(col("doc_id"), counts.as("cs"))
        // hoist the norm OUT of the per-element lambda: inside it the dot
        // product would re-evaluate per dimension (64 x 64 multiplies per
        // doc instead of 64 — measured as the query's hot spot)
        .select(col("doc_id"), col("cs"),
          sqrt(call_function("graft_dot", col("cs"), col("cs"))).as("nrm"))
        .select(col("doc_id"),
          transform(col("cs"), x => graft.functions.EngineMath.roundAway(
            x / col("nrm"), 6)).as("vec"))
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("dim_idx", "weight")))
        .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"),
          col("weight"))
        .orderBy(col("doc_id"), col("dim_idx"))
    }),
    // x65: the round-5 CURATION CAPSTONE — the operators composed the way
    // a real corpus release runs them: quality gate (x03 score ≥ 0.55) →
    // exact dedup keep-min-id (x05) → benchmark decontamination drop
    // (x40) → domain-mixture temperature sampling (x58, α=0.5, k=100).
    // Every stage is deterministic, so the whole pipeline is one DuckDB
    // oracle. Stage boundaries are separate scans by design — each stage
    // output is a maintained artifact in a real pipeline.
    "x65_curation_pipeline" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = docs.select(col("doc_id"), col("source"), col("text"),
        TextFunctions.tokens(col("text")).as("ts"))
      val scored = toks.select(col("doc_id"), col("source"), col("text"),
        size(col("ts")).cast("long").as("n_tokens"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"))
        .filter(col("q") >= 0.55)
      val deduped = Dedup.exactDeduplicate(scored, "doc_id", "text")
      val corpus = deduped.filter(col("doc_id") % 50 =!= 0)
      val flagged = Dedup.contaminationScan(corpus,
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 5)
        .select(col("doc_id"))
      val clean = corpus.join(flagged, Seq("doc_id"), "left_anti")
      graft.operators.Sampling.temperatureMix(
        clean.select(col("doc_id"), col("source"), col("n_tokens"), col("q")),
        "doc_id", "source", alpha = 0.5, k = 100)
        .orderBy(col("doc_id"))
    }),
    // x66: LINE-level global dedup + document reassembly (CCNet paragraph
    // dedup / C4 line dedup): fixed 12-token lines, a line hash seen in
    // >1 distinct documents is boilerplate and drops from EVERY document,
    // survivors reassemble in order. Bounded-shuffle shape (two hash
    // aggregates + an anti-join against the small boilerplate set) — the
    // sub-document pass document-level dedup (x05) cannot perform.
    // Output hashes the rebuilt text so rows stay narrow.
    "x66_line_dedup" -> ((s, dir) =>
      Dedup.lineDeduplicate(table(s, dir, "documents"), "doc_id", "text",
        lineTokens = 12, maxDocFreq = 1)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy(col("doc_id"))),
    // x68: DSIR importance weighting (hashed-feature domain selection):
    // every document scored by Σ_b c_doc(b)·[ln p̂_target(b) − ln p̂_raw(b)]
    // over 64 md5 unigram buckets (x64's bucket hash), target = src0,
    // add-1 smoothing over the full bucket spine; deterministic top-200
    // by weight is the engine-portable resample step. Per-doc fold runs
    // in bucket order (x50 contract) so the score is bit-identical in
    // DuckDB and the selection boundary cannot flip.
    "x68_dsir_weights" -> ((s, dir) =>
      graft.operators.Sampling.dsirWeights(table(s, dir, "documents"),
        "doc_id", "text", isTarget = col("source") === "src0", dim = 64)
        .orderBy(col("weight").desc, col("id").asc).limit(200)
        .select(col("id").as("doc_id"),
          graft.functions.EngineMath.roundAway(col("weight"), 4).as("weight"))
        .orderBy(col("doc_id"))),
    // x70: MODEL-based quality filter — logistic regression fit on the
    // engine's own quality features (target = src0 vs the corpus), every
    // doc scored by the linear logit (monotone to sigmoid; exp() is not
    // bit-portable, a left-associated w·x chain is). Features re-derive
    // independently in DuckDB (the x03 CTEs); only the fitted weights
    // stage (the x13 staged-model contract). Top-100 by logit.
    "x70_quality_model" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val model = graft.operators.Fitted.getOrFit(s,
        graft.operators.Fitted.key(dir, "qlr",
          "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
        graft.operators.QualityFilter.fit(docs, "doc_id", "text",
          isTarget = col("source") === "src0")
      }
      Stage.write(model, dir, "x70_weights")
      graft.operators.QualityFilter.logits(docs, "doc_id", "text", model)
        .orderBy(col("logit").desc, col("id").asc).limit(100)
        .select(col("id").as("doc_id"),
          graft.functions.EngineMath.roundAway(col("logit"), 6).as("logit"))
        .orderBy(col("doc_id"))
    }),
    // x71: the ROUND-6 CURATION COMPOSITION — the new operators chained
    // the way a corpus release uses them: model-based quality gate (x70
    // logit, top 400) → line-level boilerplate dedup with reassembly
    // (x66) → DSIR importance selection (x68) computed over the CLEANED
    // text (dedup feeds selection — the stages genuinely compose, the
    // downstream distributions shift with the upstream edits). One DuckDB
    // oracle re-derives all three stages; only the LR weights stage.
    "x71_curation_v2" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val model = graft.operators.Fitted.getOrFit(s,
        graft.operators.Fitted.key(dir, "qlr",
          "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
        graft.operators.QualityFilter.fit(docs, "doc_id", "text",
          isTarget = col("source") === "src0")
      }
      Stage.write(model, dir, "x71_weights")
      val gated = graft.operators.QualityFilter
        .logits(docs, "doc_id", "text", model)
        .orderBy(col("logit").desc, col("id").asc).limit(400)
        .select(col("id").as("doc_id"))
      val survivors = docs.join(gated, Seq("doc_id"))
      val cleaned = Dedup.lineDeduplicate(survivors, "doc_id", "text",
          lineTokens = 12, maxDocFreq = 1)
        .filter(col("n_kept") >= 1)
        .select(col("id").as("doc_id"), col("n_kept"), col("clean_text"))
      val withSrc = cleaned.join(docs.select(col("doc_id"), col("source")),
        Seq("doc_id"))
      graft.operators.Sampling.dsirWeights(withSrc, "doc_id", "clean_text",
          isTarget = col("source") === "src0")
        .orderBy(col("weight").desc, col("id").asc).limit(150)
        .select(col("id").as("doc_id"),
          graft.functions.EngineMath.roundAway(col("weight"), 4).as("weight"))
        .join(cleaned.select(col("doc_id"), col("n_kept")), Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),
    // x72: corpus SNAPSHOT DIFF — the refresh-audit pass a pipeline runs
    // before accepting a new crawl drop: partition content by the x04/x05
    // exact fingerprint, classify every distinct content as added /
    // removed / kept between the old (even ids) and new (odd ids)
    // snapshots, with doc counts per side. Full-outer join of two
    // fingerprint aggregates — two hash shuffles on a 16-byte key,
    // corpus-size-proof.
    "x72_snapshot_diff" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      def side(parity: Int, name: String) =
        docs.filter(col("doc_id") % 2 === parity)
          .select(TextFunctions.fingerprint(col("text")).as("fp"))
          .groupBy(col("fp")).agg(count(lit(1)).as(name))
      side(0, "n_old").join(side(1, "n_new"), Seq("fp"), "full_outer")
        .select(
          when(col("n_old").isNull, "added")
            .when(col("n_new").isNull, "removed")
            .otherwise("kept").as("status"),
          col("n_old"), col("n_new"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_contents"),
          sum(coalesce(col("n_old"), lit(0L))).as("n_docs_old"),
          sum(coalesce(col("n_new"), lit(0L))).as("n_docs_new"))
        .orderBy(col("status"))
    }),
    // x73: INTRA-document repetition signals (the Gopher repetition
    // rules — see operators/Repetition for the semantics + scale shape)
    "x73_repetition" -> ((s, dir) =>
      graft.operators.Repetition.signals(
        table(s, dir, "documents"), "doc_id", "text")),
    // x74: cross-document EXACT SUBSTRING dedup (Lee et al. 2022 — see
    // operators/SubstringDedup for semantics + scale shape): duplicated
    // 8-gram spans island-merged per doc, cut out, survivors reassembled
    "x74_substring_dedup" -> ((s, dir) =>
      graft.operators.SubstringDedup.dedup(
        table(s, dir, "documents"), "doc_id", "text")),
    // x75: first-touch funnel over the event stream (see
    // operators/EventAnalytics) — min-timestamp chains make the stage
    // counts deterministic and exactly re-derivable in SQL
    "x75_funnel" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),
    // x76: day-granular cohort retention (first-activity cohorts ×
    // day offsets 0..7)
    "x76_retention" -> ((s, dir) =>
      graft.operators.EventAnalytics.retention(Tables.events(s, dir),
        "user_id", "ts", maxOffset = 7)),
    // x77: the x75 funnel as an ACTUAL streaming query (AvailableNow
    // drain, O(1)/user state) — oracle: the batch-equivalent SQL
    "x77_stream_funnel" -> ((s, dir) =>
      graft.streaming.StreamOps.funnelStreaming(s, s"$dir/events.parquet",
        Seq("view", "click", "purchase"))),
    // x78: the conversion-window funnel — stage i within 12h of stage
    // i-1's first completion (first-touch chain, so a missed window is
    // a stall, the standard product-analytics semantics)
    "x78_funnel_windowed" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinMinutes = Some(720))),
    // x80: multi-touch attribution — last-touch and linear credit of
    // purchase value to preceding view/click touches within 72 h.
    // Fractional credits round half-away to 6 digits and accumulate as
    // DECIMAL(18,6) on BOTH engines, so the sums are order-independent
    // and hash-exact (the cube money-sum trick).
    "x80_attribution" -> ((s, dir) =>
      graft.operators.EventAnalytics.attribution(Tables.events(s, dir),
        "user_id", "event_type", "ts", "value", "event_id",
        Seq("view", "click"), "purchase", lookbackHours = 72)),
    // x81: APPROXIMATE distinct via mergeable HLL sketches (Datasketches,
    // built into Spark) — the 100 TB distinct-count path: per-group
    // sketches build map-side, union associatively across partitions /
    // batches / days without re-scanning, estimate at read time. The
    // engine-specific estimates are STAGED; the oracle re-derives the
    // exact counts and the accuracy gate in SQL, so the green row proves
    // "every estimate within 5% of truth AND the merged union consistent
    // with per-type sketches" — not merely that the query ran.
    "x81_hll_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val perType = graft.engine.CacheScope.persistTracked(
        ev.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sk")))
      val est = perType
        .select(col("event_type"), hll_sketch_estimate(col("sk")).as("n_est"))
        .unionByName(perType
          .agg(hll_union_agg(col("sk")).as("sk"))
          .select(lit("ALL").as("event_type"),
            hll_sketch_estimate(col("sk")).as("n_est")))
      Stage.write(est, dir, "x81_estimates")
      val exact = ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_exact"))
        .unionByName(ev.select(lit("ALL").as("event_type"), col("user_id"))
          .groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("n_exact")))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("n_est"),
          (abs(col("n_est") - col("n_exact")) <=
            col("n_exact").cast("double") * 0.05).as("within_5pct"))
        .orderBy(col("event_type"))
    }),
    // x82: top-k session paths — sessionize (the x21 gap rule), ordered
    // event-type concat per session, path frequency, deterministic top-k
    "x82_session_paths" -> ((s, dir) =>
      graft.operators.EventAnalytics.sessionPaths(Tables.events(s, dir),
        gapMinutes = 30, k = 20)),
    // x83: event-rate anomaly detection — hourly (type, bucket) counts
    // vs a trailing-24h baseline, |z| > 3 flags; integer window sums make
    // the float z-test hash-exact across engines
    "x83_rate_anomaly" -> ((s, dir) =>
      graft.operators.EventAnalytics.rateAnomalies(Tables.events(s, dir),
        trailing = 24, z = 3.0)),
    // x84: stream-STREAM interval join (click attribution as two live
    // streams) — both sides watermarked, the join condition time-bounded,
    // so buffered state evicts at the watermark horizon; the AvailableNow
    // drain equals the batch interval join the oracle re-derives
    "x84_stream_interval_join" -> ((s, dir) =>
      graft.streaming.StreamOps.intervalJoinStreaming(s,
        s"$dir/events.parquet",
        leftType = "view", rightType = "click", withinMinutes = 30)),
    // x85: BPE merge candidates — adjacent char-pair counts over the
    // word histogram, weighted by word frequency (see operators/Bpe for
    // the two-level 100 TB shape); the full driver-coordinated merge
    // LOOP is spec-gated (BpeSpec)
    "x85_bpe_pairs" -> ((s, dir) =>
      graft.operators.Bpe.pairCounts(table(s, dir, "documents"), "text",
        k = 50)),
    // x86: PageRank over the undirected supplier↔part co-purchase graph
    // (node ids disambiguated by parity) — tick-quantized contributions
    // make every iteration bit-exact across engines (operators/Graph)
    "x86_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", iters = 5, damping = 0.85)),
    // x87: triangle counting over the part co-purchase graph (parts
    // sharing an order) — degree-ordered compact-forward wedge join, the
    // √m-bounded shape (operators/Graph.triangleStats)
    "x87_triangles" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      graft.operators.Graph.triangleStats(
        po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")),
        "u", "v")
    }),
    // x88: ranker evaluation — tie-averaged Mann-Whitney AUC of the x70
    // quality model against its training target. Grouped-by-score rank
    // arithmetic stays integer (2×midrank) until one final division, so
    // the AUC double is bit-exact across engines; the window runs over
    // |distinct scores| grouped rows, not |docs|.
    "x88_model_auc" -> ((s, dir) => {
      val scored = qlrScoredLab(s, dir, "x88_weights")
      val byScore = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      scored.groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
        .withColumn("cb", coalesce(sum(col("n")).over(byScore), lit(0L)))
        // rank products pre-widen to decimal(38,0): np·(2cb+n+1) and
        // p·(p+1) pass 2^63 near ~3e9 rows — BIGINT would wrap silently,
        // decimal overflows loudly (NULL); DuckDB's HUGEINT sums match
        .agg(sum(col("np").cast("decimal(38,0)") *
            (lit(2) * col("cb") + col("n") + lit(1))).as("s2"),
          sum(col("np")).as("p"), sum(col("n")).as("tot"))
        .select(col("p").as("n_pos"), (col("tot") - col("p")).as("n_neg"),
          expr("CAST(s2 - CAST(p AS DECIMAL(38,0)) * (p + 1) AS DOUBLE) / " +
            "CAST(2 * CAST(p AS DECIMAL(38,0)) * (tot - p) AS DOUBLE)")
            .as("auc"))
    }),
    // x89: PMI collocations — pointwise mutual information over adjacent
    // token pairs, the corpus-statistics collocation detector (distinct
    // from x59's conditional bigram LM). Integer counts feed one
    // fixed-order double chain (cab·T·T)/((B·ca)·cb) into ln, so the
    // scores are bit-exact; the cab >= 5 floor prunes the Zipf tail
    // BEFORE the unigram joins.
    "x89_pmi_collocations" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(TextFunctions.tokens(col("text")).as("ts")))
      val uni = toks.select(explode(col("ts")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val cb = toks.filter(size(col("ts")) > 1)
        .select(explode(expr("transform(sequence(1, size(ts) - 1), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
          .as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      val tot = toks.agg(
        sum(size(col("ts"))).cast("double").as("tt"),
        sum(greatest(size(col("ts")) - 1, lit(0))).cast("double").as("bb"))
      cb.withColumn("a", substring_index(col("bg"), " ", 1))
        .withColumn("b", substring_index(col("bg"), " ", -1))
        .join(uni.select(col("t").as("a"), col("c").as("ca")), "a")
        .join(uni.select(col("t").as("b"), col("c").as("cb2")), "b")
        .crossJoin(tot)
        .select(col("bg").as("pair"), col("cab").as("n_occ"),
          graft.functions.EngineMath.roundAway(
            log(col("cab").cast("double") * col("tt") * col("tt") /
              ((col("bb") * col("ca")) * col("cb2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("pair")).limit(50)
    }),
    // x90: data profiling — per-column row/null/distinct counts in ONE
    // pass (a single multi-distinct aggregate; Catalyst plans the Expand,
    // map-side partials bound the shuffle). The 100 TB variant swaps
    // count_distinct for approx_count_distinct / HLL (x81) — exact here
    // because the oracle is exact.
    "x90_profile" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val aggList = count(lit(1)).as("n_rows") +: profileCols.flatMap(c =>
        Seq(count(col(c)).as(s"c_$c"), count_distinct(col(c)).as(s"d_$c")))
      val stackExpr = s"stack(${profileCols.length}, " + profileCols.map(c =>
        s"'$c', n_rows, n_rows - c_$c, d_$c").mkString(", ") +
        ") AS (column_name, n_rows, n_nulls, n_distinct)"
      li.agg(aggList.head, aggList.tail: _*)
        .select(expr(stackExpr))
        .orderBy(col("column_name"))
    }),
    // x91: sorted-neighborhood dedup (window w=5 over a lang-blocked
    // prefix sort — see operators/Snm for the O(n·w) scale shape)
    "x91_snm_pairs" -> ((s, dir) =>
      graft.operators.Snm.pairs(table(s, dir, "documents"),
        "doc_id", "text", blockCol = "lang", w = 5, prefixLen = 24,
        threshold = 0.5)),
    // x93: stream-STATIC broadcast enrichment (B5's dimension join as a
    // live stream) — the dim never streams and never builds state; the
    // oracle is the batch join+aggregate the Complete-mode drain equals
    "x93_stream_enrich" -> ((s, dir) =>
      graft.streaming.StreamOps.enrichedCountStreaming(s,
        s"$dir/events.parquet",
        dim = table(s, dir, "customer"), dimKey = "c_custkey",
        dimAttr = "c_mktsegment")),
    // x94: per-group winsorization — clip n_chars to each lang's
    // [p05, p95] (Spark `percentile` ≡ DuckDB `quantile_cont`, the x16
    // equivalence). One aggregate for the bounds, one broadcast join to
    // apply; no per-row windows.
    "x94_winsorize" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val bounds = docs.groupBy(col("lang")).agg(
        expr("percentile(n_chars, 0.05)").as("lo"),
        expr("percentile(n_chars, 0.95)").as("hi"))
      docs.join(broadcast(bounds), "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          graft.functions.EngineMath.roundAway(
            least(greatest(col("n_chars").cast("double"), col("lo")),
              col("hi")), 4).as("clipped"))
        .orderBy(col("doc_id"))
    }),
    // x95: leave-one-out target encoding — per event, the mean `value`
    // of its event_type EXCLUDING itself ((Σ−own)/(n−1)), the
    // leakage-free categorical encoder. Values quantize to integer
    // micros first (the pagerank tick trick), so the per-type sums are
    // order-independent and the encoder is bit-exact across engines.
    "x95_target_encode" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * lit(1e6) + lit(0.5)).as("vm"))
      val agg = ev.groupBy(col("event_type"))
        .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      ev.join(broadcast(agg), "event_type")
        .filter(col("n") > 1)
        .select(col("event_id"), col("event_type"),
          graft.functions.EngineMath.roundAway(
            (col("s") - col("vm")).cast("double") / lit(1e6) /
              (col("n") - 1).cast("double"), 6).as("loo_mean"))
        .orderBy(col("event_id"))
    }),
    // x96: per-document token entropy — −Σ (c/n)·ln(c/n) over the doc's
    // token distribution, folded in token-sorted order (the x59 ordered
    // fold: both engines add the same IEEE terms in the same sequence)
    "x96_token_entropy" -> ((s, dir) => {
      val tc = table(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      tc.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"),
          sort_array(collect_list(struct(col("t"), col("c")))).as("cs"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(cs, 0.0d, (acc, x) -> " +
              "acc - (CAST(x.c AS DOUBLE) / n) * ln(CAST(x.c AS DOUBLE) / n))"),
            6).as("entropy"))
        .orderBy(col("doc_id"))
    }),
    // x97: deterministic random walks (DeepWalk corpus generation) over
    // the supplier↔part graph — hash-drawn hops, reproducible on any
    // engine/partitioning/retry (operators/Graph.randomWalks)
    "x97_random_walks" -> ((s, dir) =>
      graft.operators.Graph.randomWalks(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", steps = 4)),
    // x98: epoch shuffle + fixed-size sharding — the corpus's deterministic
    // training permutation (operators/Shards: bucketed prefix-sum global
    // rank, no global sort). The oracle IS the naive global row_number over
    // the same ticket order, which is exactly the losslessness gate for
    // the two-level rank.
    "x98_epoch_shards" -> ((s, dir) =>
      graft.operators.Shards.epochShards(
        table(s, dir, "documents").select(col("doc_id")),
        "doc_id", seed = "ep1", shardSize = 100)
        .select(col("doc_id"), col("epoch_rank"), col("shard"), col("pos"))
        .orderBy(col("epoch_rank"))),
    // x99: greedy subword ENCODING with a fixed vocabulary (the apply half
    // of tokenization; x85 is the training half) — per-doc piece count,
    // multi-char piece count, and letter coverage. Linear scan per doc,
    // no shuffle, codegen'd regex; the vocabulary rides in the plan as a
    // literal pattern (at scale: a learned vocab compiles to the same
    // alternation, broadcast-free)
    "x99_vocab_encode" -> ((s, dir) =>
      vocabEncode(table(s, dir, "documents")).orderBy(col("doc_id"))),
    // x100: curriculum-ordered shard assembly — x98's epoch permutation
    // under a quality-band priority (highest band first, ticket-shuffled
    // within each band): the curriculum-learning data layout. The band is
    // PER-ROW (fixed quality thresholds, not a rank/ntile), so the only
    // non-linear stage is still the bounded bands×buckets offset frame.
    // Band arithmetic goes through the 4-decimal integer quantization
    // (floor(q·10⁴+0.5) is exact on both engines; a float q·10 floor
    // would flip at band boundaries).
    "x100_curriculum_shards" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val banded = toks.select(col("doc_id"),
          TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"))
        .withColumn("__qi", floor(col("q") * 10000 + lit(0.5)).cast("long"))
        .withColumn("band", least(lit(9L), expr("__qi div 1000")))
        .select(col("doc_id"), col("band"))
      graft.operators.Shards.curriculumShards(banded, "doc_id",
        col("band"), descending = true, seed = "cu1", shardSize = 100)
        .select(col("doc_id"), col("band"), col("epoch_rank"),
          col("shard"), col("pos"))
        .orderBy(col("epoch_rank"))
    }),
    // x103: source-balanced interleave — the domain-interleaving training
    // order (position 0 of every source, then position 1, …; ticket-
    // shuffled within source). Per-source rank via the x98 bucket-prefix-
    // sum device; the GLOBAL position is closed-form from the tiny
    // per-source size table (pos = Σ min(r, n_s') + same-rank smaller-
    // source count) — no global sort anywhere. The oracle is the naive
    // double row_number, which is exactly the losslessness gate for both
    // the two-level rank AND the closed form.
    "x103_source_interleave" -> ((s, dir) =>
      graft.operators.Shards.interleaveBySource(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", seed = "il1")
        .select(col("doc_id"), col("source"), col("src_rank"), col("pos"))
        .orderBy(col("pos"))),
    // x105: trailing time-INTERVAL window features — per event, the
    // count and value mass of the same user's events in the trailing
    // hour (event-time RANGE frame, not a row frame: peers at the same
    // timestamp are in-frame on both engines by the SQL-standard RANGE
    // rule). The frame is time-bounded so per-row state is bounded at
    // any history length; values ride the x95 micro-quantization so the
    // in-frame sum is integer-exact. One shuffle (user_id), sorted
    // within partition — the canonical sliding-feature shape.
    "x105_trailing_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L) // trailing hour, micros
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 1e6 + lit(0.5)).cast("long").as("vm"))
        .select(col("event_id"), col("user_id"), col("us"),
          count(lit(1)).over(w).as("n_1h"),
          graft.functions.EngineMath.roundAway(
            (sum(col("vm")).over(w)).cast("double") / 1e6, 6).as("v_1h"))
        .orderBy(col("event_id"))
    }),
    // x106: deterministic negative sampling — the contrastive-training
    // "draw K random negatives per anchor" step, retry/engine-stable:
    // slot i's draw is md5('neg:<doc>:<i>') → 48-bit int → mod (N−1),
    // shifted past the anchor itself (exact uniform-excluding-self, no
    // rejection loop). Negatives join back to the corpus for the
    // hard-negative accounting signal (same_source). REQUIRES dense ids
    // 0..N−1 (the corpus contract here); at 100 TB the dense rank comes
    // from the epoch-shard permutation (x98) — the modulo device is
    // unchanged. Independent draws may repeat across slots by design
    // (with-replacement sampling). One explode + one equi-join on neg_id.
    "x106_negative_sampling" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("source"))
      val n = docs.count()
      val drawn = docs
        .select(col("doc_id"), col("source").as("pos_source"),
          explode(expr("sequence(0, 3)")).as("slot"))
        .withColumn("h", conv(substring(md5(concat(lit("neg:"),
          col("doc_id").cast("string"), lit(":"),
          col("slot").cast("string"))), 1, 12), 16, 10).cast("long"))
        .withColumn("cand", col("h") % lit(n - 1))
        .withColumn("neg_id", when(col("cand") >= col("doc_id"),
          col("cand") + 1).otherwise(col("cand")))
      drawn.join(docs.select(col("doc_id").as("neg_id"),
          col("source").as("neg_source")), Seq("neg_id"))
        .select(col("doc_id"), col("slot").cast("long").as("slot"),
          col("neg_id"), col("neg_source"),
          (col("neg_source") === col("pos_source")).as("same_source"))
        .orderBy(col("doc_id"), col("slot"))
    }),
    // x104: deterministic span-corruption masks — the T5/UL2-style
    // "mask ~13% of tokens in ~3-token spans" augmentation, made
    // retry/engine-deterministic: position j starts a span iff
    // md5('sc:<doc>:<j>') < '0c' (lexicographic hex threshold ≈ 4.7%,
    // the x27 md5-threshold device), spans run 3 tokens and MERGE by
    // construction (masked(j) = start at j, j-1, or j-2 — a pure
    // per-position predicate, no fold). Output: span/mask accounting +
    // the corrupted-text fingerprint (spans collapsed to one '<x>'
    // sentinel each). Everything is row-local HOFs over the token array —
    // zero shuffles, pipelines with the scan at any corpus size.
    "x104_span_corruption" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        // 0-based positions; the filter-guard keeps n=0 docs empty
        // (sequence(0,-1) would DESCEND in Spark)
        .withColumn("sq", expr(
          "filter(sequence(0, greatest(size(ts) - 1, 0)), j -> j < size(ts))"))
        .withColumn("st", expr("transform(sq, j -> " +
          "md5(concat('sc:', cast(doc_id as string), ':', cast(j as string))) < '0c')"))
        .withColumn("mk", expr("transform(sq, j -> " +
          "st[j] OR (j >= 1 AND st[j-1]) OR (j >= 2 AND st[j-2]))"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr("size(filter(sq, j -> mk[j] AND NOT (j >= 1 AND mk[j-1])))")
            .cast("long").as("n_spans"),
          expr("size(filter(mk, x -> x))").cast("long").as("n_masked"),
          when(size(col("ts")) > 0, graft.functions.EngineMath.roundAway(
            expr("cast(size(filter(mk, x -> x)) as double) / size(ts)"), 6))
            .otherwise(lit(0.0)).as("masked_frac"),
          expr("md5(array_join(filter(transform(sq, j -> " +
            "case when not mk[j] then ts[j] " +
            "when j >= 1 and mk[j-1] then cast(null as string) " +
            "else '<x>' end), x -> x is not null), ' '))").as("corrupted_fp"))
        .orderBy(col("doc_id"))),
    // x101: time-decayed user-activity features — per-user exponentially
    // decayed event count and value mass (half-life-style recency
    // weighting, the standard activity/engagement feature). PRODUCTION
    // SHAPE (round 9, retiring the r8 per-user collect_list ordered
    // fold): both weight AND value are micro-quantized to integers
    // (floor(·1e6 + 0.5) — exp last-ulp insurance), so the per-user sums
    // Σ wm and Σ vm·wm are plain distributable INTEGER aggregates —
    // partial-aggregated map-side, order-free exact (x95's device; the
    // product sum rides DECIMAL(38,0) so a 100 TB user can't overflow a
    // long). The only non-row-local input is the broadcast single-row
    // tmax. Both engines then convert the identical exact integer to
    // double and divide — same IEEE result, no ordered fold needed.
    "x101_decayed_activity" -> ((s, dir) => {
      val t = Tables.events(s, dir).select(col("user_id"),
        col("value"), unix_micros(col("ts")).as("us"))
      val tmax = t.agg(max(col("us")).as("__tmax"))
      t.crossJoin(broadcast(tmax))
        .withColumn("wm",
          floor(exp(-((col("__tmax") - col("us")) / lit(86400e6)) / lit(7.0))
            * 1e6 + lit(0.5)).cast("long"))
        .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("wm")).as("__swm"),
          sum((col("vm") * col("wm")).cast("decimal(38,0)")).as("__svw"))
        .select(col("user_id"), col("n_events"),
          graft.functions.EngineMath.roundAway(
            col("__swm").cast("double") / 1e6, 6).as("decayed_n"),
          graft.functions.EngineMath.roundAway(
            col("__svw").cast("double") / 1e12, 6).as("decayed_value"))
        .orderBy(col("user_id"))
    }),
    // x92: prefix-filtered EXACT Jaccard (AllPairs/PPJoin) — same truth
    // as x06's quadratic join, sub-quadratic candidates, zero recall
    // loss by the prefix theorem; shares x06's all-pairs oracle, which
    // is precisely the losslessness gate
    "x92_ppjoin_pairs" -> ((s, dir) =>
      Dedup.jaccardPairsPrefix(table(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),
    // x58: domain-mixture temperature sampling — per-source quotas
    // ∝ n^0.5 (alpha<1 upweights small sources), members chosen by
    // md5-ticket rank within each source. Quota arithmetic and the
    // ticket ranks re-derive exactly in DuckDB (the Σ n^α normalizer
    // folds in source order on both engines).
    "x58_temperature_mix" -> ((s, dir) =>
      graft.operators.Sampling.temperatureMix(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", alpha = 0.5, k = 200)
        .orderBy(col("doc_id"))),
    // x59: bigram-LM scoring (the x50 signal, one order higher): per-doc
    // mean conditional log-prob ln((c(ab)+1)/(c(a)+V)) with add-1
    // smoothing over corpus bigram counts. Same two-deliberate-scans
    // shape and same position-ordered fold as x50 (the per-doc sum
    // re-assembles in bigram order, so the IEEE adds sequence
    // identically in DuckDB). At scale the count tables floor their
    // tails like x50's Zipf head so both broadcasts stay bounded.
    "x59_bigram_logprob" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      // bigram instances WITHOUT building bigram strings: zip each token
      // with its successor and key the count tables on xxhash64 of the
      // pair / the prefix token — 8-byte shuffle keys + broadcasts, zero
      // concat allocations (the measured cost of the string-bigram shape:
      // ~3.6M "a b" builds across the three passes). Tokens contain no
      // whitespace, so (a, b) ↔ "a b" is bijective and the pair hash
      // counts exactly what the oracle's string bigrams count; a
      // count-merging collision needs two distinct pairs with equal
      // xxhash64 — P ≈ |bigrams|²/2⁶⁴, negligible, and the string-keyed
      // DuckDB oracle would catch one.
      def bgs = docs.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 1) // sub-bigram docs have no rows anyway
        .select(col("doc_id"), posexplode(arrays_zip(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1))).as(Seq("pos", "p")))
        .select(col("doc_id"), col("pos"),
          xxhash64(col("p.0"), col("p.1")).as("bh"),
          xxhash64(col("p.0")).as("ph"))
      val vocabSize = docs
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .agg(countDistinct(col("term"))).collect().head.getLong(0)
      // Broadcast only the c(ab) >= 2 head: under add-1 smoothing a
      // singleton bigram scores ln(2/(ca+V)) — exactly what a MISSING
      // bigram coalesced to count 1 scores — so the Zipf tail drops from
      // the broadcast with zero result change; the oracle computes over
      // full counts and pins the equivalence. (Prefix counts keep no
      // floor.)
      val cb = bgs.groupBy(col("bh")).agg(count(lit(1)).as("cab"))
      val cp = bgs.groupBy(col("ph")).agg(count(lit(1)).as("ca"))
      bgs
        .join(broadcast(cb.filter(col("cab") >= 2)), Seq("bh"), "left")
        .join(broadcast(cp), Seq("ph"))
        .withColumn("lp", log((coalesce(col("cab"), lit(1L)) + lit(1.0)) /
          (col("ca") + lit(vocabSize)).cast("double")))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("lps"))
        .select(col("doc_id"),
          size(col("lps")).cast("long").as("n_bigrams"),
          graft.functions.EngineMath.roundAway(
            aggregate(transform(col("lps"), x => x("lp")), lit(0.0d),
              (a, v) => a + v) / size(col("lps")), 4).as("lm2_score"))
        .orderBy(col("doc_id"))
    }),
    "x48_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
        table(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), k = 50)
        .withColumn("es_rank",
          graft.functions.EngineMath.roundAway(col("es_rank"), 6))
        .orderBy(col("doc_id"))),
    "x27_stratified_sample" -> ((s, dir) => {
      // tokens-once: langId over raw text re-tokenizes per marker scan,
      // and the filter pushdown would double it
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("ts")))
      toks
        .select(col("doc_id"), TextFunctions.langIdOf(col("ts")).as("lang"))
        .filter(graft.operators.Sampling.stratifiedKeep(
          col("doc_id"), col("lang"), sampleRates, defaultRate = 1.0))
        .withColumn("split",
          graft.operators.Sampling.assignSplit(col("doc_id"), splitWeights))
        .orderBy(col("doc_id"))
    }),
    // x28: bucketed co-located join — both fact tables hash-bucketed on the
    // join key at write time (sources/Layout.writeBucketed), so the join
    // needs NO shuffle of either side (plan proof in LayoutSpec). The
    // pay-once-at-ingest answer for fact-to-fact joins too big to
    // broadcast; oracle = the plain join over the raw parquet.
    "x28_bucketed_join" -> ((s, dir) => {
      val sfName = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = new java.io.File(sys.props("java.io.tmpdir"), s"graft-x28-$sfName")
      graft.sources.Layout.ensureBucketed(s,
        table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        s"graft_li_$sfName", s"$tmp/li", "l_orderkey", 8, Seq("l_orderkey"),
        srcStamp = graft.sources.Layout.fileStamp(s"$dir/lineitem.parquet"))
      graft.sources.Layout.ensureBucketed(s,
        table(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        s"graft_ord_$sfName", s"$tmp/ord", "o_orderkey", 8, Seq("o_orderkey"),
        srcStamp = graft.sources.Layout.fileStamp(s"$dir/orders.parquet"))
      s.table(s"graft_li_$sfName")
        .join(s.table(s"graft_ord_$sfName"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          graft.functions.EngineMath.roundAway(
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),
    // x29: shingle containment pairs — sub-document duplication (a doc
    // pasted inside a bigger one) that Jaccard's union-dilution misses
    "x29_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(table(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.9)
        .orderBy(col("id_a"), col("id_b"))),
    // x30: STREAMING exact dedup — the x05 aggregate maintained statefully
    // as documents arrive (readStream + Complete mode); same oracle as the
    // batch dedup, proving stream≡batch for the dedup-group contract
    "x30_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamOps
        .dedupStreaming(s, s"$dir/documents.parquet", "doc_id", "text")
        .orderBy(col("fingerprint"))),
    // x36: multimodal frame sampling — the 1:N video fan-out (every 4th
    // 64-byte slice), pipelined flatMap with no shuffle. Gated on exact
    // frame accounting (count + byte totals — DuckDB can't slice BLOBs,
    // but the slicing arithmetic is fully expressible; frame CONTENT
    // equality is locked by MultimodalSpec)
    "x36_frame_sample" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.sampleFrames(
        Multimodal.toMedia(Multimodal.mediaTable(table(s, dir, "documents"))))
        .toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("frame_bytes_total"))
        .orderBy(col("media_id"))
    }),
    // x35: scan over the Z-ORDERED layout (sources/Layout.writeZOrdered):
    // a selective range band on the SECOND z-dim — the case a single-key
    // sort cannot prune (LayoutSpec proves the row-group skipping; this
    // gates result correctness over the rewritten layout)
    "x35_zorder_scan" -> ((s, dir) => {
      val sfName = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val z = new java.io.File(sys.props("java.io.tmpdir"), s"graft-x35-$sfName")
      // staleness guard (same idea as Layout.ensureBucketed's marker):
      // reuse only if the cached layout was built with these zCols from
      // THIS source file (size+mtime) — else rewrite
      val src = new java.io.File(s"$dir/lineitem.parquet")
      val spec = s"l_orderkey,l_partkey/${src.length}/${src.lastModified}"
      val marker = java.nio.file.Paths.get(z.toString, "_GRAFT_Z_SPEC")
      // marker = spec line + the source's max(l_partkey): the band
      // predicate's anchor is layout metadata, computed once when the
      // layout is (re)built — not a driver-side scalar job charged to
      // every timed run of the query
      val markerLines =
        if (java.nio.file.Files.exists(marker))
          java.nio.file.Files.readString(marker).trim.split("\n").toSeq
        else Seq.empty[String]
      val fresh = new java.io.File(z, "_SUCCESS").exists &&
        markerLines.headOption.contains(spec) && markerLines.length >= 2
      val pmax = if (!fresh) {
        graft.sources.Layout.writeZOrdered(
          table(s, dir, "lineitem"), z.toString,
          Seq("l_orderkey", "l_partkey"))
        val m = table(s, dir, "lineitem")
          .agg(max(col("l_partkey"))).collect().head.getLong(0)
        java.nio.file.Files.writeString(marker, s"$spec\n$m")
        m
      } else markerLines(1).toLong
      val li = s.read.parquet(z.toString)
      li.filter(col("l_partkey") >= pmax - pmax / 16 &&
          col("l_partkey") <= pmax)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.functions.EngineMath.roundAway(
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).as("price_sum"))
        .orderBy(col("l_returnflag"))
    }),
    // x33: salted join — identical rows to the plain equi-join (oracle
    // proves it), with the hot-key state spread over 8 salt buckets; the
    // static fallback when AQE skew-split can't apply (operators/Skew)
    "x33_salted_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, ords, Seq("l_orderkey"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          graft.functions.EngineMath.roundAway(
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),
    // x34: salted exact count-distinct — value-space bucketing spreads a
    // hot group's distinct-state over 8 reducers; exact (buckets partition
    // the value space), proven by the plain COUNT(DISTINCT) oracle
    "x34_salted_distinct" -> ((s, dir) =>
      graft.operators.Skew.saltedCountDistinct(
        table(s, dir, "lineitem"), Seq("l_returnflag"), "l_orderkey",
        buckets = 8)
        .orderBy(col("l_returnflag"))),
    // x32: sliding-window aggregate (1h window / 30m slide — each event in
    // exactly 2 overlapping buckets); oracle enumerates the slide-grid
    // starts per event in DuckDB
    "x32_sliding_window" -> ((s, dir) =>
      graft.streaming.StreamOps
        .slidingAggBatch(Tables.events(s, dir), "1 hour", "30 minutes")
        .orderBy(col("window_start"), col("event_type"))),
    // x31: the COMPOSED training-data pipeline — language-ID → stratified
    // downsample → clean → exact-dedup (keep smallest id per cleaned
    // fingerprint) → train/val/test split → per-(lang, split) corpus
    // stats. Every stage is deterministic and engine-portable, so the
    // WHOLE pipeline oracle-matches DuckDB end to end. One scan, two
    // shuffles (dedup window + final stats), no collects.
    "x31_pipeline" -> ((s, dir) => {
      import graft.operators.Sampling
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fingerprint")).orderBy(col("doc_id"))
      // two persist stages: (1) tokens materialized once (langId over raw
      // text re-tokenizes per marker scan); (2) sample+clean results —
      // langIdOf/cleanText are each consumed by 2+ downstream operators
      // and CollapseProject would inline (re-evaluate) them per consumer
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val sampled = graft.engine.CacheScope.persistTracked(
        toks
          .select(col("doc_id"), col("text"),
            TextFunctions.langIdOf(col("ts")).as("lang"))
          .filter(Sampling.stratifiedKeep(
            col("doc_id"), col("lang"), sampleRates, defaultRate = 1.0))
          .withColumn("t", TextFunctions.cleanText(col("text")))
          .drop("text"))
      sampled
        .withColumn("fingerprint", TextFunctions.fingerprint(col("t")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn("split", Sampling.assignSplit(col("doc_id"), splitWeights))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("t")).cast("long")).as("n_tokens"))
        .orderBy(col("lang"), col("split"))
    }),
    // x107: length-bucketed dynamic batching with padding-waste
    // accounting — the dataloader's bucketed-batching layout. Capacity
    // bucket cap = 64·⌈n_tok/64⌉ is PURE INTEGER arithmetic (a
    // power-of-two bucket via log2 would ride a float and flip at exact
    // powers across engines); rows md5-ticket-shuffled within their
    // bucket, cut into fixed batches of 8, each batch padded to its own
    // max length. Per-batch waste = rows·max − Σ n_tok quantifies what
    // bucketing saves vs naive batching. The within-bucket rank is a
    // window over a bounded key set (#buckets ≤ max_len/64); at 100 TB
    // the x98 bucket-prefix-sum rank replaces the per-bucket sort.
    "x107_length_batching" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cap"))
        .orderBy(md5(concat(lit("lb1:"), col("doc_id").cast("string"))),
          col("doc_id"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("cap", expr("64 * ((n_tok + 63) div 64)"))
        .withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("batch", expr("(__rk - 1) div 8"))
        .groupBy(col("cap"), col("batch"))
        .agg(count(lit(1)).as("n_rows"), max(col("n_tok")).as("max_tok"),
          sum(col("n_tok")).as("__sum"))
        .select(col("cap"), col("batch"), col("n_rows"), col("max_tok"),
          (col("n_rows") * col("max_tok") - col("__sum")).as("pad_waste"))
        .orderBy(col("cap"), col("batch"))
    }),
    // x108: per-source token-budget curation — the standard "spend a
    // fixed token budget on the best documents of each source" selection.
    // Docs ranked by the x100 integer-quantized quality score (desc),
    // md5-ticket tie-shuffled, then an inclusive running token sum keeps
    // rows while cum ≤ budget. One window per source (bounded partition
    // count); the cumsum is the x98-style prefix device at scale.
    "x108_token_budget" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("doc_id"),
        col("source"), col("text"), TextFunctions.tokens(col("text")).as("ts"))
      val scored = toks
        .select(col("doc_id"), col("source"),
          size(col("ts")).cast("long").as("n_tok"),
          TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"))
        .filter(col("n_tok") > 0)
        .withColumn("__qi", floor(col("q") * 10000 + lit(0.5)).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("__qi").desc,
          md5(concat(lit("tb1:"), col("doc_id").cast("string"))), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      scored.withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= 2000L)
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
        .orderBy(col("source"), col("cum_tok"))
    }),
    // x109: multi-epoch mixture expansion — repeat small sources to hit a
    // per-source token budget (the "epochs over under-represented
    // domains" recipe): full epochs = budget div Σtok (integer), plus a
    // fractional epoch of the ticket-first docs whose running token sum
    // fits the remainder. Expansion is a generator explode (no shuffle);
    // the only aggregates are the per-source token totals (broadcast).
    "x109_epoch_mixture" -> ((s, dir) => {
      val budget = 10000L
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
      val tot = d.groupBy(col("source")).agg(sum(col("n_tok")).as("tot_tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(lit("em1:"), col("doc_id").cast("string"))),
          col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      d.join(broadcast(tot), "source")
        .withColumn("__fe", expr(s"$budget div tot_tok"))
        .withColumn("__rem", expr(s"$budget % tot_tok"))
        .withColumn("__cum", sum(col("n_tok")).over(w))
        .withColumn("n_reps",
          (col("__fe") + when(col("__cum") <= col("__rem"), 1L).otherwise(0L))
            .cast("long"))
        .filter(col("n_reps") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0L), col("n_reps") - 1)).as("rep"))
        .orderBy(col("doc_id"), col("rep"))
    }),
    // x110: robust outlier gate — per-event-type median/MAD z-score
    // (|v − med| > 3·1.4826·mad), the rank-based outlier detector that
    // survives the heavy tails a mean/stddev gate dies on. Exact medians
    // via percentile (≡ DuckDB quantile_cont, the x16/x94 equivalence);
    // both med and mad tables are per-type singletons, broadcast back.
    // At 100 TB the same shape runs on approx_percentile (x17's sketch).
    "x110_robust_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"),
          graft.functions.EngineMath.roundAway(max(col("med")), 6).as("med"),
          graft.functions.EngineMath.roundAway(max(col("mad")), 6).as("mad"))
        .orderBy(col("event_type"))
    }),
    // x111: first-order Markov transition matrix over per-user event
    // streams — P(next | cur) from lead() pairs (ts, event_id ordering is
    // unique, so the lag is deterministic). Transition counts shuffle on
    // (cur, next); the per-cur normalizer is a window over the bounded
    // event-type alphabet. The x80 path analysis mines top-k sequences;
    // this is the generative-model view of the same stream.
    "x111_markov_transitions" -> ((s, dir) => {
      val wSeq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wCur = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cur_type"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(wSeq))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("cur_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", graft.functions.EngineMath.roundAway(
          col("n").cast("double") / sum(col("n")).over(wCur), 6))
        .orderBy(col("cur_type"), col("next_type"))
    }),
    // x112: matryoshka truncation recall probe — brute-force top-10 over
    // the full vectors vs the first-16-dims prefix, per-query overlap.
    // The operational question behind dimension-truncated indexes (use a
    // 4× cheaper prefix scan, what recall is left?); both rankings are
    // the x10 broadcast-queries shape, so the probe costs two scans and
    // zero extra shuffles. The left join keeps zero-overlap queries.
    "x112_matryoshka_recall" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val full = Similarity.bruteForceTopK(
        e, "vec_id", "vec", q, "vec_id", "vec", k = 10)
        .select(col("query_id"), col("item_id"))
      val et = e.select(col("vec_id"), slice(col("vec"), 1, 16).as("vec"))
      val trunc = Similarity.bruteForceTopK(
        et, "vec_id", "vec", et.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10)
        .select(col("query_id"), col("item_id"))
      val inter = full.join(trunc, Seq("query_id", "item_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("overlap"))
      q.select(col("vec_id").as("query_id"))
        .join(inter, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("overlap"), lit(0L)).as("overlap"),
          graft.functions.EngineMath.roundAway(
            coalesce(col("overlap"), lit(0L)).cast("double") / lit(10.0), 4)
            .as("recall_at_10"))
        .orderBy(col("query_id"))
    }),
    // x113: cross-source quantile normalization — map each source's
    // n_chars distribution onto the GLOBAL distribution (rank r of m in
    // the source → global order statistic at ⌈r·N/m⌉), the batch-effect
    // alignment preprocessing step. ALL arithmetic is integer (ranks,
    // ceil-div); the global rank is NOT a global sort: value-range
    // buckets (n_chars div 64 — bounded by max doc length) rank locally,
    // then a bucket-count prefix sum (window over #buckets rows,
    // broadcast back) offsets them — the x98 two-level device keyed by
    // value instead of ticket. The rank→value lookup is a plain equi-join.
    "x113_quantile_normalize" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val wBkt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bkt")).orderBy(col("n_chars"), col("doc_id"))
      val bucketed = d.withColumn("__bkt", expr("n_chars div 64"))
        .withColumn("__lr", row_number().over(wBkt).cast("long"))
      // offsets: rows in all strictly-smaller buckets (tiny frame:
      // one row per bucket)
      val wOff = org.apache.spark.sql.expressions.Window
        .orderBy(col("__bkt"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offsets = bucketed.groupBy(col("__bkt"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
        .select(col("__bkt"), col("__off"))
      val ranked = bucketed.join(broadcast(offsets), "__bkt")
        .withColumn("g", col("__off") + col("__lr"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("g"))
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val m = ranked.groupBy(col("source")).agg(count(lit(1)).as("m"))
      val total = d.agg(count(lit(1)).as("__N"))
      val target = ranked
        .withColumn("r", row_number().over(wSrc).cast("long"))
        .join(broadcast(m), "source")
        .crossJoin(broadcast(total))
        .withColumn("gstar", expr("(r * __N + m - 1) div m"))
      target.join(ranked.select(col("g").as("gstar"),
          col("n_chars").as("norm_chars")), "gstar")
        .select(col("doc_id"), col("source"), col("n_chars"), col("norm_chars"))
        .orderBy(col("doc_id"))
    }),
    // x114: corpus datacard — the per-source datasheet row every corpus
    // release ships: doc/token counts, language breadth, exact-dup rate
    // (x04's md5 fingerprint), quantized mean quality, median tokens.
    // One scan + one groupBy; the count_distincts swap to HLL (x81) at
    // 100 TB, medians to approx_percentile (x26) — documented swaps, not
    // silent ones.
    "x114_datacard" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(col("doc_id"),
        col("source"), col("lang"), col("text"),
        TextFunctions.tokens(col("text")).as("ts"))
      toks.filter(size(col("ts")) > 0)
        .select(col("source"), col("lang"),
          size(col("ts")).cast("long").as("n_tok"),
          TextFunctions.fingerprint(col("text")).as("fp"),
          floor(TextFunctions.qualityScoreOf(col("ts"), col("text")) * 10000
            + lit(0.5)).cast("long").as("qi"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("fp")).as("n_unique"),
          sum(col("qi")).as("__sq"),
          expr("percentile(n_tok, 0.5)").as("p50_tok"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
          graft.functions.EngineMath.roundAway(
            lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6)
            .as("dup_rate"),
          graft.functions.EngineMath.roundAway(
            col("__sq").cast("double") / 10000.0 / col("n_docs"), 6)
            .as("mean_quality"),
          graft.functions.EngineMath.roundAway(col("p50_tok"), 4).as("p50_tok"))
        .orderBy(col("source"))
    }),
    // x115: rank-biased overlap (p=0.9, depth 10) between the full-dim
    // and 16-dim-prefix brute rankings — the order-aware companion to
    // x112's set overlap (RBO weights agreement at the top, which is
    // what an index that feeds a re-ranker actually needs). The per-depth
    // overlap explodes a 10-row literal per query (bounded fan-out); the
    // Σ p^d·|A∩B|/d fold runs in depth order on both engines.
    "x115_rbo" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val full = Similarity.bruteForceTopK(
        e, "vec_id", "vec", q, "vec_id", "vec", k = 10)
        .select(col("query_id"), col("item_id"), col("rank").as("ra"))
      val et = e.select(col("vec_id"), slice(col("vec"), 1, 16).as("vec"))
      val trunc = Similarity.bruteForceTopK(
        et, "vec_id", "vec", et.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10)
        .select(col("query_id"), col("item_id"), col("rank").as("rb"))
      val joined = full.join(trunc, Seq("query_id", "item_id"))
        .select(col("query_id"), greatest(col("ra"), col("rb")).as("dmin"))
      val depths = joined
        .select(col("query_id"),
          explode(sequence(lit(1L), lit(10L))).as("d"), col("dmin"))
        .filter(col("dmin") <= col("d"))
        .groupBy(col("query_id"), col("d")).agg(count(lit(1)).as("ov"))
      val rboPerQ = depths
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(struct(col("d"), col("ov")))).as("cs"))
        .select(col("query_id"), graft.functions.EngineMath.roundAway(
          expr("aggregate(cs, 0.0d, (acc, x) -> acc + " +
            s"(${rboWeightCase("x.d")}) * CAST(x.ov AS DOUBLE)) * (1.0 - 0.9) / 0.9"),
          6).as("rbo"))
      q.select(col("vec_id").as("query_id"))
        .join(rboPerQ, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("rbo"), lit(0.0)).as("rbo"))
        .orderBy(col("query_id"))
    }),
    // x117: co-purchase item-item similarity (basket analysis) — parts
    // that ship in the same order, cosine over co-occurrence counts
    // c_ab/√(c_a·c_b). The pair producer is an ORDER-KEYED equi-join
    // (both sides shuffle once on l_orderkey, per-key fan-out bounded by
    // order size ≤~13 — never an all-pairs over parts); the per-item
    // marginals broadcast back. √ is IEEE-exact, so the cosine divides
    // identically in both engines. c_ab ≥ 3 floors the Zipf tail the way
    // x89's PMI floor does.
    "x117_copurchase_sim" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"), "ok")
        .filter(col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 3)
      val marg = li.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      pairs
        .join(broadcast(marg.select(col("pk").as("part_a"), col("c").as("c_a"))),
          "part_a")
        .join(broadcast(marg.select(col("pk").as("part_b"), col("c").as("c_b"))),
          "part_b")
        .select(col("part_a"), col("part_b"), col("c_ab"),
          graft.functions.EngineMath.roundAway(
            col("c_ab").cast("double") /
              sqrt((col("c_a") * col("c_b")).cast("double")), 6).as("sim"))
        .orderBy(col("part_a"), col("part_b"))
    }),
    // x118: Z-order (Morton) layout keys + per-block pruning stats — the
    // multi-column data-skipping layout: 16-bit interleave of
    // (l_partkey, l_suppkey) via PURE integer div/mod arithmetic (the
    // same 32 terms evaluate in DuckDB with // — no engine-specific bit
    // intrinsics), blocks of z div 4096, per-block min/max of both keys.
    // Tight per-block spans on BOTH columns is exactly the file-level
    // min-max pruning a 100 TB scan does; ZorderSpec quantifies the span
    // shrink vs the single-column sort layout.
    "x118_zorder_blocks" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .withColumn("z", expr(zorderExpr("pk", "sk", "div")))
        .withColumn("block", expr("z div 4096"))
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n"),
          min(col("pk")).as("pk_min"), max(col("pk")).as("pk_max"),
          min(col("sk")).as("sk_min"), max(col("sk")).as("sk_max"))
        .orderBy(col("block"))),
    // x119: personalized PageRank — x86's tick-quantized iteration with
    // teleport mass restricted to a seed set (the "related items from
    // these seeds" ranking). Seeds broadcast (they are the query); every
    // per-round shape is x86's, so the scale story is unchanged.
    "x119_ppr" -> ((s, dir) =>
      graft.operators.Graph.personalizedPageRank(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst",
        seeds = s.range(0, 4).select((col("id") * 2).as("node")),
        iters = 5)),
    // x120: HLL cross-source overlap — |A∩B| estimated by
    // inclusion-exclusion over mergeable sketches (est_a + est_b −
    // est_a∪b), the way cross-corpus overlap is measured at 100 TB
    // without an exact distinct join. Engine estimates STAGED (as x81);
    // the oracle re-derives the exact overlaps and gates the estimates,
    // so green = "estimates within tolerance of truth", not "it ran".
    "x120_hll_overlap" -> ((s, dir) => {
      val srcs = Seq("src0", "src1", "src2", "src3")
      val tok = table(s, dir, "documents")
        .filter(col("source").isin(srcs: _*))
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("t"))
      val sk = graft.engine.CacheScope.persistTracked(
        tok.groupBy(col("source")).agg(hll_sketch_agg(col("t")).as("sk")))
      val single = sk.select(col("source"), hll_sketch_estimate(col("sk")).as("est"))
      val est = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))).as("est_ab"))
        .join(broadcast(single.select(col("source").as("source_a"),
          col("est").as("est_a"))), "source_a")
        .join(broadcast(single.select(col("source").as("source_b"),
          col("est").as("est_b"))), "source_b")
        .select(col("source_a"), col("source_b"),
          (col("est_a") + col("est_b") - col("est_ab")).as("overlap_est"))
      Stage.write(est, dir, "x120_overlap_est")
      val dt = tok.distinct()
      val exact = dt.as("a")
        .join(dt.as("b"),
          col("a.t") === col("b.t") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("overlap_exact"))
      est.join(exact, Seq("source_a", "source_b"))
        .select(col("source_a"), col("source_b"), col("overlap_exact"),
          col("overlap_est"),
          (abs(col("overlap_est").cast("double") - col("overlap_exact")) <=
            col("overlap_exact") * 0.15).as("within_15pct"))
        .orderBy(col("source_a"), col("source_b"))
    }),
    // x121: EWMA-smoothed daily event rate — the discrete-recursion
    // smoother (s = 0.3·x + 0.7·s — x101 weights by continuous time
    // distance; this is the per-tick recursion dashboards use). The fold
    // runs over the BOUNDED day axis per type (collect_list is #days
    // long, never rows), seeded with day 1's count on both engines.
    "x121_ewma_daily" -> ((s, dir) =>
      ewmaOverDaily(Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))),
    // x123: the STREAM-maintained twin of x121 — the additive daily
    // counts build incrementally in one stateful aggregate (the only
    // rows-scale work); the shared read-time fold derives the smoother
    // over the bounded day axis. Same oracle as x121: the whole point is
    // stream ≡ batch.
    "x123_stream_ewma" -> ((s, dir) =>
      ewmaOverDaily(graft.streaming.StreamOps.dailyCountsStreaming(
        s, s"$dir/events.parquet"))),
    // x124: calendar gap-fill (time-series densification) — the full
    // (type × hour) grid from one broadcast min/max row, left-joined to
    // the observed hourly counts, gaps filled with 0. The grid explode is
    // a generator (slots = calendar span, never rows); hours ride as
    // epoch-micros integers so both engines' grids are value-identical.
    "x124_gap_fill" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("h", date_trunc("HOUR", col("ts")))
      val rng = e.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val counts = e.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n0"))
      grid.join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
          coalesce(col("n0"), lit(0L)).as("n"),
          col("n0").isNotNull.as("observed"))
        .orderBy(col("event_type"), col("hour_us"))
    }),
    // x125: vocabulary-novelty rate — per 50-doc arrival bucket, the
    // share of its distinct tokens seen for the FIRST time in that
    // bucket (the corpus-growth / drift metric a crawl pipeline tracks).
    // Two hash aggregates on the token key; the first-seen table is the
    // same min-reduction every incremental-dedup index maintains.
    "x125_vocab_novelty" -> ((s, dir) => {
      val tb = table(s, dir, "documents")
        .select(expr("doc_id div 50").as("bucket"),
          explode(TextFunctions.tokens(col("text"))).as("t"))
        .distinct()
      val first = tb.groupBy(col("t")).agg(min(col("bucket")).as("fb"))
      tb.join(first, "t")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("fb") === col("bucket"), 1L).otherwise(0L)).as("n_new"))
        .select(col("bucket"), col("n_distinct"), col("n_new"),
          graft.functions.EngineMath.roundAway(
            col("n_new").cast("double") / col("n_distinct"), 6).as("novelty"))
        .orderBy(col("bucket"))
    }),
    // x126: A/B experiment readout — deterministic md5 50/50 user
    // assignment (the x27 ticket device) and a Welch t-test on per-event
    // value between arms. Moments ride EXACT integer sums (the x95/x101
    // micro-quantization: Σ floor(v·1e6+0.5) as LONG, Σ vm² as DECIMAL —
    // order-free), and the whole t chain is ONE shared expression string,
    // so the IEEE derivation is operand-identical in both engines. One
    // scan, one broadcastable single-row aggregate.
    "x126_ab_welch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("variant",
          when(substring(md5(concat(lit("ab1:"), col("user_id").cast("string"))),
            1, 4) < "8000", lit("b")).otherwise(lit("a")))
        .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
      ev.groupBy()
        .agg(
          sum(when(col("variant") === "a", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "b", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "a", col("vm")).otherwise(0L)).as("s_a"),
          sum(when(col("variant") === "b", col("vm")).otherwise(0L)).as("s_b"),
          // widen BEFORE the multiply (the x228 rule): vm*vm in
          // LongType would silently wrap past ~3e9 micro-units
          sum(when(col("variant") === "a",
            col("vm").cast("decimal(38,0)") * col("vm"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_a"),
          sum(when(col("variant") === "b",
            col("vm").cast("decimal(38,0)") * col("vm"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_b"))
        .select(col("n_a"), col("n_b"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${WelchMean("a")})"), 6).as("mean_a"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${WelchMean("b")})"), 6).as("mean_b"),
          graft.functions.EngineMath.roundAway(expr(WelchTSql), 6).as("t"))
    }),
    // x127: pipeline survival funnel — the per-stage retention report a
    // curation run ships (how many docs each gate costs): non-empty →
    // quality ≥ 0.5 → exact-dedup keeper → decontaminated, over the
    // corpus half (benchmark docs are the contamination reference, not
    // pipeline input). Each stage count is a 1-row aggregate; the lag
    // retention is a window over 5 rows. Same gates as x03/x05/x40, so
    // the funnel IS the composition contract of those operators.
    "x127_pipeline_funnel" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = graft.engine.CacheScope.persistTracked(
        docs.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), col("text"),
            TextFunctions.tokens(col("text")).as("ts")))
      val s1 = graft.engine.CacheScope.persistTracked(
        toks.filter(size(col("ts")) > 0))
      val s2 = graft.engine.CacheScope.persistTracked(
        s1.filter(floor(TextFunctions.qualityScoreOf(col("ts"), col("text"))
          * 10000 + lit(0.5)).cast("long") >= 5000L))
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      val s3 = graft.engine.CacheScope.persistTracked(
        s2.withColumn("fp", TextFunctions.fingerprint(col("text")))
          .withColumn("__rn", row_number().over(wFp))
          .filter(col("__rn") === 1)
          .select(col("doc_id"), col("text")))
      val contaminated = graft.operators.Dedup.contaminationScan(
        s3, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 5)
        .select(col("doc_id"))
      val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
      def stageCount(df: DataFrame, i: Int, name: String) =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i.toLong).as("stage"), lit(name).as("gate"), col("n_docs"))
      val funnel = stageCount(toks, 0, "corpus")
        .unionByName(stageCount(s1, 1, "non_empty"))
        .unionByName(stageCount(s2, 2, "quality"))
        .unionByName(stageCount(s3, 3, "dedup_keeper"))
        .unionByName(stageCount(s4, 4, "decontaminated"))
      val wStage = org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
      funnel
        .withColumn("retention", coalesce(
          graft.functions.EngineMath.roundAway(
            col("n_docs").cast("double") / lag(col("n_docs"), 1).over(wStage), 6),
          lit(1.0)))
        .orderBy(col("stage"))
    }),
    // x128: exact-size stratified sampling via largest-remainder quotas —
    // allocate EXACTLY K=100 eval docs across sources proportionally
    // (base = ⌊K·n_s/N⌋, the K−Σbase leftovers to the largest
    // remainders), members by md5-ticket rank within source. Pure
    // integer quota arithmetic; the only rows-scale work is the
    // per-source ticket rank.
    "x128_quota_sample" -> ((s, dir) => {
      val kTotal = 100L
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("ntk"))
        .filter(col("ntk") > 0).drop("ntk")
      val stats = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("N"))))
        .withColumn("base", expr(s"($kTotal * n_s) div N"))
        .withColumn("r", expr(s"($kTotal * n_s) % N"))
      val wRem = org.apache.spark.sql.expressions.Window
        .orderBy(col("r").desc, col("source"))
      val quotas = stats
        .crossJoin(broadcast(stats.agg(sum(col("base")).as("__sb"))))
        .withColumn("__rk", row_number().over(wRem).cast("long"))
        .withColumn("quota",
          col("base") + when(col("__rk") <= lit(kTotal) - col("__sb"), 1L)
            .otherwise(0L))
        .select(col("source"), col("quota"))
      val wTick = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(lit("qs1:"), col("doc_id").cast("string"))),
          col("doc_id"))
      d.withColumn("__tr", row_number().over(wTick).cast("long"))
        .join(broadcast(quotas), "source")
        .filter(col("__tr") <= col("quota"))
        .select(col("doc_id"), col("source"), col("quota"))
        .orderBy(col("source"), col("doc_id"))
    }),
    // x136: behavioral perplexity — each user's event stream scored
    // under the corpus's own first-order Markov model (x111's
    // transitions): mean −ln P(next|cur), folded in sequence order (the
    // x59 device). The model table is bounded (type alphabet²) and
    // broadcasts; anomalously-improbable users surface at the top.
    "x136_behavior_perplexity" -> ((s, dir) => {
      val wSeq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("seq", row_number().over(wSeq).cast("long"))
          .withColumn("next_type", lead(col("event_type"), 1).over(wSeq)))
      val tr = e.filter(col("next_type").isNotNull)
      val wCur = org.apache.spark.sql.expressions.Window.partitionBy(col("cur"))
      val probs = tr
        .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") / sum(col("n")).over(wCur))
        .select(col("cur").as("event_type"), col("nxt").as("next_type"), col("p"))
      tr.join(broadcast(probs), Seq("event_type", "next_type"))
        .select(col("user_id"), col("seq"), (-log(col("p"))).as("nlp"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_tr"),
          sort_array(collect_list(struct(col("seq"), col("nlp")))).as("cs"))
        .select(col("user_id"), col("n_tr"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(transform(cs, x -> x.nlp), 0.0d, " +
              "(acc, v) -> acc + v)") / col("n_tr"), 6).as("mean_nlp"))
        .orderBy(col("user_id"))
    }),
    // x137: greedy set-cover data selection (submodular curation lite) —
    // 5 rounds of "pick the doc covering the most yet-uncovered tokens".
    // The argmax per round runs distributed; only the PICKED doc's token
    // set and the covered-vocabulary set come to the driver (bounded by
    // vocabulary, documented — at 100 TB the covered set rides a
    // broadcast bloom/set, the loop shape unchanged). Oracle = the same
    // 5 rounds unrolled in SQL.
    "x137_greedy_cover" -> ((s, dir) => {
      val t = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(col("doc_id"),
            array_distinct(TextFunctions.tokens(col("text"))).as("ts"))
          .filter(size(col("ts")) > 0))
      var covered = Array.empty[String]
      var picked = List.empty[Long]
      val rows = (1 to 5).map { step =>
        val pool =
          if (picked.isEmpty) t else t.filter(!col("doc_id").isin(picked: _*))
        val best = pool
          .select(col("doc_id"),
            size(array_except(col("ts"), typedlit(covered.toSeq)))
              .cast("long").as("gain"), col("ts"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .collect().head
        covered = (covered ++ best.getSeq[String](2)).distinct
        picked ::= best.getLong(0)
        (step.toLong, best.getLong(0), best.getLong(1), covered.length.toLong)
      }
      import s.implicits._
      rows.toDF("step", "doc_id", "gain", "covered_total")
    }),
    // x138: reciprocal-rank fusion — the standard zero-tuning way to
    // merge two retrieval rankings (full-dim exact × 16-dim prefix):
    // score = Σ 1/(60+rank) over the rankings that contain the item,
    // re-ranked per query. Both inputs are the x10/x112 broadcast brute
    // shapes; the fusion is one outer join + window over ≤20 rows/query.
    "x138_rrf_fusion" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val full = Similarity.bruteForceTopK(
        e, "vec_id", "vec", e.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10).select(col("query_id"), col("item_id"), col("rank").as("ra"))
      val et = e.select(col("vec_id"), slice(col("vec"), 1, 16).as("vec"))
      val trunc = Similarity.bruteForceTopK(
        et, "vec_id", "vec", et.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10).select(col("query_id"), col("item_id"), col("rank").as("rb"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
      full.join(trunc, Seq("query_id", "item_id"), "full_outer")
        .withColumn("score",
          coalesce(lit(1.0) / (lit(60.0) + col("ra")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("rb")), lit(0.0)))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("item_id"),
          graft.functions.EngineMath.roundAway(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // x134: two-sample Kolmogorov-Smirnov drift statistic — max CDF gap
    // between the even/odd user cohorts' value distributions, the
    // standard continuous-feature drift monitor (x53's KL is the token
    // view). ENTIRELY integer until one final division: D's numerator is
    // max |cumA·nB − cumB·nA| over micro-quantized values, so both
    // engines agree bit-exactly with no fold ordering anywhere. The
    // value-ordered cumsum is a global window here (exact small-data
    // form); at 100 TB the same statistic runs on a binned CDF (bounded
    // bins) or the x113 bucket-prefix-sum rank.
    "x134_ks_drift" -> ((s, dir) => {
      val v = Tables.events(s, dir)
        .select((col("user_id") % 2 === 0).as("isA"),
          floor(col("value") * 1e6 + lit(0.5)).cast("long").as("vm"))
      val counts = v.groupBy(col("vm"))
        .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("cb"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("vm"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val tot = v.agg(sum(when(col("isA"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("isA"), 1L).otherwise(0L)).as("nb"))
      counts
        .withColumn("cuma", sum(col("ca")).over(wCum))
        .withColumn("cumb", sum(col("cb")).over(wCum))
        .crossJoin(broadcast(tot))
        // pre-widen to decimal(38,0): cum·n is a BIGINT product that
        // silently wraps (non-ANSI Spark) once a cohort passes ~3e9
        // events; widened, the argmax and the final division stay exact
        // (na·nb divides as double·double, matching the oracle's read)
        .withColumn("dnum",
          abs(col("cuma").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")
            - col("cumb").cast("decimal(38,0)") * col("na").cast("decimal(38,0)")))
        .orderBy(col("dnum").desc, col("vm"))
        .limit(1)
        .select(col("na"), col("nb"),
          graft.functions.EngineMath.roundAway(
            col("dnum").cast("double")
              / (col("na").cast("double") * col("nb").cast("double")),
            6).as("ks"),
          graft.functions.EngineMath.roundAway(
            col("vm").cast("double") / 1e6, 6).as("at_value"))
    }),
    // x135: chi-square categorical drift — event-type contingency over
    // the even/odd event-id halves: χ² = Σ (o−e)²/e with e from exact
    // integer margins, contributions folded in (event_type, half) order
    // (the x53/x96 ordered-fold device) so the IEEE sum is
    // engine-identical. Bounded cells: |types| × 2.
    "x135_chi2_drift" -> ((s, dir) => {
      val o = Tables.events(s, dir)
        .groupBy(col("event_type"), (col("event_id") % 2).as("half"))
        .agg(count(lit(1)).as("o"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("half"))
      val tot = o.agg(sum(col("o")).as("nn"))
      o.withColumn("rt", sum(col("o")).over(wT))
        .withColumn("ct", sum(col("o")).over(wH))
        .crossJoin(broadcast(tot))
        .withColumn("contrib", expr(Chi2CellSql))
        .groupBy()
        .agg(max(col("nn")).as("n"),
          (countDistinct(col("event_type")) - 1).as("dof"),
          sort_array(collect_list(struct(col("event_type"), col("half"),
            col("contrib")))).as("cs"))
        .select(col("n"), col("dof"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
              "(acc, v) -> acc + v)"), 6).as("chi2"))
    }),
    // x131: 1-bit sign quantization recall probe — the cheapest
    // quantization in the int8 (x25) / PQ (x51) family: 64 sign bits
    // pack into two BIGINT words (generated CASE terms — no engine bit
    // intrinsics), candidates ranked by Hamming distance, overlap@10 vs
    // the exact ranking. 512× smaller vectors; this probe answers what
    // recall that buys, the same operational question as x112.
    "x131_sign_bits_recall" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      def words(df: DataFrame) = df
        .withColumn("w1", expr(signWordExpr(j => s"element_at(vec, $j)", 0)))
        .withColumn("w2", expr(signWordExpr(j => s"element_at(vec, $j)", 32)))
      val it = words(e).select(col("vec_id").as("item_id"), col("w1"), col("w2"))
      val q = words(e.filter(col("vec_id") < 5))
        .select(col("vec_id").as("query_id"),
          col("w1").as("q1"), col("w2").as("q2"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("ham"), col("item_id"))
      val signTop = it.crossJoin(broadcast(q))
        .filter(col("item_id") =!= col("query_id"))
        .withColumn("ham",
          (Dedup.hammingDistance(col("w1"), col("q1")) +
            Dedup.hammingDistance(col("w2"), col("q2"))).cast("long"))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("item_id"))
      val full = Similarity.bruteForceTopK(
        e, "vec_id", "vec", e.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10).select(col("query_id"), col("item_id"))
      val inter = full.join(signTop, Seq("query_id", "item_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("overlap"))
      e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"))
        .join(inter, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("overlap"), lit(0L)).as("overlap"),
          graft.functions.EngineMath.roundAway(
            coalesce(col("overlap"), lit(0L)).cast("double") / lit(10.0), 4)
            .as("recall_at_10"))
        .orderBy(col("query_id"))
    }),
    // x132: hard-negative mining for contrastive training — per query
    // vector, the top-3 most-similar items with a DIFFERENT label (the
    // negatives that actually teach). Same broadcast-queries brute shape
    // as x10 with the label-mismatch residual; at scale the IVF probe
    // restricts candidates first (x13's path), label filter unchanged.
    "x132_hard_negatives" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        call_function("graft_dot", x, y)
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("vec").as("qv"),
          col("label").as("ql"),
          sqrt(dot(col("vec"), col("vec"))).as("qnorm"))
      val it = e.select(col("vec_id").as("item_id"), col("vec").as("iv"),
        col("label").as("il"), sqrt(dot(col("vec"), col("vec"))).as("inorm"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
      it.crossJoin(broadcast(q))
        .filter(col("item_id") =!= col("query_id") && col("il") =!= col("ql"))
        .withColumn("cos", dot(col("iv"), col("qv")) / (col("inorm") * col("qnorm")))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("item_id"),
          graft.functions.EngineMath.roundAway(col("cos"), 4).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // x133: embedding class-separation report — per label: mean cosine
    // to the OWN class centroid vs mean cosine to OTHER centroids, and
    // the margin. Centroid DIRECTIONS are exact integer component sums
    // (cosine is scale-invariant, so Σ floor(x·1e6+0.5) IS the centroid
    // — no order-dependent double sum anywhere); per-vector cosines are
    // micro-quantized before averaging, so the means are exact integer
    // arithmetic too. Labels are bounded: the centroid table broadcasts.
    "x133_class_separation" -> ((s, dir) => {
      val e = graft.engine.CacheScope.persistTracked(
        embeddingsD(s, dir).select(col("vec_id"), col("label"), col("vec")))
      val cent = e
        .select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
        .withColumn("xm", floor(col("x") * 1e6 + lit(0.5)).cast("long"))
        .groupBy(col("label"), col("pos")).agg(sum(col("xm")).as("sm"))
        .groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("pos"), col("sm")))).as("cs"))
        .select(col("label"),
          expr("transform(cs, p -> CAST(p.sm AS DOUBLE))").as("cvec"))
      val intra = e.join(broadcast(cent), "label")
        .withColumn("cm",
          floor(Dedup.cosine(col("vec"), col("cvec")) * 1e6 + lit(0.5))
            .cast("long"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("cm")).as("si"))
      val inter = e.join(
          broadcast(cent.select(col("label").as("olabel"), col("cvec"))),
          col("label") =!= col("olabel"))
        .withColumn("cm",
          floor(Dedup.cosine(col("vec"), col("cvec")) * 1e6 + lit(0.5))
            .cast("long"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("no"), sum(col("cm")).as("so"))
      intra.join(inter, "label")
        .select(col("label"), col("n"),
          graft.functions.EngineMath.roundAway(
            expr("(CAST(si AS DOUBLE) / 1e6) / n"), 6).as("intra_cos"),
          graft.functions.EngineMath.roundAway(
            expr("(CAST(so AS DOUBLE) / 1e6) / no"), 6).as("inter_cos"),
          graft.functions.EngineMath.roundAway(
            expr("(CAST(si AS DOUBLE) / 1e6) / n - (CAST(so AS DOUBLE) / 1e6) / no"),
            6).as("margin"))
        .orderBy(col("label"))
    }),
    // x129: SCD2 dimension RECONSTRUCTION + temporal join — build the
    // versioned per-user tier history from the event log (tier = integer
    // thresholds over the EXACT micro-quantized cumulative value; a
    // change opens an interval, lead() closes it) and join purchases to
    // the tier valid at their time. Intervals live in per-user SEQUENCE
    // space (row_number over the unique (ts, event_id) order), so
    // identical-timestamp boundary ties cannot double-match. The join is
    // user-keyed with a range residual — per-user fan-out is the user's
    // version count, never rows.
    "x129_scd2_tiers" -> ((s, dir) => {
      val wSeq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wCum = wSeq.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val e = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir)
          .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
          .withColumn("seq", row_number().over(wSeq).cast("long"))
          .withColumn("cum", sum(col("vm")).over(wCum))
          .withColumn("tier",
            when(col("cum") < 100000000L, 0L)
              .when(col("cum") < 500000000L, 1L).otherwise(2L))
          .select(col("user_id"), col("event_type"), col("vm"), col("seq"),
            col("tier"),
            lag(col("tier"), 1).over(wSeq).as("prev_tier")))
      val wVer = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("vf"))
      val dim = e
        .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
        .select(col("user_id"), col("tier"), col("seq").as("vf"))
        .withColumn("vt", lead(col("vf"), 1).over(wVer))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("seq"), col("vm"))
      purchases.join(dim,
          purchases("user_id") === dim("user_id") &&
            purchases("seq") >= dim("vf") &&
            (dim("vt").isNull || purchases("seq") < dim("vt")))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_purchases"),
          graft.functions.EngineMath.roundAway(
            sum(col("vm")).cast("double") / 1e6, 6).as("amount"))
        .orderBy(col("tier"))
    }),
    // x130: k-core decomposition (k=75, 6 synchronous peel rounds —
    // measured: the cascade runs 3-4 rounds to a NONEMPTY fixpoint at
    // sf0.01/sf0.1 and to the correctly-empty 75-core at sf0.001; a k
    // below the degree floor would make the peel a no-op) over the
    // co-purchase part graph: the community-pruning step before graph
    // embeddings. Per round one degree aggregate + two node-keyed
    // semi-joins; localCheckpoint truncates the doubling lineage
    // (KCoreSpec pins the multi-round cascade on a planted graph).
    "x130_kcore" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val und = po.as("a").join(po.as("b"), "ok")
        .filter(col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst")).distinct()
      graft.operators.Graph.kCore(und, "src", "dst", k = 75, rounds = 6)
    }),
    // x122: typo-grade near-dup pairs — x91's sorted-neighborhood
    // candidates verified by CHARACTER-level Levenshtein ≤ 60 (unit-cost
    // DP, identical in both engines) instead of token Jaccard: catches
    // edit-distance duplicates whose token sets already diverged.
    "x122_edit_pairs" -> ((s, dir) =>
      graft.operators.Snm.editPairs(table(s, dir, "documents"),
        "doc_id", "text", blockCol = "lang", w = 5, prefixLen = 24,
        maxDist = 60)),
    // x116: blocklist policy gate — broadcast term blocklist, per-doc hit
    // count (duplicates count — a hit-RATE gate, not a membership test)
    // and a >10% token-share block decision. The list rides the plan as
    // an array literal (a learned list broadcasts the same way); linear
    // scan, no shuffle.
    "x116_blocklist_gate" -> ((s, dir) => {
      val terms = BlocklistTerms.map(lit(_))
      table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        .select(col("doc_id"), size(col("ts")).cast("long").as("n_tok"),
          size(filter(col("ts"),
            t => array_contains(array(terms: _*), t))).cast("long")
            .as("n_hits"))
        .filter(col("n_tok") > 0)
        .withColumn("blocked",
          col("n_hits").cast("double") > col("n_tok").cast("double") * 0.1)
        .orderBy(col("doc_id"))
    }),
    // x139: calibration reliability bins for the x70/x88 quality model —
    // predicted sigmoid probabilities vs observed positive rate per
    // EQUAL-FREQUENCY score decile (fixed [0,1] deciles collapse to one
    // bin when the base rate concentrates the scores — measured at
    // sf0.01), the standard "is the scorer's confidence honest" report
    // before its scores gate data. bin = (rank−1)·10 div N is
    // closed-form off the (score, doc_id) rank, so both engines bin
    // identically with no ntile semantics in play; probabilities
    // micro-quantize BEFORE the per-bin mean (the x101 device —
    // floor(·1e6+0.5) is also exp's last-ulp insurance), so the bin
    // means are exact integer sums. The rank is the x113 bucket-prefix-
    // sum device (Ranks.globalRowNumber keyed by floor(score·1024) —
    // monotone in score, so bucket order ≡ score order): no rows-scale
    // single-task sort anywhere in the plan; the DuckDB oracle keeps the
    // naive global row_number, so the hash match is the losslessness gate.
    "x139_calibration" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val model = graft.operators.Fitted.getOrFit(s,
        graft.operators.Fitted.key(dir, "qlr",
          "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
        graft.operators.QualityFilter.fit(docs, "doc_id", "text",
          isTarget = col("source") === "src0")
      }
      Stage.write(model, dir, "x139_weights")
      val scored = graft.operators.QualityFilter
        .logits(docs, "doc_id", "text", model)
        .select(col("id").as("doc_id"),
          graft.functions.EngineMath.roundAway(col("logit"), 6).as("score"))
        .join(docs.select(col("doc_id"),
          (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
        .withColumn("pm",
          floor(lit(1e6) / (lit(1.0) + exp(-col("score"))) + lit(0.5))
            .cast("long"))
      graft.operators.Ranks.globalRowNumber(scored,
          floor(col("score") * lit(1024.0)),
          Seq(col("score").asc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("nn"))))
        .withColumn("bin", expr("((rk - 1) * 10) div nn"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pm")).as("sp"),
          sum(col("pos")).as("np"))
        .select(col("bin"), col("n"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sp AS DOUBLE) / 1e6 / n"), 6).as("mean_pred"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(np AS DOUBLE) / n"), 6).as("frac_pos"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sp AS DOUBLE) / 1e6 / n - CAST(np AS DOUBLE) / n"),
            6).as("gap"))
        .orderBy(col("bin"))
    }),
    // x140: inter-labeler agreement (Cohen's kappa) between two
    // independent document gates — the char-length rule and the
    // token-count rule: the pre-flight check that two cheap heuristic
    // labelers measure the same thing before either routes data. The
    // confusion matrix is four integer counts off ONE scan (no shuffle
    // beyond the single-row agg); kappa is one fixed-order double chain
    // over those exact integers (shared KappaSql string).
    "x140_cohens_kappa" -> ((s, dir) =>
      table(s, dir, "documents")
        .select((col("n_chars") >= 250).cast("long").as("la"),
          (TextFunctions.tokenCount(col("text")) >= 40).cast("long").as("lb"))
        .agg(count(lit(1)).as("n"),
          sum(col("la") * col("lb")).as("n11"),
          sum(col("la") * (lit(1L) - col("lb"))).as("n10"),
          sum((lit(1L) - col("la")) * col("lb")).as("n01"))
        .select(col("n"), col("n11"), col("n10"), col("n01"),
          (col("n") - col("n11") - col("n10") - col("n01")).as("n00"))
        .withColumn("kappa",
          graft.functions.EngineMath.roundAway(expr(KappaSql), 6))),
    // x141: association rules over per-user event-type baskets —
    // support/confidence/lift for directed pairs a→b with a min-support
    // floor, the classic co-behavior miner. The per-user pair join is
    // bounded by the type alphabet (alphabet² per user, never rows²);
    // singles and the user total are broadcast dims; counts stay
    // integer until three final fixed-order ratios.
    "x141_assoc_rules" -> ((s, dir) => {
      val ut = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type")).distinct())
      val tot = ut.agg(countDistinct(col("user_id")).as("nu"))
      val single = ut.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      ut.as("a").join(ut.as("b"), "user_id")
        .filter(col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("ante"),
          col("b.event_type").as("cons"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
        .join(broadcast(single.select(col("event_type").as("ante"),
          col("c").as("n_a"))), "ante")
        .join(broadcast(single.select(col("event_type").as("cons"),
          col("c").as("n_b"))), "cons")
        .crossJoin(broadcast(tot))
        .select(col("ante"), col("cons"), col("n_ab"), col("n_a"),
          col("n_b"),
          graft.functions.EngineMath.roundAway(
            col("n_ab").cast("double") / col("nu"), 6).as("support"),
          graft.functions.EngineMath.roundAway(
            col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
          graft.functions.EngineMath.roundAway(
            col("n_ab").cast("double") * col("nu") /
              (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
        .orderBy(col("ante"), col("cons"))
    }),
    // x142: Zipf-law fit — OLS slope/intercept of ln(freq) on ln(rank)
    // over the top-100 tokens, the corpus-health fingerprint (natural
    // text ≈ −1; templated/boilerplate corpora bend it). The ln terms
    // micro-quantize to integers BEFORE the sums (order-free exact; the
    // +0.5 floor is ln's last-ulp insurance), and the closed-form
    // normal-equation chain is ONE shared string over those exact
    // integer sums. Top-100 via orderBy+limit; the rank window runs
    // over 100 bounded rows.
    "x142_zipf_fit" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(100)
      val wR = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("t"))
      counts
        .withColumn("rk", row_number().over(wR).cast("long"))
        .withColumn("xm",
          floor(log(col("rk").cast("double")) * 1e6 + lit(0.5)).cast("long"))
        .withColumn("ym",
          floor(log(col("c").cast("double")) * 1e6 + lit(0.5)).cast("long"))
        .agg(count(lit(1)).as("n"), sum(col("xm")).as("sx"),
          sum(col("ym")).as("sy"), sum(col("xm") * col("ym")).as("sxy"),
          sum(col("xm") * col("xm")).as("sxx"))
        .select(col("n").as("n_terms"),
          graft.functions.EngineMath.roundAway(expr(ZipfSlopeSql), 6)
            .as("slope"),
          graft.functions.EngineMath.roundAway(expr(ZipfInterceptSql), 6)
            .as("intercept"))
    }),
    // x143: day-of-week seasonal index — per-dow mean event value over
    // the global mean (ratio-to-overall, the classic multiplicative
    // seasonality profile a scheduler reads before trusting a daily
    // drift monitor). Micro-quantized integer sums; the two-level ratio
    // is ONE shared string; the dow frame is 7 bounded rows. Engines
    // differ on week origin (Spark Sunday=1, DuckDB Sunday=0) — the
    // Spark side shifts to the DuckDB convention.
    "x143_seasonal_index" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        (dayofweek(col("ts")) - lit(1)).cast("long").as("dow"),
        floor(col("value") * 1e6 + lit(0.5)).cast("long").as("vm"))
      val tot = e.agg(count(lit(1)).as("nn"), sum(col("vm")).as("st"))
      e.groupBy(col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), col("n"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sv AS DOUBLE) / 1e6 / n"), 6).as("dow_mean"),
          graft.functions.EngineMath.roundAway(expr(SeasonalSql), 6)
            .as("seasonal_index"))
        .orderBy(col("dow"))
    }),
    // x144: CUSUM changepoint — the day where the cumulative deviation
    // of daily event counts from the overall mean peaks, the
    // level-shift detector behind "when did the pipeline's volume
    // change". ENTIRELY integer until one final division: S_i·D =
    // cum_i·D − i·T (argmax |S·D|, tie → earliest day), so both
    // engines agree bit-exactly with no mean in the loop; the cumsum
    // window runs over the bounded day axis.
    "x144_cusum_changepoint" -> ((s, dir) =>
      cusumOverDaily(Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c")))),
    // x149: the STREAM-maintained twin of x144 — daily counts build
    // incrementally in x123's stateful aggregate (re-summed over the
    // bounded type axis at read time; addition is exact, so stream ≡
    // batch), then the SAME shared CUSUM read. Same oracle as x144:
    // the changepoint monitor must land exactly where the batch scan
    // does.
    "x149_stream_cusum" -> ((s, dir) =>
      cusumOverDaily(graft.streaming.StreamOps.dailyCountsStreaming(
        s, s"$dir/events.parquet")
        .groupBy(col("day")).agg(sum(col("n")).as("c")))),
    // x145: synchronous mode-label propagation (2 rounds) over the part
    // co-purchase graph — the cheap community detector run before
    // sharding related content together. Each round: per (node,
    // neighbor-label) counts, then the (count DESC, label ASC) argmax —
    // fully deterministic, no damping, ties always resolve to the
    // smallest label. Per-round cost is one edge-keyed shuffle + one
    // node aggregate (the x86 iteration shape); the oracle unrolls both
    // rounds.
    "x145_label_prop" -> ((s, dir) =>
      labelPropagate(coPurchaseEdges(s, dir), rounds = 2)
        .orderBy(col("node"))),
    // x146: bipartite Adamic-Adar over the part–order graph — part pairs
    // scored by Σ 1/ln(order size) over their SHARED orders, the
    // link-prediction weighting that discounts bulk orders (a 100-item
    // order says little about any pair inside it; a 2-item order says a
    // lot). Weights micro-quantize off the INTEGER order size
    // (1e6/ln insurance floor), so per-pair sums and the top-50 argsort
    // are integer-exact. Scale shape: the pair fan-out is per-ORDER
    // bounded (C(order size, 2), x117's measured-linear join) — unlike a
    // part-part wedge join, whose Σ deg² cost goes quadratic under
    // densification (measured: 23 s at sf0.1 before this formulation); a
    // shared order has ≥ 2 parts by construction, so ln never sees 1.
    "x146_adamic_adar" -> ((s, dir) => {
      val po = graft.engine.CacheScope.persistTracked(
        table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct())
      val osz = po.groupBy(col("ok")).agg(count(lit(1)).as("k"))
        .filter(col("k") >= 2)
        .select(col("ok"),
          floor(lit(1e6) / log(col("k").cast("double")) + lit(0.5))
            .cast("long").as("wm"))
      po.as("a").join(po.as("b"), "ok")
        .filter(col("a.pk") < col("b.pk"))
        .join(osz, "ok")
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(sum(col("wm")).as("swm"), count(lit(1)).as("n_common"))
        .orderBy(col("swm").desc, col("u"), col("v"))
        .limit(50)
        .select(col("u"), col("v"), col("n_common"),
          graft.functions.EngineMath.roundAway(
            col("swm").cast("double") / 1e6, 6).as("aa_score"))
    }),
    // x147: BM25 relevance against a fixed query-term set — the
    // retrieval scorer a curation pipeline runs to pull topical slices.
    // tf/df/dl stay integer; each term's contribution is ONE shared
    // string over (tf, dl, df, nn, tt); the per-doc sum folds over the
    // ≤|query| bounded terms in term order. df and the corpus totals
    // broadcast; one tokens scan otherwise.
    "x147_bm25" -> ((s, dir) => {
      val qTerms = Bm25Query.map(lit(_))
      val toksD = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
          .filter(size(col("ts")) > 0))
      val tot = toksD.agg(count(lit(1)).as("nn"),
        sum(size(col("ts"))).as("tt"))
      val tf = toksD
        .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
          explode(col("ts")).as("t"))
        .filter(col("t").isin(Bm25Query: _*))
        .groupBy(col("doc_id"), col("t"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "t")
        .crossJoin(broadcast(tot))
        .withColumn("contrib", expr(Bm25TermSql))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), max(col("dl")).as("dl"),
          sort_array(collect_list(struct(col("t"), col("contrib"))))
            .as("cs"))
        .select(col("doc_id"), col("n_terms"), col("dl"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
              "(acc, v) -> acc + v)"), 6).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(50)
    }),
    // x163: character-trigram LM scoring — gibberish/encoding-noise
    // detection one level below x59's word bigrams: per-doc mean
    // ln((c3+1)/(c2+V)) under the corpus's own char-trigram counts.
    // Same two-deliberate-scans + position-ordered fold device as
    // x50/x59; the char explode is the linear scan (≈ corpus chars),
    // count tables broadcast (alphabet-bounded: ≤27³ trigrams).
    "x163_char_trigram_lm" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"),
          regexp_replace(lower(col("text")), "[^a-z ]", "").as("cs"))
        .filter(length(col("cs")) >= 3)
      // ONE explode pass total (the first cut's three instance passes
      // measured 71-117 s at 10×): positions explode to a compact int
      // sequence, substr AFTER the explode (no per-doc struct-array
      // build), instances collapse immediately to (doc, tri, m) — the
      // ONLY corpus-scale shuffle. Bigram counts DERIVE from the tiny
      // trigram table (each position's bigram is its trigram's 2-prefix,
      // so c2 = Σ c3 over the prefix — no second pass); the checkpoint
      // breaks the dtc self-reference (the a17/x156/x165 trap).
      val dtc = d
        .select(col("doc_id"), col("cs"),
          explode(expr("sequence(1, length(cs) - 2)")).as("pos"))
        .select(col("doc_id"), expr("substr(cs, pos, 3)").as("tri"))
        .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("m"))
        .localCheckpoint()
      val c3 = dtc.groupBy(col("tri")).agg(sum(col("m")).as("c3"))
      val c2 = c3.groupBy(expr("substr(tri, 1, 2)").as("bi"))
        .agg(sum(col("c3")).as("c2"))
      val v3 = c3.agg(count(lit(1)).as("v"))
      // nano-quantized per-trigram log-probs make the per-doc sum a
      // plain INTEGER aggregate — map-side combinable, no ordered fold
      // (the x101 device; lp ∈ (−20, 0) so ·1e9 fits a long)
      dtc
        .withColumn("bi", expr("substr(tri, 1, 2)"))
        .join(broadcast(c3), "tri").join(broadcast(c2), "bi")
        .crossJoin(broadcast(v3))
        .select(col("doc_id"), col("m"),
          floor(log((col("c3") + lit(1.0)) /
            (col("c2") + col("v")).cast("double")) * 1e9 + lit(0.5))
            .cast("long").as("lpm"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_tri"), sum(col("m") * col("lpm")).as("slpm"))
        .select(col("doc_id"), col("n_tri"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(slpm AS DOUBLE) / 1e9 / n_tri"), 6).as("mean_lp"))
        .orderBy(col("doc_id"))
    }),
    // x164: dedup impact report — per-source before/after accounting of
    // exact text dedup (keeper = min doc_id per md5 group, GLOBAL — a
    // keeper in one source removes copies in every other): the
    // "what did dedup cost each domain" datacard row. All integer; the
    // keeper window is md5-partitioned (hash-keyed, never one
    // partition).
    "x164_dedup_impact" -> ((s, dir) => {
      val wH = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("doc_id"))
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntk"))
        .withColumn("keep", (row_number().over(wH) === 1).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"),
          sum(col("ntk")).as("tokens"),
          sum(col("keep") * col("ntk")).as("tokens_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tokens"), (col("tokens") - col("tokens_kept")).as("tokens_removed"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tokens - tokens_kept AS DOUBLE) / tokens"), 6)
            .as("pct_removed"))
        .orderBy(col("source"))
    }),
    // x165: MinHash estimate calibration — |sig-agreement/128 − exact J|
    // over a fixed-size deterministic sample of x91's SNM candidate
    // pairs: the measurement that says how many hashes the signature
    // actually needs. PROBE-COST SHAPE (round 10, retiring the r9
    // full-index build that was the suite's most expensive query at
    // 8.3×-on-10× — the linear 128-hash floor): the statistic is a
    // mean/max over pairs, so an md5-ticket top-2000 sample answers it
    // with the same statistical content, and only the ≤4000 sampled
    // docs get shingled and signed — constant work at ANY corpus size.
    // Signatures stage once (the x08 device — DuckDB re-derives the
    // estimate from the staged table, no xxhash in SQL); errors
    // micro-quantize so the mean is an exact integer sum, no collect.
    "x165_minhash_estimate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val cand = graft.operators.Snm.candidateIdPairs(docs, "doc_id",
        "text", blockCol = "lang", w = 5, prefixLen = 24)
      // deterministic fixed-size sample: md5-ticket total order with
      // exact integer tie-break (TakeOrderedAndProject — no full sort);
      // checkpointed so the candidate pass runs ONCE for both the id
      // set and the pair frame
      val samp = cand
        .withColumn("tk", md5(concat(col("id_a").cast("string"), lit(":"),
          col("id_b").cast("string"))))
        .orderBy(col("tk"), col("id_a"), col("id_b")).limit(2000)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val ids = samp.select(col("id_a").as("did"))
        .union(samp.select(col("id_b").as("did"))).distinct()
      // TWO checkpoint boundaries, both load-bearing (now over the
      // bounded sampled-doc set, not the corpus):
      //  1. shingles materialize BEFORE the 128-hash signature —
      //     CollapseProject otherwise inlines the shingle expression
      //     into every signature element, re-tokenizing 128× per row
      //     (measured 450 s vs ~6 s at sf0.1 on the full-corpus form);
      //  2. the signature table materializes before its two join
      //     references — a persisted subtree loses cache substitution
      //     in its own self-join (the a17/x156 trap).
      val shd = docs.join(ids, col("doc_id") === col("did"), "left_semi")
        .select(col("doc_id").as("id"),
          TextFunctions.shingles(col("text"), 3).as("sh")).localCheckpoint()
      val sigs = shd.select(col("id"),
        Dedup.minhashSignatureOf(col("sh"), numHashes = 128).as("sig"),
        col("sh")).localCheckpoint()
      Stage.write(sigs.select(col("id"), col("sig")), dir, "x165_sigs")
      samp
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sa"),
          col("sh").as("sha")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sb"),
          col("sh").as("shb")), "id_b")
        .filter(size(array_distinct(concat(col("sha"), col("shb")))) > 0)
        .select(
          size(expr("filter(zip_with(sa, sb, (x, y) -> x = y), b -> b)"))
            .cast("long").as("agree"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_distinct(concat(col("sha"), col("shb"))))
              .cast("double")).as("j"))
        .select(col("agree"),
          floor(abs(col("agree").cast("double") / 128.0 - col("j")) * 1e6
            + lit(0.5)).cast("long").as("em"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("em")).as("sem"),
          max(col("em")).as("mx"))
        .select(col("n_pairs"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sem AS DOUBLE) / 1e6 / n_pairs"), 6)
            .as("mean_abs_err"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mx AS DOUBLE) / 1e6"), 6).as("max_abs_err"))
    }),
    // x160: TF-IDF lexical search — "find documents like this one"
    // without embeddings: per-doc sparse tf·idf vectors, cosine via the
    // shared-term join, top-10 per query doc. Weights are exact
    // integers (tf · micro-idf); dot products and squared norms ride
    // DECIMAL(38,0) so a 100 TB document can't overflow; the cosine
    // chain is ONE shared string off those exact sums. Query side is 3
    // docs — the x10 broadcast shape.
    "x160_tfidf_search" -> ((s, dir) => {
      val k = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
            .as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf")))
      val tot = k.select(col("doc_id")).distinct().agg(count(lit(1)).as("nn"))
      val idf = k.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(tot))
        .select(col("t"),
          floor(log((col("nn") + lit(1)).cast("double") / (col("df") + lit(1)))
            * 1e6 + lit(0.5)).cast("long").as("idfm"))
      val w = graft.engine.CacheScope.persistTracked(
        k.join(idf, "t").select(col("doc_id"), col("t"),
          (col("tf") * col("idfm")).as("w")))
      val norms = w.groupBy(col("doc_id"))
        .agg(sum((col("w") * col("w")).cast("decimal(38,0)")).as("nsq"))
      val qw = w.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("t"), col("w").as("wq"))
      val dots = w.join(qw, "t")
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum((col("w") * col("wq")).cast("decimal(38,0)")).as("dot"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cos").desc, col("doc_id"))
      dots
        .join(norms.select(col("doc_id"), col("nsq").as("nd")), "doc_id")
        .join(norms.select(col("doc_id").as("query_id"),
          col("nsq").as("nq")), "query_id")
        .withColumn("cos", expr(TfidfCosSql))
        .withColumn("rank", row_number().over(wR).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          graft.functions.EngineMath.roundAway(col("cos"), 6).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),
    // x161: SimHash candidate-quality evaluation — precision/recall/F1
    // of the banded hamming≤10 pairs (x08's index shape) against the
    // LOSSLESS prefix-filtered exact-Jaccard truth at 0.8 (x92's path,
    // sub-quadratic on BOTH sides — no all-pairs join anywhere in the
    // engine). The three ratios are integer-count divisions; this is
    // the measurement that justifies (or indicts) shipping the cheap
    // signature index.
    "x161_simhash_eval" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val sh = graft.engine.CacheScope.persistTracked(
        Dedup.simhashTable(docs, "doc_id", "text"))
      Stage.write(sh, dir, "x161_simhash")
      val pred = Dedup.simhashPairsOf(sh, maxDist = 10)
        .select(col("id_a"), col("id_b"))
      val truth = Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
        k = 3, threshold = 0.8).select(col("id_a"), col("id_b"))
      val tp = pred.join(truth, Seq("id_a", "id_b")).agg(count(lit(1)).as("tp"))
      pred.agg(count(lit(1)).as("n_pred"))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
        .crossJoin(broadcast(tp))
        .select(col("n_truth"), col("n_pred"), col("tp"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tp AS DOUBLE) / n_pred"), 6).as("precision"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tp AS DOUBLE) / n_truth"), 6).as("recall"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(2 * tp AS DOUBLE) / (n_pred + n_truth)"), 6).as("f1"))
    }),
    // x162: optimal quality-gate threshold — sweep every distinct x03
    // quality score as a candidate cutoff and pick the F1-argmax against
    // the src0 labels: the operating-point selection every filter ships
    // with. Cumulative TP/FP ride the score-DESC window over DISTINCT
    // scores (bounded by the 4-dp quantization, ≤10⁴ rows); F1
    // micro-quantizes off the integer counts so the argmax is
    // integer-keyed (ties → higher threshold).
    "x162_optimal_threshold" -> ((s, dir) => {
      val scored = table(s, dir, "documents")
        .select(
          TextFunctions.qualityScoreOf(
            TextFunctions.tokens(col("text")), col("text")).as("score"),
          (col("source") === "src0").cast("long").as("pos"))
      val byScore = scored.groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
      val tot = byScore.agg(sum(col("n")).as("nn"), sum(col("np")).as("p"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      byScore
        .withColumn("tp", sum(col("np")).over(wCum))
        .withColumn("predn", sum(col("n")).over(wCum))
        .crossJoin(broadcast(tot))
        .withColumn("fp", col("predn") - col("tp"))
        .withColumn("fn", col("p") - col("tp"))
        .withColumn("f1m", expr(F1MicroSql))
        .orderBy(col("f1m").desc, col("score").desc)
        .limit(1)
        .select(col("score").as("threshold"), col("tp"), col("fp"), col("fn"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tp AS DOUBLE) / (tp + fp)"), 6).as("precision"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tp AS DOUBLE) / (tp + fn)"), 6).as("recall"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(f1m AS DOUBLE) / 1e6"), 6).as("f1"))
    }),
    // x157: IDF-weighted Jaccard near-dup verification — x91's
    // sorted-neighborhood candidates re-scored with Σ idf(∩)/Σ idf(∪)
    // instead of set Jaccard, so shared RARE tokens count and shared
    // boilerplate doesn't: the docs that agree on distinctive content
    // surface. idf micro-quantizes to integers, per-doc weight sums
    // precompute once, and the 0.3 threshold compares as
    // 10·sI ≥ 3·(sA+sB−sI) — ENTIRELY integer, no float in the gate.
    // Same O(n·w) candidate bound as x91; the idf table floors its
    // Zipf tail at 100 TB like x50's head.
    "x157_weighted_jaccard" -> ((s, dir) => {
      val k = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("lang"),
          array_distinct(TextFunctions.tokens(col("text"))).as("ts"),
          substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
            1, 24).as("bk")))
      val tot = k.agg(count(lit(1)).as("nn"))
      val idf = k.select(explode(col("ts")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(tot))
        .select(col("t"),
          floor(log((col("nn") + lit(1)).cast("double") / (col("df") + lit(1)))
            * 1e6 + lit(0.5)).cast("long").as("wm"))
      val docw = k.select(col("doc_id").as("id"), explode(col("ts")).as("t"))
        .join(idf, "t").groupBy(col("id")).agg(sum(col("wm")).as("sw"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("bk"), col("doc_id"))
      val r = k.withColumn("rnk", row_number().over(wB).cast("long"))
      val cand = r
        .select(col("lang"), col("doc_id").as("ida"), col("ts").as("tsa"),
          col("rnk"), explode(typedlit((1L to 5L).toSeq)).as("d"))
        .withColumn("rnk_b", col("rnk") + col("d"))
        .join(r.select(col("lang"), col("doc_id").as("idb"),
          col("ts").as("tsb"), col("rnk").as("rnk_b")), Seq("lang", "rnk_b"))
        .select(col("ida"), col("idb"), col("tsa"), col("tsb"))
      val inter = cand
        .select(col("ida"), col("idb"), col("tsb"),
          explode(col("tsa")).as("t"))
        .filter(array_contains(col("tsb"), col("t")))
        .join(idf, "t")
        .groupBy(col("ida"), col("idb")).agg(sum(col("wm")).as("si"))
      cand.select(col("ida"), col("idb"))
        .join(inter, Seq("ida", "idb"), "left")
        .join(docw.select(col("id").as("ida"), col("sw").as("sa")), "ida")
        .join(docw.select(col("id").as("idb"), col("sw").as("sb")), "idb")
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"),
          coalesce(col("si"), lit(0L)).as("si"),
          (col("sa") + col("sb") - coalesce(col("si"), lit(0L))).as("su"))
        .filter(col("su") > 0 && lit(10L) * col("si") >= lit(3L) * col("su"))
        .select(col("id_a"), col("id_b"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(si AS DOUBLE) / CAST(su AS DOUBLE)"), 6).as("wjaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x158: user lifecycle cohorts — weekly growth accounting (new /
    // retained / resurrected) off each user's active-week sequence: the
    // engagement report behind every retention dashboard (x76 measures
    // a fixed cohort's comeback; this classifies EVERY active week).
    // Weeks become integer epoch-week indices, so the lag comparison is
    // integer and the state CASE is ONE shared string; per-user state
    // is the bounded active-week axis.
    "x158_lifecycle_cohorts" -> ((s, dir) => {
      val weekly = Tables.events(s, dir)
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk")).distinct()
        .withColumn("wd", expr("datediff(wk, DATE '1970-01-05') div 7"))
      val wU = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("wd"))
      weekly.withColumn("pwd", lag(col("wd"), 1).over(wU))
        .withColumn("state", expr(LifecycleCaseSql))
        .groupBy(col("wk"), col("state"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("wk"), col("state"))
    }),
    // x159: skip-gram co-occurrence — distance-weighted (1/d, d ≤ 2)
    // token-pair counts, the word2vec-style corpus statistic one step
    // wider than x89's adjacent-only PMI. Weights are exact integers
    // (1e6/d for d ∈ {1,2}), counts per distance stay separate columns,
    // and the top-50 argsort is integer-keyed.
    "x159_skipgram_pairs" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(TextFunctions.tokens(col("text")).as("ts")))
      def atDist(d: Int) = toks.filter(size(col("ts")) > d)
        .select(explode(expr(s"transform(sequence(1, size(ts) - $d), " +
          s"i -> struct(element_at(ts, i) AS a, element_at(ts, i + $d) AS b))"))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), lit(d.toLong).as("d"))
      atDist(1).union(atDist(2))
        .groupBy(col("a"), col("b"))
        .agg(sum(when(col("d") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("d") === 2, 1L).otherwise(0L)).as("n2"),
          sum(expr("1000000 div d")).as("swm"))
        .orderBy(col("swm").desc, col("a"), col("b"))
        .limit(50)
        .select(col("a"), col("b"), col("n1"), col("n2"),
          graft.functions.EngineMath.roundAway(
            col("swm").cast("double") / 1e6, 6).as("score"))
    }),
    // x156: MMR (maximal marginal relevance) diversified re-ranking —
    // 5 greedy picks per query from the exact top-10 pool, maximizing
    // λ·rel − (1−λ)·max-sim-to-selected (λ=0.7): the standard
    // redundancy-pruning re-rank after retrieval. ENTIRELY integer
    // greedy: rel and pairwise sims micro-quantize once, so the score
    // is 7·relm − 3·maxsimm and every argmax is integer-keyed — no
    // float comparison anywhere in the loop. All state is
    // pool-bounded (10 rows/query, 90 sims/query); the oracle unrolls
    // the 5 rounds.
    "x156_mmr_diversify" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        call_function("graft_dot", x, y)
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("vec").as("qv"),
          sqrt(dot(col("vec"), col("vec"))).as("qnorm"))
      val it = e.select(col("vec_id").as("item_id"), col("vec").as("iv"),
        sqrt(dot(col("vec"), col("vec"))).as("inorm"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
      val pool0 = it.crossJoin(broadcast(q))
        .filter(col("item_id") =!= col("query_id"))
        .withColumn("cos",
          dot(col("iv"), col("qv")) / (col("inorm") * col("qnorm")))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 10)
        .withColumn("relm", floor(col("cos") * 1e6 + lit(0.5)).cast("long"))
        .select(col("query_id"), col("item_id"), col("iv"), col("inorm"),
          col("relm"))
      // the pool is BOUNDED (10 rows × |queries|) — collect it once and
      // re-parallelize, so the corpus-scale brute scan runs exactly ONE
      // action (a persisted pool referenced in its own self-join loses
      // cache substitution and re-scans — the a17 trap; measured 23 s →
      // the scan cost once). The greedy loop then runs on local-sized
      // frames only.
      val pool = s.createDataFrame(
        s.sparkContext.parallelize(pool0.collect().toSeq, 1), pool0.schema)
      val sims = pool.as("x").join(pool.as("y"), "query_id")
        .filter(col("x.item_id") =!= col("y.item_id"))
        .select(col("query_id"), col("x.item_id").as("ca"),
          col("y.item_id").as("cb"),
          floor(dot(col("x.iv"), col("y.iv")) /
            (col("x.inorm") * col("y.inorm")) * 1e6 + lit(0.5))
            .cast("long").as("simm"))
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("scorem").desc, col("item_id"))
      var picked = pool.withColumn("scorem", lit(7L) * col("relm"))
        .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
        .select(col("query_id"), col("item_id"), lit(1L).as("pick_no"),
          col("scorem"))
      for (r <- 2 to 5) {
        val maxs = sims
          .join(picked.select(col("query_id"), col("item_id").as("cb")),
            Seq("query_id", "cb"))
          .groupBy(col("query_id"), col("ca"))
          .agg(max(col("simm")).as("maxsimm"))
          .select(col("query_id"), col("ca").as("item_id"), col("maxsimm"))
        val next = pool
          .join(picked.select(col("query_id"), col("item_id")),
            Seq("query_id", "item_id"), "left_anti")
          .join(maxs, Seq("query_id", "item_id"), "left")
          .withColumn("scorem",
            lit(7L) * col("relm") - lit(3L) * coalesce(col("maxsimm"), lit(0L)))
          .withColumn("rk", row_number().over(wPick)).filter(col("rk") === 1)
          .select(col("query_id"), col("item_id"), lit(r.toLong).as("pick_no"),
            col("scorem"))
        picked = picked.union(next)
      }
      picked.select(col("query_id"), col("pick_no"), col("item_id"),
        graft.functions.EngineMath.roundAway(
          col("scorem").cast("double") / 1e7, 6).as("mmr_score"))
        .orderBy(col("query_id"), col("pick_no"))
    }),
    // x154: modularity of the x145 label-propagation partition — the
    // "did the communities actually capture structure" score:
    // Q = Σ_c e_c/m − (d_c/2m)². ENTIRELY integer numerator
    // (4·m·Σe_c − Σd_c²) over exact edge/degree sums, one final
    // division — both engines agree bit-exactly. Shares x145's edge
    // surface and propagation helper (one definition, cannot drift).
    "x154_modularity" -> ((s, dir) => {
      val und = graft.engine.CacheScope.persistTracked(
        coPurchaseEdges(s, dir))
      val labels = graft.engine.CacheScope.persistTracked(
        labelPropagate(und, rounds = 2))
      val m = und.agg(count(lit(1)).as("m"))
      val ec = und
        .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
        .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("label")).agg(count(lit(1)).as("ec"))
      val deg = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val dc = deg.join(labels, "node")
        .groupBy(col("label")).agg(sum(col("deg")).as("dc"))
      dc.join(ec, Seq("label"), "left")
        .select(col("label"), coalesce(col("ec"), lit(0L)).as("ec"),
          col("dc"))
        .agg(count(lit(1)).as("n_communities"), sum(col("ec")).as("sec"),
          sum(col("dc") * col("dc")).as("sdc2"))
        .crossJoin(broadcast(m))
        .select(col("n_communities"), col("m"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(4 * m * sec - sdc2 AS DOUBLE) / " +
              "CAST(4 * m * m AS DOUBLE)"), 6).as("q"))
    }),
    // x155: Poisson bootstrap confidence interval for the mean event
    // value — the scale-standard resampling (per-replica weights drawn
    // independently per row, so replicas build in ONE pass with no
    // global resample). Weights come off a SHARED inverse-CDF CASE over
    // the md5 ticket (deterministic, engine-identical); replica means
    // ride exact integer Σw/Σw·vm; the CI is an order-statistic read of
    // the 20 bounded replica means.
    "x155_poisson_bootstrap" -> ((s, dir) => {
      val e = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir).select(col("event_id"),
          floor(col("value") * 1e6 + lit(0.5)).cast("long").as("vm")))
      val reps = e
        .select(col("event_id"), col("vm"),
          explode(typedlit((0L until 20L).toSeq)).as("b"))
        .withColumn("u", expr("substr(md5(concat('bs', " +
          "CAST(b AS STRING), ':', CAST(event_id AS STRING))), 1, 4)"))
        .withColumn("w", expr(PoissonCaseSql))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("sw"), sum(col("w") * col("vm")).as("swv"))
        .select(col("b"), expr(BootMeanSql).as("mean_b"))
      val overall = e.agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"))
      reps.agg(sort_array(collect_list(col("mean_b"))).as("ms"))
        .crossJoin(broadcast(overall))
        .select(col("n").as("n_events"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sv AS DOUBLE) / 1e6 / n"), 6).as("mean"),
          graft.functions.EngineMath.roundAway(
            element_at(col("ms"), 2), 6).as("boot_lo"),
          graft.functions.EngineMath.roundAway(
            element_at(col("ms"), 19), 6).as("boot_hi"))
    }),
    // x150: AMS second-frequency-moment sketch vs exact F2 — Σ c_t²
    // (the "surprise number" behind join-size estimation and skew
    // detection) estimated by 8 sign-hash estimators (Σ ±c_t)², median
    // taken. Signs come off a SHARED md5 parity rule (first hex digit
    // odd), so every estimator is integer-exact in both engines; the
    // sketch row is mergeable partials only (each estimator is one
    // signed integer sum — the CMS/HLL scale story).
    "x150_ams_f2" -> ((s, dir) => {
      val counts = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("c")))
      val f2 = counts.agg(sum(col("c") * col("c")).as("f2"),
        count(lit(1)).as("n_tokens"))
      val ests = (0 until 8).map { j =>
        sum(when(expr(AmsSignOddSql(j, "t")), col("c"))
          .otherwise(-col("c"))).as(s"e$j")
      }
      val sk = counts.agg(ests.head, ests.tail: _*)
      val sq = (0 until 8).map(j => col(s"e$j") * col(s"e$j"))
      sk.crossJoin(broadcast(f2))
        .withColumn("es", sort_array(array(sq: _*)))
        .select(col("n_tokens"), col("f2"),
          ((element_at(col("es"), 4) + element_at(col("es"), 5))
            .cast("double") / 2.0).as("ams_med"))
        .select(col("n_tokens"), col("f2"), col("ams_med"),
          graft.functions.EngineMath.roundAway(
            expr("(ams_med - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE)"), 6)
            .as("rel_err"))
    }),
    // x151: Gini concentration of the token-frequency mass — the
    // inequality diagnostic behind "is this corpus a few templates in a
    // trenchcoat". ENTIRELY integer: G·(n·T) = 2·Σ rk·c − (n+1)·T over
    // the (c ASC, t ASC) rank, one final division. No per-token rank is
    // ever materialized: tokens sharing count c occupy the CONTIGUOUS
    // rank range (C−m, C] (C = inclusive cumulative vocab in c order),
    // and within the range the t tie-break cannot move mass (every
    // member has the same c), so Σ rk·c over the group is closed-form
    // c·(C(C+1) − (C−m)(C−m+1))/2. The only window runs over the
    // count-of-counts histogram — |distinct c| rows, O(√T) under Zipf —
    // and the products ride DECIMAL(38,0) (C² is past BIGINT at corpus
    // scale). The DuckDB oracle keeps the naive vocab-scale row_number;
    // the hash match proves the rank-range algebra is lossless.
    "x151_gini_concentration" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("c"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      // src2 ≡ 2·Σ rk·c (the doubled form needs no division; the rank-
      // range sum C(C+1) − (C−m)(C−m+1) is exactly 2·Σ rk over the group)
      counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
        .withColumn("cc", sum(col("m")).over(wv))
        .withColumn("src2g", expr(
          "CAST(c AS DECIMAL(38,0)) * (CAST(cc AS DECIMAL(38,0)) * (cc + 1) " +
            "- CAST(cc - m AS DECIMAL(38,0)) * (cc - m + 1))"))
        .agg(sum(col("m")).as("n_tokens"),
          sum(col("m").cast("decimal(38,0)") * col("c")).as("total_d"),
          sum(col("src2g")).as("src2"))
        .select(col("n_tokens"), col("total_d").cast("long").as("total"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(src2 - CAST(n_tokens + 1 AS DECIMAL(38,0)) * " +
              "CAST(total_d AS DECIMAL(38,0)) AS DOUBLE) / " +
              "CAST(CAST(n_tokens AS DECIMAL(38,0)) * " +
              "CAST(total_d AS DECIMAL(38,0)) AS DOUBLE)"), 6).as("gini"))
    }),
    // x152: vocabulary coverage curve — token-mass share captured by the
    // top-k vocabulary at k ∈ {10, 50, 100, 1000}: the "how big a vocab
    // do we actually need" planning curve. No vocab-scale rank: which
    // PARTICULAR tokens of an equal-count tie group make the top-k
    // cannot change the captured MASS (every member weighs the same c),
    // so the curve reads off the count-of-counts histogram — per k, a
    // group with cb tokens strictly ahead of it contributes
    // min(m, k − cb) tokens and that many · c mass. The only window is
    // the histogram's exclusive prefix (|distinct c| rows, O(√T) under
    // Zipf); per-k rows are ≤ k. DuckDB keeps the naive vocab-scale
    // row_number; the hash match proves the tie-group algebra lossless.
    "x152_coverage_curve" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
        .withColumn("cb", coalesce(sum(col("m")).over(wDesc), lit(0L)))
      val tot = hist.agg(sum(col("m") * col("c")).as("total"))
      hist.crossJoin(broadcast(tot))
        .select(explode(typedlit(CoverageKs)).as("k"), col("c"), col("m"),
          col("cb"), col("total"))
        .filter(col("cb") < col("k"))
        .withColumn("take", least(col("m"), col("k") - col("cb")))
        .groupBy(col("k"), col("total"))
        .agg(sum(col("take")).as("n_vocab"),
          sum(col("take") * col("c")).as("mass"))
        .select(col("k"), col("n_vocab"), col("mass"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mass AS DOUBLE) / CAST(total AS DOUBLE)"), 6)
            .as("share"))
        .orderBy(col("k"))
    }),
    // x153: Hill tail-index estimator over the token-frequency
    // distribution — the power-law exponent read off the top-k order
    // statistics (complements x142's global OLS with a tail-only view).
    // k = min(50, vocab−1); the ln(c_i/c_{k+1}) terms micro-quantize to
    // integers (ties → exactly 0), so the sum is order-free exact and
    // α = k·1e6/Σ is one shared string. The whole computation runs on a
    // ≤51-row frame after the top-(k+1) cut.
    "x153_hill_tail" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(51)
      val wR = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("t"))
      val ranked = graft.engine.CacheScope.persistTracked(
        counts.withColumn("rk", row_number().over(wR).cast("long")))
      val ref = ranked.agg(max(col("rk")).as("kp1"))
        .join(ranked.select(col("rk").as("kp1"), col("c").as("cref")), "kp1")
      ranked.crossJoin(broadcast(ref))
        .filter(col("rk") < col("kp1"))
        .withColumn("lm",
          floor(log(col("c").cast("double") / col("cref")) * 1e6 + lit(0.5))
            .cast("long"))
        .groupBy(col("kp1"), col("cref"))
        .agg(count(lit(1)).as("k"), sum(col("lm")).as("slm"))
        .select(col("k"), col("cref").as("c_ref"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(k AS DOUBLE) * 1e6 / slm"), 6).as("alpha"))
    }),
    // x148: NDCG@10 of the 16-dim-prefix ranking against the full-dim
    // ranking as graded truth (rel = 11 − full rank) — the ranking-
    // quality lens on x112's overlap question: position-aware, so a
    // prefix index that finds the right items in the wrong order is
    // penalized. Discount weights are Scala-computed literals (CASE
    // table — both engines parse the identical IEEE doubles, the x115
    // device); the per-query fold runs over 10 bounded rows in rank
    // order.
    "x148_ndcg" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val full = Similarity.bruteForceTopK(
        e, "vec_id", "vec", e.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10).select(col("query_id"), col("item_id"),
        (lit(11L) - col("rank")).as("rel"))
      val et = e.select(col("vec_id"), slice(col("vec"), 1, 16).as("vec"))
      val trunc = Similarity.bruteForceTopK(
        et, "vec_id", "vec", et.filter(col("vec_id") < 5), "vec_id", "vec",
        k = 10).select(col("query_id"), col("item_id"), col("rank"))
      trunc.join(full, Seq("query_id", "item_id"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        .withColumn("contrib", expr(NdcgContribSql))
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(struct(col("rank"), col("contrib"))))
          .as("cs"))
        .select(col("query_id"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
              "(acc, v) -> acc + v)"), 6).as("dcg"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
              s"(acc, v) -> acc + v) / CAST($IdcgVal AS DOUBLE)"), 6)
            .as("ndcg"))
        .orderBy(col("query_id"))
    }),
    // x166: population stability index — the industry-standard drift
    // score the KS (x134) / χ² (x135) pair is missing: per-source quality
    // distribution vs the whole corpus over 10 fixed equal-width bins of
    // the 4-dp score, Laplace-smoothed over the full bin spine so empty
    // bins contribute finitely. Everything until the ln is integer (bin
    // ids by integer division, counts, margins); the 10 per-source
    // contributions fold in bin order (the x135 device). One corpus pass
    // → a |sources|×10 cell table; all joins after it are broadcasts.
    "x166_psi_drift" -> ((s, dir) =>
      psiOverBinCounts(s, qualityBins(table(s, dir, "documents"))
        .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cc")))),
    // x167: 1-D Wasserstein (earth-mover) drift — ∫|CDF_A − CDF_B| dv
    // between the even/odd user cohorts' event-value distributions: the
    // magnitude-weighted companion to x134's sup-gap KS (a small shift
    // everywhere and a large shift in one tail can tie on KS; W₁ ranks
    // them). The numerator Σ |cumA·nB − cumB·nA|·Δv is EXACT integer
    // arithmetic end-to-end (terms ride DECIMAL(38,0) — a 100 TB event
    // log cannot overflow); ONE final division. Distinct micro-quantized
    // values collapse first, so the global-order window runs over the
    // value domain, not the event count (at 100 TB: the x113
    // bucket-prefix-sum rank or a binned CDF, as with x134).
    "x167_wasserstein_drift" -> ((s, dir) =>
      w1OverCounts(valueCohorts(Tables.events(s, dir))
        .groupBy(col("vm"))
        .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("cb")))),
    // x168: multinomial Naive Bayes source classifier — the generative
    // counterpart to x70's discriminative logistic gate (fastText-style
    // corpus classifiers are THE quality/domain labelers in large-scale
    // curation): train add-1-smoothed per-source term log-probabilities
    // on the corpus itself, score every doc against every class, report
    // per-source self-classification accuracy. All score arithmetic is
    // exact integer (nano-quantized class parameters, the x163 device);
    // unseen-term mass folds into a per-class default so only SEEN
    // (term, class) pairs join: score = prior + tm·def + Σ m·(lp − def).
    // One corpus explode (checkpointed — 3 downstream consumers); the
    // class-parameter table is vocab × |sources| (hash-bucket the vocab
    // à la x64 at 100 TB); the term-keyed join is the only big shuffle;
    // the doc×class base is |docs|·|sources| narrow rows.
    "x168_naive_bayes" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val dt = docs.select(col("doc_id"), col("source"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("source"), col("term"))
        .agg(count(lit(1)).as("m"))
        .localCheckpoint()
      val ct = dt.groupBy(col("source").as("cls"), col("term"))
        .agg(sum(col("m")).as("cst"))
      val nst = ct.groupBy(col("cls")).agg(sum(col("cst")).as("ns"))
      val vv = dt.agg(countDistinct(col("term")).as("v"))
      val dcls = docs.groupBy(col("source").as("cls"))
        .agg(count(lit(1)).as("dc"))
      val dtot = docs.agg(count(lit(1)).as("dd"))
      val clsp = nst.join(dcls, "cls").crossJoin(broadcast(vv))
        .crossJoin(broadcast(dtot))
        .select(col("cls"), expr(NbDefSql).as("defn"),
          expr(NbPriorSql).as("priorn"))
      val delta = ct.join(broadcast(nst), "cls").crossJoin(broadcast(vv))
        .select(col("cls"), col("term"), expr(NbLpSql).as("lpn"))
        .join(broadcast(clsp.select(col("cls"), col("defn"))), "cls")
        .select(col("cls"), col("term"), (col("lpn") - col("defn")).as("dn"))
      val dtm = docs.select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("tm"))
      val base = dtm.crossJoin(broadcast(clsp))
        .select(col("doc_id"), col("source"), col("cls"),
          (col("priorn") + col("tm") * col("defn")).as("basen"))
      val con = dt.join(delta, "term")
        .groupBy(col("doc_id"), col("cls"))
        .agg(sum(col("m") * col("dn")).as("sn"))
      val wP = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("scoren").desc, col("cls").asc)
      base.join(con, Seq("doc_id", "cls"), "left")
        .withColumn("scoren", col("basen") + coalesce(col("sn"), lit(0L)))
        .withColumn("rk", row_number().over(wP))
        .filter(col("rk") === 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cls") === col("source"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("source"), col("n_docs"), col("n_correct"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(n_correct AS DOUBLE) / n_docs"), 4).as("accuracy"))
        .orderBy(col("source"))
    }),
    // x169: HITS hubs & authorities over the DIRECTED supplier→part
    // bipartite graph (x86's edge construction without symmetrization) —
    // the "which suppliers span many popular parts / which parts are
    // carried by the strong suppliers" mutual-reinforcement ranking
    // PageRank's single score conflates. 3 alternating L1-normalized
    // half-steps, every sum an exact integer (operators/Graph.hits);
    // top-10 per role via orderBy+limit (TakeOrderedAndProject — the
    // ranking window runs AFTER the 10-row cut, never globally).
    "x169_hits" -> ((s, dir) => {
      val ha = graft.operators.Graph.hits(
        table(s, dir, "lineitem").select(
          (col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")),
        "src", "dst", iters = 3)
      def top(c: String, role: String): DataFrame = {
        val t = ha.filter(col(c).isNotNull)
          .select(col("node"), col(c).as("score"))
          .orderBy(col("score").desc, col("node")).limit(10)
        t.withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("node"))).cast("long"))
          .select(lit(role).as("role"), col("rank"), col("node"),
            graft.functions.EngineMath.roundAway(col("score"), 6).as("score"))
      }
      top("auth", "auth").unionAll(top("hub", "hub"))
        .orderBy(col("role"), col("rank"))
    }),
    // x170: Heaps' law fit — V(N) ≈ k·N^β, the vocabulary-growth curve
    // that sizes tokenizer vocab and OOV budgets before a corpus scales
    // (the growth-side companion to x142's Zipf rank-frequency fit).
    // Points are per-doc prefixes in doc_id order: N = cumulative
    // tokens, V = cumulative first-occurrence types (a term's novelty
    // charges ONE doc — min(doc_id) — so V needs no per-prefix distinct).
    // β/ln k come from closed-form OLS on nano-quantized ln coordinates:
    // all five sufficient statistics are exact integers (products ride
    // DECIMAL(38,0)), one double read each (HeapsBetaSql). The prefix
    // cumsums ride the x113 bucket-prefix-sum spine (Ranks.globalCumSums
    // keyed by doc_id div 4096 — monotone by construction): within-bucket
    // running sums, per-bucket totals prefix-summed over a #buckets frame
    // — no rows-scale one-task window; the DuckDB oracle keeps the naive
    // global cumsum, so the hash match is the losslessness gate.
    "x170_heaps_law" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val nty = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(min(col("doc_id")).as("fdoc"))
        .groupBy(col("fdoc")).agg(count(lit(1)).as("nty"))
      val perDoc = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntk"))
        .join(nty, col("doc_id") === col("fdoc"), "left")
        .select(col("doc_id"), col("ntk"),
          coalesce(col("nty"), lit(0L)).as("nty"))
      graft.operators.Ranks.globalCumSums(perDoc,
          expr("doc_id div 4096"), Seq(col("doc_id").asc),
          Seq("ntk" -> "nk", "nty" -> "vk"))
        .filter(col("nk") > 0 && col("vk") > 0)
        .select(
          floor(log(col("nk").cast("double")) * 1e9 + lit(0.5))
            .cast("long").as("xn"),
          floor(log(col("vk").cast("double")) * 1e9 + lit(0.5))
            .cast("long").as("yn"))
        .agg(count(lit(1)).as("n"),
          // pre-widen INSIDE the sums: a post-sum cast aggregates in
          // BIGINT first and silently wraps near the same ~3e8-point
          // bound where the decimal products overflow LOUDLY (NULL)
          sum(col("xn").cast("decimal(38,0)")).as("sx"),
          sum(col("yn").cast("decimal(38,0)")).as("sy"),
          sum(col("xn").cast("decimal(38,0)") * col("yn").cast("decimal(38,0)"))
            .as("sxy"),
          sum(col("xn").cast("decimal(38,0)") * col("xn").cast("decimal(38,0)"))
            .as("sxx"))
        .select(col("n").as("n_points"),
          graft.functions.EngineMath.roundAway(expr(HeapsBetaSql), 6)
            .as("beta"),
          graft.functions.EngineMath.roundAway(expr(HeapsLnKSql), 6)
            .as("ln_k"))
    }),
    // x171: Benjamini-Hochberg FDR over a per-source drift family — the
    // multiple-testing correction x134/x135/x166 need the moment they
    // run per source: 20 simultaneous "does this source's quality
    // distribution differ from the rest?" χ² tests (3 score bands ×
    // in/out, dof 2) would produce false drift alarms at q·m without it.
    // dof is 2 BY CONSTRUCTION so the BH comparison maps exactly onto
    // the χ² scale (BhThrSql — no exp anywhere). The 6 cells per source
    // derive entirely from the one (source, band) count pass + margins
    // (no per-test scan); contributions fold in (band, grp) order; the
    // ranking windows run over |sources| rows.
    "x171_bh_fdr" -> ((s, dir) => {
      val q = table(s, dir, "documents")
        .select(col("source"), col("text"),
          TextFunctions.tokens(col("text")).as("ts"))
        .select(col("source"),
          floor(TextFunctions.qualityScoreOf(col("ts"), col("text"))
            * 10000 + lit(0.5)).cast("long").as("q4"))
        .select(col("source"), expr("least(2, q4 div 3334)").as("band"))
      val cnts = q.groupBy(col("source"), col("band"))
        .agg(count(lit(1)).as("cc"))
      val spine = q.select(col("source")).distinct()
        .crossJoin(s.range(0, 3).toDF("band"))
      val cells = spine.join(cnts, Seq("source", "band"), "left")
        .withColumn("c", coalesce(col("cc"), lit(0L))).drop("cc")
      val gb = cells.groupBy(col("band")).agg(sum(col("c")).as("g"))
      val ns = cells.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val nn = cells.agg(sum(col("c")).as("nn"))
      val wide = cells.join(broadcast(gb), "band")
        .join(broadcast(ns), "source").crossJoin(broadcast(nn))
      val long = wide.select(col("source"), col("band"),
          lit("in").as("grp"), col("c").as("o"), col("g").as("rt"),
          col("ns").as("ct"), col("nn"))
        .unionAll(wide.select(col("source"), col("band"),
          lit("out").as("grp"), (col("g") - col("c")).as("o"),
          col("g").as("rt"), (col("nn") - col("ns")).as("ct"), col("nn")))
      val chi = long.filter(col("rt") > 0)
        .withColumn("contrib", expr(Chi2CellSql))
        .groupBy(col("source"))
        .agg(sort_array(collect_list(
          struct(col("band"), col("grp"), col("contrib")))).as("cs"))
        .select(col("source"),
          expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
            "(acc, v) -> acc + v)").as("chi2"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      chi
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("chi2").desc, col("source"))).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("thr", expr(BhThrSql))
        .withColumn("flag", col("chi2") >= col("thr"))
        .withColumn("kstar",
          max(when(col("flag"), col("rank"))).over(wAll))
        .select(col("source"),
          graft.functions.EngineMath.roundAway(col("chi2"), 6).as("chi2"),
          col("rank"),
          graft.functions.EngineMath.roundAway(col("thr"), 6).as("thr_chi2"),
          (col("rank") <= coalesce(col("kstar"), lit(0L))).as("rejected"))
        .orderBy(col("rank"))
    }),
    // x172: mixed-language document detection — x02's marker-count
    // lang-id run on each HALF of the token stream: halves that disagree
    // (both confidently) flag code-switched / concatenated-crawl docs
    // that a whole-doc classifier averages away. Per-source incidence is
    // the datacard row. Same one-pass shape as x02 (the slice adds no
    // pass — both halves project off one tokens column).
    "x172_mixed_lang" -> ((s, dir) => {
      val halves = table(s, dir, "documents")
        .select(col("source"), TextFunctions.tokens(col("text")).as("ts"))
        .withColumn("n", size(col("ts")).cast("long"))
        .filter(col("n") >= 2)
        .withColumn("h", expr("(n + 1) div 2"))
        .select(col("source"),
          TextFunctions.langIdOf(expr("slice(ts, 1, h)")).as("la"),
          TextFunctions.langIdOf(expr("slice(ts, h + 1, n - h)")).as("lb"))
      halves.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("la") =!= col("lb") && col("la") =!= "und"
            && col("lb") =!= "und", 1L).otherwise(0L)).as("n_mixed"))
        .select(col("source"), col("n_docs"), col("n_mixed"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(n_mixed AS DOUBLE) / n_docs"), 4).as("pct_mixed"))
        .orderBy(col("source"))
    }),
    // x173: log-likelihood keyness (Dunning G²) — the distinctive-terms
    // list for src0 vs the rest of the corpus: the corpus-COMPARISON
    // statistic next to x89's within-corpus PMI. The ordering key is the
    // exact integer micro-tick (G2MicroSql), so the top-20 cut cannot
    // ulp-flip; direction by integer cross-multiply. One explode pass →
    // term-keyed counts; everything after is per-term arithmetic against
    // one broadcast total row. (Count products ride longs here; at
    // 100 TB the same strings run on DECIMAL(38,0) sums.)
    "x173_keyness" -> ((s, dir) => {
      val tk = table(s, dir, "documents").select(
        (col("source") === "src0").as("tgt"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val counts = tk.groupBy(col("term"))
        .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("a"),
          sum(when(!col("tgt"), 1L).otherwise(0L)).as("b"))
      val tot = tk.agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ta"),
        sum(when(!col("tgt"), 1L).otherwise(0L)).as("tb"))
      counts.crossJoin(broadcast(tot))
        .withColumn("g2n", expr(G2MicroSql))
        // direction cross-multiply pre-widens: count·total products pass
        // 2^63 once both sides reach ~3e9 tokens (silent wrap, non-ANSI)
        .withColumn("dir",
          when(col("a").cast("decimal(38,0)") * col("tb").cast("decimal(38,0)")
            > col("b").cast("decimal(38,0)") * col("ta").cast("decimal(38,0)"),
            "src0").otherwise("rest"))
        .orderBy(col("g2n").desc, col("term")).limit(20)
        .select(col("term"), col("a").as("n_target"), col("b").as("n_rest"),
          col("dir"),
          graft.functions.EngineMath.roundAway(
            col("g2n").cast("double") / 1e6, 6).as("g2"))
    }),
    // x174: Benford leading-digit audit over order totals — the
    // fabricated-numbers screen for ingested numeric feeds (x142 Zipf /
    // x143 seasonality are the other distribution-shape audits).
    // Expected shares are Scala-computed literals (the x115 CASE
    // device); the χ² folds over the 9-digit spine in digit order. One
    // scan → 9 cells.
    "x174_benford" -> ((s, dir) => {
      val d = table(s, dir, "orders").select(
        expr("CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) " +
          "AS STRING), 1, 1) AS BIGINT)").as("digit"))
      val o = d.groupBy(col("digit")).agg(count(lit(1)).as("cc"))
      val cells = s.range(1, 10).toDF("digit")
        .join(o, Seq("digit"), "left")
        .withColumn("o", coalesce(col("cc"), lit(0L))).drop("cc")
      val nn = cells.agg(sum(col("o")).as("nn"))
      val folded = cells.crossJoin(broadcast(nn))
        .withColumn("contrib", expr(BenfordCellSql))
      val chi = folded.groupBy()
        .agg(sort_array(collect_list(struct(col("digit"), col("contrib"))))
          .as("cs"))
        .select(expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
          "(acc, v) -> acc + v)").as("chi2"))
      folded.crossJoin(broadcast(chi))
        .select(col("digit"), col("o").as("n_obs"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(o AS DOUBLE) / nn"), 6).as("p_obs"),
          graft.functions.EngineMath.roundAway(expr(BenfordPSql), 6)
            .as("p_benford"),
          graft.functions.EngineMath.roundAway(col("chi2"), 6).as("chi2"))
        .orderBy(col("digit"))
    }),
    // x175: term burstiness — variance-to-mean ratio of per-doc counts
    // over ALL docs (zeros included, so the sums need only the nonzero
    // (doc, term) pairs): bursty terms are topical content words,
    // VMR≈1 terms are function words — the statistic behind stopword
    // induction and x68-style feature pruning. Numerator and
    // denominator are exact pre-widened integers (BurstSql), the
    // ordering key an exact micro-tick. Support floor tf ≥ 50, df ≥ 2.
    "x175_burstiness" -> ((s, dir) => {
      val dt = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("m"))
      val dd = table(s, dir, "documents").agg(count(lit(1)).as("dd"))
      dt.groupBy(col("term"))
        // pre-widen INSIDE the sums (the x134/x167 lesson): the squared
        // per-doc counts of a degenerate hot term can pass 2^63 at scale
        // and a BIGINT sum would wrap silently; decimal overflows LOUDLY
        .agg(count(lit(1)).as("df"),
          sum(col("m").cast("decimal(38,0)")).as("sm0"),
          sum((col("m") * col("m")).cast("decimal(38,0)")).as("sm20"))
        .filter(col("sm0") >= 50 && col("df") >= 2)
        .crossJoin(broadcast(dd))
        .select(col("term"), col("df"), col("sm0").as("sm"),
          col("sm20").as("sm2"), col("dd"))
        .withColumn("bn",
          floor(expr(BurstSql) * 1e6 + lit(0.5)).cast("long"))
        .orderBy(col("bn").desc, col("term")).limit(20)
        .select(col("term"), col("df"), col("sm").cast("long").as("tf"),
          graft.functions.EngineMath.roundAway(
            col("bn").cast("double") / 1e6, 6).as("burstiness"))
    }),
    // x176: the STREAM-maintained twin of x166 — drift monitoring is
    // the production use of PSI, so the additive (source, bin) counts
    // build incrementally in ONE stateful aggregate (the only
    // rows-scale work; the x123/x149 decomposition) and the SHARED
    // read-time derivation computes PSI over the bounded |sources|×10
    // cell table. Same oracle as x166: stream ≡ batch is the point.
    "x176_stream_psi" -> ((s, dir) =>
      psiOverBinCounts(s, graft.streaming.StreamOps
        .qualityBinCountsStreaming(s, s"$dir/documents.parquet"))),
    // x177: the STREAM-maintained twin of x167 — per-micro-value cohort
    // counts accumulate in one stateful aggregate; the SHARED read-time
    // cumsum + exact pre-widened integer numerator derive W₁ over the
    // bounded distinct-value axis. Same oracle as x167.
    "x177_stream_w1" -> ((s, dir) =>
      w1OverCounts(graft.streaming.StreamOps
        .valueCohortCountsStreaming(s, s"$dir/events.parquet"))),
    // x178: Jensen-Shannon divergence matrix between per-source token
    // distributions — the symmetric, bounded corpus-similarity measure
    // behind mixture design ("which sources are redundant?"); x53's KL
    // is the asymmetric single-pair view. Per-(pair, term) contributions
    // pA·ln(pA/m) + pB·ln(pB/m) (m the midpoint) are nano-quantized to
    // exact integers off exact count inputs (the x163/x168 device), so
    // the per-pair sum is order-free and engine-identical; each term-
    // count row fans out only to the bounded source-pair list (broadcast
    // — ≤ |sources|² rows), and the (pair, term) aggregate is the one
    // rows-scale shuffle. At 100 TB: hash-bucket the vocab (x64).
    "x178_jsd_matrix" -> ((s, dir) => {
      val tc = table(s, dir, "documents")
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // 3 consumers: totals + both fan sides
      val ns = tc.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val srcs = tc.select(col("source")).distinct()
      val prs = srcs.select(col("source").as("sa"))
        .crossJoin(srcs.select(col("source").as("sb")))
        .filter(col("sa") < col("sb"))
      val fanA = tc.join(broadcast(prs), col("source") === col("sa"))
        .select(col("sa"), col("sb"), col("term"),
          col("c").as("ca"), lit(0L).as("cb"))
      val fanB = tc.join(broadcast(prs), col("source") === col("sb"))
        .select(col("sa"), col("sb"), col("term"),
          lit(0L).as("ca"), col("c").as("cb"))
      fanA.union(fanB)
        .groupBy(col("sa"), col("sb"), col("term"))
        .agg(sum(col("ca")).as("a"), sum(col("cb")).as("b"))
        .join(broadcast(ns.select(col("source").as("sa"), col("n").as("na"))), "sa")
        .join(broadcast(ns.select(col("source").as("sb"), col("n").as("nb"))), "sb")
        .withColumn("qn", expr(JsdContribSql))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_terms"), sum(col("qn")).as("sq"))
        .select(col("sa").as("src_a"), col("sb").as("src_b"), col("n_terms"),
          graft.functions.EngineMath.roundAway(
            col("sq").cast("double") / 2e12, 6).as("jsd"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    // x179: distinct-n lexical diversity per source — unique/total
    // unigram and bigram ratios, THE degeneration screens for generated
    // or boilerplate-heavy text (self-repetition collapses distinct-2
    // long before a quality classifier notices). Bigrams form inside
    // each doc's token array (zip_with — no cross-doc adjacency, no
    // extra shuffle); counts are exact integers, one division each.
    // The exact count_distinct pays the 2-phase shuffle (A15's
    // documented trade; approx_count_distinct is the one-pass path at
    // 100 TB where ±1% on a diversity ratio is immaterial).
    "x179_distinct_ngrams" -> ((s, dir) => {
      val m = table(s, dir, "documents")
        .select(col("source"), TextFunctions.tokens(col("text")).as("ts"))
        .select(col("source"), col("ts"),
          expr("zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
            "slice(ts, 2, greatest(size(ts) - 1, 0)), " +
            "(x, y) -> concat(x, ' ', y))").as("bs"))
      val gu = m.select(col("source"), explode(col("ts")).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n1"), countDistinct(col("g")).as("d1"))
      val gb = m.select(col("source"), explode(col("bs")).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n2"), countDistinct(col("g")).as("d2"))
      gu.join(gb, Seq("source"), "left")
        .select(col("source"),
          col("n1").as("n_unigrams"), col("d1").as("d_unigrams"),
          graft.functions.EngineMath.roundAway(
            col("d1").cast("double") / col("n1"), 6).as("distinct1"),
          coalesce(col("n2"), lit(0L)).as("n_bigrams"),
          coalesce(col("d2"), lit(0L)).as("d_bigrams"),
          graft.functions.EngineMath.roundAway(
            when(coalesce(col("n2"), lit(0L)) > 0,
              col("d2").cast("double") / col("n2")).otherwise(lit(0.0)), 6)
            .as("distinct2"))
        .orderBy(col("source"))
    }),
    // x180: cross-source duplication matrix — near-dup pair counts
    // between (and within) sources off the banded MinHash pairs: the
    // "how much of source A recycles source B" datacard that decides
    // which source to drop when mixtures overlap. The engine-specific
    // LSH half STAGES (the x46 hand-off device — DuckDB re-derives the
    // attribution + matrix from the staged pair table); sides
    // canonicalize by SOURCE so the matrix is upper-triangular with
    // the within-source diagonal. Pairs are banded (sub-quadratic);
    // the matrix is |sources|²-bounded.
    "x180_source_overlap" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val pairs = graft.engine.CacheScope.persistTracked(
        Dedup.minhashPairs(d, "doc_id", "text", k = 3, threshold = 0.8))
      Stage.write(pairs.select(col("id_a"), col("id_b")), dir, "x180_pairs")
      val srcOf = d.select(col("doc_id"), col("source"))
      val m = pairs
        .join(srcOf.select(col("doc_id").as("id_a"), col("source").as("sa0")),
          "id_a")
        .join(srcOf.select(col("doc_id").as("id_b"), col("source").as("sb0")),
          "id_b")
        .select(least(col("sa0"), col("sb0")).as("src_a"),
          greatest(col("sa0"), col("sb0")).as("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_pairs"))
      val tot = m.agg(sum(col("n_pairs")).as("tt"))
      m.crossJoin(broadcast(tot))
        .select(col("src_a"), col("src_b"), col("n_pairs"),
          graft.functions.EngineMath.roundAway(
            col("n_pairs").cast("double") / col("tt"), 6).as("pct"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    // x181: corpus embedding diversity — MEAN PAIRWISE COSINE over all
    // n² pairs WITHOUT any pair join: for unit vectors,
    // Σᵢ≠ⱼ uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖², so two linear passes (per-dim
    // component sums + per-vector norm sums) answer the quadratic
    // question exactly — the O(n) identity that makes "is this corpus
    // collapsing toward a mode?" answerable at 100 TB. Determinism:
    // unit components quantize to micro-integers (norms via the
    // engine-ordered sequential fold), so every sum is exact integer /
    // DECIMAL(38,0) under any partitioning; ONE final division.
    "x181_embedding_diversity" -> ((s, dir) => {
      val qv = embeddingsD(s, dir)
        .withColumn("nrm",
          sqrt(expr("aggregate(vec, 0.0d, (acc, x) -> acc + x * x)")))
        .filter(col("nrm") > 0)
        .withColumn("q",
          expr("transform(vec, x -> CAST(floor(x / nrm * 1e6 + 0.5) AS BIGINT))"))
        .localCheckpoint() // 2 consumers: norm totals + the dim explode
      val tot = qv
        .select(expr("aggregate(q, CAST(0 AS BIGINT), " +
          "(acc, x) -> acc + x * x)").as("qq"))
        .agg(count(lit(1)).as("n"),
          sum(col("qq").cast("decimal(38,0)")).as("s2"))
      val ss = qv.select(posexplode(col("q")).as(Seq("d", "qd")))
        .groupBy(col("d")).agg(sum(col("qd")).as("sd"))
        .agg(sum(col("sd").cast("decimal(38,0)")
          * col("sd").cast("decimal(38,0)")).as("ssq"))
      ss.crossJoin(broadcast(tot))
        .select(col("n").as("n_vectors"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(ssq - s2 AS DOUBLE) / " +
              "(CAST(n AS DOUBLE) * (n - 1) * 1e12)"), 6).as("mean_cos"))
    }),
    // x182: dedup cluster-size distribution — the histogram that says
    // whether duplication is a long tail of pairs or a few mega-clusters
    // (the two need different dedup budgets; mega-clusters also break
    // LSH bucket caps). Components close over the banded MinHash pairs
    // (scale path, staged for the oracle's recursive-CTE re-derivation
    // — the x46 hand-off); unmatched docs enter as size-1 clusters from
    // two scalar aggregates, not a row-scale anti-join.
    "x182_cluster_sizes" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val pairs = graft.engine.CacheScope.persistTracked(
        Dedup.minhashPairs(d, "doc_id", "text", k = 3, threshold = 0.8))
      Stage.write(pairs.select(col("id_a"), col("id_b")), dir, "x182_pairs")
      val sz = graft.engine.CacheScope.persistTracked(
        Dedup.pairGroups(pairs, "id_a", "id_b")
          .select(col("n_members").cast("long").as("m")))
      val h = sz.groupBy(col("m").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      val dd = d.agg(count(lit(1)).as("dd"))
      val mt = sz.agg(coalesce(sum(col("m")), lit(0L)).as("mm"))
      val singles = dd.crossJoin(broadcast(mt))
        .select(lit(1L).as("cluster_size"), (col("dd") - col("mm")).as("n_clusters"))
        .filter(col("n_clusters") > 0)
      h.union(singles)
        .groupBy(col("cluster_size"))
        .agg(sum(col("n_clusters")).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy(col("cluster_size"))
    }),
    // x183: clustering balance + inertia report over the IVF coarse
    // quantizer — per-cluster member share and mean squared distance to
    // the centroid: the "is the index balanced / are there dead or
    // catch-all buckets" diagnostic that decides nProbe and re-fit
    // cadence (skewed buckets are ANN's hot-partition problem). The
    // engine-specific halves STAGE (assignment + centroid vectors — the
    // x13 hand-off); per-row d² micro-quantizes off the engine-ordered
    // sequential fold, so cluster sums are exact integers. Empty
    // clusters surface via the bounded centroid spine.
    "x183_cluster_report" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val centroids = ivfCentroids(s, dir)
      // persist: the assignment pass (K broadcast dot products per row +
      // the argmin window) feeds BOTH the stage write and the report
      val asg = graft.engine.CacheScope.persistTracked(
        graft.operators.Ivf.assign(e, "vec_id", "vec", centroids))
      Stage.write(asg, dir, "x183_assign")
      Stage.write(centroids, dir, "x183_centroids")
      val per = e.join(asg, col("vec_id") === col("id"))
        .join(broadcast(centroids), "centroid_id")
        .withColumn("d2m",
          floor(expr("aggregate(zip_with(vec, cvec, " +
            "(x, y) -> (x - y) * (x - y)), 0.0d, (acc, v) -> acc + v)")
            * 1e6 + lit(0.5)).cast("long"))
        .groupBy(col("centroid_id"))
        .agg(count(lit(1)).as("nm"), sum(col("d2m")).as("sm"))
      val tot = per.agg(sum(col("nm")).as("nn"))
      centroids.select(col("centroid_id"))
        .join(per, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("nm"), lit(0L)).as("n_members"),
          coalesce(col("sm"), lit(0L)).as("sm"))
        .crossJoin(broadcast(tot))
        .select(col("centroid_id"), col("n_members"),
          graft.functions.EngineMath.roundAway(
            col("n_members").cast("double") / col("nn"), 6).as("share"),
          graft.functions.EngineMath.roundAway(
            when(col("n_members") > 0,
              col("sm").cast("double") / 1e6 / col("n_members"))
              .otherwise(lit(0.0)), 6).as("mean_d2"))
        .orderBy(col("centroid_id"))
    }),
    // x184: Flesch reading-ease per source — the classic readability
    // screen (technical/legal boilerplate scores low, conversational
    // prose high; extreme scores flag OCR junk and word salad).
    // Words / sentence-groups / syllable-proxies (vowel groups) are
    // INTEGER regex-match counts per doc (regexp_extract_all — the x99
    // Java≡RE2 device), summed exactly per source; the Flesch formula
    // is ONE shared string over the three exact sums. Per-doc sentence
    // floor max(1, ·) keeps fragments finite. One scan, no joins.
    "x184_readability" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("w"),
          greatest(lit(1L),
            size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
            .as("se"),
          size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .cast("long").as("sy"))
        .filter(col("w") > 0)
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("w"),
          sum(col("se")).as("se"), sum(col("sy")).as("sy"))
        .select(col("source"), col("n_docs"), col("w").as("n_words"),
          col("se").as("n_sentences"), col("sy").as("n_syllables"),
          graft.functions.EngineMath.roundAway(expr(FleschSql), 4)
            .as("flesch"))
        .orderBy(col("source"))
    }),
    // x185: first-order entropy rate per source — H(next|cur) =
    // H(bigram) − H(unigram): how predictable the token stream is
    // (templated/boilerplate text sits near 0, diverse prose high) —
    // the sequence-structure companion to x179's distinct-n and x96's
    // per-doc entropy. Every −p·ln p contribution is nano-quantized
    // off exact (count, total) integers (the x178 device), so the
    // per-source sums are order-free exact integers; three divisions
    // at the end. Bigrams form per doc (zip_with, x179's device).
    "x185_entropy_rate" -> ((s, dir) => {
      val m = table(s, dir, "documents")
        .select(col("source"), TextFunctions.tokens(col("text")).as("ts"))
        .select(col("source"), col("ts"),
          expr("zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
            "slice(ts, 2, greatest(size(ts) - 1, 0)), " +
            "(x, y) -> concat(x, ' ', y))").as("bs"))
        .localCheckpoint() // 2 consumers: unigram and bigram explodes
      def h(grams: org.apache.spark.sql.DataFrame) = grams
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
        .withColumn("hq", expr(EntropyContribSql))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n"), sum(col("hq")).as("hq"))
      val h1 = h(m.select(col("source"), explode(col("ts")).as("g")))
      val h2 = h(m.select(col("source"), explode(col("bs")).as("g")))
      h1.select(col("source"), col("n").as("n_tokens"), col("hq").as("q1"))
        .join(h2.select(col("source"), col("hq").as("q2")), "source")
        .select(col("source"), col("n_tokens"),
          graft.functions.EngineMath.roundAway(
            col("q1").cast("double") / 1e12, 6).as("h_unigram"),
          graft.functions.EngineMath.roundAway(
            col("q2").cast("double") / 1e12, 6).as("h_bigram"),
          graft.functions.EngineMath.roundAway(
            (col("q2") - col("q1")).cast("double") / 1e12, 6).as("h_cond"))
        .orderBy(col("source"))
    }),
    // x186: shard token-balance report over the x98 epoch permutation —
    // rows per shard are fixed by construction, but TOKENS per shard
    // are not: stragglers (one shard of megadocs) stall synchronous
    // training steps, so max/mean and CV of shard token mass are the
    // dataloader's skew audit. Per-shard sums and both moments are
    // exact pre-widened integers (the x170 sufficient-statistics
    // device); the CV read is ONE shared string. Everything after the
    // x98 rank machinery is a shard-keyed aggregate → 5 scalars.
    "x186_shard_balance" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("tk"))
      val sh = graft.operators.Shards.epochShards(
        docs.select(col("doc_id")), "doc_id", seed = "ep1", shardSize = 100)
        .select(col("doc_id"), col("shard"))
      sh.join(docs, "doc_id")
        .groupBy(col("shard")).agg(sum(col("tk")).as("t"))
        .agg(count(lit(1)).as("n_shards"),
          min(col("t")).as("min_tokens"), max(col("t")).as("max_tokens"),
          // pre-widen INSIDE the sum (the x134/x167 lesson): a post-sum
          // cast would aggregate in BIGINT first and silently wrap past
          // 2^63 total tokens while the oracle's HUGEINT sum stays exact
          sum(col("t").cast("decimal(38,0)")).as("st"),
          sum(col("t").cast("decimal(38,0)") * col("t").cast("decimal(38,0)"))
            .as("st2"))
        .select(col("n_shards"), col("min_tokens"), col("max_tokens"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(st AS DOUBLE) / n_shards"), 4).as("mean_tokens"),
          graft.functions.EngineMath.roundAway(expr(ShardCvSql), 6).as("cv"))
    }),
    // x187: AUDIO near-dup pairs, oracle-gated end to end — the x102
    // device applied to the audio modality: per doc a structurally-real
    // 16-bit PCM WAV is SYNTHESIZED from pure integer arithmetic over
    // the text bytes (Multimodal.synthesizeWav), decoded back through
    // the INDEPENDENT javax.sound path (WavCodec.samples), fingerprinted
    // as a 120-band energy-envelope signature in the image dHash's
    // two-long contract, and paired through the SHARED wide hamming
    // banding engine. Every stage is exact dyadic arithmetic
    // ((b−128)/256 samples), so the oracle re-derives the WHOLE
    // pipeline — waveform, band energies, bits, pairs — from ord()
    // arithmetic without touching a BLOB; generation and decode are
    // independent code paths, and the hash breaks if either drifts.
    "x187_audio_neardup" -> ((s, dir) => {
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(length(col("text")) > 0)
        .as[(Long, String)]
        .map { case (id, t) =>
          graft.multimodal.Multimodal.MediaRow(id, "wav",
            graft.multimodal.Multimodal.synthesizeWav(t)) }
      // maxBucket 256: at maxDist 20 the paired band keys carry only
      // ~11 bits, so a 10x corpus measured 7.5x growth uncapped (the
      // x69 lesson); the cap bounds each bucket's candidate
      // contribution. The drop is SILENT by design (a bare filter in
      // Dedup.bandedSelfJoin — no accumulator on the hot path); the
      // oracle gate is the detector: at the oracle-checked SFs every
      // bucket is under the cap, so the pair set is EXACTLY the
      // all-pairs truth (verified), and a cap that ever bit at those
      // SFs would hash-mismatch loudly.
      graft.multimodal.Multimodal.audioNearDupPairs(media,
          maxDist = 20, maxBucket = 256)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id_a"), col("id_b"))
    }),
    // x188: interpolated Kneser-Ney bigram LM scoring — the REAL
    // LM-filter smoothing (x163/x168 are add-1): per-doc mean
    // ln P_KN(w2|w1) with absolute discount d = 0.75 and the
    // continuation-count backoff P_cont(w2) = N1+(·w2)/|bigram types|.
    // Every model parameter is an exact integer (bigram counts, w1
    // totals, distinct right/left continuation types, the global type
    // count), the per-bigram log-prob nano-quantizes through ONE shared
    // string (KnLpSql), and the per-doc mean is an exact integer sum /
    // count. Self-scoring: every doc bigram is in the counts, so the
    // discounted term is always > 0 — no unseen branch. Dataflow: one
    // bigram explode → vocab-bounded parameter tables (broadcastable
    // margins; hash-bucket the vocab at 100 TB, x64) → the (w1, w2)-
    // keyed join back is the only rows-scale shuffle (the x168 shape).
    "x188_kneser_ney" -> ((s, dir) => {
      val bg = table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        .select(col("doc_id"),
          explode(expr("zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
            "slice(ts, 2, greatest(size(ts) - 1, 0)), " +
            "(x, y) -> struct(x AS w1, y AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint() // 2 consumers: the model build + the scoring join
      val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .localCheckpoint() // 4 consumers: margins + types + the lp table
      val cw1 = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cw1"),
        count(lit(1)).as("r1"))
      val l2 = bc.groupBy(col("w2")).agg(count(lit(1)).as("l2"))
      val bt = bc.agg(count(lit(1)).as("bt"))
      val lp = bc.join(cw1, "w1").join(l2, "w2")
        .crossJoin(broadcast(bt))
        .select(col("w1"), col("w2"), expr(KnLpSql).as("lpn"))
      bg.join(lp, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lpn")).as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          graft.functions.EngineMath.roundAway(
            col("slp").cast("double") / 1e9 / col("n_bigrams"), 6)
            .as("kn_lp"))
        .orderBy(col("doc_id"))
    }),
    // x189: Mann-Kendall trend test + Sen's slope over the per-type
    // daily value series — the robust (rank-based, outlier-immune)
    // monotone-trend detector that belongs next to x144's CUSUM
    // changepoint and x143's seasonal index: "is this stream's volume
    // drifting, and how fast?" asked the way production monitoring asks
    // it (no normality assumption, exact tie handling, a slope estimate
    // a single outlier day cannot move). The daily series is an exact
    // micro-tick integer sum; S = Σ sign(v_j − v_i) and the
    // tie-corrected variance numerator n(n−1)(2n+5) − Σ t(t−1)(2t+5)
    // are exact integers; Sen's slope is the median of the pairwise
    // nano-quantized slopes (SenSlopeSql/SgnSql/MedianPickSql/MkZSql —
    // shared strings, both engines). Scale: the pair fan-out is over
    // the DAY axis (bounded by the observation window), per event_type
    // — the only rows-scale work is the (type, day) aggregate;
    // everything after is day²-bounded with broadcast scalar sides.
    "x189_mann_kendall" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 1e6 + lit(0.5)).cast("long")).as("vm"))
        .localCheckpoint() // consumers: both pair sides, ties, day counts
      val pairs = daily.select(col("event_type"), col("day").as("da"),
          col("vm").as("va"))
        .join(daily.select(col("event_type"), col("day").as("db"),
          col("vm").as("vb")), Seq("event_type"))
        .filter(col("da") < col("db"))
        .withColumn("gap", datediff(col("db"), col("da")).cast("long"))
        .select(col("event_type"), expr(SgnSql).as("sgn"),
          expr(SenSlopeSql).as("slope_n"))
      val sstat = pairs.groupBy(col("event_type"))
        .agg(sum(col("sgn")).as("s_stat"), count(lit(1)).as("np"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("slope_n"))
      val med = pairs.withColumn("rk", row_number().over(wR))
        .join(broadcast(sstat.select(col("event_type"), col("np"))),
          "event_type")
        .filter(expr(MedianPickSql))
        .groupBy(col("event_type"))
        .agg(avg(col("slope_n").cast("double")).as("median_n"))
      val nd = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ties = daily.groupBy(col("event_type"), col("vm"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tcorr"))
      sstat.join(med, "event_type").join(nd, "event_type")
        .join(ties, "event_type")
        .withColumn("var_num",
          col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tcorr"))
        .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          col("var_num"),
          graft.functions.EngineMath.roundAway(expr(MkZSql), 6).as("z"),
          graft.functions.EngineMath.roundAway(
            col("median_n") / 1e9, 6).as("sen_slope"))
        .orderBy(col("event_type"))
    }),
    // x190: autocorrelation function (lags 1-7 calendar days) over the
    // per-type daily value series — the seasonality fingerprint that
    // completes the monitoring family (x143 names the weekly cycle,
    // x144 finds the level shift, x189 the monotone drift; the ACF says
    // WHICH periodicities exist). Same exact micro-tick daily series;
    // per (type, lag) the sufficient statistics (pair count, Σva·vb,
    // Σva, Σvb) and the series moments (n, Σv, Σv²) are exact integers
    // pre-widened to DECIMAL(38,0)/HUGEINT BEFORE any product (a 100 TB
    // day-sum squares past BIGINT), and r_k is ONE shared string
    // (AcfSql) evaluated off identical integers — with an exact
    // integer-equality guard for constant series (zero variance).
    // Scale: the rows-scale work is the daily aggregate; everything
    // after is (days × 7)-bounded — the lag pairing is an equi-join on
    // (type, day+k), never a pair fan-out, and the moments broadcast.
    "x190_acf" -> ((s, dir) =>
      acfOverDaily(Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 1e6 + lit(0.5)).cast("long")).as("vm"))
        .localCheckpoint())), // consumers: moments + both lag-join sides
    // x191: Kaplan-Meier survival curve over user activity streaks — the
    // retention readout x76/x158 lead up to, done the way survival
    // analysis does it (censoring-correct). Subject = a consecutive-day
    // activity streak (gaps-and-islands: day − row_number per user keys
    // the island); a streak DIES when the user skips the next day, and
    // is CENSORED (still alive, fate unknown) when it reaches the
    // observation-window end. Risk sets and death counts are exact
    // integers off ONE streak aggregate; each step factor ln(1 − d/n)
    // nano-quantizes through the shared KmLnSql (NULL-guarded for
    // d = n), the cumulative hazard is an exact integer window sum, and
    // S(t) is ONE exp read (KmSurvSql) with a cumulative extinction
    // flag. Scale: rows-scale work is the distinct + the per-user
    // window sort (both partition by user_id); the curve itself is
    // bounded by the observation window in DAYS, so the unpartitioned
    // ordered windows run on a days-sized frame (x144's CUSUM bound).
    "x191_kaplan_meier" -> ((s, dir) => {
      val wU = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint() // consumers: window end + the island build
      val wend = d.agg(max(col("day")).as("wend"))
      val streaks = d
        .withColumn("isl", date_sub(col("day"), row_number().over(wU)))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("t"), max(col("day")).as("lday"))
      val byT = streaks.crossJoin(broadcast(wend))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("c_all"),
          sum(when(col("lday") < col("wend"), 1L).otherwise(0L)).as("d"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("t").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wAsc = org.apache.spark.sql.expressions.Window
        .orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      byT.withColumn("n_risk", sum(col("c_all")).over(wDesc))
        .filter(col("d") > 0)
        .withColumn("lq", expr(KmLnSql))
        .withColumn("cum", sum(col("lq")).over(wAsc))
        .withColumn("dead",
          max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wAsc))
        .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_churned"),
          graft.functions.EngineMath.roundAway(expr(KmSurvSql), 6).as("survival"))
        .orderBy(col("t_days"))
    }),
    // x192: precision-recall AUC of the x70/x88 quality model — the
    // class-imbalance-honest companion to x88's ROC-AUC (the metric a
    // quality-filter sweep actually tunes on: positives are the rare
    // class a PR curve weights correctly). Threshold semantics: one PR
    // point per DISTINCT score (all docs scoring ≥ t predicted positive),
    // so ties are handled exactly and the windows run over |distinct
    // scores| grouped rows, not |docs| (the x88 frame bound). Each
    // trapezoid term (ΔR · mean precision, anchored at (R=0, P=1))
    // pico-quantizes through ONE shared string (PrTermSql) off exact
    // cumulative integers, so the area is an exact integer sum.
    "x192_pr_auc" -> ((s, dir) => {
      val lab = qlrScoredLab(s, dir, "x192_weights")
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wLag = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc)
      val g = lab.groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
      val tot = g.agg(sum(col("np")).as("p"), sum(col("n")).as("nn"))
      g.withColumn("tp", sum(col("np")).over(wDesc))
        .withColumn("fp", sum(col("n") - col("np")).over(wDesc))
        .withColumn("tpp", coalesce(lag(col("tp"), 1).over(wLag), lit(0L)))
        .withColumn("fpp", coalesce(lag(col("fp"), 1).over(wLag), lit(0L)))
        .crossJoin(broadcast(tot))
        .agg(sum(expr(PrTermSql)).as("sn"), max(col("p")).as("p"),
          max(col("nn")).as("nn"), count(lit(1)).as("n_thresholds"))
        .select(col("p").as("n_pos"), (col("nn") - col("p")).as("n_neg"),
          col("n_thresholds"),
          graft.functions.EngineMath.roundAway(
            col("sn").cast("double") / 1e12, 6).as("pr_auc"))
    }),
    // x193: gains/lift deciles of the quality model — the campaign-style
    // readout ("the top decile captures X% of the positives at Y× lift")
    // that turns x88/x192's scalar AUCs into an actionable spend curve.
    // Deciles = ntile(10) over (score DESC, doc_id) — deterministic
    // because doc_id totalizes the order; capture and lift are ONE shared
    // string each over exact integer counts. The ntile assignment is
    // closed-form (Ranks.ntileOfRank) off the x113 bucket-prefix-sum rank
    // keyed by −floor(score·1024) — monotone non-decreasing as score
    // DESCENDS, so bucket order ≡ the descending score order and the plan
    // carries no rows-scale one-task sort. DuckDB keeps the naive
    // ntile(10); the hash match is the losslessness gate.
    "x193_gains" -> ((s, dir) => {
      val lab = qlrScoredLab(s, dir, "x193_weights")
      val d = graft.operators.Ranks.globalRowNumber(lab,
          -floor(col("score") * lit(1024.0)),
          Seq(col("score").desc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(lab.agg(count(lit(1)).as("nn"))))
        .withColumn("decile",
          graft.operators.Ranks.ntileOfRank("rk", "nn", 10).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("decile"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = d.agg(sum(col("n_docs")).as("nn"), sum(col("n_pos")).as("p"))
      d.withColumn("cum_pos", sum(col("n_pos")).over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          graft.functions.EngineMath.roundAway(expr(GainsCaptureSql), 6)
            .as("capture"),
          graft.functions.EngineMath.roundAway(expr(GainsLiftSql), 6)
            .as("lift"))
        .orderBy(col("decile"))
    }),
    // x194: simplified silhouette per IVF cluster — the cluster-quality
    // score x183's inertia report cannot give (inertia always improves
    // with more clusters; silhouette penalizes overlap). Simplified =
    // centroid-based (a = distance to own centroid, b = distance to the
    // nearest OTHER centroid), the linear-time variant that scales where
    // full silhouette's all-pairs does not. All K distances per point are
    // K broadcast dot products (the x183 assignment shape); per-point s
    // nano-quantizes through ONE shared string (SilhSql) off the exact
    // micro-tick d² integers, so per-cluster means are exact sums.
    "x194_silhouette" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val cents = ivfCentroids(s, dir)
      Stage.write(cents, dir, "x194_centroids")
      val d2 = e.crossJoin(broadcast(cents))
        .withColumn("d2m",
          floor(expr("aggregate(zip_with(vec, cvec, " +
            "(x, y) -> (x - y) * (x - y)), 0.0d, (acc, v) -> acc + v)")
            * 1e6 + lit(0.5)).cast("long"))
        .select(col("vec_id"), col("centroid_id"), col("d2m"))
      val wP = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("d2m").asc, col("centroid_id").asc)
      val ranked = graft.engine.CacheScope.persistTracked(
        d2.withColumn("rk", row_number().over(wP)))
      val own = ranked.filter(col("rk") === 1)
        .select(col("vec_id"), col("centroid_id").as("cid"), col("d2m").as("a2"))
      val next = ranked.filter(col("rk") === 2)
        .select(col("vec_id"), col("d2m").as("b2"))
      own.join(next, "vec_id")
        .withColumn("sn", expr(SilhSql))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), sum(col("sn")).as("ssn"))
        .select(col("cid").as("centroid_id"), col("n_members"),
          graft.functions.EngineMath.roundAway(
            col("ssn").cast("double") / 1e9 / col("n_members"), 6)
            .as("mean_silhouette"))
        .orderBy(col("centroid_id"))
    }),
    // x195: degree assortativity of the part co-purchase graph (x87's
    // edge set) — the one-number topology diagnostic that says whether
    // hubs link to hubs (r > 0, robust to hub removal) or to leaves
    // (r < 0, hub-and-spoke: salting the hot keys is mandatory). Pearson
    // over the degree pairs of every DIRECTED edge (both orientations, so
    // the marginals coincide); all five sufficient statistics are exact
    // integers pre-widened to DECIMAL(38,0) BEFORE any product, and r is
    // ONE shared read (AssortSql) with an exact zero-variance guard.
    // Scale: the pair-producer is x87's per-order bounded self-join; the
    // degree join is two broadcast-or-shuffle equi-joins; the stat is one
    // aggregate to 5 scalars.
    "x195_assortativity" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = po.as("a").join(po.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
        .localCheckpoint() // consumers: the degree build + the stat pass
      val deg = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
        .localCheckpoint() // consumers: node count + both endpoint joins
      val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val dp = edges
        .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      dp.agg(count(lit(1)).as("n_edges"),
          sum(dec(col("du")) + dec(col("dv"))).as("sx"),
          sum(dec(col("du")) * dec(col("du"))
            + dec(col("dv")) * dec(col("dv"))).as("sxx"),
          sum(dec(col("du")) * dec(col("dv"))
            + dec(col("dv")) * dec(col("du"))).as("sxy"))
        .withColumn("m", (col("n_edges") * lit(2L)).cast("decimal(38,0)"))
        .crossJoin(broadcast(nNodes))
        .select(col("n_nodes"), col("n_edges"),
          graft.functions.EngineMath.roundAway(expr(AssortSql), 6)
            .as("assortativity"))
    }),
    // x196: split-conformal calibration of the quality model — the
    // distribution-free uncertainty wrapper production scoring needs
    // (Vovk et al.; "with 90% coverage, how wrong can this score be?").
    // Calibration/eval split by the md5 ticket (the x48 sampling device,
    // 50/50); nonconformity = 1 − P(true class) under the 6-dp sigmoid,
    // nano-quantized through ONE shared string (ConfNcSql) so both
    // engines rank identical integers; q̂ = the ⌈(n+1)·0.9⌉-th smallest
    // via the value-grouped cumulative (a |distinct values| frame, not
    // |rows| — the x88 bound), and empirical eval coverage is an exact
    // integer share. Finite-sample guarantee: coverage ≥ 0.9 − 1/(n+1)
    // in expectation.
    "x196_conformal" -> ((s, dir) => {
      val lab = qlrScoredLab(s, dir, "x196_weights")
      val nc = lab.withColumn("ncn", expr(ConfNcSql))
        .withColumn("cal",
          graft.operators.Sampling.keep(col("doc_id"), 0.5, "conf"))
        .localCheckpoint() // consumers: cal count, value groups, eval side
      val cal = nc.filter(col("cal"))
      val ncal = cal.agg(count(lit(1)).as("ncal"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("ncn"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val qhat = cal.groupBy(col("ncn")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wv))
        .crossJoin(broadcast(ncal))
        .filter(col("cum") >= expr(ConfRankSql))
        .agg(min(col("ncn")).as("qn"))
      nc.filter(!col("cal"))
        .crossJoin(broadcast(qhat))
        .crossJoin(broadcast(ncal))
        .agg(max(col("ncal")).as("n_cal"), count(lit(1)).as("n_eval"),
          max(col("qn")).as("qn"),
          sum(when(col("ncn") <= col("qn"), 1L).otherwise(0L)).as("n_cov"))
        .select(col("n_cal"), col("n_eval"),
          graft.functions.EngineMath.roundAway(
            col("qn").cast("double") / 1e9, 6).as("qhat"),
          graft.functions.EngineMath.roundAway(
            col("n_cov").cast("double") / col("n_eval"), 6).as("coverage"))
    }),
    // x198: log-rank test between streak-survival cohorts — the
    // hypothesis test that turns x191's curves into a decision ("do
    // weekend-started streaks die faster?"). Cohort = whether the streak
    // STARTED on a weekend (Sat/Sun via exact Monday-anchored day
    // arithmetic — dayofweek() conventions differ across engines, the
    // datediff-mod-7 integer does not). Standard Mantel-Haenszel
    // machinery: at each death time, observed-minus-expected deaths in
    // cohort A under the hypergeometric null and its tie-corrected
    // variance — each term nano-quantized through ONE shared string
    // (LrESql/LrVSql) off exact integer risk sets, so O−E and V are
    // exact integer sums; z is ONE LrZSql read. Scale: identical to
    // x191 — the only rows-scale work is the distinct + per-user window;
    // the test frame is days-bounded.
    "x198_logrank" -> ((s, dir) => {
      val wU = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint() // consumers: window end + the island build
      val wend = d.agg(max(col("day")).as("wend"))
      val streaks = d
        .withColumn("isl", date_sub(col("day"), row_number().over(wU)))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("t"), min(col("day")).as("fday"),
          max(col("day")).as("lday"))
      // weekend iff days-since-Monday-anchor mod 7 ∈ {5, 6}; DuckDB
      // mirrors with datediff('day', DATE '1970-01-05', fday) % 7 —
      // exact integer arithmetic on both sides
      val byT = streaks.crossJoin(broadcast(wend))
        .withColumn("ga",
          datediff(col("fday"), to_date(lit("1970-01-05"))) % 7 >= 5)
        .groupBy(col("t"))
        .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("c_a"),
          sum(when(!col("ga"), 1L).otherwise(0L)).as("c_b"),
          sum(when(col("ga") && col("lday") < col("wend"), 1L)
            .otherwise(0L)).as("d_a"),
          sum(when(!col("ga") && col("lday") < col("wend"), 1L)
            .otherwise(0L)).as("d_b"))
        .localCheckpoint() // consumers: cohort totals + the test terms
      val tot = byT.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
        sum(col("d_a")).as("deaths_a"), sum(col("d_b")).as("deaths_b"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("t").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      byT.withColumn("na", sum(col("c_a")).over(wDesc))
        .withColumn("nb", sum(col("c_b")).over(wDesc))
        .filter(col("d_a") + col("d_b") > 0)
        .select(expr(LrESql).as("en"), expr(LrVSql).as("vn"))
        .agg(sum(col("en")).as("se"), sum(col("vn")).as("sv"),
          count(lit(1)).as("n_death_times"))
        .crossJoin(broadcast(tot))
        .select(col("n_a"), col("n_b"), col("deaths_a"), col("deaths_b"),
          col("n_death_times"),
          graft.functions.EngineMath.roundAway(
            col("se").cast("double") / 1e9, 6).as("o_minus_e"),
          graft.functions.EngineMath.roundAway(
            col("sv").cast("double") / 1e9, 6).as("variance"),
          graft.functions.EngineMath.roundAway(expr(LrZSql), 6).as("z"))
    }),
    // x199: the STREAM-maintained twin of x190 — the ACF's state is one
    // ADDITIVE (type, day) aggregate (the x123/x149/x176 decomposition:
    // accumulate integers in the stream, derive at read time), so the
    // seasonality fingerprint is maintainable incrementally; the SHARED
    // acfOverDaily read derives moments, lag pairs, and AcfSql over the
    // bounded (types × days) frame. Same oracle as x190: stream ≡ batch
    // is the point.
    "x199_stream_acf" -> ((s, dir) =>
      acfOverDaily(graft.streaming.StreamOps
        .dailyValueSumsStreaming(s, s"$dir/events.parquet"))),
    // x200: sliced Wasserstein embedding drift — the EMBEDDING-space
    // twin of the x167/x177 scalar drift monitor (PSI/W1 watch one
    // number; a representation regression shows up in the embedding
    // DISTRIBUTION first). Sliced-W1 (Rabin et al.): project both
    // cohorts onto fixed deterministic directions and take the exact 1-D
    // Wasserstein per slice — each projection is one broadcast literal
    // dot product per row (the x183 fold, bit-identical in both
    // engines), micro-quantized to integers, and the per-slice W1 is the
    // x167 exact-integer cumulative read with windows PARTITIONED BY
    // slice (bounded by |distinct projected values| per slice). The
    // direction arrays are plan-time literals spliced from ONE Scala
    // constant into both engines.
    "x200_sliced_w1" -> ((s, dir) => {
      val e = graft.engine.CacheScope.persistTracked(
        embeddingsD(s, dir).select(col("vec_id"), col("vec"),
          (col("vec_id") % 2 === 0).as("isA")))
      val sliced = SlicedW1Dirs.zipWithIndex.map { case (dv, j) =>
        e.select(lit(j.toLong).as("slice"),
          floor(aggregate(zip_with(col("vec"), typedlit(dv),
            (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
            * 1e6 + lit(0.5)).cast("long").as("vm"),
          col("isA"))
      }.reduce(_ unionAll _)
      val counts = sliced.groupBy(col("slice"), col("vm"))
        .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("cb"))
        .localCheckpoint() // consumers: per-slice totals + the cumsum
      val tot = counts.groupBy(col("slice"))
        .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("slice")).orderBy(col("vm"))
      val wCum = wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      counts
        .withColumn("cuma", sum(col("ca")).over(wCum))
        .withColumn("cumb", sum(col("cb")).over(wCum))
        .withColumn("nxt", lead(col("vm"), 1).over(wOrd))
        .filter(col("nxt").isNotNull)
        .join(broadcast(tot), "slice")
        .withColumn("term",
          abs(col("cuma").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")
            - col("cumb").cast("decimal(38,0)") * col("na").cast("decimal(38,0)")) *
            (col("nxt") - col("vm")).cast("decimal(38,0)"))
        .groupBy(col("slice"))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(col("term")).as("st"))
        .select(col("slice"), col("na").as("n_a"), col("nb").as("n_b"),
          graft.functions.EngineMath.roundAway(expr(W1Sql), 6).as("w1"))
        .orderBy(col("slice"))
    }),
    // x201: 5-fold cross-validated AUC of the quality model — the
    // HELD-OUT evaluation x88/x192 (train-set metrics) cannot give:
    // every doc is scored exactly once by a model that never saw it.
    // Folds = the x106 48-bit md5 modulo device (engine-stable, no RNG);
    // per fold the model refits on the other 4 folds (memoized per
    // (corpus, fold)), weights are staged so the oracle re-derives the
    // identical 6-dp scores, and the AUC is x88's tie-averaged
    // Mann-Whitney rank arithmetic — exact integers until one guarded
    // division (CvAucSql; 0.5 when a fold is single-class). Scale: 5
    // sequential fits over the quality-feature frame (each one scan +
    // one tiny LBFGS); scoring windows run over |distinct scores| per
    // fold (the x88 bound).
    "x201_cv_auc" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val foldCol = conv(substring(md5(concat(lit("cv:"),
        col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long") % 5
      val perFold = (0 until 5).map { f =>
        val model = graft.operators.Fitted.getOrFit(s,
          graft.operators.Fitted.key(dir, "qlrcv", "fold" -> f,
            "maxIter" -> 25, "reg" -> 0.01, "target" -> "src0")) {
          graft.operators.QualityFilter.fit(docs.filter(foldCol =!= f),
            "doc_id", "text", isTarget = col("source") === "src0")
        }
        Stage.write(model, dir, s"x201_weights_$f")
        val scored = graft.operators.QualityFilter
          .logits(docs.filter(foldCol === f), "doc_id", "text", model)
          .select(col("id").as("doc_id"),
            graft.functions.EngineMath.roundAway(col("logit"), 6).as("score"))
          .join(docs.select(col("doc_id"),
            (col("source") === "src0").cast("long").as("pos")), Seq("doc_id"))
        val byScore = org.apache.spark.sql.expressions.Window
          .orderBy(col("score"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        scored.groupBy(col("score"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
          .withColumn("cb", coalesce(sum(col("n")).over(byScore), lit(0L)))
          // pre-widened like x88: the rank products pass 2^63 at scale
          .agg(sum(col("np").cast("decimal(38,0)") *
              (lit(2) * col("cb") + col("n") + lit(1))).as("s2"),
            sum(col("np")).as("p"), sum(col("n")).as("tot"))
          .select(lit(f.toLong).as("fold"), col("tot").as("n_test"),
            col("p").as("n_pos"), expr(CvAucSql).as("auc"))
      }
      perFold.reduce(_ unionAll _).orderBy(col("fold"))
    }),
    // x202: split-leakage audit — QUANTIFIES the eval contamination the
    // x44/x46 group-aware split exists to prevent: of the banded
    // near-dup pairs (the production x46 pair source), how many straddle
    // train/val/test under a naive id-keyed split vs the group-keyed
    // split (which must be exactly 0 — a straddling pair would mean a
    // test doc has a near-duplicate in train, the classic benchmark
    // leak). Same md5 split arithmetic on both key choices, banded pairs
    // staged so the oracle re-derives components and both splits
    // independently. Scale: the pair source is the banded x46 path;
    // splits are per-row md5s; the audit is two equi-joins + one
    // aggregate to 4 scalars.
    "x202_split_leakage" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val pairs = graft.engine.CacheScope.persistTracked(
        Dedup.minhashPairs(d, "doc_id", "text", k = 3, threshold = 0.8))
      Stage.write(pairs.select(col("id_a"), col("id_b")), dir, "x202_pairs")
      val base = d.select(col("doc_id"))
      val splits = Dedup.groupAwareSplit(base, "doc_id", pairs, splitWeights)
        .select(col("doc_id"), col("split").as("gsplit"),
          graft.operators.Sampling.assignSplit(col("doc_id"), splitWeights)
            .as("nsplit"))
      pairs
        .join(splits.select(col("doc_id").as("id_a"), col("gsplit").as("ga"),
          col("nsplit").as("na")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("gsplit").as("gb"),
          col("nsplit").as("nb")), "id_b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("na") =!= col("nb"), 1L).otherwise(0L))
            .as("n_straddle_naive"),
          sum(when(col("ga") =!= col("gb"), 1L).otherwise(0L))
            .as("n_straddle_group"))
        .select(col("n_pairs"), col("n_straddle_naive"),
          col("n_straddle_group"),
          graft.functions.EngineMath.roundAway(expr(LeakRateSql), 6)
            .as("leak_rate_naive"))
    }),
    // x203: quality-filter selection-bias audit — the disparate-impact
    // readout a production filter needs BEFORE it curates ("does the
    // model systematically downrank one source?"): per source, the
    // selection rate at the GLOBAL top-quartile threshold (the p75
    // order statistic of the 6-dp scores, picked via the value-grouped
    // cumulative — a |distinct scores| frame, the x196 device; selected
    // iff strictly above it). Rates are exact integer shares; the
    // threshold is the same double in both engines (identical 6-dp
    // scores, identical order statistic). A low min/max rate ratio
    // across sources is the four-fifths-rule flag.
    "x203_selection_bias" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val scored = qlrScoredLab(s, dir, "x203_weights")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .localCheckpoint() // consumers: total, threshold pick, rates
      val tot = scored.agg(count(lit(1)).as("nn"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val thr = scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wv))
        .crossJoin(broadcast(tot))
        .filter(col("cum") >= expr(SelThrRankSql))
        .agg(min(col("score")).as("thr"))
      scored.crossJoin(broadcast(thr))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > col("thr"), 1L).otherwise(0L))
            .as("n_selected"))
        .select(col("source"), col("n_docs"), col("n_selected"),
          graft.functions.EngineMath.roundAway(
            col("n_selected").cast("double") / col("n_docs"), 6)
            .as("sel_rate"))
        .orderBy(col("source"))
    }),
    // x204: PCA whitening report over the embedding corpus — top-4
    // principal components (eigenvalue, measured projected variance,
    // explained share): the decorrelation step before IVF/PQ indexing
    // (correlated dims waste codebook bits) and the "how many dims carry
    // the variance" datacard read. Rows-scale work is ONE moment pass
    // (d(d+1)/2 map-side-combined cells) + one projection scan; the
    // eigendecomposition is driver-side deterministic Jacobi over the
    // collected 64×64 covariance (operators/Pca — the "fit is tiny, data
    // is not" split), staged with mean + trace so the oracle re-derives
    // every projection independently (the x13 staged-model contract).
    // Projections use graft_dot (sequential fold ≡ DuckDB's
    // list_dot_product) on the centered vector and micro-quantize before
    // the variance sums, so both engines aggregate identical integers.
    "x204_pca_whitening" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = embeddingsD(s, dir)
      val model = graft.operators.Fitted.getOrFit(s,
        graft.operators.Fitted.key(dir, "pca", "k" -> 4)) {
        graft.operators.Pca.fit(e, "vec", k = 4)
      }
      Stage.write(model, dir, "x204_rotation")
      e.crossJoin(broadcast(model))
        .withColumn("p", call_function("graft_dot",
          zip_with(col("vec"), col("mu"), (a, b) => a - b), col("w")))
        .withColumn("pm", floor(col("p") * lit(1e6) + lit(0.5)).cast("long"))
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n"), sum(col("pm")).as("sp"),
          sum(col("pm").cast("decimal(38,0)") * col("pm")).as("spp"),
          max(col("eigval")).as("ev"), max(col("trace")).as("tr"))
        .select(col("comp"), col("n"),
          graft.functions.EngineMath.roundAway(expr(PcaVarSql), 6)
            .as("var_proj"),
          graft.functions.EngineMath.roundAway(col("ev"), 6).as("eigval"),
          graft.functions.EngineMath.roundAway(expr("ev / tr"), 6)
            .as("explained_share"))
        .orderBy(col("comp"))
    }),
    // x205: leave-one-source-out AUC ablation — the data-valuation read
    // on the quality model ("which source props up / drags down the
    // scorer's separability"): for each source, the tie-averaged
    // Mann-Whitney AUC over every doc EXCEPT that source's, as a delta
    // against the full-corpus AUC. ONE scoring pass: the per-(source,
    // score) histogram subtracts from the global per-score histogram
    // (ablation = histogram arithmetic, never a re-scan per source), and
    // each ablated AUC runs the x88 grouped-rank algebra on a window
    // PARTITIONED by the excluded source — |sources| × |distinct scores|
    // frames, never rows. Excluding src0 removes every positive: the
    // CvAucSql single-class guard pins that row to 0.5 by convention.
    "x205_source_ablation" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val lab = qlrScoredLab(s, dir, "x205_weights")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint() // consumers: global hist + per-source hist
      val g = lab.groupBy(col("score"))
        .agg(count(lit(1)).as("gn"), sum(col("pos")).as("gnp"))
        .localCheckpoint() // consumers: per-source subtraction + full AUC
      val per = lab.groupBy(col("source"), col("score"))
        .agg(count(lit(1)).as("sn"), sum(col("pos")).as("snp"))
      val sub = g
        .crossJoin(broadcast(docs.select(col("source")).distinct()))
        .join(per, Seq("source", "score"), "left")
        .select(col("source"), col("score"),
          (col("gn") - coalesce(col("sn"), lit(0L))).as("n"),
          (col("gnp") - coalesce(col("snp"), lit(0L))).as("np"))
        .filter(col("n") > 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val aucExcl = sub
        .withColumn("cb", coalesce(sum(col("n")).over(w), lit(0L)))
        .groupBy(col("source"))
        .agg(sum(col("np").cast("decimal(38,0)") *
            (lit(2) * col("cb") + col("n") + lit(1))).as("s2"),
          sum(col("np")).as("p"), sum(col("n")).as("tot"))
        .select(col("source"), col("tot").as("n_kept"),
          expr(CvAucSql).as("auc_excl"))
      val wg = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val full = g
        .withColumn("cb", coalesce(sum(col("gn")).over(wg), lit(0L)))
        .agg(sum(col("gnp").cast("decimal(38,0)") *
            (lit(2) * col("cb") + col("gn") + lit(1))).as("s2"),
          sum(col("gnp")).as("p"), sum(col("gn")).as("tot"))
        .select(expr(CvAucSql).as("auc_full"))
      aucExcl.crossJoin(broadcast(full))
        .select(col("source"), col("n_kept"),
          graft.functions.EngineMath.roundAway(col("auc_excl"), 6)
            .as("auc_excl"),
          graft.functions.EngineMath.roundAway(col("auc_full"), 6)
            .as("auc_full"),
          graft.functions.EngineMath.roundAway(
            expr("auc_excl - auc_full"), 6).as("delta"))
        .orderBy(col("source"))
    }),
    // x206: weight-proportional SYSTEMATIC resampling — the zero-RNG
    // resampler importance-weighted pipelines use (draws at positions
    // (2j+1)·W/(2N) over the weight cumsum, j = 0..N−1): doc i's
    // resample count = #draws inside its cumulative-weight interval, a
    // closed integer form off the x170 bucket-prefix-sum cumsum — no
    // rows-scale sort, no RNG, reproducible under ANY partitioning, and
    // the counts telescope to exactly N. Engine and oracle use mirrored
    // integer floor-div forms (Spark `div` ≡ DuckDB `//` on the
    // guaranteed-nonnegative numerator); per-source report: resampled
    // mass vs exact weight share — the resampler's bias readout.
    "x206_systematic_resample" -> ((s, dir) => {
      val perDoc = table(s, dir, "documents").select(col("doc_id"),
        col("source"), TextFunctions.tokenCount(col("text")).cast("long")
          .as("wt"))
      val cum = graft.operators.Ranks.globalCumSums(perDoc,
        expr("doc_id div 4096"), Seq(col("doc_id").asc), Seq("wt" -> "cw"))
      val tot = perDoc.agg(sum(col("wt")).as("ww"), count(lit(1)).as("nn"))
      def draws(cwExpr: String): String =
        s"CASE WHEN 2 * CAST($cwExpr AS DECIMAL(38,0)) * nn < ww THEN CAST(0 AS BIGINT) " +
          s"ELSE CAST((2 * CAST($cwExpr AS DECIMAL(38,0)) * nn - ww) div " +
          s"(2 * CAST(ww AS DECIMAL(38,0))) AS BIGINT) + 1 END"
      cum.crossJoin(broadcast(tot))
        .withColumn("cnt", expr(draws("cw")) - expr(draws("(cw - wt)")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("wt")).as("tokens"),
          sum(col("cnt")).as("n_resampled"), max(col("cnt")).as("max_per_doc"),
          max(col("ww")).as("__ww"), max(col("nn")).as("__nn"))
        .select(col("source"), col("n_docs"), col("tokens"),
          col("n_resampled"), col("max_per_doc"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(n_resampled AS DOUBLE) / __nn"), 6)
            .as("resample_share"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(tokens AS DOUBLE) / __ww"), 6).as("weight_share"))
        .orderBy(col("source"))
    }),
    // x207: DeLong confidence interval for the quality model's AUC —
    // the eval statistic x88's point estimate needs before scores gate
    // data ("is 0.74 vs 0.71 even distinguishable?"). DeLong placements
    // are CONSTANT within a score tie-group, so both placement moment
    // sums (positives' V10, negatives' V01) come off the |distinct
    // scores| histogram with one ascending window — exact integers
    // (doubled placements: 2·below + ties) widened to decimal until the
    // ONE shared fixed-order double chain (DlAucSql/DlSeSql); single-
    // class and degenerate (<2 per class) corpora ride explicit guards.
    "x207_delong_auc_ci" -> ((s, dir) => {
      val lab = qlrScoredLab(s, dir, "x207_weights")
      val wAsc = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wIncl = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = lab.agg(sum(col("pos")).as("mpos"),
        (count(lit(1)) - sum(col("pos"))).as("nneg"))
      lab.groupBy(col("score"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
        .withColumn("ng", col("n") - col("np"))
        .withColumn("cnb", coalesce(sum(col("ng")).over(wAsc), lit(0L)))
        .withColumn("cpi", sum(col("np")).over(wIncl))
        .crossJoin(broadcast(tot))
        .withColumn("p10", lit(2) * col("cnb") + col("ng"))
        .withColumn("p01", lit(2) * (col("mpos") - col("cpi")) + col("np"))
        .agg(max(col("mpos")).as("mpos"), max(col("nneg")).as("nneg"),
          sum(col("np").cast("decimal(38,0)") * col("p10")).as("s1"),
          sum(col("np").cast("decimal(38,0)") *
            col("p10").cast("decimal(38,0)") * col("p10")).as("s2"),
          sum(col("ng").cast("decimal(38,0)") * col("p01")).as("s1p"),
          sum(col("ng").cast("decimal(38,0)") *
            col("p01").cast("decimal(38,0)") * col("p01")).as("s2p"))
        .select(col("mpos").as("n_pos"), col("nneg").as("n_neg"),
          graft.functions.EngineMath.roundAway(expr(DlAucSql), 6).as("auc"),
          graft.functions.EngineMath.roundAway(expr(DlSeSql), 6).as("se"),
          graft.functions.EngineMath.roundAway(
            expr(s"($DlAucSql) - 1.96 * ($DlSeSql)"), 6).as("ci_lo"),
          graft.functions.EngineMath.roundAway(
            expr(s"($DlAucSql) + 1.96 * ($DlSeSql)"), 6).as("ci_hi"))
    }),
    // x208: Good-Turing frequency smoothing over the word-TRIGRAM
    // frequency histogram — the LM-side "how much probability mass
    // belongs to UNSEEN types" estimate (p0 = N₁/T) plus the smoothed
    // counts r* = (r+1)·N_{r+1}/N_r for r = 1..5: the classic smoother
    // and still the standard coverage diagnostic before an LM/vocab
    // freeze. Trigrams, not unigrams: this corpus's closed token
    // vocabulary has no rare tail (min unigram count 26), while the
    // trigram histogram is properly Zipf (9 424 hapax at sf0.01) — the
    // granularity where GT smoothing actually operates. Everything
    // reads off the count-of-counts histogram (|distinct c| rows); the
    // r ↔ r+1 lookup is a self-join on the tiny histogram; ratios are
    // one fixed-order double chain each, NULL where N_{r+1} = 0 (the
    // shared both-engines convention).
    "x208_good_turing" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(TextFunctions.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(explode(expr("transform(sequence(1, size(ts) - 2), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), " +
          "' ', element_at(ts, i + 2)))")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("m"))
        .localCheckpoint() // consumers: totals + the r/r+1 self-join
      val tot = hist.agg(
        sum(col("m").cast("decimal(38,0)") * col("c")).cast("long").as("tt"),
        sum(col("m")).as("vocab"),
        sum(when(col("c") === 1, col("m")).otherwise(0L)).as("n1"))
      val rs = hist.filter(col("c") <= 5)
        .join(hist.select((col("c") - 1).as("c"), col("m").as("m_next")),
          Seq("c"), "left")
      rs.crossJoin(broadcast(tot))
        .select(col("c").as("r"), col("m").as("n_r"),
          coalesce(col("m_next"), lit(0L)).as("n_r_next"),
          graft.functions.EngineMath.roundAway(expr(GtStarSql), 6)
            .as("r_star"), // GtStarSql reads the pre-alias c/m/m_next
          graft.functions.EngineMath.roundAway(
            expr("CAST(n1 AS DOUBLE) / tt"), 6).as("p0"),
          col("vocab"), col("tt").as("n_tokens"))
        .orderBy(col("r"))
    }),
    // x209: semantic decontamination probe — the embedding-space
    // companion to x40's exact n-gram scan: each corpus vector's MAX
    // cosine against the benchmark slice (vec_id % 50 = 0, the x40
    // split), bucketed into 0.1-wide bins. The benchmark side is
    // FIXED-SIZE at any corpus scale, so the scan is one broadcast pass
    // (the x10 shape — no shuffle on the corpus side); max-cos
    // quantizes to 4 dp BEFORE the per-vector max and the bin floor, so
    // both engines bucket identical integers. The histogram output
    // stays non-empty at every SF (a flagged-pairs list would be empty
    // on a clean corpus and prove nothing).
    "x209_semantic_decon" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = embeddingsD(s, dir)
      val bench = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("bench_id"), col("vec").as("bvec"))
      val corpus = graft.operators.Dedup.widen(
        e.filter(col("vec_id") % 50 =!= 0))
        .select(col("vec_id"), col("vec"))
      val dot = (x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column) => call_function("graft_dot", x, y)
      corpus.crossJoin(broadcast(bench))
        .withColumn("cosq",
          floor(dot(col("vec"), col("bvec")) /
            (sqrt(dot(col("vec"), col("vec"))) *
              sqrt(dot(col("bvec"), col("bvec")))) * lit(1e4) + lit(0.5))
            .cast("long"))
        .groupBy(col("vec_id")).agg(max(col("cosq")).as("mq"))
        .withColumn("bin", expr("CAST(floor(CAST(mq AS DOUBLE) / 1e3) AS BIGINT)"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("bin"))
    }),
    // x197: join-key skew audit over the schema's join graph — the
    // measurement that DECIDES between the plain shuffle join and the
    // salted path (x33/x34): per key column, row/key counts, the hottest
    // key's share, and the p99 per-key count. Per column: one rows-scale
    // key aggregate (map-side combined), then a count-of-counts frame
    // (|distinct counts|-sized) for the exact p99 via cumulative key
    // coverage — no sort of the key table, no collect. The five audited
    // columns are every equi-join key the engine's own queries shuffle on.
    "x197_skew_audit" -> ((s, dir) => {
      def stats(df: DataFrame, tbl: String, c: String): DataFrame = {
        val per = df.groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // consumers: totals + the count-of-counts
        val tot = per.agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
        val wv = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val p99 = per.groupBy(col("cnt")).agg(count(lit(1)).as("nk"))
          .withColumn("cum", sum(col("nk")).over(wv))
          .crossJoin(broadcast(tot.select(col("n_keys"))))
          .filter(col("cum") >= expr(SkewP99RankSql))
          .agg(min(col("cnt")).as("p99_cnt"))
        tot.crossJoin(broadcast(p99))
          .select(lit(s"$tbl.$c").as("key_col"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            graft.functions.EngineMath.roundAway(
              col("max_cnt").cast("double") / col("n_rows"), 6)
              .as("top_share"),
            col("p99_cnt"))
      }
      SkewAuditCols.map { case (tbl, c) => stats(table(s, dir, tbl), tbl, c) }
        .reduce(_ unionAll _)
        .orderBy(col("key_col"))
    }),
    // x210: within-document repetition — the degenerate-text filter every
    // pretraining pipeline runs (looping/boilerplate text shows as a high
    // repeated-trigram fraction). Per doc: 1 − distinct/total trigrams,
    // micro-quantized to a long BEFORE the per-source aggregation so both
    // engines sum identical integers (no double summation-order drift);
    // per source: doc count, avg/max repetition, docs over the 0.5 flag.
    // Scale shape: one trigram explode + a map-side-combined (doc, term)
    // agg — the same rows-scale pass as x179/x208; everything after is
    // |docs|→|sources| sized.
    "x210_repetition" -> ((s, dir) => {
      val tri = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), " +
            "' ', element_at(ts, i + 2)))")).as("t"))
      val per = tri.groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n3"), countDistinct(col("t")).as("d3"))
        .withColumn("repq",
          floor((col("n3") - col("d3")).cast("double") / col("n3") * lit(1e6)
            + lit(0.5)).cast("long"))
      per.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("repq")).as("srq"),
          max(col("repq")).as("mrq"),
          sum(when(col("repq") > 500000, lit(1L)).otherwise(lit(0L)))
            .as("n_flagged"))
        .select(col("source"), col("n_docs"),
          graft.functions.EngineMath.roundAway(
            col("srq").cast("double") / col("n_docs") / lit(1e6), 6)
            .as("avg_rep"),
          graft.functions.EngineMath.roundAway(
            col("mrq").cast("double") / lit(1e6), 6).as("max_rep"),
          col("n_flagged"))
        .orderBy(col("source"))
    }),
    // x211: Theil–Sen robust trend over the daily event counts — the
    // monitoring slope estimate outliers can't drag (median of all
    // pairwise day slopes), the robust companion to the Mann–Kendall
    // test. Scale shape: ONE rows-scale day aggregate (30 groups at any
    // SF — days are calendar-bounded); the #days² pair join, the rank
    // window, and the median read all run on aggregate-bounded frames.
    // The median is an explicit rank read ((nn+1)/2, (nn+2)/2 averaged)
    // so both engines pick identical elements under ties.
    "x211_theil_sen" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
        .select(datediff(col("day"), lit("2024-01-01")).cast("long").as("d"),
          col("c"))
      val pairs = daily.as("a").join(broadcast(daily.as("b")),
          col("b.d") > col("a.d"))
        .select(((col("b.c") - col("a.c")).cast("double") /
          (col("b.d") - col("a.d")).cast("double")).as("slope"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("slope"))
      val tot = pairs.agg(count(lit(1)).as("nn"))
      val dd = daily.agg(count(lit(1)).as("n_days"))
      pairs.withColumn("rn", row_number().over(w).cast("long"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(dd))
        // integer div (Spark's `/` on longs is DOUBLE division — an even
        // nn would make (nn+1)/2 a .5 no row ever equals)
        .filter(col("rn") === expr("(nn + 1) div 2") ||
          col("rn") === expr("(nn + 2) div 2"))
        .groupBy(col("n_days"), col("nn"))
        .agg((sum(col("slope")) / count(lit(1))).as("m"))
        .select(col("n_days"), col("nn").as("n_pairs"),
          graft.functions.EngineMath.roundAway(col("m"), 6)
            .as("theil_sen_slope"))
    }),
    // x212: pairwise Jensen–Shannon divergence between source unigram
    // distributions over the global top-300 terms — the mixture-design
    // read ("which sources are near-duplicates distributionally, which
    // add diversity") behind reweighting decisions. Scale shape: ONE
    // rows-scale term explode + (source, term) agg; the top-300 cut,
    // the |sources|×300 grid, the pair join (|sources|²×300) and the
    // per-pair fold are all aggregate-bounded and broadcast. Per-term
    // contributions fold in sorted term order on both engines (the x96
    // device), so the double sum carries no order drift.
    "x212_jsd_matrix" -> ((s, dir) => {
      val per = table(s, dir, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text")))
          .as("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: global top-300 + the selected join
      val top = per.groupBy(col("t")).agg(sum(col("c")).as("g"))
        .orderBy(col("g").desc, col("t").asc).limit(300).select(col("t"))
      val sel = per.join(broadcast(top), "t")
      val tots = sel.groupBy(col("source")).agg(sum(col("c")).as("tot"))
      val cells = tots.crossJoin(broadcast(top))
        .join(sel, Seq("source", "t"), "left")
        .select(col("source"), col("t"), coalesce(col("c"), lit(0L)).as("c"),
          col("tot"))
      cells.as("a").join(broadcast(cells.as("b")),
          col("a.t") === col("b.t") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.t").as("t"), col("a.c").as("ca"), col("a.tot").as("ta"),
          col("b.c").as("cb"), col("b.tot").as("tb"))
        .withColumn("contrib", expr(JsdTermSql))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sort_array(collect_list(struct(col("t"), col("contrib"))))
          .as("cs"))
        .select(col("src_a"), col("src_b"),
          graft.functions.EngineMath.roundAway(
            expr("aggregate(cs, 0.0d, (acc, x) -> acc + x.contrib)"), 6)
            .as("jsd"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    // x213: token-budget allocation across sources — greedy knapsack by
    // quality density (distinct-trigram ratio): spend a 50%-of-corpus
    // token budget on the highest-quality sources first, fractionally at
    // the boundary. The capacity planner behind "which sources fit the
    // next training run". Scale shape: one rows-scale token/trigram pass
    // (map-side combined); the ranking cumsum runs over #sources rows.
    // All allocation arithmetic is exact integers; only the output
    // ratios touch doubles.
    "x213_budget_alloc" -> ((s, dir) => {
      val m = table(s, dir, "documents")
        .select(col("source"), TextFunctions.tokens(col("text")).as("ts"))
      val nTok = m.groupBy(col("source"))
        .agg(sum(size(col("ts")).cast("long")).as("n1"))
      val tri = m.filter(size(col("ts")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), " +
            "' ', element_at(ts, i + 2)))")).as("t"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n3"), countDistinct(col("t")).as("d3"))
      val q = nTok.join(tri, Seq("source"), "left")
        .select(col("source"), col("n1"),
          coalesce(floor(col("d3").cast("double") / col("n3") * lit(1e6)
            + lit(0.5)).cast("long"), lit(0L)).as("qq"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("qq").desc, col("source").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = q.agg((sum(col("n1")) / 2).cast("long").as("budget"))
      q.withColumn("cum", sum(col("n1")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("alloc",
          greatest(lit(0L), least(col("n1"),
            col("budget") - (col("cum") - col("n1")))))
        .select(col("source"), col("n1").as("n_tokens"),
          graft.functions.EngineMath.roundAway(
            col("qq").cast("double") / lit(1e6), 6).as("quality"),
          col("alloc").as("alloc_tokens"),
          graft.functions.EngineMath.roundAway(
            col("alloc").cast("double") / col("n1"), 6).as("alloc_frac"))
        .orderBy(col("source"))
    }),
    // x214: seasonality profile of the event stream — day-of-week and
    // hour-of-day load shares vs uniform, the drift-monitoring
    // companion that separates expected periodic swing from genuine
    // distribution change before a CUSUM/KS alarm is trusted. One
    // rows-scale pass per unit (map-side combined into 7 + 24 groups);
    // everything downstream is constant-sized.
    "x214_seasonality" -> ((s, dir) => {
      val e = table(s, dir, "events")
      def profile(unit: String, bucket: org.apache.spark.sql.Column,
          k: Int): DataFrame = {
        val d = e.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_events"))
        val tt = d.agg(sum(col("n_events")).as("tt"))
        d.crossJoin(broadcast(tt))
          .select(lit(unit).as("unit"), col("bucket"), col("n_events"),
            graft.functions.EngineMath.roundAway(
              col("n_events").cast("double") / col("tt"), 6).as("share"),
            graft.functions.EngineMath.roundAway(
              col("n_events").cast("double") * k / col("tt"), 6)
              .as("ratio_to_uniform"))
      }
      profile("dow", (dayofweek(col("ts")) - 1).cast("long"), 7)
        .unionAll(profile("hour", hour(col("ts")).cast("long"), 24))
        .orderBy(col("unit"), col("bucket"))
    }),
    // x215: exact two-sided 5% trimmed mean of l_extendedprice per
    // return flag — the robust cost statistic that survives fat-tailed
    // outliers. NO per-group sort of rows: prices quantize losslessly to
    // cents (they carry 2 decimals), the per-(flag, cent) histogram is
    // one map-side-combined pass, and the trim is interval arithmetic on
    // the histogram's cumulative counts — the window frame is |distinct
    // cents| (price-range-bounded, ~10M ceiling regardless of rows), the
    // same value-grouped class as x134. Kept mass sums exactly in
    // DECIMAL, so both engines emit identical means.
    "x215_trimmed_mean" -> ((s, dir) => {
      val h = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag")).orderBy(col("cents"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val tots = h.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      h.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
        .join(broadcast(tots), "l_returnflag")
        .withColumn("k", floor(col("n").cast("double") * 0.05).cast("long"))
        .withColumn("kept",
          greatest(lit(0L), least(col("cb") + col("c"), col("n") - col("k"))
            - greatest(col("cb"), col("k"))))
        .filter(col("kept") > 0)
        .groupBy(col("l_returnflag"), col("n"), col("k"))
        .agg(sum(col("kept")).as("n_kept"),
          sum(col("kept").cast("decimal(38,0)") * col("cents")).as("sw"))
        .select(col("l_returnflag"), col("n").as("n_rows"),
          col("k").as("n_trimmed_each"), col("n_kept"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sw AS DOUBLE) / n_kept / 100.0"), 6)
            .as("trimmed_mean_price"))
        .orderBy(col("l_returnflag"))
    }),
    // x216: HyperLogLog distinct-text estimate per source — the
    // mergeable-sketch cardinality read a 100 TB pipeline keeps instead
    // of exact distincts (registers are 512 small ints per source,
    // mergeable across shards/days by register-max; the exact column
    // here exists to measure the sketch's error). Register build is
    // engine-specific (xxhash64) and STAGES (the x46 hand-off); the
    // estimate arithmetic is exact INTEGER register mass — Σ2^(56−M)
    // in DECIMAL (powers of two are exact, decimal sums are
    // order-free) — then one fixed-order double read (shared
    // HllEstSql), so both engines derive identical estimates from the
    // staged registers.
    "x216_hll_distinct" -> ((s, dir) => {
      val p = 9; val m = 1 << p
      val regs = table(s, dir, "documents")
        .select(col("source"), xxhash64(col("text")).as("h"))
        .select(col("source"),
          expr(s"shiftrightunsigned(h, ${64 - p})").as("bucket"),
          expr(s"h & ${(1L << (64 - p)) - 1}").as("w"))
        .withColumn("mreg",
          when(col("w") === 0, lit(64 - p + 1))
            .otherwise(lit(64 - p + 1) - length(expr("bin(w)")))
          .cast("long"))
        .groupBy(col("source"), col("bucket"))
        .agg(max(col("mreg")).as("mreg"))
        .localCheckpoint() // consumers: the stage dump + the estimate
      Stage.write(regs, dir, "x216_regs")
      val est = regs.groupBy(col("source"))
        .agg(count(lit(1)).as("present"),
          sum(pow(lit(2.0), lit(64 - p + 1) - col("mreg"))
            .cast("decimal(38,0)")).as("mass"))
        .select(col("source"), lit(m.toLong).as("m"),
          (lit(m.toLong) - col("present")).as("zeros"),
          (col("mass") + (lit(m.toLong) - col("present"))
            .cast("decimal(38,0)") * lit(1L << (64 - p + 1))
            .cast("decimal(38,0)")).as("sumscaled"))
        .withColumn("hll_est_raw", expr(HllEstSql(m)))
      val exact = table(s, dir, "documents").groupBy(col("source"))
        .agg(countDistinct(col("text")).as("n_exact"))
      est.join(exact, Seq("source"))
        .select(col("source"), col("m"), col("n_exact"),
          graft.functions.EngineMath.roundAway(col("hll_est_raw"), 2)
            .as("hll_est"),
          graft.functions.EngineMath.roundAway(
            (col("hll_est_raw") - col("n_exact").cast("double")) /
              col("n_exact"), 6).as("rel_err"))
        .orderBy(col("source"))
    }),
    // x217: Spearman vs Pearson correlation between document length
    // (n_chars) and token count — the "is this quality signal just
    // length in disguise" datacard read. NO rows-scale rank sort:
    // tie-averaged ranks come from the two VALUE histograms (doubled to
    // integers: r2 = 2·smaller + equal + 1, frame = |distinct values|,
    // bounded by the length range), broadcast back onto one scan, and
    // both correlations reduce to exact DECIMAL moment sums read out in
    // one fixed-order double expression (shared CorrSql).
    "x217_spearman" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("n_chars").as("x"),
          TextFunctions.tokenCount(col("text")).cast("long").as("y"))
        .localCheckpoint() // consumers: two value hists + the moment scan
      def rankMap(c: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        d.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          .withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
          .select(col("v").as(c), (lit(2L) * col("cb") + col("cnt") + 1L)
            .as(s"r2$c"))
      }
      d.join(broadcast(rankMap("x")), "x")
        .join(broadcast(rankMap("y")), "y")
        .agg(count(lit(1)).as("n"),
          sum(col("r2x").cast("decimal(38,0)")).as("sx"),
          sum(col("r2y").cast("decimal(38,0)")).as("sy"),
          sum(col("r2x").cast("decimal(38,0)") * col("r2x")).as("sxx"),
          sum(col("r2y").cast("decimal(38,0)") * col("r2y")).as("syy"),
          sum(col("r2x").cast("decimal(38,0)") * col("r2y")).as("sxy"),
          sum(col("x").cast("decimal(38,0)")).as("rsx"),
          sum(col("y").cast("decimal(38,0)")).as("rsy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("rsxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("rsyy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("rsxy"))
        .select(col("n"),
          graft.functions.EngineMath.roundAway(
            expr(CorrSql("sx", "sy", "sxx", "syy", "sxy")), 6)
            .as("spearman_rho"),
          graft.functions.EngineMath.roundAway(
            expr(CorrSql("rsx", "rsy", "rsxx", "rsyy", "rsxy")), 6)
            .as("pearson_r"))
    }),
    // x218: median + MAD (median absolute deviation) of l_extendedprice
    // per return flag — the robust location/scale pair that survives the
    // fat tails the mean/stddev don't. Built ENTIRELY on the x215 cent
    // histogram: the median is doubled-rank interval arithmetic on
    // cumulative counts, and the |2·cents − med2| deviation histogram is
    // a RE-AGGREGATION of the cent histogram (never a second rows-scale
    // scan) whose median reads the same way. Every intermediate is an
    // exact integer; doubles appear only in the final /200, /400 reads.
    "x218_mad" -> ((s, dir) => {
      val hist = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: median read + deviation re-agg
      val tots = hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      def median2(h: DataFrame, vCol: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col(vCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        h.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
          .join(broadcast(tots), "l_returnflag")
          .withColumn("r1", expr("(n + 1) div 2"))
          .withColumn("r2", expr("(n + 2) div 2"))
          .select(col("l_returnflag"), col("n"),
            when(col("cb") < col("r1") && col("r1") <= col("cb") + col("c"),
              col(vCol)).as("v1"),
            when(col("cb") < col("r2") && col("r2") <= col("cb") + col("c"),
              col(vCol)).as("v2"))
          .groupBy(col("l_returnflag"), col("n"))
          .agg((max(col("v1")) + max(col("v2"))).as("med2"))
      }
      val med = median2(hist, "cents")
      val dev = hist.join(broadcast(med.select(col("l_returnflag"),
          col("med2"))), "l_returnflag")
        .groupBy(col("l_returnflag"),
          abs(lit(2L) * col("cents") - col("med2")).as("ad"))
        .agg(sum(col("c")).as("c"))
      val mad = median2(dev, "ad")
        .select(col("l_returnflag"), col("med2").as("mad4"))
      med.join(broadcast(mad), "l_returnflag")
        .select(col("l_returnflag"), col("n").as("n_rows"),
          graft.functions.EngineMath.roundAway(
            col("med2").cast("double") / 200.0, 6).as("median_price"),
          graft.functions.EngineMath.roundAway(
            col("mad4").cast("double") / 400.0, 6).as("mad_price"))
        .orderBy(col("l_returnflag"))
    }),
    // x219: language-ID confusion matrix — the heuristic classifier
    // (x02's marker-count langIdOf) evaluated against the stored lang
    // labels: per (truth, guess) cell counts and the within-truth share.
    // The measurement that decides whether the cheap n-gram heuristic is
    // good enough to gate a 100 TB ingest or a model-based ID is needed.
    // One rows-scale pass (classify + count into ≤ |langs|² cells).
    "x219_langid_eval" -> ((s, dir) => {
      val cells = table(s, dir, "documents")
        .select(col("lang"),
          TextFunctions.langId(col("text")).as("lang_guess"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // consumers: cells + per-truth totals
      val tots = cells.groupBy(col("lang")).agg(sum(col("n")).as("nt"))
      cells.join(broadcast(tots), "lang")
        .select(col("lang"), col("lang_guess"), col("n"),
          graft.functions.EngineMath.roundAway(
            col("n").cast("double") / col("nt"), 6).as("share_of_lang"))
        .orderBy(col("lang"), col("lang_guess"))
    }),
    // x220: robust outlier gate — modified z-score |0.6745·(x−med)/MAD|
    // > 3.5 (the Iglewicz–Hoban rule) per return flag, the filter that
    // survives the fat tails a mean/stddev z-score is dragged by. Rides
    // x218's machinery end-to-end on the cent HISTOGRAM: the comparison
    // clears denominators into exact integers (13490·|2c−med2| >
    // 35000·mad4), so the outlier count is histogram mass — no doubles
    // anywhere except the output rate.
    "x220_robust_outliers" -> ((s, dir) => {
      val hist = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: median read + dev re-agg + gate
      val tots = hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      def median2(h: DataFrame, vCol: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col(vCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        h.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
          .join(broadcast(tots), "l_returnflag")
          .select(col("l_returnflag"), col("n"),
            when(col("cb") < expr("(n + 1) div 2") &&
              expr("(n + 1) div 2") <= col("cb") + col("c"), col(vCol))
              .as("v1"),
            when(col("cb") < expr("(n + 2) div 2") &&
              expr("(n + 2) div 2") <= col("cb") + col("c"), col(vCol))
              .as("v2"))
          .groupBy(col("l_returnflag"), col("n"))
          .agg((max(col("v1")) + max(col("v2"))).as("med2"))
      }
      val med = median2(hist, "cents")
      val dev = hist.join(broadcast(med.select(col("l_returnflag"),
          col("med2"))), "l_returnflag")
        .groupBy(col("l_returnflag"),
          abs(lit(2L) * col("cents") - col("med2")).as("ad"))
        .agg(sum(col("c")).as("c"))
      val mad = median2(dev, "ad")
        .select(col("l_returnflag"), col("med2").as("mad4"))
      hist.join(broadcast(med.select(col("l_returnflag"), col("n"),
          col("med2"))), "l_returnflag")
        .join(broadcast(mad), "l_returnflag")
        .groupBy(col("l_returnflag"), col("n"))
        .agg(sum(when(lit(13490L) * abs(lit(2L) * col("cents") - col("med2"))
          > lit(35000L) * col("mad4"), col("c")).otherwise(lit(0L)))
          .as("n_outliers"))
        .select(col("l_returnflag"), col("n").as("n_rows"),
          col("n_outliers"),
          graft.functions.EngineMath.roundAway(
            col("n_outliers").cast("double") / col("n"), 6)
            .as("outlier_rate"))
        .orderBy(col("l_returnflag"))
    }),
    // x221: span-level PII redaction + per-source datacard — the
    // first-class transform x38's scan only accounts for (r11 verdict
    // item 4). The corpus carries no PII, so deterministic markers are
    // synthesized in-query (the b20/x38 precedent): email on doc_id%7,
    // phone on %11, IPv4 on %13, SSN on %17 — multiples of products
    // exercise multi-family docs. Scale shape: ONE projection scan of
    // codegen'd regexp builtins, then a map-side-combined groupBy
    // producing |sources| rows; rule order and count-on-current-text
    // semantics are the published operators/Redact contract, mirrored
    // by the oracle's staged regexp_replace CTE chain.
    "x221_pii_redact" -> ((s, dir) => {
      val t = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.org now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit(" call 555-123-4567 today")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".25 logged"))).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit(" ssn 987-65-4321 on file")).otherwise(lit("")))
      val base = table(s, dir, "documents")
        .select(col("source"), t.as("t"))
      graft.operators.Redact.datacard(
          graft.operators.Redact.redact(base, "t"), "source", "t")
        .orderBy(col("source"))
    }),
    // x222: URL canonicalization + canonical-URL dedup — the web-corpus
    // front gate (C4/RefinedWeb dedupe by canonical URL before any text
    // pass). Documents carry no URL, so deterministic variants are
    // synthesized from doc_id (host case, trailing slash, utm_* tracking
    // params, mixed real+junk query, fragment). Canonical form:
    // lowercase the scheme+host, strip the fragment, strip utm_* params
    // (mid-string first, then the [?&]-prefixed tail — one non-capturing
    // two-pass form shared verbatim with RE2; capture-group replacements
    // differ between Java ($1) and RE2 (\1), so none are used), then
    // collapse "/?"→"?" and the trailing slash. Scale shape: one
    // projection of codegen'd regexp builtins, one (domain, curl)
    // map-side-combined distinct-count, |domains| output rows.
    "x222_url_canonical" -> ((s, dir) => {
      val hosts = array(lit("Example.COM"), lit("news.example.com"),
        lit("Blog.Example.org"), lit("cdn.example.net"))
      val url = concat(lit("https://"),
        element_at(hosts, (col("doc_id") % 4 + 1).cast("int")),
        lit("/p/"), (col("doc_id") % 97).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 15 === 0,
          lit("?utm_source=feed&ref=home&utm_medium=rss"))
          .when(col("doc_id") % 3 === 0, lit("?utm_source=feed&utm_medium=rss"))
          .when(col("doc_id") % 5 === 0, lit("?ref=home"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("#sec2")).otherwise(lit("")))
      val hostRe = "^[A-Za-z]+://[^/?#]+"
      val lowered = concat(
        lower(regexp_extract(col("u"), hostRe, 0)),
        regexp_replace(col("u"), hostRe, ""))
      val canon = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(lowered,
          "#.*", ""),
          "utm_[a-z]+=[^&#?]*&", ""),
          "[?&]utm_[a-z]+=[^&#?]*", ""),
          "/\\?", "?"),
          "/$", "")
      table(s, dir, "documents").select(col("doc_id"), url.as("u"))
        .select(col("doc_id"), canon.as("curl"))
        .withColumn("domain",
          regexp_extract(col("curl"), "^[a-z]+://([^/?#]+)", 1))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("curl")).as("n_canonical"))
        .withColumn("n_dups", col("n_docs") - col("n_canonical"))
        .withColumn("dup_rate", graft.functions.EngineMath.roundAway(
          col("n_dups").cast("double") / col("n_docs"), 6))
        .orderBy(col("domain"))
    }),
    // x223: Kendall τ-b rank correlation between quantity and discount —
    // the tie-aware companion to x217's Spearman/Pearson, computed
    // ENTIRELY on the (quantity, discount-cent) value grid: concordant/
    // discordant mass is a broadcast grid self-join (|grid|² ≤ 550²
    // cells, never rows²), tie terms come off the two marginal
    // histograms, and nothing after the first scan grows with rows.
    // Pair counts carry in BIGINT — exact to ~4.3e9 rows; the 100 TB
    // variant widens the same algebra to DECIMAL(38,0).
    "x223_kendall_tau" -> ((s, dir) => {
      val g = table(s, dir, "lineitem")
        .groupBy(floor(col("l_quantity") + lit(0.5)).cast("long").as("q"),
          floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("d"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: pair join (both sides) + marginals
      val cd = g.as("a").join(broadcast(g.as("b")), col("b.q") > col("a.q"))
        .agg(
          sum(when(col("b.d") > col("a.d"), col("a.c") * col("b.c"))
            .otherwise(lit(0L))).as("conc"),
          sum(when(col("b.d") < col("a.d"), col("a.c") * col("b.c"))
            .otherwise(lit(0L))).as("disc"))
      val tieQ = g.groupBy(col("q")).agg(sum(col("c")).as("nq"))
        .agg(sum(expr("nq * (nq - 1) div 2")).as("tie_x"))
      val tieD = g.groupBy(col("d")).agg(sum(col("c")).as("nd"))
        .agg(sum(expr("nd * (nd - 1) div 2")).as("tie_y"))
      val tot = g.agg(sum(col("c")).as("n"))
        .withColumn("n_pairs", expr("n * (n - 1) div 2"))
      tot.crossJoin(broadcast(cd)).crossJoin(broadcast(tieQ))
        .crossJoin(broadcast(tieD))
        .select(col("n"), col("n_pairs"), col("conc"), col("disc"),
          col("tie_x"), col("tie_y"),
          graft.functions.EngineMath.roundAway(
            (col("conc") - col("disc")).cast("double") /
              (sqrt((col("n_pairs") - col("tie_x")).cast("double")) *
                sqrt((col("n_pairs") - col("tie_y")).cast("double"))), 6)
            .as("tau_b"))
    }),
    // x225: Neyman allocation — stratified sample-size allocation
    // n_h ∝ N_h·σ_h (the variance-aware upgrade of x128's proportional
    // quotas: high-variance strata get more of the measurement budget).
    // σ_h comes off exact integer moments; the weight total folds in
    // sorted source order (the x96 device) so the double sum carries no
    // order drift; integers are assigned by largest-remainder (the x128
    // device, telescoping to exactly T). Everything after the one
    // rows-scale moment scan runs on |sources| rows.
    "x225_neyman_alloc" -> ((s, dir) => {
      val T = 10000L
      val st = table(s, dir, "documents").groupBy(col("source"))
        .agg(count(lit(1)).as("n_h"), sum(col("n_chars")).as("s1"),
          sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)"))
            .as("s2"))
        .withColumn("sd", sqrt(expr(NeymanVarSql)))
        .withColumn("w", col("n_h").cast("double") * col("sd"))
      val tot = st
        .agg(sort_array(collect_list(struct(col("source"), col("w"))))
          .as("ws"))
        .select(expr(
          "aggregate(transform(ws, x -> x.w), 0.0d, (acc, v) -> acc + v)")
          .as("tw"))
      val based = st.crossJoin(broadcast(tot))
        .withColumn("share", expr(s"$T * w / tw"))
        .withColumn("base", floor(col("share")).cast("long"))
        .withColumn("rem", col("share") - floor(col("share")))
      val wRem = org.apache.spark.sql.expressions.Window
        .orderBy(col("rem").desc, col("source")) // |sources| rows
      based
        .crossJoin(broadcast(based.agg(sum(col("base")).as("sb"))))
        .withColumn("rk", row_number().over(wRem).cast("long"))
        .withColumn("alloc",
          col("base") + when(col("rk") <= lit(T) - col("sb"), 1L)
            .otherwise(0L))
        .select(col("source"), col("n_h"),
          graft.functions.EngineMath.roundAway(col("sd"), 6).as("sd"),
          col("alloc"))
        .orderBy(col("source"))
    }),
    // x226: A/B power readout — the pre-flight companion to x126's
    // Welch t: from the same exact moment columns, the standard error
    // of the mean difference and the minimum detectable effect at
    // two-sided α=0.05 / power 0.8 ("how small a lift could this
    // experiment even see"). One single-row moment agg; the z constants
    // are shared literals, the SE/MDE chains one string for both
    // engines.
    "x226_ab_power_mde" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("variant",
          when(substring(md5(concat(lit("ab1:"),
            col("user_id").cast("string"))), 1, 4) < "8000", lit("b"))
            .otherwise(lit("a")))
        .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
      ev.groupBy()
        .agg(
          sum(when(col("variant") === "a", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "b", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "a", col("vm")).otherwise(0L)).as("s_a"),
          sum(when(col("variant") === "b", col("vm")).otherwise(0L)).as("s_b"),
          // widen BEFORE the multiply (the x228 rule): vm*vm in
          // LongType would silently wrap past ~3e9 micro-units
          sum(when(col("variant") === "a",
            col("vm").cast("decimal(38,0)") * col("vm"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_a"),
          sum(when(col("variant") === "b",
            col("vm").cast("decimal(38,0)") * col("vm"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_b"))
        .select(col("n_a"), col("n_b"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${WelchMean("a")})"), 6).as("mean_a"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${WelchMean("b")})"), 6).as("mean_b"),
          graft.functions.EngineMath.roundAway(expr(AbSeSql), 6).as("se"),
          graft.functions.EngineMath.roundAway(expr(AbMdeSql), 6)
            .as("mde_abs"),
          graft.functions.EngineMath.roundAway(
            expr(s"($AbMdeSql) / (${WelchMean("a")})"), 6).as("mde_rel"))
    }),
    // x224: isotonic (PAV) calibration of the quality model — the
    // monotone recalibration x139's reliability bins only diagnose,
    // via the minimax identity iso_i = max_{j≤i} min_{k≥i} avg(j,k)
    // (weighted interval means of the positive rate), which needs no
    // sequential pooling loop: on B=20 equal-frequency score bins the
    // whole fit is B³ ≈ 8k interval cells of exact integer prefix
    // arithmetic — constant in rows. The only rows-scale work is the
    // scoring scan + the x139 bucket-prefix-sum rank; the oracle keeps
    // the naive row_number + the same minimax CTEs.
    "x224_isotonic" -> ((s, dir) => {
      val scored = qlrScoredLab(s, dir, "x224_weights")
        .withColumn("pm",
          floor(lit(1e6) / (lit(1.0) + exp(-col("score"))) + lit(0.5))
            .cast("long"))
      val bins = graft.operators.Ranks.globalRowNumber(scored,
          floor(col("score") * lit(1024.0)),
          Seq(col("score").asc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(
          table(s, dir, "documents").agg(count(lit(1)).as("nn"))))
        .withColumn("bin", expr("((rk - 1) * 20) div nn"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pm")).as("sp"),
          sum(col("pos")).as("np"))
        .localCheckpoint() // consumers: prefix join + interval grid + out
      val pre = bins.as("x")
        .join(broadcast(bins.as("y")), col("y.bin") <= col("x.bin"))
        .groupBy(col("x.bin").as("bin"))
        .agg(sum(col("y.n")).as("cn"), sum(col("y.np")).as("cnp"))
        .localCheckpoint() // consumers: interval grid (both sides)
      // intervals [j, k]: j ≥ 1 pairs a k-prefix with the (j−1)-prefix;
      // j = 0 intervals are the prefixes themselves (a left join's
      // null-extension only fires when a k has NO smaller prefix at all)
      val ivals = pre.as("k")
        .join(broadcast(pre.as("j1")), col("j1.bin") < col("k.bin"))
        .select((col("j1.bin") + 1).as("j"), col("k.bin").as("kk"),
          ((col("k.cnp") - col("j1.cnp")).cast("double") /
            (col("k.cn") - col("j1.cn")).cast("double")).as("a"))
        .unionByName(pre.select(lit(0L).as("j"), col("bin").as("kk"),
          (col("cnp").cast("double") / col("cn").cast("double")).as("a")))
      val iso = ivals
        .join(broadcast(bins.select(col("bin").as("i"))),
          col("j") <= col("i") && col("i") <= col("kk"))
        .groupBy(col("i"), col("j")).agg(min(col("a")).as("ma"))
        .groupBy(col("i")).agg(max(col("ma")).as("iso"))
      bins.join(broadcast(iso), col("bin") === col("i"))
        .select(col("bin"), col("n"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sp AS DOUBLE) / 1e6 / n"), 6).as("mean_pred"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(np AS DOUBLE) / n"), 6).as("frac_pos"),
          graft.functions.EngineMath.roundAway(col("iso"), 6)
            .as("iso_calibrated"))
        .orderBy(col("bin"))
    }),
    // x227: Brier score + Murphy decomposition (reliability −
    // resolution + uncertainty) of the quality model over x139-style
    // equal-frequency deciles — the one-row scorecard that says WHERE
    // calibration loss lives. The exact Brier term is an integer sum
    // ((pm − pos·1e6)² per doc, decimal accumulation); the per-decile
    // rel/res contributions are doubles folded in bin order (the x96
    // device), so no summation-order drift anywhere; `residual` is the
    // within-bin variance the binned identity leaves over.
    "x227_brier_decomp" -> ((s, dir) => {
      val scored = qlrScoredLab(s, dir, "x227_weights")
        .withColumn("pm",
          floor(lit(1e6) / (lit(1.0) + exp(-col("score"))) + lit(0.5))
            .cast("long"))
      val bins = graft.operators.Ranks.globalRowNumber(scored,
          floor(col("score") * lit(1024.0)),
          Seq(col("score").asc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(
          table(s, dir, "documents").agg(count(lit(1)).as("nn"))))
        .withColumn("bin", expr("((rk - 1) * 10) div nn"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("bn"), sum(col("pm")).as("sp"),
          sum(col("pos")).as("np"),
          sum(((col("pm") - col("pos") * lit(1000000L)) *
            (col("pm") - col("pos") * lit(1000000L))).cast("decimal(38,0)"))
            .as("bqk"))
        .localCheckpoint() // ONE scoring pass; totals derive from bins
      val tot = bins.agg(sum(col("bn")).as("n"), sum(col("np")).as("npos"),
        sum(col("bqk")).as("bq"))
      val folded = bins.crossJoin(broadcast(tot))
        .agg(sort_array(collect_list(struct(col("bin"), col("bn"),
          col("sp"), col("np"), col("n"), col("npos")))).as("bs"))
        .select(
          expr("aggregate(transform(bs, x -> " +
            "(CAST(x.sp AS DOUBLE) / 1e6 - x.np) * " +
            "(CAST(x.sp AS DOUBLE) / 1e6 - x.np) / x.bn), 0.0d, " +
            "(acc, v) -> acc + v)").as("relsum"),
          expr("aggregate(transform(bs, x -> " +
            "(x.np - x.bn * (CAST(x.npos AS DOUBLE) / x.n)) * " +
            "(x.np - x.bn * (CAST(x.npos AS DOUBLE) / x.n)) / x.bn), " +
            "0.0d, (acc, v) -> acc + v)").as("ressum"))
      tot.crossJoin(broadcast(folded))
        .select(col("n"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(bq AS DOUBLE) / 1e12 / n"), 6).as("brier"),
          graft.functions.EngineMath.roundAway(
            expr("relsum / n"), 6).as("reliability"),
          graft.functions.EngineMath.roundAway(
            expr("ressum / n"), 6).as("resolution"),
          graft.functions.EngineMath.roundAway(
            expr("(CAST(npos AS DOUBLE) / n) * " +
              "(1.0 - CAST(npos AS DOUBLE) / n)"), 6).as("uncertainty"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(bq AS DOUBLE) / 1e12 / n - (relsum / n - " +
              "ressum / n + (CAST(npos AS DOUBLE) / n) * " +
              "(1.0 - CAST(npos AS DOUBLE) / n))"), 6).as("residual"))
    }),
    // x228: CUPED variance reduction — the A/B readout x126/x226 run,
    // with each user's PRE-period spend as the control covariate
    // (Deng et al. 2013). One scan → per-user conditional sums (exact
    // micro-longs) → ONE moment aggregate carrying pooled x/y moments
    // AND per-variant splits; θ = cov/var and the adjusted lift are
    // shared float strings, and the variance-reduction ratio uses the
    // ρ² identity (1 − var(y−θx)/var(y) = cov²/(varx·vary)) so both
    // engines evaluate the same closed form. Never materializes an
    // adjusted per-user column — the whole adjustment is moment algebra.
    "x228_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("variant",
          when(substring(md5(concat(lit("ab1:"),
            col("user_id").cast("string"))), 1, 4) < "8000", lit("b"))
            .otherwise(lit("a")))
        .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
        .withColumn("pre",
          (unix_micros(col("ts")) < lit(CupedCutoffUs)).cast("long"))
      val users = ev.groupBy(col("user_id"), col("variant"))
        .agg(sum(when(col("pre") === 1L, col("vm")).otherwise(0L)).as("x"),
          sum(when(col("pre") === 0L, col("vm")).otherwise(0L)).as("y"))
      users.groupBy()
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          // widen BEFORE the multiply: per-user period sums reach ~5e9
          // micro-units at sf0.1, whose square overflows BIGINT
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
          sum(when(col("variant") === "a", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "b", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "a", col("x")).otherwise(0L)).as("sx_a"),
          sum(when(col("variant") === "b", col("x")).otherwise(0L)).as("sx_b"),
          sum(when(col("variant") === "a", col("y")).otherwise(0L)).as("sy_a"),
          sum(when(col("variant") === "b", col("y")).otherwise(0L)).as("sy_b"))
        .select(col("n"), col("n_a"), col("n_b"),
          graft.functions.EngineMath.roundAway(expr(CupedThetaSql), 6)
            .as("theta"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${CupedMeanSql("sy", "b")}) - (${CupedMeanSql("sy", "a")})"),
            6).as("diff_raw"),
          graft.functions.EngineMath.roundAway(expr(CupedDiffAdjSql), 6)
            .as("diff_cuped"),
          graft.functions.EngineMath.roundAway(expr(CupedVarRedSql), 6)
            .as("var_reduction"))
    }),
    // x229: equalized-odds fairness eval of the quality model — per-lang
    // TPR/FPR at the p ≥ 0.5 operating point (logit ≥ 0), plus the
    // max−min gap across groups (the equalized-odds distance x203's
    // selection-rate audit can't see: DI compares PREDICTIONS only,
    // this conditions on the label). Integer confusion cells per lang
    // until the two final divisions; the gaps subtract 6-dp-rounded
    // doubles and re-round, identical on both engines.
    "x229_equalized_odds" -> ((s, dir) => {
      val g = qlrScoredLab(s, dir, "x229_weights")
        .join(table(s, dir, "documents").select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .withColumn("pred", (col("score") >= 0.0).cast("long"))
        .groupBy(col("lang"))
        .agg(sum(col("pos")).as("np"),
          sum(lit(1L) - col("pos")).as("nn"),
          sum(col("pred") * col("pos")).as("tp"),
          sum(col("pred") * (lit(1L) - col("pos"))).as("fp"))
        .withColumn("tpr", graft.functions.EngineMath.roundAway(
          expr("CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / np END"), 6))
        .withColumn("fpr", graft.functions.EngineMath.roundAway(
          expr("CASE WHEN nn > 0 THEN CAST(fp AS DOUBLE) / nn END"), 6))
        // two consumers (output + gap aggregate) of one scoring scan —
        // cap it once, the x231/x235/x248 device
        .localCheckpoint()
      g.crossJoin(broadcast(g.agg(
          (max(col("tpr")) - min(col("tpr"))).as("tg"),
          (max(col("fpr")) - min(col("fpr"))).as("fg"))))
        .select(col("lang"), col("np").as("n_pos"), col("nn").as("n_neg"),
          col("tpr"), col("fpr"),
          graft.functions.EngineMath.roundAway(col("tg"), 6).as("tpr_gap"),
          graft.functions.EngineMath.roundAway(col("fg"), 6).as("fpr_gap"))
        .orderBy(col("lang"))
    }),
    // x230: average local clustering coefficient over the part
    // co-purchase graph — the Watts–Strogatz statistic x87's global
    // transitivity doesn't measure (per-vertex equal weighting vs
    // wedge-count weighting). Same √m-bounded compact-forward machinery,
    // corners exploded into one per-node aggregate
    // (operators/Graph.localClusteringStats).
    "x230_local_clustering" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      graft.operators.Graph.localClusteringStats(
        po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")),
        "u", "v")
    }),
    // x231: weight-of-evidence / information value of the quality score —
    // the credit-scoring-style feature report (how much does this score
    // separate the classes, and in which score region). x227's
    // equal-frequency bins (B = 10 via the bucket-prefix-sum rank), then
    // per-bin Laplace-smoothed WOE and a bin-ordered IV fold — everything
    // after the scoring scan is 10-cell arithmetic, constant in rows.
    "x231_woe_iv" -> ((s, dir) => {
      val scored = qlrScoredLab(s, dir, "x231_weights")
      val bins = graft.operators.Ranks.globalRowNumber(scored,
          floor(col("score") * lit(1024.0)),
          Seq(col("score").asc, col("doc_id").asc), "rk")
        .crossJoin(broadcast(
          table(s, dir, "documents").agg(count(lit(1)).as("nn_docs"))))
        .withColumn("bin", expr("((rk - 1) * 10) div nn_docs"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
        .withColumn("nn", col("n") - col("np"))
        .localCheckpoint() // consumers: totals + per-bin read + IV fold
      val tot = bins.agg(sum(col("np")).as("tnp"), sum(col("nn")).as("tnn"))
      val withTot = bins.crossJoin(broadcast(tot))
      val iv = withTot
        .agg(sort_array(collect_list(struct(col("bin"), col("np"),
          col("nn"), col("tnp"), col("tnn")))).as("bs"))
        .select(expr("aggregate(transform(bs, x -> " +
          s"${WoeIvTermSql("x.")}), 0.0d, (acc, v) -> acc + v)").as("iv"))
      withTot
        .select(col("bin"), col("n"), col("np").as("n_pos"),
          graft.functions.EngineMath.roundAway(
            expr(WoeSql("")), 6).as("woe"))
        .crossJoin(broadcast(iv))
        .withColumn("iv", graft.functions.EngineMath.roundAway(col("iv"), 6))
        .orderBy(col("bin"))
    }),
    // x232: context-length fit report — per source, how much of the
    // corpus fits a training context budget and how many tokens
    // truncation would lose at each budget (the packing-planner's input:
    // budget choice is a data question, not a guess). ONE tokenize scan,
    // integer conditional sums; budgets are engine constants (real
    // pipelines use 2k/8k/32k — the testdata's 10–99-token docs get
    // proportionate 32/64/96 so every band is exercised).
    "x232_context_fit" -> ((s, dir) => {
      val n = size(TextFunctions.tokens(col("text"))).cast("long")
      val perDoc = table(s, dir, "documents")
        .select(col("source"), n.as("nt"))
      val aggCols = Seq(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens")) ++
        ContextBudgets.flatMap { b =>
          Seq(sum((col("nt") <= b).cast("long")).as(s"fit_$b"),
            sum(greatest(col("nt") - b, lit(0L))).as(s"lost_$b"))
        }
      perDoc.groupBy(col("source")).agg(aggCols.head, aggCols.tail: _*)
        .orderBy(col("source"))
    }),
    // x233: Johnson–Lindenstrauss distortion probe — project the
    // embeddings through a deterministic ±1 (Achlioptas) sign matrix to
    // k = 16 dims and measure the squared-distance ratio over the
    // consecutive-id pair spine (one equi-join, O(n) pairs — never the
    // all-pairs grid). The sign matrix is md5-derived ONCE in Scala and
    // fed to both engines as a literal, so the projection is
    // reproducible everywhere; per-pair ratios quantize to 1e-6 ticks
    // before the global mean, min/max are exact tick selections.
    "x233_jl_distortion" -> ((s, dir) => {
      val proj = expr("transform(sequence(1, 16), j -> " +
        "aggregate(sequence(1, 64), 0.0d, (acc, i) -> " +
        "acc + element_at(element_at(S, j), i) * element_at(vec, i)) / 4.0)")
      val e = embeddingsD(s, dir)
        .withColumn("S", typedlit(JlSigns))
        .select(col("vec_id"), col("vec"), proj.as("y"))
      val pairs = e.as("a")
        .join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(
          expr("aggregate(zip_with(a.vec, b.vec, (p, q) -> (p - q) * (p - q)), " +
            "0.0d, (acc, v) -> acc + v)").as("d2o"),
          expr("aggregate(zip_with(a.y, b.y, (p, q) -> (p - q) * (p - q)), " +
            "0.0d, (acc, v) -> acc + v)").as("d2p"))
        .filter(col("d2o") > 0.0)
        .select(expr("CAST(floor(d2p / d2o * 1e6 + 0.5) AS BIGINT)").as("rt"))
      pairs.agg(count(lit(1)).as("n_pairs"), sum(col("rt")).as("srt"),
          min(col("rt")).as("mnt"), max(col("rt")).as("mxt"))
        .select(col("n_pairs"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(srt AS DOUBLE) / 1e6 / n_pairs"), 6).as("mean_ratio"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mnt AS DOUBLE) / 1e6"), 6).as("min_ratio"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mxt AS DOUBLE) / 1e6"), 6).as("max_ratio"))
    }),
    // x234: anytime-valid sequential A/B monitor (mSPRT, Johari et al.) —
    // the always-valid p-value that lets an experimenter peek daily
    // without alpha inflation, which x126's fixed-horizon Welch t cannot.
    // One scan → per-(day, variant) exact micro-sums (≤ 31×2 cells);
    // cumulative counts and the running max of ln Λ come from day-spine
    // self-joins (bounded by the calendar, never by rows); σ² is the
    // full-experiment pooled plug-in off the same x126 moment columns;
    // ln Λ quantizes to 1e-9 ticks before the running max so the p path
    // is order-independent.
    "x234_msprt" -> ((s, dir) =>
      msprtOverDayCells(abDayCells(Tables.events(s, dir)))),
    // x238: the STREAM-MAINTAINED twin of x234 — sequential monitoring is
    // the production use of an always-valid p-value, and the per-(day,
    // variant) cells it reads are ADDITIVE, so they accumulate in one
    // stateful aggregate (StreamOps.abDayCellsStreaming, Complete mode);
    // the non-additive mSPRT derivation stays the read-time fold shared
    // verbatim with x234 (the x176/x177/x190 decomposition contract).
    "x238_stream_msprt" -> ((s, dir) =>
      msprtOverDayCells(graft.streaming.StreamOps
        .abDayCellsStreaming(s, s"$dir/events.parquet"))),
    // x235: k-anonymity / l-diversity audit — the privacy-governance
    // readout a corpus release needs before quasi-identifiers ship.
    // ONE hash aggregate over the QI tuple (nation, segment, balance
    // band) carrying size + distinct-sensitive per class; everything
    // after is |classes|-sized (≤ |nations|×|segments|×|bands|), crossed
    // with the k policy axis. Violation shares and the l-diversity
    // floor/mean are exact integer arithmetic until the final divisions.
    "x235_k_anonymity" -> ((s, dir) => {
      val cls = table(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr(KAnonBandSql).as("band"),
          // the testdata carries no sensitive column, so a deterministic
          // md5 code (16 values) stands in — the audit arithmetic is the
          // operator; a real deployment passes its sensitive column here
          substring(md5(concat(lit("sens:"),
            col("c_custkey").cast("string"))), 1, 1).as("sens"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("l"))
        .localCheckpoint() // consumers: totals + per-k violation sums
      val tot = cls.agg(count(lit(1)).as("n_classes"), sum(col("n")).as("nr"),
        min(col("l")).as("min_l"), sum(col("l")).as("sl"))
      cls.crossJoin(broadcast(
          s.range(1).select(explode(typedlit(KAnonKs)).as("k"))))
        .groupBy(col("k"))
        .agg(sum(when(col("n") < col("k"), 1L).otherwise(0L))
            .as("n_viol_classes"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .as("n_viol_rows"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("n_classes"), col("n_viol_classes"),
          col("n_viol_rows"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(n_viol_rows AS DOUBLE) / nr"), 6).as("viol_share"),
          col("min_l"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sl AS DOUBLE) / n_classes"), 6).as("avg_l"))
        .orderBy(col("k"))
    }),
    // x236: retrieval eval — MRR and recall/precision@10 of the x10
    // brute-force ranker against same-label relevance, the IR-metrics
    // complement to x146's NDCG (which grades GRADED gains; MRR/recall
    // grade binary relevance and first-hit latency). Reuses
    // Similarity.bruteForceTopK (one broadcast of the query side);
    // per-query metrics quantize to 1e-6 ticks before the means, and
    // the relevant-corpus denominator is |same-label items| − 1.
    "x236_mrr_recall" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val labels = table(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val q = e.filter(col("vec_id") % 25 === 0)
      val top = Similarity.bruteForceTopK(e, "vec_id", "vec",
          q, "vec_id", "vec", k = 10)
        .join(broadcast(labels.select(col("vec_id").as("query_id"),
          col("label").as("ql"))), Seq("query_id"))
        .join(labels.select(col("vec_id").as("item_id"),
          col("label").as("il")), Seq("item_id"))
        .withColumn("rel", (col("ql") === col("il")).cast("long"))
      val relTot = labels.groupBy(col("label")).agg(count(lit(1)).as("nl"))
      val perQ = top.groupBy(col("query_id"), col("ql"))
        .agg(min(when(col("rel") === 1L, col("rank"))).as("fr"),
          sum(col("rel")).as("hits"))
        .join(broadcast(relTot.select(col("label").as("ql"),
          (col("nl") - 1).as("nrel"))), Seq("ql"))
        .select(
          expr("CAST(floor(CASE WHEN fr IS NULL THEN 0.0 " +
            "ELSE 1.0 / fr END * 1e6 + 0.5) AS BIGINT)").as("rrt"),
          expr("CAST(floor(CASE WHEN nrel > 0 THEN CAST(hits AS DOUBLE) " +
            "/ nrel ELSE 0.0 END * 1e6 + 0.5) AS BIGINT)").as("rct"),
          expr("CAST(floor(CAST(hits AS DOUBLE) / 10.0 * 1e6 + 0.5) " +
            "AS BIGINT)").as("pct"))
      perQ.agg(count(lit(1)).as("n_queries"), sum(col("rrt")).as("srr"),
          sum(col("rct")).as("src"), sum(col("pct")).as("spc"))
        .select(col("n_queries"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(srr AS DOUBLE) / 1e6 / n_queries"), 6).as("mrr"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(src AS DOUBLE) / 1e6 / n_queries"), 6)
            .as("recall_at_10"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(spc AS DOUBLE) / 1e6 / n_queries"), 6)
            .as("precision_at_10"))
    }),
    // x237: Holt double-exponential smoothing of daily event volume —
    // the trend-aware forecast x121's flat EWMA can't produce. Rows-scale
    // work is ONE (type, day) count aggregate; the level/trend recursion
    // folds the ≤ 31-element day series with a struct accumulator
    // (Spark `aggregate` with a non-element-typed zero; the oracle runs
    // the same recursion as a recursive CTE — a genuinely different
    // evaluation strategy re-proving the fold).
    "x237_holt" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("double").as("x"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("x"))))
          .as("cs"))
        .withColumn("vals", expr("transform(cs, c -> c.x)"))
        // Holt needs two seed observations: a type active on ONE day has
        // no defined trend — dropped explicitly here, exactly as the
        // oracle's rn=1 ⋈ rn=2 seed join drops it (engine/oracle parity
        // for the 1-day edge)
        .filter(size(col("vals")) >= 2)
        .withColumn("h", expr(
          "aggregate(slice(vals, 3, greatest(size(vals) - 2, 0)), " +
            "named_struct('l', element_at(vals, 2), " +
            "'b', element_at(vals, 2) - element_at(vals, 1)), " +
            s"(acc, x) -> named_struct('l', ${HoltLSql("acc.", "x")}, " +
            s"'b', ${HoltBSql("acc.", "x")}))"))
        .select(col("event_type"), size(col("vals")).cast("long")
            .as("n_days"),
          graft.functions.EngineMath.roundAway(expr("h.l"), 6).as("level"),
          graft.functions.EngineMath.roundAway(expr("h.b"), 6).as("trend"),
          graft.functions.EngineMath.roundAway(expr("h.l + h.b"), 6)
            .as("fc_1"),
          graft.functions.EngineMath.roundAway(expr("h.l + 7.0 * h.b"), 6)
            .as("fc_7"))
        .orderBy(col("event_type"))
    }),
    // x239: tokenizer fertility per language — pieces-per-word and
    // letters-per-piece under the x99 fixed subword vocabulary, the
    // standard multilingual-tokenizer equity report (a lang whose
    // fertility runs high pays more context budget per word). ONE scan
    // combining the x01 whitespace tokenizer with the x99 greedy
    // encoder; integer sums per lang, two final divisions.
    "x239_fertility" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      docs.select(col("lang"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("nt"),
          size(regexp_extract_all(lower(col("text")),
            lit(SubwordPattern), lit(0))).cast("long").as("np"),
          length(regexp_replace(lower(col("text")), "[^a-z]", ""))
            .cast("long").as("na"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("np")).as("n_pieces"), sum(col("na")).as("n_alpha"))
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_pieces"),
          graft.functions.EngineMath.roundAway(
            expr("CASE WHEN n_tokens > 0 THEN " +
              "CAST(n_pieces AS DOUBLE) / n_tokens END"), 6)
            .as("pieces_per_token"),
          graft.functions.EngineMath.roundAway(
            expr("CASE WHEN n_pieces > 0 THEN " +
              "CAST(n_alpha AS DOUBLE) / n_pieces END"), 6)
            .as("alpha_per_piece"))
        .orderBy(col("lang"))
    }),
    // x240: difference-in-differences — the causal-inference companion to
    // x228: same pre/post split and variant hash, but the estimand is the
    // change-vs-change contrast with a user-level (clustered) Welch SE.
    // Per-user pre/post micro-sums → per-user diff d = post − pre → the
    // x126 moment row OVER d (so the SE/t chains are WelchVar/WelchTSql
    // verbatim); pre-period means reported as the parallel-trends
    // eyeball. One scan, one user aggregate, one moment row.
    "x240_did" -> ((s, dir) => {
      val users = abDayProject(Tables.events(s, dir))
        .withColumn("pre",
          (unix_micros(col("ts")) < lit(CupedCutoffUs)).cast("long"))
        .groupBy(col("user_id"), col("variant"))
        .agg(sum(when(col("pre") === 1L, col("vm")).otherwise(0L)).as("x"),
          sum(when(col("pre") === 0L, col("vm")).otherwise(0L)).as("y"))
        .withColumn("dd", col("y") - col("x"))
      users.groupBy()
        .agg(
          sum(when(col("variant") === "a", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === "b", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === "a", col("dd")).otherwise(0L)).as("s_a"),
          sum(when(col("variant") === "b", col("dd")).otherwise(0L)).as("s_b"),
          // widen BEFORE the square: per-user period sums reach ~5e9
          // micro-units at sf0.1 (the x228 lesson)
          sum(when(col("variant") === "a",
            col("dd").cast("decimal(38,0)") * col("dd"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_a"),
          sum(when(col("variant") === "b",
            col("dd").cast("decimal(38,0)") * col("dd"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("q_b"),
          sum(when(col("variant") === "a", col("x")).otherwise(0L)).as("px_a"),
          sum(when(col("variant") === "b", col("x")).otherwise(0L)).as("px_b"))
        .select(col("n_a"), col("n_b"),
          graft.functions.EngineMath.roundAway(
            expr(s"(CAST(px_a AS DOUBLE) / 1e6) / n_a"), 6).as("pre_a"),
          graft.functions.EngineMath.roundAway(
            expr(s"(CAST(px_b AS DOUBLE) / 1e6) / n_b"), 6).as("pre_b"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${WelchMean("b")}) - (${WelchMean("a")})"), 6).as("did"),
          graft.functions.EngineMath.roundAway(expr(AbSeSql), 6).as("se"),
          graft.functions.EngineMath.roundAway(expr(WelchTSql), 6).as("t"))
    }),
    // x241: compression-ratio quality signal — deflated bytes / raw
    // bytes per doc via the native `graft_deflate_len` expression
    // (functions/TextCompression.scala; generated code calls the static
    // helper, so the scan stays in whole-stage codegen). The CCNet/
    // Gopher-family degenerate-text proxy the n-gram signals (x03, x131)
    // can't see: it catches ANY long-range repetition, not just fixed-k
    // grams. Per-doc 1e-6 ratio ticks are STAGED (DuckDB has no deflate
    // — the x08/x11 oracle contract); the per-source rollup is re-proved
    // in SQL from the staged table.
    "x241_compress_ratio" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val perDoc = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .filter(octet_length(col("text")) > 0)
          .select(col("doc_id"), col("source"),
            expr("CAST(floor(CAST(graft_deflate_len(text) AS DOUBLE) / " +
              "octet_length(text) * 1e6 + 0.5) AS BIGINT)").as("rt")))
      Stage.write(perDoc, dir, "x241_ratios")
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("rt")).as("srt"),
          min(col("rt")).as("mnt"),
          sum(when(col("rt") < CompressLowTick, 1L).otherwise(0L))
            .as("nlow"))
        .select(col("source"), col("n_docs"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(srt AS DOUBLE) / 1e6 / n_docs"), 6).as("mean_ratio"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mnt AS DOUBLE) / 1e6"), 6).as("min_ratio"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(nlow AS DOUBLE) / n_docs"), 6).as("share_low"))
        .orderBy(col("source"))
    }),
    // x242: high-entropy secret scan — the credential/API-key detector
    // the x38/x221 PII REGEX rules structurally can't express (secrets
    // have no fixed shape; their tell is length + mixed charset + near-
    // uniform char distribution). One tokenize scan; only the rare
    // ≥16-char mixed-alnum candidates explode to chars; per-token
    // entropy is a sum of 1e-12-tick terms (order-independent), the
    // rollup |sources|-sized. The testdata corpus carries no natural
    // candidates, so deterministic hex secrets are planted on every 7th
    // doc (the x222 synthesized-input contract — a real corpus drops the
    // planting and the scan is unchanged).
    "x242_secret_scan" -> ((s, dir) =>
      secretRollup(secretTokens(table(s, dir, "documents"))
        .groupBy(col("source")).agg(secretCellAggs.head,
          secretCellAggs.tail: _*))),
    // x247: the STREAM-MAINTAINED twin of x242 — governance scanning is
    // a scan-on-ingest job, and since the per-token entropy is computed
    // per ROW (HOF fold of integer ticks — no intermediate aggregate),
    // the per-source cells are additive and accumulate in ONE stateful
    // aggregate (StreamOps.secretCellsStreaming); the rollup division is
    // read-time, shared verbatim with x242.
    "x247_stream_secret_scan" -> ((s, dir) =>
      secretRollup(graft.streaming.StreamOps
        .secretCellsStreaming(s, s"$dir/documents.parquet"))),
    // x248: robust (5%-trimmed-mean) A/B readout — the outlier-immune
    // lift x126's raw means can't give: one whale user can't move it.
    // x215's exact cent-histogram trim device, partitioned by variant:
    // the window frame is |distinct cents| (range-bounded, never rows),
    // the trim boundary arithmetic is exact integers, and the final
    // lift/means are shared float strings over one conditional moment
    // row.
    "x248_robust_ab" -> ((s, dir) => {
      val ev = abDayProject(Tables.events(s, dir))
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
      val h = ev.groupBy(col("variant"), col("cents")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: totals + the trim chain — without
      // this the events scan + histogram aggregate run twice
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("variant")).orderBy(col("cents"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val tots = h.groupBy(col("variant")).agg(sum(col("c")).as("n"))
      h.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
        .join(broadcast(tots), "variant")
        .withColumn("k", floor(col("n").cast("double") * 0.05).cast("long"))
        .withColumn("kept",
          greatest(lit(0L), least(col("cb") + col("c"), col("n") - col("k"))
            - greatest(col("cb"), col("k"))))
        .filter(col("kept") > 0)
        .groupBy()
        .agg(
          max(when(col("variant") === "a", col("n"))).as("n_a"),
          max(when(col("variant") === "b", col("n"))).as("n_b"),
          sum(when(col("variant") === "a", col("kept")).otherwise(0L))
            .as("nk_a"),
          sum(when(col("variant") === "b", col("kept")).otherwise(0L))
            .as("nk_b"),
          sum(when(col("variant") === "a",
            col("kept").cast("decimal(38,0)") * col("cents"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sw_a"),
          sum(when(col("variant") === "b",
            col("kept").cast("decimal(38,0)") * col("cents"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sw_b"))
        .select(col("n_a"), col("n_b"), col("nk_a"), col("nk_b"),
          graft.functions.EngineMath.roundAway(
            expr(RobustTmSql("a")), 6).as("tm_a"),
          graft.functions.EngineMath.roundAway(
            expr(RobustTmSql("b")), 6).as("tm_b"),
          graft.functions.EngineMath.roundAway(
            expr(s"(${RobustTmSql("b")}) - (${RobustTmSql("a")})"), 6)
            .as("trimmed_lift"))
    }),
    // x250: STREAM-MAINTAINED exact percentiles — P50/P95/P99 per type
    // from the additive (type, micro-value) histogram
    // (StreamOps.valueHistStreaming): a sort-requiring statistic made
    // streamable because the histogram is the sufficient state and the
    // quantile_cont interpolation is read-time arithmetic over cumsums
    // (sloOverValueHist — the window frame is |distinct micro-values|,
    // value-domain-bounded, the x177 contract). The oracle re-derives
    // quantile_cont over the same micro-quantized values from the raw
    // table — a genuinely different evaluation strategy (sort vs
    // histogram walk) proving the interpolation exact.
    "x250_stream_slo" -> ((s, dir) =>
      sloOverValueHist(s, graft.streaming.StreamOps
        .valueHistStreaming(s, s"$dir/events.parquet"))),
    // x249: per-type value SLO report — exact P50/P95/P99 and max of the
    // event value per type, the latency-percentile-style scorecard ops
    // teams pin dashboards to. One hash aggregate (`percentile` ≡
    // DuckDB `quantile_cont`, the x16/x94 equivalence); at 100 TB the
    // same report swaps in percentile_approx (x26's documented scale
    // path) with identical shape.
    "x249_value_slo" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.95)").as("p95"),
          expr("percentile(value, 0.99)").as("p99"),
          max(col("value")).as("mx"))
        .select(col("event_type"), col("n"),
          graft.functions.EngineMath.roundAway(col("p50"), 6).as("p50"),
          graft.functions.EngineMath.roundAway(col("p95"), 6).as("p95"),
          graft.functions.EngineMath.roundAway(col("p99"), 6).as("p99"),
          graft.functions.EngineMath.roundAway(col("mx"), 6).as("max_value"))
        .orderBy(col("event_type"))),
    // x243: robust per-dimension embedding scaling — median/IQR per dim,
    // the outlier-immune normalization x204's PCA whitening (moment-
    // based) is not. One posexplode scan shuffles (dim, value) into 64
    // per-dim exact percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, the x16/x94 equivalence); output is d rows
    // regardless of corpus size — at 100 TB the scan dominates and the
    // stats frame broadcasts back for the actual normalization.
    "x243_robust_scale" -> ((s, dir) => {
      embeddingsD(s, dir)
        .select(posexplode(col("vec")).as(Seq("dim0", "v")))
        .select((col("dim0") + 1).cast("long").as("dim"), col("v"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(v, 0.25)").as("q25"),
          expr("percentile(v, 0.5)").as("q50"),
          expr("percentile(v, 0.75)").as("q75"))
        .select(col("dim"), col("n"),
          graft.functions.EngineMath.roundAway(col("q50"), 6).as("median"),
          graft.functions.EngineMath.roundAway(
            col("q75") - col("q25"), 6).as("iqr"))
        .orderBy(col("dim"))
    }),
    // x244: RFM segmentation — recency/frequency/monetary quintile codes
    // per user (code 5 = best on each axis), rolled up to segment cells
    // with mean spend: the classic activation/retention map. One event
    // scan → per-user frame → THREE bucket-prefix-sum ranks (the Ranks
    // device; quintiles are equal-frequency so ntile-style global ranks
    // are required — the oracle keeps three naive row_numbers, so every
    // hash match re-proves the device lossless three ways). Output is
    // ≤ 125 cells.
    "x244_rfm" -> ((s, dir) => {
      // persisted: the rank chain AND the count read it — without this
      // the events aggregate runs twice
      val users = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(datediff(lit("2024-01-31").cast("date"),
              max(to_date(col("ts")))).cast("long").as("rec"),
            count(lit(1)).as("freq"),
            sum(floor(col("value") * 1e6 + lit(0.5)).cast("long")).as("mon")))
      val withR = graft.operators.Ranks.globalRowNumber(users,
        -col("rec"), Seq(col("rec").desc, col("user_id").asc), "rk_r")
      val withF = graft.operators.Ranks.globalRowNumber(withR,
        col("freq"), Seq(col("freq").asc, col("user_id").asc), "rk_f")
      val withM = graft.operators.Ranks.globalRowNumber(withF,
        expr("mon div 1000000"), Seq(col("mon").asc, col("user_id").asc),
        "rk_m")
      withM
        .crossJoin(broadcast(users.agg(count(lit(1)).as("nn"))))
        .select(expr("((rk_r - 1) * 5) div nn + 1").as("r_code"),
          expr("((rk_f - 1) * 5) div nn + 1").as("f_code"),
          expr("((rk_m - 1) * 5) div nn + 1").as("m_code"),
          col("mon"))
        .groupBy(col("r_code"), col("f_code"), col("m_code"))
        .agg(count(lit(1)).as("n_users"), sum(col("mon")).as("sm"))
        .select(col("r_code"), col("f_code"), col("m_code"), col("n_users"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(sm AS DOUBLE) / 1e6 / n_users"), 6)
            .as("mean_monetary"))
        .orderBy(col("r_code"), col("f_code"), col("m_code"))
    }),
    // x245: sequential association rules — "A then B within a session",
    // the order-aware complement to x133's co-occurrence rules
    // (operators/EventAnalytics.sequentialRules; x21's gap rule shared
    // through sessionTagged so the session definition cannot drift).
    "x245_seq_rules" -> ((s, dir) =>
      graft.operators.EventAnalytics.sequentialRules(
        Tables.events(s, dir), gapMinutes = 30, minSupport = 5, k = 20)),
    // x246: importance-weight diagnostics for the x68 DSIR weights —
    // effective sample size (Kish: (Σu)²/Σu²) and max-weight share of
    // the softmax'd log-weights. THE go/no-go gauge before importance
    // resampling: a collapsed ESS means the weighted corpus is really a
    // handful of documents. Max-shift (one broadcast scalar) keeps exp
    // in range; u quantizes to 1e-9 ticks so the moment row is exact
    // integers under any partitioning.
    "x246_dsir_ess" -> ((s, dir) => {
      val w = graft.engine.CacheScope.persistTracked(
        graft.operators.Sampling.dsirWeights(table(s, dir, "documents"),
          "doc_id", "text", isTarget = col("source") === "src0", dim = 64))
      val u = w.crossJoin(broadcast(w.agg(max(col("weight")).as("wmax"))))
        .select(expr(
          "CAST(floor(exp(weight - wmax) * 1e9 + 0.5) AS BIGINT)").as("ut"))
      u.agg(count(lit(1)).as("n_docs"),
          sum(col("ut").cast("decimal(38,0)")).as("su"),
          sum(col("ut").cast("decimal(38,0)") * col("ut")).as("su2"),
          max(col("ut")).as("mu"))
        .select(col("n_docs"),
          graft.functions.EngineMath.roundAway(expr(DsirEssSql), 6).as("ess"),
          graft.functions.EngineMath.roundAway(
            expr(s"($DsirEssSql) / n_docs"), 6).as("ess_fraction"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(mu AS DOUBLE) / CAST(su AS DOUBLE)"), 6)
            .as("max_share"))
    }),
    // x251: the GATED scale swap for x114's exact uniqueness count —
    // countDistinct(fp) shuffles every distinct fingerprint; the HLL
    // sketch (approx_count_distinct, rsd 2%) is a fixed register array
    // per group, map-side combined — the shape that survives 100 TB.
    // The engine emits BOTH counts; the oracle recomputes the exact
    // count in DuckDB, reads the STAGED sketch estimate, and keeps only
    // rows inside the 5σ relative-error window — an out-of-bound
    // estimate drops the oracle row and fails the row-count compare.
    // This is the x26/x56/x81 tolerance-oracle pattern applied to the
    // swap x114 only documented.
    "x251_hll_unique" -> ((s, dir) => {
      val fp = table(s, dir, "documents").select(col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      val est = graft.engine.CacheScope.persistTracked(
        fp.groupBy(col("source")).agg(
          countDistinct(col("fp")).as("n_unique"),
          approx_count_distinct(col("fp"), 0.02).as("n_unique_hll")))
      Stage.write(est.select(col("source"), col("n_unique_hll")), dir,
        "x251_est")
      est.orderBy(col("source"))
    }),
    // x252: the GATED scale swap for x110/x218's exact medians — exact
    // percentile materializes the full per-group value multiset;
    // percentile_approx (Greenwald–Khanna, accuracy 100 ⇒ rank error
    // ≤ n/100) is a bounded mergeable summary, the 100 TB shape. The
    // oracle reads the STAGED estimate and verifies the GK theorem
    // itself in DuckDB — the estimate's rank inside its group must lie
    // in the guaranteed ±1% window — so a sketch violation drops the
    // oracle row and fails the compare.
    "x252_approx_median" -> ((s, dir) => {
      val est = graft.engine.CacheScope.persistTracked(
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            percentile_approx(col("value"), lit(0.5), lit(100))
              .as("med_est")))
      Stage.write(est, dir, "x252_est")
      est.orderBy(col("event_type"))
    }),
    // x253: the GATED scale swap for x63's exact decile split — ntile
    // wants a global rank (the Ranks device bounds the sort, but the
    // split itself is still rows-scale bookkeeping); 9 approx_percentile
    // boundaries (GK, accuracy 50) + one broadcast comparison pass is
    // the 100 TB shape: one scan to sketch, one codegen'd pass to
    // bucket. Bucket assignment from the STAGED boundaries replays
    // identically in DuckDB (same q > b fold), so the report compares
    // hash-exact; the oracle additionally checks each bucket count
    // against the GK bound (2·n/accuracy, plus the largest q tie-class:
    // a tie block straddling a boundary moves as one unit) — an
    // out-of-bound bucket drops its oracle row. The bucket spine is
    // explicit so an EMPTY bucket still surfaces (and fails the bound)
    // instead of vanishing from both sides.
    "x253_approx_deciles" -> ((s, dir) => {
      val toks = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents").select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("ts")))
      val q = toks.select(col("doc_id"),
        TextFunctions.qualityScoreOf(col("ts"), col("text")).as("q"),
        size(col("ts")).as("n_tokens"))
      val bounds = graft.engine.CacheScope.persistTracked(
        q.agg(percentile_approx(col("q"),
          array((1 to 9).map(i => lit(i / 10.0)): _*), lit(50)).as("bs")))
      Stage.write(bounds, dir, "x253_bounds")
      val spine = s.range(1, 11).select(col("id").as("bucket"))
      val cells = q.crossJoin(broadcast(bounds))
        .withColumn("bucket", expr(
          "1 + aggregate(bs, 0, (acc, b) -> acc + " +
            "CASE WHEN q > b THEN 1 ELSE 0 END)").cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("q")).as("q_lo"), max(col("q")).as("q_hi"),
          sum(col("n_tokens")).as("tokens_total"))
      spine.join(cells, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          col("q_lo"), col("q_hi"),
          coalesce(col("tokens_total"), lit(0L)).as("tokens_total"))
        .orderBy(col("bucket"))
    }),
    // x255: per-source Gini of document lengths — the concentration
    // statistic a mixture designer reads before weighting sources (a
    // source whose token mass sits in a few giant docs packs/shards
    // differently than a uniform one). Within-source ranks WITHOUT a
    // per-source rows-scale window: one GLOBAL bucket-prefix-sum rank
    // over (source, len, doc_id) — bucket = srcIdx·2⁴⁴ + len, monotone
    // with the order — minus each source's broadcast prefix offset (the
    // day-spine device over the 20-row source-count frame). The Gini
    // numerator Σ rk·x is an exact decimal integer; divisions read-time.
    "x255_source_gini" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("x"))
      val srcIdx = d.select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
      val idxCol = srcIdx.foldLeft(lit(-1L)) { case (acc, (src, i)) =>
        when(col("source") === src, lit(i.toLong)).otherwise(acc)
      }
      val ranked = graft.operators.Ranks.globalRowNumber(
        d.withColumn("__si", idxCol),
        col("__si") * lit(1L << 44) + col("x"),
        Seq(col("source").asc, col("x").asc, col("doc_id").asc), "rk")
      val cnts = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val offs = cnts.as("t")
        .join(broadcast(cnts.as("p")), col("p.source") < col("t.source"), "left")
        .groupBy(col("t.source").as("source"), col("t.n").as("n"))
        .agg(coalesce(sum(col("p.n")), lit(0L)).as("off"))
      ranked.join(broadcast(offs), Seq("source"))
        .withColumn("rs", col("rk") - col("off"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"), sum(col("x")).as("sx"),
          sum(col("rs").cast("decimal(38,0)") * col("x")).as("srx"))
        .select(col("source"), col("n_docs"), col("sx").as("tokens_total"),
          graft.functions.EngineMath.roundAway(expr(GiniSql), 6).as("gini"))
        .orderBy(col("source"))
    }),
    // x257: per-document n-gram novelty — the share of a doc's distinct
    // 5-grams whose GLOBAL first occurrence (min doc_id) is this doc:
    // the curriculum/dedup-adjacent signal separating originals from
    // recombinations. Two hash aggregates (per-doc distinct grams,
    // per-gram min doc) + one gram-keyed join back — the x60 span
    // machinery pointed at origin instead of repetition.
    "x257_gram_novelty" -> ((s, dir) => {
      val k = 5
      val grams = graft.engine.CacheScope.persistTracked(
        table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
          .filter(size(col("ts")) >= k)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("ts")) - (k - 1)),
            i => array_join(slice(col("ts"), i, lit(k)), " "))).as("gram"))
          .distinct())
      val first = grams.groupBy(col("gram")).agg(min(col("doc_id")).as("fd"))
      grams.join(first, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          graft.functions.EngineMath.roundAway(
            col("n_novel") / col("n_grams"), 4).as("novel_frac"))
        .orderBy(col("doc_id"))
    }),
    // x254: ε-differentially-private release of per-source doc counts —
    // the statistic a datacard publishes when the corpus manifest itself
    // is sensitive. Laplace(1/ε) noise via the inverse CDF of an
    // md5-ticket uniform (the engine's reproducible-randomness device,
    // x27/x57): DETERMINISTIC noise makes the release gateable — the
    // oracle re-derives the identical draw from the identical ticket, so
    // the hash match proves the exact noise the budget promises was
    // applied, not a lucky approximation. The fixed "dp1" salt is a
    // TEST device only — ε is void if the salt is public; production
    // passes a secret salt (see dpCountRelease's privacy caveat). One
    // count aggregate + a 2-budget broadcast explode; nothing
    // rows-scale after the scan.
    "x254_dp_counts" -> ((s, dir) =>
      dpCountRelease(table(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n")),
        ticketSalt = "dp1")),
    // x262: ANN recall CERTIFICATION of the production retrieval point —
    // makes "the index is good enough to ship" a hash-verified fact
    // instead of a spec assertion: per query vector, the exact
    // brute-force top-10 (the x10 machinery) against the production-LSH
    // top-10 (x11's planes=6/tables=16 point), recall = |∩|/10. The
    // engine emits EVERY query's row; the oracle re-derives BOTH sides
    // (brute force from the raw embeddings, candidates from the staged
    // buckets) and keeps a row only when recall ≥ 0.8 — in integer form
    // n_hit·10 ≥ n_true·8, no float boundary — so a sub-floor query
    // diverges row counts and fails the gate: the x251-x253
    // error-bound-oracle pattern applied to retrieval quality. Cost is
    // the brute baseline (one broadcast cross join over the 5-query
    // panel) — a certification you run per index build, not per query.
    "x262_ann_recall_cert" -> ((s, dir) => {
      val e = embeddingsD(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val radius = Similarity.adaptiveProbeRadius(e.count())
      Stage.write(Similarity.lshItemBuckets(e, "vec_id", "vec",
        numPlanes = 6, numTables = 16), dir, "x262_item_buckets")
      Stage.write(Similarity.lshProbeBuckets(q, "vec_id", "vec",
        numPlanes = 6, numTables = 16, probeRadius = radius),
        dir, "x262_probe_buckets")
      val brute = Similarity.bruteForceTopK(e, "vec_id", "vec",
        q, "vec_id", "vec", k = 10)
        .select(col("query_id"), col("item_id"))
      val ann = Similarity.lshTopK(e, "vec_id", "vec", q, "vec_id", "vec",
        k = 10, numPlanes = 6, numTables = 16, probeRadius = radius)
        .select(col("query_id"), col("item_id"))
      val hits = brute.join(ann, Seq("query_id", "item_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall",
          graft.functions.EngineMath.roundAway(expr(RecallSql), 4))
        .orderBy(col("query_id"))
    }),
    // x263: the STREAM-MAINTAINED twin of x254 — a privacy-preserving
    // datacard maintained on ingest: per-source counts are the trivially
    // ADDITIVE state (one stateful aggregate), and the ENTIRE DP
    // mechanism (budget explode, ticket, inverse-CDF draw) is read-time,
    // shared verbatim with the batch via dpCountRelease — so the
    // released numbers cannot drift between engine halves, and x254's
    // oracle gates the stream bit-for-bit.
    "x263_stream_dp_counts" -> ((s, dir) =>
      dpCountRelease(graft.streaming.StreamOps
        .sourceCountsStreaming(s, s"$dir/documents.parquet"),
        ticketSalt = "dp1")),
    // x256: DOULION edge-sampled triangle estimate (Tsourakakis et al.)
    // — the GATED 100 TB swap for x87's exact count: keep each canonical
    // edge iff its md5 ticket lands in 1/4 of hash space (deterministic,
    // so the estimate is reproducible and exactly re-derivable), count
    // triangles on the sampled graph with the SAME √m-bounded
    // compact-forward machinery at ~p² of the wedge work, and scale by
    // p⁻³ = 64. The oracle re-derives the full pipeline in DuckDB AND
    // keeps the row only when the estimate sits within 6σ of the exact
    // count (σ² ≈ T·(p⁻³−1), the DOULION independence bound) — the
    // x251-x253 error-bound-oracle pattern applied to a graph swap.
    // Measured: rel err 3.8% at sf0.01, 0.3% at sf0.1 vs bounds 7%/3%.
    "x256_approx_triangles" -> ((s, dir) => {
      val po = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val und = graft.engine.CacheScope.persistTracked(
        po.as("a").join(po.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct())
      val sampled = und.filter(
        conv(substring(md5(concat(col("u").cast("string"), lit(":"),
          col("v").cast("string"))), 1, 8), 16, 10).cast("long") % 4 === 0)
      val st = graft.operators.Graph.triangleStats(sampled, "u", "v")
        .select(col("n_edges").as("n_sampled_edges"),
          col("n_triangles").as("tri_sampled"))
      st.crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
        .select(col("n_edges"), col("n_sampled_edges"), col("tri_sampled"),
          (col("tri_sampled") * lit(64L)).as("tri_est"))
    }),
    // x258: the STREAM-MAINTAINED twin of x255 — source-concentration
    // monitoring is the production use, and Gini is a SORT-requiring
    // statistic: the additive per-(source, length) histogram is the
    // sufficient state (one stateful aggregate, length-domain-bounded
    // per the x177 contract) and the rank-block arithmetic is read-time
    // (giniOverLengthHist). Gated bit-for-bit by x255's oracle — the
    // x250 exact-percentile device applied to a Lorenz functional.
    "x258_stream_gini" -> ((s, dir) =>
      giniOverLengthHist(graft.streaming.StreamOps
        .docLengthHistStreaming(s, s"$dir/documents.parquet"))),
    // x259: t-closeness audit over x235's QI classes (Li et al.) — the
    // distributional privacy gate k-anonymity/l-diversity cannot see: a
    // class can be large AND diverse while its sensitive distribution
    // still leaks (t = ordered-domain EMD between the class's sensitive
    // histogram and the global one). Same QI bands and sensitive code as
    // x235; the EMD runs on a 16-value spine per class (bounded windows,
    // never rows-scale), and the cumulative differences stay exact
    // integers over the common denominator n·N until one division.
    "x259_t_closeness" -> ((s, dir) => {
      val rows = table(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr(KAnonBandSql).as("band"),
          substring(md5(concat(lit("sens:"),
            col("c_custkey").cast("string"))), 1, 1).as("sens"))
      val cells = graft.engine.CacheScope.persistTracked(
        rows.groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"),
          col("sens")).agg(count(lit(1)).as("c")))
      val classes = cells
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .agg(sum(col("c")).as("n"))
      val glob = cells.groupBy(col("sens")).agg(sum(col("c")).as("g"))
      val nn = cells.agg(sum(col("c")).as("nt"))
      val spine = classes.join(broadcast(glob.crossJoin(nn)), lit(true))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .orderBy(col("sens"))
      spine
        .join(cells, Seq("c_nationkey", "c_mktsegment", "band", "sens"),
          "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        // cum(c·N − g·n) over the ordered 16-value domain — exact
        .withColumn("cd", sum(col("c0").cast("decimal(38,0)") * col("nt")
          - col("g").cast("decimal(38,0)") * col("n")).over(w))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"),
          col("n"), col("nt"))
        .agg(sum(abs(col("cd"))).as("sad"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("band"),
          col("n").as("n_rows"),
          graft.functions.EngineMath.roundAway(expr(TClosenessSql), 6)
            .as("t_closeness"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
    }),
    // x260: weighted reservoir sample WITHOUT replacement (Efraimidis–
    // Spirakis A-ES) — THE distributed/streaming-shaped sampler: each row
    // gets key ln(u)/w from its own md5 ticket, and the sample is simply
    // the global top-k by key — a mergeable TakeOrdered, no sequential
    // reservoir state, identical under any partitioning. Token-count
    // weights: long docs proportionally likelier, sampled AT MOST once —
    // what x27/x128/x206's equal/quota/systematic tickets can't express.
    "x260_weighted_reservoir" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("w"))
        .filter(col("w") > 0)
        .withColumn("ut", conv(substring(md5(concat(lit("res1:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"))
        .withColumn("skey", expr(ReservoirKeySql))
        .orderBy(col("skey").desc, col("doc_id").asc)
        .limit(50)
        .select(col("doc_id"), col("w"),
          graft.functions.EngineMath.roundAway(col("skey"), 9).as("skey"))
    }),
    // x264: inverse-probability-weighted ATE (Hájek, the self-normalized
    // stabilized form practitioners ship — plain Horvitz–Thompson blows
    // up under clustered per-user assignment at small n) under a
    // synthesized CONFOUNDED design (the x222 contract): stratum
    // g = user_id % 4 gets design propensity p = (g+1)/5, the outcome
    // carries a g·100 shift (large against the value scale, so the bias
    // is structural, not noise), so the naive treated-vs-control difference
    // is biased by construction while the IPW estimate de-biases it —
    // the design-weighting causal family x228 (CUPED) and x240 (DiD)
    // don't cover. Weights 12/p and 12/(1−p) are INTEGERS for these
    // propensities (60/(g+1), 60/(4−g)), so both weighted-outcome and
    // weight-mass sums stay exact integers; two ratio reads at the end.
    "x264_ipw_ate" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("value"))
        .withColumn("g", pmod(col("user_id"), lit(4L)))
        .withColumn("ut", conv(substring(md5(concat(lit("trt1:"),
          col("user_id").cast("string"))), 1, 8), 16, 10).cast("long"))
        .withColumn("t", (col("ut").cast("double") / 4294967296.0 <
          (col("g") + 1).cast("double") / 5.0).cast("long"))
        .withColumn("ym",
          floor((col("value") + col("g").cast("double") * 100.0) * 1e6
            + lit(0.5)).cast("long"))
        .withColumn("w12", expr(
          "CASE WHEN t = 1 THEN 60 div (g + 1) ELSE 60 div (4 - g) END"))
      e.agg(count(lit(1)).as("n"),
          sum(col("t")).as("n_treated"),
          sum(when(col("t") === 1, col("ym")).otherwise(0L)).as("sy_t"),
          sum(when(col("t") === 0, col("ym")).otherwise(0L)).as("sy_c"),
          sum(when(col("t") === 1, col("ym").cast("decimal(38,0)")
            * col("w12")).otherwise(lit(0).cast("decimal(38,0)")))
            .as("sw_t"),
          sum(when(col("t") === 0, col("ym").cast("decimal(38,0)")
            * col("w12")).otherwise(lit(0).cast("decimal(38,0)")))
            .as("sw_c"),
          sum(when(col("t") === 1, col("w12")).otherwise(0L)).as("swn_t"),
          sum(when(col("t") === 0, col("w12")).otherwise(0L)).as("swn_c"))
        .select(col("n"), col("n_treated"),
          graft.functions.EngineMath.roundAway(expr(IpwNaiveSql), 6)
            .as("naive_diff"),
          graft.functions.EngineMath.roundAway(expr(IpwAteSql), 6)
            .as("ipw_ate"))
    }),
    // x265: daily-count overdispersion per event type — the Poisson-fit
    // parameter (index of dispersion D = var/mean over the 30-day spine,
    // zero days included) a capacity planner or synthetic-feed screen
    // reads; x83 flags anomalous WINDOWS, x174 audits digits — this is
    // the distribution-shape audit of the arrival process itself. The
    // spine is built from the observed min/max dates (bounded), counts
    // are exact integers, and D's variance chain runs on the shared
    // string over (nd, sc, sc2).
    "x265_overdispersion" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val cells = graft.engine.CacheScope.persistTracked(
        d.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c")))
      val span = cells.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = cells.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      spine.join(cells, Seq("event_type", "day"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("c0")).as("n_events"),
          sum(col("c0").cast("decimal(38,0)") * col("c0")).as("sc2"))
        .select(col("event_type"), col("n_days"), col("n_events"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(n_events AS DOUBLE) / n_days"), 6).as("mean_daily"),
          graft.functions.EngineMath.roundAway(expr(DispersionSql), 6)
            .as("dispersion"))
        .orderBy(col("event_type"))
    }),
    // x261: linear-time MMD² drift test (Gretton et al.) — the KERNEL
    // two-sample statistic complementing the projection family (x200
    // sliced-W1, x134 KS, x166 PSI): sensitive to any moment, not just
    // location. The O(n²) kernel matrix never materializes — the linear
    // estimator pairs consecutive cohort rows (Ranks index join) and
    // averages ONE h-term per 4-tuple, so the plan is two rank passes +
    // two index equi-joins + a scan of m/2 rows. Both contrasts (the
    // same-distribution split and a deterministic +0.5 first-component
    // shift, the x222 synthesized-input contract) read the same
    // checkpointed 4-tuple frame; every h quantizes to 1e-9 ticks via
    // the SHARED kernel string before the order-free sum.
    "x261_mmd_drift" -> ((s, dir) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        call_function("graft_dot", x, y)
      val e = embeddingsD(s, dir)
      def ranked(par: Int) = graft.operators.Ranks.globalRowNumber(
        e.filter(col("vec_id") % 2 === par)
          .select(col("vec_id"), col("vec")),
        col("vec_id"), Seq(col("vec_id").asc), "i")
      val a = ranked(0).select(col("i"), col("vec").as("x"))
      val b = ranked(1).select(col("i"), col("vec").as("y"))
      val pairs = a.join(b, Seq("i"))
      val odd = pairs.filter(col("i") % 2 === 1)
        .select(expr("(i + 1) div 2").as("j"),
          col("x").as("x1"), col("y").as("y1"))
      val even = pairs.filter(col("i") % 2 === 0)
        .select(expr("i div 2").as("j"),
          col("x").as("x2"), col("y").as("y2"))
      val q = odd.join(even, Seq("j")).localCheckpoint()
      def sh(c: org.apache.spark.sql.Column) =
        transform(c, (v, idx) => when(idx === 0, v + lit(0.5)).otherwise(v))
      def contrast(label: String, y1: org.apache.spark.sql.Column,
          y2: org.apache.spark.sql.Column): DataFrame = q
        .select(dot(col("x1"), col("x1")).as("n11"),
          dot(col("x2"), col("x2")).as("n22"),
          dot(y1, y1).as("m11"), dot(y2, y2).as("m22"),
          dot(col("x1"), col("x2")).as("dxx"), dot(y1, y2).as("dyy"),
          dot(col("x1"), y2).as("dxy"), dot(col("x2"), y1).as("dyx"))
        .select(expr(MmdTickSql).as("ht"))
        .agg(count(lit(1)).as("m"), sum(col("ht")).as("st"))
        .select(lit(label).as("contrast"), col("m").as("m_pairs"),
          graft.functions.EngineMath.roundAway(
            expr("CAST(st AS DOUBLE) / 1e9 / m"), 6).as("mmd2"))
      contrast("same", col("y1"), col("y2"))
        .unionByName(contrast("shifted", sh(col("y1")), sh(col("y2"))))
        .orderBy(col("contrast"))
    }),
  )

  /** x241's repetitive-text gate: docs deflating below this ratio tick
    * (0.40) are flagged — natural prose lands ~0.45-0.7 at these doc
    * lengths, boilerplate/repetition far lower. One constant, both
    * engines.
    */
  private val CompressLowTick = 400000L

  /** x242's secret-candidate gates: tokens at least this long, mixing
    * letters and digits, whose char-level Shannon entropy reaches the
    * 2.5-nat tick threshold (e^2.5 ≈ 12 effective symbols — long
    * natural words sit near 2.2-2.4; random hex caps at ln 16 ≈ 2.773,
    * random base62 higher still). Entropy accumulates as per-char
    * integer 1e-12 ticks (each (c/n)·ln(n/c) term quantized BEFORE the
    * sum), so the per-token statistic is order-independent under any
    * partitioning — the PageRank-contribution device applied to entropy.
    */
  private val SecretMinLen = 16
  private[graft] val SecretEntropyTicks = 2500000000000L // 2.5 nats: above
  // natural words (~2.2-2.4), below the hex-alphabet cap ln 16 ≈ 2.773

  /** One entropy-term tick over a char count `c` and token length `n` —
    * parameterized so the SAME formula text serves the engine's per-row
    * HOF fold and the oracle's list comprehension.
    */
  private def SecretTermTick(c: String, n: String): String =
    s"CAST(floor((CAST($c AS DOUBLE) / $n) * ln(CAST($n AS DOUBLE) / $c) " +
      "* 1e12 + 0.5) AS BIGINT)"

  /** The x242/x247 shared candidate-token frame: tokenize, length/
    * charset gates, and PER-ROW char entropy — integer 1e-12 ticks
    * folded over the distinct chars, no intermediate aggregate, which is
    * what makes the per-source cells additive and therefore stream-
    * maintainable in one stateful aggregate. Tick addition is
    * order-independent, so the fold order over distinct chars is
    * irrelevant.
    *
    * `plantSynthetic` (default true, used by the bench/verify harness)
    * appends a deterministic hex secret to every 7th doc because the
    * testdata carries no natural candidates (x222's synthesized-input
    * contract); a real deployment passes false and the scan is
    * otherwise unchanged.
    */
  private[graft] def secretTokens(docsIn: DataFrame,
      plantSynthetic: Boolean = true): DataFrame = {
    val cnt = "size(filter(chs, x -> x = c))"
    val planted =
      if (plantSynthetic) docsIn.withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" sk_"),
            md5(concat(lit("sk:"), col("doc_id").cast("string")))))
          .otherwise(col("text")))
      else docsIn.withColumn("text2", col("text"))
    planted
      .select(col("source"),
        explode(TextFunctions.tokens(col("text2"))).as("tok"))
      .filter(length(col("tok")) >= SecretMinLen &&
        col("tok").rlike("[0-9]") && col("tok").rlike("[A-Za-z]"))
      .withColumn("chs", expr(
        "transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"))
      .withColumn("n", length(col("tok")).cast("long"))
      .withColumn("ht", expr(
        "aggregate(transform(array_distinct(chs), c -> " +
          s"${SecretTermTick(cnt, "n")}), CAST(0 AS BIGINT), " +
          "(acc, v) -> acc + v)"))
      .select(col("source"), col("ht"))
  }

  /** x248's trimmed mean over the conditional moment row — one string
    * per variant, both engines evaluate the identical IEEE tree.
    */
  private def RobustTmSql(v: String): String =
    s"(CAST(sw_$v AS DOUBLE) / nk_$v / 100.0)"

  /** x250's percentile levels — one constant for the engine probes and
    * the oracle's UNION branches.
    */
  private[graft] val SloPs = Seq(0.5, 0.95, 0.99)

  /** x250's read-time exact-percentile derivation over the additive
    * (event_type, vm, c) histogram: per-type cumsum ranges give the
    * k-th order statistic by containment lookup; the interpolated value
    * v₁ + (h − ⌊h⌋)·(v₂ − v₁) with h = (n−1)·p is quantile_cont's exact
    * definition, evaluated on the same micro-quantized doubles as the
    * oracle's sort-based computation. Both containment joins broadcast
    * the |types|×|levels| probe side.
    */
  private def sloOverValueHist(s: SparkSession, cells: DataFrame): DataFrame = {
    val hist = cells.localCheckpoint() // consumers: totals + two lookups
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("vm"))
    val cum = hist
      .withColumn("cumhi", sum(col("c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("cumlo", col("cumhi") - col("c") + 1)
      .localCheckpoint() // both containment lookups read it
    val probes = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      .crossJoin(s.range(1).select(explode(typedlit(SloPs)).as("p")))
      .withColumn("h", expr("CAST(n - 1 AS DOUBLE) * p"))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("k1", col("lo") + 1)
      .withColumn("k2", least(col("lo") + 2, col("n")))
    val v1 = cum.join(broadcast(probes), Seq("event_type"))
      .filter(col("k1") >= col("cumlo") && col("k1") <= col("cumhi"))
      .select(col("event_type"), col("p"), col("n"), col("h"), col("lo"),
        col("k2"), col("vm").as("v1"))
    cum.select(col("event_type"), col("vm").as("v2"),
        col("cumlo").as("l2"), col("cumhi").as("h2"))
      .join(broadcast(v1), Seq("event_type"))
      .filter(col("k2") >= col("l2") && col("k2") <= col("h2"))
      .select(col("event_type"), col("p"), col("n"),
        graft.functions.EngineMath.roundAway(expr(
          "CAST(v1 AS DOUBLE) / 1e6 + (h - lo) * " +
            "(CAST(v2 AS DOUBLE) / 1e6 - CAST(v1 AS DOUBLE) / 1e6)"), 6)
          .as("slo_value"))
      .orderBy(col("event_type"), col("p"))
  }

  /** The ADDITIVE per-source cells both x242 halves read. */
  private[graft] def secretCellAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_candidates"),
    sum((col("ht") >= SecretEntropyTicks).cast("long")).as("n_flagged"),
    sum(when(col("ht") >= SecretEntropyTicks, col("ht")).otherwise(0L))
      .as("sht"))

  /** Read-time rollup over the cells — shared verbatim by batch x242 and
    * stream x247, so the statistic cannot drift between them.
    */
  private def secretRollup(cells: DataFrame): DataFrame = cells
    .select(col("source"), col("n_candidates"), col("n_flagged"),
      graft.functions.EngineMath.roundAway(
        expr("CAST(n_flagged AS DOUBLE) / n_candidates"), 6).as("flag_rate"),
      graft.functions.EngineMath.roundAway(
        expr("CASE WHEN n_flagged > 0 THEN " +
          "CAST(sht AS DOUBLE) / 1e12 / n_flagged END"), 6)
        .as("mean_entropy_flagged"))
    .orderBy(col("source"))

  /** The x234/x238 shared A/B day projection: variant hash, micro-tick
    * value, day index — ONE definition for the batch scan and the
    * streaming source, so the experiment definition cannot drift between
    * the two engine halves.
    */
  private[graft] def abDayProject(ev: DataFrame): DataFrame = ev
    .withColumn("variant",
      when(substring(md5(concat(lit("ab1:"),
        col("user_id").cast("string"))), 1, 4) < "8000", lit("b"))
        .otherwise(lit("a")))
    .withColumn("vm", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
    .withColumn("d",
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long") + 1)

  /** The ADDITIVE per-day cell table (d, dna, dnb, dsa, dsb, dqa, dqb)
    * both mSPRT halves read — counts, micro-sums, and decimal
    * sum-of-squares per variant. Additivity is what makes the monitor
    * stream-maintainable: one stateful aggregate holds ≤ |days| rows.
    */
  private[graft] def abDayCellAggs: Seq[Column] = Seq(
    sum(when(col("variant") === "a", 1L).otherwise(0L)).as("dna"),
    sum(when(col("variant") === "b", 1L).otherwise(0L)).as("dnb"),
    sum(when(col("variant") === "a", col("vm")).otherwise(0L)).as("dsa"),
    sum(when(col("variant") === "b", col("vm")).otherwise(0L)).as("dsb"),
    // widen BEFORE the multiply (the x228 rule): vm*vm in LongType
    // would silently wrap past ~3e9 micro-units while the oracle's
    // HUGEINT product stays exact
    sum(when(col("variant") === "a",
      col("vm").cast("decimal(38,0)") * col("vm"))
      .otherwise(lit(0).cast("decimal(38,0)")))
      .as("dqa"),
    sum(when(col("variant") === "b",
      col("vm").cast("decimal(38,0)") * col("vm"))
      .otherwise(lit(0).cast("decimal(38,0)")))
      .as("dqb"))

  private def abDayCells(ev: DataFrame): DataFrame =
    abDayProject(ev).groupBy(col("d"))
      .agg(abDayCellAggs.head, abDayCellAggs.tail: _*)

  /** The read-time mSPRT derivation over the bounded day-cell table —
    * shared verbatim by batch x234 and stream x238, so the statistic
    * cannot drift between them. σ² is the pooled plug-in re-derived from
    * the cells' integer sums (identical to a full-scan moment row, since
    * integer addition is associative); cumulative stats and the running
    * max of ln Λ are calendar-bounded broadcast prefix joins.
    */
  private def msprtOverDayCells(cellsIn: DataFrame): DataFrame = {
    val daily = cellsIn
      .localCheckpoint() // day spine: sig + both prefix joins read it
    val sig = daily.agg(
        sum(col("dna")).as("n_a"), sum(col("dnb")).as("n_b"),
        sum(col("dsa")).as("s_a"), sum(col("dsb")).as("s_b"),
        sum(col("dqa")).as("q_a"), sum(col("dqb")).as("q_b"))
      .select(expr(s"(${WelchVar("a")} + ${WelchVar("b")}) / 2.0")
        .as("sig2"))
    val cum = daily.as("t")
      .join(broadcast(daily.as("p")), col("p.d") <= col("t.d"))
      .groupBy(col("t.d").as("d"))
      .agg(sum(col("p.dna")).as("na"), sum(col("p.dnb")).as("nb"),
        sum(col("p.dsa")).as("sa"), sum(col("p.dsb")).as("sb"))
      .filter(col("na") > 0 && col("nb") > 0)
      .crossJoin(broadcast(sig))
      .withColumn("lt",
        expr(s"CAST(floor(($MsprtLnLrSql) * 1e9 + 0.5) AS BIGINT)"))
      .localCheckpoint() // consumers: self-join (both sides) + output
    cum.as("t")
      .join(broadcast(cum.as("p")
          .select(col("d").as("pd"), col("lt").as("plt"))),
        col("pd") <= col("d"))
      .groupBy(col("d"), col("na"), col("nb"), col("sa"), col("sb"),
        col("sig2"), col("lt"))
      .agg(max(col("plt")).as("mx"))
      .select(col("d"), col("na").as("n_a"), col("nb").as("n_b"),
        graft.functions.EngineMath.roundAway(expr(MsprtThetaSql), 6)
          .as("theta"),
        graft.functions.EngineMath.roundAway(
          expr("CAST(lt AS DOUBLE) / 1e9"), 6).as("ln_lr"),
        graft.functions.EngineMath.roundAway(expr(
          "CASE WHEN mx > 0 THEN exp(-CAST(mx AS DOUBLE) / 1e9) " +
            "ELSE 1.0 END"), 6).as("p_always_valid"),
        expr("CAST(CASE WHEN (CASE WHEN mx > 0 THEN " +
          "exp(-CAST(mx AS DOUBLE) / 1e9) ELSE 1.0 END) <= 0.05 " +
          "THEN 1 ELSE 0 END AS BIGINT)").as("reject"))
      .orderBy(col("d"))
  }

  /** x234's mSPRT chains over the cumulative row (na, nb, sa, sb) plus
    * the broadcast plug-in variance sig2 — mixture N(0, τ²) with
    * τ² = 0.01, V = σ²(1/n_a + 1/n_b):
    * ln Λ = ½·ln(V/(V+τ²)) + θ̂²τ²/(2V(V+τ²)). One string per quantity,
    * both engines evaluate the identical IEEE tree.
    */
  private val MsprtThetaSql: String =
    "((CAST(sb AS DOUBLE) / 1e6) / nb - (CAST(sa AS DOUBLE) / 1e6) / na)"
  private val MsprtVSql: String = "(sig2 * (1.0 / na + 1.0 / nb))"
  private val MsprtLnLrSql: String =
    s"(0.5 * ln($MsprtVSql / ($MsprtVSql + 0.01)) + " +
      s"(($MsprtThetaSql) * ($MsprtThetaSql) * 0.01) / " +
      s"(2.0 * $MsprtVSql * ($MsprtVSql + 0.01)))"

  /** The x68/x246 shared DuckDB weight derivation: identical md5 buckets,
    * full-spine add-1 smoothing, bucket-ordered per-doc fold — ends at
    * the per-doc log-weight table `ws(doc_id, w)`.
    */
  private def dsirWsCtes: String =
    s"""WITH tk AS (SELECT doc_id, source, unnest($toks) AS term FROM documents),
       |bk AS (SELECT doc_id, source,
       |    ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT % 64 AS b FROM tk),
       |sp AS (SELECT unnest(range(64)) AS b),
       |ct AS (SELECT b, count(*) AS c FROM bk WHERE source = 'src0' GROUP BY 1),
       |cr AS (SELECT b, count(*) AS c FROM bk GROUP BY 1),
       |lr AS (SELECT sp.b,
       |    ln((coalesce(ct.c, 0) + 1) / ((SELECT sum(c) FROM ct) + 64)) -
       |    ln((coalesce(cr.c, 0) + 1) / ((SELECT sum(c) FROM cr) + 64)) AS ratio
       |  FROM sp LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)),
       |dc AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2),
       |ws AS (SELECT doc_id, list_reduce(list_prepend(0.0,
       |      list(CAST(c AS DOUBLE) * ratio ORDER BY b)), (x, y) -> x + y) AS w
       |  FROM dc JOIN lr USING (b) GROUP BY doc_id)""".stripMargin

  /** x246's ESS = (Σu)²/Σu² over the exact integer tick sums — one
    * string, both engines.
    */
  private val DsirEssSql: String =
    "((CAST(su AS DOUBLE) / 1e9) * (CAST(su AS DOUBLE) / 1e9) / " +
      "(CAST(su2 AS DOUBLE) / 1e18))"

  /** x235's quasi-identifier band + policy axis — shared constants. */
  private val KAnonBandSql: String =
    "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT)"
  private[graft] val KAnonKs = Seq(2L, 5L, 10L)

  /** x237's Holt updates over the accumulator (prefix `p`: "acc." in the
    * Spark fold, "h." in the oracle's recursive CTE) and the observation
    * expression `x` — the level tree is spliced twice (the trend update
    * re-evaluates it), so both engines see the identical IEEE tree in
    * both positions. α = 0.3, β = 0.1; constants CAST so DuckDB doesn't
    * parse them as DECIMAL.
    */
  private def HoltLSql(p: String, x: String): String =
    s"CAST(0.3 AS DOUBLE) * $x + CAST(0.7 AS DOUBLE) * (${p}l + ${p}b)"
  private def HoltBSql(p: String, x: String): String =
    s"CAST(0.1 AS DOUBLE) * ((${HoltLSql(p, x)}) - ${p}l) + " +
      s"CAST(0.9 AS DOUBLE) * ${p}b"

  /** x232's context budgets — ONE constant feeds the Spark conditional
    * sums and the oracle's generated branches (testdata docs run 10–99
    * tokens; production budgets would be 2048/8192/32768 with the same
    * plan shape).
    */
  private[graft] val ContextBudgets = Seq(32L, 64L, 96L)

  /** x233's deterministic ±1 Achlioptas sign matrix [k=16][d=64] —
    * md5-derived once here, embedded as a literal in BOTH engines'
    * plans, so the projection is identical under any partitioning.
    */
  private[graft] val JlSigns: Seq[Seq[Int]] =
    (0 until 16).map { j =>
      (0 until 64).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl:$i:$j".getBytes("UTF-8"))
        if ((h(0) & 0xff) < 128) 1 else -1
      }
    }

  /** x231's Laplace-smoothed WOE over cells (np, nn) with totals
    * (tnp, tnn) — one string, a column-prefix parameter so the same tree
    * serves the per-bin projection ("") and the fold variable ("x.").
    */
  private def WoeSql(p: String): String =
    s"ln(((CAST(${p}np AS DOUBLE) + 0.5) / (CAST(${p}tnp AS DOUBLE) + 5.0)) / " +
      s"((CAST(${p}nn AS DOUBLE) + 0.5) / (CAST(${p}tnn AS DOUBLE) + 5.0)))"
  private def WoeIvTermSql(p: String): String =
    s"((CAST(${p}np AS DOUBLE) + 0.5) / (CAST(${p}tnp AS DOUBLE) + 5.0) - " +
      s"(CAST(${p}nn AS DOUBLE) + 0.5) / (CAST(${p}tnn AS DOUBLE) + 5.0)) * " +
      s"(${WoeSql(p)})"

  /** x228's pre-period cutoff: 2024-01-16 00:00:00 UTC in epoch micros —
    * the testdata events span 2024-01-01..30 at every SF, so the halves
    * are non-degenerate everywhere. One literal feeds both engines
    * (Spark `unix_micros`, DuckDB `epoch_us`).
    */
  private val CupedCutoffUs = 1705363200000000L

  /** x228's CUPED float chains over the single moment row
    * (n, sx, sy, sxx, sxy, syy, n_a, n_b, sx_a, sx_b, sy_a, sy_b) —
    * ONE string per quantity, both engines evaluate the identical IEEE
    * tree. Covariances/variances expand the raw-moment form
    * (Σxy/1e12 − (Σx/1e6)(Σy/1e6)/n) inline so neither engine re-orders
    * the operands.
    */
  private def CupedMomSql(sab: String, sa: String, sb: String): String =
    s"(CAST($sab AS DOUBLE) / 1e12 - (CAST($sa AS DOUBLE) / 1e6) * " +
      s"(CAST($sb AS DOUBLE) / 1e6) / n)"
  private def CupedMeanSql(c: String, v: String): String =
    s"(CAST(${c}_$v AS DOUBLE) / 1e6 / n_$v)"
  private val CupedThetaSql: String =
    s"(${CupedMomSql("sxy", "sx", "sy")} / ${CupedMomSql("sxx", "sx", "sx")})"
  private val CupedDiffAdjSql: String =
    s"((${CupedMeanSql("sy", "b")} - $CupedThetaSql * ${CupedMeanSql("sx", "b")}) - " +
      s"(${CupedMeanSql("sy", "a")} - $CupedThetaSql * ${CupedMeanSql("sx", "a")}))"
  private val CupedVarRedSql: String =
    s"(${CupedMomSql("sxy", "sx", "sy")} * ${CupedMomSql("sxy", "sx", "sy")} / " +
      s"(${CupedMomSql("sxx", "sx", "sx")} * ${CupedMomSql("syy", "sy", "sy")}))"

  /** x116's term blocklist — one constant feeds both engines' predicates
    * (each unit must stay a plain lowercase word: it is spliced into the
    * DuckDB oracle's quoted list literal).
    */
  private[graft] val BlocklistTerms = Seq("dup", "slow", "batch")
  require(BlocklistTerms.forall(_.matches("[a-z]+")),
    "BlocklistTerms must be plain lowercase words (spliced into quoted SQL)")

  /** x115's per-depth RBO weight 0.9^d/d as a CASE over the fold variable
    * `x.d` — the weights are Scala-computed doubles embedded via their
    * shortest round-trip decimal repr, so BOTH engines parse the exact
    * same IEEE values (java Math.pow vs C pow may differ in the last ulp;
    * a literal table cannot). One constant feeds the Spark fold and the
    * DuckDB oracle.
    */
  /** The x121/x123 shared read-time smoother: collect the bounded
    * (day, n) axis per type, fold s = 0.3·x + 0.7·s seeded with day 1
    * (slice-from-2 fold ≡ DuckDB list_reduce's first-element seeding).
    * ONE definition consumed by the batch and the stream-maintained
    * query, so the recursion cannot drift between them.
    */
  private def ewmaOverDaily(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("cs"))
      .withColumn("vals", expr("transform(cs, x -> CAST(x.n AS DOUBLE))"))
      .select(col("event_type"), size(col("vals")).cast("long").as("n_days"),
        graft.functions.EngineMath.roundAway(
          expr("aggregate(slice(vals, 2, size(vals) - 1), " +
            "element_at(vals, 1), (acc, x) -> " +
            "CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc)"), 6)
          .as("ewma"))
      .orderBy(col("event_type"))

  /** x166's per-doc quality binning — (source, bin) with
    * bin = least(9, floor(q·10⁴ + 0.5) div 1000): ONE definition
    * consumed by the batch query and the stream-maintained twin's
    * stateful aggregate (x176 via StreamOps.qualityBinCountsStreaming),
    * so the bin boundaries cannot drift between them.
    */
  private[graft] def qualityBins(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("text"),
        TextFunctions.tokens(col("text")).as("ts"))
      .select(col("source"),
        floor(TextFunctions.qualityScoreOf(col("ts"), col("text"))
          * 10000 + lit(0.5)).cast("long").as("q4"))
      .select(col("source"), expr("least(9, q4 div 1000)").as("bin"))

  /** The x166/x176 shared read-time PSI derivation over an ADDITIVE
    * (source, bin, cc) count table: Laplace spine, margins, the
    * PsiCellSql contribution, bin-ordered fold. The counts are the only
    * rows-scale input — everything here is |sources|×10 cells and
    * broadcasts — so the batch scan and the stream-maintained state
    * feed one definition and cannot drift.
    */
  private def psiOverBinCounts(s: SparkSession, cnts: DataFrame): DataFrame = {
    val spine = cnts.select(col("source")).distinct()
      .crossJoin(s.range(0, 10).toDF("bin"))
    val cells = spine.join(cnts, Seq("source", "bin"), "left")
      .withColumn("c", coalesce(col("cc"), lit(0L))).drop("cc")
    val ns = cells.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val gb = cells.groupBy(col("bin")).agg(sum(col("c")).as("g"))
    val nn = cells.agg(sum(col("c")).as("nn"))
    cells.join(broadcast(ns), "source").join(broadcast(gb), "bin")
      .crossJoin(broadcast(nn))
      .withColumn("contrib", expr(PsiCellSql))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_docs"),
        sort_array(collect_list(struct(col("bin"), col("contrib"))))
          .as("cs"))
      .select(col("source"), col("n_docs"),
        graft.functions.EngineMath.roundAway(
          expr("aggregate(transform(cs, x -> x.contrib), 0.0d, " +
            "(acc, v) -> acc + v)"), 6).as("psi"))
      .orderBy(col("source"))
  }

  /** x167's cohort/micro-value projection — (isA, vm), shared with the
    * stream-maintained twin's stateful aggregate (x177).
    */
  private[graft] def valueCohorts(events: DataFrame): DataFrame =
    events.select((col("user_id") % 2 === 0).as("isA"),
      floor(col("value") * 1e6 + lit(0.5)).cast("long").as("vm"))

  /** The x167/x177 shared read-time W₁ derivation over an ADDITIVE
    * (vm, ca, cb) count table: value-ordered integer cumsums, the exact
    * pre-widened |cumA·nB − cumB·nA|·Δv numerator, ONE final division
    * (W1Sql). The cross-multiplies ride decimal(38,0) BEFORE the
    * product — cohorts past ~3e9 events would silently wrap a BIGINT
    * product (non-ANSI Spark); pre-widened, cum·n ≤ ~1e24 and
    * term ≤ ~1e36 both fit 38 digits (oracle side widens to HUGEINT).
    */
  private def w1OverCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("vm"))
    val wCum = wOrd.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    counts
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("nxt", lead(col("vm"), 1).over(wOrd))
      .filter(col("nxt").isNotNull)
      .crossJoin(broadcast(tot))
      .withColumn("term",
        abs(col("cuma").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")
          - col("cumb").cast("decimal(38,0)") * col("na").cast("decimal(38,0)")) *
          (col("nxt") - col("vm")).cast("decimal(38,0)"))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(col("term")).as("st"))
      .select(col("na"), col("nb"),
        graft.functions.EngineMath.roundAway(expr(W1Sql), 6).as("w1"))
  }

  /** The x144/x149 shared CUSUM read over a (day, c) daily-count frame:
    * integer S_i·D = cum_i·D − i·T, argmax |S·D| with the earliest-day
    * tie-break, one final division. ONE definition consumed by the batch
    * scan and the stream-maintained twin, so the statistic cannot drift
    * between them. The cumsum window runs over the bounded day axis.
    */
  private def cusumOverDaily(daily: DataFrame): DataFrame = {
    val tot = daily.agg(count(lit(1)).as("dd"), sum(col("c")).as("tt"))
    val wD = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wI = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    daily
      .withColumn("cum", sum(col("c")).over(wD))
      .withColumn("i", row_number().over(wI).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("sd", col("cum") * col("dd") - col("i") * col("tt"))
      .orderBy(abs(col("sd")).desc, col("day"))
      .limit(1)
      .select(col("day").as("at_day"), col("dd").as("n_days"),
        col("tt").as("total"),
        graft.functions.EngineMath.roundAway(
          col("sd").cast("double") / col("dd"), 6).as("cusum"))
  }

  /** x147's fixed query-term set — one constant feeds both engines (each
    * unit must stay a plain lowercase word: it is spliced into the
    * DuckDB oracle's quoted IN list).
    */
  private[graft] val Bm25Query = Seq("join", "vector", "stream")
  require(Bm25Query.forall(_.matches("[a-z]+")),
    "Bm25Query terms must be plain lowercase words (spliced into quoted SQL)")

  /** x147's per-term BM25 contribution (k1=1.2, b=0.75) over the exact
    * integer columns (tf, dl, df, nn, tt) — ONE string evaluated by both
    * engines, so the idf·saturation chain orders identically. dl/avgdl
    * rides dl·nn/tt (no pre-divided average in the loop).
    */
  private val Bm25TermSql: String =
    "ln((nn - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(tf * (1.2 + 1.0)) / " +
      "(tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) * nn / tt)))"

  /** x148's DCG discount weights 1/log2(rank+1) as a CASE literal table
    * (the x115 device — Scala-computed doubles embedded via their
    * shortest round-trip repr, so both engines parse identical IEEE
    * values), plus the ideal DCG for 10 graded-relevance items.
    */
  private val DcgW: Seq[Double] =
    (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private def dcgWeightCase(v: String): String =
    s"CASE $v " + DcgW.zipWithIndex.map { case (w, i) =>
      s"WHEN ${i + 1} THEN CAST($w AS DOUBLE)" }.mkString(" ") +
      " ELSE CAST(0.0 AS DOUBLE) END"
  private val IdcgVal: Double =
    (1 to 10).map(r => (11 - r) * DcgW(r - 1)).sum
  private val NdcgContribSql: String =
    s"CAST(rel AS DOUBLE) * (${dcgWeightCase("rank")})"

  /** x126's Welch t statistic over columns (n_a, n_b, s_a, s_b, q_a, q_b)
    * — exact integer micro-sums in, ONE expression string evaluated by
    * both engines, so the IEEE chain (means, sample variances, √) is
    * operand-identical. The mean/variance sub-expressions are inlined
    * (not aliased) so both engines evaluate literally the same tree.
    */
  private def WelchMean(x: String): String =
    s"(CAST(s_$x AS DOUBLE) / 1e6) / n_$x"
  private def WelchVar(x: String): String =
    s"((CAST(q_$x AS DOUBLE) / 1e12 - n_$x * (${WelchMean(x)}) * (${WelchMean(x)})) / (n_$x - 1))"
  private val WelchTSql: String =
    s"((${WelchMean("b")}) - (${WelchMean("a")})) / " +
      s"sqrt(${WelchVar("a")} / n_a + ${WelchVar("b")} / n_b)"

  /** x226's standard error / minimum-detectable-effect chains over the
    * same exact moment columns as x126 — ONE string per quantity, both
    * engines evaluate the identical IEEE tree. The z constants
    * (two-sided α=0.05, power 0.8) are shared rounded literals so
    * neither engine computes its own quantile.
    */
  private val AbSeSql: String =
    s"sqrt(${WelchVar("a")} / n_a + ${WelchVar("b")} / n_b)"
  private val AbMdeSql: String = s"(1.959964 + 0.841621) * ($AbSeSql)"

  /** x225's per-stratum variance chain over (n_h, s1, s2) exact integer
    * moments — one string, both engines, operand-identical.
    */
  private val NeymanVarSql: String =
    "(CAST(n_h AS DOUBLE) * CAST(s2 AS DOUBLE) - " +
      "CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / " +
      "(CAST(n_h AS DOUBLE) * (n_h - 1))"

  /** x140's Cohen's kappa over the integer confusion columns
    * (n, n11, n10, n01, n00) — ONE string evaluated by both engines, so
    * the (po−pe)/(1−pe) chain orders identically off the exact counts.
    */
  private val KappaSql: String = {
    val po = "(CAST(n11 + n00 AS DOUBLE) / n)"
    val pa = "(CAST(n11 + n10 AS DOUBLE) / n)"
    val pb = "(CAST(n11 + n01 AS DOUBLE) / n)"
    val pe = s"($pa * $pb + (1.0 - $pa) * (1.0 - $pb))"
    s"($po - $pe) / (1.0 - $pe)"
  }

  /** The x145/x154 shared graph surface: undirected (u < v) part
    * co-purchase edges (parts sharing an order), deduped.
    */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val po = table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    po.as("a").join(po.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
  }

  /** The x145/x154 shared synchronous mode-label propagation: per round
    * each node takes the (count DESC, label ASC) argmax of its
    * neighbors' labels — deterministic, no damping. Returns
    * (node, label) for every node of the undirected edge set.
    */
  private def labelPropagate(und: DataFrame, rounds: Int): DataFrame = {
    val edges = graft.engine.CacheScope.persistTracked(
      und.union(und.select(col("v").as("u"), col("u").as("v"))))
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val wN = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("cnt").desc, col("label"))
      labels = edges
        .join(labels.select(col("node").as("v"), col("label")), "v")
        .groupBy(col("u").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wN))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
    }
    labels
  }

  /** x150's estimator sign rule — first md5 hex digit of 'ams<j>:<term>'
    * odd → +1 — as ONE predicate string both engines evaluate on their
    * identical lowercase-hex md5; no bit intrinsics, no conv.
    */
  private[graft] def AmsSignOddSql(j: Int, c: String): String =
    s"substr(md5(concat('ams$j:', $c)), 1, 1) IN " +
      "('1', '3', '5', '7', '9', 'b', 'd', 'f')"

  /** x152's coverage checkpoints — one constant feeds both engines. */
  private[graft] val CoverageKs = Seq(10L, 50L, 100L, 1000L)

  /** x155's Poisson(1) inverse-CDF thresholds as 4-hex-digit ticket
    * bounds (floor(cdf·65536), the Sampling.thresholdHex device) — the
    * CASE is ONE string over the per-engine `u` ticket column, so the
    * weight draw cannot drift. Scala-computed constants; both engines
    * compare the identical literals.
    */
  private val PoissonThreshHex: Seq[String] = {
    val pmf = (0 to 4).map(k => math.exp(-1.0) / (1 to k).product)
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => f"${math.floor(c * 65536).toLong}%04x")
  }
  private val PoissonCaseSql: String =
    "CASE " + PoissonThreshHex.zipWithIndex.map { case (h, k) =>
      s"WHEN u < '$h' THEN $k" }.mkString(" ") + " ELSE 5 END"
  private val BootMeanSql: String = "CAST(swv AS DOUBLE) / 1e6 / sw"

  /** x158's state rule over the integer epoch-week columns (pwd, wd) —
    * ONE string evaluated by both engines.
    */
  private val LifecycleCaseSql: String =
    "CASE WHEN pwd IS NULL THEN 'new' WHEN wd - pwd = 1 THEN 'retained' " +
      "ELSE 'resurrected' END"

  /** x160's cosine over the exact decimal sums (dot, nq, nd) — ONE
    * string; the DOUBLE casts land on the decimals, so both engines run
    * the identical IEEE chain.
    */
  private val TfidfCosSql: String =
    "CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nd AS DOUBLE)))"

  /** x162's micro-quantized F1 over the integer counts (tp, fp, fn). */
  private val F1MicroSql: String =
    "CAST(floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1e6 + 0.5) AS BIGINT)"

  /** x142's normal-equation chain over the exact integer ln-sums
    * (n, sx, sy, sxy, sxx — micro-scaled by 1e6/1e12) — ONE string per
    * statistic evaluated by both engines, so every product/division
    * orders identically. The intercept inlines the slope tree (not an
    * alias) so both engines evaluate literally the same expression.
    */
  private val ZipfSlopeSql: String =
    "(n * (CAST(sxy AS DOUBLE) / 1e12) - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6)) / " +
      "(n * (CAST(sxx AS DOUBLE) / 1e12) - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))"
  private val ZipfInterceptSql: String =
    s"((CAST(sy AS DOUBLE) / 1e6) - ($ZipfSlopeSql) * (CAST(sx AS DOUBLE) / 1e6)) / n"

  /** x143's ratio-to-overall over (sv, n, st, nn) — one shared string. */
  private val SeasonalSql: String =
    "(CAST(sv AS DOUBLE) / 1e6 / n) / (CAST(st AS DOUBLE) / 1e6 / nn)"

  /** x135's per-cell χ² contribution (o−e)²/e with e = rt·ct/nn — ONE
    * string over columns (o, rt, ct, nn) evaluated by both engines, so
    * every division/subtraction orders identically.
    */
  private val Chi2CellSql: String =
    "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / nn) * " +
      "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / nn) / " +
      "(CAST(rt AS DOUBLE) * ct / nn)"

  /** x166's per-bin PSI contribution (p−q)·ln(p/q) with Laplace-smoothed
    * bin fractions p = (c+1)/(ns+10), q = (g+1)/(nn+10) — ONE string over
    * columns (c, ns, g, nn) so both engines evaluate the identical IEEE
    * expression (the Chi2CellSql device; smoothing over the full 10-bin
    * spine keeps every log argument finite).
    */
  private val PsiCellSql: String =
    "((CAST(c AS DOUBLE) + 1) / (CAST(ns AS DOUBLE) + 10) - " +
      "(CAST(g AS DOUBLE) + 1) / (CAST(nn AS DOUBLE) + 10)) * " +
      "ln(((CAST(c AS DOUBLE) + 1) / (CAST(ns AS DOUBLE) + 10)) / " +
      "((CAST(g AS DOUBLE) + 1) / (CAST(nn AS DOUBLE) + 10)))"

  /** x178's per-(pair, term) JSD contribution over (a, b, na, nb) —
    * pA·ln(pA/m) + pB·ln(pB/m) with m = (pA+pB)/2, nano-quantized to an
    * exact integer (·1e12) so the per-pair sum is order-free. The
    * COMBINED two-sided term is ≥ 0 for every term (it equals
    * (pA+pB)·(ln2 − H(pA/(pA+pB))) — log-sum inequality), which
    * PipelineOpsSpec pins. ONE string evaluated by both engines.
    */
  private val JsdContribSql: String =
    "CAST(floor((" +
      "(CASE WHEN a > 0 THEN (CAST(a AS DOUBLE) / na) * " +
      "ln((CAST(a AS DOUBLE) / na) / " +
      "((CAST(a AS DOUBLE) / na + CAST(b AS DOUBLE) / nb) / 2)) ELSE 0.0 END) + " +
      "(CASE WHEN b > 0 THEN (CAST(b AS DOUBLE) / nb) * " +
      "ln((CAST(b AS DOUBLE) / nb) / " +
      "((CAST(a AS DOUBLE) / na + CAST(b AS DOUBLE) / nb) / 2)) ELSE 0.0 END)" +
      ") * 1e12 + 0.5) AS BIGINT)"

  /** x184's Flesch reading-ease over the three exact per-source sums
    * (w words, se sentence groups, sy syllable proxies) — ONE string,
    * both engines divide the same integers.
    */
  private val FleschSql: String =
    "206.835 - 1.015 * (CAST(w AS DOUBLE) / se) - " +
      "84.6 * (CAST(sy AS DOUBLE) / w)"

  /** x185's per-gram entropy contribution −p·ln p nano-quantized off the
    * exact (c, n) integers — order-free exact sums (the x178 device).
    */
  private val EntropyContribSql: String =
    "CAST(floor(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) " +
      "* 1e12 + 0.5) AS BIGINT)"

  /** x188's per-bigram interpolated Kneser-Ney log-probability over the
    * exact integer model parameters (cb bigram count, cw1 left-context
    * total, r1 distinct right types of w1, l2 distinct left types of
    * w2, bt total bigram types), discount 0.75, nano-quantized — ONE
    * string, both engines evaluate identical doubles off identical
    * integers.
    */
  private val KnLpSql: String =
    "CAST(floor(ln((CAST(cb AS DOUBLE) - 0.75) / cw1 + " +
      "(0.75 * CAST(r1 AS DOUBLE) / cw1) * (CAST(l2 AS DOUBLE) / bt)) " +
      "* 1e9 + 0.5) AS BIGINT)"

  /** x189's shared Mann-Kendall/Sen pieces: the pair sign, the
    * nano-quantized pairwise slope ((vb − va) micro-units over `gap`
    * integer days → nano-units/day), the median-rank picker (handles
    * odd and even pair counts in one IN-list), and the
    * continuity-corrected z over the exact integer variance numerator
    * (Var·18 = n(n−1)(2n+5) − Σt(t−1)(2t+5)). One string each — both
    * engines evaluate identical doubles off identical integers.
    */
  private val SgnSql: String =
    "CAST(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END AS BIGINT)"
  private val SenSlopeSql: String =
    "CAST(floor(CAST(vb - va AS DOUBLE) * 1e3 / gap + 0.5) AS BIGINT)"
  private val MedianPickSql: String =
    "rk IN (CAST(floor((np + 1) / 2.0) AS BIGINT), " +
      "CAST(floor((np + 2) / 2.0) AS BIGINT))"
  private val MkZSql: String =
    "CASE WHEN var_num <= 0 OR s_stat = 0 THEN 0.0 " +
      "WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) " +
      "/ sqrt(CAST(var_num AS DOUBLE) / 18.0) " +
      "ELSE (CAST(s_stat AS DOUBLE) + 1.0) " +
      "/ sqrt(CAST(var_num AS DOUBLE) / 18.0) END"

  /** x190's lag-k autocorrelation read over exact integer sufficient
    * statistics: series moments (n days, sv = Σv, svv = Σv² — pre-widened
    * DECIMAL(38,0)/HUGEINT) and per-lag pair sums (n_pairs, cxy = Σva·vb,
    * hx = Σva, tx = Σvb). r_k = Σ(va−v̄)(vb−v̄) / Σ(v−v̄)² expanded so the
    * only non-integer inputs are double casts of identical integers; the
    * constant-series guard (n·svv = sv², an EXACT wide-integer equality)
    * returns 0.0 instead of 0/0. ONE string, both engines.
    */
  private val AcfSql: String =
    "CASE WHEN n * svv = sv * sv THEN 0.0 ELSE " +
      "(CAST(cxy AS DOUBLE) " +
      "- (CAST(sv AS DOUBLE) / n) * CAST(hx AS DOUBLE) " +
      "- (CAST(sv AS DOUBLE) / n) * CAST(tx AS DOUBLE) " +
      "+ n_pairs * (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n)) " +
      "/ (CAST(svv AS DOUBLE) " +
      "- n * (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n)) END"

  /** x190/x199's shared read-time ACF derivation over a (event_type,
    * day, vm) daily frame of exact micro-tick integers — batch-built
    * (x190) or stream-maintained (x199), the derivation is the same:
    * pre-widened moments, equi-join lag pairing, ONE AcfSql read. The
    * input must be safe to reference three times (checkpointed frame or
    * memory-sink table).
    */
  private def acfOverDaily(daily: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("vm"))).as("sv"),
        sum(dec(col("vm")) * dec(col("vm"))).as("svv"))
    val pairs = daily
      .withColumn("lag_days", explode(expr("sequence(1L, 7L)")))
      .withColumn("day_b", date_add(col("day"), col("lag_days").cast("int")))
      .join(daily.select(col("event_type"), col("day").as("day_b"),
        col("vm").as("vb")), Seq("event_type", "day_b"))
      .groupBy(col("event_type"), col("lag_days"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("vm")) * dec(col("vb"))).as("cxy"),
        sum(dec(col("vm"))).as("hx"), sum(dec(col("vb"))).as("tx"))
    pairs.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("lag_days"), col("n_pairs"),
        graft.functions.EngineMath.roundAway(expr(AcfSql), 6).as("acf"))
      .orderBy(col("event_type"), col("lag_days"))
  }

  /** x198's log-rank pieces over exact integers (d_a/d_b deaths and
    * na/nb risk sets at one death time): the nano-quantized
    * observed-minus-expected term d_a − d·na/n, the tie-corrected
    * hypergeometric variance term d·(na/n)·(nb/n)·(n−d)/(n−1) (0 when
    * the risk set is a single subject), and the final z read off the
    * exact integer sums. ONE string each, both engines.
    */
  private val LrESql: String =
    "CAST(floor((CAST(d_a AS DOUBLE) " +
      "- CAST(d_a + d_b AS DOUBLE) * na / (na + nb)) * 1e9 + 0.5) AS BIGINT)"
  private val LrVSql: String =
    "CASE WHEN na + nb <= 1 THEN CAST(0 AS BIGINT) " +
      "ELSE CAST(floor(CAST(d_a + d_b AS DOUBLE) " +
      "* (CAST(na AS DOUBLE) / (na + nb)) " +
      "* (CAST(nb AS DOUBLE) / (na + nb)) " +
      "* (CAST(na + nb - d_a - d_b AS DOUBLE) / (na + nb - 1)) " +
      "* 1e9 + 0.5) AS BIGINT) END"
  private val LrZSql: String =
    "CASE WHEN sv <= 0 THEN 0.0 " +
      "ELSE (CAST(se AS DOUBLE) / 1e9) / sqrt(CAST(sv AS DOUBLE) / 1e9) END"

  /** The x190 ≡ x199 oracle (the stream-maintained ACF must equal the
    * batch one — the x166/x176 coupling): exact micro-tick daily series,
    * HUGEINT pre-widening, the SHARED AcfSql read.
    */
  private def AcfOracleSql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS vm
       |  FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(vm AS HUGEINT)) AS HUGEINT) AS sv,
       |    CAST(sum(CAST(vm AS HUGEINT) * CAST(vm AS HUGEINT)) AS HUGEINT) AS svv
       |  FROM daily GROUP BY 1),
       |lg AS (SELECT unnest(range(1, 8)) AS lag_days),
       |p AS (SELECT a.event_type, lg.lag_days,
       |    CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CAST(a.vm AS HUGEINT) * CAST(b.vm AS HUGEINT)) AS HUGEINT) AS cxy,
       |    CAST(sum(CAST(a.vm AS HUGEINT)) AS HUGEINT) AS hx,
       |    CAST(sum(CAST(b.vm AS HUGEINT)) AS HUGEINT) AS tx
       |  FROM daily a CROSS JOIN lg JOIN daily b
       |    ON b.event_type = a.event_type
       |    AND b.day = a.day + CAST(lg.lag_days AS INTEGER)
       |  GROUP BY 1, 2)
       |SELECT event_type, lag_days, n_pairs, round($AcfSql, 6) AS acf
       |FROM p JOIN st USING (event_type)
       |ORDER BY event_type, lag_days""".stripMargin.replace("\n", " ")

  /** x191's Kaplan-Meier pieces: the nano-quantized per-step log factor
    * ln(1 − d/n_risk) — NULL at the extinction step (d = n_risk, where the
    * factor is 0 and the log diverges; the `dead` flag takes over) — and
    * the survival read S(t) = exp(Σ lq / 1e9) with the cumulative
    * extinction override. Exact integers (d, n_risk, cum) in, ONE string
    * each, both engines round the same double once.
    */
  private val KmLnSql: String =
    "CASE WHEN d >= n_risk THEN NULL " +
      "ELSE CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e9 + 0.5) " +
      "AS BIGINT) END"
  private val KmSurvSql: String =
    "CASE WHEN dead = 1 THEN 0.0 " +
      "ELSE exp(CAST(coalesce(cum, 0) AS DOUBLE) / 1e9) END"

  /** x192's per-threshold PR trapezoid term, pico-quantized: ΔR · mean
    * precision over the exact cumulative integers (tp, fp) at this
    * threshold and (tpp, fpp) at the previous (0, 0 at the anchor, where
    * precision is 1.0 by convention), p = total positives. ONE string —
    * both engines sum identical integers. Zero-positive corpora (p = 0)
    * have no PR curve: every term is pinned to 0 (⇒ pr_auc 0.0 on both
    * engines) instead of Spark's non-ANSI NULL vs DuckDB's /0 error —
    * the same explicit single-class guard convention as CvAucSql.
    */
  private val PrTermSql: String =
    "CASE WHEN p = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(floor((CAST(tp - tpp AS DOUBLE) / p) * " +
      "((CAST(tp AS DOUBLE) / (tp + fp) + " +
      "CASE WHEN tpp + fpp = 0 THEN 1.0 " +
      "ELSE CAST(tpp AS DOUBLE) / (tpp + fpp) END) / 2.0) " +
      "* 1e12 + 0.5) AS BIGINT) END"

  /** x193's gains reads over exact integer counts: cumulative positive
    * capture and per-decile lift vs the base rate. ONE string each.
    */
  private val GainsCaptureSql: String =
    "CAST(cum_pos AS DOUBLE) / p"
  private val GainsLiftSql: String =
    "(CAST(n_pos AS DOUBLE) / n_docs) / (CAST(p AS DOUBLE) / nn)"

  /** x194's per-point simplified silhouette, nano-quantized off the exact
    * micro-tick squared distances to the own (a2) and nearest-other (b2)
    * centroid: s = (√b² − √a²)/√max — with the a2 = b2 = 0 guard (a point
    * ON two coincident centroids has no preference). ONE string.
    */
  private val SilhSql: String =
    "CASE WHEN b2 = 0 THEN CAST(0 AS BIGINT) " +
      "ELSE CAST(floor((sqrt(CAST(b2 AS DOUBLE) / 1e6) " +
      "- sqrt(CAST(a2 AS DOUBLE) / 1e6)) " +
      "/ sqrt(CAST(greatest(a2, b2) AS DOUBLE) / 1e6) " +
      "* 1e9 + 0.5) AS BIGINT) END"

  /** x195's assortativity read: Pearson r over the directed-edge degree
    * pairs, off exact pre-widened integer sufficient statistics
    * (m = 2|E| directed pairs; sx = Σx = Σy by orientation symmetry;
    * sxx = Σx² = Σy²; sxy = Σxy) — one exact integer numerator and
    * denominator, ONE double division, with the exact zero-variance
    * guard (a regular graph has no degree variance). ONE string.
    */
  private val AssortSql: String =
    "CASE WHEN m * sxx = sx * sx THEN 0.0 " +
      "ELSE CAST(m * sxy - sx * sx AS DOUBLE) " +
      "/ CAST(m * sxx - sx * sx AS DOUBLE) END"

  /** x196's conformal pieces: the nano-quantized nonconformity
    * 1 − P(true class) under the sigmoid of the 6-dp score (ONE string —
    * both engines rank identical integers), and the calibration rank
    * ⌈(n+1)(1−α)⌉ at α = 0.1, clamped to n.
    */
  private val ConfNcSql: String =
    "CAST(floor((1.0 - CASE WHEN pos = 1 " +
      "THEN 1.0 / (1.0 + exp(-score)) " +
      "ELSE 1.0 - 1.0 / (1.0 + exp(-score)) END) * 1e9 + 0.5) AS BIGINT)"
  private val ConfRankSql: String =
    "least(CAST(ceil((ncal + 1) * 0.9) AS BIGINT), ncal)"

  /** x197's p99 pick over the count-of-counts frame: the smallest
    * per-key count covering ≥ 99% of keys. ONE string.
    */
  private val SkewP99RankSql: String =
    "CAST(ceil(0.99 * n_keys) AS BIGINT)"

  /** x200's fixed projection directions: 4 deterministic 64-dim arrays
    * of exact 3-dp decimals in [−1, 1) (an LCG over the flat index —
    * reproducible, no RNG). ONE constant: the Spark side embeds them as
    * `typedlit` literals, the oracle as DuckDB list literals printed at
    * %.3f — 3-dp decimal strings parse to identical doubles in both
    * engines (correctly-rounded decimal→binary), so the projections are
    * bit-identical.
    */
  private[graft] val SlicedW1Dirs: Seq[Seq[Double]] =
    (0 until 4).map { j =>
      (0 until 64).map { i =>
        val h = ((j * 64 + i + 1) * 1103515245L + 12345L) % 2000
        (h - 1000) / 1000.0
      }
    }

  private def slicedW1DirSql: String =
    SlicedW1Dirs.zipWithIndex.map { case (dv, j) =>
      s"SELECT $j AS slice, [${dv.map(d => f"$d%.3f").mkString(", ")}] AS d"
    }.mkString(" UNION ALL ")

  /** x201's guarded AUC read off x88's exact rank integers (s2 = Σ np·
    * (2·cb + n + 1), p positives, tot rows): the usual Mann-Whitney
    * division, 0.5 by convention when a fold is single-class (the
    * statistic is undefined — a ranker cannot be right or wrong with
    * one class). ONE string, both engines.
    */
  private val CvAucSql: String =
    "CASE WHEN p = 0 OR p = tot THEN 0.5 " +
      "ELSE CAST(s2 - CAST(p AS DECIMAL(38,0)) * (p + 1) AS DOUBLE) " +
      "/ CAST(2 * CAST(p AS DECIMAL(38,0)) * (tot - p) AS DOUBLE) END"

  /** x204's projected variance off exact integer micro-sums (n, sp = Σpm,
    * spp = Σpm²): population variance in the same fixed operand order on
    * both engines. ONE string.
    */
  private val PcaVarSql: String =
    "(CAST(spp AS DOUBLE) / 1e12 - " +
      "(CAST(sp AS DOUBLE) / 1e6) * (CAST(sp AS DOUBLE) / 1e6) / n) / n"

  /** x207's DeLong reads off exact integer placement moments. Placements
    * are stored DOUBLED (2·opposite-class-below + ties), so s1 = Σ w·p,
    * s2 = Σ w·p² carry no halves; auc = s1/(2·n·m) and the sample
    * variances divide by (2·n)² / (2·m)² respectively. ONE string each,
    * fixed operand order; single-class → auc 0.5, degenerate (<2 per
    * class) → se 0.
    */
  /** x208's Good-Turing smoothed count r* = (r+1)·N_{r+1}/N_r over the
    * count-of-counts histogram columns (c, m, m_next); NULL where no
    * (r+1)-count types exist — the shared both-engines convention.
    */
  private val GtStarSql: String =
    "CASE WHEN coalesce(m_next, 0) = 0 THEN NULL " +
      "ELSE CAST(c + 1 AS DOUBLE) * m_next / m END"

  /** x212's per-term Jensen–Shannon contribution over the exact integer
    * columns (ca, ta, cb, tb): 0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q))
    * with the zero-count sides dropping out — ONE string, identical
    * operand order on both engines (the per-PAIR sum then folds in
    * sorted term order, the x96 device).
    */
  private val JsdTermSql: String =
    "CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / ta) * " +
      "ln(2.0 * (CAST(ca AS DOUBLE) / ta) / " +
      "((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb))) " +
      "ELSE 0.0 END + " +
      "CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / tb) * " +
      "ln(2.0 * (CAST(cb AS DOUBLE) / tb) / " +
      "((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb))) " +
      "ELSE 0.0 END"

  /** x216's HLL estimate read over (m, zeros, sumscaled): the raw
    * harmonic-mean estimate α·m²·2⁵⁶/Σ2^(56−M) (the register mass is an
    * exact DECIMAL integer — order-free), with the standard small-range
    * linear-counting correction. α is a Scala-computed double embedded
    * via its shortest round-trip literal, so both engines parse the
    * identical value. ONE string, fixed operand order.
    */
  private def HllEstSql(m: Int): String = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = s"($alpha * CAST(m AS DOUBLE) * m * 72057594037927936.0 " +
      "/ CAST(sumscaled AS DOUBLE))"
    s"CASE WHEN $raw <= 2.5 * m AND zeros > 0 " +
      "THEN CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE) / zeros) " +
      s"ELSE $raw END"
  }

  /** x217's correlation read over exact DECIMAL moment sums (n, Σx, Σy,
    * Σx², Σy², Σxy): each moment casts to double ONCE, then a fixed
    * operand order both engines share; zero variance pins to 0.0 by
    * convention (correlation with a constant is undefined).
    */
  private def CorrSql(sx: String, sy: String, sxx: String, syy: String,
      sxy: String): String = {
    val den = s"(sqrt(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE) - " +
      s"CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)) * " +
      s"sqrt(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE) - " +
      s"CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)))"
    s"CASE WHEN $den = 0 THEN 0.0 ELSE " +
      s"(CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE) - " +
      s"CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE)) / $den END"
  }

  private val DlAucSql: String =
    "CASE WHEN mpos = 0 OR nneg = 0 THEN 0.5 " +
      "ELSE CAST(s1 AS DOUBLE) / (2.0 * CAST(nneg AS DOUBLE) * mpos) END"
  private val DlSeSql: String =
    "CASE WHEN mpos < 2 OR nneg < 2 THEN 0.0 ELSE sqrt(" +
      "((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / mpos) " +
      "/ (mpos - 1) / (4.0 * CAST(nneg AS DOUBLE) * nneg)) / mpos + " +
      "((CAST(s2p AS DOUBLE) - CAST(s1p AS DOUBLE) * CAST(s1p AS DOUBLE) / nneg) " +
      "/ (nneg - 1) / (4.0 * CAST(mpos AS DOUBLE) * mpos)) / nneg) END"

  /** x201's oracle: per fold, the x106 md5-mod fold assignment, the
    * staged per-fold weights applied to the re-derived quality features
    * (the scoredLabCtes arithmetic), and x88's exact rank AUC — one
    * parenthesized WITH block per fold (the x197 device).
    */
  private def cvAucOracle: String = {
    val blocks = (0 until 5).map { f =>
      s"""(${qualityCtes.replaceFirst("WITH ", "WITH ")},
         |  f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1,
         |    mtl AS f2, least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c),
         |  w AS (SELECT weights, intercept
         |    FROM ${Stage.sqlRef(s"x201_weights_$f")}),
         |  z AS (SELECT doc_id, round(intercept + weights[1] * f0 +
         |    weights[2] * f1 + weights[3] * f2 + weights[4] * f3, 6)
         |    AS score FROM f CROSS JOIN w),
         |  lab AS (SELECT z.score,
         |      CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos
         |    FROM z JOIN documents d USING (doc_id)
         |    WHERE ('0x' || substr(md5('cv:' || CAST(d.doc_id AS VARCHAR)),
         |      1, 12))::BIGINT % 5 = $f),
         |  g AS (SELECT score, count(*) AS n, sum(pos) AS np FROM lab
         |    GROUP BY score),
         |  o AS (SELECT score, n, np, coalesce(sum(n) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |    FROM g),
         |  s AS (SELECT sum(np * (2 * cb + n + 1)) AS s2, sum(np) AS p,
         |    sum(n) AS tot FROM o)
         |  SELECT CAST($f AS BIGINT) AS fold, CAST(tot AS BIGINT) AS n_test,
         |    CAST(p AS BIGINT) AS n_pos, $CvAucSql AS auc FROM s)"""
        .stripMargin.replace("\n", " ")
    }
    blocks.mkString("", " UNION ALL ", " ORDER BY fold")
  }

  /** x202's leak-rate read with the empty-pair-set guard. ONE string. */
  private val LeakRateSql: String =
    "CASE WHEN n_pairs = 0 THEN 0.0 " +
      "ELSE CAST(n_straddle_naive AS DOUBLE) / n_pairs END"

  /** x203's top-quartile threshold rank: the ⌈0.75·N⌉-th smallest score
    * (selection = strictly above it). ONE string.
    */
  private val SelThrRankSql: String =
    "CAST(ceil(0.75 * nn) AS BIGINT)"

  /** The audited join-key columns — ONE inventory builds both the Spark
    * union and the oracle's UNION ALL (x90's profileCols device).
    */
  private val SkewAuditCols: Seq[(String, String)] = Seq(
    "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey", "orders" -> "o_custkey",
    "events" -> "user_id")

  /** x197's oracle: per audited column, the same per-key aggregate, the
    * same exact integer stats, the same cumulative count-of-counts p99.
    */
  private def skewAuditOracle: String = {
    val blocks = SkewAuditCols.map { case (tbl, c) =>
      s"""(WITH per AS (SELECT CAST(count(*) AS BIGINT) AS cnt
         |    FROM $tbl GROUP BY $c),
         |  tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
         |      CAST(count(*) AS BIGINT) AS n_keys,
         |      CAST(max(cnt) AS BIGINT) AS max_cnt FROM per),
         |  p99 AS (SELECT CAST(min(cnt) AS BIGINT) AS p99_cnt FROM
         |    (SELECT cnt, CAST(sum(nk) OVER (ORDER BY cnt
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |        AS cum
         |      FROM (SELECT cnt, CAST(count(*) AS BIGINT) AS nk FROM per
         |        GROUP BY 1)) CROSS JOIN (SELECT n_keys FROM tot)
         |    WHERE cum >= $SkewP99RankSql)
         |  SELECT '$tbl.$c' AS key_col, n_rows, n_keys, max_cnt,
         |    round(CAST(max_cnt AS DOUBLE) / n_rows, 6) AS top_share,
         |    p99_cnt
         |  FROM tot CROSS JOIN p99)""".stripMargin.replace("\n", " ")
    }
    blocks.mkString("", " UNION ALL ", " ORDER BY key_col")
  }

  /** x186's coefficient-of-variation read over pre-widened exact moments
    * (st = Σt, st2 = Σt² as DECIMAL(38,0) ≡ HUGEINT): population
    * CV = √(S·Σt² − (Σt)²)/Σt — one string, the multiplies run in each
    * engine's exact wide type (the x170 device).
    */
  private val ShardCvSql: String =
    "sqrt(CAST(n_shards * st2 - st * st AS DOUBLE)) / CAST(st AS DOUBLE)"

  /** x167's final W₁ read off the exact integer numerator: the sum of
    * |cumA·nB − cumB·nA|·Δv terms divided by nA·nB·1e6 — one shared
    * string over (st, na, nb); st is an exact integer in both engines
    * (Spark DECIMAL(38,0), DuckDB HUGEINT), so the double cast rounds
    * the same value once.
    */
  private val W1Sql: String =
    "CAST(st AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1e6)"

  /** x168's Naive Bayes parameter quantizers — nano-quantized natural
    * logs of the Laplace-smoothed class-conditional term probability
    * (over cst, ns, v), the unseen-term default (over ns, v), and the
    * class prior (over dc, dd). ONE string each evaluated by both
    * engines, so every per-(class, term) integer is identical and the
    * per-doc scores are exact integer sums.
    */
  private val NbLpSql: String =
    "CAST(floor(ln((CAST(cst AS DOUBLE) + 1) / (CAST(ns AS DOUBLE) + v)) " +
      "* 1e9 + 0.5) AS BIGINT)"
  private val NbDefSql: String =
    "CAST(floor(ln(1.0 / (CAST(ns AS DOUBLE) + v)) * 1e9 + 0.5) AS BIGINT)"
  private val NbPriorSql: String =
    "CAST(floor(ln(CAST(dc AS DOUBLE) / dd) * 1e9 + 0.5) AS BIGINT)"

  /** x170's log-log OLS reads — slope β = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    * and intercept ln k = (Σy − βΣx)/(1e9·n), over nano-quantized
    * ln-coordinates. The sums are EXACT (Σx/Σy pre-widened, Σxy/Σx² as
    * DECIMAL(38,0)/HUGEINT products), so each read is arithmetic on
    * identical integers with one double rounding — ONE string each.
    *
    * Practical bound on the DECIMAL(38,0) claim: with one point per doc
    * and |xn·yn| ≤ (ln(1e14)·1e9)² ≈ 1.1e21, n·Σxy stays within 38
    * digits up to n ≈ 3e8 sample points; past that a Spark decimal
    * overflow yields NULL (loudly wrong, not silently wrapped). The
    * documented at-scale form — the x113 bucket-prefix spine — samples
    * the prefix curve at bounded bucket boundaries (thousands of
    * points, not one per doc), which keeps the sufficient statistics
    * far inside the bound; fitting Heaps on 1e9+ raw per-doc points
    * is statistical overkill the sampled spine removes.
    */
  private val HeapsBetaSql: String =
    "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
  private val HeapsLnKSql: String =
    s"(CAST(sy AS DOUBLE) / 1e9 - ($HeapsBetaSql) * CAST(sx AS DOUBLE) / 1e9) / n"

  /** x171's BH threshold mapped to the χ² scale: with 2 dof the χ²
    * survival is exp(−x/2), so p₍ᵢ₎ ≤ i·q/m ⟺ χ²₍ᵢ₎ ≥ −2·ln(i·q/m) —
    * the comparison runs without an exp() anywhere (x70's lesson: exp is
    * not bit-portable; ln on small exact rationals is the x163 device).
    * ONE string over (rank, m), q = 0.10.
    */
  private val BhThrSql: String =
    "-2 * ln(CAST(rank AS DOUBLE) * 0.10 / m)"

  /** x173's micro-quantized log-likelihood keyness G² = 2·Σ o·ln(o/e)
    * over the term's 2×1 split (target count a of total ta, rest count
    * b of total tb; expected shares from the pooled rate) — ONE string
    * over (a, b, ta, tb) producing the INTEGER micro-tick directly, so
    * the top-k ordering key is exact in both engines. 0·ln(0) = 0 via
    * the CASE guards.
    */
  private val G2MicroSql: String =
    "CAST(floor(2 * (" +
      "(CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * (ta + tb) / " +
      "(CAST(a + b AS DOUBLE) * ta)) ELSE 0.0 END) + " +
      "(CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE) * (ta + tb) / " +
      "(CAST(a + b AS DOUBLE) * tb)) ELSE 0.0 END)" +
      ") * 1e6 + 0.5) AS BIGINT)"

  /** x175's variance-to-mean burstiness over ALL docs (zeros included):
    * b = (D·Σm² − (Σm)²) / (D·Σm) — exact integer numerator and
    * denominator (pre-widened sums), ONE double division.
    */
  private val BurstSql: String =
    "CAST(dd * sm2 - sm * sm AS DOUBLE) / CAST(dd * sm AS DOUBLE)"

  /** x174's Benford expectations log10(1+1/d) as Scala-computed literals
    * (the x115/x148 CASE device — both engines parse the identical IEEE
    * doubles), and the per-digit χ² contribution over (o, nn) with
    * e = nn·p.
    */
  private[graft] val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
  private val BenfordPSql: String = {
    val cases = BenfordP.map { case (d, p) => s"WHEN $d THEN CAST($p AS DOUBLE)" }
    s"CASE digit ${cases.mkString(" ")} ELSE 0.0 END"
  }
  private val BenfordCellSql: String =
    s"(CAST(o AS DOUBLE) - nn * ($BenfordPSql)) * " +
      s"(CAST(o AS DOUBLE) - nn * ($BenfordPSql)) / (nn * ($BenfordPSql))"

  /** x131's sign-bit word: Σ_{j=0..31} (vec[lo+j] > 0 ? 2^j : 0) as
    * generated CASE terms — `at` supplies the engine's 1-based list
    * indexing (Spark element_at, DuckDB v[i]); the term values are plain
    * decimal literals, so no engine bit intrinsics are involved.
    */
  private[graft] def signWordExpr(at: Int => String, lo: Int): String =
    (0 until 32).map { j =>
      s"(CASE WHEN ${at(lo + j + 1)} > 0 THEN CAST(${1L << j} AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** x118's Morton interleave as portable integer arithmetic: bit i of a
    * contributes 4^i, bit i of b contributes 2·4^i. `divOp` is the only
    * engine difference (Spark `div`, DuckDB `//`); the 32 terms are
    * otherwise one shared string, so the curve cannot drift.
    */
  private[graft] def zorderExpr(a: String, b: String, divOp: String): String =
    (0 until 16).map { i =>
      val p2 = 1L << i; val p4 = 1L << (2 * i)
      s"(($a $divOp $p2) % 2) * $p4 + (($b $divOp $p2) % 2) * ${2 * p4}"
    }.mkString(" + ")

  private def rboWeightCase(v: String): String = {
    val cases = (1 to 10).scanLeft(1.0)((a, _) => a * 0.9).tail.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN ${w / (i + 1)}" }
    s"CASE $v ${cases.mkString(" ")} ELSE 0.0 END"
  }

  // x27 constants — the oracle SQL below derives its thresholds from these
  private val sampleRates = Map("en" -> 0.25, "de" -> 0.5)
  private val splitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // ---- DuckDB oracles ---------------------------------------------------

  /** tokens as DuckDB list (mirrors TextFunctions.tokens). */
  private val toks = raw"list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)"
  private def markers(lang: String): String = {
    val ws = TextFunctions.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(ts, t -> t IN ($ws)))"
  }
  /** 3-token shingle set (mirrors TextFunctions.shingles k=3). */
  private val shingleSql =
    "list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])"
  /** replicate Dedup.cosine exactly: sequential dot products in double. */
  private val cosSql =
    "list_dot_product(iv, qv) / (sqrt(list_dot_product(iv, iv)) * sqrt(list_dot_product(qv, qv)))"
  /** Column inventory for the x90 profiling op — one source of truth for
    * the Spark stack() and the oracle's UNION ALL branches.
    */
  private val profileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  private val jaccardCte =
    // tokenize with `toks` (whitespace regex, empties dropped) — the same
    // tokenizer as the Spark side; a plain single-space split would diverge
    // on tabs/newlines/double spaces
    s"""WITH t AS (SELECT doc_id, $shingleSql AS sh
       | FROM (SELECT doc_id, $toks AS s FROM documents)),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.sh, b.sh))) AS j
       | FROM t a JOIN t b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, round(j, 4) AS jaccard FROM p WHERE j >= 0.8
       |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** Quality-score derivation shared by the x03 and x63 oracles (one
    * definition — a formula tweak edited in one place cannot leave the
    * other oracle gating a stale definition): `qualityCtes` exposes CTE
    * `c` with (doc_id, n, mk, punct, mtl); `qualityExprSql` is the
    * 4-dp-rounded score over those columns, mirroring
    * TextFunctions.qualityScoreOf term for term.
    */
  private val qualityCtes =
    s"WITH m AS (SELECT doc_id, text, $toks AS ts FROM documents), " +
      s"c AS (SELECT doc_id, len(ts) AS n, CAST(${markers("en")} AS DOUBLE) AS mk, " +
      raw"CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / len(text) AS punct, " +
      "CAST(list_sum(list_transform(ts, t -> len(t))) AS DOUBLE) / len(ts) AS mtl FROM m)"
  private val qualityExprSql =
    "floor((least(mk / n * 4, 1.0) * 0.3 + least(CAST(n AS DOUBLE) / 100, 1.0) * 0.3 + " +
      "(1.0 - punct) * 0.2 + (CASE WHEN mtl BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2) " +
      "* 10000 + 0.5) / 10000"

  /** The oracle half of [[qlrScoredLab]], shared by x88/x192/x193/x196:
    * CTE `lab` exposes (doc_id, score, pos) — the staged model weights
    * applied to the independently re-derived quality features, rounded
    * to the same 6 dp. One definition; a feature/rounding tweak edited
    * here cannot leave one consumer's oracle gating stale scores.
    */
  private def scoredLabCtes(stageKey: String): String =
    s"$qualityCtes, " +
      "f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
      "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
      s"w AS (SELECT weights, intercept FROM ${Stage.sqlRef(stageKey)}), " +
      "z AS (SELECT doc_id, round(intercept + weights[1] * f0 + weights[2] * f1 + " +
      "weights[3] * f2 + weights[4] * f3, 6) AS score FROM f CROSS JOIN w), " +
      "lab AS (SELECT z.doc_id, z.score, CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos " +
      "FROM z JOIN documents d USING (doc_id))"

  /** Decontamination oracle shared by x40 (exact path) and x56 (bloom
    * path): 5-gram shingle sets (mirrors TextFunctions.shingles k=5),
    * split into corpus (doc_id % 50 != 0) vs benchmark; inner join on the
    * shared gram, grouped per corpus doc.
    */
  private val decontaminateSql =
    s"WITH t AS (SELECT doc_id, unnest(list_distinct(" +
      "[array_to_string(list_slice(s, i, i + 4), ' ') for i in range(1, len(s) - 3)]" +
      s")) AS sh FROM (SELECT doc_id, $toks AS s FROM documents)), " +
      "c AS (SELECT * FROM t WHERE doc_id % 50 <> 0), " +
      "b AS (SELECT * FROM t WHERE doc_id % 50 = 0) " +
      "SELECT c.doc_id, CAST(count(DISTINCT c.sh) AS BIGINT) AS n_shared_shingles, " +
      "CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs " +
      "FROM c JOIN b ON c.sh = b.sh GROUP BY 1 " +
      "HAVING count(DISTINCT c.sh) >= 1 ORDER BY 1"

  /** Count-min oracle shared by x55 (batch-built sketch) and x61 (stream-
    * merged sketch — merge is exact, so one oracle gates both): a fully
    * independent CMS rebuild — every (row, bucket) cell recomputed by
    * grouping the token stream on the SAME md5 bucket function, the
    * estimate as the same min-over-rows — plus the same exact top-20.
    */
  private val cmsSql =
    s"""WITH t AS (SELECT unnest($toks) AS term FROM documents),
       |ex AS (SELECT term, count(*) AS n FROM t GROUP BY 1),
       |top AS (SELECT term, n FROM ex ORDER BY n DESC, term LIMIT 20),
       |cells AS (SELECT d.d,
       |    ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || term), 1, 8))::BIGINT % 512 AS b,
       |    count(*) AS c
       |  FROM t CROSS JOIN (SELECT unnest(range(0, 4)) AS d) d GROUP BY 1, 2),
       |est AS (SELECT top.term, top.n, min(c.c) AS est FROM top
       |  JOIN cells c ON c.b =
       |    ('0x' || substr(md5(CAST(c.d AS VARCHAR) || ':' || top.term), 1, 8))::BIGINT % 512
       |  GROUP BY 1, 2)
       |SELECT term, CAST(n AS BIGINT) AS n, CAST(est AS BIGINT) AS est
       |FROM est ORDER BY n DESC, term""".stripMargin.replace("\n", " ")

  /** Gaps-and-islands session CTE (30-min gap) shared by x21/x19. */
  private val sessionCte =
    "WITH e AS (SELECT user_id, ts, event_id, " +
      "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
      "f AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL " +
      "OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM e), " +
      // CAST: DuckDB's integer sum() returns HUGEINT (int128); the driver's
      // hash compare is type-sensitive, so match Spark's BIGINT exactly
      "g AS (SELECT user_id, ts, CAST(sum(new_sess) OVER (PARTITION BY user_id " +
      "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM f)"

  /** Shared lang-ID CASE over precomputed en/de/fr/es marker counts. */
  private val langCase =
    "CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und' " +
      "WHEN en = greatest(en, de, fr, es) THEN 'en' " +
      "WHEN de = greatest(en, de, fr, es) THEN 'de' " +
      "WHEN fr = greatest(en, de, fr, es) THEN 'fr' " +
      "WHEN es = greatest(en, de, fr, es) THEN 'es' ELSE 'und' END"

  /** (doc_id, lang, ts, text) CTE prefix used by the per-language oracles. */
  private val langCte =
    s"WITH m AS (SELECT doc_id, text, $toks AS ts FROM documents), " +
      s"s AS (SELECT doc_id, text, ts, ${markers("en")} AS en, ${markers("de")} AS de, " +
      s"${markers("fr")} AS fr, ${markers("es")} AS es FROM m), " +
      s"l AS (SELECT doc_id, text, ts, $langCase AS lang FROM s)"

  /** x262's shared recall read over a certification row (n_true, n_hit):
    * both engines compute the identical integer counts, so the one
    * division cannot drift.
    */
  private val RecallSql =
    "CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)"

  /** x255's shared Gini read over the (n_docs, sx, srx) row — the sorted
    * formula G = (2·Σ r·x − (n+1)·Σx)/(n·Σx) with the exact decimal
    * rank-weighted sum in the numerator.
    */
  private val GiniSql =
    "(2.0 * CAST(srx AS DOUBLE) - (CAST(n_docs AS DOUBLE) + 1.0) * " +
      "CAST(sx AS DOUBLE)) / (CAST(n_docs AS DOUBLE) * CAST(sx AS DOUBLE))"

  /** The x258 read over the stream-maintained (source, x, c) length
    * histogram: a block of c docs at length x occupies ranks
    * cb+1 .. cb+c (cb = docs at smaller lengths), so the Gini numerator
    * Σ r·x telescopes to Σ x·(c·cb + c(c+1)/2) — exact integers, no
    * sort of the rows, identical to x255's per-doc ranks (intra-block
    * order is irrelevant at constant x). The cumsum window runs over the
    * BOUNDED histogram cells, not rows. The rank-block term stays in
    * INTEGER arithmetic end-to-end (`DIV`, not `/` — Column./ is double
    * division and would degrade srx to a lossy, order-dependent double
    * sum past 2^53), then widens to decimal(38,0) before the multiply,
    * exactly like the batch x255's rank-weighted sum that gates this
    * bit-for-bit. (c·(c+1) DIV 2 is long-exact up to c ≈ 4.3e9 docs per
    * (source, length) cell — far past any real histogram cell.)
    */
  private[graft] def giniOverLengthHist(cells: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    cells.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("c") * col("x")).as("sx"),
        sum(col("x").cast("decimal(38,0)") *
          (col("c").cast("decimal(38,0)") * col("cb") +
            expr("c * (c + 1) DIV 2").cast("decimal(38,0)"))).as("srx"))
      .select(col("source"), col("n_docs"), col("sx").as("tokens_total"),
        graft.functions.EngineMath.roundAway(expr(GiniSql), 6).as("gini"))
      .orderBy(col("source"))
  }

  /** x264's shared estimate strings over the exact moment row
    * (n, n_treated, sy_t, sy_c, sw_t, sw_c, swn_t, swn_c): naive =
    * treated mean − control mean; IPW = Hájek self-normalized contrast
    * Σ T·y·w / Σ T·w − Σ(1−T)·y·w / Σ(1−T)·w with the known design
    * weights, in micro-units until the two ratio reads.
    */
  private val IpwNaiveSql =
    "(CAST(sy_t AS DOUBLE) / n_treated - CAST(sy_c AS DOUBLE) " +
      "/ (n - n_treated)) / 1e6"
  private val IpwAteSql =
    "(CAST(sw_t AS DOUBLE) / CAST(swn_t AS DOUBLE) - " +
      "CAST(sw_c AS DOUBLE) / CAST(swn_c AS DOUBLE)) / 1e6"

  /** x265's shared dispersion read over (n_days, n_events, sc2):
    * D = var/mean with the two-pass-free exact variance
    * (nd·Σc² − (Σc)²) / (nd·(nd−1)) over integer daily counts.
    */
  private val DispersionSql =
    "((CAST(n_days AS DOUBLE) * CAST(sc2 AS DOUBLE) - " +
      "CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) / " +
      "(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))) / " +
      "(CAST(n_events AS DOUBLE) / n_days)"

  /** x261's shared RBF h-term tick over the eight dot columns of one
    * paired 4-tuple (x1,x2,y1,y2): k(a,b) = exp(−‖a−b‖²/2σ²) at σ² = 64
    * (components ∈ [−1,1), d = 64 ⇒ E‖a−b‖² ≈ 43, so the kernel sits on
    * its sensitive slope), h = k(x1,x2)+k(y1,y2)−k(x1,y2)−k(x2,y1).
    */
  private val MmdTickSql =
    "CAST(floor((exp(-(n11 + n22 - 2.0 * dxx) / 128.0) " +
      "+ exp(-(m11 + m22 - 2.0 * dyy) / 128.0) " +
      "- exp(-(n11 + m22 - 2.0 * dxy) / 128.0) " +
      "- exp(-(n22 + m11 - 2.0 * dyx) / 128.0)) * 1e9 + 0.5) AS BIGINT)"

  /** x259's read over a class row (n, nt, sad): t = Σ|cum diffs| /
    * (n·N·(m−1)) with m = 16 ordered sensitive values — the standard
    * ordered-domain EMD normalization.
    */
  private val TClosenessSql =
    "CAST(sad AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(nt AS DOUBLE) * 15.0)"

  /** x260's shared A-ES key over a 32-bit ticket `ut` and weight `w`:
    * u = (ut+1)/2³² ∈ (0,1], key = ln(u)/w — u^(1/w) ordering in the
    * numerically-stable log domain.
    */
  private val ReservoirKeySql =
    "ln((CAST(ut AS DOUBLE) + 1.0) / 4294967296.0) / CAST(w AS DOUBLE)"

  /** The x254/x263 shared DP release over a per-source count frame
    * (source, n): explode the two budgets, draw the Laplace noise from
    * the md5 ticket under `ticketSalt`, round. ONE definition for the
    * batch scan and the streaming drain — the released numbers cannot
    * drift between the two engine halves (the x176/x177 decomposition
    * contract applied to a privacy mechanism).
    *
    * PRIVACY CAVEAT (the ε guarantee is conditional on the salt): the
    * noise is a deterministic function of (ticketSalt, source, budget).
    * An adversary who KNOWS the salt can re-derive every draw and strip
    * the noise, voiding ε entirely — determinism is a VERIFICATION
    * device, not part of the mechanism. The gated queries pass the
    * fixed literal "dp1" precisely so the oracle can re-derive the
    * identical draw and the hash match proves the exact noise the
    * budget promises was applied; a production deployment MUST pass a
    * salt drawn from a secret high-entropy source (and rotate it per
    * release), at which point the md5-ticket uniform is
    * computationally indistinguishable from fresh randomness and the
    * standard Laplace(Δf/ε) analysis applies.
    */
  private[graft] def dpCountRelease(counts: DataFrame,
      ticketSalt: String): DataFrame = {
    val eps = array(
      struct(lit("e01").as("lab"), lit(0.1).as("eps")),
      struct(lit("e10").as("lab"), lit(1.0).as("eps")))
    counts
      .select(col("source"), col("n"), explode(eps).as("e"))
      .select(col("source"), col("e.lab").as("lab"),
        col("e.eps").as("eps"), col("n"))
      .withColumn("ut", conv(substring(md5(concat(lit(ticketSalt + ":"),
        col("source"), lit(":"), col("lab"))), 1, 8), 16, 10)
        .cast("long"))
      .select(col("source"), col("eps"),
        graft.functions.EngineMath.roundAway(
          expr(s"CAST(n AS DOUBLE) + ($DpNoiseSql)"), 6).as("n_noised"))
      .orderBy(col("source"), col("eps"))
  }

  /** x254's shared Laplace(1/ε) inverse-CDF draw over a 32-bit md5
    * ticket `ut` and budget `eps`: u = ut/2³², noise =
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|). One string, both engines — the
    * deterministic draw is what makes the DP release hash-gateable.
    */
  private val DpNoiseSql =
    "-(1.0 / eps) * (CASE WHEN ut >= 2147483648 THEN 1.0 ELSE -1.0 END) * " +
      "ln(1.0 - 2.0 * abs(CAST(ut AS DOUBLE) / 4294967296.0 - 0.5))"

  def oracleSql: Map[String, String] = Map(
    "x24_clean_text" ->
      (raw"WITH c AS (SELECT doc_id, trim(regexp_replace(regexp_replace(" +
        raw"regexp_replace(text, '<[^>]*>', ' ', 'g'), " +
        raw"'[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), '\s+', ' ', 'g')) AS t " +
        "FROM documents) " +
        "SELECT doc_id, len(t) AS clean_len, " +
        raw"len(list_filter(string_split_regex(trim(t), '\s+'), s -> len(s) > 0)) AS clean_tokens " +
        "FROM c ORDER BY doc_id"),
    "x25_quantize" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings), " +
        "s AS (SELECT vec_id, vec, list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale FROM v), " +
        "d AS (SELECT vec_id, vec, scale, list_transform(vec, x -> " +
        "greatest(-127.0, least(127.0, floor(x / scale + 0.5))) * scale) AS dq FROM s) " +
        "SELECT vec_id, round(scale, 6) AS scale, " +
        "round(list_dot_product(vec, dq) / (sqrt(list_dot_product(vec, vec)) * " +
        "sqrt(list_dot_product(dq, dq))), 4) AS cos_fidelity " +
        "FROM d ORDER BY vec_id"),
    "x16_quality_quantiles" ->
      (s"$langCte, c AS (SELECT lang, len(ts) AS n, " +
        s"CAST(${markers("en")} AS DOUBLE) AS mk, " +
        raw"CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / len(text) AS punct, " +
        "CAST(list_sum(list_transform(ts, t -> len(t))) AS DOUBLE) / len(ts) AS mtl FROM l), " +
        "q AS (SELECT lang, floor((least(mk / n * 4, 1.0) * 0.3 + " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) * 0.3 + (1.0 - punct) * 0.2 + " +
        "(CASE WHEN mtl BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2) " +
        "* 10000 + 0.5) / 10000 AS qv FROM c) " +
        "SELECT lang, count(*) AS n, round(quantile_cont(qv, 0.25), 4) AS q25, " +
        "round(quantile_cont(qv, 0.50), 4) AS q50, " +
        "round(quantile_cont(qv, 0.75), 4) AS q75 " +
        "FROM q GROUP BY 1 ORDER BY 1"),
    "x17_top_tokens" ->
      (s"$langCte, t AS (SELECT lang, unnest(ts) AS tok FROM l), " +
        "f AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY 1, 2), " +
        "r AS (SELECT lang, tok, n, row_number() OVER " +
        "(PARTITION BY lang ORDER BY n DESC, tok) AS rank FROM f) " +
        "SELECT lang, tok, n, rank FROM r WHERE rank <= 5 ORDER BY lang, rank"),
    "x01_token_count" ->
      (s"SELECT doc_id, len($toks) AS n_tokens, " +
        raw"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_pieces " +
        "FROM documents ORDER BY doc_id"),
    "x02_lang_id" ->
      (s"WITH m AS (SELECT doc_id, $toks AS ts FROM documents), " +
        s"s AS (SELECT doc_id, ${markers("en")} AS en, ${markers("de")} AS de, " +
        s"${markers("fr")} AS fr, ${markers("es")} AS es FROM m) " +
        "SELECT CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und' " +
        "WHEN en = greatest(en, de, fr, es) THEN 'en' " +
        "WHEN de = greatest(en, de, fr, es) THEN 'de' " +
        "WHEN fr = greatest(en, de, fr, es) THEN 'fr' " +
        "WHEN es = greatest(en, de, fr, es) THEN 'es' ELSE 'und' END AS lang_guess, " +
        "count(*) AS n FROM s GROUP BY 1 ORDER BY 1"),
    "x03_quality" ->
      (s"$qualityCtes " +
        "SELECT doc_id, round(mk / n, 4) AS stop_ratio, round(punct, 4) AS punct_ratio, " +
        s"round(mtl, 4) AS mean_tok_len, $qualityExprSql AS quality " +
        "FROM c ORDER BY doc_id"),
    "x04_fingerprint" ->
      (s"SELECT doc_id, md5(lower(array_to_string($toks, ' '))) AS fingerprint " +
        "FROM documents ORDER BY doc_id"),
    "x05_dedup_exact" ->
      (s"SELECT md5(lower(array_to_string($toks, ' '))) AS fingerprint, " +
        "min(doc_id) AS keep_id, count(*) AS n_dups FROM documents " +
        "GROUP BY 1 ORDER BY 1"),
    "x06_jaccard_pairs" -> jaccardCte,
    "x07_minhash_pairs" -> jaccardCte, // LSH must find the same pairs (see above)
    "x92_ppjoin_pairs" -> jaccardCte,  // prefix filter is LOSSLESS — same truth
    // every hop unrolled: same rank-ordered adjacency, same md5 draw
    // ('0x'||substr(md5('rw:'||id||':'||step),1,8) % deg + 1) — paths
    // string-identical
    "x97_random_walks" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS d FROM und GROUP BY src), " +
          "adj AS MATERIALIZED (SELECT src, dst, row_number() OVER " +
          "(PARTITION BY src ORDER BY dst) AS r FROM und), " +
          "w0 AS (SELECT src AS walk_id, src AS cur, " +
          "CAST(src AS VARCHAR) AS path FROM deg)"
      def hop(i: Int) =
        s"w$i AS (SELECT w.walk_id, a.dst AS cur, " +
          "w.path || '>' || CAST(a.dst AS VARCHAR) AS path " +
          s"FROM w${i - 1} w JOIN deg ON deg.src = w.cur " +
          "JOIN adj a ON a.src = w.cur AND a.r = " +
          s"('0x' || substr(md5('rw:' || CAST(w.walk_id AS VARCHAR) || ':$i'), 1, 8))::BIGINT " +
          "% deg.d + 1)"
      head + ", " + (1 to 4).map(hop).mkString(", ") +
        " SELECT walk_id, cur AS end_node, path FROM w4 ORDER BY walk_id"
    },
    // the naive global rank over the same md5-ticket order — the exact
    // truth the bucketed two-level rank must reproduce; `div`/`%` are
    // integer on both engines (DuckDB `//`)
    "x98_epoch_shards" ->
      ("WITH r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY " +
        "md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) " +
        "AS epoch_rank FROM documents) " +
        "SELECT doc_id, epoch_rank, epoch_rank // 100 AS shard, " +
        "epoch_rank % 100 AS pos FROM r ORDER BY epoch_rank"),
    // same quality expression (the x03 CTEs), same integer band
    // quantization, then the naive global rank over (band DESC, ticket)
    "x100_curriculum_shards" ->
      (s"$qualityCtes, q AS (SELECT doc_id, $qualityExprSql AS q FROM c), " +
        "b AS (SELECT doc_id, least(9, CAST(floor(q * 10000 + 0.5) AS BIGINT) " +
        "// 1000) AS band FROM q), " +
        "r AS (SELECT doc_id, band, CAST(row_number() OVER (ORDER BY band DESC, " +
        "md5('cu1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) " +
        "AS epoch_rank FROM b) " +
        "SELECT doc_id, band, epoch_rank, epoch_rank // 100 AS shard, " +
        "epoch_rank % 100 AS pos FROM r ORDER BY epoch_rank"),
    // same 48-bit md5 arithmetic ('0x…'::BIGINT ≡ Spark conv(hex,16,10)),
    // same mod-(N−1)-shift exclusion, same join-back
    "x106_negative_sampling" ->
      ("WITH d AS (SELECT doc_id, source FROM documents), " +
        "nn AS (SELECT count(*) AS n FROM d), " +
        "s AS (SELECT doc_id, source AS pos_source, " +
        "CAST(unnest(range(4)) AS BIGINT) AS slot FROM d), " +
        "h AS (SELECT doc_id, pos_source, slot, " +
        "('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR) || ':' || " +
        "CAST(slot AS VARCHAR)), 1, 12))::BIGINT AS hv FROM s), " +
        "x AS (SELECT doc_id, pos_source, slot, " +
        "CASE WHEN hv % (nn.n - 1) >= doc_id THEN hv % (nn.n - 1) + 1 " +
        "ELSE hv % (nn.n - 1) END AS neg_id FROM h, nn) " +
        "SELECT x.doc_id, x.slot, x.neg_id, d.source AS neg_source, " +
        "(d.source = x.pos_source) AS same_source " +
        "FROM x JOIN d ON d.doc_id = x.neg_id ORDER BY x.doc_id, x.slot"),
    // same RANGE frame (SQL-standard peer semantics), same micro-
    // quantized integer sum
    "x105_trailing_window" ->
      ("WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS us, " +
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events) " +
        "SELECT event_id, user_id, us, " +
        "CAST(count(*) OVER w AS BIGINT) AS n_1h, " +
        "round(CAST(sum(vm) OVER w AS DOUBLE) / 1e6, 6) AS v_1h " +
        "FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    // same md5-threshold span starts, same 3-token merge-by-predicate,
    // same sentinel collapse — re-derived with 1-based list indexing
    "x104_span_corruption" ->
      (s"""WITH t AS (SELECT doc_id, $toks AS ts FROM documents),
         |b AS (SELECT doc_id, ts, len(ts) AS n,
         |    [md5('sc:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) < '0c'
         |      for j in range(len(ts))] AS st FROM t),
         |m AS (SELECT doc_id, ts, n,
         |    [st[j+1] OR (j >= 1 AND st[j]) OR (j >= 2 AND st[j-1])
         |      for j in range(n)] AS mk FROM b)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(len([1 for j in range(n) IF mk[j+1] AND NOT (j >= 1 AND mk[j])]) AS BIGINT) AS n_spans,
         |  CAST(len(list_filter(mk, x -> x)) AS BIGINT) AS n_masked,
         |  CASE WHEN n > 0 THEN round(CAST(len(list_filter(mk, x -> x)) AS DOUBLE) / n, 6)
         |    ELSE 0.0 END AS masked_frac,
         |  md5(array_to_string(list_filter(
         |    [CASE WHEN NOT mk[j+1] THEN ts[j+1]
         |      WHEN j >= 1 AND mk[j] THEN NULL ELSE '<x>' END for j in range(n)],
         |    x -> x IS NOT NULL), ' ')) AS corrupted_fp
         |FROM m ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // same md5 ticket, same within-source shuffle; the naive global
    // row_number over (src_rank, source) is the gate for the engine's
    // closed-form position
    "x103_source_interleave" ->
      ("WITH t AS (SELECT doc_id, source, " +
        "md5('il1:' || CAST(doc_id AS VARCHAR)) AS tk FROM documents), " +
        "r AS (SELECT doc_id, source, " +
        "row_number() OVER (PARTITION BY source ORDER BY tk, doc_id) - 1 AS src_rank " +
        "FROM t) " +
        "SELECT doc_id, source, src_rank, " +
        "row_number() OVER (ORDER BY src_rank, source) - 1 AS pos " +
        "FROM r ORDER BY pos"),
    // same epoch-micros arithmetic (unix_micros ≡ epoch_us under the UTC
    // session), same micro-quantization of weight AND value; the sums are
    // integer-exact on both engines (DuckDB BIGINT sums ride HUGEINT), so
    // the double conversion + division round identically — no ordered fold
    "x101_decayed_activity" ->
      ("WITH t AS (SELECT user_id, value, epoch_us(ts) AS us " +
        "FROM events), m AS (SELECT max(us) AS tmax FROM t), " +
        "w AS (SELECT user_id, " +
        "CAST(floor(exp(-((tmax - us) / 86400000000.0) / 7.0) * 1e6 + 0.5) AS BIGINT) AS wm, " +
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM t, m) " +
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, " +
        "round(CAST(sum(wm) AS DOUBLE) / 1e6, 6) AS decayed_n, " +
        "round(CAST(sum(vm * wm) AS DOUBLE) / 1e12, 6) AS decayed_value " +
        "FROM w GROUP BY user_id ORDER BY user_id"),
    // same ordered-alternation pattern string (built from the one shared
    // vocab constant), same leftmost-first semantics in RE2
    "x99_vocab_encode" ->
      (s"SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(lower(text), '$SubwordPattern')) " +
        "AS BIGINT) AS n_pieces, " +
        s"CAST(len(list_filter(regexp_extract_all(lower(text), " +
        s"'$SubwordPattern'), p -> strlen(p) > 1)) AS BIGINT) AS n_multi, " +
        "CAST(strlen(regexp_replace(lower(text), '[^a-z]', '', 'g')) " +
        "AS BIGINT) AS n_alpha FROM documents ORDER BY doc_id"),
    // batch join+aggregate the Complete-mode streaming drain equals
    "x93_stream_enrich" ->
      ("SELECT c.c_mktsegment, e.event_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM events e JOIN customer c ON e.user_id = c.c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    // quantile_cont ≡ Spark percentile (the x16 equivalence); identical
    // clip expression and rounding
    "x94_winsorize" ->
      ("WITH b AS (SELECT lang, quantile_cont(n_chars, 0.05) AS lo, " +
        "quantile_cont(n_chars, 0.95) AS hi FROM documents GROUP BY lang) " +
        "SELECT d.doc_id, d.lang, d.n_chars, " +
        "round(least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 4) AS clipped " +
        "FROM documents d JOIN b USING (lang) ORDER BY d.doc_id"),
    // identical micro-quantization, integer sums, fixed-order division
    "x95_target_encode" ->
      ("WITH ev AS (SELECT event_id, event_type, " +
        "CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events), " +
        "a AS (SELECT event_type, CAST(sum(vm) AS BIGINT) AS s, " +
        "CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1) " +
        "SELECT ev.event_id, ev.event_type, " +
        "round(CAST(a.s - ev.vm AS DOUBLE) / 1e6 / CAST(a.n - 1 AS DOUBLE), 6) AS loo_mean " +
        "FROM ev JOIN a USING (event_type) WHERE a.n > 1 ORDER BY ev.event_id"),
    // identical token counts; the entropy terms fold in token-sorted
    // order on both engines (the x59 ordered-fold device)
    "x96_token_entropy" ->
      (s"""WITH tc AS (SELECT doc_id, t, count(*) AS c
         |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents) GROUP BY 1, 2),
         |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, list(c ORDER BY t) AS cs
         |  FROM tc GROUP BY doc_id)
         |SELECT doc_id, n AS n_tokens,
         |  round(list_reduce(list_prepend(0.0,
         |    [-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) for c in cs]),
         |    (x, y) -> x + y), 6) AS entropy
         |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x14_dedup_groups" ->
      (s"""WITH RECURSIVE pr AS ($jaccardCte),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         |SELECT component, min(id) AS keep_id, count(*) AS n_members
         |FROM comp GROUP BY component ORDER BY component""".stripMargin
        .replace("\n", " ")),
    "x09_embed_pairs" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings) " +
        "SELECT id_a, id_b, round(cos, 4) AS cos FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "list_dot_product(a.vec, b.vec) / (sqrt(list_dot_product(a.vec, a.vec)) * " +
        "sqrt(list_dot_product(b.vec, b.vec))) AS cos " +
        "FROM v a JOIN v b ON a.vec_id < b.vec_id) WHERE cos >= 0.45 " +
        "ORDER BY id_a, id_b"),
    "x12_multimodal_decode" ->
      ("SELECT doc_id AS media_id, " +
        "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' " +
        "ELSE 'webm' END AS format, " +
        "CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width, " +
        "CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height, " +
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS INTEGER) AS channels, " +
        "octet_length(encode(text)) AS n_bytes " +
        "FROM documents ORDER BY media_id"),
    "x20_stream_tumbling" ->
      ("SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, " +
        "count(*) AS n, round(sum(value), 2) AS value_sum " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "x18_asof_join" ->
      ("WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'), " +
        "p0 AS (SELECT user_id, ts, value, row_number() OVER " +
        "(PARTITION BY user_id, ts ORDER BY value DESC) AS rn " +
        "FROM events WHERE event_type = 'purchase'), " +
        "p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1) " +
        "SELECT c.user_id, c.event_id, c.ts, p.ts AS purchase_ts, " +
        "round(p.value, 2) AS purchase_value " +
        "FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts " +
        "ORDER BY c.user_id, c.event_id"),
    "x23_incremental_cube" ->
      ("SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS value_sum FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "x21_sessionize_batch" ->
      (s"$sessionCte " +
        "SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end, " +
        "count(*) AS n_events FROM g GROUP BY 1, 2 ORDER BY 1, 2"),
    // streaming emits CLOSED sessions: every batch session except each
    // user's open tail (the last session, which no later event closes)
    "x22_stream_sessionize" ->
      (s"$sessionCte, s AS (SELECT user_id, session_seq, min(ts) AS session_start, " +
        "max(ts) AS session_end, count(*) AS n_events FROM g GROUP BY 1, 2) " +
        "SELECT user_id, session_seq, session_start, session_end, n_events FROM s " +
        "WHERE session_seq < (SELECT max(session_seq) FROM s s2 WHERE s2.user_id = s.user_id) " +
        "ORDER BY user_id, session_seq"),
    "x19_range_join" ->
      (s"$sessionCte, s AS (SELECT user_id, session_seq, min(ts) AS session_start, " +
        "max(ts) AS session_end FROM g GROUP BY 1, 2) " +
        "SELECT ev.user_id, s.session_seq, count(*) AS n_events " +
        "FROM events ev JOIN s ON ev.user_id = s.user_id " +
        "AND ev.ts BETWEEN s.session_start AND s.session_end " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "x10_knn_brute" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings) " +
        "SELECT query_id, rank, item_id, round(cos, 4) AS cos FROM (" +
        s"SELECT query_id, item_id, $cosSql AS cos, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank " +
        "FROM i CROSS JOIN q WHERE item_id != query_id) " +
        "WHERE rank <= 10 ORDER BY query_id, rank"),
    "x27_stratified_sample" -> x27Sql,
    "x53_corpus_drift" ->
      // identical smoothed-KL derivation; contributions folded in the
      // same binary term order
      (s"""WITH ta AS (SELECT unnest($toks) AS term FROM documents WHERE doc_id % 2 = 0),
         |tb AS (SELECT unnest($toks) AS term FROM documents WHERE doc_id % 2 = 1),
         |ca AS (SELECT term, count(*) AS c FROM ta GROUP BY 1),
         |cb AS (SELECT term, count(*) AS c FROM tb GROUP BY 1),
         |j AS (SELECT coalesce(ca.term, cb.term) AS term,
         |    coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
         |  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb FROM j),
         |c AS (SELECT term,
         |    ((ca + 1.0) / CAST(t.na + t.v AS DOUBLE)) *
         |    ln(((ca + 1.0) / CAST(t.na + t.v AS DOUBLE)) /
         |       ((cb + 1.0) / CAST(t.nb + t.v AS DOUBLE))) AS contrib
         |  FROM j CROSS JOIN t),
         |a AS (SELECT list(contrib ORDER BY term) AS cs FROM c)
         |SELECT (SELECT v FROM t) AS vocab_size, (SELECT na FROM t) AS n_ref,
         |  (SELECT nb FROM t) AS n_new,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6) AS kl_ref_new
         |FROM a""".stripMargin.replace("\n", " ")),
    "x50_unigram_logprob" ->
      // identical two-pass derivation: corpus counts, floor-at-minCount
      // probs, per-doc log-probs folded in TOKEN order (list(lp ORDER BY
      // pos) + list_reduce ≡ Spark's sort_array + aggregate: the same
      // IEEE adds in the same sequence)
      (s"""WITH t AS (SELECT doc_id, unnest($toks) AS term,
         |    generate_subscripts($toks, 1) AS pos FROM documents),
         |c AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
         |v AS (SELECT term, c FROM c WHERE c >= 3),
         |s AS (SELECT t.doc_id, t.pos,
         |    ln(CAST(coalesce(v.c, 3) AS DOUBLE) / (SELECT n FROM n)) AS lp
         |  FROM t LEFT JOIN v USING (term)),
         |a AS (SELECT doc_id, list(lp ORDER BY pos) AS lps FROM s GROUP BY 1)
         |SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
         |  round(list_reduce(list_prepend(0.0, lps), (x, y) -> x + y) / len(lps), 4) AS lm_score
         |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x54_semantic_pairs" ->
      // within-cluster pairs + exact cosine re-derived from the STAGED
      // assignment table (the k-means half is engine-specific; everything
      // after it is relational algebra + the x09-portable dot product)
      (s"""WITH asg AS (SELECT id, centroid_id FROM ${Stage.sqlRef("x54_assign")}),
         |v AS (SELECT a.centroid_id, e.vec_id AS id, e.embedding::DOUBLE[] AS vec
         |  FROM embeddings e JOIN asg a ON a.id = e.vec_id),
         |p AS (SELECT a.centroid_id, a.id AS id_a, b.id AS id_b,
         |  list_dot_product(a.vec, b.vec) / (sqrt(list_dot_product(a.vec, a.vec)) *
         |    sqrt(list_dot_product(b.vec, b.vec))) AS cos
         |  FROM v a JOIN v b ON a.centroid_id = b.centroid_id AND a.id < b.id)
         |SELECT centroid_id, id_a, id_b, round(cos, 4) AS cos FROM p
         |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    "x55_cms_heavy_hitters" -> cmsSql,
    // x61 reads the SAME estimates from the STREAM-merged sketch — CMS
    // merge is exact, so the one-shot-build oracle is the gate
    "x61_stream_cms" -> cmsSql,
    "x57_cdc_chunk" ->
      // every boundary re-derived from the same md5 window ticket; chunks
      // re-assembled by lock-step unnest of the starts/ends lists
      (s"""WITH m AS (SELECT doc_id, $toks AS s FROM documents WHERE len($toks) > 0),
         |c AS (SELECT doc_id, s, [i for i in range(3, len(s))
         |    if ('0x' || substr(md5(array_to_string(list_slice(s, i - 2, i), ' ')), 1, 8))::BIGINT % 16 = 0] AS cuts
         |  FROM m),
         |h AS (SELECT doc_id, s, list_prepend(1, [c + 1 for c in cuts]) AS starts,
         |    list_append(cuts, len(s)) AS ends FROM c),
         |e AS (SELECT doc_id, s, unnest(starts) AS st, unnest(ends) AS en,
         |    generate_subscripts(starts, 1) AS ci FROM h)
         |SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx,
         |  CAST(en - st + 1 AS BIGINT) AS n_tokens,
         |  md5(array_to_string(list_slice(s, st, en), ' ')) AS chunk_hash
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " ")),
    "x64_hashed_tf" ->
      // identical md5 bucket (CountMin row 0), dense rebuild by list
      // comprehension, L2 norm via the same sequential dot product;
      // exploded to (doc_id, dim_idx, weight) triples to match the engine
      (s"""WITH m AS (SELECT doc_id, $toks AS ts FROM documents WHERE len($toks) > 0),
         |b AS (SELECT doc_id,
         |    [('0x' || substr(md5('0:' || t), 1, 8))::BIGINT % 64 for t in ts] AS bs FROM m),
         |c AS (SELECT doc_id,
         |    [CAST(len(list_filter(bs, x -> x = i)) AS DOUBLE) for i in range(0, 64)] AS cs FROM b),
         |v AS (SELECT doc_id,
         |    [round(x / sqrt(list_dot_product(cs, cs)), 6) for x in cs] AS vec FROM c)
         |SELECT doc_id, CAST(generate_subscripts(vec, 1) - 1 AS BIGINT) AS dim_idx,
         |  unnest(vec) AS weight
         |FROM v ORDER BY doc_id, dim_idx""".stripMargin.replace("\n", " ")),
    "x62_source_dup_matrix" ->
      // matrix re-derived from the STAGED banded pairs + the documents
      // table (the MinHash half is engine-specific; the join + canonical
      // pair aggregation is relational)
      (s"""WITH pr AS (SELECT id_a, id_b FROM ${Stage.sqlRef("x62_pairs")}),
         |j AS (SELECT least(a.source, b.source) AS source_x,
         |    greatest(a.source, b.source) AS source_y
         |  FROM pr JOIN documents a ON a.doc_id = pr.id_a
         |  JOIN documents b ON b.doc_id = pr.id_b)
         |SELECT source_x, source_y, count(*) AS n_dup_pairs FROM j
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")),
    "x63_quality_deciles" ->
      // same quality derivation as x03 (SHARED qualityCtes/qualityExprSql,
      // so the two oracles cannot drift), same (score, doc_id) ntile
      // order — DuckDB's ntile uses the standard equal-buckets-first-
      // remainder rule, identical to Spark's
      (s"$qualityCtes, " +
        s"g AS (SELECT doc_id, n, $qualityExprSql AS q FROM c), " +
        "d AS (SELECT doc_id, n, q, ntile(10) OVER (ORDER BY q, doc_id) AS decile FROM g) " +
        "SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs, " +
        "min(q) AS q_lo, max(q) AS q_hi, CAST(sum(n) AS BIGINT) AS tokens_total " +
        "FROM d GROUP BY 1 ORDER BY 1"),
    "x60_repeated_spans" ->
      // identical positional 8-gram derivation; corpus totals joined back
      // (the relational twin of the engine's gram-window sum)
      (s"""WITH m AS (SELECT doc_id, $toks AS s FROM documents WHERE len($toks) >= 8),
         |g AS (SELECT doc_id, unnest([array_to_string(list_slice(s, i, i + 7), ' ')
         |    for i in range(1, len(s) - 6)]) AS gram FROM m),
         |pd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         |t AS (SELECT gram, CAST(sum(c) AS BIGINT) AS tot FROM pd GROUP BY 1),
         |a AS (SELECT pd.doc_id, CAST(sum(pd.c) AS BIGINT) AS n_spans,
         |    CAST(sum(CASE WHEN t.tot >= 2 THEN pd.c ELSE 0 END) AS BIGINT) AS n_repeated
         |  FROM pd JOIN t USING (gram) GROUP BY 1)
         |SELECT doc_id, n_spans, n_repeated,
         |  round(CAST(n_repeated AS DOUBLE) / n_spans, 4) AS repeated_frac
         |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x65_curation_pipeline" ->
      // the composed pipeline re-derived stage for stage: shared quality
      // CTEs, x05's fingerprint dedup, x40's shingle flag, x58's quota
      // arithmetic — one oracle gates the composition end to end
      (s"""$qualityCtes,
         |s0 AS (SELECT c.doc_id, CAST(c.n AS BIGINT) AS n_tokens, $qualityExprSql AS q FROM c),
         |sc AS (SELECT s0.doc_id, d.source, d.text, s0.n_tokens, s0.q
         |  FROM s0 JOIN documents d USING (doc_id) WHERE s0.q >= 0.55),
         |dd AS (SELECT min(doc_id) AS doc_id FROM sc
         |  GROUP BY md5(lower(array_to_string($toks, ' ')))),
         |corp AS (SELECT sc.* FROM sc JOIN dd USING (doc_id) WHERE sc.doc_id % 50 <> 0),
         |tt AS (SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(list_slice(s, i, i + 4), ' ') for i in range(1, len(s) - 3)])) AS sh
         |  FROM (SELECT doc_id, $toks AS s FROM documents)),
         |flag AS (SELECT DISTINCT tt.doc_id FROM tt
         |  JOIN (SELECT sh FROM tt WHERE doc_id % 50 = 0) b USING (sh)
         |  WHERE tt.doc_id IN (SELECT doc_id FROM corp)),
         |clean AS (SELECT * FROM corp WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
         |cn AS (SELECT source, count(*) AS n_domain FROM clean GROUP BY 1),
         |zl AS (SELECT list(pow(CAST(n_domain AS DOUBLE), 0.5) ORDER BY source) AS ws FROM cn),
         |z AS (SELECT list_reduce(list_prepend(0.0, ws), (x, y) -> x + y) AS z FROM zl),
         |qt AS (SELECT source, n_domain, least(n_domain,
         |    CAST(floor(100.0 * pow(CAST(n_domain AS DOUBLE), 0.5) / (SELECT z FROM z)) AS BIGINT)) AS quota
         |  FROM cn),
         |r AS (SELECT doc_id, source, n_tokens, q, row_number() OVER (PARTITION BY source
         |    ORDER BY substr(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS domain_rank
         |  FROM clean)
         |SELECT r.source, r.doc_id, r.n_tokens, r.q, qt.n_domain, qt.quota,
         |  CAST(r.domain_rank AS BIGINT) AS domain_rank
         |FROM r JOIN qt USING (source) WHERE domain_rank <= qt.quota
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x67_stream_index" ->
      // the stream-maintained index must equal the staged one-shot batch
      // build exactly (same models, same items, pure per-item functions)
      (s"""SELECT id AS vec_id, centroid_id, sub, code
         |FROM ${Stage.sqlRef("x67_batch_index")}
         |ORDER BY vec_id, sub""".stripMargin.replace("\n", " ")),
    "x66_line_dedup" ->
      // same 12-token line windows, md5 line hashes, >1-distinct-doc
      // boilerplate rule, and ordered reassembly (string_agg ORDER BY ↔
      // sort_array(collect_list)); fully-boilerplate docs keep their row
      // with n_kept 0 and the hash of the empty string
      (s"""WITH m AS (SELECT doc_id, $toks AS ts FROM documents WHERE len($toks) > 0),
         |l AS (SELECT doc_id, unnest(range(CAST(ceil(len(ts) / 12.0) AS BIGINT))) AS line_idx, ts FROM m),
         |t AS (SELECT doc_id, line_idx,
         |    array_to_string(list_slice(ts, line_idx * 12 + 1, line_idx * 12 + 12), ' ') AS line_txt
         |  FROM l),
         |h AS (SELECT doc_id, line_idx, line_txt, md5(line_txt) AS lh FROM t),
         |b AS (SELECT lh FROM h GROUP BY lh HAVING count(DISTINCT doc_id) > 1),
         |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    md5(string_agg(line_txt, ' ' ORDER BY line_idx)) AS clean_hash
         |  FROM h WHERE lh NOT IN (SELECT lh FROM b) GROUP BY doc_id),
         |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM h GROUP BY doc_id)
         |SELECT n.doc_id, n.n_lines, coalesce(k.n_kept, 0) AS n_kept,
         |  coalesce(k.clean_hash, md5('')) AS clean_hash
         |FROM n LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x69_image_dhash" ->
      // full independent re-derivation of the PRODUCTION (wide 120-bit)
      // pipeline: 132-cell (i*len)//132 nearest-lower byte sampling (the
      // blob is the text's UTF-8 bytes — ASCII, so ord(char) IS the
      // byte), 10 gradient bits per row × 12 rows, rows 0-5 folded
      // MSB-first into hi / rows 6-11 into lo, exact summed hamming over
      // all pairs (the banding is an engine optimization; the pair SET
      // is the contract)
      (s"""WITH m AS (SELECT doc_id AS id, text FROM documents WHERE len(text) > 0),
         |px AS (SELECT id,
         |    [ord(substr(text, CAST((i * len(text)) // 132 AS INT) + 1, 1)) for i in range(132)] AS p
         |  FROM m),
         |bits AS (SELECT id,
         |    flatten([[CASE WHEN p[r * 11 + c + 1] > p[r * 11 + c + 2] THEN 1 ELSE 0 END
         |      for c in range(10)] for r in range(6)]) AS bhi,
         |    flatten([[CASE WHEN p[r * 11 + c + 1] > p[r * 11 + c + 2] THEN 1 ELSE 0 END
         |      for c in range(10)] for r in range(6, 12)]) AS blo FROM px),
         |h AS (SELECT id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), bhi), (a, b) -> a * 2 + b) AS shi,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), blo), (a, b) -> a * 2 + b) AS slo
         |  FROM bits),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(bit_count(xor(a.shi, b.shi)) + bit_count(xor(a.slo, b.slo)) AS BIGINT) AS hamming
         |  FROM h a JOIN h b ON a.id < b.id)
         |SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 14
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    "x79_image_dhash_wide" ->
      // the 120-bit variant: 132-cell byte grid (same (i*len)//132
      // nearest-lower sampling), 10 gradient bits per row x 12 rows,
      // rows 0-5 fold MSB-first into hi, rows 6-11 into lo; exact
      // summed hamming over all pairs
      (s"""WITH m AS (SELECT doc_id AS id, text FROM documents WHERE len(text) > 0),
         |px AS (SELECT id,
         |    [ord(substr(text, CAST((i * len(text)) // 132 AS INT) + 1, 1)) for i in range(132)] AS p
         |  FROM m),
         |bits AS (SELECT id,
         |    flatten([[CASE WHEN p[r * 11 + c + 1] > p[r * 11 + c + 2] THEN 1 ELSE 0 END
         |      for c in range(10)] for r in range(6)]) AS bhi,
         |    flatten([[CASE WHEN p[r * 11 + c + 1] > p[r * 11 + c + 2] THEN 1 ELSE 0 END
         |      for c in range(10)] for r in range(6, 12)]) AS blo FROM px),
         |h AS (SELECT id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), bhi), (a, b) -> a * 2 + b) AS shi,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), blo), (a, b) -> a * 2 + b) AS slo
         |  FROM bits),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(bit_count(xor(a.shi, b.shi)) + bit_count(xor(a.slo, b.slo)) AS BIGINT) AS hamming
         |  FROM h a JOIN h b ON a.id < b.id)
         |SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 14
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    "x102_mp4_keyframes" ->
      // independent re-derivation of the synthesized container's sample
      // geometry: n = 1 + len%7 samples of size 8 + (doc_id+i)%9, mdat
      // byte j = text byte j%len (ASCII ⇒ ord(char) IS the byte), stss
      // marks every 3rd sample — so keyframe count/bytes/payload-sum are
      // pure arithmetic over (doc_id, text), no BLOB parsing needed
      (s"""WITH m AS (SELECT doc_id, text, strlen(text) AS len FROM documents WHERE strlen(text) > 0),
         |s AS (SELECT doc_id, text, len, unnest(range(1, 2 + (len % 7))) AS i FROM m),
         |sz AS (SELECT doc_id, text, len, i, 8 + ((doc_id + i) % 9) AS sz FROM s),
         |st AS (SELECT *, coalesce(sum(sz) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt FROM sz),
         |kf AS (SELECT doc_id, sz,
         |    list_sum([ord(substr(text, CAST((strt + j) % len AS INT) + 1, 1)) for j in range(sz)]) AS bsum
         |  FROM st WHERE (i - 1) % 3 = 0),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_keyframes,
         |    CAST(sum(sz) AS BIGINT) AS kf_bytes_total,
         |    CAST(sum(bsum) AS BIGINT) AS kf_byte_sum FROM kf GROUP BY 1)
         |SELECT m.doc_id AS media_id, 'avc1' AS codec,
         |  CAST(16 * (1 + m.doc_id % 4) AS INT) AS width,
         |  CAST(16 * (1 + m.doc_id % 3) AS INT) AS height,
         |  CAST(1 + m.len % 7 AS BIGINT) AS n_samples,
         |  agg.n_keyframes, agg.kf_bytes_total, agg.kf_byte_sum
         |FROM m JOIN agg ON agg.doc_id = m.doc_id
         |ORDER BY media_id""".stripMargin.replace("\n", " ")),
    "x72_snapshot_diff" ->
      // same md5-of-normalized-text fingerprint (x04/x05's), same
      // full-outer classification
      (s"""WITH fpt AS (SELECT doc_id, md5(lower(array_to_string($toks, ' '))) AS fp FROM documents),
         |o AS (SELECT fp, count(*) AS n_old FROM fpt WHERE doc_id % 2 = 0 GROUP BY 1),
         |n AS (SELECT fp, count(*) AS n_new FROM fpt WHERE doc_id % 2 = 1 GROUP BY 1),
         |j AS (SELECT CASE WHEN o.n_old IS NULL THEN 'added'
         |    WHEN n.n_new IS NULL THEN 'removed' ELSE 'kept' END AS status,
         |    o.n_old, n.n_new
         |  FROM o FULL OUTER JOIN n USING (fp))
         |SELECT status, CAST(count(*) AS BIGINT) AS n_contents,
         |  CAST(sum(coalesce(n_old, 0)) AS BIGINT) AS n_docs_old,
         |  CAST(sum(coalesce(n_new, 0)) AS BIGINT) AS n_docs_new
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    "x73_repetition" ->
      // same whitespace tokens; k-grams re-derived positionally via
      // lead() windows (NULL tail rows drop); count arithmetic is
      // integer-exact on both engines so the fractions divide identically
      (s"""WITH t AS (SELECT doc_id, $toks AS ts FROM documents),
         |tok AS (SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS i FROM t),
         |bi AS (SELECT doc_id, tok || ' ' || lead(tok) OVER w AS g
         |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |bic AS (SELECT doc_id, g, count(*) AS c FROM bi
         |  WHERE g IS NOT NULL GROUP BY 1, 2),
         |b AS (SELECT doc_id, max(c) AS topc, sum(c) AS nbi
         |  FROM bic GROUP BY 1),
         |tri AS (SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w ||
         |    ' ' || lead(tok, 2) OVER w AS g
         |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         |tric AS (SELECT doc_id, g, count(*) AS c FROM tri
         |  WHERE g IS NOT NULL GROUP BY 1, 2),
         |tr AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE) /
         |    CAST(sum(c) AS DOUBLE) AS dup3 FROM tric GROUP BY 1)
         |SELECT d.doc_id,
         |  round(coalesce(2.0 * b.topc / (b.nbi + 1), 0.0), 6) AS top2gram_frac,
         |  round(coalesce(tr.dup3, 0.0), 6) AS dup3gram_frac,
         |  (coalesce(2.0 * b.topc / (b.nbi + 1), 0.0) <= 0.20 AND
         |    coalesce(tr.dup3, 0.0) <= 0.30) AS keep
         |FROM documents d LEFT JOIN b ON b.doc_id = d.doc_id
         |LEFT JOIN tr ON tr.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")),
    "x74_substring_dedup" ->
      // same tokens; duplicated 8-gram positions re-derived via
      // list_slice, the island merge via the identical running-max
      // window, survivors re-assembled positionally with a range
      // anti-join (the engine uses an equivalent per-doc HOF filter)
      (s"""WITH t AS (SELECT doc_id, $toks AS ts FROM documents),
         |gr AS (SELECT doc_id, unnest(range(1, greatest(len(ts) - 6, 1))) AS i, ts
         |  FROM t),
         |gs AS (SELECT doc_id, i,
         |  array_to_string(list_slice(ts, i, i + 7), ' ') AS g FROM gr),
         |dup AS (SELECT g FROM gs GROUP BY g
         |  HAVING count(DISTINCT doc_id) >= 2),
         |pos AS (SELECT doc_id, CAST(i AS BIGINT) AS s,
         |  CAST(i + 7 AS BIGINT) AS e FROM gs JOIN dup USING (g)),
         |isl AS (SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER
         |    (PARTITION BY doc_id ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |  THEN 1 ELSE 0 END AS brk FROM pos),
         |isl2 AS (SELECT doc_id, s, e, sum(brk) OVER
         |    (PARTITION BY doc_id ORDER BY s
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM isl),
         |sp AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM isl2
         |  GROUP BY doc_id, island),
         |spn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(e - s + 1) AS BIGINT) AS n_removed FROM sp GROUP BY 1),
         |tok AS (SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS i FROM t),
         |keep AS (SELECT tok.doc_id, tok.i, tok.tok FROM tok
         |  LEFT JOIN sp ON sp.doc_id = tok.doc_id
         |    AND tok.i BETWEEN sp.s AND sp.e
         |  WHERE sp.doc_id IS NULL),
         |fp AS (SELECT doc_id,
         |  md5(array_to_string(array_agg(tok ORDER BY i), ' ')) AS clean_fp
         |  FROM keep GROUP BY 1)
         |SELECT t2.doc_id, CAST(len(t2.ts) AS BIGINT) AS n_tokens,
         |  coalesce(spn.n_spans, 0) AS n_spans,
         |  coalesce(spn.n_removed, 0) AS n_removed,
         |  coalesce(fp.clean_fp, md5('')) AS clean_fp
         |FROM t t2 LEFT JOIN spn ON spn.doc_id = t2.doc_id
         |LEFT JOIN fp ON fp.doc_id = t2.doc_id
         |ORDER BY t2.doc_id""".stripMargin.replace("\n", " ")),
    // identical min-timestamp chain: stage i joins stage i-1's
    // first-completion times and keeps strictly-later events. The
    // STREAMING funnel (x77) shares this oracle — its sorted stateful
    // scan advances along exactly the same chain
    "x75_funnel" -> funnelSql,
    "x77_stream_funnel" -> funnelSql,
    "x78_funnel_windowed" -> funnelSqlWithin(Some(720)),
    "x83_rate_anomaly" ->
      // identical bucket counts, identical trailing frame, identical
      // float expression tree (integer Σn/Σn² first, doubles last)
      ("""WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
         |s AS (SELECT event_type, bucket, n,
         |    CAST(count(n) OVER w AS BIGINT) AS cnt,
         |    CAST(sum(n) OVER w AS BIGINT) AS s1,
         |    CAST(sum(n * n) OVER w AS BIGINT) AS s2
         |  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket
         |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         |t AS (SELECT event_type, bucket, n,
         |    CAST(s1 AS DOUBLE) / cnt AS mean,
         |    sqrt(greatest((cnt * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
         |      / (cnt * (cnt - 1.0)), 0.0)) AS sd
         |  FROM s WHERE cnt >= 24)
         |SELECT event_type, bucket, n, round(mean, 4) AS mean,
         |  round(sd, 4) AS sd
         |FROM t WHERE sd > 0 AND abs(n - mean) > 3.0 * sd
         |ORDER BY event_type, bucket""".stripMargin.replace("\n", " ")),
    // same equi + time-range condition as the streaming join; inner join,
    // so the generous test watermark drops nothing and batch == stream
    "x84_stream_interval_join" ->
      ("SELECT v.user_id, v.event_id AS left_id, c.event_id AS right_id, " +
        "v.ts AS left_ts, c.ts AS right_ts FROM events v JOIN events c " +
        "ON v.user_id = c.user_id AND c.ts >= v.ts " +
        "AND c.ts <= v.ts + INTERVAL 30 MINUTE " +
        "WHERE v.event_type = 'view' AND c.event_type = 'click' " +
        "ORDER BY v.user_id, left_id, right_id"),
    // identical word histogram (split keeps empties, both sides filter
    // them), identical per-word pair explode, exact integer counts
    "x85_bpe_pairs" ->
      ("WITH words AS (SELECT unnest(string_split_regex(text, '\\s+')) AS w " +
        "FROM documents), " +
        "wc AS (SELECT w, count(*) AS n FROM words WHERE length(w) > 0 GROUP BY w), " +
        "pos AS (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i " +
        "FROM wc WHERE length(w) >= 2) " +
        "SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair, " +
        "CAST(sum(n) AS BIGINT) AS n_occ " +
        "FROM pos GROUP BY 1 ORDER BY n_occ DESC, pair LIMIT 50"),
    // every PageRank round unrolled as a CTE with the engine's exact
    // arithmetic: integer 1e-12-tick contributions (order-independent
    // BIGINT sums), then teleport/damping/re-quantize in the same IEEE
    // operand order — ranks are bit-exact, no tolerance
    "x86_pagerank" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und GROUP BY src), " +
          "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), " +
          "r0 AS MATERIALIZED (SELECT src AS node, " +
          "floor(CAST(1.0 AS DOUBLE) / nn.n * 1e12 + 0.5) / 1e12 AS rank " +
          "FROM deg CROSS JOIN nn)"
      def iter(k: Int) =
        s"r$k AS MATERIALIZED (SELECT u.dst AS node, " +
          "floor(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + " +
          "CAST(0.85 AS DOUBLE) * (CAST(sum(CAST(floor(r.rank / d.deg * 1e12 + 0.5) " +
          "AS BIGINT)) AS DOUBLE) / 1e12)) * 1e12 + 0.5) / 1e12 AS rank " +
          s"FROM und u JOIN r${k - 1} r ON u.src = r.node " +
          "JOIN deg d ON d.src = u.src CROSS JOIN nn " +
          "GROUP BY u.dst, nn.n)"
      head + ", " + (1 to 5).map(iter).mkString(", ") +
        " SELECT node, rank FROM r5 ORDER BY node"
    },
    // same canonical edge set, same (degree, id) orientation, same
    // apex-wedge + closure-join counting — exact integers throughout
    "x87_triangles" ->
      ("WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
        "JOIN po b ON a.ok = b.ok AND a.pk < b.pk), " +
        "deg AS MATERIALIZED (SELECT x, count(*) AS d FROM " +
        "(SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x), " +
        "de AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN u ELSE v END AS src, " +
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN v ELSE u END AS dst " +
        "FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v), " +
        "wc AS (SELECT CAST(sum(od * (od - 1)) / 2 AS BIGINT) AS n_wedges " +
        "FROM (SELECT src, count(*) AS od FROM de GROUP BY src)), " +
        "tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM de e1 " +
        "JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst " +
        "JOIN und ON und.u = e1.dst AND und.v = e2.dst), " +
        "ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und) " +
        "SELECT n_edges, n_wedges, n_triangles FROM ne CROSS JOIN wc CROSS JOIN tri"),
    // features + left-associated logit chain shared with x70's oracle;
    // grouped tie-averaged rank arithmetic in exact integers (2×midrank),
    // one final double division — identical operand order on both sides
    "x88_model_auc" ->
      (s"${scoredLabCtes("x88_weights")}, " +
        "g AS (SELECT score, count(*) AS n, sum(pos) AS np FROM lab GROUP BY score), " +
        "o AS (SELECT score, n, np, coalesce(sum(n) OVER (ORDER BY score " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM g), " +
        "s AS (SELECT sum(np * (2 * cb + n + 1)) AS s2, sum(np) AS p, sum(n) AS tot FROM o) " +
        "SELECT CAST(p AS BIGINT) AS n_pos, CAST(tot - p AS BIGINT) AS n_neg, " +
        "CAST(s2 - p * (p + 1) AS DOUBLE) / CAST(2 * p * (tot - p) AS DOUBLE) AS auc FROM s"),
    // identical tokenizer, identical bigram explode, identical fixed-order
    // (cab·T·T)/((B·ca)·cb) float chain into ln — scores bit-exact
    "x89_pmi_collocations" ->
      (s"""WITH m AS (SELECT $toks AS s FROM documents),
         |bl AS (SELECT [s[i] || ' ' || s[i+1] for i in range(1, len(s))] AS bgs FROM m WHERE len(s) > 1),
         |cb AS (SELECT bg, count(*) AS cab FROM (SELECT unnest(bgs) AS bg FROM bl)
         |  GROUP BY 1 HAVING count(*) >= 5),
         |uc AS (SELECT t, count(*) AS c FROM (SELECT unnest(s) AS t FROM m) GROUP BY 1),
         |tot AS (SELECT CAST(sum(len(s)) AS DOUBLE) AS tt,
         |    CAST(sum(greatest(len(s) - 1, 0)) AS DOUBLE) AS bb FROM m),
         |sc AS (SELECT cb.bg AS pair, CAST(cb.cab AS BIGINT) AS n_occ,
         |    round(ln(CAST(cb.cab AS DOUBLE) * tot.tt * tot.tt /
         |      ((tot.bb * ua.c) * ub.c)), 6) AS pmi
         |  FROM cb JOIN uc ua ON ua.t = split_part(cb.bg, ' ', 1)
         |  JOIN uc ub ON ub.t = split_part(cb.bg, ' ', 2) CROSS JOIN tot)
         |SELECT pair, n_occ, pmi FROM sc
         |ORDER BY pmi DESC, pair LIMIT 50""".stripMargin.replace("\n", " ")),
    "x90_profile" ->
      (profileCols.map(c =>
        s"SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, " +
          s"CAST(count(*) - count($c) AS BIGINT) AS n_nulls, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM lineitem")
        .mkString(" UNION ALL ") + " ORDER BY column_name"),
    // identical blocking key (alnum prefix of the lowercased text),
    // identical lang-blocked (key, id) ranking, identical w=5 offsets,
    // identical set-Jaccard verify
    "x91_snm_pairs" ->
      (s"""WITH k AS (SELECT doc_id, lang,
         |    list_distinct($toks) AS ts,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS bk
         |  FROM documents),
         |r AS (SELECT doc_id, lang, ts, row_number() OVER
         |    (PARTITION BY lang ORDER BY bk, doc_id) AS rnk FROM k),
         |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
         |    CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.ts, b.ts))) AS j
         |  FROM r a JOIN r b ON a.lang = b.lang
         |    AND b.rnk - a.rnk BETWEEN 1 AND 5)
         |SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b,
         |  round(j, 4) AS jaccard FROM p WHERE j >= 0.5
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    "x81_hll_distinct" ->
      // exact distincts re-derived in SQL; the staged engine estimates
      // are joined in and gated by the 5% accuracy predicate — identical
      // arithmetic on both sides
      (s"""WITH est AS (SELECT event_type, n_est FROM ${Stage.sqlRef("x81_estimates")}),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |    FROM events GROUP BY event_type
         |  UNION ALL
         |  SELECT 'ALL', count(DISTINCT user_id) FROM events)
         |SELECT est.event_type, CAST(ex.n_exact AS BIGINT) AS n_exact,
         |  CAST(est.n_est AS BIGINT) AS n_est,
         |  abs(est.n_est - ex.n_exact) <= ex.n_exact * 0.05 AS within_5pct
         |FROM est JOIN ex ON est.event_type = ex.event_type
         |ORDER BY est.event_type""".stripMargin.replace("\n", " ")),
    "x82_session_paths" ->
      // same gap rule as x21 (epoch-micros, (ts, event_id) total order);
      // string_agg ORDER BY ts, event_id == the engine's sorted-struct
      // concat; top-k page deterministic via (n DESC, path)
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e),
         |g AS (SELECT user_id, ts, event_id, event_type,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM f),
         |p AS (SELECT user_id, session_seq,
         |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
         |  FROM g GROUP BY user_id, session_seq)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin.replace("\n", " ")),
    "x80_attribution" ->
      // same candidate join (strict t_ts < c_ts, 72 h lookback on epoch
      // micros), same per-credit round-to-6 DECIMAL(18,6) accumulation —
      // decimal sums are order-independent, so both engines agree exactly
      ("""WITH t AS (SELECT user_id, ts AS t_ts, event_id AS t_id,
         |    event_type AS channel FROM events
         |  WHERE event_type IN ('view', 'click')),
         |c AS (SELECT user_id, ts AS c_ts, event_id AS c_id, value
         |  FROM events WHERE event_type = 'purchase'),
         |cand AS (SELECT c.c_id, c.value, t.channel, t.t_ts, t.t_id
         |  FROM c JOIN t USING (user_id)
         |  WHERE t.t_ts < c.c_ts
         |    AND epoch_us(t.t_ts) >= epoch_us(c.c_ts) - 72 * 3600000000),
         |lt AS (SELECT *, row_number() OVER (PARTITION BY c_id
         |    ORDER BY t_ts DESC, t_id DESC) AS rn FROM cand),
         |last_t AS (SELECT channel,
         |    sum(CAST(round(1.0, 6) AS DECIMAL(18,6))) AS nc,
         |    sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS v
         |  FROM lt WHERE rn = 1 GROUP BY channel),
         |ln AS (SELECT channel, value,
         |    count(*) OVER (PARTITION BY c_id) AS n FROM cand),
         |lin AS (SELECT channel,
         |    sum(CAST(round(1.0 / n, 6) AS DECIMAL(18,6))) AS nc,
         |    sum(CAST(round(value / n, 6) AS DECIMAL(18,6))) AS v
         |  FROM ln GROUP BY channel)
         |SELECT model, channel, n_conv, value_sum FROM (
         |  SELECT 'last_touch' AS model, channel,
         |    round(CAST(nc AS DOUBLE), 4) AS n_conv,
         |    round(CAST(v AS DOUBLE), 2) AS value_sum FROM last_t
         |  UNION ALL
         |  SELECT 'linear', channel, round(CAST(nc AS DOUBLE), 4),
         |    round(CAST(v AS DOUBLE), 2) FROM lin)
         |ORDER BY model, channel""".stripMargin.replace("\n", " ")),
    "x76_retention" ->
      // (user, day) distinct BEFORE the cohort join, then day offsets
      ("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
         |  FROM events),
         |cohort AS (SELECT user_id, min(d) AS c FROM days GROUP BY 1)
         |SELECT c AS cohort_day,
         |  CAST(date_diff('day', c, d) AS BIGINT) AS day_offset,
         |  CAST(count(*) AS BIGINT) AS n_users
         |FROM days JOIN cohort USING (user_id)
         |WHERE date_diff('day', c, d) <= 7
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")),
    "x71_curation_v2" ->
      // the three stages re-derived in one WITH chain: x70's gate from
      // the shared quality CTEs + staged weights, x66's line dedup over
      // the gated survivors, x68's DSIR over the REASSEMBLED clean text
      (s"$qualityCtes, " +
        "qf AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
        s"qw AS (SELECT weights, intercept FROM ${Stage.sqlRef("x71_weights")}), " +
        "gate AS (SELECT doc_id FROM (SELECT qf.doc_id, intercept + weights[1] * f0 + " +
        "weights[2] * f1 + weights[3] * f2 + weights[4] * f3 AS logit " +
        "FROM qf CROSS JOIN qw) ORDER BY logit DESC, doc_id LIMIT 400), " +
        "sv AS (SELECT m.doc_id, m.ts FROM m JOIN gate USING (doc_id) WHERE len(m.ts) > 0), " +
        "ll AS (SELECT doc_id, unnest(range(CAST(ceil(len(ts) / 12.0) AS BIGINT))) AS li, ts FROM sv), " +
        "lt AS (SELECT doc_id, li, array_to_string(list_slice(ts, li * 12 + 1, li * 12 + 12), ' ') AS ltx FROM ll), " +
        "lh AS (SELECT doc_id, li, ltx, md5(ltx) AS h FROM lt), " +
        "bo AS (SELECT h FROM lh GROUP BY h HAVING count(DISTINCT doc_id) > 1), " +
        "kp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "string_agg(ltx, ' ' ORDER BY li) AS clean FROM lh " +
        "WHERE h NOT IN (SELECT h FROM bo) GROUP BY doc_id), " +
        raw"tk2 AS (SELECT kp.doc_id, d.source, unnest(list_filter(string_split_regex(trim(clean), '\s+'), t -> len(t) > 0)) AS term " +
        "FROM kp JOIN documents d USING (doc_id)), " +
        "bk2 AS (SELECT doc_id, source, ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT % 64 AS b FROM tk2), " +
        "sp2 AS (SELECT unnest(range(64)) AS b), " +
        "ct2 AS (SELECT b, count(*) AS c FROM bk2 WHERE source = 'src0' GROUP BY 1), " +
        "cr2 AS (SELECT b, count(*) AS c FROM bk2 GROUP BY 1), " +
        "lr2 AS (SELECT sp2.b, ln((coalesce(ct2.c, 0) + 1) / ((SELECT sum(c) FROM ct2) + 64)) - " +
        "ln((coalesce(cr2.c, 0) + 1) / ((SELECT sum(c) FROM cr2) + 64)) AS ratio " +
        "FROM sp2 LEFT JOIN ct2 USING (b) LEFT JOIN cr2 USING (b)), " +
        "dc2 AS (SELECT doc_id, b, count(*) AS c FROM bk2 GROUP BY 1, 2), " +
        "ws2 AS (SELECT doc_id, list_reduce(list_prepend(0.0, " +
        "list(CAST(c AS DOUBLE) * ratio ORDER BY b)), (x, y) -> x + y) AS w " +
        "FROM dc2 JOIN lr2 USING (b) GROUP BY doc_id), " +
        "sel AS (SELECT doc_id, w FROM ws2 ORDER BY w DESC, doc_id LIMIT 150) " +
        "SELECT sel.doc_id, round(sel.w, 4) AS weight, kp.n_kept " +
        "FROM sel JOIN kp USING (doc_id) ORDER BY sel.doc_id"),
    "x70_quality_model" ->
      // features from the SHARED quality CTEs (cannot drift from x03),
      // weights from the staged model, same left-associated logit chain,
      // same top-100 boundary
      (s"$qualityCtes, " +
        "f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
        s"w AS (SELECT weights, intercept FROM ${Stage.sqlRef("x70_weights")}), " +
        "z AS (SELECT doc_id, intercept + weights[1] * f0 + weights[2] * f1 + " +
        "weights[3] * f2 + weights[4] * f3 AS logit FROM f CROSS JOIN w), " +
        "sel AS (SELECT doc_id, logit FROM z ORDER BY logit DESC, doc_id LIMIT 100) " +
        "SELECT doc_id, round(logit, 6) AS logit FROM sel ORDER BY doc_id"),
    "x68_dsir_weights" ->
      // identical md5 buckets, full-spine add-1 smoothing, bucket-ordered
      // per-doc fold (the shared dsirWsCtes), same top-200 boundary
      (s"""$dsirWsCtes,
         |sel AS (SELECT doc_id, w FROM ws ORDER BY w DESC, doc_id LIMIT 200)
         |SELECT doc_id, round(w, 4) AS weight FROM sel
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // the same shared weight CTEs, then max-shift, 1e-9 exp ticks, and
    // the exact-integer moment row the shared ESS string reads
    "x246_dsir_ess" ->
      (s"""$dsirWsCtes,
         |mxw AS (SELECT max(w) AS wmax FROM ws),
         |u AS (SELECT CAST(floor(exp(w - wmax) * 1e9 + 0.5) AS BIGINT) AS ut
         |  FROM ws CROSS JOIN mxw),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(ut) AS DECIMAL(38,0)) AS su,
         |    CAST(sum(CAST(ut AS HUGEINT) * ut) AS DECIMAL(38,0)) AS su2,
         |    CAST(max(ut) AS BIGINT) AS mu
         |  FROM u)
         |SELECT n_docs, round($DsirEssSql, 6) AS ess,
         |  round(($DsirEssSql) / n_docs, 6) AS ess_fraction,
         |  round(CAST(mu AS DOUBLE) / CAST(su AS DOUBLE), 6) AS max_share
         |FROM m""".stripMargin.replace("\n", " ")),
    "x58_temperature_mix" ->
      // same quota arithmetic (Σ n^α folded in source order — the one FP
      // sum — then floor per domain) and the same 16-bit md5 ticket rank
      (s"""WITH d AS (SELECT doc_id, source FROM documents),
         |c AS (SELECT source, count(*) AS n_domain FROM d GROUP BY 1),
         |zl AS (SELECT list(pow(CAST(n_domain AS DOUBLE), 0.5) ORDER BY source) AS ws FROM c),
         |z AS (SELECT list_reduce(list_prepend(0.0, ws), (x, y) -> x + y) AS z FROM zl),
         |q AS (SELECT source, n_domain, least(n_domain,
         |    CAST(floor(200.0 * pow(CAST(n_domain AS DOUBLE), 0.5) / (SELECT z FROM z)) AS BIGINT)) AS quota
         |  FROM c),
         |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY substr(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS domain_rank
         |  FROM d)
         |SELECT r.source, r.doc_id, q.n_domain, q.quota,
         |  CAST(r.domain_rank AS BIGINT) AS domain_rank
         |FROM r JOIN q USING (source) WHERE domain_rank <= q.quota
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x59_bigram_logprob" ->
      // identical derivation: corpus bigram counts, prefix counts summed
      // from them, unigram vocab size, add-1 conditional log-probs folded
      // in bigram-position order (list(lp ORDER BY pos) + list_reduce ≡
      // Spark's sort_array + aggregate)
      (s"""WITH m AS (SELECT doc_id, $toks AS s FROM documents),
         |bl AS (SELECT doc_id, [s[i] || ' ' || s[i+1] for i in range(1, len(s))] AS bgs FROM m),
         |g AS (SELECT doc_id, unnest(bgs) AS bg, generate_subscripts(bgs, 1) AS pos FROM bl),
         |cb AS (SELECT bg, count(*) AS cab FROM g GROUP BY 1),
         |cp AS (SELECT split_part(bg, ' ', 1) AS a, CAST(sum(cab) AS BIGINT) AS ca FROM cb GROUP BY 1),
         |vc AS (SELECT count(DISTINCT term) AS v FROM (SELECT unnest($toks) AS term FROM documents)),
         |sgl AS (SELECT g.doc_id, g.pos,
         |    ln((cb.cab + 1.0) / CAST(cp.ca + (SELECT v FROM vc) AS DOUBLE)) AS lp
         |  FROM g JOIN cb USING (bg) JOIN cp ON cp.a = split_part(g.bg, ' ', 1)),
         |ag AS (SELECT doc_id, list(lp ORDER BY pos) AS lps FROM sgl GROUP BY 1)
         |SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_bigrams,
         |  round(list_reduce(list_prepend(0.0, lps), (x, y) -> x + y) / len(lps), 4) AS lm2_score
         |FROM ag ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x48_weighted_sample" ->
      // identical 48-bit ticket + ln(u)/w rank recomputed in DuckDB; the
      // top-50 selection orders on the UNROUNDED rank in both engines
      (s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |u AS (SELECT doc_id, n_tokens,
         |  ln((('0x' || substr(md5('wsmp:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 0.5)
         |    / 281474976710656.0) / n_tokens AS r
         |  FROM d WHERE n_tokens > 0),
         |k AS (SELECT doc_id, n_tokens, r FROM u
         |  ORDER BY r DESC, doc_id LIMIT 50)
         |SELECT doc_id, n_tokens, round(r, 6) AS es_rank FROM k
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x37_repetition" ->
      (s"WITH m AS (SELECT doc_id, $toks AS ts FROM documents), " +
        "b AS (SELECT doc_id, len(ts) AS n, len(list_distinct(ts)) AS nd FROM m), " +
        "g AS (SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bg FROM m), " +
        "c AS (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY 1, 2), " +
        "t AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bg FROM c GROUP BY 1) " +
        "SELECT b.doc_id, " +
        "round(CASE WHEN n > 0 THEN 1.0 - CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END, 4) AS dup_token_frac, " +
        "round(coalesce(CAST(top_c AS DOUBLE) / CAST(n_bg AS DOUBLE), 0.0), 4) AS top_bigram_frac " +
        "FROM b LEFT JOIN t USING (doc_id) ORDER BY doc_id"),
    "x38_pii_scan" -> {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      "WITH s AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org now' ELSE '' END || " +
        "CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 today' ELSE '' END AS t " +
        "FROM documents) " +
        s"SELECT doc_id, CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_emails, " +
        s"CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT) AS n_phones, " +
        s"CAST(len(regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'), " +
        s"'$phoneRe', '<PHONE>', 'g')) AS BIGINT) AS redacted_len " +
        "FROM s ORDER BY doc_id"
    },
    "x39_chunk" ->
      // mirrors Chunking.chunkDocs: nChunks = 1 + ceil(max(len-64,0)/48);
      // list_slice is 1-based inclusive (Spark slice(start,len) with
      // start=i*48+1, len=64 covers [i*48+1, i*48+64])
      (s"WITH m AS (SELECT doc_id, $toks AS s FROM documents WHERE len($toks) > 0), " +
        "c AS (SELECT doc_id, unnest(range(0, 1 + (greatest(len(s) - 64, 0) + 47) // 48)) AS i, s FROM m) " +
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, " +
        "array_to_string(list_slice(s, i * 48 + 1, i * 48 + 64), ' ') AS chunk_text, " +
        "CAST(least(64, len(s) - i * 48) AS BIGINT) AS n_tokens " +
        "FROM c ORDER BY doc_id, chunk_idx"),
    "x40_decontaminate" -> decontaminateSql,
    // x56 computes the SAME result through the bloom-pruned path — result
    // equality with the exact derivation is the gate
    "x56_bloom_decontaminate" -> decontaminateSql,
    "x41_pack" ->
      // mirrors Packing.packSequences: per-shard running token total in
      // doc_id order, start-based sequence assignment; all-integer math
      (s"WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n, " +
        "doc_id % 8 AS shard FROM documents), " +
        "c AS (SELECT doc_id, shard, n, CAST(sum(n) OVER (PARTITION BY shard " +
        "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d) " +
        "SELECT doc_id, n AS n_tokens, CAST(shard AS BIGINT) AS shard, " +
        "CAST((cum - n) // 2048 AS BIGINT) AS seq_id, " +
        "CAST((cum - n) % 2048 AS BIGINT) AS start_offset " +
        "FROM c ORDER BY doc_id"),
    "x42_tfidf" ->
      (s"WITH t AS (SELECT doc_id, unnest($toks) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2), " +
        "fd AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents), " +
        "r AS (SELECT doc_id, term, tf, df, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rank " +
        "FROM tf JOIN fd USING (term)) " +
        "SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, " +
        "round(CAST(tf AS DOUBLE) * ln(nn / CAST(df AS DOUBLE)), 4) AS tfidf " +
        "FROM r, n WHERE rank <= 3 ORDER BY doc_id, rank"),
    "x43_keep_best" ->
      (s"""WITH RECURSIVE pr AS ($jaccardCte),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |m AS (SELECT d.doc_id, d.n_tokens, comp.component FROM d JOIN comp ON d.doc_id = comp.id),
         |k AS (SELECT doc_id, n_tokens FROM (
         |  SELECT doc_id, n_tokens, row_number() OVER (
         |    PARTITION BY component ORDER BY n_tokens DESC, doc_id ASC) AS rk
         |  FROM m) WHERE rk = 1),
         |nm AS (SELECT doc_id, n_tokens FROM d
         |  WHERE doc_id NOT IN (SELECT id FROM comp))
         |SELECT doc_id, n_tokens FROM (SELECT * FROM k UNION ALL SELECT * FROM nm)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x44_group_split" -> x44Sql,
    "x46_banded_keep_split" ->
      // components + keeper rank + group-keyed split, all re-derived in
      // DuckDB from the STAGED banded pair table (the engine-specific
      // MinHash/LSH half is the hand-off; everything downstream is
      // recomputed independently). Singletons form their own group →
      // rk = 1 → kept, matching the engine's anti-join pass-through.
      (s"""WITH RECURSIVE pr AS (SELECT id_a, id_b FROM ${Stage.sqlRef("x46_pairs")}),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |g AS (SELECT d.doc_id, d.n_tokens,
         |    coalesce(comp.component, d.doc_id) AS group_key
         |  FROM d LEFT JOIN comp ON d.doc_id = comp.id),
         |k AS (SELECT doc_id, row_number() OVER (
         |    PARTITION BY group_key ORDER BY n_tokens DESC, doc_id ASC) AS rk
         |  FROM g)
         |SELECT g.doc_id, g.n_tokens, (k.rk = 1) AS kept, g.group_key,
         |  ${splitCaseOver("group_key")} AS split
         |FROM g JOIN k ON g.doc_id = k.doc_id
         |ORDER BY g.doc_id""".stripMargin.replace("\n", " ")),
    "x45_chunk_pack" ->
      // chunk CTE mirrors x39 at window=stride=64; packing window mirrors
      // x41 at budget=256 sharded by doc_id % 4, ordered by chunk_key
      (s"WITH m AS (SELECT doc_id, $toks AS s FROM documents WHERE len($toks) > 0), " +
        "ch AS (SELECT doc_id, unnest(range(0, 1 + (greatest(len(s) - 64, 0) + 63) // 64)) AS i, s FROM m), " +
        "c AS (SELECT doc_id, doc_id * 1000000 + i AS chunk_key, " +
        "CAST(least(64, len(s) - i * 64) AS BIGINT) AS n FROM ch), " +
        "p AS (SELECT doc_id % 4 AS shard, chunk_key, n, " +
        "CAST(sum(n) OVER (PARTITION BY doc_id % 4 ORDER BY chunk_key " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM c) " +
        "SELECT CAST(shard AS BIGINT) AS shard, " +
        "CAST((cum - n) // 256 AS BIGINT) AS seq_id, " +
        "CAST(count(*) AS BIGINT) AS n_chunks, " +
        "CAST(sum(n) AS BIGINT) AS seq_tokens, " +
        "CAST(min(chunk_key) AS BIGINT) AS first_chunk " +
        "FROM p GROUP BY 1, 2 ORDER BY 1, 2"),
    "x08_simhash_pairs" -> x08Sql,
    "x49_stream_incr_dedup" ->
      // identical derivation as x47 over the x49-staged tables (the
      // streaming path must find exactly the batch path's pairs)
      (s"""WITH cb AS (SELECT id, band, band_key FROM ${Stage.sqlRef("x49_corpus_bands")}),
         |nb AS (SELECT id, band, band_key FROM ${Stage.sqlRef("x49_batch_bands")}),
         |cand AS (SELECT DISTINCT nb.id AS id_new, cb.id AS id_corpus
         |  FROM nb JOIN cb ON nb.band = cb.band AND nb.band_key = cb.band_key),
         |ns AS (SELECT id, sh FROM ${Stage.sqlRef("x49_batch_sh")}),
         |cs AS (SELECT id, sh FROM ${Stage.sqlRef("x49_corpus_sh")}),
         |p AS (SELECT cand.id_new, cand.id_corpus,
         |  CAST(len(list_intersect(ns.sh, cs.sh)) AS DOUBLE)
         |    / (len(ns.sh) + len(cs.sh) - len(list_intersect(ns.sh, cs.sh))) AS j
         |  FROM cand JOIN ns ON ns.id = cand.id_new
         |  JOIN cs ON cs.id = cand.id_corpus)
         |SELECT id_new, id_corpus, round(j, 4) AS jaccard FROM p WHERE j >= 0.8
         |ORDER BY id_new, id_corpus""".stripMargin.replace("\n", " ")),
    "x47_incremental_dedup" ->
      // candidates + exact Jaccard re-derived from the four STAGED
      // engine tables (bands + shingle sets per side); the division
      // mirrors minhashPairsBetween operand-for-operand
      (s"""WITH cb AS (SELECT id, band, band_key FROM ${Stage.sqlRef("x47_corpus_bands")}),
         |nb AS (SELECT id, band, band_key FROM ${Stage.sqlRef("x47_batch_bands")}),
         |cand AS (SELECT DISTINCT nb.id AS id_new, cb.id AS id_corpus
         |  FROM nb JOIN cb ON nb.band = cb.band AND nb.band_key = cb.band_key),
         |ns AS (SELECT id, sh FROM ${Stage.sqlRef("x47_batch_sh")}),
         |cs AS (SELECT id, sh FROM ${Stage.sqlRef("x47_corpus_sh")}),
         |p AS (SELECT cand.id_new, cand.id_corpus,
         |  CAST(len(list_intersect(ns.sh, cs.sh)) AS DOUBLE)
         |    / (len(ns.sh) + len(cs.sh) - len(list_intersect(ns.sh, cs.sh))) AS j
         |  FROM cand JOIN ns ON ns.id = cand.id_new
         |  JOIN cs ON cs.id = cand.id_corpus)
         |SELECT id_new, id_corpus, round(j, 4) AS jaccard FROM p WHERE j >= 0.8
         |ORDER BY id_new, id_corpus""".stripMargin.replace("\n", " ")),
    "x15_winnow_overlap" -> x15Sql,
    "x11_knn_lsh" -> knnSql(
      s"SELECT id AS item_id, t, sig FROM ${graft.Stage.sqlRef("x11_item_buckets")}",
      s"SELECT DISTINCT id AS query_id, t, sig FROM ${graft.Stage.sqlRef("x11_probe_buckets")}",
      joinKeys = "a.t = b.t AND a.sig = b.sig", dedupCandidates = true),
    "x51_knn_pq" ->
      // ADC re-derived from the staged codebooks + codes: per-query
      // sub-distance table from the raw embeddings, lookups summed in
      // SUB ORDER (list_reduce ≡ the engine's sequential fold); the ADC
      // top-C (C = 100·k, the r14 production pool; sub-slice width 8 =
      // dim/m at m=8) pool is then re-ranked by EXACT squared
      // distance folded in DIMENSION order — the engine's rerank stage
      (s"""WITH cb AS (SELECT sub, centroid_id, cvec FROM ${Stage.sqlRef("x51_codebooks")}),
         |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |qp AS (SELECT query_id, sub, centroid_id,
         |  list_reduce(list_prepend(0.0, list_transform(
         |    list_zip(list_slice(qv, sub * 8 + 1, sub * 8 + 8), cvec),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y) AS d2p
         |  FROM q CROSS JOIN cb),
         |sc AS (SELECT qp.query_id, c.id, qp.sub, qp.d2p
         |  FROM ${Stage.sqlRef("x51_codes")} c
         |  JOIN qp ON qp.sub = c.sub AND qp.centroid_id = c.code),
         |ag AS (SELECT query_id, id, list(d2p ORDER BY sub) AS ps
         |  FROM sc GROUP BY 1, 2),
         |s AS (SELECT query_id, id,
         |  list_reduce(list_prepend(0.0, ps), (x, y) -> x + y) AS ad2 FROM ag),
         |r AS (SELECT query_id, id AS item_id, ad2, row_number() OVER (
         |    PARTITION BY query_id ORDER BY ad2, id) AS rank FROM s),
         |ex AS (SELECT r.query_id, r.item_id,
         |  list_reduce(list_prepend(0.0, list_transform(
         |    list_zip(q.qv, CAST(e.embedding AS DOUBLE[])),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y) AS d2
         |  FROM r JOIN q ON q.query_id = r.query_id
         |  JOIN embeddings e ON e.vec_id = r.item_id
         |  WHERE r.rank <= 1000),
         |rr AS (SELECT query_id, item_id, d2, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d2, item_id) AS rank FROM ex)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, item_id,
         |  round(d2, 6) AS d2
         |FROM rr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
        .replace("\n", " ")),
    "x52_knn_ivfpq" ->
      // x51's ADC derivation, restricted to the staged per-query
      // candidate sets before ranking, then the same exact re-rank of
      // the ADC top-C pool on the original vectors
      (s"""WITH cb AS (SELECT sub, centroid_id, cvec FROM ${Stage.sqlRef("x52_codebooks")}),
         |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |qp AS (SELECT query_id, sub, centroid_id,
         |  list_reduce(list_prepend(0.0, list_transform(
         |    list_zip(list_slice(qv, sub * 8 + 1, sub * 8 + 8), cvec),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y) AS d2p
         |  FROM q CROSS JOIN cb),
         |cand AS (SELECT query_id, id FROM ${Stage.sqlRef("x52_cand")}),
         |sc AS (SELECT qp.query_id, c.id, qp.sub, qp.d2p
         |  FROM ${Stage.sqlRef("x52_codes")} c
         |  JOIN cand ON cand.id = c.id
         |  JOIN qp ON qp.query_id = cand.query_id
         |    AND qp.sub = c.sub AND qp.centroid_id = c.code),
         |ag AS (SELECT query_id, id, list(d2p ORDER BY sub) AS ps
         |  FROM sc GROUP BY 1, 2),
         |s AS (SELECT query_id, id,
         |  list_reduce(list_prepend(0.0, ps), (x, y) -> x + y) AS ad2 FROM ag),
         |r AS (SELECT query_id, id AS item_id, ad2, row_number() OVER (
         |    PARTITION BY query_id ORDER BY ad2, id) AS rank FROM s),
         |ex AS (SELECT r.query_id, r.item_id,
         |  list_reduce(list_prepend(0.0, list_transform(
         |    list_zip(q.qv, CAST(e.embedding AS DOUBLE[])),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y) AS d2
         |  FROM r JOIN q ON q.query_id = r.query_id
         |  JOIN embeddings e ON e.vec_id = r.item_id
         |  WHERE r.rank <= 1000),
         |rr AS (SELECT query_id, item_id, d2, row_number() OVER (
         |    PARTITION BY query_id ORDER BY d2, item_id) AS rank FROM ex)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, item_id,
         |  round(d2, 6) AS d2
         |FROM rr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
        .replace("\n", " ")),
    "x13_knn_ivf" -> knnSql(
      s"SELECT id AS item_id, centroid_id FROM ${graft.Stage.sqlRef("x13_item_assign")}",
      s"SELECT query_id, centroid_id FROM ${graft.Stage.sqlRef("x13_probes")}",
      joinKeys = "a.centroid_id = b.centroid_id", dedupCandidates = false),
    "x26_quantiles_approx" -> x26Sql,
    "x30_stream_dedup" ->
      (s"SELECT md5(lower(array_to_string($toks, ' '))) AS fingerprint, " +
        "min(doc_id) AS keep_id, count(*) AS n_dups FROM documents " +
        "GROUP BY 1 ORDER BY 1"),
    "x31_pipeline" -> x31Sql,
    "x36_frame_sample" ->
      ("WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS len " +
        "FROM documents WHERE doc_id % 3 = 2), " + // round-robin slot 3 = webm
        "f AS (SELECT media_id, len, " +
        "unnest(range(0, greatest(len // 64, 1), 4)) AS i FROM m) " +
        "SELECT media_id, count(*) AS n_frames, " +
        "CAST(sum(least(64, len - i * 64)) AS BIGINT) AS frame_bytes_total " +
        "FROM f GROUP BY 1 ORDER BY 1"),
    "x35_zorder_scan" ->
      ("SELECT l_returnflag, count(*) AS n, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price_sum " +
        "FROM lineitem WHERE l_partkey >= (SELECT max(l_partkey) - max(l_partkey) // 16 FROM lineitem) " +
        "AND l_partkey <= (SELECT max(l_partkey) FROM lineitem) " +
        "GROUP BY 1 ORDER BY 1"),
    "x33_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    "x34_salted_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_distinct " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "x32_sliding_window" ->
      ("WITH b AS (SELECT event_type, unnest([" +
        "time_bucket(INTERVAL '30 minutes', ts), " +
        "time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'" +
        "]) AS window_start FROM events) " +
        "SELECT window_start, event_type, count(*) AS n FROM b " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "x28_bucketed_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    "x29_containment_pairs" ->
      (s"""WITH t AS (SELECT doc_id, $shingleSql AS sh
         | FROM (SELECT doc_id, $toks AS s FROM documents)),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS c_ab,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh) AS c_ba
         | FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(c_ab, 4) AS c_ab, round(c_ba, 4) AS c_ba
         | FROM p WHERE greatest(c_ab, c_ba) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    // same integer capacity arithmetic (64·⌈n/64⌉ — no float bucket), same
    // ticket ordering, same batch-of-8 cut and rows·max − Σn waste
    "x107_length_batching" ->
      (s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok
         |  FROM documents WHERE len($toks) > 0),
         |b AS (SELECT doc_id, n_tok, 64 * ((n_tok + 63) // 64) AS cap FROM d),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cap
         |    ORDER BY md5('lb1:'||CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM b),
         |g AS (SELECT cap, (rk - 1) // 8 AS batch, CAST(count(*) AS BIGINT) AS n_rows,
         |    max(n_tok) AS max_tok, CAST(sum(n_tok) AS BIGINT) AS s FROM r GROUP BY 1, 2)
         |SELECT cap, batch, n_rows, max_tok, n_rows * max_tok - s AS pad_waste
         |FROM g ORDER BY cap, batch""".stripMargin.replace("\n", " ")),
    // same quality CTEs and integer quantization as x100, same inclusive
    // ROWS running sum, same ≤2000 keep rule
    "x108_token_budget" ->
      (s"$qualityCtes, q AS (SELECT c.doc_id, d.source, " +
        "CAST(c.n AS BIGINT) AS n_tok, " +
        s"CAST(floor(($qualityExprSql) * 10000 + 0.5) AS BIGINT) AS qi " +
        "FROM c JOIN documents d USING (doc_id) WHERE c.n > 0), " +
        "r AS (SELECT doc_id, source, n_tok, CAST(sum(n_tok) OVER (" +
        "PARTITION BY source ORDER BY qi DESC, " +
        "md5('tb1:'||CAST(doc_id AS VARCHAR)), doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok FROM q) " +
        "SELECT doc_id, source, n_tok, cum_tok FROM r WHERE cum_tok <= 2000 " +
        "ORDER BY source, cum_tok"),
    // same integer budget split (div/mod), same ticket-ordered fractional
    // epoch, same range() expansion
    "x109_epoch_mixture" ->
      (s"""WITH d AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tok
         |  FROM documents WHERE len($toks) > 0),
         |t AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tot FROM d GROUP BY 1),
         |j AS (SELECT d.doc_id, d.source, d.n_tok, 10000 // t.tot AS fe,
         |    10000 % t.tot AS rem FROM d JOIN t USING (source)),
         |c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source
         |    ORDER BY md5('em1:'||CAST(doc_id AS VARCHAR)), doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM j),
         |r AS (SELECT doc_id, source,
         |    fe + CASE WHEN cum <= rem THEN 1 ELSE 0 END AS n_reps FROM c)
         |SELECT doc_id, source, CAST(unnest(range(n_reps)) AS BIGINT) AS rep
         |FROM r WHERE n_reps > 0 ORDER BY doc_id, rep""".stripMargin.replace("\n", " ")),
    // median ≡ quantile_cont(0.5) ≡ Spark percentile (the x16/x94
    // equivalence); identical dev and 3·1.4826·mad threshold expressions
    "x110_robust_outliers" ->
      ("WITH e AS (SELECT event_type, value FROM events), " +
        "m AS (SELECT event_type, median(value) AS med FROM e GROUP BY 1), " +
        "d AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev " +
        "FROM e JOIN m USING (event_type)), " +
        "a AS (SELECT event_type, median(dev) AS mad FROM d GROUP BY 1) " +
        "SELECT d.event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN d.dev > 3.0 * 1.4826 * a.mad THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_outliers, " +
        "round(max(d.med), 6) AS med, round(max(a.mad), 6) AS mad " +
        "FROM d JOIN a USING (event_type) GROUP BY 1 ORDER BY 1"),
    // same (ts, event_id) lead ordering, same per-cur window normalizer
    "x111_markov_transitions" ->
      ("WITH s AS (SELECT event_type AS cur_type, lead(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), " +
        "g AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT cur_type, next_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur_type), 6) AS p " +
        "FROM g ORDER BY cur_type, next_type"),
    // two x10-shape rankings (full vs 16-dim prefix slice), overlap join,
    // zero-overlap queries kept by the left join
    "x112_matryoshka_recall" ->
      (s"""WITH qf AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |itf AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |rf AS (SELECT query_id, item_id FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
         |qt AS (SELECT query_id, qv[1:16] AS qv FROM qf),
         |itt AS (SELECT item_id, iv[1:16] AS iv FROM itf),
         |rt AS (SELECT query_id, item_id FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itt CROSS JOIN qt WHERE item_id != query_id) WHERE rank <= 10),
         |o AS (SELECT rf.query_id, CAST(count(*) AS BIGINT) AS overlap
         |  FROM rf JOIN rt USING (query_id, item_id) GROUP BY 1)
         |SELECT q.query_id, CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
         |  round(CAST(coalesce(o.overlap, 0) AS DOUBLE) / 10.0, 4) AS recall_at_10
         |FROM (SELECT DISTINCT query_id FROM qf) q LEFT JOIN o USING (query_id)
         |ORDER BY query_id""".stripMargin.replace("\n", " ")),
    // naive global row_number oracle vs the engine's bucket-prefix-sum
    // rank (the losslessness gate, as x98); identical integer ceil-div
    "x113_quantile_normalize" ->
      ("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
         |g AS (SELECT *, CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS g FROM d),
         |s AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY n_chars, doc_id) AS BIGINT) AS r FROM g),
         |m AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM d GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |t AS (SELECT s.doc_id, s.source, s.n_chars,
         |    (s.r * n.n + m.m - 1) // m.m AS gstar
         |  FROM s JOIN m USING (source) CROSS JOIN n)
         |SELECT t.doc_id, t.source, t.n_chars, g.n_chars AS norm_chars
         |FROM t JOIN g ON g.g = t.gstar ORDER BY t.doc_id""".stripMargin.replace("\n", " ")),
    // same quality CTEs + integer quantization as x100, same fingerprint
    // (x04's md5), median ≡ quantile_cont ≡ percentile, same division
    // order; non-empty docs only on both sides
    "x114_datacard" ->
      (s"$qualityCtes, r AS (SELECT d.source, d.lang, " +
        "CAST(c.n AS BIGINT) AS n_tok, " +
        s"md5(lower(array_to_string($toks, ' '))) AS fp, " +
        s"CAST(floor(($qualityExprSql) * 10000 + 0.5) AS BIGINT) AS qi " +
        "FROM c JOIN documents d USING (doc_id) WHERE c.n > 0) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_tok) AS BIGINT) AS n_tokens, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS dup_rate, " +
        "round(CAST(sum(qi) AS DOUBLE) / 10000.0 / count(*), 6) AS mean_quality, " +
        "round(median(n_tok), 4) AS p50_tok " +
        "FROM r GROUP BY source ORDER BY source"),
    // same two rankings as x112, same literal weight table (no pow() —
    // last-ulp portability), same depth-ordered fold and (1−p)/p factor
    "x115_rbo" ->
      (s"""WITH qf AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |itf AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |rf AS (SELECT query_id, item_id, rank FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
         |qt AS (SELECT query_id, qv[1:16] AS qv FROM qf),
         |itt AS (SELECT item_id, iv[1:16] AS iv FROM itf),
         |rt AS (SELECT query_id, item_id, rank FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itt CROSS JOIN qt WHERE item_id != query_id) WHERE rank <= 10),
         |j AS (SELECT rf.query_id, greatest(rf.rank, rt.rank) AS dmin
         |  FROM rf JOIN rt USING (query_id, item_id)),
         |dep AS (SELECT query_id, dd.d AS d, CAST(count(*) AS BIGINT) AS ov
         |  FROM j CROSS JOIN (SELECT unnest(range(1, 11)) AS d) dd
         |  WHERE dmin <= dd.d GROUP BY 1, 2),
         |tm AS (SELECT query_id, d, (${rboWeightCase("d")}) * CAST(ov AS DOUBLE) AS term FROM dep),
         |f AS (SELECT query_id, list(term ORDER BY d) AS cs FROM tm GROUP BY 1),
         |o AS (SELECT query_id, round(list_reduce(list_prepend(0.0, cs),
         |    (x, y) -> x + y) * (1.0 - 0.9) / 0.9, 6) AS rbo FROM f)
         |SELECT q.query_id, coalesce(o.rbo, 0.0) AS rbo
         |FROM (SELECT DISTINCT query_id FROM qf) q LEFT JOIN o USING (query_id)
         |ORDER BY query_id""".stripMargin.replace("\n", " ")),
    // x86's unrolled tick-quantized iteration with the seed CASE: teleport
    // only where node ∈ sd (even node ids < 8 ≡ the Spark seed range —
    // supplier keys start at 0 in this corpus)
    "x119_ppr" -> {
      val head =
        "WITH e0 AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "und AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0), " +
          "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und GROUP BY src), " +
          "sd AS MATERIALIZED (SELECT src AS node FROM deg WHERE src % 2 = 0 AND src < 8), " +
          "ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM sd), " +
          "r0 AS MATERIALIZED (SELECT d.src AS node, " +
          "CASE WHEN s.node IS NOT NULL THEN " +
          "floor(CAST(1.0 AS DOUBLE) / ns.ns * 1e12 + 0.5) / 1e12 " +
          "ELSE CAST(0.0 AS DOUBLE) END AS rank " +
          "FROM deg d LEFT JOIN sd s ON s.node = d.src CROSS JOIN ns)"
      def iter(k: Int) =
        s"r$k AS MATERIALIZED (SELECT u.dst AS node, " +
          "floor((CASE WHEN s.node IS NOT NULL THEN " +
          "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / ns.ns " +
          "ELSE CAST(0.0 AS DOUBLE) END + " +
          "CAST(0.85 AS DOUBLE) * (CAST(sum(CAST(floor(r.rank / d.deg * 1e12 + 0.5) " +
          "AS BIGINT)) AS DOUBLE) / 1e12)) * 1e12 + 0.5) / 1e12 AS rank " +
          s"FROM und u JOIN r${k - 1} r ON u.src = r.node " +
          "JOIN deg d ON d.src = u.src " +
          "LEFT JOIN sd s ON s.node = u.dst CROSS JOIN ns " +
          "GROUP BY u.dst, s.node, ns.ns)"
      head + ", " + (1 to 5).map(iter).mkString(", ") +
        " SELECT node, rank FROM r5 ORDER BY node"
    },
    // exact overlaps re-derived via the distinct-token join; staged
    // engine estimates joined in and gated — identical inclusion-
    // exclusion arithmetic on both sides
    "x120_hll_overlap" ->
      (s"""WITH est AS (SELECT source_a, source_b, overlap_est FROM ${Stage.sqlRef("x120_overlap_est")}),
         |tk AS (SELECT DISTINCT source, t FROM (SELECT source, unnest($toks) AS t
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3'))),
         |ex AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS overlap_exact
         |  FROM tk a JOIN tk b ON a.t = b.t AND a.source < b.source GROUP BY 1, 2)
         |SELECT e.source_a, e.source_b, ex.overlap_exact,
         |  CAST(e.overlap_est AS BIGINT) AS overlap_est,
         |  abs(CAST(e.overlap_est AS DOUBLE) - overlap_exact) <= overlap_exact * 0.15 AS within_15pct
         |FROM est e JOIN ex USING (source_a, source_b)
         |ORDER BY source_a, source_b""".stripMargin.replace("\n", " ")),
    // same UTC day truncation, same day-ordered value list, and
    // list_reduce's first-element seeding ≡ the Spark slice-from-2 fold
    // with element_at(vals, 1) init — one shared recursion
    "x121_ewma_daily" ->
      ("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
         |v AS (SELECT event_type, list_transform(list(n ORDER BY day),
         |    x -> CAST(x AS DOUBLE)) AS vals FROM d GROUP BY 1)
         |SELECT event_type, CAST(len(vals) AS BIGINT) AS n_days,
         |  round(list_reduce(vals, (acc, x) ->
         |    CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc), 6) AS ewma
         |FROM v ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // x123 ≡ x121's oracle verbatim: the stream-maintained daily counts
    // must land exactly where the batch aggregate does
    "x123_stream_ewma" ->
      ("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
         |v AS (SELECT event_type, list_transform(list(n ORDER BY day),
         |    x -> CAST(x AS DOUBLE)) AS vals FROM d GROUP BY 1)
         |SELECT event_type, CAST(len(vals) AS BIGINT) AS n_days,
         |  round(list_reduce(vals, (acc, x) ->
         |    CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc), 6) AS ewma
         |FROM v ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // same hour truncation, same generate_series grid off one min/max
    // row, same epoch-micros projection and zero fill
    "x124_gap_fill" ->
      ("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
         |r AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
         |t AS (SELECT DISTINCT event_type FROM e),
         |g AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
         |  FROM t CROSS JOIN r),
         |c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n0 FROM e GROUP BY 1, 2)
         |SELECT g.event_type, epoch_us(g.h) AS hour_us,
         |  CAST(coalesce(c.n0, 0) AS BIGINT) AS n, c.n0 IS NOT NULL AS observed
         |FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
         |ORDER BY g.event_type, hour_us""".stripMargin.replace("\n", " ")),
    // same per-bucket distinct token sets, same min-bucket first-seen
    // reduction, same division
    "x125_vocab_novelty" ->
      (s"""WITH tb AS (SELECT DISTINCT bucket, t FROM (
         |    SELECT doc_id // 50 AS bucket, unnest($toks) AS t FROM documents)),
         |f AS (SELECT t, min(bucket) AS fb FROM tb GROUP BY 1)
         |SELECT tb.bucket, CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(CASE WHEN f.fb = tb.bucket THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |  round(CAST(sum(CASE WHEN f.fb = tb.bucket THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS novelty
         |FROM tb JOIN f USING (t) GROUP BY tb.bucket
         |ORDER BY tb.bucket""".stripMargin.replace("\n", " ")),
    // same md5 assignment ticket, same integer micro-sums, and the
    // SHARED Welch t expression string — the IEEE chain cannot drift
    "x126_ab_welch" ->
      (s"""WITH e AS (SELECT CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |    < '8000' THEN 'b' ELSE 'a' END AS variant,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
         |a AS (SELECT CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN vm ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN vm ELSE 0 END) AS BIGINT) AS s_b,
         |    sum(CASE WHEN variant = 'a' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_a,
         |    sum(CASE WHEN variant = 'b' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_b
         |  FROM e)
         |SELECT n_a, n_b,
         |  round((${WelchMean("a")}), 6) AS mean_a,
         |  round((${WelchMean("b")}), 6) AS mean_b,
         |  round($WelchTSql, 6) AS t FROM a""".stripMargin.replace("\n", " ")),
    // same gates re-derived stage by stage: x03's quality CTEs, x04's
    // fingerprint keeper, x40's 5-gram contamination join
    "x127_pipeline_funnel" ->
      (s"""$qualityCtes,
         |s0 AS (SELECT d.doc_id, d.text FROM documents d WHERE d.doc_id % 50 <> 0),
         |s1 AS (SELECT s0.doc_id, s0.text FROM s0 JOIN c USING (doc_id) WHERE c.n > 0),
         |s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN c USING (doc_id)
         |  WHERE CAST(floor(($qualityExprSql) * 10000 + 0.5) AS BIGINT) >= 5000),
         |fp AS (SELECT doc_id, text, md5(lower(array_to_string($toks, ' '))) AS f FROM s2),
         |s3 AS (SELECT doc_id, text FROM (SELECT *, row_number() OVER (
         |    PARTITION BY f ORDER BY doc_id) AS rn FROM fp) WHERE rn = 1),
         |sh3 AS (SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(list_slice(s, i, i + 4), ' ') for i in range(1, len(s) - 3)])) AS sh
         |  FROM (SELECT doc_id, $toks AS s FROM s3)),
         |shb AS (SELECT doc_id, unnest(list_distinct(
         |    [array_to_string(list_slice(s, i, i + 4), ' ') for i in range(1, len(s) - 3)])) AS sh
         |  FROM (SELECT doc_id, $toks AS s FROM documents WHERE doc_id % 50 = 0)),
         |cont AS (SELECT DISTINCT sh3.doc_id FROM sh3 JOIN shb ON sh3.sh = shb.sh),
         |s4 AS (SELECT s3.doc_id FROM s3 LEFT JOIN cont ON cont.doc_id = s3.doc_id
         |  WHERE cont.doc_id IS NULL),
         |cnt AS (SELECT 0 AS stage, 'corpus' AS gate, (SELECT count(*) FROM s0) AS n_docs
         |  UNION ALL SELECT 1, 'non_empty', (SELECT count(*) FROM s1)
         |  UNION ALL SELECT 2, 'quality', (SELECT count(*) FROM s2)
         |  UNION ALL SELECT 3, 'dedup_keeper', (SELECT count(*) FROM s3)
         |  UNION ALL SELECT 4, 'decontaminated', (SELECT count(*) FROM s4))
         |SELECT CAST(stage AS BIGINT) AS stage, gate, CAST(n_docs AS BIGINT) AS n_docs,
         |  coalesce(round(CAST(n_docs AS DOUBLE) / lag(n_docs) OVER (ORDER BY stage), 6),
         |    1.0) AS retention
         |FROM cnt ORDER BY stage""".stripMargin.replace("\n", " ")),
    // same integer largest-remainder arithmetic, same (r DESC, source)
    // leftover order, same ticket rank within source
    "x128_quota_sample" ->
      (s"""WITH d AS (SELECT doc_id, source FROM documents WHERE len($toks) > 0),
         |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
         |b AS (SELECT source, n_s, (100 * n_s) // nt AS base, (100 * n_s) % nt AS r
         |  FROM st CROSS JOIN nn),
         |sb AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM b),
         |q AS (SELECT source, CAST(base + CASE WHEN row_number() OVER (
         |    ORDER BY r DESC, source) <= 100 - sb.sb THEN 1 ELSE 0 END AS BIGINT) AS quota
         |  FROM b CROSS JOIN sb),
         |rk AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY md5('qs1:'||CAST(doc_id AS VARCHAR)), doc_id) AS tr FROM d)
         |SELECT rk.doc_id, rk.source, q.quota
         |FROM rk JOIN q USING (source) WHERE rk.tr <= q.quota
         |ORDER BY rk.source, rk.doc_id""".stripMargin.replace("\n", " ")),
    // same windows, same unrounded p = n/tot, same ln, same seq-ordered
    // fold and final division
    "x136_behavior_perplexity" ->
      ("""WITH e AS (SELECT user_id, event_type, ts, event_id,
         |    CAST(row_number() OVER w AS BIGINT) AS seq,
         |    lead(event_type) OVER w AS next_type FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |tr AS (SELECT * FROM e WHERE next_type IS NOT NULL),
         |cnt AS (SELECT event_type AS cur, next_type AS nxt,
         |    CAST(count(*) AS BIGINT) AS n FROM tr GROUP BY 1, 2),
         |pr AS (SELECT cur, nxt, CAST(n AS DOUBLE) /
         |    CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS p FROM cnt),
         |j AS (SELECT tr.user_id, tr.seq, -ln(pr.p) AS nlp FROM tr
         |  JOIN pr ON pr.cur = tr.event_type AND pr.nxt = tr.next_type),
         |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_tr,
         |    list(nlp ORDER BY seq) AS cs FROM j GROUP BY 1)
         |SELECT user_id, n_tr,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y) / n_tr, 6) AS mean_nlp
         |FROM f ORDER BY user_id""".stripMargin.replace("\n", " ")),
    // the same 5 greedy rounds unrolled: per round the identical
    // (gain DESC, doc_id) argmax over not-yet-picked docs against the
    // accumulated covered set
    "x137_greedy_cover" -> {
      val tCte = s"t AS MATERIALIZED (SELECT doc_id, list_distinct($toks) AS ts " +
        s"FROM documents WHERE len($toks) > 0)"
      def notPicked(i: Int) =
        " WHERE t.doc_id NOT IN (" +
          (1 until i).map(j => s"SELECT doc_id FROM g$j").mkString(" UNION ALL ") + ")"
      def g(i: Int) =
        if (i == 1)
          "g1 AS MATERIALIZED (SELECT doc_id, CAST(len(ts) AS BIGINT) AS gain, ts " +
            "FROM t ORDER BY gain DESC, doc_id LIMIT 1)"
        else
          s"g$i AS MATERIALIZED (SELECT t.doc_id, CAST(len(list_filter(t.ts, " +
            s"x -> NOT list_contains(cv${i - 1}.cov, x))) AS BIGINT) AS gain, t.ts " +
            s"FROM t CROSS JOIN cv${i - 1}${notPicked(i)} " +
            "ORDER BY gain DESC, t.doc_id LIMIT 1)"
      def cv(i: Int) =
        if (i == 1) "cv1 AS MATERIALIZED (SELECT list_distinct(ts) AS cov FROM g1)"
        else s"cv$i AS MATERIALIZED (SELECT list_distinct(flatten(" +
          s"[cv${i - 1}.cov, g$i.ts])) AS cov FROM cv${i - 1} CROSS JOIN g$i)"
      val parts = (1 to 5).flatMap(i => Seq(g(i), cv(i)))
      val sel = (1 to 5).map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, doc_id, gain, " +
          s"(SELECT CAST(len(cov) AS BIGINT) FROM cv$i) AS covered_total FROM g$i")
        .mkString(" UNION ALL ")
      "WITH " + (tCte +: parts).mkString(", ") + " " + sel + " ORDER BY step"
    },
    // two x10-shape rankings, FULL OUTER fusion, the same
    // 1/(60+rank) arithmetic with NULL→0 coalesce
    "x138_rrf_fusion" ->
      (s"""WITH qf AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |itf AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |rf AS (SELECT query_id, item_id, rank AS ra FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
         |qt AS (SELECT query_id, qv[1:16] AS qv FROM qf),
         |itt AS (SELECT item_id, iv[1:16] AS iv FROM itf),
         |rt AS (SELECT query_id, item_id, rank AS rb FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itt CROSS JOIN qt WHERE item_id != query_id) WHERE rank <= 10),
         |u AS (SELECT query_id, item_id,
         |    coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + ra), CAST(0.0 AS DOUBLE)) +
         |    coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rb), CAST(0.0 AS DOUBLE)) AS score
         |  FROM rf FULL OUTER JOIN rt USING (query_id, item_id))
         |SELECT query_id, rank, item_id, round(score, 6) AS score FROM (
         |  SELECT query_id, item_id, score, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, item_id) AS BIGINT) AS rank
         |  FROM u) WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin.replace("\n", " ")),
    // entirely integer numerator (|cumA·nB − cumB·nA|), one final
    // division — no fold ordering anywhere; same (dnum DESC, vm) argmax
    "x134_ks_drift" ->
      ("""WITH v AS (SELECT (user_id % 2 = 0) AS isa,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
         |c AS (SELECT vm, CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM v GROUP BY 1),
         |t AS (SELECT CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb FROM v),
         |cum AS (SELECT vm, CAST(sum(ca) OVER w AS BIGINT) AS cuma,
         |    CAST(sum(cb) OVER w AS BIGINT) AS cumb FROM c
         |  WINDOW w AS (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |d AS (SELECT vm, abs(CAST(cuma AS HUGEINT) * t.nb - CAST(cumb AS HUGEINT) * t.na) AS dnum, t.na, t.nb
         |  FROM cum CROSS JOIN t)
         |SELECT na, nb, round(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks,
         |  round(CAST(vm AS DOUBLE) / 1e6, 6) AS at_value
         |FROM d ORDER BY dnum DESC, vm LIMIT 1""".stripMargin.replace("\n", " ")),
    // same integer margins, the SHARED per-cell contribution string, and
    // the (event_type, half)-ordered fold ≡ list_reduce
    "x135_chi2_drift" ->
      (s"""WITH o AS (SELECT event_type, event_id % 2 AS half,
         |    CAST(count(*) AS BIGINT) AS o FROM events GROUP BY 1, 2),
         |m AS (SELECT *, CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
         |    CAST(sum(o) OVER (PARTITION BY half) AS BIGINT) AS ct FROM o),
         |t AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM o),
         |cells AS (SELECT event_type, half, ($Chi2CellSql) AS contrib
         |  FROM m CROSS JOIN t),
         |f AS (SELECT list(contrib ORDER BY event_type, half) AS cs FROM cells)
         |SELECT (SELECT nn FROM t) AS n,
         |  (SELECT CAST(count(DISTINCT event_type) - 1 AS BIGINT) FROM o) AS dof,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6) AS chi2
         |FROM f""".stripMargin.replace("\n", " ")),
    // same generated sign-word CASE terms (shared builder, v[i]
    // indexing), same Hamming ranking, same x10-shape exact ranking
    "x131_sign_bits_recall" ->
      (s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |w AS (SELECT vec_id, ${signWordExpr(j => s"v[$j]", 0)} AS w1,
         |    ${signWordExpr(j => s"v[$j]", 32)} AS w2 FROM e),
         |qw AS (SELECT vec_id AS query_id, w1 AS q1, w2 AS q2 FROM w WHERE vec_id < 5),
         |st AS (SELECT query_id, item_id FROM (
         |  SELECT qw.query_id, w.vec_id AS item_id,
         |    row_number() OVER (PARTITION BY qw.query_id ORDER BY
         |      bit_count(xor(w.w1, qw.q1)) + bit_count(xor(w.w2, qw.q2)), w.vec_id) AS rank
         |  FROM w CROSS JOIN qw WHERE w.vec_id != qw.query_id) WHERE rank <= 10),
         |qf AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |itf AS (SELECT vec_id AS item_id, v AS iv FROM e),
         |rf AS (SELECT query_id, item_id FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
         |o AS (SELECT rf.query_id, CAST(count(*) AS BIGINT) AS overlap
         |  FROM rf JOIN st USING (query_id, item_id) GROUP BY 1)
         |SELECT q.query_id, CAST(coalesce(o.overlap, 0) AS BIGINT) AS overlap,
         |  round(CAST(coalesce(o.overlap, 0) AS DOUBLE) / 10.0, 4) AS recall_at_10
         |FROM (SELECT DISTINCT query_id FROM qf) q LEFT JOIN o USING (query_id)
         |ORDER BY query_id""".stripMargin.replace("\n", " ")),
    // x10's oracle with the label-mismatch residual and k=3
    "x132_hard_negatives" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < 5),
         |i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv, label AS il FROM embeddings)
         |SELECT query_id, rank, item_id, round(cos, 4) AS cos FROM (
         |  SELECT query_id, item_id, $cosSql AS cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
         |  FROM i CROSS JOIN q WHERE item_id != query_id AND il != ql)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin.replace("\n", " ")),
    // same integer centroid directions (cosine is scale-invariant, so
    // the micro-int component sums ARE the centroids), same quantized
    // cosine means, same division order
    "x133_class_separation" ->
      ("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |comp AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
         |cm AS (SELECT label, pos,
         |    CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sm
         |  FROM comp GROUP BY 1, 2),
         |cent AS (SELECT label, list_transform(list(sm ORDER BY pos),
         |    s -> CAST(s AS DOUBLE)) AS cvec FROM cm GROUP BY label),
         |ia AS (SELECT e.label, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(floor((list_dot_product(e.v, c.cvec) /
         |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))))
         |      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS si
         |  FROM e JOIN cent c USING (label) GROUP BY 1),
         |ie AS (SELECT e.label, CAST(count(*) AS BIGINT) AS no,
         |    CAST(sum(CAST(floor((list_dot_product(e.v, c.cvec) /
         |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))))
         |      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS so
         |  FROM e JOIN cent c ON e.label != c.label GROUP BY 1)
         |SELECT ia.label, ia.n,
         |  round((CAST(si AS DOUBLE) / 1e6) / n, 6) AS intra_cos,
         |  round((CAST(so AS DOUBLE) / 1e6) / no, 6) AS inter_cos,
         |  round((CAST(si AS DOUBLE) / 1e6) / n - (CAST(so AS DOUBLE) / 1e6) / no, 6) AS margin
         |FROM ia JOIN ie USING (label) ORDER BY ia.label""".stripMargin.replace("\n", " ")),
    // same sequence-space intervals (row_number over (ts, event_id)),
    // same integer cumulative thresholds, same range-residual join
    "x129_scd2_tiers" ->
      ("""WITH e AS (SELECT user_id, event_type, ts, event_id,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
         |s AS (SELECT *, CAST(row_number() OVER w AS BIGINT) AS seq,
         |    CAST(sum(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |t AS (SELECT *, CASE WHEN cum < 100000000 THEN 0
         |    WHEN cum < 500000000 THEN 1 ELSE 2 END AS tier FROM s),
         |l AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY seq) AS prev_tier FROM t),
         |d AS (SELECT user_id, tier, seq AS vf,
         |    lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS vt
         |  FROM l WHERE prev_tier IS NULL OR tier <> prev_tier),
         |p AS (SELECT user_id, seq, vm FROM l WHERE event_type = 'purchase')
         |SELECT CAST(d.tier AS BIGINT) AS tier, CAST(count(*) AS BIGINT) AS n_purchases,
         |  round(CAST(sum(p.vm) AS DOUBLE) / 1e6, 6) AS amount
         |FROM p JOIN d ON d.user_id = p.user_id AND p.seq >= d.vf
         |  AND (d.vt IS NULL OR p.seq < d.vt)
         |GROUP BY d.tier ORDER BY tier""".stripMargin.replace("\n", " ")),
    // the same 6 peel rounds unrolled — degree aggregate + two endpoint
    // semi-joins per round over the same canonical co-purchase edges
    "x130_kcore" -> {
      val head =
        "WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
          "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
          "JOIN po b ON a.ok = b.ok AND a.pk < b.pk)"
      def round(i: Int) =
        s"d$i AS MATERIALIZED (SELECT x, count(*) AS c FROM " +
          s"(SELECT u AS x FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY x), " +
          s"k$i AS MATERIALIZED (SELECT x FROM d$i WHERE c >= 75), " +
          s"e$i AS MATERIALIZED (SELECT e${i - 1}.u, e${i - 1}.v FROM e${i - 1} " +
          s"JOIN k$i a ON a.x = e${i - 1}.u JOIN k$i b ON b.x = e${i - 1}.v)"
      head + ", " + (1 to 6).map(round).mkString(", ") +
        " SELECT x AS node, CAST(count(*) AS BIGINT) AS deg FROM " +
        "(SELECT u AS x FROM e6 UNION ALL SELECT v FROM e6) GROUP BY x ORDER BY node"
    },
    // same blocking/rank/window as x91, same unit-cost levenshtein
    "x122_edit_pairs" ->
      ("""WITH k AS (SELECT doc_id AS id, lang AS blk, text,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS bk
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY blk ORDER BY bk, id) AS rnk FROM k),
         |p AS (SELECT a.blk, a.id AS id_a, a.text AS ta, a.rnk + s.k AS tgt
         |  FROM r a CROSS JOIN (SELECT unnest(range(1, 6)) AS k) s),
         |c AS (SELECT p.id_a, b.id AS id_b,
         |    CAST(levenshtein(p.ta, b.text) AS BIGINT) AS dist
         |  FROM p JOIN r b ON b.blk = p.blk AND b.rnk = p.tgt)
         |SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b, dist
         |FROM c WHERE dist <= 60 ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    // same distinct + order-keyed pair join, same c_ab ≥ 3 floor, same
    // IEEE-exact √ cosine
    "x117_copurchase_sim" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |p AS (SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS c_ab
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
         |m AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1)
         |SELECT p.part_a, p.part_b, p.c_ab,
         |  round(CAST(p.c_ab AS DOUBLE) / sqrt(CAST(ma.c * mb.c AS DOUBLE)), 6) AS sim
         |FROM p JOIN m ma ON ma.pk = p.part_a JOIN m mb ON mb.pk = p.part_b
         |WHERE p.c_ab >= 3 ORDER BY p.part_a, p.part_b""".stripMargin.replace("\n", " ")),
    // the SAME 32-term interleave string (shared constant, // division),
    // same block width and min/max stats
    "x118_zorder_blocks" ->
      (s"""WITH z AS (SELECT l_partkey AS pk, l_suppkey AS sk,
         |    ${zorderExpr("l_partkey", "l_suppkey", "//")} AS z FROM lineitem)
         |SELECT z // 4096 AS block, CAST(count(*) AS BIGINT) AS n,
         |  min(pk) AS pk_min, max(pk) AS pk_max,
         |  min(sk) AS sk_min, max(sk) AS sk_max
         |FROM z GROUP BY 1 ORDER BY block""".stripMargin.replace("\n", " ")),
    // same literal blocklist (one shared constant), same hit-rate gate
    "x116_blocklist_gate" ->
      (s"""WITH t AS (SELECT doc_id, $toks AS ts FROM documents),
         |c AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(ts, x -> list_contains([${BlocklistTerms.map("'" + _ + "'").mkString(", ")}], x))) AS BIGINT) AS n_hits
         |  FROM t WHERE len(ts) > 0)
         |SELECT doc_id, n_tok, n_hits,
         |  CAST(n_hits AS DOUBLE) > CAST(n_tok AS DOUBLE) * 0.1 AS blocked
         |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // x88's score derivation (same features, same written weights row),
    // then the SAME micro-quantized sigmoid, decile binning, and
    // integer-sum bin means
    "x139_calibration" ->
      (s"$qualityCtes, " +
        "f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
        s"w AS (SELECT weights, intercept FROM ${Stage.sqlRef("x139_weights")}), " +
        "z AS (SELECT doc_id, round(intercept + weights[1] * f0 + weights[2] * f1 + " +
        "weights[3] * f2 + weights[4] * f3, 6) AS score FROM f CROSS JOIN w), " +
        "lab AS (SELECT z.doc_id, z.score, CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos " +
        "FROM z JOIN documents d USING (doc_id)), " +
        "q AS (SELECT CAST(floor(1e6 / (1.0 + exp(-score)) + 0.5) AS BIGINT) AS pm, pos, " +
        "CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rk, " +
        "(SELECT count(*) FROM lab) AS nn FROM lab), " +
        "b AS (SELECT ((rk - 1) * 10) // nn AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(pm) AS BIGINT) AS sp, CAST(sum(pos) AS BIGINT) AS np FROM q GROUP BY 1) " +
        "SELECT CAST(bin AS BIGINT) AS bin, n, " +
        "round(CAST(sp AS DOUBLE) / 1e6 / n, 6) AS mean_pred, " +
        "round(CAST(np AS DOUBLE) / n, 6) AS frac_pos, " +
        "round(CAST(sp AS DOUBLE) / 1e6 / n - CAST(np AS DOUBLE) / n, 6) AS gap " +
        "FROM b ORDER BY bin"),
    // same two gates (n_chars vs the shared whitespace tokenizer), same
    // integer confusion counts, the SAME KappaSql chain
    "x140_cohens_kappa" ->
      (s"""WITH l AS (SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS la,
         |    CASE WHEN len($toks) >= 40 THEN 1 ELSE 0 END AS lb FROM documents),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(la * lb) AS BIGINT) AS n11,
         |    CAST(sum(la * (1 - lb)) AS BIGINT) AS n10,
         |    CAST(sum((1 - la) * lb) AS BIGINT) AS n01 FROM l),
         |f AS (SELECT n, n11, n10, n01, n - n11 - n10 - n01 AS n00 FROM c)
         |SELECT n, n11, n10, n01, CAST(n00 AS BIGINT) AS n00,
         |  round($KappaSql, 6) AS kappa FROM f"""
        .stripMargin.replace("\n", " ")),
    // same distinct baskets, same directed-pair counts and >= 5 floor,
    // same three fixed-order ratio chains
    "x141_assoc_rules" ->
      ("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         |tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
         |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY 1),
         |p AS (SELECT a.event_type AS ante, b.event_type AS cons,
         |    CAST(count(*) AS BIGINT) AS n_ab
         |  FROM ut a JOIN ut b ON a.user_id = b.user_id
         |    AND a.event_type <> b.event_type
         |  GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT p.ante, p.cons, p.n_ab, sa.c AS n_a, sb.c AS n_b,
         |  round(CAST(p.n_ab AS DOUBLE) / nu, 6) AS support,
         |  round(CAST(p.n_ab AS DOUBLE) / sa.c, 6) AS confidence,
         |  round(CAST(p.n_ab AS DOUBLE) * nu / (CAST(sa.c AS DOUBLE) * sb.c), 6) AS lift
         |FROM p JOIN s sa ON sa.event_type = p.ante
         |  JOIN s sb ON sb.event_type = p.cons CROSS JOIN tot
         |ORDER BY ante, cons""".stripMargin.replace("\n", " ")),
    // same top-100 cut, same micro-quantized ln terms, the SAME
    // normal-equation strings over the exact integer sums
    "x142_zipf_fit" ->
      (s"""WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($toks) AS t FROM documents)
         |  GROUP BY 1 ORDER BY c DESC, t LIMIT 100),
         |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT) AS rk FROM c),
         |q AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS xm,
         |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ym FROM r),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xm) AS BIGINT) AS sx,
         |    CAST(sum(ym) AS BIGINT) AS sy, CAST(sum(xm * ym) AS BIGINT) AS sxy,
         |    CAST(sum(xm * xm) AS BIGINT) AS sxx FROM q)
         |SELECT n AS n_terms, round($ZipfSlopeSql, 6) AS slope,
         |  round($ZipfInterceptSql, 6) AS intercept FROM s"""
        .stripMargin.replace("\n", " ")),
    // DuckDB's native Sunday=0 dow (the Spark side shifts to match),
    // same integer micro-sums, the SAME two-level ratio string
    "x143_seasonal_index" ->
      (s"""WITH e AS (SELECT dayofweek(ts) AS dow,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(vm) AS BIGINT) AS st FROM e),
         |g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(vm) AS BIGINT) AS sv
         |  FROM e GROUP BY 1)
         |SELECT CAST(dow AS BIGINT) AS dow, n,
         |  round(CAST(sv AS DOUBLE) / 1e6 / n, 6) AS dow_mean,
         |  round($SeasonalSql, 6) AS seasonal_index
         |FROM g CROSS JOIN t ORDER BY dow""".stripMargin.replace("\n", " ")),
    // same integer S·D numerator and the same (|S·D| DESC, day) argmax
    "x144_cusum_changepoint" -> CusumOracleSql,
    // x149 ≡ x144's oracle verbatim: the stream-maintained daily counts
    // must land exactly where the batch aggregate does
    "x149_stream_cusum" -> CusumOracleSql,
    // both rounds unrolled: the identical (count DESC, label ASC)
    // per-node argmax over neighbor labels
    "x145_label_prop" ->
      ("""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ud AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |ed AS (SELECT u, v FROM ud UNION ALL SELECT v AS u, u AS v FROM ud),
         |r1 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, e.v AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, e.v) AS rk
         |  FROM ed e GROUP BY 1, 2) WHERE rk = 1),
         |r2 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, l.label AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, l.label) AS rk
         |  FROM ed e JOIN r1 l ON l.node = e.v GROUP BY 1, 2) WHERE rk = 1)
         |SELECT node, CAST(label AS BIGINT) AS label FROM r2 ORDER BY node"""
        .stripMargin.replace("\n", " ")),
    // same k≥2 micro-quantized 1/ln(order size) weights, same
    // order-keyed pair join and integer-keyed top-50
    "x146_adamic_adar" ->
      ("""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |osz AS (SELECT ok, CAST(floor(1e6 / ln(CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS wm
         |  FROM po GROUP BY 1 HAVING count(*) >= 2),
         |p AS (SELECT a.pk AS u, b.pk AS v, CAST(sum(w.wm) AS BIGINT) AS swm,
         |    CAST(count(*) AS BIGINT) AS n_common
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
         |  JOIN osz w ON w.ok = a.ok GROUP BY 1, 2)
         |SELECT u, v, n_common, round(CAST(swm AS DOUBLE) / 1e6, 6) AS aa_score
         |FROM p ORDER BY swm DESC, u, v LIMIT 50"""
        .stripMargin.replace("\n", " ")),
    // same shared per-term contribution string over exact integer
    // (tf, dl, df, nn, tt), same term-ordered fold ≡ list_reduce
    "x147_bm25" ->
      (s"""WITH d AS (SELECT doc_id, $toks AS ts FROM documents),
         |dd AS (SELECT doc_id, ts FROM d WHERE len(ts) > 0),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS nn,
         |    CAST(sum(len(ts)) AS BIGINT) AS tt FROM dd),
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf,
         |    CAST(max(dl) AS BIGINT) AS dl FROM (
         |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS t FROM dd)
         |  WHERE t IN (${Bm25Query.map("'" + _ + "'").mkString(", ")})
         |  GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |c AS (SELECT tf.doc_id, tf.term, tf.dl, ($Bm25TermSql) AS contrib
         |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN t),
         |f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(max(dl) AS BIGINT) AS dl,
         |    list(contrib ORDER BY term) AS cs FROM c GROUP BY 1)
         |SELECT doc_id, n_terms, dl,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6) AS bm25
         |FROM f ORDER BY bm25 DESC, doc_id LIMIT 50"""
        .stripMargin.replace("\n", " ")),
    // x138's two ranking shapes, the SAME literal discount table and
    // graded relevance, rank-ordered fold ≡ list_reduce
    "x148_ndcg" ->
      (s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |qf AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |itf AS (SELECT vec_id AS item_id, v AS iv FROM e),
         |rf AS (SELECT query_id, item_id, CAST(11 - rank AS BIGINT) AS rel FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
         |qt AS (SELECT query_id, qv[1:16] AS qv FROM qf),
         |itt AS (SELECT item_id, iv[1:16] AS iv FROM itf),
         |rt AS (SELECT query_id, item_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT query_id, item_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM itt CROSS JOIN qt WHERE item_id != query_id) WHERE rank <= 10),
         |j AS (SELECT rt.query_id, rt.rank,
         |    coalesce(rf.rel, CAST(0 AS BIGINT)) AS rel
         |  FROM rt LEFT JOIN rf USING (query_id, item_id)),
         |c AS (SELECT query_id, rank, ($NdcgContribSql) AS contrib FROM j),
         |f AS (SELECT query_id, list(contrib ORDER BY rank) AS cs FROM c GROUP BY 1)
         |SELECT query_id,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6) AS dcg,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y) /
         |    CAST($IdcgVal AS DOUBLE), 6) AS ndcg
         |FROM f ORDER BY query_id""".stripMargin.replace("\n", " ")),
    // same char cleaning, same trigram/bigram explode, same add-1 chain
    // nano-quantized to order-free integer sums
    "x163_char_trigram_lm" ->
      ("""WITH d AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS cs
         |  FROM documents),
         |dd AS (SELECT doc_id, cs FROM d WHERE len(cs) >= 3),
         |i0 AS (SELECT doc_id, [{'tri': substr(cs, i, 3), 'bi': substr(cs, i, 2)}
         |    for i in range(1, len(cs) - 1)] AS ps FROM dd),
         |inst AS (SELECT doc_id, p.tri AS tri, p.bi AS bi
         |  FROM (SELECT doc_id, unnest(ps) AS p FROM i0)),
         |c3 AS (SELECT tri, CAST(count(*) AS BIGINT) AS c3 FROM inst GROUP BY 1),
         |c2 AS (SELECT bi, CAST(count(*) AS BIGINT) AS c2 FROM inst GROUP BY 1),
         |v3 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c3),
         |l AS (SELECT inst.doc_id, CAST(floor(ln((c3.c3 + 1.0)
         |    / CAST(c2.c2 + v3.v AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS lpm
         |  FROM inst JOIN c3 USING (tri) JOIN c2 USING (bi) CROSS JOIN v3),
         |f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
         |    CAST(sum(lpm) AS BIGINT) AS slpm FROM l GROUP BY 1)
         |SELECT doc_id, n_tri,
         |  round(CAST(slpm AS DOUBLE) / 1e9 / n_tri, 6) AS mean_lp
         |FROM f ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // same global md5 keeper rule, same integer per-source sums
    "x164_dedup_impact" ->
      (s"""WITH d AS (SELECT doc_id, source, md5(text) AS h,
         |    CAST(len($toks) AS BIGINT) AS ntk FROM documents),
         |k AS (SELECT source, ntk, CASE WHEN row_number() OVER
         |    (PARTITION BY h ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS keep FROM d),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(keep) AS BIGINT) AS n_kept, CAST(sum(ntk) AS BIGINT) AS tokens,
         |    CAST(sum(keep * ntk) AS BIGINT) AS tokens_kept FROM k GROUP BY 1)
         |SELECT source, n_docs, n_kept, tokens,
         |  CAST(tokens - tokens_kept AS BIGINT) AS tokens_removed,
         |  round(CAST(tokens - tokens_kept AS DOUBLE) / tokens, 6) AS pct_removed
         |FROM g ORDER BY source""".stripMargin.replace("\n", " ")),
    // x91's candidate generation, the SAME md5-ticket top-2000 sample,
    // the STAGED signatures re-read (agreement recomputed in SQL), the
    // same shingle exact-J and micro-quantized errors
    "x165_minhash_estimate" ->
      (s"""WITH k AS (SELECT doc_id, lang, list_distinct($toks) AS ts, $toks AS s,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS bk
         |  FROM documents),
         |t AS (SELECT doc_id, lang, ts, bk, $shingleSql AS sh FROM k),
         |r AS (SELECT doc_id, lang, ts, sh, CAST(row_number() OVER
         |    (PARTITION BY lang ORDER BY bk, doc_id) AS BIGINT) AS rnk FROM t),
         |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, a.ts AS tsa, b.ts AS tsb,
         |    a.sh AS sha, b.sh AS shb
         |  FROM r a CROSS JOIN (SELECT unnest(range(1, 6)) AS d) s
         |  JOIN r b ON b.lang = a.lang AND b.rnk = a.rnk + s.d),
         |f0 AS (SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b, sha, shb
         |  FROM cand WHERE len(list_distinct(list_concat(tsa, tsb))) > 0),
         |samp AS (SELECT id_a, id_b, sha, shb FROM f0
         |  ORDER BY md5(CAST(id_a AS VARCHAR) || ':' || CAST(id_b AS VARCHAR)),
         |    id_a, id_b LIMIT 2000),
         |f AS (SELECT id_a, id_b, sha, shb FROM samp
         |  WHERE len(list_distinct(list_concat(sha, shb))) > 0),
         |g AS (SELECT
         |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), x -> x[1] = x[2])) AS BIGINT) AS agree,
         |    CAST(len(list_intersect(f.sha, f.shb)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(f.sha, f.shb))) AS DOUBLE) AS j
         |  FROM f JOIN ${Stage.sqlRef("x165_sigs")} sa ON sa.id = f.id_a
         |  JOIN ${Stage.sqlRef("x165_sigs")} sb ON sb.id = f.id_b),
         |e AS (SELECT agree, CAST(floor(abs(CAST(agree AS DOUBLE) / 128.0 - j)
         |    * 1e6 + 0.5) AS BIGINT) AS em FROM g)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(em) AS DOUBLE) / 1e6 / count(*), 6) AS mean_abs_err,
         |  round(CAST(max(em) AS DOUBLE) / 1e6, 6) AS max_abs_err
         |FROM e""".stripMargin.replace("\n", " ")),
    // same integer tf·idf weights, same DECIMAL(38,0) dot/norm sums,
    // the SAME cosine string
    "x160_tfidf_search" ->
      (s"""WITH kt AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents) GROUP BY 1, 2),
         |tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nn FROM kt),
         |idf AS (SELECT t, CAST(floor(ln(CAST(nn + 1 AS DOUBLE) / (count(*) + 1))
         |    * 1e6 + 0.5) AS BIGINT) AS idfm FROM kt CROSS JOIN tot GROUP BY t, nn),
         |w AS (SELECT doc_id, t, tf * idfm AS w FROM kt JOIN idf USING (t)),
         |norms AS (SELECT doc_id, sum(CAST(w * w AS DECIMAL(38,0))) AS nsq
         |  FROM w GROUP BY 1),
         |qw AS (SELECT doc_id AS query_id, t, w AS wq FROM w WHERE doc_id < 3),
         |dots AS (SELECT qw.query_id, w.doc_id,
         |    sum(CAST(w.w * qw.wq AS DECIMAL(38,0))) AS dot
         |  FROM w JOIN qw USING (t) WHERE w.doc_id != qw.query_id GROUP BY 1, 2),
         |c AS (SELECT query_id, doc_id, $TfidfCosSql AS cos FROM dots
         |  JOIN (SELECT doc_id, nsq AS nd FROM norms) jn USING (doc_id)
         |  JOIN (SELECT doc_id AS query_id, nsq AS nq FROM norms) jq USING (query_id))
         |SELECT query_id, rank, doc_id, round(cos, 6) AS cos FROM (
         |  SELECT query_id, doc_id, cos, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS BIGINT) AS rank
         |  FROM c) WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin.replace("\n", " ")),
    // the x06/x92 all-pairs truth CTE + x08's staged banded candidates,
    // integer count ratios
    "x161_simhash_eval" -> {
      val chunkRows = Dedup.simhashChunkSpec(10)
        .map { case (c, off, mask) => s"($c, $off, $mask)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, $shingleSql AS sh
         |  FROM (SELECT doc_id, $toks AS s FROM documents)),
         |tr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM t a JOIN t b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
         |s AS (SELECT id, sh FROM ${Stage.sqlRef("x161_simhash")}),
         |ch(c_idx, c_off, c_mask) AS (VALUES $chunkRows),
         |c AS (SELECT id, sh, c_idx, (sh >> c_off) & c_mask AS chunk_val
         |  FROM s CROSS JOIN ch),
         |pr AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM c a
         |  JOIN c b ON a.c_idx = b.c_idx AND a.chunk_val = b.chunk_val
         |    AND a.id < b.id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 10),
         |tpc AS (SELECT CAST(count(*) AS BIGINT) AS tp FROM pr JOIN tr USING (id_a, id_b)),
         |cnt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_truth,
         |    (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_pred)
         |SELECT n_truth, n_pred, tp,
         |  round(CAST(tp AS DOUBLE) / n_pred, 6) AS precision,
         |  round(CAST(tp AS DOUBLE) / n_truth, 6) AS recall,
         |  round(CAST(2 * tp AS DOUBLE) / (n_pred + n_truth), 6) AS f1
         |FROM cnt CROSS JOIN tpc""".stripMargin.replace("\n", " ")
    },
    // the shared x03 quality derivation, the same DESC cumulative
    // counts, the SAME micro-F1 string and (f1m DESC, score DESC) argmax
    "x162_optimal_threshold" ->
      (s"$qualityCtes, " +
        s"sc AS (SELECT $qualityExprSql AS score, " +
        "CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos " +
        "FROM c JOIN documents d USING (doc_id)), " +
        "g AS (SELECT score, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(pos) AS BIGINT) AS np FROM sc GROUP BY 1), " +
        "tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(np) AS BIGINT) AS p FROM g), " +
        "cum AS (SELECT score, CAST(sum(np) OVER w AS BIGINT) AS tp, " +
        "CAST(sum(n) OVER w AS BIGINT) AS predn FROM g " +
        "WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "f AS (SELECT score, tp, predn - tp AS fp, tt.p - tp AS fn FROM cum CROSS JOIN tt), " +
        s"x AS (SELECT score, tp, fp, fn, $F1MicroSql AS f1m FROM f) " +
        "SELECT score AS threshold, tp, fp, fn, " +
        "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision, " +
        "round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall, " +
        "round(CAST(f1m AS DOUBLE) / 1e6, 6) AS f1 " +
        "FROM x ORDER BY f1m DESC, score DESC LIMIT 1"),
    // x91's blocking + the same integer idf sums and the same
    // 10·sI ≥ 3·(sA+sB−sI) integer gate
    "x157_weighted_jaccard" ->
      (s"""WITH k AS (SELECT doc_id, lang, list_distinct($toks) AS ts,
         |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS bk
         |  FROM documents),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM k),
         |dfr AS (SELECT t, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT unnest(ts) AS t FROM k) GROUP BY 1),
         |idf AS (SELECT t, CAST(floor(ln(CAST(nn + 1 AS DOUBLE) / (df + 1))
         |    * 1e6 + 0.5) AS BIGINT) AS wm FROM dfr CROSS JOIN tot),
         |docw AS (SELECT kt.doc_id AS id, CAST(sum(idf.wm) AS BIGINT) AS sw
         |  FROM (SELECT doc_id, unnest(ts) AS t FROM k) kt
         |  JOIN idf ON idf.t = kt.t GROUP BY 1),
         |r AS (SELECT doc_id, lang, ts, CAST(row_number() OVER
         |    (PARTITION BY lang ORDER BY bk, doc_id) AS BIGINT) AS rnk FROM k),
         |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, a.ts AS tsa, b.ts AS tsb
         |  FROM r a CROSS JOIN (SELECT unnest(range(1, 6)) AS d) s
         |  JOIN r b ON b.lang = a.lang AND b.rnk = a.rnk + s.d),
         |si AS (SELECT ida, idb, CAST(sum(idf.wm) AS BIGINT) AS si
         |  FROM (SELECT ida, idb, unnest(list_intersect(tsa, tsb)) AS t FROM cand) ci
         |  JOIN idf ON idf.t = ci.t GROUP BY 1, 2),
         |f AS (SELECT least(c.ida, c.idb) AS id_a, greatest(c.ida, c.idb) AS id_b,
         |    coalesce(si.si, 0) AS si, da.sw + db.sw - coalesce(si.si, 0) AS su
         |  FROM cand c LEFT JOIN si ON si.ida = c.ida AND si.idb = c.idb
         |  JOIN docw da ON da.id = c.ida JOIN docw db ON db.id = c.idb)
         |SELECT id_a, id_b, round(CAST(si AS DOUBLE) / CAST(su AS DOUBLE), 6) AS wjaccard
         |FROM f WHERE su > 0 AND 10 * si >= 3 * su
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    // same Monday-epoch integer week index, the SAME state CASE string
    "x158_lifecycle_cohorts" ->
      (s"""WITH w AS (SELECT DISTINCT user_id,
         |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
         |d AS (SELECT user_id, wk,
         |    datediff('day', DATE '1970-01-05', wk) // 7 AS wd FROM w),
         |l AS (SELECT user_id, wk, wd,
         |    lag(wd) OVER (PARTITION BY user_id ORDER BY wd) AS pwd FROM d)
         |SELECT wk, $LifecycleCaseSql AS state,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM l GROUP BY 1, 2 ORDER BY wk, state"""
        .stripMargin.replace("\n", " ")),
    // same two distance explodes, same integer 1e6/d weights and
    // integer-keyed top-50
    "x159_skipgram_pairs" ->
      (s"""WITH m AS (SELECT $toks AS s FROM documents),
         |g1 AS (SELECT unnest([{'a': s[i], 'b': s[i+1]} for i in range(1, len(s))]) AS p
         |  FROM m WHERE len(s) > 1),
         |g2 AS (SELECT unnest([{'a': s[i], 'b': s[i+2]} for i in range(1, len(s) - 1)]) AS p
         |  FROM m WHERE len(s) > 2),
         |u AS (SELECT p.a AS a, p.b AS b, 1 AS d FROM g1
         |  UNION ALL SELECT p.a AS a, p.b AS b, 2 AS d FROM g2),
         |g AS (SELECT a, b,
         |    CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(1000000 // d) AS BIGINT) AS swm FROM u GROUP BY 1, 2)
         |SELECT a, b, n1, n2, round(CAST(swm AS DOUBLE) / 1e6, 6) AS score
         |FROM g ORDER BY swm DESC, a, b LIMIT 50"""
        .stripMargin.replace("\n", " ")),
    // the same micro-quantized pool/sims and the same integer
    // 7·relm − 3·maxsimm greedy, all 5 rounds unrolled
    "x156_mmr_diversify" -> {
      val head =
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qf AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
           |itf AS (SELECT vec_id AS item_id, v AS iv FROM e),
           |pool AS (SELECT query_id, item_id, relm, iv FROM (
           |  SELECT query_id, item_id,
           |    CAST(floor(($cosSql) * 1e6 + 0.5) AS BIGINT) AS relm, iv,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY $cosSql DESC, item_id) AS rank
           |  FROM itf CROSS JOIN qf WHERE item_id != query_id) WHERE rank <= 10),
           |sims AS (SELECT x.query_id, x.item_id AS ca, y.item_id AS cb,
           |    CAST(floor((list_dot_product(x.iv, y.iv) /
           |      (sqrt(list_dot_product(x.iv, x.iv)) * sqrt(list_dot_product(y.iv, y.iv))))
           |      * 1e6 + 0.5) AS BIGINT) AS simm
           |  FROM pool x JOIN pool y ON x.query_id = y.query_id
           |    AND x.item_id != y.item_id),
           |r1 AS (SELECT query_id, item_id, scorem FROM (
           |  SELECT query_id, item_id, 7 * relm AS scorem,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY 7 * relm DESC, item_id) AS rk FROM pool) WHERE rk = 1),
           |pk1 AS (SELECT query_id, item_id FROM r1)"""
          .stripMargin.replace("\n", " ")
      def round(i: Int): String = {
        val prev = s"pk${i - 1}"
        (s"""m$i AS (SELECT s.query_id, s.ca AS item_id, max(s.simm) AS maxsimm
            |  FROM sims s JOIN $prev pp ON pp.query_id = s.query_id
            |    AND pp.item_id = s.cb GROUP BY 1, 2),
            |r$i AS (SELECT query_id, item_id, scorem FROM (
            |  SELECT p.query_id, p.item_id,
            |    7 * p.relm - 3 * coalesce(m$i.maxsimm, 0) AS scorem,
            |    row_number() OVER (PARTITION BY p.query_id
            |      ORDER BY 7 * p.relm - 3 * coalesce(m$i.maxsimm, 0) DESC,
            |      p.item_id) AS rk
            |  FROM pool p
            |  LEFT JOIN m$i ON m$i.query_id = p.query_id
            |    AND m$i.item_id = p.item_id
            |  LEFT JOIN $prev ex ON ex.query_id = p.query_id
            |    AND ex.item_id = p.item_id
            |  WHERE ex.item_id IS NULL) WHERE rk = 1),
            |pk$i AS (SELECT query_id, item_id FROM $prev
            |  UNION ALL SELECT query_id, item_id FROM r$i)"""
          .stripMargin.replace("\n", " "))
      }
      val sel = (1 to 5).map(i =>
        s"SELECT query_id, CAST($i AS BIGINT) AS pick_no, item_id, " +
          s"round(CAST(scorem AS DOUBLE) / 1e7, 6) AS mmr_score FROM r$i")
        .mkString(" UNION ALL ")
      head + ", " + (2 to 5).map(round).mkString(", ") + " " + sel +
        " ORDER BY query_id, pick_no"
    },
    // x145's unrolled propagation + the same integer 4·m·Σe_c − Σd_c²
    // numerator
    "x154_modularity" ->
      ("""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |ud AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |ed AS (SELECT u, v FROM ud UNION ALL SELECT v AS u, u AS v FROM ud),
         |r1 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, e.v AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, e.v) AS rk
         |  FROM ed e GROUP BY 1, 2) WHERE rk = 1),
         |r2 AS (SELECT node, label FROM (
         |  SELECT e.u AS node, l.label AS label, count(*) AS cnt,
         |    row_number() OVER (PARTITION BY e.u ORDER BY count(*) DESC, l.label) AS rk
         |  FROM ed e JOIN r1 l ON l.node = e.v GROUP BY 1, 2) WHERE rk = 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ud),
         |ec AS (SELECT l1.label, CAST(count(*) AS BIGINT) AS ec FROM ud
         |  JOIN r2 l1 ON l1.node = ud.u JOIN r2 l2 ON l2.node = ud.v
         |  WHERE l1.label = l2.label GROUP BY 1),
         |dg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
         |dc AS (SELECT r2.label, CAST(sum(dg.deg) AS BIGINT) AS dc
         |  FROM dg JOIN r2 ON r2.node = dg.node GROUP BY 1),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    CAST(sum(coalesce(ec.ec, 0)) AS BIGINT) AS sec,
         |    CAST(sum(dc.dc * dc.dc) AS BIGINT) AS sdc2
         |  FROM dc LEFT JOIN ec ON ec.label = dc.label)
         |SELECT n_communities, m,
         |  round(CAST(4 * m * sec - sdc2 AS DOUBLE) / CAST(4 * m * m AS DOUBLE), 6) AS q
         |FROM s CROSS JOIN mm""".stripMargin.replace("\n", " ")),
    // same shared inverse-CDF CASE over the same ticket, same integer
    // replica sums, same order-statistic CI read
    "x155_poisson_bootstrap" ->
      (s"""WITH e AS (SELECT event_id, CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
         |  FROM events),
         |bb AS (SELECT unnest(range(0, 20)) AS b),
         |r AS (SELECT bb.b, e.vm, substr(md5(concat('bs',
         |    CAST(bb.b AS VARCHAR), ':', CAST(e.event_id AS VARCHAR))), 1, 4) AS u
         |  FROM e CROSS JOIN bb),
         |w AS (SELECT b, CAST($PoissonCaseSql AS BIGINT) AS w, vm FROM r),
         |g AS (SELECT b, CAST(sum(w) AS BIGINT) AS sw,
         |    CAST(sum(w * vm) AS BIGINT) AS swv FROM w GROUP BY 1),
         |mb AS (SELECT ($BootMeanSql) AS mean_b FROM g),
         |ms AS (SELECT list_sort(list(mean_b)) AS ms FROM mb),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vm) AS BIGINT) AS sv FROM e)
         |SELECT n AS n_events, round(CAST(sv AS DOUBLE) / 1e6 / n, 6) AS mean,
         |  round(ms[2], 6) AS boot_lo, round(ms[19], 6) AS boot_hi
         |FROM ms CROSS JOIN t""".stripMargin.replace("\n", " ")),
    // same md5-parity sign rule (shared predicate strings), same integer
    // estimator sums, same sorted-median read
    "x150_ams_f2" ->
      (s"""WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * c) AS BIGINT) AS f2 FROM c),
         |e AS (SELECT ${(0 until 8).map(j =>
            s"CAST(sum(CASE WHEN ${AmsSignOddSql(j, "t")} THEN c ELSE -c END) AS BIGINT) AS e$j")
            .mkString(", ")} FROM c),
         |m AS (SELECT list_sort([${(0 until 8).map(j => s"e$j * e$j").mkString(", ")}]) AS es FROM e),
         |a AS (SELECT n_tokens, f2,
         |    CAST(es[4] + es[5] AS DOUBLE) / 2.0 AS ams_med FROM m CROSS JOIN f)
         |SELECT n_tokens, f2, ams_med,
         |  round((ams_med - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE), 6) AS rel_err
         |FROM a""".stripMargin.replace("\n", " ")),
    // same (c ASC, t ASC) rank, same integer 2·Σrk·c − (n+1)·T numerator
    "x151_gini_concentration" ->
      (s"""WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
         |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, t) AS BIGINT) AS rk FROM c),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(c) AS BIGINT) AS total, CAST(sum(rk * c) AS BIGINT) AS src FROM r)
         |SELECT n_tokens, total,
         |  round(CAST(2 * src - (n_tokens + 1) * total AS DOUBLE) /
         |    CAST(n_tokens * total AS DOUBLE), 6) AS gini
         |FROM s""".stripMargin.replace("\n", " ")),
    // same shared checkpoint list, same rank-gated integer sums
    "x152_coverage_curve" ->
      (s"""WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
         |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT) AS rk FROM c),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
         |k AS (SELECT unnest([${CoverageKs.mkString(", ")}]) AS k),
         |g AS (SELECT k.k, CAST(count(*) AS BIGINT) AS n_vocab,
         |    CAST(sum(r.c) AS BIGINT) AS mass
         |  FROM r CROSS JOIN k WHERE r.rk <= k.k GROUP BY 1)
         |SELECT CAST(k AS BIGINT) AS k, n_vocab, mass,
         |  round(CAST(mass AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
         |FROM g CROSS JOIN tt ORDER BY k""".stripMargin.replace("\n", " ")),
    // same top-(k+1) cut, same micro-quantized ln ratios off the
    // reference count, same k·1e6/Σ read
    "x153_hill_tail" ->
      (s"""WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1
         |  ORDER BY c DESC, t LIMIT 51),
         |r AS (SELECT c, t, CAST(row_number() OVER (ORDER BY c DESC, t) AS BIGINT) AS rk FROM c),
         |ref AS (SELECT r2.rk AS kp1, r2.c AS cref FROM r r2
         |  JOIN (SELECT max(rk) AS kp1 FROM r) mx ON r2.rk = mx.kp1),
         |q AS (SELECT ref.kp1, ref.cref,
         |    CAST(floor(ln(CAST(r.c AS DOUBLE) / ref.cref) * 1e6 + 0.5) AS BIGINT) AS lm
         |  FROM r CROSS JOIN ref WHERE r.rk < ref.kp1),
         |s AS (SELECT kp1, cref, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(lm) AS BIGINT) AS slm FROM q GROUP BY 1, 2)
         |SELECT k, cref AS c_ref,
         |  round(CAST(k AS DOUBLE) * 1e6 / slm, 6) AS alpha
         |FROM s""".stripMargin.replace("\n", " ")),
    // same quality CTEs as x03, same integer binning (// ≡ Spark div),
    // same Laplace spine, the SHARED PsiCellSql contribution, and the
    // bin-ordered fold ≡ list_reduce
    "x166_psi_drift" -> PsiDriftOracleSql,
    // same micro-quantized values and integer cumsums as x134, the exact
    // HUGEINT ≡ DECIMAL(38,0) numerator, and the SHARED W1Sql final read
    "x167_wasserstein_drift" -> W1DriftOracleSql,
    // the stream-maintained twins answer with the BATCH oracles
    // verbatim — stream ≡ batch is exactly the claim under test
    "x176_stream_psi" -> PsiDriftOracleSql,
    "x177_stream_w1" -> W1DriftOracleSql,
    // same tokenization, the same bounded pair fan-out (union of two
    // equi-joins), exact integer (pair, term) counts, and the SHARED
    // nano-quantized JsdContribSql — the per-pair sum is an exact
    // integer in both engines, one final division
    "x178_jsd_matrix" ->
      (s"""WITH tk AS (SELECT source, unnest($toks) AS term FROM documents),
         |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
         |prs AS (SELECT a.source AS sa, b.source AS sb
         |  FROM (SELECT DISTINCT source FROM tc) a
         |  JOIN (SELECT DISTINCT source FROM tc) b ON a.source < b.source),
         |fan AS (
         |  SELECT p.sa, p.sb, t.term, t.c AS ca, CAST(0 AS BIGINT) AS cb
         |    FROM prs p JOIN tc t ON t.source = p.sa
         |  UNION ALL
         |  SELECT p.sa, p.sb, t.term, CAST(0 AS BIGINT) AS ca, t.c AS cb
         |    FROM prs p JOIN tc t ON t.source = p.sb),
         |pt AS (SELECT sa, sb, term, CAST(sum(ca) AS BIGINT) AS a,
         |    CAST(sum(cb) AS BIGINT) AS b FROM fan GROUP BY 1, 2, 3),
         |j AS (SELECT pt.sa, pt.sb, a, b, x.n AS na, y.n AS nb
         |  FROM pt JOIN ns x ON x.source = pt.sa JOIN ns y ON y.source = pt.sb),
         |g AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum($JsdContribSql) AS BIGINT) AS sq FROM j GROUP BY 1, 2)
         |SELECT sa AS src_a, sb AS src_b, n_terms,
         |  round(CAST(sq AS DOUBLE) / 2e12, 6) AS jsd
         |FROM g ORDER BY src_a, src_b""".stripMargin.replace("\n", " ")),
    // same tokenization; bigrams via the 1-based list comprehension ≡
    // Spark's zip_with over shifted slices; exact integer counts, one
    // division per ratio
    "x179_distinct_ngrams" ->
      (s"""WITH m AS (SELECT source, $toks AS s FROM documents),
         |u AS (SELECT source, unnest(s) AS g FROM m),
         |b AS (SELECT source,
         |    unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
         |  FROM m WHERE len(s) > 1),
         |gu AS (SELECT source, CAST(count(*) AS BIGINT) AS n1,
         |    CAST(count(DISTINCT g) AS BIGINT) AS d1 FROM u GROUP BY 1),
         |gb AS (SELECT source, CAST(count(*) AS BIGINT) AS n2,
         |    CAST(count(DISTINCT g) AS BIGINT) AS d2 FROM b GROUP BY 1)
         |SELECT gu.source AS source, n1 AS n_unigrams, d1 AS d_unigrams,
         |  round(CAST(d1 AS DOUBLE) / n1, 6) AS distinct1,
         |  CAST(coalesce(n2, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(d2, 0) AS BIGINT) AS d_bigrams,
         |  round(CASE WHEN coalesce(n2, 0) > 0
         |    THEN CAST(d2 AS DOUBLE) / n2 ELSE 0.0 END, 6) AS distinct2
         |FROM gu LEFT JOIN gb ON gu.source = gb.source
         |ORDER BY gu.source""".stripMargin.replace("\n", " ")),
    // source attribution + matrix aggregation re-derived from the
    // STAGED banded pair table (the x46 hand-off); same source
    // canonicalization and one broadcast-total division
    "x180_source_overlap" ->
      (s"""WITH pr AS (SELECT id_a, id_b FROM ${Stage.sqlRef("x180_pairs")}),
         |sp AS (SELECT a.source AS sa0, b.source AS sb0 FROM pr
         |  JOIN documents a ON a.doc_id = pr.id_a
         |  JOIN documents b ON b.doc_id = pr.id_b),
         |m AS (SELECT least(sa0, sb0) AS src_a, greatest(sa0, sb0) AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_pairs FROM sp GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tt FROM m)
         |SELECT src_a, src_b, n_pairs,
         |  round(CAST(n_pairs AS DOUBLE) / tt, 6) AS pct
         |FROM m CROSS JOIN t ORDER BY src_a, src_b""".stripMargin.replace("\n", " ")),
    // same sequential norm fold (list_reduce with the 0.0 seed ≡ Spark
    // aggregate), same micro-quantized unit components, exact HUGEINT ≡
    // DECIMAL(38,0) sums, the same ‖Σu‖² − Σ‖u‖² identity, one division
    "x181_embedding_diversity" ->
      ("""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |n0 AS (SELECT vec_id, vec, sqrt(list_reduce(list_prepend(0.0,
         |    list_transform(vec, x -> x * x)), (a, b) -> a + b)) AS nrm FROM e),
         |qv AS (SELECT vec_id,
         |    [CAST(floor(x / nrm * 1e6 + 0.5) AS BIGINT) for x in vec] AS q
         |  FROM n0 WHERE nrm > 0),
         |per AS (SELECT vec_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [x * x for x in q]), (a, b) -> a + b) AS qq FROM qv),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(qq) AS HUGEINT) AS s2 FROM per),
         |ex AS (SELECT unnest(range(1, len(q) + 1)) AS d, q FROM qv),
         |sd AS (SELECT d, CAST(sum(q[d]) AS BIGINT) AS sd FROM ex GROUP BY 1),
         |ss AS (SELECT CAST(sum(CAST(sd AS HUGEINT) * sd) AS HUGEINT) AS ssq FROM sd)
         |SELECT n AS n_vectors,
         |  round(CAST(ssq - s2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1) * 1e12), 6) AS mean_cos
         |FROM ss CROSS JOIN tot""".stripMargin.replace("\n", " ")),
    // components re-derived by recursive-CTE reachability from the
    // STAGED banded pair table (x14's closure over x46's hand-off);
    // singleton row from the same two scalar aggregates
    "x182_cluster_sizes" ->
      (s"""WITH RECURSIVE pr AS (SELECT id_a, id_b FROM ${Stage.sqlRef("x182_pairs")}),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS m FROM comp GROUP BY 1),
         |h AS (SELECT m AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |  FROM sz GROUP BY 1),
         |d AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
         |mt AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS mm FROM sz),
         |u AS (SELECT * FROM h UNION ALL
         |  SELECT CAST(1 AS BIGINT), dd - mm FROM d CROSS JOIN mt WHERE dd - mm > 0)
         |SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
         |  CAST(sum(cluster_size * n_clusters) AS BIGINT) AS n_docs
         |FROM u GROUP BY 1 ORDER BY cluster_size""".stripMargin.replace("\n", " ")),
    // per-cluster accounting re-derived from the STAGED assignment +
    // centroid vectors (the x13 hand-off); the same sequential d² fold
    // and micro-quantization, spine join for empty clusters
    "x183_cluster_report" ->
      (s"""WITH a AS (SELECT id, centroid_id FROM ${Stage.sqlRef("x183_assign")}),
         |c AS (SELECT centroid_id, cvec FROM ${Stage.sqlRef("x183_centroids")}),
         |r AS (SELECT a.centroid_id, CAST(floor(list_reduce(list_prepend(0.0,
         |    list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cvec),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y)
         |    * 1e6 + 0.5) AS BIGINT) AS d2m
         |  FROM a JOIN embeddings e ON e.vec_id = a.id
         |  JOIN c ON c.centroid_id = a.centroid_id),
         |per AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS nm,
         |    CAST(sum(d2m) AS BIGINT) AS sm FROM r GROUP BY 1),
         |t AS (SELECT CAST(sum(nm) AS BIGINT) AS nn FROM per),
         |sp AS (SELECT c.centroid_id, CAST(coalesce(nm, 0) AS BIGINT) AS n_members,
         |    CAST(coalesce(sm, 0) AS BIGINT) AS sm FROM c LEFT JOIN per USING (centroid_id))
         |SELECT centroid_id, n_members,
         |  round(CAST(n_members AS DOUBLE) / nn, 6) AS share,
         |  round(CASE WHEN n_members > 0
         |    THEN CAST(sm AS DOUBLE) / 1e6 / n_members ELSE 0.0 END, 6) AS mean_d2
         |FROM sp CROSS JOIN t ORDER BY centroid_id""".stripMargin.replace("\n", " ")),
    // same regex-match counts (RE2 ≡ java.util.regex on these character
    // classes), same per-doc sentence floor, the SHARED FleschSql over
    // identical exact sums
    "x184_readability" ->
      (s"""WITH d AS (SELECT source, CAST(len($toks) AS BIGINT) AS w,
         |    greatest(CAST(1 AS BIGINT),
         |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS se,
         |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS sy
         |  FROM documents),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS w, CAST(sum(se) AS BIGINT) AS se,
         |    CAST(sum(sy) AS BIGINT) AS sy
         |  FROM d WHERE w > 0 GROUP BY 1)
         |SELECT source, n_docs, w AS n_words, se AS n_sentences,
         |  sy AS n_syllables, round($FleschSql, 4) AS flesch
         |FROM g ORDER BY source""".stripMargin.replace("\n", " ")),
    // same tokenization + x179's bigram comprehension, the SHARED
    // nano-quantized EntropyContribSql — exact integer entropy sums
    "x185_entropy_rate" ->
      (s"""WITH m AS (SELECT source, $toks AS s FROM documents),
         |u AS (SELECT source, unnest(s) AS g FROM m),
         |b AS (SELECT source,
         |    unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
         |  FROM m WHERE len(s) > 1),
         |cu AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
         |nu AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cu GROUP BY 1),
         |hu AS (SELECT cu.source, CAST(max(n) AS BIGINT) AS n,
         |    CAST(sum($EntropyContribSql) AS BIGINT) AS q1
         |  FROM cu JOIN nu ON nu.source = cu.source GROUP BY 1),
         |cb AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         |nb AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cb GROUP BY 1),
         |hb AS (SELECT cb.source, CAST(sum($EntropyContribSql) AS BIGINT) AS q2
         |  FROM cb JOIN nb ON nb.source = cb.source GROUP BY 1)
         |SELECT hu.source AS source, hu.n AS n_tokens,
         |  round(CAST(q1 AS DOUBLE) / 1e12, 6) AS h_unigram,
         |  round(CAST(q2 AS DOUBLE) / 1e12, 6) AS h_bigram,
         |  round(CAST(q2 - q1 AS DOUBLE) / 1e12, 6) AS h_cond
         |FROM hu JOIN hb ON hb.source = hu.source
         |ORDER BY hu.source""".stripMargin.replace("\n", " ")),
    // x98's naive-rank permutation re-derived, the same exact
    // pre-widened moments (HUGEINT ≡ DECIMAL(38,0)), the SHARED
    // ShardCvSql read
    "x186_shard_balance" ->
      (s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS tk
         |  FROM documents),
         |r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY
         |    md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         |    // 100 AS shard FROM documents),
         |per AS (SELECT shard, CAST(sum(tk) AS BIGINT) AS t
         |  FROM r JOIN d USING (doc_id) GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_shards,
         |    CAST(min(t) AS BIGINT) AS min_tokens,
         |    CAST(max(t) AS BIGINT) AS max_tokens,
         |    CAST(sum(t) AS HUGEINT) AS st,
         |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2 FROM per)
         |SELECT n_shards, min_tokens, max_tokens,
         |  round(CAST(st AS DOUBLE) / n_shards, 4) AS mean_tokens,
         |  round($ShardCvSql, 6) AS cv
         |FROM g""".stripMargin.replace("\n", " ")),
    // full pipeline re-derivation: n = 256 + (len%256)·8 samples,
    // |s_j| = |ord(byte j%len) − 128| / 256 (exact dyadic — the float
    // and double paths agree bit-for-bit), 120 sequential band-energy
    // folds, bits vs the overall mean, two 60-bit MSB-first folds,
    // all-pairs summed hamming ≤ 20 (the banding is an engine
    // optimization; the pair SET is the contract — the x79 rule)
    "x187_audio_neardup" ->
      ("""WITH m AS (SELECT doc_id AS id, text, strlen(text) AS len,
         |    256 + (strlen(text) % 256) * 8 AS n
         |  FROM documents WHERE strlen(text) > 0),
         |bands AS (SELECT id,
         |    [[abs(ord(substr(text, CAST((j % len) AS INT) + 1, 1)) - 128) / 256.0
         |      for j in range(CAST((b * n) // 120 AS INT), CAST(((b + 1) * n) // 120 AS INT))]
         |      for b in range(120)] AS bl FROM m),
         |e AS (SELECT id,
         |    [CASE WHEN len(x) > 0
         |      THEN list_reduce(list_prepend(0.0, x), (a, v) -> a + v) / len(x)
         |      ELSE 0.0 END for x in bl] AS eb FROM bands),
         |mn AS (SELECT id, eb,
         |    list_reduce(list_prepend(0.0, eb), (a, v) -> a + v) / 120.0 AS mean FROM e),
         |h AS (SELECT id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CASE WHEN eb[b + 1] > mean THEN 1 ELSE 0 END for b in range(60)]),
         |      (a, v) -> a * 2 + v) AS shi,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CASE WHEN eb[b + 1] > mean THEN 1 ELSE 0 END for b in range(60, 120)]),
         |      (a, v) -> a * 2 + v) AS slo FROM mn),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(bit_count(xor(a.shi, b.shi)) + bit_count(xor(a.slo, b.slo)) AS BIGINT) AS hamming
         |  FROM h a JOIN h b ON a.id < b.id)
         |SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 20
         |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")),
    // same bigram comprehension, the same exact integer KN parameters,
    // and the SHARED nano-quantized KnLpSql — per-doc sums are exact
    // integers in both engines, one final division
    "x188_kneser_ney" ->
      (s"""WITH m AS (SELECT doc_id, $toks AS s FROM documents),
         |g AS (SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
         |  SELECT doc_id, unnest([{'w1': s[i], 'w2': s[i+1]}
         |    for i in range(1, len(s))]) AS b FROM m WHERE len(s) > 1)),
         |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM g GROUP BY 1, 2),
         |cw AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1,
         |    CAST(count(*) AS BIGINT) AS r1 FROM bc GROUP BY 1),
         |lt AS (SELECT w2, CAST(count(*) AS BIGINT) AS l2 FROM bc GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS bt FROM bc),
         |lp AS (SELECT bc.w1, bc.w2, $KnLpSql AS lpn
         |  FROM bc JOIN cw USING (w1) JOIN lt USING (w2) CROSS JOIN t),
         |sc AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(lpn) AS BIGINT) AS slp
         |  FROM g JOIN lp ON lp.w1 = g.w1 AND lp.w2 = g.w2 GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |  round(CAST(slp AS DOUBLE) / 1e9 / n_bigrams, 6) AS kn_lp
         |FROM sc ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // same exact micro-tick daily series, the SHARED sign/slope/median/z
    // strings — S, the variance numerator, and every median operand are
    // exact integers in both engines
    "x189_mann_kendall" ->
      (s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS vm
         |  FROM events GROUP BY 1, 2),
         |p AS (SELECT a.event_type, a.vm AS va, b.vm AS vb,
         |    datediff('day', a.day, b.day) AS gap
         |  FROM daily a JOIN daily b
         |    ON a.event_type = b.event_type AND a.day < b.day),
         |ps AS (SELECT event_type, $SgnSql AS sgn, $SenSlopeSql AS slope_n
         |  FROM p),
         |ss AS (SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
         |    CAST(count(*) AS BIGINT) AS np FROM ps GROUP BY 1),
         |r AS (SELECT event_type, slope_n,
         |    row_number() OVER (PARTITION BY event_type ORDER BY slope_n) AS rk
         |  FROM ps),
         |md AS (SELECT r.event_type, avg(CAST(slope_n AS DOUBLE)) AS median_n
         |  FROM r JOIN ss USING (event_type) WHERE $MedianPickSql GROUP BY 1),
         |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |  FROM daily GROUP BY 1),
         |tg AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS t
         |  FROM daily GROUP BY 1, 2),
         |tc AS (SELECT event_type,
         |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
         |  FROM tg GROUP BY 1),
         |fin AS (SELECT ss.event_type, n AS n_days, s_stat,
         |    CAST(n * (n - 1) * (2 * n + 5) - tcorr AS BIGINT) AS var_num,
         |    median_n
         |  FROM ss JOIN md USING (event_type) JOIN nd USING (event_type)
         |    JOIN tc USING (event_type))
         |SELECT event_type, n_days, s_stat, var_num, round($MkZSql, 6) AS z,
         |  round(median_n / 1e9, 6) AS sen_slope
         |FROM fin ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // same exact micro-tick daily series; moments and per-lag pair sums
    // pre-widened to HUGEINT (≡ Spark's DECIMAL(38,0)) BEFORE any product,
    // then ONE shared AcfSql read — identical integers, identical doubles
    "x190_acf" -> AcfOracleSql,
    // the stream-maintained twin MUST equal the batch ACF (exactly-once
    // state accumulation) — one oracle gates both
    "x199_stream_acf" -> AcfOracleSql,
    // same islands/censoring as x191, the same Monday-anchored weekend
    // integer, the SHARED nano-quantized LrESql/LrVSql terms and LrZSql
    // read — O−E and V are exact integer sums in both engines
    "x198_logrank" ->
      (s"""WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         |  FROM events),
         |w AS (SELECT max(day) AS wend FROM dd),
         |i AS (SELECT user_id, day, day - CAST(row_number() OVER (
         |    PARTITION BY user_id ORDER BY day) AS INTEGER) AS isl
         |  FROM dd),
         |st AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS t,
         |    min(day) AS fday, max(day) AS lday
         |  FROM i GROUP BY 1, 2),
         |g AS (SELECT t,
         |    (datediff('day', DATE '1970-01-05', fday) % 7) >= 5 AS ga,
         |    lday < wend AS died
         |  FROM st CROSS JOIN w),
         |bt AS (SELECT t,
         |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS c_b,
         |    CAST(sum(CASE WHEN ga AND died THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d_a,
         |    CAST(sum(CASE WHEN NOT ga AND died THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d_b
         |  FROM g GROUP BY 1),
         |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
         |    CAST(sum(c_b) AS BIGINT) AS n_b,
         |    CAST(sum(d_a) AS BIGINT) AS deaths_a,
         |    CAST(sum(d_b) AS BIGINT) AS deaths_b FROM bt),
         |r AS (SELECT t, d_a, d_b,
         |    CAST(sum(c_a) OVER wd AS BIGINT) AS na,
         |    CAST(sum(c_b) OVER wd AS BIGINT) AS nb FROM bt
         |  WINDOW wd AS (ORDER BY t DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT CAST(sum($LrESql) AS BIGINT) AS se,
         |    CAST(sum($LrVSql) AS BIGINT) AS sv,
         |    CAST(count(*) AS BIGINT) AS n_death_times
         |  FROM r WHERE d_a + d_b > 0)
         |SELECT n_a, n_b, deaths_a, deaths_b, n_death_times,
         |  round(CAST(se AS DOUBLE) / 1e9, 6) AS o_minus_e,
         |  round(CAST(sv AS DOUBLE) / 1e9, 6) AS variance,
         |  round($LrZSql, 6) AS z
         |FROM s CROSS JOIN tot""".stripMargin.replace("\n", " ")),
    // same streak/censoring definitions (gaps-and-islands via
    // day − row_number), the SHARED KmLnSql/KmSurvSql strings — risk
    // sets, death counts, and the cumulative hazard are exact integers
    // in both engines
    "x191_kaplan_meier" ->
      (s"""WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         |  FROM events),
         |w AS (SELECT max(day) AS wend FROM dd),
         |i AS (SELECT user_id, day, day - CAST(row_number() OVER (
         |    PARTITION BY user_id ORDER BY day) AS INTEGER) AS isl
         |  FROM dd),
         |st AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS t,
         |    max(day) AS lday
         |  FROM i GROUP BY 1, 2),
         |bt AS (SELECT t, CAST(count(*) AS BIGINT) AS c_all,
         |    CAST(sum(CASE WHEN lday < wend THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d
         |  FROM st CROSS JOIN w GROUP BY 1),
         |r AS (SELECT t, d, CAST(sum(c_all) OVER (ORDER BY t DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_risk
         |  FROM bt),
         |f AS (SELECT t, n_risk, d, $KmLnSql AS lq FROM r WHERE d > 0),
         |c AS (SELECT t, n_risk, d,
         |    CAST(sum(lq) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum,
         |    max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
         |  FROM f)
         |SELECT t AS t_days, n_risk, d AS d_churned,
         |  round($KmSurvSql, 6) AS survival
         |FROM c ORDER BY t_days""".stripMargin.replace("\n", " ")),
    // same staged weights → identical 6-dp scores, same threshold-per-
    // distinct-score PR points, the SHARED pico-quantized PrTermSql —
    // the area is an exact integer sum in both engines
    "x192_pr_auc" ->
      (s"""${scoredLabCtes("x192_weights")},
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(pos) AS BIGINT) AS np FROM lab GROUP BY 1),
         |t AS (SELECT CAST(sum(np) AS BIGINT) AS p,
         |    CAST(sum(n) AS BIGINT) AS nn FROM g),
         |o AS (SELECT score, CAST(sum(np) OVER wd AS BIGINT) AS tp,
         |    CAST(sum(n - np) OVER wd AS BIGINT) AS fp FROM g
         |  WINDOW wd AS (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |o2 AS (SELECT tp, fp,
         |    CAST(coalesce(lag(tp) OVER wo, 0) AS BIGINT) AS tpp,
         |    CAST(coalesce(lag(fp) OVER wo, 0) AS BIGINT) AS fpp FROM o
         |  WINDOW wo AS (ORDER BY score DESC)),
         |s AS (SELECT CAST(sum($PrTermSql) AS BIGINT) AS sn,
         |    CAST(count(*) AS BIGINT) AS nt FROM o2 CROSS JOIN t)
         |SELECT p AS n_pos, nn - p AS n_neg, nt AS n_thresholds,
         |  round(CAST(sn AS DOUBLE) / 1e12, 6) AS pr_auc
         |FROM s CROSS JOIN t""".stripMargin.replace("\n", " ")),
    // same staged weights/scores, same deterministic ntile order
    // (score DESC, doc_id), the SHARED capture/lift strings over exact
    // integer counts
    "x193_gains" ->
      (s"""${scoredLabCtes("x193_weights")},
         |dq AS (SELECT pos, ntile(10) OVER (ORDER BY score DESC, doc_id)
         |    AS decile FROM lab),
         |d AS (SELECT CAST(decile AS BIGINT) AS decile,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pos) AS BIGINT) AS n_pos FROM dq GROUP BY 1),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
         |    CAST(sum(n_pos) AS BIGINT) AS p FROM d),
         |cd AS (SELECT decile, n_docs, n_pos,
         |    CAST(sum(n_pos) OVER (ORDER BY decile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_pos FROM d)
         |SELECT decile, n_docs, n_pos, round($GainsCaptureSql, 6) AS capture,
         |  round($GainsLiftSql, 6) AS lift
         |FROM cd CROSS JOIN t ORDER BY decile""".stripMargin.replace("\n", " ")),
    // same staged centroids, the x183 micro-tick d² arithmetic re-derived
    // from the raw embeddings, the same (d2m, centroid_id) argmin/next
    // ranking, the SHARED nano-quantized SilhSql
    "x194_silhouette" ->
      (s"""WITH c AS (SELECT centroid_id, cvec
         |  FROM ${Stage.sqlRef("x194_centroids")}),
         |d AS (SELECT e.vec_id, c.centroid_id,
         |    CAST(floor(list_reduce(list_prepend(0.0,
         |      list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.cvec),
         |      p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y)
         |      * 1e6 + 0.5) AS BIGINT) AS d2m
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT vec_id, centroid_id, d2m, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY d2m, centroid_id) AS rk FROM d),
         |o AS (SELECT vec_id, centroid_id AS cid, d2m AS a2 FROM r WHERE rk = 1),
         |nx AS (SELECT vec_id, d2m AS b2 FROM r WHERE rk = 2),
         |s AS (SELECT o.cid, $SilhSql AS sn FROM o JOIN nx USING (vec_id))
         |SELECT cid AS centroid_id, CAST(count(*) AS BIGINT) AS n_members,
         |  round(CAST(sum(sn) AS DOUBLE) / 1e9 / count(*), 6)
         |    AS mean_silhouette
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same distinct co-purchase edge set, degrees from both endpoints,
    // HUGEINT (≡ DECIMAL(38,0)) pre-widening BEFORE any product, the
    // SHARED AssortSql read
    "x195_assortativity" ->
      (s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem),
         |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
         |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM
         |  (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         |  GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM dg),
         |dp AS (SELECT CAST(du.dg AS HUGEINT) AS du,
         |    CAST(dv.dg AS HUGEINT) AS dv
         |  FROM e JOIN dg du ON du.node = e.u JOIN dg dv ON dv.node = e.v),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |    CAST(sum(du + dv) AS HUGEINT) AS sx,
         |    CAST(sum(du * du + dv * dv) AS HUGEINT) AS sxx,
         |    CAST(sum(du * dv + dv * du) AS HUGEINT) AS sxy,
         |    CAST(count(*) * 2 AS HUGEINT) AS m FROM dp)
         |SELECT n_nodes, n_edges, round($AssortSql, 6) AS assortativity
         |FROM st CROSS JOIN nn""".stripMargin.replace("\n", " ")),
    // same staged weights/scores, the same md5 ticket split, the SHARED
    // nano-quantized ConfNcSql nonconformity and ConfRankSql pick — both
    // engines rank identical integers
    "x196_conformal" ->
      (s"""${scoredLabCtes("x196_weights")},
         |nc AS (SELECT doc_id, $ConfNcSql AS ncn,
         |    substr(md5('conf:' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
         |      AS cal FROM lab),
         |calc AS (SELECT ncn FROM nc WHERE cal),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS ncal FROM calc),
         |v AS (SELECT ncn, CAST(count(*) AS BIGINT) AS c FROM calc
         |  GROUP BY 1),
         |cv AS (SELECT ncn, CAST(sum(c) OVER (ORDER BY ncn
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum FROM v),
         |q AS (SELECT CAST(min(ncn) AS BIGINT) AS qn FROM cv CROSS JOIN t
         |  WHERE cum >= $ConfRankSql),
         |ev AS (SELECT ncn FROM nc WHERE NOT cal)
         |SELECT CAST(max(ncal) AS BIGINT) AS n_cal,
         |  CAST(count(*) AS BIGINT) AS n_eval,
         |  round(CAST(max(qn) AS DOUBLE) / 1e9, 6) AS qhat,
         |  round(CAST(sum(CASE WHEN ncn <= qn THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS coverage
         |FROM ev CROSS JOIN q CROSS JOIN t""".stripMargin.replace("\n", " ")),
    // same per-key aggregates, the same count-of-counts cumulative p99
    // pick (SHARED SkewP99RankSql) — every statistic an exact integer
    "x197_skew_audit" -> skewAuditOracle,
    // per fold: same md5-mod assignment, same staged weights → identical
    // 6-dp scores, x88's exact rank AUC, the SHARED guarded CvAucSql
    "x201_cv_auc" -> cvAucOracle,
    // same staged weights → identical 6-dp scores, the same
    // value-grouped cumulative p75 pick (SHARED SelThrRankSql), exact
    // integer selection shares
    "x203_selection_bias" ->
      (s"""${scoredLabCtes("x203_weights")},
         |sc AS (SELECT lab.doc_id, lab.score, d.source
         |  FROM lab JOIN documents d USING (doc_id)),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM sc),
         |v AS (SELECT score, CAST(count(*) AS BIGINT) AS c FROM sc
         |  GROUP BY 1),
         |cv AS (SELECT score, CAST(sum(c) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum FROM v),
         |q AS (SELECT min(score) AS thr FROM cv CROSS JOIN t
         |  WHERE cum >= $SelThrRankSql)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN score > thr THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_selected,
         |  round(CAST(sum(CASE WHEN score > thr THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS sel_rate
         |FROM sc CROSS JOIN q GROUP BY 1
         |ORDER BY 1""".stripMargin.replace("\n", " ")),
    // staged rotation (comp, eigval, trace, mu, w) consumed verbatim;
    // every projection re-derived independently — centered indexed-
    // comprehension + list_dot_product ≡ Spark's zip_with + graft_dot
    // (the cosSql sequential-fold equivalence), micro-quantized before
    // the variance sums so both engines aggregate identical integers
    "x204_pca_whitening" ->
      (s"""WITH m AS (SELECT comp, eigval, trace, mu, w
         |  FROM ${Stage.sqlRef("x204_rotation")}),
         |e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
         |pr AS (SELECT m.comp, m.eigval, m.trace,
         |  CAST(floor(list_dot_product(
         |    [v[i] - mu[i] for i in range(1, len(v) + 1)], w) * 1e6 + 0.5)
         |    AS BIGINT) AS pm
         |  FROM e CROSS JOIN m),
         |g AS (SELECT comp, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(pm) AS BIGINT) AS sp,
         |  sum(CAST(pm AS HUGEINT) * pm) AS spp,
         |  max(eigval) AS ev, max(trace) AS tr FROM pr GROUP BY 1)
         |SELECT comp, n, round($PcaVarSql, 6) AS var_proj,
         |  round(ev, 6) AS eigval, round(ev / tr, 6) AS explained_share
         |FROM g ORDER BY comp""".stripMargin.replace("\n", " ")),
    // same scored-lab CTEs as x88/x203; ablation re-derived as the same
    // histogram subtraction + per-excluded-source grouped-rank algebra
    // (the shared CvAucSql guard); deltas computed from UNROUNDED aucs
    "x205_source_ablation" ->
      (s"""${scoredLabCtes("x205_weights")},
         |ls AS (SELECT lab.doc_id, lab.score, lab.pos, d.source
         |  FROM lab JOIN documents d USING (doc_id)),
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS gn,
         |  CAST(sum(pos) AS BIGINT) AS gnp FROM ls GROUP BY 1),
         |per AS (SELECT source, score, CAST(count(*) AS BIGINT) AS sn,
         |  CAST(sum(pos) AS BIGINT) AS snp FROM ls GROUP BY 1, 2),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |sub AS (SELECT s.source, g.score,
         |  g.gn - coalesce(p.sn, 0) AS n, g.gnp - coalesce(p.snp, 0) AS np
         |  FROM srcs s CROSS JOIN g
         |  LEFT JOIN per p ON p.source = s.source AND p.score = g.score),
         |cum AS (SELECT *, coalesce(sum(n) OVER (PARTITION BY source
         |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS cb FROM sub WHERE n > 0),
         |ae AS (SELECT source, sum(np * (2 * cb + n + 1)) AS s2,
         |  CAST(sum(np) AS BIGINT) AS p, CAST(sum(n) AS BIGINT) AS tot
         |  FROM cum GROUP BY 1),
         |aexcl AS (SELECT source, tot AS n_kept, $CvAucSql AS auc_excl
         |  FROM ae),
         |gc AS (SELECT *, coalesce(sum(gn) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM g),
         |af AS (SELECT sum(gnp * (2 * cb + gn + 1)) AS s2,
         |  CAST(sum(gnp) AS BIGINT) AS p, CAST(sum(gn) AS BIGINT) AS tot
         |  FROM gc),
         |fu AS (SELECT $CvAucSql AS auc_full FROM af)
         |SELECT a.source, a.n_kept, round(a.auc_excl, 6) AS auc_excl,
         |  round(f.auc_full, 6) AS auc_full,
         |  round(a.auc_excl - f.auc_full, 6) AS delta
         |FROM aexcl a CROSS JOIN fu f
         |ORDER BY a.source""".stripMargin.replace("\n", " ")),
    // naive global cumsum + the HUGEINT mirror of the engine's decimal
    // floor-div draw count (Spark `div` ≡ DuckDB `//` — nonneg numerator
    // by the CASE guard, so truncation ≡ floor on both)
    "x206_systematic_resample" ->
      (s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($toks) AS BIGINT) AS wt FROM documents),
         |c AS (SELECT *, CAST(sum(wt) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cw FROM d),
         |t AS (SELECT CAST(sum(wt) AS BIGINT) AS ww,
         |    CAST(count(*) AS BIGINT) AS nn FROM d),
         |k AS (SELECT source, wt,
         |  (CASE WHEN 2 * CAST(cw AS HUGEINT) * nn < ww THEN 0
         |   ELSE CAST((2 * CAST(cw AS HUGEINT) * nn - ww) //
         |     (2 * CAST(ww AS HUGEINT)) AS BIGINT) + 1 END) -
         |  (CASE WHEN 2 * CAST(cw - wt AS HUGEINT) * nn < ww THEN 0
         |   ELSE CAST((2 * CAST(cw - wt AS HUGEINT) * nn - ww) //
         |     (2 * CAST(ww AS HUGEINT)) AS BIGINT) + 1 END) AS cnt,
         |  ww, nn FROM c CROSS JOIN t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(wt) AS BIGINT) AS tokens,
         |  CAST(sum(cnt) AS BIGINT) AS n_resampled,
         |  CAST(max(cnt) AS BIGINT) AS max_per_doc,
         |  round(CAST(sum(cnt) AS DOUBLE) / max(nn), 6) AS resample_share,
         |  round(CAST(sum(wt) AS DOUBLE) / max(ww), 6) AS weight_share
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same scored-lab CTEs; placements re-derived from the same
    // |distinct scores| histogram (HUGEINT moments), shared Dl* reads
    "x207_delong_auc_ci" ->
      (s"""${scoredLabCtes("x207_weights")},
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(pos) AS BIGINT) AS np FROM lab GROUP BY 1),
         |t AS (SELECT CAST(sum(np) AS BIGINT) AS mpos,
         |  CAST(sum(n - np) AS BIGINT) AS nneg FROM g),
         |wh AS (SELECT g.*, n - np AS ng,
         |  coalesce(sum(n - np) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb,
         |  sum(np) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpi
         |  FROM g),
         |pm AS (SELECT wh.*, t.mpos, t.nneg,
         |  2 * cnb + ng AS p10, 2 * (t.mpos - cpi) + np AS p01
         |  FROM wh CROSS JOIN t),
         |agg AS (SELECT max(mpos) AS mpos, max(nneg) AS nneg,
         |  sum(CAST(np AS HUGEINT) * p10) AS s1,
         |  sum(CAST(np AS HUGEINT) * CAST(p10 AS HUGEINT) * p10) AS s2,
         |  sum(CAST(ng AS HUGEINT) * p01) AS s1p,
         |  sum(CAST(ng AS HUGEINT) * CAST(p01 AS HUGEINT) * p01) AS s2p
         |  FROM pm)
         |SELECT mpos AS n_pos, nneg AS n_neg,
         |  round($DlAucSql, 6) AS auc, round($DlSeSql, 6) AS se,
         |  round(($DlAucSql) - 1.96 * ($DlSeSql), 6) AS ci_lo,
         |  round(($DlAucSql) + 1.96 * ($DlSeSql), 6) AS ci_hi
         |FROM agg""".stripMargin.replace("\n", " ")),
    // same tokenizer + x15-style trigram construction (non-distinct
    // multiset), same count-of-counts histogram, shared GtStarSql (NULL
    // convention included) and the same fixed-order p0 read
    "x208_good_turing" ->
      (s"""WITH sq AS (SELECT $toks AS s FROM documents),
         |tk AS (SELECT unnest(
         |  [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
         |  AS t FROM sq WHERE len(s) >= 3),
         |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
         |h AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnt GROUP BY 1),
         |tt AS (SELECT CAST(sum(m * c) AS BIGINT) AS tt,
         |  CAST(sum(m) AS BIGINT) AS vocab,
         |  CAST(sum(CASE WHEN c = 1 THEN m ELSE 0 END) AS BIGINT) AS n1
         |  FROM h),
         |j AS (SELECT h.c, h.m, hn.m AS m_next
         |  FROM h LEFT JOIN h hn ON hn.c = h.c + 1 WHERE h.c <= 5)
         |SELECT c AS r, m AS n_r,
         |  CAST(coalesce(m_next, 0) AS BIGINT) AS n_r_next,
         |  round($GtStarSql, 6) AS r_star,
         |  round(CAST(n1 AS DOUBLE) / tt, 6) AS p0, vocab,
         |  tt AS n_tokens
         |FROM j CROSS JOIN tt ORDER BY r""".stripMargin.replace("\n", " ")),
    // same x40 benchmark split over embeddings, same 4-dp cosine
    // quantization BEFORE the per-vector max and the 0.1 bin floor
    "x209_semantic_decon" ->
      ("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 0),
         |p AS (SELECT c.vec_id,
         |  CAST(floor(list_dot_product(c.v, b.bv) /
         |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.bv, b.bv)))
         |    * 1e4 + 0.5) AS BIGINT) AS cosq
         |  FROM c CROSS JOIN b),
         |mx AS (SELECT vec_id, max(cosq) AS mq FROM p GROUP BY 1),
         |bn AS (SELECT CAST(floor(CAST(mq AS DOUBLE) / 1e3) AS BIGINT) AS bin
         |  FROM mx)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_vecs
         |FROM bn GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same trigram comprehension, same per-doc micro-quantization BEFORE
    // the per-source aggregation (integer sums — no summation-order drift)
    "x210_repetition" ->
      (s"""WITH m AS (SELECT doc_id, source, $toks AS s FROM documents),
         |tri AS (SELECT doc_id, source, unnest(
         |  [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
         |  AS t FROM m WHERE len(s) >= 3),
         |per AS (SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n3,
         |  CAST(count(DISTINCT t) AS BIGINT) AS d3 FROM tri GROUP BY 1, 2),
         |pq AS (SELECT source, CAST(floor(CAST(n3 - d3 AS DOUBLE) / n3 * 1e6
         |  + 0.5) AS BIGINT) AS repq FROM per)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(repq) AS DOUBLE) / count(*) / 1e6, 6) AS avg_rep,
         |  round(CAST(max(repq) AS DOUBLE) / 1e6, 6) AS max_rep,
         |  CAST(sum(CASE WHEN repq > 500000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged
         |FROM pq GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same pairwise day slopes, same explicit ((nn+1)/2, (nn+2)/2)
    // rank-median read (ties resolve to the identical multiset element)
    "x211_theil_sen" ->
      ("""WITH daily AS (SELECT CAST(date_diff('day', DATE '2024-01-01',
         |    CAST(ts AS DATE)) AS BIGINT) AS d,
         |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
         |p AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
         |  AS slope FROM daily a JOIN daily b ON b.d > a.d),
         |r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM p),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p),
         |dd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
         |SELECT n_days, nn AS n_pairs,
         |  round(sum(slope) / count(*), 6) AS theil_sen_slope
         |FROM r CROSS JOIN t CROSS JOIN dd
         |WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
         |GROUP BY 1, 2""".stripMargin.replace("\n", " ")),
    // same top-300 cut (count desc, term asc), same renormalized grid,
    // same per-term contribution string folded in sorted term order
    "x212_jsd_matrix" ->
      (s"""WITH per AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest($toks) AS t FROM documents)
         |  GROUP BY 1, 2),
         |top AS (SELECT t FROM (SELECT t, sum(c) AS g FROM per GROUP BY 1)
         |  ORDER BY g DESC, t ASC LIMIT 300),
         |sel AS (SELECT per.source, per.t, per.c FROM per
         |  JOIN top ON per.t = top.t),
         |tots AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot
         |  FROM sel GROUP BY 1),
         |cells AS (SELECT g.source, g.t,
         |    CAST(coalesce(s.c, 0) AS BIGINT) AS c, g.tot
         |  FROM (SELECT tots.source, tots.tot, top.t
         |        FROM tots CROSS JOIN top) g
         |  LEFT JOIN sel s ON s.source = g.source AND s.t = g.t),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b, a.t AS t,
         |    a.c AS ca, a.tot AS ta, b.c AS cb, b.tot AS tb
         |  FROM cells a JOIN cells b
         |  ON a.t = b.t AND a.source < b.source),
         |ct AS (SELECT src_a, src_b, t, $JsdTermSql AS contrib FROM pr),
         |g2 AS (SELECT src_a, src_b, list(contrib ORDER BY t) AS cs
         |  FROM ct GROUP BY 1, 2)
         |SELECT src_a, src_b,
         |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6)
         |    AS jsd
         |FROM g2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")),
    // same quality quantization, same greedy cumulative-token knapsack
    // (exact integers; ratios touch doubles only at the output)
    "x213_budget_alloc" ->
      (s"""WITH m AS (SELECT source, $toks AS s FROM documents),
         |ntok AS (SELECT source, CAST(sum(len(s)) AS BIGINT) AS n1
         |  FROM m GROUP BY 1),
         |tri AS (SELECT source, unnest(
         |  [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
         |  AS t FROM m WHERE len(s) >= 3),
         |tr AS (SELECT source, CAST(count(*) AS BIGINT) AS n3,
         |  CAST(count(DISTINCT t) AS BIGINT) AS d3 FROM tri GROUP BY 1),
         |q AS (SELECT ntok.source, n1,
         |  CAST(coalesce(floor(CAST(d3 AS DOUBLE) / n3 * 1e6 + 0.5), 0)
         |    AS BIGINT) AS qq
         |  FROM ntok LEFT JOIN tr ON ntok.source = tr.source),
         |t AS (SELECT CAST(sum(n1) // 2 AS BIGINT) AS budget FROM q),
         |cumq AS (SELECT source, n1, qq, sum(n1) OVER (ORDER BY qq DESC,
         |  source ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  AS cum FROM q)
         |SELECT source, n1 AS n_tokens,
         |  round(CAST(qq AS DOUBLE) / 1e6, 6) AS quality,
         |  CAST(greatest(0, least(n1, budget - (cum - n1))) AS BIGINT)
         |    AS alloc_tokens,
         |  round(CAST(greatest(0, least(n1, budget - (cum - n1)))
         |    AS DOUBLE) / n1, 6) AS alloc_frac
         |FROM cumq CROSS JOIN t ORDER BY source""".stripMargin
        .replace("\n", " ")),
    // same dow (0=Sunday) / hour buckets, same share arithmetic
    "x214_seasonality" ->
      ("""WITH d AS (SELECT 'dow' AS unit, CAST(dayofweek(ts) AS BIGINT)
         |    AS bucket, CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 2),
         |h AS (SELECT 'hour' AS unit, CAST(hour(ts) AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 2),
         |u AS (SELECT *, 7 AS k FROM d UNION ALL SELECT *, 24 AS k FROM h),
         |tt AS (SELECT unit, CAST(sum(n_events) AS BIGINT) AS tt
         |  FROM u GROUP BY 1)
         |SELECT u.unit AS unit, bucket, n_events,
         |  round(CAST(n_events AS DOUBLE) / tt, 6) AS share,
         |  round(CAST(n_events AS DOUBLE) * k / tt, 6) AS ratio_to_uniform
         |FROM u JOIN tt ON u.unit = tt.unit
         |ORDER BY unit, bucket""".stripMargin.replace("\n", " ")),
    // same lossless cent quantization, same histogram-interval trim
    // arithmetic, same exact DECIMAL kept-mass sum
    "x215_trimmed_mean" ->
      ("""WITH h AS (SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
         |w AS (SELECT *, coalesce(sum(c) OVER (PARTITION BY l_returnflag
         |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1
         |    PRECEDING), 0) AS cb FROM h),
         |tots AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n
         |  FROM h GROUP BY 1),
         |k AS (SELECT w.*, n, CAST(floor(CAST(n AS DOUBLE) * 0.05)
         |    AS BIGINT) AS k FROM w JOIN tots USING (l_returnflag)),
         |kept AS (SELECT l_returnflag, n, k, cents,
         |    greatest(0, least(cb + c, n - k) - greatest(cb, k)) AS kept
         |  FROM k)
         |SELECT l_returnflag, n AS n_rows, k AS n_trimmed_each,
         |  CAST(sum(kept) AS BIGINT) AS n_kept,
         |  round(CAST(sum(CAST(kept AS DECIMAL(38,0)) * cents) AS DOUBLE)
         |    / CAST(sum(kept) AS BIGINT) / 100.0, 6) AS trimmed_mean_price
         |FROM kept WHERE kept > 0 GROUP BY 1, 2, 3
         |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")),
    // estimate re-derived from the STAGED registers (xxhash64 is the
    // engine-specific half; register mass is exact decimal both sides)
    "x216_hll_distinct" ->
      (s"""WITH regs AS (SELECT source, bucket, mreg
         |  FROM ${Stage.sqlRef("x216_regs")}),
         |est AS (SELECT source, CAST(count(*) AS BIGINT) AS present,
         |  sum(CAST(power(2.0, 56 - mreg) AS DECIMAL(38,0))) AS mass
         |  FROM regs GROUP BY 1),
         |e2 AS (SELECT source, CAST(512 AS BIGINT) AS m,
         |  CAST(512 - present AS BIGINT) AS zeros,
         |  mass + CAST(512 - present AS DECIMAL(38,0)) *
         |    CAST(72057594037927936 AS DECIMAL(38,0)) AS sumscaled
         |  FROM est),
         |e3 AS (SELECT source, m, zeros, ${HllEstSql(512)} AS hll_est_raw
         |  FROM e2),
         |ex AS (SELECT source, CAST(count(DISTINCT text) AS BIGINT)
         |  AS n_exact FROM documents GROUP BY 1)
         |SELECT e3.source AS source, m, n_exact,
         |  round(hll_est_raw, 2) AS hll_est,
         |  round((hll_est_raw - CAST(n_exact AS DOUBLE)) / n_exact, 6)
         |    AS rel_err
         |FROM e3 JOIN ex ON e3.source = ex.source
         |ORDER BY source""".stripMargin.replace("\n", " ")),
    // same doubled tie-averaged ranks off the value histograms, same
    // decimal moments, shared CorrSql fixed-order reads
    "x217_spearman" ->
      (s"""WITH d AS (SELECT n_chars AS x, CAST(len($toks) AS BIGINT) AS y
         |  FROM documents),
         |hx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
         |rx AS (SELECT x, 2 * coalesce(sum(cnt) OVER (ORDER BY x
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1
         |  AS r2x FROM hx),
         |hy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
         |ry AS (SELECT y, 2 * coalesce(sum(cnt) OVER (ORDER BY y
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1
         |  AS r2y FROM hy),
         |j AS (SELECT d.x, d.y, r2x, r2y FROM d
         |  JOIN rx ON d.x = rx.x JOIN ry ON d.y = ry.y),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  sum(CAST(r2x AS DECIMAL(38,0))) AS sx,
         |  sum(CAST(r2y AS DECIMAL(38,0))) AS sy,
         |  sum(CAST(r2x AS DECIMAL(38,0)) * r2x) AS sxx,
         |  sum(CAST(r2y AS DECIMAL(38,0)) * r2y) AS syy,
         |  sum(CAST(r2x AS DECIMAL(38,0)) * r2y) AS sxy,
         |  sum(CAST(x AS DECIMAL(38,0))) AS rsx,
         |  sum(CAST(y AS DECIMAL(38,0))) AS rsy,
         |  sum(CAST(x AS DECIMAL(38,0)) * x) AS rsxx,
         |  sum(CAST(y AS DECIMAL(38,0)) * y) AS rsyy,
         |  sum(CAST(x AS DECIMAL(38,0)) * y) AS rsxy FROM j)
         |SELECT n,
         |  round(${CorrSql("sx", "sy", "sxx", "syy", "sxy")}, 6)
         |    AS spearman_rho,
         |  round(${CorrSql("rsx", "rsy", "rsxx", "rsyy", "rsxy")}, 6)
         |    AS pearson_r
         |FROM mo""".stripMargin.replace("\n", " ")),
    // same cent histogram, same doubled-rank interval-median reads, same
    // deviation RE-AGGREGATION of the histogram (no second row scan)
    "x218_mad" ->
      ("""WITH hist AS (SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
         |tots AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n
         |  FROM hist GROUP BY 1),
         |w1 AS (SELECT h.*, coalesce(sum(c) OVER (PARTITION BY l_returnflag
         |  ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  0) AS cb FROM hist h),
         |m1 AS (SELECT w1.l_returnflag, n,
         |  max(CASE WHEN cb < (n+1)//2 AND (n+1)//2 <= cb + c
         |    THEN cents END) +
         |  max(CASE WHEN cb < (n+2)//2 AND (n+2)//2 <= cb + c
         |    THEN cents END) AS med2
         |  FROM w1 JOIN tots USING (l_returnflag) GROUP BY 1, 2),
         |dev AS (SELECT hist.l_returnflag, abs(2 * cents - med2) AS ad,
         |    CAST(sum(c) AS BIGINT) AS c
         |  FROM hist JOIN m1 USING (l_returnflag) GROUP BY 1, 2),
         |w2 AS (SELECT d.*, coalesce(sum(c) OVER (PARTITION BY l_returnflag
         |  ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  0) AS cb FROM dev d),
         |m2 AS (SELECT w2.l_returnflag,
         |  max(CASE WHEN cb < (n+1)//2 AND (n+1)//2 <= cb + c
         |    THEN ad END) +
         |  max(CASE WHEN cb < (n+2)//2 AND (n+2)//2 <= cb + c
         |    THEN ad END) AS mad4
         |  FROM w2 JOIN tots USING (l_returnflag) GROUP BY 1)
         |SELECT m1.l_returnflag AS l_returnflag, n AS n_rows,
         |  round(CAST(med2 AS DOUBLE) / 200.0, 6) AS median_price,
         |  round(CAST(mad4 AS DOUBLE) / 400.0, 6) AS mad_price
         |FROM m1 JOIN m2 USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")),
    // same marker-count guess as x02, same truth join and shares
    "x219_langid_eval" ->
      (s"""WITH m AS (SELECT lang, $toks AS ts FROM documents),
         |s AS (SELECT lang, ${markers("en")} AS en, ${markers("de")} AS de,
         |  ${markers("fr")} AS fr, ${markers("es")} AS es FROM m),
         |g AS (SELECT lang, CASE WHEN greatest(en, de, fr, es) <= 0
         |  THEN 'und'
         |  WHEN en = greatest(en, de, fr, es) THEN 'en'
         |  WHEN de = greatest(en, de, fr, es) THEN 'de'
         |  WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |  WHEN es = greatest(en, de, fr, es) THEN 'es'
         |  ELSE 'und' END AS lang_guess FROM s),
         |cells AS (SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
         |  FROM g GROUP BY 1, 2),
         |tots AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nt
         |  FROM cells GROUP BY 1)
         |SELECT cells.lang AS lang, lang_guess, n,
         |  round(CAST(n AS DOUBLE) / nt, 6) AS share_of_lang
         |FROM cells JOIN tots ON cells.lang = tots.lang
         |ORDER BY lang, lang_guess""".stripMargin.replace("\n", " ")),
    // x218's histogram/median CTEs plus the integer-cleared
    // Iglewicz–Hoban gate summed as histogram mass
    "x220_robust_outliers" ->
      ("""WITH hist AS (SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
         |tots AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n
         |  FROM hist GROUP BY 1),
         |w1 AS (SELECT h.*, coalesce(sum(c) OVER (PARTITION BY l_returnflag
         |  ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  0) AS cb FROM hist h),
         |m1 AS (SELECT w1.l_returnflag, n,
         |  max(CASE WHEN cb < (n+1)//2 AND (n+1)//2 <= cb + c
         |    THEN cents END) +
         |  max(CASE WHEN cb < (n+2)//2 AND (n+2)//2 <= cb + c
         |    THEN cents END) AS med2
         |  FROM w1 JOIN tots USING (l_returnflag) GROUP BY 1, 2),
         |dev AS (SELECT hist.l_returnflag, abs(2 * cents - med2) AS ad,
         |    CAST(sum(c) AS BIGINT) AS c
         |  FROM hist JOIN m1 USING (l_returnflag) GROUP BY 1, 2),
         |w2 AS (SELECT d.*, coalesce(sum(c) OVER (PARTITION BY l_returnflag
         |  ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  0) AS cb FROM dev d),
         |m2 AS (SELECT w2.l_returnflag,
         |  max(CASE WHEN cb < (n+1)//2 AND (n+1)//2 <= cb + c
         |    THEN ad END) +
         |  max(CASE WHEN cb < (n+2)//2 AND (n+2)//2 <= cb + c
         |    THEN ad END) AS mad4
         |  FROM w2 JOIN tots USING (l_returnflag) GROUP BY 1),
         |g AS (SELECT hist.l_returnflag,
         |  CAST(sum(CASE WHEN 13490 * abs(2 * cents - med2) >
         |    35000 * mad4 THEN c ELSE 0 END) AS BIGINT) AS n_outliers
         |  FROM hist JOIN m1 USING (l_returnflag)
         |  JOIN m2 USING (l_returnflag) GROUP BY 1)
         |SELECT g.l_returnflag AS l_returnflag, n AS n_rows, n_outliers,
         |  round(CAST(n_outliers AS DOUBLE) / n, 6) AS outlier_rate
         |FROM g JOIN m1 USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")),
    // same synthesized markers, same rule ORDER, same count-on-current-
    // text semantics: each staged CTE counts on the text as the previous
    // rules left it — the Redact.DefaultRules constants feed BOTH
    // engines (patterns are spliced, not re-typed)
    "x221_pii_redact" -> {
      val Seq(em, ip, ssn, ph) = graft.operators.Redact.DefaultRules
      (s"""WITH base AS (SELECT source, text ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' contact user' ||
         |    CAST(doc_id AS VARCHAR) || '@example.org now' ELSE '' END ||
         |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 today'
         |    ELSE '' END ||
         |  CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.' ||
         |    CAST(doc_id % 256 AS VARCHAR) || '.25 logged' ELSE '' END ||
         |  CASE WHEN doc_id % 17 = 0 THEN ' ssn 987-65-4321 on file'
         |    ELSE '' END AS t FROM documents),
         |s0 AS (SELECT source, CAST(len(t) AS BIGINT) AS l0, t AS r
         |  FROM base),
         |s1 AS (SELECT source, l0,
         |  CAST(len(regexp_extract_all(r, '${em.pattern}')) AS BIGINT)
         |    AS n_email,
         |  regexp_replace(r, '${em.pattern}', '${em.replacement}', 'g')
         |    AS r FROM s0),
         |s2 AS (SELECT source, l0, n_email,
         |  CAST(len(regexp_extract_all(r, '${ip.pattern}')) AS BIGINT)
         |    AS n_ip,
         |  regexp_replace(r, '${ip.pattern}', '${ip.replacement}', 'g')
         |    AS r FROM s1),
         |s3 AS (SELECT source, l0, n_email, n_ip,
         |  CAST(len(regexp_extract_all(r, '${ssn.pattern}')) AS BIGINT)
         |    AS n_ssn,
         |  regexp_replace(r, '${ssn.pattern}', '${ssn.replacement}', 'g')
         |    AS r FROM s2),
         |s4 AS (SELECT source, l0, n_email, n_ip, n_ssn,
         |  CAST(len(regexp_extract_all(r, '${ph.pattern}')) AS BIGINT)
         |    AS n_phone,
         |  regexp_replace(r, '${ph.pattern}', '${ph.replacement}', 'g')
         |    AS r FROM s3)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n_email + n_ip + n_ssn + n_phone > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
         |  CAST(sum(n_email) AS BIGINT) AS n_email,
         |  CAST(sum(n_ip) AS BIGINT) AS n_ip,
         |  CAST(sum(n_ssn) AS BIGINT) AS n_ssn,
         |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
         |  CAST(sum(n_email + n_ip + n_ssn + n_phone) AS BIGINT)
         |    AS n_spans,
         |  CAST(sum(CAST(len(r) AS BIGINT) - l0) AS BIGINT) AS chars_delta
         |FROM s4 GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))
    },
    // same synthesized URL variants, same five-step canonical chain
    // (host-lower, fragment, mid-utm, tail-utm, slash collapse) with
    // the 'g' flag carrying RE2's global replace — no capture groups
    // anywhere, so the patterns are engine-portable verbatim
    "x222_url_canonical" ->
      ("""WITH u0 AS (SELECT doc_id, 'https://' ||
         |  (['Example.COM', 'news.example.com', 'Blog.Example.org',
         |    'cdn.example.net'])[(doc_id % 4 + 1)] ||
         |  '/p/' || CAST(doc_id % 97 AS VARCHAR) ||
         |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
         |  CASE WHEN doc_id % 15 = 0
         |    THEN '?utm_source=feed&ref=home&utm_medium=rss'
         |    WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_medium=rss'
         |    WHEN doc_id % 5 = 0 THEN '?ref=home' ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END AS u
         |  FROM documents),
         |c0 AS (SELECT doc_id,
         |  lower(regexp_extract(u, '^[A-Za-z]+://[^/?#]+')) ||
         |  regexp_replace(u, '^[A-Za-z]+://[^/?#]+', '') AS v FROM u0),
         |c1 AS (SELECT doc_id, regexp_replace(regexp_replace(
         |  regexp_replace(regexp_replace(regexp_replace(v,
         |  '#.*', '', 'g'),
         |  'utm_[a-z]+=[^&#?]*&', '', 'g'),
         |  '[?&]utm_[a-z]+=[^&#?]*', '', 'g'),
         |  '/\?', '?', 'g'),
         |  '/$', '', 'g') AS curl FROM c0),
         |d AS (SELECT regexp_extract(curl, '^[a-z]+://([^/?#]+)', 1)
         |  AS domain, curl FROM c1)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
         |  CAST(count(*) - count(DISTINCT curl) AS BIGINT) AS n_dups,
         |  round(CAST(count(*) - count(DISTINCT curl) AS DOUBLE)
         |    / count(*), 6) AS dup_rate
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same value grid, same strict-inequality pair mass, same marginal
    // tie terms; τ-b's denominator multiplies the two sqrt factors in
    // the same order on both sides
    "x223_kendall_tau" ->
      ("""WITH g AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |    CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2),
         |cd AS (SELECT CAST(sum(CASE WHEN b.d > a.d THEN a.c * b.c
         |    ELSE 0 END) AS BIGINT) AS conc,
         |  CAST(sum(CASE WHEN b.d < a.d THEN a.c * b.c ELSE 0 END)
         |    AS BIGINT) AS disc
         |  FROM g a JOIN g b ON b.q > a.q),
         |tq AS (SELECT CAST(sum(nq * (nq - 1) // 2) AS BIGINT) AS tie_x
         |  FROM (SELECT CAST(sum(c) AS BIGINT) AS nq FROM g GROUP BY q)),
         |td AS (SELECT CAST(sum(nd * (nd - 1) // 2) AS BIGINT) AS tie_y
         |  FROM (SELECT CAST(sum(c) AS BIGINT) AS nd FROM g GROUP BY d)),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |  CAST(CAST(sum(c) AS BIGINT) * (CAST(sum(c) AS BIGINT) - 1) // 2
         |    AS BIGINT) AS n_pairs FROM g)
         |SELECT n, n_pairs, conc, disc, tie_x, tie_y,
         |  round(CAST(conc - disc AS DOUBLE) /
         |    (sqrt(CAST(n_pairs - tie_x AS DOUBLE)) *
         |     sqrt(CAST(n_pairs - tie_y AS DOUBLE))), 6) AS tau_b
         |FROM t CROSS JOIN cd CROSS JOIN tq CROSS JOIN td"""
        .stripMargin.replace("\n", " ")),
    // same integer moments, same shared variance string, the SAME
    // sorted-source list fold for the weight total, same
    // largest-remainder integer assignment
    "x225_neyman_alloc" ->
      (s"""WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_h,
         |    CAST(sum(n_chars) AS BIGINT) AS s1,
         |    CAST(sum(n_chars * n_chars) AS DECIMAL(38,0)) AS s2
         |  FROM documents GROUP BY 1),
         |sd AS (SELECT source, n_h, sqrt($NeymanVarSql) AS sd FROM st),
         |w AS (SELECT source, n_h, sd, CAST(n_h AS DOUBLE) * sd AS w
         |  FROM sd),
         |tw AS (SELECT list_reduce(list_prepend(0.0,
         |    list(w ORDER BY source)), (x, y) -> x + y) AS tw FROM w),
         |b AS (SELECT source, n_h, sd, 10000 * w / tw AS share
         |  FROM w CROSS JOIN tw),
         |b2 AS (SELECT source, n_h, sd,
         |    CAST(floor(share) AS BIGINT) AS base,
         |    share - floor(share) AS rem FROM b),
         |r AS (SELECT b2.*, CAST(row_number() OVER
         |    (ORDER BY rem DESC, source) AS BIGINT) AS rk,
         |  (SELECT CAST(sum(base) AS BIGINT) FROM b2) AS sb FROM b2)
         |SELECT source, n_h, round(sd, 6) AS sd,
         |  CAST(base + CASE WHEN rk <= 10000 - sb THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM r ORDER BY source""".stripMargin.replace("\n", " ")),
    // x126's exact moment CTE verbatim, then the shared SE/MDE strings
    "x226_ab_power_mde" ->
      (s"""WITH e AS (SELECT CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |    < '8000' THEN 'b' ELSE 'a' END AS variant,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
         |a AS (SELECT CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN vm ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN vm ELSE 0 END) AS BIGINT) AS s_b,
         |    sum(CASE WHEN variant = 'a' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_a,
         |    sum(CASE WHEN variant = 'b' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_b
         |  FROM e)
         |SELECT n_a, n_b,
         |  round((${WelchMean("a")}), 6) AS mean_a,
         |  round((${WelchMean("b")}), 6) AS mean_b,
         |  round($AbSeSql, 6) AS se,
         |  round($AbMdeSql, 6) AS mde_abs,
         |  round(($AbMdeSql) / (${WelchMean("a")}), 6) AS mde_rel
         |FROM a""".stripMargin.replace("\n", " ")),
    // x139's staged-weights scoring prefix (naive row_number rank — the
    // hash match re-proves the Ranks device lossless), then the SAME
    // prefix/interval/minimax CTEs: j ≥ 1 intervals off prefix pairs,
    // j = 0 intervals are the prefixes, min over k ≥ i then max over
    // j ≤ i
    "x224_isotonic" ->
      (s"$qualityCtes, " +
        "f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
        s"w AS (SELECT weights, intercept FROM ${Stage.sqlRef("x224_weights")}), " +
        "z AS (SELECT doc_id, round(intercept + weights[1] * f0 + weights[2] * f1 + " +
        "weights[3] * f2 + weights[4] * f3, 6) AS score FROM f CROSS JOIN w), " +
        "lab AS (SELECT z.doc_id, z.score, CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos " +
        "FROM z JOIN documents d USING (doc_id)), " +
        "q AS (SELECT CAST(floor(1e6 / (1.0 + exp(-score)) + 0.5) AS BIGINT) AS pm, pos, " +
        "CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rk, " +
        "(SELECT count(*) FROM lab) AS nn FROM lab), " +
        "b AS (SELECT ((rk - 1) * 20) // nn AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(pm) AS BIGINT) AS sp, CAST(sum(pos) AS BIGINT) AS np FROM q GROUP BY 1), " +
        "pre AS (SELECT x.bin, CAST(sum(y.n) AS BIGINT) AS cn, " +
        "CAST(sum(y.np) AS BIGINT) AS cnp FROM b x JOIN b y ON y.bin <= x.bin GROUP BY 1), " +
        "iv AS (SELECT j1.bin + 1 AS j, k.bin AS kk, " +
        "CAST(k.cnp - j1.cnp AS DOUBLE) / CAST(k.cn - j1.cn AS DOUBLE) AS a " +
        "FROM pre k JOIN pre j1 ON j1.bin < k.bin " +
        "UNION ALL SELECT 0, bin, CAST(cnp AS DOUBLE) / CAST(cn AS DOUBLE) FROM pre), " +
        "mm AS (SELECT b.bin AS i, iv.j, min(iv.a) AS ma FROM b " +
        "JOIN iv ON iv.j <= b.bin AND b.bin <= iv.kk GROUP BY 1, 2), " +
        "iso AS (SELECT i, max(ma) AS iso FROM mm GROUP BY 1) " +
        "SELECT CAST(b.bin AS BIGINT) AS bin, n, " +
        "round(CAST(sp AS DOUBLE) / 1e6 / n, 6) AS mean_pred, " +
        "round(CAST(np AS DOUBLE) / n, 6) AS frac_pos, " +
        "round(iso, 6) AS iso_calibrated " +
        "FROM b JOIN iso ON iso.i = b.bin ORDER BY bin"),
    // same staged scoring, same decile bins carrying the exact integer
    // Brier numerators, totals derived FROM the bins, the same two
    // bin-ordered list folds for the rel/res sums
    "x227_brier_decomp" ->
      (s"$qualityCtes, " +
        "f AS (SELECT doc_id, CAST(mk / n AS DOUBLE) AS f0, punct AS f1, mtl AS f2, " +
        "least(CAST(n AS DOUBLE) / 100, 1.0) AS f3 FROM c), " +
        s"w AS (SELECT weights, intercept FROM ${Stage.sqlRef("x227_weights")}), " +
        "z AS (SELECT doc_id, round(intercept + weights[1] * f0 + weights[2] * f1 + " +
        "weights[3] * f2 + weights[4] * f3, 6) AS score FROM f CROSS JOIN w), " +
        "lab AS (SELECT z.doc_id, z.score, CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS pos " +
        "FROM z JOIN documents d USING (doc_id)), " +
        "q AS (SELECT CAST(floor(1e6 / (1.0 + exp(-score)) + 0.5) AS BIGINT) AS pm, pos, " +
        "CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rk, " +
        "(SELECT count(*) FROM lab) AS nn FROM lab), " +
        "b AS (SELECT ((rk - 1) * 10) // nn AS bin, CAST(count(*) AS BIGINT) AS bn, " +
        "CAST(sum(pm) AS BIGINT) AS sp, CAST(sum(pos) AS BIGINT) AS np, " +
        "CAST(sum((pm - pos * 1000000) * (pm - pos * 1000000)) AS DECIMAL(38,0)) AS bqk " +
        "FROM q GROUP BY 1), " +
        "t AS (SELECT CAST(sum(bn) AS BIGINT) AS n, CAST(sum(np) AS BIGINT) AS npos, " +
        "CAST(sum(bqk) AS DECIMAL(38,0)) AS bq FROM b), " +
        "fold AS (SELECT list_reduce(list_prepend(0.0, " +
        "list((CAST(sp AS DOUBLE) / 1e6 - np) * (CAST(sp AS DOUBLE) / 1e6 - np) / bn " +
        "ORDER BY bin)), (x, y) -> x + y) AS relsum, " +
        "list_reduce(list_prepend(0.0, " +
        "list((np - bn * (CAST(npos AS DOUBLE) / n)) * (np - bn * (CAST(npos AS DOUBLE) / n)) / bn " +
        "ORDER BY bin)), (x, y) -> x + y) AS ressum FROM b CROSS JOIN t) " +
        "SELECT n, round(CAST(bq AS DOUBLE) / 1e12 / n, 6) AS brier, " +
        "round(relsum / n, 6) AS reliability, " +
        "round(ressum / n, 6) AS resolution, " +
        "round((CAST(npos AS DOUBLE) / n) * (1.0 - CAST(npos AS DOUBLE) / n), 6) AS uncertainty, " +
        "round(CAST(bq AS DOUBLE) / 1e12 / n - (relsum / n - ressum / n + " +
        "(CAST(npos AS DOUBLE) / n) * (1.0 - CAST(npos AS DOUBLE) / n)), 6) AS residual " +
        "FROM t CROSS JOIN fold"),
    // components + BOTH split arithmetics re-derived from the staged
    // banded pairs (the x46 recursive-CC machinery); the group-split
    // straddle count must be 0 by construction in both engines
    "x202_split_leakage" ->
      (s"""WITH RECURSIVE pr AS (SELECT id_a, id_b
         |  FROM ${Stage.sqlRef("x202_pairs")}),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         |g AS (SELECT d.doc_id,
         |    coalesce(comp.component, d.doc_id) AS group_key
         |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
         |sp AS (SELECT doc_id, ${splitCaseOver("group_key")} AS gsplit,
         |    ${splitCaseOver("doc_id")} AS nsplit FROM g),
         |j AS (SELECT a.gsplit AS ga, b.gsplit AS gb, a.nsplit AS na,
         |    b.nsplit AS nb
         |  FROM pr p JOIN sp a ON a.doc_id = p.id_a
         |  JOIN sp b ON b.doc_id = p.id_b),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_straddle_naive,
         |    CAST(sum(CASE WHEN ga <> gb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_straddle_group FROM j)
         |SELECT n_pairs, n_straddle_naive, n_straddle_group,
         |  round($LeakRateSql, 6) AS leak_rate_naive
         |FROM t""".stripMargin.replace("\n", " ")),
    // same literal directions (ONE Scala constant), the x183 fold for
    // the projections, the x167 exact-integer W1 machinery partitioned
    // by slice, the SHARED W1Sql read
    "x200_sliced_w1" ->
      (s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    vec_id % 2 = 0 AS isA FROM embeddings),
         |dirs AS ($slicedW1DirSql),
         |p AS (SELECT slice, CAST(floor(list_reduce(list_prepend(0.0,
         |    list_transform(list_zip(v, d), q -> q[1] * q[2])),
         |    (x, y) -> x + y) * 1e6 + 0.5) AS BIGINT) AS vm, isA
         |  FROM e CROSS JOIN dirs),
         |c AS (SELECT slice, vm,
         |    CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN NOT isA THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM p GROUP BY 1, 2),
         |t AS (SELECT slice, CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb FROM c GROUP BY 1),
         |cum AS (SELECT slice, vm,
         |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
         |    CAST(sum(cb) OVER w AS BIGINT) AS cumb,
         |    lead(vm) OVER (PARTITION BY slice ORDER BY vm) AS nxt FROM c
         |  WINDOW w AS (PARTITION BY slice ORDER BY vm
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |d2 AS (SELECT cum.slice,
         |    abs(CAST(cuma AS HUGEINT) * t.nb - CAST(cumb AS HUGEINT) * t.na)
         |      * CAST(nxt - vm AS HUGEINT) AS term, t.na, t.nb
         |  FROM cum JOIN t USING (slice) WHERE nxt IS NOT NULL),
         |f AS (SELECT slice, CAST(max(na) AS BIGINT) AS na,
         |    CAST(max(nb) AS BIGINT) AS nb, CAST(sum(term) AS HUGEINT) AS st
         |  FROM d2 GROUP BY 1)
         |SELECT CAST(slice AS BIGINT) AS slice, na AS n_a, nb AS n_b,
         |  round($W1Sql, 6) AS w1
         |FROM f ORDER BY slice""".stripMargin.replace("\n", " ")),
    // same tokenization, the SHARED nano-quantized parameter strings
    // (NbLpSql/NbDefSql/NbPriorSql), the same seen-terms-only
    // decomposition, and the same (scoren DESC, cls) argmax
    "x168_naive_bayes" ->
      (s"""WITH tk AS (SELECT doc_id, source, unnest($toks) AS term FROM documents),
         |dt AS (SELECT doc_id, source, term, CAST(count(*) AS BIGINT) AS m
         |  FROM tk GROUP BY 1, 2, 3),
         |ct AS (SELECT source AS cls, term, CAST(sum(m) AS BIGINT) AS cst
         |  FROM dt GROUP BY 1, 2),
         |nst AS (SELECT cls, CAST(sum(cst) AS BIGINT) AS ns FROM ct GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM dt),
         |dcls AS (SELECT source AS cls, CAST(count(*) AS BIGINT) AS dc
         |  FROM documents GROUP BY 1),
         |dtot AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
         |clsp AS (SELECT cls, $NbDefSql AS defn, $NbPriorSql AS priorn
         |  FROM nst JOIN dcls USING (cls) CROSS JOIN vv CROSS JOIN dtot),
         |delta AS (SELECT lp.cls, lp.term, lpn - defn AS dn
         |  FROM (SELECT ct.cls, ct.term, $NbLpSql AS lpn
         |    FROM ct JOIN nst USING (cls) CROSS JOIN vv) lp
         |  JOIN clsp USING (cls)),
         |dtm AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS tm
         |  FROM documents),
         |base AS (SELECT doc_id, source, cls, priorn + tm * defn AS basen
         |  FROM dtm CROSS JOIN clsp),
         |con AS (SELECT dt.doc_id, delta.cls, CAST(sum(m * dn) AS BIGINT) AS sn
         |  FROM dt JOIN delta USING (term) GROUP BY 1, 2),
         |sc AS (SELECT base.doc_id, base.source, base.cls,
         |    basen + coalesce(sn, 0) AS scoren
         |  FROM base LEFT JOIN con ON base.doc_id = con.doc_id AND base.cls = con.cls),
         |pred AS (SELECT doc_id, source, cls FROM (SELECT *,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY scoren DESC, cls) AS rk
         |  FROM sc) WHERE rk = 1)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN cls = source THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |  round(CAST(sum(CASE WHEN cls = source THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS accuracy
         |FROM pred GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    // same directed edge set, the x86 unrolled-iteration device with
    // HITS's alternating half-steps: tick-quantized contributions, exact
    // integer normalizers, one 12-dp-rounded division per score
    "x169_hits" -> {
      val head =
        "WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey * 2 AS src, " +
          "l_partkey * 2 + 1 AS dst FROM lineitem), " +
          "nn AS MATERIALIZED (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM e), " +
          "h0 AS MATERIALIZED (SELECT src AS node, " +
          "floor(CAST(1.0 AS DOUBLE) / nn.n * 1e12 + 0.5) / 1e12 AS sc " +
          "FROM (SELECT DISTINCT src FROM e) CROSS JOIN nn)"
      def aStep(k: Int) =
        s"a${k}r AS MATERIALIZED (SELECT e.dst AS node, " +
          "CAST(sum(CAST(floor(h.sc * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS r " +
          s"FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY 1), " +
          s"a$k AS MATERIALIZED (SELECT node, " +
          "round(CAST(r AS DOUBLE) / CAST(s AS DOUBLE), 12) AS sc " +
          s"FROM a${k}r CROSS JOIN (SELECT CAST(sum(r) AS BIGINT) AS s FROM a${k}r))"
      def hStep(k: Int) =
        s"h${k}r AS MATERIALIZED (SELECT e.src AS node, " +
          "CAST(sum(CAST(floor(a.sc * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS r " +
          s"FROM e JOIN a$k a ON e.dst = a.node GROUP BY 1), " +
          s"h$k AS MATERIALIZED (SELECT node, " +
          "round(CAST(r AS DOUBLE) / CAST(s AS DOUBLE), 12) AS sc " +
          s"FROM h${k}r CROSS JOIN (SELECT CAST(sum(r) AS BIGINT) AS s FROM h${k}r))"
      def topCte(name: String, role: String, from: String) =
        s"$name AS (SELECT '$role' AS role, " +
          "CAST(row_number() OVER (ORDER BY sc DESC, node) AS BIGINT) AS rank, " +
          s"node, round(sc, 6) AS score FROM $from ORDER BY sc DESC, node LIMIT 10)"
      head + ", " + (1 to 3).map(k => aStep(k) + ", " + hStep(k)).mkString(", ") +
        ", " + topCte("topa", "auth", "a3") + ", " + topCte("toph", "hub", "h3") +
        " SELECT * FROM topa UNION ALL SELECT * FROM toph ORDER BY role, rank"
    },
    // same first-occurrence novelty accounting, the same doc_id-ordered
    // cumsums, nano-quantized ln points, HUGEINT ≡ DECIMAL(38,0) exact
    // sufficient statistics, and the SHARED OLS read strings
    "x170_heaps_law" ->
      (s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS ntk FROM documents),
         |ft AS (SELECT term, min(doc_id) AS fdoc
         |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents) GROUP BY 1),
         |nt AS (SELECT fdoc AS doc_id, CAST(count(*) AS BIGINT) AS nty FROM ft GROUP BY 1),
         |cum AS (SELECT d.doc_id,
         |    CAST(sum(ntk) OVER w AS BIGINT) AS nk,
         |    CAST(sum(coalesce(nty, 0)) OVER w AS BIGINT) AS vk
         |  FROM d LEFT JOIN nt USING (doc_id)
         |  WINDOW w AS (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |p AS (SELECT
         |    CAST(floor(ln(CAST(nk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS xn,
         |    CAST(floor(ln(CAST(vk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS yn
         |  FROM cum WHERE nk > 0 AND vk > 0),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(xn) AS HUGEINT) AS sx, CAST(sum(yn) AS HUGEINT) AS sy,
         |    sum(CAST(xn AS HUGEINT) * yn) AS sxy,
         |    sum(CAST(xn AS HUGEINT) * xn) AS sxx FROM p)
         |SELECT n AS n_points, round($HeapsBetaSql, 6) AS beta,
         |  round($HeapsLnKSql, 6) AS ln_k FROM s""".stripMargin.replace("\n", " ")),
    // same quality CTEs and integer banding as x166, the SHARED
    // Chi2CellSql cells in (band, grp) fold order, and the SHARED
    // BhThrSql step-up comparison
    "x171_bh_fdr" ->
      (s"""$qualityCtes,
         |q AS (SELECT d.source,
         |    least(2, CAST(floor(($qualityExprSql) * 10000 + 0.5) AS BIGINT) // 3334) AS band
         |  FROM c JOIN documents d USING (doc_id)),
         |cnt AS (SELECT source, band, CAST(count(*) AS BIGINT) AS cc FROM q GROUP BY 1, 2),
         |spine AS (SELECT source, band FROM (SELECT DISTINCT source FROM documents)
         |  CROSS JOIN (SELECT CAST(range AS BIGINT) AS band FROM range(3))),
         |cells AS (SELECT spine.source, spine.band, CAST(coalesce(cc, 0) AS BIGINT) AS cv
         |  FROM spine LEFT JOIN cnt USING (source, band)),
         |gbin AS (SELECT band, CAST(sum(cv) AS BIGINT) AS g FROM cells GROUP BY 1),
         |nsrc AS (SELECT source, CAST(sum(cv) AS BIGINT) AS ns FROM cells GROUP BY 1),
         |t AS (SELECT CAST(sum(cv) AS BIGINT) AS nn FROM cells),
         |wide AS (SELECT cells.source, cells.band, cells.cv, g, ns, nn
         |  FROM cells JOIN gbin USING (band) JOIN nsrc USING (source) CROSS JOIN t),
         |lng AS (SELECT source, band, 'in' AS grp, cv AS o, g AS rt, ns AS ct, nn FROM wide
         |  UNION ALL SELECT source, band, 'out', g - cv, g, nn - ns, nn FROM wide),
         |chi AS (SELECT source, list_reduce(list_prepend(0.0,
         |      list(contrib ORDER BY band, grp)), (x, y) -> x + y) AS chi2
         |  FROM (SELECT source, band, grp, ($Chi2CellSql) AS contrib
         |    FROM lng WHERE rt > 0) GROUP BY 1),
         |rk AS (SELECT source, chi2,
         |    CAST(row_number() OVER (ORDER BY chi2 DESC, source) AS BIGINT) AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m FROM chi),
         |fl AS (SELECT *, ($BhThrSql) AS thr, chi2 >= ($BhThrSql) AS flag FROM rk),
         |ks AS (SELECT max(CASE WHEN flag THEN rank END) AS kstar FROM fl)
         |SELECT source, round(chi2, 6) AS chi2, rank, round(thr, 6) AS thr_chi2,
         |  rank <= coalesce(kstar, 0) AS rejected
         |FROM fl CROSS JOIN ks ORDER BY rank""".stripMargin.replace("\n", " ")),
    // same half split (list_slice end-inclusive ≡ Spark slice length
    // form), the x02 marker CASE on each half, same both-confident
    // disagreement rule
    "x172_mixed_lang" -> {
      val caseSql = "CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und' " +
        "WHEN en = greatest(en, de, fr, es) THEN 'en' " +
        "WHEN de = greatest(en, de, fr, es) THEN 'de' " +
        "WHEN fr = greatest(en, de, fr, es) THEN 'fr' " +
        "WHEN es = greatest(en, de, fr, es) THEN 'es' ELSE 'und' END"
      def langOf(half: String) =
        s"(SELECT doc_id, source, ${markers("en")} AS en, ${markers("de")} AS de, " +
          s"${markers("fr")} AS fr, ${markers("es")} AS es FROM $half)"
      s"WITH m AS (SELECT doc_id, source, $toks AS ts0 FROM documents), " +
        "f AS (SELECT doc_id, source, ts0, len(ts0) AS n, " +
        "(len(ts0) + 1) // 2 AS h FROM m WHERE len(ts0) >= 2), " +
        "ha AS (SELECT doc_id, source, list_slice(ts0, 1, h) AS ts FROM f), " +
        "hb AS (SELECT doc_id, source, list_slice(ts0, h + 1, n) AS ts FROM f), " +
        s"la AS (SELECT doc_id, source, $caseSql AS la FROM ${langOf("ha")}), " +
        s"lb AS (SELECT doc_id, $caseSql AS lb FROM ${langOf("hb")}) " +
        "SELECT la.source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN la != lb AND la != 'und' AND lb != 'und' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed, " +
        "round(CAST(sum(CASE WHEN la != lb AND la != 'und' AND lb != 'und' " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS pct_mixed " +
        "FROM la JOIN lb USING (doc_id) GROUP BY 1 ORDER BY 1"
    },
    // same counts, the SHARED integer micro-tick string keys the top-20,
    // same integer cross-multiply direction
    "x173_keyness" ->
      (s"""WITH tk AS (SELECT (source = 'src0') AS tgt, unnest($toks) AS term
         |  FROM documents),
         |c AS (SELECT term, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS b
         |  FROM tk GROUP BY 1),
         |t AS (SELECT CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS tb FROM tk),
         |g AS (SELECT term, a, b, $G2MicroSql AS g2n,
         |    CASE WHEN a * tb > b * ta THEN 'src0' ELSE 'rest' END AS dir
         |  FROM c CROSS JOIN t)
         |SELECT term, a AS n_target, b AS n_rest, dir,
         |  round(CAST(g2n AS DOUBLE) / 1e6, 6) AS g2
         |FROM g ORDER BY g2n DESC, term LIMIT 20""".stripMargin.replace("\n", " ")),
    // same digit extraction (VARCHAR ≡ STRING cast of the exact BIGINT),
    // same literal expectations, digit-ordered fold ≡ list_reduce
    "x174_benford" ->
      (s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders),
         |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS cc FROM d GROUP BY 1),
         |cells AS (SELECT s.digit, CAST(coalesce(cc, 0) AS BIGINT) AS o
         |  FROM (SELECT CAST(range AS BIGINT) AS digit FROM range(1, 10)) s
         |  LEFT JOIN o USING (digit)),
         |t AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
         |f AS (SELECT digit, o, nn, ($BenfordCellSql) AS contrib
         |  FROM cells CROSS JOIN t),
         |x AS (SELECT round(list_reduce(list_prepend(0.0,
         |    list(contrib ORDER BY digit)), (a, b) -> a + b), 6) AS chi2 FROM f)
         |SELECT digit, o AS n_obs, round(CAST(o AS DOUBLE) / nn, 6) AS p_obs,
         |  round($BenfordPSql, 6) AS p_benford, chi2
         |FROM f CROSS JOIN x ORDER BY digit""".stripMargin.replace("\n", " ")),
    // same (doc, term) collapse, HUGEINT ≡ DECIMAL(38,0) widened sums,
    // the SHARED division string, exact micro-tick ordering
    "x175_burstiness" ->
      (s"""WITH dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS m
         |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents) GROUP BY 1, 2),
         |d AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
         |g AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(m) AS HUGEINT) AS sm, CAST(sum(m * m) AS HUGEINT) AS sm2
         |  FROM dt GROUP BY 1),
         |f AS (SELECT term, df, sm, sm2, dd FROM g CROSS JOIN d
         |  WHERE sm >= 50 AND df >= 2),
         |q AS (SELECT term, df, sm,
         |    CAST(floor(($BurstSql) * 1e6 + 0.5) AS BIGINT) AS bn FROM f)
         |SELECT term, df, CAST(sm AS BIGINT) AS tf,
         |  round(CAST(bn AS DOUBLE) / 1e6, 6) AS burstiness
         |FROM q ORDER BY bn DESC, term LIMIT 20""".stripMargin.replace("\n", " ")),
    // x226's variant hash + exact micro-sums, split pre/post at the
    // shared epoch-micros cutoff; then the same moment row and the same
    // θ / adjusted-lift / ρ² strings the engine evaluates
    "x228_cuped" ->
      (s"""WITH e AS (SELECT user_id,
         |  CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |    < '8000' THEN 'b' ELSE 'a' END AS variant,
         |  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
         |  CASE WHEN epoch_us(ts) < $CupedCutoffUs THEN 1 ELSE 0 END AS pre
         |  FROM events),
         |u AS (SELECT user_id, variant,
         |    CAST(sum(CASE WHEN pre = 1 THEN vm ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN pre = 0 THEN vm ELSE 0 END) AS BIGINT) AS y
         |  FROM e GROUP BY 1, 2),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy,
         |    CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN y ELSE 0 END) AS BIGINT) AS sy_b
         |  FROM u)
         |SELECT n, n_a, n_b,
         |  round($CupedThetaSql, 6) AS theta,
         |  round((${CupedMeanSql("sy", "b")}) - (${CupedMeanSql("sy", "a")}), 6) AS diff_raw,
         |  round($CupedDiffAdjSql, 6) AS diff_cuped,
         |  round($CupedVarRedSql, 6) AS var_reduction
         |FROM m""".stripMargin.replace("\n", " ")),
    // staged-weights scoring prefix, lang joined back on, integer
    // confusion cells per lang, the same guarded divisions and the same
    // round-then-gap arithmetic
    "x229_equalized_odds" ->
      (s"${scoredLabCtes("x229_weights")}, " +
        "gl AS (SELECT lab.score, lab.pos, d.lang FROM lab " +
        "JOIN documents d USING (doc_id)), " +
        "g AS (SELECT lang, CAST(sum(pos) AS BIGINT) AS np, " +
        "CAST(sum(1 - pos) AS BIGINT) AS nn, " +
        "CAST(sum(CASE WHEN score >= 0.0 THEN pos ELSE 0 END) AS BIGINT) AS tp, " +
        "CAST(sum(CASE WHEN score >= 0.0 THEN 1 - pos ELSE 0 END) AS BIGINT) AS fp " +
        "FROM gl GROUP BY 1), " +
        "r AS (SELECT lang, np, nn, " +
        "round(CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / np END, 6) AS tpr, " +
        "round(CASE WHEN nn > 0 THEN CAST(fp AS DOUBLE) / nn END, 6) AS fpr FROM g), " +
        "gap AS (SELECT max(tpr) - min(tpr) AS tg, max(fpr) - min(fpr) AS fg FROM r) " +
        "SELECT lang, np AS n_pos, nn AS n_neg, tpr, fpr, " +
        "round(tg, 6) AS tpr_gap, round(fg, 6) AS fpr_gap " +
        "FROM r CROSS JOIN gap ORDER BY lang"),
    // x87's orientation CTEs verbatim, the closure join keeping all three
    // corners, unnested into the per-node count; the same tick string
    // quantizes each coefficient before the order-independent integer sum
    "x230_local_clustering" ->
      ("WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a " +
        "JOIN po b ON a.ok = b.ok AND a.pk < b.pk), " +
        "deg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x), " +
        "de AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN u ELSE v END AS src, " +
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) " +
        "THEN v ELSE u END AS dst " +
        "FROM und JOIN deg du ON du.x = und.u JOIN deg dv ON dv.x = und.v), " +
        "tt AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM de e1 " +
        "JOIN de e2 ON e1.src = e2.src AND e1.dst < e2.dst " +
        "JOIN und ON und.u = e1.dst AND und.v = e2.dst), " +
        "tc AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM " +
        "(SELECT unnest([a, b, c]) AS x FROM tt) GROUP BY x), " +
        "pn AS (SELECT deg.d, coalesce(tc.t, 0) AS t FROM deg " +
        "LEFT JOIN tc ON tc.x = deg.x WHERE deg.d >= 2), " +
        s"q AS (SELECT d, t, ${graft.operators.Graph.LccTickSql} AS lq FROM pn) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_nodes, " +
        "CAST(sum(CASE WHEN t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed, " +
        "round(CAST(sum(lq) AS DOUBLE) / 1e9 / count(*), 6) AS avg_lcc " +
        "FROM q"),
    // staged-weights scoring + x227's naive-rank deciles, then the same
    // smoothed-WOE string and the same bin-ordered IV fold
    "x231_woe_iv" ->
      (s"${scoredLabCtes("x231_weights")}, " +
        "q AS (SELECT pos, CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rk, " +
        "(SELECT count(*) FROM lab) AS nn_docs FROM lab), " +
        "b AS (SELECT ((rk - 1) * 10) // nn_docs AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(pos) AS BIGINT) AS np, " +
        "CAST(count(*) - sum(pos) AS BIGINT) AS nn FROM q GROUP BY 1), " +
        "t AS (SELECT CAST(sum(np) AS BIGINT) AS tnp, CAST(sum(nn) AS BIGINT) AS tnn FROM b), " +
        "bt AS (SELECT * FROM b CROSS JOIN t), " +
        "iv AS (SELECT list_reduce(list_prepend(0.0, " +
        s"list((${WoeIvTermSql("")}) ORDER BY bin)), (x, y) -> x + y) AS iv FROM bt) " +
        "SELECT bin, n, np AS n_pos, " +
        s"round(${WoeSql("")}, 6) AS woe, round(iv, 6) AS iv " +
        "FROM bt CROSS JOIN iv ORDER BY bin"),
    // the shared tokenizer, then generated per-budget conditional sums
    // from the SAME ContextBudgets constant the engine aggregates
    "x232_context_fit" ->
      (s"WITH m AS (SELECT source, CAST(len($toks) AS BIGINT) AS nt FROM documents) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(nt) AS BIGINT) AS n_tokens, " +
        ContextBudgets.map(b =>
          s"CAST(sum(CASE WHEN nt <= $b THEN 1 ELSE 0 END) AS BIGINT) AS fit_$b, " +
            s"CAST(sum(greatest(nt - $b, 0)) AS BIGINT) AS lost_$b").mkString(", ") +
        " FROM m GROUP BY source ORDER BY source"),
    // the same literal sign matrix (one Scala constant renders both
    // engines' plans), the same seeded left folds for projection and
    // squared distances, the same 1e-6 tick quantization
    "x233_jl_distortion" ->
      (s"""WITH s0 AS (SELECT ${JlSigns.map(r =>
            r.mkString("[", ", ", "]")).mkString("[", ", ", "]")} AS S),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |p AS (SELECT vec_id, vec, list_transform(range(1, 17), j ->
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
         |      S[j][i] * vec[i])), (acc, v) -> acc + v) / 4.0) AS y
         |  FROM e CROSS JOIN s0),
         |pr AS (SELECT
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 65), i ->
         |      (a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i]))),
         |      (acc, v) -> acc + v) AS d2o,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 17), i ->
         |      (a.y[i] - b.y[i]) * (a.y[i] - b.y[i]))),
         |      (acc, v) -> acc + v) AS d2p
         |  FROM p a JOIN p b ON a.vec_id + 1 = b.vec_id),
         |q AS (SELECT CAST(floor(d2p / d2o * 1e6 + 0.5) AS BIGINT) AS rt
         |  FROM pr WHERE d2o > 0.0)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(rt) AS DOUBLE) / 1e6 / count(*), 6) AS mean_ratio,
         |  round(CAST(min(rt) AS DOUBLE) / 1e6, 6) AS min_ratio,
         |  round(CAST(max(rt) AS DOUBLE) / 1e6, 6) AS max_ratio
         |FROM q""".stripMargin.replace("\n", " ")),
    // the x01 tokenizer + the x99 greedy encoder pattern, spliced from
    // the same constants; same guarded divisions
    "x239_fertility" ->
      (s"""WITH m AS (SELECT lang, CAST(len($toks) AS BIGINT) AS nt,
         |    CAST(len(regexp_extract_all(lower(text), '$SubwordPattern')) AS BIGINT) AS np,
         |    CAST(strlen(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS na
         |  FROM documents),
         |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(sum(np) AS BIGINT) AS n_pieces,
         |    CAST(sum(na) AS BIGINT) AS n_alpha
         |  FROM m GROUP BY 1)
         |SELECT lang, n_docs, n_tokens, n_pieces,
         |  round(CASE WHEN n_tokens > 0 THEN CAST(n_pieces AS DOUBLE) / n_tokens END, 6) AS pieces_per_token,
         |  round(CASE WHEN n_pieces > 0 THEN CAST(n_alpha AS DOUBLE) / n_pieces END, 6) AS alpha_per_piece
         |FROM g ORDER BY lang""".stripMargin.replace("\n", " ")),
    // the x228 user frame, per-user diff, then x126's moment row over the
    // diff so SE/t reuse the shared Welch strings verbatim
    "x240_did" ->
      (s"""WITH e AS (SELECT user_id,
         |  CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |    < '8000' THEN 'b' ELSE 'a' END AS variant,
         |  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
         |  CASE WHEN epoch_us(ts) < $CupedCutoffUs THEN 1 ELSE 0 END AS pre
         |  FROM events),
         |u AS (SELECT user_id, variant,
         |    CAST(sum(CASE WHEN pre = 0 THEN vm ELSE 0 END) -
         |      sum(CASE WHEN pre = 1 THEN vm ELSE 0 END) AS BIGINT) AS dd,
         |    CAST(sum(CASE WHEN pre = 1 THEN vm ELSE 0 END) AS BIGINT) AS x
         |  FROM e GROUP BY 1, 2),
         |m AS (SELECT
         |    CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN dd ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN dd ELSE 0 END) AS BIGINT) AS s_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS DECIMAL(38,0)) AS q_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS DECIMAL(38,0)) AS q_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN x ELSE 0 END) AS BIGINT) AS px_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN x ELSE 0 END) AS BIGINT) AS px_b
         |  FROM u)
         |SELECT n_a, n_b,
         |  round((CAST(px_a AS DOUBLE) / 1e6) / n_a, 6) AS pre_a,
         |  round((CAST(px_b AS DOUBLE) / 1e6) / n_b, 6) AS pre_b,
         |  round((${WelchMean("b")}) - (${WelchMean("a")}), 6) AS did,
         |  round($AbSeSql, 6) AS se,
         |  round($WelchTSql, 6) AS t
         |FROM m""".stripMargin.replace("\n", " ")),
    // the x234/x238 SHARED oracle (x238 aliases this entry below the
    // map): the x226 variant hash + moment row for the pooled plug-in
    // variance, the same day-spine prefix joins, the same ln Λ tick
    // string. One SQL text gates both the batch scan and the streaming
    // drain (AvailableNow over the same parquet produces the same
    // additive cells — the x176/x177 stream-twin contract).
    "x234_msprt" ->
      (s"""WITH e AS (SELECT user_id,
         |  CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |    < '8000' THEN 'b' ELSE 'a' END AS variant,
         |  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
         |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1 AS d
         |  FROM events),
         |sg0 AS (SELECT CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN vm ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN vm ELSE 0 END) AS BIGINT) AS s_b,
         |    sum(CASE WHEN variant = 'a' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_a,
         |    sum(CASE WHEN variant = 'b' THEN CAST(vm AS HUGEINT) * vm ELSE 0 END) AS q_b
         |  FROM e),
         |sg AS (SELECT (${WelchVar("a")} + ${WelchVar("b")}) / 2.0 AS sig2 FROM sg0),
         |dl AS (SELECT d,
         |    CAST(sum(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS dna,
         |    CAST(sum(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS dnb,
         |    CAST(sum(CASE WHEN variant = 'a' THEN vm ELSE 0 END) AS BIGINT) AS dsa,
         |    CAST(sum(CASE WHEN variant = 'b' THEN vm ELSE 0 END) AS BIGINT) AS dsb
         |  FROM e GROUP BY 1),
         |cum AS (SELECT t.d, CAST(sum(p.dna) AS BIGINT) AS na,
         |    CAST(sum(p.dnb) AS BIGINT) AS nb, CAST(sum(p.dsa) AS BIGINT) AS sa,
         |    CAST(sum(p.dsb) AS BIGINT) AS sb
         |  FROM dl t JOIN dl p ON p.d <= t.d GROUP BY 1),
         |ct AS (SELECT cum.*, sig2 FROM cum CROSS JOIN sg WHERE na > 0 AND nb > 0),
         |lt AS (SELECT d, na, nb, sa, sb, sig2,
         |    CAST(floor(($MsprtLnLrSql) * 1e9 + 0.5) AS BIGINT) AS lt FROM ct),
         |mx AS (SELECT t.d, t.na, t.nb, t.sa, t.sb, t.sig2, t.lt,
         |    CAST(max(p.lt) AS BIGINT) AS mx
         |  FROM lt t JOIN lt p ON p.d <= t.d GROUP BY 1, 2, 3, 4, 5, 6, 7)
         |SELECT d, na AS n_a, nb AS n_b,
         |  round($MsprtThetaSql, 6) AS theta,
         |  round(CAST(lt AS DOUBLE) / 1e9, 6) AS ln_lr,
         |  round(CASE WHEN mx > 0 THEN exp(-CAST(mx AS DOUBLE) / 1e9)
         |    ELSE 1.0 END, 6) AS p_always_valid,
         |  CAST(CASE WHEN (CASE WHEN mx > 0 THEN exp(-CAST(mx AS DOUBLE) / 1e9)
         |    ELSE 1.0 END) <= 0.05 THEN 1 ELSE 0 END AS BIGINT) AS reject
         |FROM mx ORDER BY d""".stripMargin.replace("\n", " ")),
    // the same QI aggregate (band string shared), policy axis from the
    // same KAnonKs constant, identical violation/diversity arithmetic
    "x235_k_anonymity" ->
      (s"""WITH cls AS (SELECT c_nationkey, c_mktsegment, $KAnonBandSql AS band,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(DISTINCT substr(md5('sens:'||CAST(c_custkey AS VARCHAR)), 1, 1)) AS BIGINT) AS l
         |  FROM customer GROUP BY 1, 2, 3),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |    CAST(sum(n) AS BIGINT) AS nr, CAST(min(l) AS BIGINT) AS min_l,
         |    CAST(sum(l) AS BIGINT) AS sl FROM cls),
         |ks AS (SELECT unnest([${KAnonKs.mkString(", ")}]) AS k),
         |v AS (SELECT k,
         |    CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_classes,
         |    CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT) AS n_viol_rows
         |  FROM cls CROSS JOIN ks GROUP BY 1)
         |SELECT CAST(k AS BIGINT) AS k, n_classes, n_viol_classes, n_viol_rows,
         |  round(CAST(n_viol_rows AS DOUBLE) / nr, 6) AS viol_share,
         |  min_l, round(CAST(sl AS DOUBLE) / n_classes, 6) AS avg_l
         |FROM v CROSS JOIN t ORDER BY k""".stripMargin.replace("\n", " ")),
    // x10's cross-join ranking verbatim (cosSql, same tie-break), labels
    // joined back, the same tick quantization per query before the means
    "x236_mrr_recall" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |top AS (SELECT query_id, item_id, rank FROM (
         |  SELECT query_id, item_id, $cosSql AS cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank
         |  FROM i CROSS JOIN q WHERE item_id != query_id) WHERE rank <= 10),
         |tl AS (SELECT t.query_id, t.rank,
         |    CASE WHEN ql.label = il.label THEN 1 ELSE 0 END AS rel
         |  FROM top t JOIN lb ql ON ql.vec_id = t.query_id
         |  JOIN lb il ON il.vec_id = t.item_id),
         |rt AS (SELECT label, CAST(count(*) AS BIGINT) AS nl FROM lb GROUP BY 1),
         |pq AS (SELECT query_id, min(CASE WHEN rel = 1 THEN rank END) AS fr,
         |    CAST(sum(rel) AS BIGINT) AS hits FROM tl GROUP BY 1),
         |pq2 AS (SELECT pq.query_id, pq.fr, pq.hits, rt.nl - 1 AS nrel
         |  FROM pq JOIN lb ON lb.vec_id = pq.query_id JOIN rt ON rt.label = lb.label),
         |tk AS (SELECT
         |    CAST(floor(CASE WHEN fr IS NULL THEN 0.0 ELSE 1.0 / fr END * 1e6 + 0.5) AS BIGINT) AS rrt,
         |    CAST(floor(CASE WHEN nrel > 0 THEN CAST(hits AS DOUBLE) / nrel ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS rct,
         |    CAST(floor(CAST(hits AS DOUBLE) / 10.0 * 1e6 + 0.5) AS BIGINT) AS pct
         |  FROM pq2)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(CAST(sum(rrt) AS DOUBLE) / 1e6 / count(*), 6) AS mrr,
         |  round(CAST(sum(rct) AS DOUBLE) / 1e6 / count(*), 6) AS recall_at_10,
         |  round(CAST(sum(pct) AS DOUBLE) / 1e6 / count(*), 6) AS precision_at_10
         |FROM tk""".stripMargin.replace("\n", " ")),
    // the same seeds and the same spliced level/trend trees, evaluated
    // by a genuinely different strategy: a recursive CTE instead of the
    // engine's array fold
    "x237_holt" ->
      (s"""WITH RECURSIVE dl AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS DOUBLE) AS x FROM events GROUP BY 1, 2),
         |dr AS (SELECT event_type, x,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd FROM dl),
         |seed AS (SELECT r1.event_type, CAST(2 AS BIGINT) AS t,
         |    r2.x AS l, r2.x - r1.x AS b
         |  FROM dr r1 JOIN dr r2 ON r1.event_type = r2.event_type
         |    AND r1.rn = 1 AND r2.rn = 2),
         |h AS (SELECT * FROM seed
         |  UNION ALL
         |  SELECT h.event_type, h.t + 1,
         |    ${HoltLSql("h.", "d.x")} AS l, ${HoltBSql("h.", "d.x")} AS b
         |  FROM h JOIN dr d ON d.event_type = h.event_type AND d.rn = h.t + 1),
         |fin AS (SELECT h.event_type, d2.nd, h.l, h.b FROM h
         |  JOIN (SELECT DISTINCT event_type, nd FROM dr) d2
         |    ON d2.event_type = h.event_type WHERE h.t = d2.nd)
         |SELECT event_type, nd AS n_days, round(l, 6) AS level,
         |  round(b, 6) AS trend, round(l + b, 6) AS fc_1,
         |  round(l + 7.0 * b, 6) AS fc_7
         |FROM fin ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // the same planted-secret rewrite (text2 aliased back to `text` so
    // the shared tokenizer splice applies), the same candidate gates,
    // PER-ROW entropy via the same parameterized tick over a list
    // comprehension (order-free integer addition), same additive cells
    // and rollup (x247 aliases this entry below the map)
    "x242_secret_scan" ->
      (s"""WITH d2 AS (SELECT doc_id, source,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' sk_' ||
         |      md5('sk:'||CAST(doc_id AS VARCHAR)) ELSE text END AS text
         |  FROM documents),
         |tk AS (SELECT source, unnest($toks) AS tok FROM d2),
         |cand AS (SELECT source, tok,
         |    [tok[i] for i in range(1, len(tok) + 1)] AS chs,
         |    CAST(len(tok) AS BIGINT) AS n
         |  FROM tk
         |  WHERE len(tok) >= $SecretMinLen AND regexp_matches(tok, '[0-9]')
         |    AND regexp_matches(tok, '[A-Za-z]')),
         |ent AS (SELECT source, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(list_distinct(chs), c ->
         |      ${SecretTermTick("len(list_filter(chs, x -> x = c))", "n")})),
         |    (a, b) -> a + b) AS ht FROM cand),
         |cells AS (SELECT source, CAST(count(*) AS BIGINT) AS n_candidates,
         |    CAST(sum(CASE WHEN ht >= $SecretEntropyTicks THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_flagged,
         |    CAST(sum(CASE WHEN ht >= $SecretEntropyTicks THEN ht ELSE 0 END) AS BIGINT)
         |      AS sht
         |  FROM ent GROUP BY 1)
         |SELECT source, n_candidates, n_flagged,
         |  round(CAST(n_flagged AS DOUBLE) / n_candidates, 6) AS flag_rate,
         |  round(CASE WHEN n_flagged > 0 THEN
         |    CAST(sht AS DOUBLE) / 1e12 / n_flagged END, 6)
         |    AS mean_entropy_flagged
         |FROM cells ORDER BY source""".stripMargin.replace("\n", " ")),
    // sort-based quantile_cont over the SAME micro-quantized doubles the
    // engine's histogram walk interpolates — different evaluation
    // strategy, identical definition h = (n−1)p, v₁ + frac·(v₂ − v₁)
    "x250_stream_slo" ->
      (s"""WITH e AS (SELECT event_type,
         |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events)
         |""".stripMargin +
        SloPs.map(p =>
          s"SELECT event_type, CAST($p AS DOUBLE) AS p, CAST(count(*) AS BIGINT) AS n, " +
            s"round(quantile_cont(CAST(vm AS DOUBLE) / 1e6, $p), 6) AS slo_value " +
            "FROM e GROUP BY 1").mkString("", " UNION ALL ", " ") +
        "ORDER BY event_type, p").replace("\n", " "),
    // quantile_cont ≡ percentile, identical rounding
    "x249_value_slo" ->
      ("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  round(quantile_cont(value, 0.5), 6) AS p50,
         |  round(quantile_cont(value, 0.95), 6) AS p95,
         |  round(quantile_cont(value, 0.99), 6) AS p99,
         |  round(max(value), 6) AS max_value
         |FROM events GROUP BY event_type
         |ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // x215's cent-histogram trim CTEs, partitioned by the x226 variant
    // hash; same exact boundary integers and shared trimmed-mean strings
    "x248_robust_ab" ->
      (s"""WITH e AS (SELECT
         |    CASE WHEN substr(md5('ab1:'||CAST(user_id AS VARCHAR)), 1, 4)
         |      < '8000' THEN 'b' ELSE 'a' END AS variant,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events),
         |h AS (SELECT variant, cents, CAST(count(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |t AS (SELECT variant, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         |cb AS (SELECT h.variant, h.cents, h.c, t.n,
         |    CAST(coalesce(sum(h.c) OVER (PARTITION BY h.variant
         |      ORDER BY h.cents ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND 1 PRECEDING), 0) AS BIGINT) AS cb
         |  FROM h JOIN t USING (variant)),
         |kp AS (SELECT variant, cents, n,
         |    greatest(0, least(cb + c, n - k) - greatest(cb, k)) AS kept
         |  FROM (SELECT *, CAST(floor(CAST(n AS DOUBLE) * 0.05) AS BIGINT) AS k
         |    FROM cb)),
         |m AS (SELECT
         |    CAST(max(CASE WHEN variant = 'a' THEN n END) AS BIGINT) AS n_a,
         |    CAST(max(CASE WHEN variant = 'b' THEN n END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN kept ELSE 0 END) AS BIGINT) AS nk_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN kept ELSE 0 END) AS BIGINT) AS nk_b,
         |    CAST(sum(CASE WHEN variant = 'a' THEN CAST(kept AS HUGEINT) * cents ELSE 0 END)
         |      AS DECIMAL(38,0)) AS sw_a,
         |    CAST(sum(CASE WHEN variant = 'b' THEN CAST(kept AS HUGEINT) * cents ELSE 0 END)
         |      AS DECIMAL(38,0)) AS sw_b
         |  FROM kp WHERE kept > 0)
         |SELECT n_a, n_b, nk_a, nk_b,
         |  round(${RobustTmSql("a")}, 6) AS tm_a,
         |  round(${RobustTmSql("b")}, 6) AS tm_b,
         |  round((${RobustTmSql("b")}) - (${RobustTmSql("a")}), 6) AS trimmed_lift
         |FROM m""".stripMargin.replace("\n", " ")),
    // per-user frame, THREE naive row_number ranks (each hash match
    // re-proves the Ranks device lossless), same code/rollup arithmetic
    "x244_rfm" ->
      ("""WITH u AS (SELECT user_id,
         |    date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-31') AS rec,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS mon
         |  FROM events GROUP BY 1),
         |r AS (SELECT mon,
         |    CAST(row_number() OVER (ORDER BY rec DESC, user_id) AS BIGINT) AS rk_r,
         |    CAST(row_number() OVER (ORDER BY freq, user_id) AS BIGINT) AS rk_f,
         |    CAST(row_number() OVER (ORDER BY mon, user_id) AS BIGINT) AS rk_m,
         |    (SELECT count(*) FROM u) AS nn
         |  FROM u),
         |c AS (SELECT ((rk_r - 1) * 5) // nn + 1 AS r_code,
         |    ((rk_f - 1) * 5) // nn + 1 AS f_code,
         |    ((rk_m - 1) * 5) // nn + 1 AS m_code, mon FROM r)
         |SELECT CAST(r_code AS BIGINT) AS r_code, CAST(f_code AS BIGINT) AS f_code,
         |  CAST(m_code AS BIGINT) AS m_code, CAST(count(*) AS BIGINT) AS n_users,
         |  round(CAST(sum(mon) AS DOUBLE) / 1e6 / count(*), 6) AS mean_monetary
         |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", " ")),
    // x82's session CTE verbatim, per-(session, type) first occurrence
    // via the same (ts, event_id) row_number, explicit tuple comparison,
    // same support floor and confidence page
    "x245_seq_rules" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e),
         |g AS (SELECT user_id, ts, event_id, event_type,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM f),
         |fst AS (SELECT user_id, session_seq, event_type,
         |    epoch_us(ts) AS fts, event_id AS fid
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, session_seq,
         |      event_type ORDER BY ts, event_id) AS rn FROM g)
         |  WHERE rn = 1),
         |o AS (SELECT x.event_type AS antecedent, y.event_type AS consequent,
         |    CAST(count(*) AS BIGINT) AS n_ordered
         |  FROM fst x JOIN fst y ON x.user_id = y.user_id
         |    AND x.session_seq = y.session_seq
         |    AND x.event_type != y.event_type
         |    AND (x.fts < y.fts OR (x.fts = y.fts AND x.fid < y.fid))
         |  GROUP BY 1, 2),
         |na AS (SELECT event_type AS antecedent, CAST(count(*) AS BIGINT) AS n_a
         |  FROM fst GROUP BY 1)
         |SELECT antecedent, consequent, n_a, n_ordered,
         |  round(CAST(n_ordered AS DOUBLE) / n_a, 6) AS confidence
         |FROM o JOIN na USING (antecedent)
         |WHERE n_ordered >= 5
         |ORDER BY confidence DESC, antecedent, consequent
         |LIMIT 20""".stripMargin.replace("\n", " ")),
    // dim-indexed unnest, quantile_cont ≡ percentile (the x16/x94
    // equivalence), identical IQR subtraction
    "x243_robust_scale" ->
      ("""WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |dv AS (SELECT unnest([{'dim': i, 'v': v[i]} for i in range(1, len(v) + 1)],
         |    recursive := true) FROM e),
         |g AS (SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
         |    quantile_cont(v, 0.25) AS q25, quantile_cont(v, 0.5) AS q50,
         |    quantile_cont(v, 0.75) AS q75
         |  FROM dv GROUP BY 1)
         |SELECT dim, n, round(q50, 6) AS median, round(q75 - q25, 6) AS iqr
         |FROM g ORDER BY dim""".stripMargin.replace("\n", " ")),
    // staged per-doc ratio ticks (DuckDB has no deflate); the rollup —
    // counts, mean/min ticks, the CompressLowTick gate — re-derived in
    // SQL from the staged table
    "x241_compress_ratio" ->
      (s"""WITH r AS (SELECT source, rt FROM ${Stage.sqlRef("x241_ratios")})
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(rt) AS DOUBLE) / 1e6 / count(*), 6) AS mean_ratio,
         |  round(CAST(min(rt) AS DOUBLE) / 1e6, 6) AS min_ratio,
         |  round(CAST(sum(CASE WHEN rt < $CompressLowTick THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS share_low
         |FROM r GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    // error-BOUND oracle (not equality): the exact count re-derives in
    // DuckDB, the HLL estimate reads from the staged table, and the 5σ
    // window (rsd 2% ⇒ 10%) FILTERS the oracle rows — an out-of-bound
    // estimate makes the row counts diverge and fails the gate
    "x251_hll_unique" ->
      (s"""WITH est AS (SELECT source, n_unique_hll FROM ${Stage.sqlRef("x251_est")}),
         |ex AS (SELECT source,
         |    CAST(count(DISTINCT md5(lower(array_to_string($toks, ' ')))) AS BIGINT) AS n_unique
         |  FROM documents GROUP BY 1)
         |SELECT ex.source, ex.n_unique, est.n_unique_hll
         |FROM ex JOIN est USING (source)
         |WHERE abs(CAST(est.n_unique_hll AS DOUBLE) - n_unique) <= 0.10 * n_unique
         |ORDER BY source""".stripMargin.replace("\n", " ")),
    // GK-theorem oracle: the staged estimate's rank inside its group
    // must sit in the guaranteed ±n/100 window (±1 rank tie slack);
    // a violation drops the row and the compare fails
    "x252_approx_median" ->
      (s"""WITH s AS (SELECT event_type, n, med_est FROM ${Stage.sqlRef("x252_est")}),
         |j AS (SELECT s.event_type, s.n, s.med_est,
         |    CAST(count(*) AS BIGINT) AS n_chk,
         |    CAST(sum(CASE WHEN e.value <= s.med_est THEN 1 ELSE 0 END) AS BIGINT) AS cle,
         |    CAST(sum(CASE WHEN e.value < s.med_est THEN 1 ELSE 0 END) AS BIGINT) AS clt
         |  FROM s JOIN events e ON e.event_type = s.event_type
         |  GROUP BY 1, 2, 3)
         |SELECT event_type, n, med_est FROM j
         |WHERE n = n_chk AND cle >= floor(0.49 * n)
         |  AND clt <= ceil(0.51 * n) + 1
         |ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // bucket assignment replayed from the staged boundaries (same q > b
    // fold), so the report compares exactly; the WHERE is the GK bound
    // 2·n/accuracy plus the largest tie-class — and the spine left join
    // makes an empty bucket surface (engine side) with no surviving
    // oracle row
    "x253_approx_deciles" ->
      (s"$qualityCtes, " +
        s"g AS (SELECT doc_id, n, $qualityExprSql AS q FROM c), " +
        s"b AS (SELECT bs FROM ${Stage.sqlRef("x253_bounds")}), " +
        """a AS (SELECT g.doc_id, g.n, g.q,
          |    CAST(1 + len(list_filter(b.bs, x -> g.q > x)) AS BIGINT) AS bucket
          |  FROM g CROSS JOIN b),
          |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn, CAST(max(cnt) AS BIGINT) AS tmax
          |  FROM (SELECT q, count(*) AS cnt FROM g GROUP BY 1)),
          |r AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
          |    min(q) AS q_lo, max(q) AS q_hi,
          |    CAST(sum(n) AS BIGINT) AS tokens_total
          |  FROM a GROUP BY 1)
          |SELECT bucket, n_docs, q_lo, q_hi, tokens_total
          |FROM r CROSS JOIN t
          |WHERE abs(n_docs - nn / 10.0) <= 2.0 * nn / 50.0 + tmax + 1
          |ORDER BY bucket""".stripMargin.replace("\n", " ")),
    // naive per-source row_number vs the engine's global-rank-minus-
    // broadcast-offset composite (the hash match proves the two-level
    // device equals the partitioned window), same Gini string
    "x255_source_gini" ->
      (s"""WITH d AS (SELECT source, doc_id, CAST(len($toks) AS BIGINT) AS x
         |  FROM documents),
         |r AS (SELECT source, x, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY x, doc_id) AS BIGINT) AS rs FROM d),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    sum(CAST(rs AS HUGEINT) * x) AS srx FROM r GROUP BY 1)
         |SELECT source, n_docs, sx AS tokens_total, round($GiniSql, 6) AS gini
         |FROM g ORDER BY source""".stripMargin.replace("\n", " ")),
    // identical positional 5-gram derivation (the x60 slices at k=5),
    // per-gram min-doc origin, same join-back
    "x257_gram_novelty" ->
      (s"""WITH m AS (SELECT doc_id, $toks AS s FROM documents
         |  WHERE len($toks) >= 5),
         |g AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id,
         |    unnest([array_to_string(list_slice(s, i, i + 4), ' ')
         |      for i in range(1, len(s) - 3)]) AS gram FROM m)),
         |f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1),
         |a AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_novel
         |  FROM g JOIN f USING (gram) GROUP BY 1)
         |SELECT doc_id, n_grams, n_novel,
         |  round(CAST(n_novel AS DOUBLE) / n_grams, 4) AS novel_frac
         |FROM a ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    // identical md5 ticket, the SHARED inverse-CDF noise string — the
    // hash match proves the exact promised Laplace draw was applied
    "x254_dp_counts" ->
      (s"""WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |b AS (SELECT * FROM (VALUES ('e01', CAST(0.1 AS DOUBLE)),
         |  ('e10', CAST(1.0 AS DOUBLE))) t(lab, eps)),
         |u AS (SELECT source, eps, n,
         |    ('0x' || substr(md5('dp1:' || source || ':' || lab), 1, 8))::BIGINT AS ut
         |  FROM g CROSS JOIN b)
         |SELECT source, eps, round(CAST(n AS DOUBLE) + ($DpNoiseSql), 6) AS n_noised
         |FROM u ORDER BY source, eps""".stripMargin.replace("\n", " ")),
    // x87's exact CTEs on BOTH the full and the hash-sampled edge set;
    // the WHERE is the DOULION 6σ bound — an estimator outside it drops
    // the single oracle row and fails the compare
    "x256_approx_triangles" ->
      ("""WITH po AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |und AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM po a
         |  JOIN po b ON a.ok = b.ok AND a.pk < b.pk),
         |sm AS MATERIALIZED (SELECT u, v FROM und
         |  WHERE ('0x' || substr(md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 8))::BIGINT % 4 = 0),
         |degf AS (SELECT x, count(*) AS d FROM
         |  (SELECT u AS x FROM und UNION ALL SELECT v FROM und) GROUP BY x),
         |def_ AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst
         |  FROM und JOIN degf du ON du.x = und.u JOIN degf dv ON dv.x = und.v),
         |trif AS (SELECT CAST(count(*) AS BIGINT) AS t FROM def_ e1
         |  JOIN def_ e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN und ON und.u = e1.dst AND und.v = e2.dst),
         |degs AS (SELECT x, count(*) AS d FROM
         |  (SELECT u AS x FROM sm UNION ALL SELECT v FROM sm) GROUP BY x),
         |des AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst
         |  FROM sm JOIN degs du ON du.x = sm.u JOIN degs dv ON dv.x = sm.v),
         |tris AS (SELECT CAST(count(*) AS BIGINT) AS t FROM des e1
         |  JOIN des e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN sm ON sm.u = e1.dst AND sm.v = e2.dst),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled_edges FROM sm)
         |SELECT ne.n_edges, ns.n_sampled_edges, tris.t AS tri_sampled,
         |  CAST(tris.t * 64 AS BIGINT) AS tri_est
         |FROM ne CROSS JOIN ns CROSS JOIN trif CROSS JOIN tris
         |WHERE abs(tris.t * 64.0 - trif.t) <= 6.0 * sqrt(63.0 * trif.t) + 64""".stripMargin.replace("\n", " ")),
    // same QI bands + sensitive code as x235, identical 16-value spine
    // and integer cum-diff arithmetic, the SHARED t normalization
    "x259_t_closeness" ->
      (s"""WITH rws AS (SELECT c_nationkey, c_mktsegment, $KAnonBandSql AS band,
         |    substr(md5('sens:' || CAST(c_custkey AS VARCHAR)), 1, 1) AS sens
         |  FROM customer),
         |cells AS (SELECT c_nationkey, c_mktsegment, band, sens,
         |    CAST(count(*) AS BIGINT) AS c FROM rws GROUP BY 1, 2, 3, 4),
         |cl AS (SELECT c_nationkey, c_mktsegment, band,
         |    CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1, 2, 3),
         |gl AS (SELECT sens, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY 1),
         |tn AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM cells),
         |sp AS (SELECT cl.c_nationkey, cl.c_mktsegment, cl.band, cl.n,
         |    gl.sens, gl.g, tn.nt FROM cl CROSS JOIN gl CROSS JOIN tn),
         |j AS (SELECT sp.c_nationkey, sp.c_mktsegment, sp.band, sp.n, sp.nt,
         |    sp.sens, sp.g, coalesce(cells.c, 0) AS c0
         |  FROM sp LEFT JOIN cells USING (c_nationkey, c_mktsegment, band, sens)),
         |cd AS (SELECT c_nationkey, c_mktsegment, band, n, nt,
         |    sum(CAST(c0 AS HUGEINT) * nt - CAST(g AS HUGEINT) * n)
         |      OVER (PARTITION BY c_nationkey, c_mktsegment, band
         |        ORDER BY sens) AS cd
         |  FROM j),
         |a AS (SELECT c_nationkey, c_mktsegment, band, n, nt,
         |    sum(abs(cd)) AS sad FROM cd GROUP BY 1, 2, 3, 4, 5)
         |SELECT c_nationkey, c_mktsegment, band, n AS n_rows,
         |  round($TClosenessSql, 6) AS t_closeness
         |FROM a ORDER BY c_nationkey, c_mktsegment, band"""
        .stripMargin.replace("\n", " ")),
    // identical ticket + SHARED log-domain key; top-50 by the UNROUNDED
    // key with the same tie-break — the ORDER BY must be the QUALIFIED
    // sk.skey: DuckDB resolves unqualified ORDER BY names to the SELECT
    // output alias first, which here is round(skey, 9), and two keys
    // agreeing to 9 decimals would tie-break by doc_id where the engine
    // sorts by the raw key
    "x260_weighted_reservoir" ->
      (s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS w
         |  FROM documents WHERE len($toks) > 0),
         |kd AS (SELECT doc_id, w,
         |    ('0x' || substr(md5('res1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ut
         |  FROM d),
         |sk AS (SELECT doc_id, w, $ReservoirKeySql AS skey FROM kd)
         |SELECT doc_id, w, round(skey, 9) AS skey FROM sk
         |ORDER BY sk.skey DESC, doc_id LIMIT 50"""
        .stripMargin.replace("\n", " ")),
    // both halves re-derived independently: brute force from the raw
    // embeddings (the x10 derivation), the LSH side from the STAGED
    // bucket tables (the x11 derivation), identical (cos DESC, item_id)
    // tie-breaks — then the ERROR-BOUND filter: a row survives only at
    // recall ≥ 0.8 (integer form, no float boundary), so a sub-floor
    // production index diverges row counts and fails the gate
    "x262_ann_recall_cert" ->
      (s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings),
         |br AS (SELECT query_id, item_id FROM (
         |  SELECT query_id, item_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY $cosSql DESC, item_id) AS rank
         |  FROM i CROSS JOIN q WHERE item_id != query_id) WHERE rank <= 10),
         |it AS (SELECT id AS item_id, t, sig FROM ${Stage.sqlRef("x262_item_buckets")}),
         |pr AS (SELECT DISTINCT id AS query_id, t, sig FROM ${Stage.sqlRef("x262_probe_buckets")}),
         |cand AS (SELECT DISTINCT b.query_id, a.item_id FROM it a
         |  JOIN pr b ON a.t = b.t AND a.sig = b.sig
         |  WHERE a.item_id != b.query_id),
         |ar AS (SELECT query_id, item_id FROM (
         |  SELECT c.query_id, c.item_id,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY $cosSql DESC, c.item_id) AS rank
         |  FROM cand c JOIN i ON i.item_id = c.item_id
         |  JOIN q ON q.query_id = c.query_id) WHERE rank <= 10),
         |tr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
         |  FROM br GROUP BY 1),
         |ht AS (SELECT br.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM br JOIN ar ON ar.query_id = br.query_id
         |    AND ar.item_id = br.item_id GROUP BY 1),
         |f AS (SELECT tr.query_id, n_true,
         |    CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit
         |  FROM tr LEFT JOIN ht ON ht.query_id = tr.query_id)
         |SELECT query_id, n_true, n_hit, round($RecallSql, 4) AS recall
         |FROM f WHERE n_hit * 10 >= n_true * 8 ORDER BY query_id"""
        .stripMargin.replace("\n", " ")),
    // identical stratum/ticket/design arithmetic, integer weights, the
    // SHARED estimate strings over the same exact moment row
    "x264_ipw_ate" ->
      (s"""WITH e AS (SELECT user_id % 4 AS g, value,
         |    ('0x' || substr(md5('trt1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS ut
         |  FROM events),
         |t AS (SELECT g,
         |    CASE WHEN CAST(ut AS DOUBLE) / 4294967296.0
         |      < CAST(g + 1 AS DOUBLE) / 5.0 THEN 1 ELSE 0 END AS t,
         |    CAST(floor((value + CAST(g AS DOUBLE) * 100.0) * 1e6 + 0.5) AS BIGINT) AS ym
         |  FROM e),
         |w AS (SELECT t, ym,
         |    CASE WHEN t = 1 THEN 60 // (g + 1) ELSE 60 // (4 - g) END AS w12
         |  FROM t),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(t) AS BIGINT) AS n_treated,
         |    CAST(sum(CASE WHEN t = 1 THEN ym ELSE 0 END) AS BIGINT) AS sy_t,
         |    CAST(sum(CASE WHEN t = 0 THEN ym ELSE 0 END) AS BIGINT) AS sy_c,
         |    sum(CASE WHEN t = 1 THEN CAST(ym AS HUGEINT) * w12 ELSE 0 END) AS sw_t,
         |    sum(CASE WHEN t = 0 THEN CAST(ym AS HUGEINT) * w12 ELSE 0 END) AS sw_c,
         |    CAST(sum(CASE WHEN t = 1 THEN w12 ELSE 0 END) AS BIGINT) AS swn_t,
         |    CAST(sum(CASE WHEN t = 0 THEN w12 ELSE 0 END) AS BIGINT) AS swn_c
         |  FROM w)
         |SELECT n, n_treated, round($IpwNaiveSql, 6) AS naive_diff,
         |  round($IpwAteSql, 6) AS ipw_ate FROM a"""
        .stripMargin.replace("\n", " ")),
    // same observed-span day spine (zero days included), exact integer
    // daily counts, the SHARED variance/dispersion chain
    "x265_overdispersion" ->
      (s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
         |cells AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
         |  FROM d GROUP BY 1, 2),
         |sp AS (SELECT min(day) AS lo, max(day) AS hi FROM cells),
         |spine AS (SELECT et.event_type, CAST(gs.day AS DATE) AS day
         |  FROM (SELECT DISTINCT event_type FROM cells) et
         |  CROSS JOIN sp
         |  CROSS JOIN LATERAL (SELECT unnest(generate_series(sp.lo, sp.hi,
         |    INTERVAL 1 DAY)) AS day) gs),
         |j AS (SELECT spine.event_type, coalesce(cells.c, 0) AS c0
         |  FROM spine LEFT JOIN cells USING (event_type, day)),
         |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(c0) AS BIGINT) AS n_events,
         |    sum(CAST(c0 AS HUGEINT) * c0) AS sc2
         |  FROM j GROUP BY 1)
         |SELECT event_type, n_days, n_events,
         |  round(CAST(n_events AS DOUBLE) / n_days, 6) AS mean_daily,
         |  round($DispersionSql, 6) AS dispersion
         |FROM a ORDER BY event_type""".stripMargin.replace("\n", " ")),
    // same rank pairing (naive row_number re-proves the device), same
    // list_dot_product ≡ graft_dot dots, the SHARED kernel tick string,
    // identical first-component shift
    "x261_mmd_drift" ->
      (s"""WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
         |a AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS i,
         |    vec AS x FROM ev WHERE vec_id % 2 = 0),
         |b AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS i,
         |    vec AS y FROM ev WHERE vec_id % 2 = 1),
         |p AS (SELECT a.i, x, y FROM a JOIN b USING (i)),
         |od AS (SELECT (i + 1) // 2 AS j, x AS x1, y AS y1 FROM p WHERE i % 2 = 1),
         |ev2 AS (SELECT i // 2 AS j, x AS x2, y AS y2 FROM p WHERE i % 2 = 0),
         |q AS (SELECT od.j, x1, y1, x2, y2 FROM od JOIN ev2 USING (j)),
         |qs AS (SELECT j, x1, x2,
         |    [y1[k] + CASE WHEN k = 1 THEN 0.5 ELSE 0.0 END
         |      for k in range(1, len(y1) + 1)] AS y1,
         |    [y2[k] + CASE WHEN k = 1 THEN 0.5 ELSE 0.0 END
         |      for k in range(1, len(y2) + 1)] AS y2 FROM q),
         |d1 AS (SELECT list_dot_product(x1, x1) AS n11, list_dot_product(x2, x2) AS n22,
         |    list_dot_product(y1, y1) AS m11, list_dot_product(y2, y2) AS m22,
         |    list_dot_product(x1, x2) AS dxx, list_dot_product(y1, y2) AS dyy,
         |    list_dot_product(x1, y2) AS dxy, list_dot_product(x2, y1) AS dyx FROM q),
         |d2 AS (SELECT list_dot_product(x1, x1) AS n11, list_dot_product(x2, x2) AS n22,
         |    list_dot_product(y1, y1) AS m11, list_dot_product(y2, y2) AS m22,
         |    list_dot_product(x1, x2) AS dxx, list_dot_product(y1, y2) AS dyy,
         |    list_dot_product(x1, y2) AS dxy, list_dot_product(x2, y1) AS dyx FROM qs),
         |s1 AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum($MmdTickSql) AS BIGINT) AS st FROM d1),
         |s2 AS (SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum($MmdTickSql) AS BIGINT) AS st FROM d2)
         |SELECT 'same' AS contrast, m AS m_pairs,
         |  round(CAST(st AS DOUBLE) / 1e9 / m, 6) AS mmd2 FROM s1
         |UNION ALL SELECT 'shifted' AS contrast, m AS m_pairs,
         |  round(CAST(st AS DOUBLE) / 1e9 / m, 6) AS mmd2 FROM s2
         |ORDER BY contrast""".stripMargin.replace("\n", " ")),
  ).pipe(m =>
    // the stream twins drain the same parquet into the same additive
    // cells, so the batch oracles gate them bit-for-bit
    m + ("x238_stream_msprt" -> m("x234_msprt")) +
      ("x247_stream_secret_scan" -> m("x242_secret_scan")) +
      ("x258_stream_gini" -> m("x255_source_gini")) +
      ("x263_stream_dp_counts" -> m("x254_dp_counts")))

  /** The x144/x149 shared oracle — integer S·D numerator, (|S·D| DESC,
    * day) argmax, one final division.
    */
  private val CusumOracleSql: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(c) AS BIGINT) AS tt FROM d),
      |m AS (SELECT day, CAST(sum(c) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM d),
      |s AS (SELECT day, cum * t.dd - i * t.tt AS sd, t.dd, t.tt FROM m CROSS JOIN t)
      |SELECT day AS at_day, dd AS n_days, tt AS total,
      |  round(CAST(sd AS DOUBLE) / dd, 6) AS cusum
      |FROM s ORDER BY abs(sd) DESC, day LIMIT 1"""
      .stripMargin.replace("\n", " ")

  /** The x166/x176 shared oracle — quality CTEs, integer binning,
    * Laplace spine, the PsiCellSql contribution, bin-ordered fold. One
    * string for the batch query and its stream-maintained twin.
    */
  private val PsiDriftOracleSql: String =
    s"""$qualityCtes,
       |q AS (SELECT d.source,
       |    least(9, CAST(floor(($qualityExprSql) * 10000 + 0.5) AS BIGINT) // 1000) AS bin
       |  FROM c JOIN documents d USING (doc_id)),
       |cnt AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cc FROM q GROUP BY 1, 2),
       |spine AS (SELECT source, bin FROM (SELECT DISTINCT source FROM documents)
       |  CROSS JOIN (SELECT CAST(range AS BIGINT) AS bin FROM range(10))),
       |cells AS (SELECT spine.source, spine.bin, CAST(coalesce(cc, 0) AS BIGINT) AS c
       |  FROM spine LEFT JOIN cnt USING (source, bin)),
       |nsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cells GROUP BY 1),
       |gbin AS (SELECT bin, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
       |cell2 AS (SELECT cells.source, cells.bin, nsrc.ns, ($PsiCellSql) AS contrib
       |  FROM cells JOIN nsrc USING (source) JOIN gbin USING (bin) CROSS JOIN t),
       |f AS (SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
       |    list(contrib ORDER BY bin) AS cs FROM cell2 GROUP BY 1)
       |SELECT source, n_docs,
       |  round(list_reduce(list_prepend(0.0, cs), (x, y) -> x + y), 6) AS psi
       |FROM f ORDER BY source""".stripMargin.replace("\n", " ")

  /** The x167/x177 shared oracle — micro-quantized values, integer
    * cumsums, HUGEINT-widened numerator, the W1Sql final read. One
    * string for the batch query and its stream-maintained twin.
    */
  private val W1DriftOracleSql: String =
    s"""WITH v AS (SELECT (user_id % 2 = 0) AS isa,
       |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
       |c AS (SELECT vm, CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM v GROUP BY 1),
       |t AS (SELECT CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb FROM v),
       |cum AS (SELECT vm, CAST(sum(ca) OVER w AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER w AS BIGINT) AS cumb,
       |    lead(vm) OVER (ORDER BY vm) AS nxt FROM c
       |  WINDOW w AS (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |s AS (SELECT abs(CAST(cuma AS HUGEINT) * t.nb - CAST(cumb AS HUGEINT) * t.na) * (nxt - vm) AS term,
       |    t.na, t.nb FROM cum CROSS JOIN t WHERE nxt IS NOT NULL),
       |f AS (SELECT CAST(max(na) AS BIGINT) AS na, CAST(max(nb) AS BIGINT) AS nb,
       |    sum(term) AS st FROM s)
       |SELECT na, nb, round($W1Sql, 6) AS w1 FROM f""".stripMargin.replace("\n", " ")

  // ---- sampling-oracle SQL builders: thresholds generated from the SAME
  // constants as the Spark side (operators/Sampling), so they cannot drift
  private def tick(salt: String) =
    s"substr(md5('$salt:'||CAST(doc_id AS VARCHAR)),1,4)"
  private def keepCaseSql: String = {
    import graft.operators.Sampling.thresholdHex
    // mirror Sampling.keep exactly, incl. the rate >= 1 / <= 0 short-
    // circuits (thresholdHex caps at 'ffff', which would drop md5-prefix
    // 'ffff' rows that keep() retains)
    "CASE " + sampleRates.toSeq.sortBy(_._1).map { case (l, r) =>
      val cond =
        if (r >= 1.0) "TRUE"
        else if (r <= 0.0) "FALSE"
        else s"${tick("smp")} < '${thresholdHex(r)}'"
      s"WHEN lang = '$l' THEN $cond"
    }.mkString(" ") + " ELSE TRUE END"
  }
  private def splitCaseSql: String = {
    import graft.operators.Sampling.thresholdHex
    val total = splitWeights.map(_._2).sum
    val cum = splitWeights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // mirror Sampling.assignSplit's cumRate >= 1.0 short-circuit exactly
    "CASE " + splitWeights.init.zip(cum).map { case ((n, _), c) =>
      if (c >= 1.0) s"WHEN TRUE THEN '$n'"
      else s"WHEN ${tick("spl")} < '${thresholdHex(c)}' THEN '$n'"
    }.mkString(" ") + s" ELSE '${splitWeights.last._1}' END"
  }

  private def x27Sql: String =
    s"$langCte SELECT doc_id, lang, $splitCaseSql AS split FROM l " +
      s"WHERE $keepCaseSql ORDER BY doc_id"

  /** x44: the assignSplit CASE over an arbitrary key expression (mirrors
    * Sampling.assignSplit keyed by group, not doc).
    */
  private def splitCaseOver(keyExpr: String): String = {
    import graft.operators.Sampling.thresholdHex
    val total = splitWeights.map(_._2).sum
    val cum = splitWeights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val t = s"substr(md5('spl:'||CAST($keyExpr AS VARCHAR)),1,4)"
    "CASE " + splitWeights.init.zip(cum).map { case ((n, _), c) =>
      if (c >= 1.0) s"WHEN TRUE THEN '$n'"
      else s"WHEN $t < '${thresholdHex(c)}' THEN '$n'"
    }.mkString(" ") + s" ELSE '${splitWeights.last._1}' END"
  }

  private def x44Sql: String =
    s"""WITH RECURSIVE pr AS ($jaccardCte),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
       |  UNION ALL SELECT id_b, id_a FROM pr),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
       |g AS (SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS group_key
       |  FROM (SELECT doc_id FROM documents) d
       |  LEFT JOIN comp ON d.doc_id = comp.id)
       |SELECT doc_id, group_key, ${splitCaseOver("group_key")} AS split
       |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " ")

  // ---- staged-intermediate oracles (see graft.Stage): the engine-specific
  // signature/bucket computation is handed off via parquet; DuckDB
  // re-derives everything downstream of it independently -------------------

  /** x08 oracle: pigeonhole banding + exact hamming over the staged
    * (id, sh) simhash table, bit ops on BIGINT in DuckDB. The oracle uses
    * the simple single-chunk (maxDist+1) scheme even where the engine
    * bands on chunk pairs: BOTH schemes are complete and the hamming
    * filter is exact, so the result set is scheme-independent — which is
    * precisely what this oracle proves.
    */
  private def x08Sql: String = {
    val maxDist = 10
    val chunkRows = Dedup.simhashChunkSpec(maxDist)
      .map { case (c, off, mask) => s"($c, $off, $mask)" }.mkString(", ")
    s"WITH s AS (SELECT id, sh FROM ${Stage.sqlRef("x08_simhash")}), " +
      s"ch(c_idx, c_off, c_mask) AS (VALUES $chunkRows), " +
      "c AS (SELECT id, sh, c_idx, (sh >> c_off) & c_mask AS chunk_val " +
      "FROM s CROSS JOIN ch), " +
      "p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, " +
      "CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming " +
      "FROM c a JOIN c b ON a.c_idx = b.c_idx " +
      "AND a.chunk_val = b.chunk_val AND a.id < b.id) " +
      s"SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxDist " +
      "ORDER BY id_a, id_b"
  }

  /** x15 oracle: window-min winnow selection + shared-fingerprint pairing
    * over the staged (id, pos, g) gram table — mirrors
    * Dedup.winnowFingerprintsOf/winnowOverlapPairsOf (w=8, minShared=2,
    * maxDocFreq=20, matching the x15 call).
    */
  private def x15Sql: String = {
    val w = 8; val minShared = 2; val cap = 20
    s"WITH gr AS (SELECT id, pos, g FROM ${Stage.sqlRef("x15_grams")}), " +
      "wm AS (SELECT id, pos, min(g) OVER (PARTITION BY id ORDER BY pos " +
      s"ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS wmin, " +
      "count(*) OVER (PARTITION BY id) AS ng FROM gr), " +
      "f AS (SELECT DISTINCT id, wmin AS fp FROM wm " +
      s"WHERE pos >= ${w - 1} OR (ng < $w AND pos = ng - 1)), " +
      s"rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= $cap), " +
      "fr AS (SELECT f.id, f.fp FROM f JOIN rare USING (fp)), " +
      "p AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared " +
      "FROM fr a JOIN fr b ON a.fp = b.fp AND a.id < b.id GROUP BY 1, 2) " +
      s"SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= $minShared " +
      "ORDER BY id_a, id_b"
  }

  /** x11/x13 shared oracle tail: candidate join over staged bucket
    * assignments, then the exact-cosine top-10 ranking recomputed from the
    * embeddings table (the same sequential-double cosine as x09/x10).
    */
  private def knnSql(itemsSel: String, probesSel: String, joinKeys: String,
      dedupCandidates: Boolean): String = {
    val distinct = if (dedupCandidates) "DISTINCT " else ""
    s"WITH it AS ($itemsSel), pr AS ($probesSel), " +
      "v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings), " +
      s"cand AS (SELECT $distinct b.query_id, a.item_id " +
      s"FROM it a JOIN pr b ON $joinKeys WHERE a.item_id != b.query_id), " +
      "sc AS (SELECT query_id, item_id, " +
      "list_dot_product(iv.vec, qv.vec) / (sqrt(list_dot_product(iv.vec, iv.vec)) * " +
      "sqrt(list_dot_product(qv.vec, qv.vec))) AS cos " +
      "FROM cand JOIN v iv ON cand.item_id = iv.vec_id " +
      "JOIN v qv ON cand.query_id = qv.vec_id), " +
      "r AS (SELECT query_id, item_id, cos, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank FROM sc) " +
      "SELECT query_id, rank, item_id, round(cos, 4) AS cos FROM r " +
      "WHERE rank <= 10 ORDER BY query_id, rank"
  }

  /** x26 oracle: with accuracy ≫ n the GK sketch is lossless and
    * percentile_approx returns exactly the ceil(q·n)-th order statistic
    * (1-indexed; see the x26 query comment) — selected here by row_number
    * over the same per-doc quality values the x16 oracle derives.
    */
  private def funnelSql: String = funnelSqlWithin(None)

  /** The funnel chain SQL, optionally with a per-stage conversion window
    * (stage i within `minutes` of stage i−1's first completion — interval
    * arithmetic is exact micros on both engines).
    */
  private def funnelSqlWithin(minutes: Option[Int]): String = {
    def win(prev: String) =
      minutes.fold("")(m => s" AND e.ts <= $prev.t + INTERVAL $m MINUTE")
    s"""WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t${win("s0")}
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t${win("s1")}
      |  WHERE e.event_type = 'purchase' GROUP BY 1)
      |SELECT * FROM (
      |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
      |    CAST(count(*) AS BIGINT) AS n_users FROM s0
      |  UNION ALL SELECT CAST(1 AS BIGINT), 'click',
      |    CAST(count(*) AS BIGINT) FROM s1
      |  UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
      |    CAST(count(*) AS BIGINT) FROM s2)
      |ORDER BY stage_idx""".stripMargin.replace("\n", " ")
  }

  private def x26Sql: String =
    s"$langCte, c AS (SELECT lang, len(ts) AS n, " +
      s"CAST(${markers("en")} AS DOUBLE) AS mk, " +
      raw"CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / len(text) AS punct, " +
      "CAST(list_sum(list_transform(ts, t -> len(t))) AS DOUBLE) / len(ts) AS mtl FROM l), " +
      "q AS (SELECT lang, floor((least(mk / n * 4, 1.0) * 0.3 + " +
      "least(CAST(n AS DOUBLE) / 100, 1.0) * 0.3 + (1.0 - punct) * 0.2 + " +
      "(CASE WHEN mtl BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2) " +
      "* 10000 + 0.5) / 10000 AS qv FROM c), " +
      "r AS (SELECT lang, qv, row_number() OVER (PARTITION BY lang ORDER BY qv) AS rn, " +
      "count(*) OVER (PARTITION BY lang) AS n FROM q) " +
      "SELECT lang, max(n) AS n, " +
      "max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN qv END) AS q25, " +
      "max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN qv END) AS q50, " +
      "max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN qv END) AS q75 " +
      "FROM r GROUP BY lang ORDER BY lang"

  /** x31 oracle: the whole pipeline replicated in DuckDB — language-ID →
    * stratified sample → clean → fingerprint-dedup → split → per-cell
    * corpus stats. n_tokens CAST to BIGINT (DuckDB integer sums are
    * HUGEINT; the driver hash compare is type-sensitive).
    */
  private def x31Sql: String = {
    val cleaned = raw"trim(regexp_replace(regexp_replace(" +
      raw"regexp_replace(text, '<[^>]*>', ' ', 'g'), " +
      raw"'[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), '\s+', ' ', 'g'))"
    val ctoks = raw"list_filter(string_split_regex(trim(t), '\s+'), s -> len(s) > 0)"
    s"$langCte, " +
      s"k AS (SELECT doc_id, lang, $cleaned AS t FROM l WHERE $keepCaseSql), " +
      s"f AS (SELECT doc_id, lang, t, " +
      s"md5(lower(array_to_string($ctoks, ' '))) AS fp FROM k), " +
      "d AS (SELECT doc_id, lang, t, " +
      "row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f) " +
      s"SELECT lang, $splitCaseSql AS split, count(*) AS n_docs, " +
      s"CAST(sum(len($ctoks)) AS BIGINT) AS n_tokens " +
      "FROM d WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"
  }
}

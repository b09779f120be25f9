package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Text-shaping extension queries (cleaning, tokenization, language/quality scoring, chunking/packing, redaction) — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtTextQueries { this: ExtQueriesBase =>

  private[graft] def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // x39: document chunking — fixed token windows with stride/overlap,
    // the doc→training-sequence fan-out; one posexplode, no shuffle
    "x39_chunk" -> ((s, dir) =>
      graft.operators.Chunking.chunkDocs(
        table(s, dir, "documents"), "doc_id", "text",
        window = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx"))),
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
    // x73: INTRA-document repetition signals (the Gopher repetition
    // rules — see operators/Repetition for the semantics + scale shape)
    "x73_repetition" -> ((s, dir) =>
      graft.operators.Repetition.signals(
        table(s, dir, "documents"), "doc_id", "text")),
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
        .ckpt() // consumers: total, threshold pick, rates
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
        .ckpt() // consumers: prefix join + interval grid + out
      val pre = bins.as("x")
        .join(broadcast(bins.as("y")), col("y.bin") <= col("x.bin"))
        .groupBy(col("x.bin").as("bin"))
        .agg(sum(col("y.n")).as("cn"), sum(col("y.np")).as("cnp"))
        .ckpt() // consumers: interval grid (both sides)
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
        .ckpt() // ONE scoring pass; totals derive from bins
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
        .ckpt()
      g.crossJoin(broadcast(g.agg(
          (max(col("tpr")) - min(col("tpr"))).as("tg"),
          (max(col("fpr")) - min(col("fpr"))).as("fg"))))
        .select(col("lang"), col("np").as("n_pos"), col("nn").as("n_neg"),
          col("tpr"), col("fpr"),
          graft.functions.EngineMath.roundAway(col("tg"), 6).as("tpr_gap"),
          graft.functions.EngineMath.roundAway(col("fg"), 6).as("fpr_gap"))
        .orderBy(col("lang"))
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
  )

  private[graft] def textOracles: Map[String, String] = Map(
    "x24_clean_text" ->
      (raw"WITH c AS (SELECT doc_id, trim(regexp_replace(regexp_replace(" +
        raw"regexp_replace(text, '<[^>]*>', ' ', 'g'), " +
        raw"'[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), '\s+', ' ', 'g')) AS t " +
        "FROM documents) " +
        "SELECT doc_id, len(t) AS clean_len, " +
        raw"len(list_filter(string_split_regex(trim(t), '\s+'), s -> len(s) > 0)) AS clean_tokens " +
        "FROM c ORDER BY doc_id"),
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
    "x27_stratified_sample" -> x27Sql,
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
    "x36_frame_sample" ->
      ("WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS len " +
        "FROM documents WHERE doc_id % 3 = 2), " + // round-robin slot 3 = webm
        "f AS (SELECT media_id, len, " +
        "unnest(range(0, greatest(len // 64, 1), 4)) AS i FROM m) " +
        "SELECT media_id, count(*) AS n_frames, " +
        "CAST(sum(least(64, len - i * 64)) AS BIGINT) AS frame_bytes_total " +
        "FROM f GROUP BY 1 ORDER BY 1"),
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
  )
}

package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Text/corpus statistics extension queries (n-gram and LM-ish scores, entropy, collocations, sketches, fingerprints) — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtTextStatsQueries { this: ExtQueriesBase =>

  private[graft] def textstatsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x01: token counting — whitespace + BPE-ish regex pre-tokenizer
    "x01_token_count" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.regexTokenCount(col("text")).cast("long").as("n_pieces"))
        .orderBy(col("doc_id"))),
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
    // x04: document fingerprinting (normalised md5)
    "x04_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),
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
    // x85: BPE merge candidates — adjacent char-pair counts over the
    // word histogram, weighted by word frequency (see operators/Bpe for
    // the two-level 100 TB shape); the full driver-coordinated merge
    // LOOP is spec-gated (BpeSpec)
    "x85_bpe_pairs" -> ((s, dir) =>
      graft.operators.Bpe.pairCounts(table(s, dir, "documents"), "text",
        k = 50)),
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
      // widen (r14): the multi-count_distinct profile expands every row
      // |cols|+1 times through one hash aggregate, and the parquet arrives
      // as ~3 row groups — the whole Expand ran on 3 cores (measured 3.8 s
      // single-stage wall). Repartition first (no-op at cluster scale).
      val li = graft.operators.Dedup.widen(table(s, dir, "lineitem"))
      val aggList = count(lit(1)).as("n_rows") +: profileCols.flatMap(c =>
        Seq(count(col(c)).as(s"c_$c"), count_distinct(col(c)).as(s"d_$c")))
      val stackExpr = s"stack(${profileCols.length}, " + profileCols.map(c =>
        s"'$c', n_rows, n_rows - c_$c, d_$c").mkString(", ") +
        ") AS (column_name, n_rows, n_nulls, n_distinct)"
      li.agg(aggList.head, aggList.tail: _*)
        .select(expr(stackExpr))
        .orderBy(col("column_name"))
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
    // x99: greedy subword ENCODING with a fixed vocabulary (the apply half
    // of tokenization; x85 is the training half) — per-doc piece count,
    // multi-char piece count, and letter coverage. Linear scan per doc,
    // no shuffle, codegen'd regex; the vocabulary rides in the plan as a
    // literal pattern (at scale: a learned vocab compiles to the same
    // alternation, broadcast-free)
    "x99_vocab_encode" -> ((s, dir) =>
      vocabEncode(table(s, dir, "documents")).orderBy(col("doc_id"))),
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
    // x160: TF-IDF lexical search — "find documents like this one"
    // without embeddings: per-doc sparse tf·idf vectors, cosine via the
    // shared-term join, top-10 per query doc. Weights are exact
    // integers (tf · micro-idf); dot products and squared norms ride
    // DECIMAL(38,0) so a 100 TB document can't overflow; the cosine
    // chain is ONE shared string off those exact sums. Query side is 3
    // docs — the x10 broadcast shape.
    "x160_tfidf_search" -> ((s, dir) => {
      // localCheckpoint, NOT persist (r14): k, w and norms are each
      // referenced 2-3x inside the ONE final plan (k: total + idf + the
      // weight build; w: norms + query side + dot join; norms: both
      // endpoint joins) — persisted subtrees referenced twice per plan
      // lose cache substitution and recompute.
      val k = table(s, dir, "documents")
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
            .as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
          .ckpt()
      val tot = k.select(col("doc_id")).distinct().agg(count(lit(1)).as("nn"))
      val idf = k.groupBy(col("t")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(tot))
        .select(col("t"),
          floor(log((col("nn") + lit(1)).cast("double") / (col("df") + lit(1)))
            * 1e6 + lit(0.5)).cast("long").as("idfm"))
      val w = k.join(idf, "t").select(col("doc_id"), col("t"),
          (col("tf") * col("idfm")).as("w"))
        .ckpt()
      val norms = w.groupBy(col("doc_id"))
        .agg(sum((col("w") * col("w")).cast("decimal(38,0)")).as("nsq"))
        .ckpt()
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
        .ckpt())), // consumers: moments + both lag-join sides,
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
        .ckpt() // consumers: global hist + per-source hist
      val g = lab.groupBy(col("score"))
        .agg(count(lit(1)).as("gn"), sum(col("pos")).as("gnp"))
        .ckpt() // consumers: per-source subtraction + full AUC
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
        .ckpt() // consumers: totals + the r/r+1 self-join
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
        .ckpt() // consumers: the stage dump + the estimate
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
        .ckpt() // consumers: two value hists + the moment scan
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
        .ckpt() // consumers: median read + deviation re-agg
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
        .ckpt() // consumers: cells + per-truth totals
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
        .ckpt() // consumers: median read + dev re-agg + gate
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
        .ckpt() // consumers: pair join (both sides) + marginals
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
        .ckpt() // consumers: totals + the trim chain — without
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
  )

  private[graft] def textstatsOracles: Map[String, String] = Map(
    "x01_token_count" ->
      (s"SELECT doc_id, len($toks) AS n_tokens, " +
        raw"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_pieces " +
        "FROM documents ORDER BY doc_id"),
    "x04_fingerprint" ->
      (s"SELECT doc_id, md5(lower(array_to_string($toks, ' '))) AS fingerprint " +
        "FROM documents ORDER BY doc_id"),
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
    "x55_cms_heavy_hitters" -> cmsSql,
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
    "x68_dsir_weights" ->
      // identical md5 buckets, full-spine add-1 smoothing, bucket-ordered
      // per-doc fold (the shared dsirWsCtes), same top-200 boundary
      (s"""$dsirWsCtes,
         |sel AS (SELECT doc_id, w FROM ws ORDER BY w DESC, doc_id LIMIT 200)
         |SELECT doc_id, round(w, 4) AS weight FROM sel
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
    "x26_quantiles_approx" -> x26Sql,
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
    // same exact micro-tick daily series; moments and per-lag pair sums
    // pre-widened to HUGEINT (≡ Spark's DECIMAL(38,0)) BEFORE any product,
    // then ONE shared AcfSql read — identical integers, identical doubles
    "x190_acf" -> AcfOracleSql,
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
  )
}

package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Vector retrieval extension queries (brute/LSH/IVF/PQ ANN, quantization, PCA, clustering reports, recall certification) — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtAnnQueries { this: ExtQueriesBase =>

  private[graft] def annQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // widen before the per-character explode (r15, guide §2): the
      // explode + substr + map-side (doc,tri) partial agg is ≈ corpus
      // characters of pure CPU, and the documents parquet arrives as 1-2
      // row-group partitions — profiled at 10× as ONE 26.4 s TWO-task
      // stage under a 28.8 s wall (the suite's single largest
      // parallelism hole); no-op when the input is already wide
      val dtc = graft.operators.Dedup.widen(d)
        .select(col("doc_id"), col("cs"),
          explode(expr("sequence(1, length(cs) - 2)")).as("pos"))
        .select(col("doc_id"), expr("substr(cs, pos, 3)").as("tri"))
        .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("m"))
        .ckpt()
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
        .ckpt()
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
      // widen (r14): the semi-join inherits the narrow doc-scan
      // partitioning (1-3 row groups), serializing the shingle and
      // 128-hash expressions on one core — measured 2×2 s of the query's
      // 5 s wall on single-task stages; repartitioning the ~4000 sampled
      // docs first parallelizes both checkpoints (no-op at cluster scale
      // where the input is already wide).
      val shd = graft.operators.Dedup.widen(
          docs.join(ids, col("doc_id") === col("did"), "left_semi"))
        .select(col("doc_id").as("id"),
          TextFunctions.shingles(col("text"), 3).as("sh")).ckpt()
      val sigs = shd.select(col("id"),
        Dedup.minhashSignatureOf(col("sh"), numHashes = 128).as("sig"),
        col("sh")).ckpt()
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
      // The pool is BOUNDED (10 rows × |queries|) — collect it once so the
      // corpus-scale brute scan runs exactly ONE action, then run the
      // greedy argmax ON THE DRIVER (r14): the previous DataFrame greedy
      // chained 4 rounds of windows/joins over ≤50-row frames into one
      // 18-shuffle plan whose ~33 AQE stage-jobs cost ~170 ms of pure
      // scheduling latency EACH (2.7 s executor time vs 5.8 s wall,
      // measured). The state is pool-bounded by construction — identical
      // integer arithmetic (same micro-ticks, same (scorem DESC, item_id)
      // tie-break), so the result is bit-identical; only the engine for
      // the O(1)-sized loop changed.
      val poolRows = pool0.collect()
      // Pool invariants the driver-side greedy silently depends on (r14
      // advice): ≤10 rows per query (the row_number cut bounds the
      // collect) and unique item_id within a query's pool (index-based
      // exclusion ≡ the old item_id anti-join only then). A future pool
      // change must fail HERE, loudly, not drift from the oracle.
      locally {
        val perQuery = poolRows.groupBy(_.getLong(0))
        perQuery.foreach { case (qid, rows) =>
          require(rows.length <= 10,
            s"x156 pool invariant broken: query $qid has ${rows.length} " +
              "pool rows (expected ≤ 10 from the rank cut)")
          val ids = rows.map(_.getLong(1))
          require(ids.distinct.length == ids.length,
            s"x156 pool invariant broken: query $qid has duplicate " +
              "item_ids in its pool")
        }
      }
      def sdot(x: IndexedSeq[Double], y: IndexedSeq[Double]): Double = {
        // graft_dot's exact sequential IEEE order
        val n = math.min(x.length, y.length)
        var sum = 0.0; var i = 0
        while (i < n) { sum += x(i) * y(i); i += 1 }
        sum
      }
      val picks = poolRows.groupBy(_.getLong(0)).toSeq.flatMap {
        case (qid, rows) =>
          val items = rows.map { r =>
            (r.getLong(1), r.getSeq[Double](2).toIndexedSeq, r.getDouble(3),
              r.getLong(4))
          }
          def simm(a: Int, b: Int): Long = {
            val (_, iva, na, _) = items(a); val (_, ivb, nb, _) = items(b)
            math.floor(sdot(iva, ivb) / (na * nb) * 1e6 + 0.5).toLong
          }
          val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
          def argmax(score: Int => Long): Option[Int] = {
            val remaining = items.indices.filterNot(i => picked.exists(_._1 == i))
            if (remaining.isEmpty) None
            else Some(remaining.minBy(i => (-score(i), items(i)._1)))
          }
          argmax(i => 7L * items(i)._4).foreach(i =>
            picked += ((i, 7L * items(i)._4)))
          for (_ <- 2 to 5) {
            argmax { i =>
              val maxsimm = picked.map(p => simm(i, p._1)).max
              7L * items(i)._4 - 3L * maxsimm
            }.foreach { i =>
              val maxsimm = picked.map(p => simm(i, p._1)).max
              picked += ((i, 7L * items(i)._4 - 3L * maxsimm))
            }
          }
          picked.zipWithIndex.map { case ((i, scorem), pickIdx) =>
            org.apache.spark.sql.Row(qid, (pickIdx + 1).toLong,
              items(i)._1, scorem)
          }
      }
      val pickedDf = s.createDataFrame(
        s.sparkContext.parallelize(picks, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pick_no",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("item_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("scorem",
            org.apache.spark.sql.types.LongType))))
      pickedDf.select(col("query_id"), col("pick_no"), col("item_id"),
        graft.functions.EngineMath.roundAway(
          col("scorem").cast("double") / 1e7, 6).as("mmr_score"))
        .orderBy(col("query_id"), col("pick_no"))
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
      // widen before the tokenize/explode passes (r15, guide §2): both
      // the (doc, term) count build and the per-doc token-count scan ran
      // as 2-task stages off the 2-row-group documents parquet at 10×
      // (12.6 s + 2.9 s walls); no-op when the input is already wide
      val docsW = graft.operators.Dedup.widen(docs)
      val dt = docsW.select(col("doc_id"), col("source"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("source"), col("term"))
        .agg(count(lit(1)).as("m"))
        .ckpt()
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
      val dtm = docsW.select(col("doc_id"), col("source"),
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
        .ckpt() // 3 consumers: totals + both fan sides
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
        .ckpt() // 2 consumers: norm totals + the dim explode
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
        .ckpt() // 2 consumers: unigram and bigram explodes
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
        .ckpt() // 2 consumers: the model build + the scoring join
      val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .ckpt() // 4 consumers: margins + types + the lp table
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
        .ckpt() // consumers: both pair sides, ties, day counts
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
        .ckpt() // consumers: window end + the island build
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
        .ckpt() // consumers: cal count, value groups, eval side
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
        .ckpt() // consumers: window end + the island build
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
        .ckpt() // consumers: cohort totals + the test terms
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
        .ckpt() // consumers: per-slice totals + the cumsum
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
      val q = odd.join(even, Seq("j")).ckpt()
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

  private[graft] def annOracles: Map[String, String] = Map(
    "x25_quantize" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings), " +
        "s AS (SELECT vec_id, vec, list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale FROM v), " +
        "d AS (SELECT vec_id, vec, scale, list_transform(vec, x -> " +
        "greatest(-127.0, least(127.0, floor(x / scale + 0.5))) * scale) AS dq FROM s) " +
        "SELECT vec_id, round(scale, 6) AS scale, " +
        "round(list_dot_product(vec, dq) / (sqrt(list_dot_product(vec, vec)) * " +
        "sqrt(list_dot_product(dq, dq))), 4) AS cos_fidelity " +
        "FROM d ORDER BY vec_id"),
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
    "x10_knn_brute" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "i AS (SELECT vec_id AS item_id, embedding::DOUBLE[] AS iv FROM embeddings) " +
        "SELECT query_id, rank, item_id, round(cos, 4) AS cos FROM (" +
        s"SELECT query_id, item_id, $cosSql AS cos, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS rank " +
        "FROM i CROSS JOIN q WHERE item_id != query_id) " +
        "WHERE rank <= 10 ORDER BY query_id, rank"),
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
    // same micro-quantized values and integer cumsums as x134, the exact
    // HUGEINT ≡ DECIMAL(38,0) numerator, and the SHARED W1Sql final read
    "x167_wasserstein_drift" -> W1DriftOracleSql,
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
  )
}

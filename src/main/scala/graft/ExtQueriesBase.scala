package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Shared helpers, fitted-index memoizers and oracle SQL fragments for
  * the extension-query family traits — extracted verbatim from
  * ExtensionQueries in the r14 per-family split. `private` members were
  * widened to `private[graft]` so the family traits (self-typed on this)
  * and the graft test suite keep the access they had inside the single
  * object. */
private[graft] trait ExtQueriesBase {

  /** documents with vectors cast to double (float accumulation differs
    * between engines; double-double is exact-comparable).
    */
  private[graft] def embeddingsD(s: SparkSession, dir: String): DataFrame =
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
  private[graft] def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    semCentroids(s, dir, 8)

  /** [[ivfCentroids]] at caller-chosen K — x54 scales K with the corpus
    * ([[graft.operators.SemDedup.scaledK]]); at the sf0.01 gate that
    * resolves to the same k=8 fit the ANN queries memoize.
    */
  private[graft] def semCentroids(s: SparkSession, dir: String, k: Int): DataFrame =
    graft.operators.Fitted.getOrFit(s,
      graft.operators.Fitted.key(dir, "ivf", "k" -> k, "maxIter" -> 5)) {
      graft.operators.Ivf.fit(embeddingsD(s, dir), "vec", k = k, maxIter = 5)
    }

  private[graft] def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    pqCodebooksM(s, dir, 4)

  /** [[pqCodebooks]] at caller-chosen sub-quantizer count. m=4 (16 dims
    * per sub, 4 bytes/vec) is the max-compression point x53's streaming
    * index maintains; m=8 (8 dims per sub, 8 bytes/vec) is the
    * PRODUCTION retrieval point — the finer codebook sharpens the ADC
    * ordering enough that, with the C=1000 re-rank pool, recall@10
    * reaches 0.90 (AnnFrontier, COVERAGE.md) where m=4/C=300 sat at
    * 0.5–0.7.
    */
  private[graft] def pqCodebooksM(s: SparkSession, dir: String, m: Int): DataFrame =
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
  private[graft] def scaledIvf(s: SparkSession, dir: String): (DataFrame, Int) = {
    val k = graft.operators.SemDedup.scaledK(embeddingsD(s, dir).count())
    (semCentroids(s, dir, k), math.max(4, k / 2))
  }

  /** Sketch geometry + the shared x55/x61 candidate read: exact top-20
    * terms scored against a collected sketch — ONE definition so the
    * "same top-20 read, same oracle" coupling between the batch-built and
    * stream-merged sketches cannot drift.
    */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 512
  private[graft] def cmsTop20(terms: DataFrame, sk: Seq[Long]): DataFrame =
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
  private[graft] def qlrScoredLab(s: SparkSession, dir: String,
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
  private[graft] val SubwordPattern =
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


  /** x241's repetitive-text gate: docs deflating below this ratio tick
    * (0.40) are flagged — natural prose lands ~0.45-0.7 at these doc
    * lengths, boilerplate/repetition far lower. One constant, both
    * engines.
    */
  private[graft] val CompressLowTick = 400000L

  /** x242's secret-candidate gates: tokens at least this long, mixing
    * letters and digits, whose char-level Shannon entropy reaches the
    * 2.5-nat tick threshold (e^2.5 ≈ 12 effective symbols — long
    * natural words sit near 2.2-2.4; random hex caps at ln 16 ≈ 2.773,
    * random base62 higher still). Entropy accumulates as per-char
    * integer 1e-12 ticks (each (c/n)·ln(n/c) term quantized BEFORE the
    * sum), so the per-token statistic is order-independent under any
    * partitioning — the PageRank-contribution device applied to entropy.
    */
  private[graft] val SecretMinLen = 16
  private[graft] val SecretEntropyTicks = 2500000000000L // 2.5 nats: above
  // natural words (~2.2-2.4), below the hex-alphabet cap ln 16 ≈ 2.773

  /** One entropy-term tick over a char count `c` and token length `n` —
    * parameterized so the SAME formula text serves the engine's per-row
    * HOF fold and the oracle's list comprehension.
    */
  private[graft] def SecretTermTick(c: String, n: String): String =
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
  private[graft] def RobustTmSql(v: String): String =
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
  private[graft] def sloOverValueHist(s: SparkSession, cells: DataFrame): DataFrame = {
    val hist = cells.ckpt() // consumers: totals + two lookups
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("vm"))
    val cum = hist
      .withColumn("cumhi", sum(col("c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("cumlo", col("cumhi") - col("c") + 1)
      .ckpt() // both containment lookups read it
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
  private[graft] def secretRollup(cells: DataFrame): DataFrame = cells
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

  private[graft] def abDayCells(ev: DataFrame): DataFrame =
    abDayProject(ev).groupBy(col("d"))
      .agg(abDayCellAggs.head, abDayCellAggs.tail: _*)

  /** The read-time mSPRT derivation over the bounded day-cell table —
    * shared verbatim by batch x234 and stream x238, so the statistic
    * cannot drift between them. σ² is the pooled plug-in re-derived from
    * the cells' integer sums (identical to a full-scan moment row, since
    * integer addition is associative); cumulative stats and the running
    * max of ln Λ are calendar-bounded broadcast prefix joins.
    */
  private[graft] def msprtOverDayCells(cellsIn: DataFrame): DataFrame = {
    val daily = cellsIn
      .ckpt() // day spine: sig + both prefix joins read it
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
      .ckpt() // consumers: self-join (both sides) + output
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
  private[graft] val MsprtThetaSql: String =
    "((CAST(sb AS DOUBLE) / 1e6) / nb - (CAST(sa AS DOUBLE) / 1e6) / na)"
  private[graft] val MsprtVSql: String = "(sig2 * (1.0 / na + 1.0 / nb))"
  private[graft] val MsprtLnLrSql: String =
    s"(0.5 * ln($MsprtVSql / ($MsprtVSql + 0.01)) + " +
      s"(($MsprtThetaSql) * ($MsprtThetaSql) * 0.01) / " +
      s"(2.0 * $MsprtVSql * ($MsprtVSql + 0.01)))"

  /** The x68/x246 shared DuckDB weight derivation: identical md5 buckets,
    * full-spine add-1 smoothing, bucket-ordered per-doc fold — ends at
    * the per-doc log-weight table `ws(doc_id, w)`.
    */
  private[graft] def dsirWsCtes: String =
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
  private[graft] val DsirEssSql: String =
    "((CAST(su AS DOUBLE) / 1e9) * (CAST(su AS DOUBLE) / 1e9) / " +
      "(CAST(su2 AS DOUBLE) / 1e18))"

  /** x235's quasi-identifier band + policy axis — shared constants. */
  private[graft] val KAnonBandSql: String =
    "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT)"
  private[graft] val KAnonKs = Seq(2L, 5L, 10L)

  /** x237's Holt updates over the accumulator (prefix `p`: "acc." in the
    * Spark fold, "h." in the oracle's recursive CTE) and the observation
    * expression `x` — the level tree is spliced twice (the trend update
    * re-evaluates it), so both engines see the identical IEEE tree in
    * both positions. α = 0.3, β = 0.1; constants CAST so DuckDB doesn't
    * parse them as DECIMAL.
    */
  private[graft] def HoltLSql(p: String, x: String): String =
    s"CAST(0.3 AS DOUBLE) * $x + CAST(0.7 AS DOUBLE) * (${p}l + ${p}b)"
  private[graft] def HoltBSql(p: String, x: String): String =
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
  private[graft] def WoeSql(p: String): String =
    s"ln(((CAST(${p}np AS DOUBLE) + 0.5) / (CAST(${p}tnp AS DOUBLE) + 5.0)) / " +
      s"((CAST(${p}nn AS DOUBLE) + 0.5) / (CAST(${p}tnn AS DOUBLE) + 5.0)))"
  private[graft] def WoeIvTermSql(p: String): String =
    s"((CAST(${p}np AS DOUBLE) + 0.5) / (CAST(${p}tnp AS DOUBLE) + 5.0) - " +
      s"(CAST(${p}nn AS DOUBLE) + 0.5) / (CAST(${p}tnn AS DOUBLE) + 5.0)) * " +
      s"(${WoeSql(p)})"

  /** x228's pre-period cutoff: 2024-01-16 00:00:00 UTC in epoch micros —
    * the testdata events span 2024-01-01..30 at every SF, so the halves
    * are non-degenerate everywhere. One literal feeds both engines
    * (Spark `unix_micros`, DuckDB `epoch_us`).
    */
  private[graft] val CupedCutoffUs = 1705363200000000L

  /** x228's CUPED float chains over the single moment row
    * (n, sx, sy, sxx, sxy, syy, n_a, n_b, sx_a, sx_b, sy_a, sy_b) —
    * ONE string per quantity, both engines evaluate the identical IEEE
    * tree. Covariances/variances expand the raw-moment form
    * (Σxy/1e12 − (Σx/1e6)(Σy/1e6)/n) inline so neither engine re-orders
    * the operands.
    */
  private[graft] def CupedMomSql(sab: String, sa: String, sb: String): String =
    s"(CAST($sab AS DOUBLE) / 1e12 - (CAST($sa AS DOUBLE) / 1e6) * " +
      s"(CAST($sb AS DOUBLE) / 1e6) / n)"
  private[graft] def CupedMeanSql(c: String, v: String): String =
    s"(CAST(${c}_$v AS DOUBLE) / 1e6 / n_$v)"
  private[graft] val CupedThetaSql: String =
    s"(${CupedMomSql("sxy", "sx", "sy")} / ${CupedMomSql("sxx", "sx", "sx")})"
  private[graft] val CupedDiffAdjSql: String =
    s"((${CupedMeanSql("sy", "b")} - $CupedThetaSql * ${CupedMeanSql("sx", "b")}) - " +
      s"(${CupedMeanSql("sy", "a")} - $CupedThetaSql * ${CupedMeanSql("sx", "a")}))"
  private[graft] val CupedVarRedSql: String =
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
  private[graft] def ewmaOverDaily(daily: DataFrame): DataFrame =
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
  private[graft] def psiOverBinCounts(s: SparkSession, cnts: DataFrame): DataFrame = {
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
  private[graft] def w1OverCounts(counts: DataFrame): DataFrame = {
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
  private[graft] def cusumOverDaily(daily: DataFrame): DataFrame = {
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
  private[graft] val Bm25TermSql: String =
    "ln((nn - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(tf * (1.2 + 1.0)) / " +
      "(tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) * nn / tt)))"

  /** x148's DCG discount weights 1/log2(rank+1) as a CASE literal table
    * (the x115 device — Scala-computed doubles embedded via their
    * shortest round-trip repr, so both engines parse identical IEEE
    * values), plus the ideal DCG for 10 graded-relevance items.
    */
  private[graft] val DcgW: Seq[Double] =
    (1 to 10).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  private[graft] def dcgWeightCase(v: String): String =
    s"CASE $v " + DcgW.zipWithIndex.map { case (w, i) =>
      s"WHEN ${i + 1} THEN CAST($w AS DOUBLE)" }.mkString(" ") +
      " ELSE CAST(0.0 AS DOUBLE) END"
  private[graft] val IdcgVal: Double =
    (1 to 10).map(r => (11 - r) * DcgW(r - 1)).sum
  private[graft] val NdcgContribSql: String =
    s"CAST(rel AS DOUBLE) * (${dcgWeightCase("rank")})"

  /** x126's Welch t statistic over columns (n_a, n_b, s_a, s_b, q_a, q_b)
    * — exact integer micro-sums in, ONE expression string evaluated by
    * both engines, so the IEEE chain (means, sample variances, √) is
    * operand-identical. The mean/variance sub-expressions are inlined
    * (not aliased) so both engines evaluate literally the same tree.
    */
  private[graft] def WelchMean(x: String): String =
    s"(CAST(s_$x AS DOUBLE) / 1e6) / n_$x"
  private[graft] def WelchVar(x: String): String =
    s"((CAST(q_$x AS DOUBLE) / 1e12 - n_$x * (${WelchMean(x)}) * (${WelchMean(x)})) / (n_$x - 1))"
  private[graft] val WelchTSql: String =
    s"((${WelchMean("b")}) - (${WelchMean("a")})) / " +
      s"sqrt(${WelchVar("a")} / n_a + ${WelchVar("b")} / n_b)"

  /** x226's standard error / minimum-detectable-effect chains over the
    * same exact moment columns as x126 — ONE string per quantity, both
    * engines evaluate the identical IEEE tree. The z constants
    * (two-sided α=0.05, power 0.8) are shared rounded literals so
    * neither engine computes its own quantile.
    */
  private[graft] val AbSeSql: String =
    s"sqrt(${WelchVar("a")} / n_a + ${WelchVar("b")} / n_b)"
  private[graft] val AbMdeSql: String = s"(1.959964 + 0.841621) * ($AbSeSql)"

  /** x225's per-stratum variance chain over (n_h, s1, s2) exact integer
    * moments — one string, both engines, operand-identical.
    */
  private[graft] val NeymanVarSql: String =
    "(CAST(n_h AS DOUBLE) * CAST(s2 AS DOUBLE) - " +
      "CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / " +
      "(CAST(n_h AS DOUBLE) * (n_h - 1))"

  /** x140's Cohen's kappa over the integer confusion columns
    * (n, n11, n10, n01, n00) — ONE string evaluated by both engines, so
    * the (po−pe)/(1−pe) chain orders identically off the exact counts.
    */
  private[graft] val KappaSql: String = {
    val po = "(CAST(n11 + n00 AS DOUBLE) / n)"
    val pa = "(CAST(n11 + n10 AS DOUBLE) / n)"
    val pb = "(CAST(n11 + n01 AS DOUBLE) / n)"
    val pe = s"($pa * $pb + (1.0 - $pa) * (1.0 - $pb))"
    s"($po - $pe) / (1.0 - $pe)"
  }

  /** The x145/x154 shared graph surface: undirected (u < v) part
    * co-purchase edges (parts sharing an order), deduped.
    */
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def labelPropagate(und: DataFrame, rounds: Int): DataFrame = {
    // localCheckpoint, NOT persist (r14): the rounds chain lazily, so the
    // ONE final plan references `edges` once per round — a persisted
    // subtree referenced twice per plan loses cache substitution
    // (DeduplicateRelations re-aliases it) and recomputes the symmetrized
    // edge build per round; the checkpointed frame is a plan leaf.
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .ckpt()
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
  private[graft] val PoissonThreshHex: Seq[String] = {
    val pmf = (0 to 4).map(k => math.exp(-1.0) / (1 to k).product)
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => f"${math.floor(c * 65536).toLong}%04x")
  }
  private[graft] val PoissonCaseSql: String =
    "CASE " + PoissonThreshHex.zipWithIndex.map { case (h, k) =>
      s"WHEN u < '$h' THEN $k" }.mkString(" ") + " ELSE 5 END"
  private[graft] val BootMeanSql: String = "CAST(swv AS DOUBLE) / 1e6 / sw"

  /** x158's state rule over the integer epoch-week columns (pwd, wd) —
    * ONE string evaluated by both engines.
    */
  private[graft] val LifecycleCaseSql: String =
    "CASE WHEN pwd IS NULL THEN 'new' WHEN wd - pwd = 1 THEN 'retained' " +
      "ELSE 'resurrected' END"

  /** x160's cosine over the exact decimal sums (dot, nq, nd) — ONE
    * string; the DOUBLE casts land on the decimals, so both engines run
    * the identical IEEE chain.
    */
  private[graft] val TfidfCosSql: String =
    "CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nd AS DOUBLE)))"

  /** x162's micro-quantized F1 over the integer counts (tp, fp, fn). */
  private[graft] val F1MicroSql: String =
    "CAST(floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1e6 + 0.5) AS BIGINT)"

  /** x142's normal-equation chain over the exact integer ln-sums
    * (n, sx, sy, sxy, sxx — micro-scaled by 1e6/1e12) — ONE string per
    * statistic evaluated by both engines, so every product/division
    * orders identically. The intercept inlines the slope tree (not an
    * alias) so both engines evaluate literally the same expression.
    */
  private[graft] val ZipfSlopeSql: String =
    "(n * (CAST(sxy AS DOUBLE) / 1e12) - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6)) / " +
      "(n * (CAST(sxx AS DOUBLE) / 1e12) - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))"
  private[graft] val ZipfInterceptSql: String =
    s"((CAST(sy AS DOUBLE) / 1e6) - ($ZipfSlopeSql) * (CAST(sx AS DOUBLE) / 1e6)) / n"

  /** x143's ratio-to-overall over (sv, n, st, nn) — one shared string. */
  private[graft] val SeasonalSql: String =
    "(CAST(sv AS DOUBLE) / 1e6 / n) / (CAST(st AS DOUBLE) / 1e6 / nn)"

  /** x135's per-cell χ² contribution (o−e)²/e with e = rt·ct/nn — ONE
    * string over columns (o, rt, ct, nn) evaluated by both engines, so
    * every division/subtraction orders identically.
    */
  private[graft] val Chi2CellSql: String =
    "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / nn) * " +
      "(CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / nn) / " +
      "(CAST(rt AS DOUBLE) * ct / nn)"

  /** x166's per-bin PSI contribution (p−q)·ln(p/q) with Laplace-smoothed
    * bin fractions p = (c+1)/(ns+10), q = (g+1)/(nn+10) — ONE string over
    * columns (c, ns, g, nn) so both engines evaluate the identical IEEE
    * expression (the Chi2CellSql device; smoothing over the full 10-bin
    * spine keeps every log argument finite).
    */
  private[graft] val PsiCellSql: String =
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
  private[graft] val JsdContribSql: String =
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
  private[graft] val FleschSql: String =
    "206.835 - 1.015 * (CAST(w AS DOUBLE) / se) - " +
      "84.6 * (CAST(sy AS DOUBLE) / w)"

  /** x185's per-gram entropy contribution −p·ln p nano-quantized off the
    * exact (c, n) integers — order-free exact sums (the x178 device).
    */
  private[graft] val EntropyContribSql: String =
    "CAST(floor(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) " +
      "* 1e12 + 0.5) AS BIGINT)"

  /** x188's per-bigram interpolated Kneser-Ney log-probability over the
    * exact integer model parameters (cb bigram count, cw1 left-context
    * total, r1 distinct right types of w1, l2 distinct left types of
    * w2, bt total bigram types), discount 0.75, nano-quantized — ONE
    * string, both engines evaluate identical doubles off identical
    * integers.
    */
  private[graft] val KnLpSql: String =
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
  private[graft] val SgnSql: String =
    "CAST(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END AS BIGINT)"
  private[graft] val SenSlopeSql: String =
    "CAST(floor(CAST(vb - va AS DOUBLE) * 1e3 / gap + 0.5) AS BIGINT)"
  private[graft] val MedianPickSql: String =
    "rk IN (CAST(floor((np + 1) / 2.0) AS BIGINT), " +
      "CAST(floor((np + 2) / 2.0) AS BIGINT))"
  private[graft] val MkZSql: String =
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
  private[graft] val AcfSql: String =
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
  private[graft] def acfOverDaily(daily: DataFrame): DataFrame = {
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
  private[graft] val LrESql: String =
    "CAST(floor((CAST(d_a AS DOUBLE) " +
      "- CAST(d_a + d_b AS DOUBLE) * na / (na + nb)) * 1e9 + 0.5) AS BIGINT)"
  private[graft] val LrVSql: String =
    "CASE WHEN na + nb <= 1 THEN CAST(0 AS BIGINT) " +
      "ELSE CAST(floor(CAST(d_a + d_b AS DOUBLE) " +
      "* (CAST(na AS DOUBLE) / (na + nb)) " +
      "* (CAST(nb AS DOUBLE) / (na + nb)) " +
      "* (CAST(na + nb - d_a - d_b AS DOUBLE) / (na + nb - 1)) " +
      "* 1e9 + 0.5) AS BIGINT) END"
  private[graft] val LrZSql: String =
    "CASE WHEN sv <= 0 THEN 0.0 " +
      "ELSE (CAST(se AS DOUBLE) / 1e9) / sqrt(CAST(sv AS DOUBLE) / 1e9) END"

  /** The x190 ≡ x199 oracle (the stream-maintained ACF must equal the
    * batch one — the x166/x176 coupling): exact micro-tick daily series,
    * HUGEINT pre-widening, the SHARED AcfSql read.
    */
  private[graft] def AcfOracleSql: String =
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
  private[graft] val KmLnSql: String =
    "CASE WHEN d >= n_risk THEN NULL " +
      "ELSE CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e9 + 0.5) " +
      "AS BIGINT) END"
  private[graft] val KmSurvSql: String =
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
  private[graft] val PrTermSql: String =
    "CASE WHEN p = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(floor((CAST(tp - tpp AS DOUBLE) / p) * " +
      "((CAST(tp AS DOUBLE) / (tp + fp) + " +
      "CASE WHEN tpp + fpp = 0 THEN 1.0 " +
      "ELSE CAST(tpp AS DOUBLE) / (tpp + fpp) END) / 2.0) " +
      "* 1e12 + 0.5) AS BIGINT) END"

  /** x193's gains reads over exact integer counts: cumulative positive
    * capture and per-decile lift vs the base rate. ONE string each.
    */
  private[graft] val GainsCaptureSql: String =
    "CAST(cum_pos AS DOUBLE) / p"
  private[graft] val GainsLiftSql: String =
    "(CAST(n_pos AS DOUBLE) / n_docs) / (CAST(p AS DOUBLE) / nn)"

  /** x194's per-point simplified silhouette, nano-quantized off the exact
    * micro-tick squared distances to the own (a2) and nearest-other (b2)
    * centroid: s = (√b² − √a²)/√max — with the a2 = b2 = 0 guard (a point
    * ON two coincident centroids has no preference). ONE string.
    */
  private[graft] val SilhSql: String =
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
  private[graft] val AssortSql: String =
    "CASE WHEN m * sxx = sx * sx THEN 0.0 " +
      "ELSE CAST(m * sxy - sx * sx AS DOUBLE) " +
      "/ CAST(m * sxx - sx * sx AS DOUBLE) END"

  /** x196's conformal pieces: the nano-quantized nonconformity
    * 1 − P(true class) under the sigmoid of the 6-dp score (ONE string —
    * both engines rank identical integers), and the calibration rank
    * ⌈(n+1)(1−α)⌉ at α = 0.1, clamped to n.
    */
  private[graft] val ConfNcSql: String =
    "CAST(floor((1.0 - CASE WHEN pos = 1 " +
      "THEN 1.0 / (1.0 + exp(-score)) " +
      "ELSE 1.0 - 1.0 / (1.0 + exp(-score)) END) * 1e9 + 0.5) AS BIGINT)"
  private[graft] val ConfRankSql: String =
    "least(CAST(ceil((ncal + 1) * 0.9) AS BIGINT), ncal)"

  /** x197's p99 pick over the count-of-counts frame: the smallest
    * per-key count covering ≥ 99% of keys. ONE string.
    */
  private[graft] val SkewP99RankSql: String =
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

  private[graft] def slicedW1DirSql: String =
    SlicedW1Dirs.zipWithIndex.map { case (dv, j) =>
      s"SELECT $j AS slice, [${dv.map(d => f"$d%.3f").mkString(", ")}] AS d"
    }.mkString(" UNION ALL ")

  /** x201's guarded AUC read off x88's exact rank integers (s2 = Σ np·
    * (2·cb + n + 1), p positives, tot rows): the usual Mann-Whitney
    * division, 0.5 by convention when a fold is single-class (the
    * statistic is undefined — a ranker cannot be right or wrong with
    * one class). ONE string, both engines.
    */
  private[graft] val CvAucSql: String =
    "CASE WHEN p = 0 OR p = tot THEN 0.5 " +
      "ELSE CAST(s2 - CAST(p AS DECIMAL(38,0)) * (p + 1) AS DOUBLE) " +
      "/ CAST(2 * CAST(p AS DECIMAL(38,0)) * (tot - p) AS DOUBLE) END"

  /** x204's projected variance off exact integer micro-sums (n, sp = Σpm,
    * spp = Σpm²): population variance in the same fixed operand order on
    * both engines. ONE string.
    */
  private[graft] val PcaVarSql: String =
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
  private[graft] val GtStarSql: String =
    "CASE WHEN coalesce(m_next, 0) = 0 THEN NULL " +
      "ELSE CAST(c + 1 AS DOUBLE) * m_next / m END"

  /** x212's per-term Jensen–Shannon contribution over the exact integer
    * columns (ca, ta, cb, tb): 0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q))
    * with the zero-count sides dropping out — ONE string, identical
    * operand order on both engines (the per-PAIR sum then folds in
    * sorted term order, the x96 device).
    */
  private[graft] val JsdTermSql: String =
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
  private[graft] def HllEstSql(m: Int): String = {
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
  private[graft] def CorrSql(sx: String, sy: String, sxx: String, syy: String,
      sxy: String): String = {
    val den = s"(sqrt(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE) - " +
      s"CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)) * " +
      s"sqrt(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE) - " +
      s"CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)))"
    s"CASE WHEN $den = 0 THEN 0.0 ELSE " +
      s"(CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE) - " +
      s"CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE)) / $den END"
  }

  private[graft] val DlAucSql: String =
    "CASE WHEN mpos = 0 OR nneg = 0 THEN 0.5 " +
      "ELSE CAST(s1 AS DOUBLE) / (2.0 * CAST(nneg AS DOUBLE) * mpos) END"
  private[graft] val DlSeSql: String =
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
  private[graft] def cvAucOracle: String = {
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
  private[graft] val LeakRateSql: String =
    "CASE WHEN n_pairs = 0 THEN 0.0 " +
      "ELSE CAST(n_straddle_naive AS DOUBLE) / n_pairs END"

  /** x203's top-quartile threshold rank: the ⌈0.75·N⌉-th smallest score
    * (selection = strictly above it). ONE string.
    */
  private[graft] val SelThrRankSql: String =
    "CAST(ceil(0.75 * nn) AS BIGINT)"

  /** The audited join-key columns — ONE inventory builds both the Spark
    * union and the oracle's UNION ALL (x90's profileCols device).
    */
  private[graft] val SkewAuditCols: Seq[(String, String)] = Seq(
    "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey", "orders" -> "o_custkey",
    "events" -> "user_id")

  /** x197's oracle: per audited column, the same per-key aggregate, the
    * same exact integer stats, the same cumulative count-of-counts p99.
    */
  private[graft] def skewAuditOracle: String = {
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
  private[graft] val ShardCvSql: String =
    "sqrt(CAST(n_shards * st2 - st * st AS DOUBLE)) / CAST(st AS DOUBLE)"

  /** x167's final W₁ read off the exact integer numerator: the sum of
    * |cumA·nB − cumB·nA|·Δv terms divided by nA·nB·1e6 — one shared
    * string over (st, na, nb); st is an exact integer in both engines
    * (Spark DECIMAL(38,0), DuckDB HUGEINT), so the double cast rounds
    * the same value once.
    */
  private[graft] val W1Sql: String =
    "CAST(st AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1e6)"

  /** x168's Naive Bayes parameter quantizers — nano-quantized natural
    * logs of the Laplace-smoothed class-conditional term probability
    * (over cst, ns, v), the unseen-term default (over ns, v), and the
    * class prior (over dc, dd). ONE string each evaluated by both
    * engines, so every per-(class, term) integer is identical and the
    * per-doc scores are exact integer sums.
    */
  private[graft] val NbLpSql: String =
    "CAST(floor(ln((CAST(cst AS DOUBLE) + 1) / (CAST(ns AS DOUBLE) + v)) " +
      "* 1e9 + 0.5) AS BIGINT)"
  private[graft] val NbDefSql: String =
    "CAST(floor(ln(1.0 / (CAST(ns AS DOUBLE) + v)) * 1e9 + 0.5) AS BIGINT)"
  private[graft] val NbPriorSql: String =
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
  private[graft] val HeapsBetaSql: String =
    "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
  private[graft] val HeapsLnKSql: String =
    s"(CAST(sy AS DOUBLE) / 1e9 - ($HeapsBetaSql) * CAST(sx AS DOUBLE) / 1e9) / n"

  /** x171's BH threshold mapped to the χ² scale: with 2 dof the χ²
    * survival is exp(−x/2), so p₍ᵢ₎ ≤ i·q/m ⟺ χ²₍ᵢ₎ ≥ −2·ln(i·q/m) —
    * the comparison runs without an exp() anywhere (x70's lesson: exp is
    * not bit-portable; ln on small exact rationals is the x163 device).
    * ONE string over (rank, m), q = 0.10.
    */
  private[graft] val BhThrSql: String =
    "-2 * ln(CAST(rank AS DOUBLE) * 0.10 / m)"

  /** x173's micro-quantized log-likelihood keyness G² = 2·Σ o·ln(o/e)
    * over the term's 2×1 split (target count a of total ta, rest count
    * b of total tb; expected shares from the pooled rate) — ONE string
    * over (a, b, ta, tb) producing the INTEGER micro-tick directly, so
    * the top-k ordering key is exact in both engines. 0·ln(0) = 0 via
    * the CASE guards.
    */
  private[graft] val G2MicroSql: String =
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
  private[graft] val BurstSql: String =
    "CAST(dd * sm2 - sm * sm AS DOUBLE) / CAST(dd * sm AS DOUBLE)"

  /** x174's Benford expectations log10(1+1/d) as Scala-computed literals
    * (the x115/x148 CASE device — both engines parse the identical IEEE
    * doubles), and the per-digit χ² contribution over (o, nn) with
    * e = nn·p.
    */
  private[graft] val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
  private[graft] val BenfordPSql: String = {
    val cases = BenfordP.map { case (d, p) => s"WHEN $d THEN CAST($p AS DOUBLE)" }
    s"CASE digit ${cases.mkString(" ")} ELSE 0.0 END"
  }
  private[graft] val BenfordCellSql: String =
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

  private[graft] def rboWeightCase(v: String): String = {
    val cases = (1 to 10).scanLeft(1.0)((a, _) => a * 0.9).tail.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN ${w / (i + 1)}" }
    s"CASE $v ${cases.mkString(" ")} ELSE 0.0 END"
  }

  // x27 constants — the oracle SQL below derives its thresholds from these
  private[graft] val sampleRates = Map("en" -> 0.25, "de" -> 0.5)
  private[graft] val splitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // ---- DuckDB oracles ---------------------------------------------------

  /** tokens as DuckDB list (mirrors TextFunctions.tokens). */
  private[graft] val toks = raw"list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)"
  private[graft] def markers(lang: String): String = {
    val ws = TextFunctions.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(ts, t -> t IN ($ws)))"
  }
  /** 3-token shingle set (mirrors TextFunctions.shingles k=3). */
  private[graft] val shingleSql =
    "list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])"
  /** replicate Dedup.cosine exactly: sequential dot products in double. */
  private[graft] val cosSql =
    "list_dot_product(iv, qv) / (sqrt(list_dot_product(iv, iv)) * sqrt(list_dot_product(qv, qv)))"
  /** Column inventory for the x90 profiling op — one source of truth for
    * the Spark stack() and the oracle's UNION ALL branches.
    */
  private[graft] val profileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")

  private[graft] val jaccardCte =
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
  private[graft] val qualityCtes =
    s"WITH m AS (SELECT doc_id, text, $toks AS ts FROM documents), " +
      s"c AS (SELECT doc_id, len(ts) AS n, CAST(${markers("en")} AS DOUBLE) AS mk, " +
      raw"CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / len(text) AS punct, " +
      "CAST(list_sum(list_transform(ts, t -> len(t))) AS DOUBLE) / len(ts) AS mtl FROM m)"
  private[graft] val qualityExprSql =
    "floor((least(mk / n * 4, 1.0) * 0.3 + least(CAST(n AS DOUBLE) / 100, 1.0) * 0.3 + " +
      "(1.0 - punct) * 0.2 + (CASE WHEN mtl BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2) " +
      "* 10000 + 0.5) / 10000"

  /** The oracle half of [[qlrScoredLab]], shared by x88/x192/x193/x196:
    * CTE `lab` exposes (doc_id, score, pos) — the staged model weights
    * applied to the independently re-derived quality features, rounded
    * to the same 6 dp. One definition; a feature/rounding tweak edited
    * here cannot leave one consumer's oracle gating stale scores.
    */
  private[graft] def scoredLabCtes(stageKey: String): String =
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
  private[graft] val decontaminateSql =
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
  private[graft] val cmsSql =
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
  private[graft] val sessionCte =
    "WITH e AS (SELECT user_id, ts, event_id, " +
      "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
      "f AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL " +
      "OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM e), " +
      // CAST: DuckDB's integer sum() returns HUGEINT (int128); the driver's
      // hash compare is type-sensitive, so match Spark's BIGINT exactly
      "g AS (SELECT user_id, ts, CAST(sum(new_sess) OVER (PARTITION BY user_id " +
      "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM f)"

  /** Shared lang-ID CASE over precomputed en/de/fr/es marker counts. */
  private[graft] val langCase =
    "CASE WHEN greatest(en, de, fr, es) <= 0 THEN 'und' " +
      "WHEN en = greatest(en, de, fr, es) THEN 'en' " +
      "WHEN de = greatest(en, de, fr, es) THEN 'de' " +
      "WHEN fr = greatest(en, de, fr, es) THEN 'fr' " +
      "WHEN es = greatest(en, de, fr, es) THEN 'es' ELSE 'und' END"

  /** (doc_id, lang, ts, text) CTE prefix used by the per-language oracles. */
  private[graft] val langCte =
    s"WITH m AS (SELECT doc_id, text, $toks AS ts FROM documents), " +
      s"s AS (SELECT doc_id, text, ts, ${markers("en")} AS en, ${markers("de")} AS de, " +
      s"${markers("fr")} AS fr, ${markers("es")} AS es FROM m), " +
      s"l AS (SELECT doc_id, text, ts, $langCase AS lang FROM s)"

  /** x262's shared recall read over a certification row (n_true, n_hit):
    * both engines compute the identical integer counts, so the one
    * division cannot drift.
    */
  private[graft] val RecallSql =
    "CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)"

  /** x255's shared Gini read over the (n_docs, sx, srx) row — the sorted
    * formula G = (2·Σ r·x − (n+1)·Σx)/(n·Σx) with the exact decimal
    * rank-weighted sum in the numerator.
    */
  private[graft] val GiniSql =
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
  private[graft] val IpwNaiveSql =
    "(CAST(sy_t AS DOUBLE) / n_treated - CAST(sy_c AS DOUBLE) " +
      "/ (n - n_treated)) / 1e6"
  private[graft] val IpwAteSql =
    "(CAST(sw_t AS DOUBLE) / CAST(swn_t AS DOUBLE) - " +
      "CAST(sw_c AS DOUBLE) / CAST(swn_c AS DOUBLE)) / 1e6"

  /** x265's shared dispersion read over (n_days, n_events, sc2):
    * D = var/mean with the two-pass-free exact variance
    * (nd·Σc² − (Σc)²) / (nd·(nd−1)) over integer daily counts.
    */
  private[graft] val DispersionSql =
    "((CAST(n_days AS DOUBLE) * CAST(sc2 AS DOUBLE) - " +
      "CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) / " +
      "(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))) / " +
      "(CAST(n_events AS DOUBLE) / n_days)"

  /** x261's shared RBF h-term tick over the eight dot columns of one
    * paired 4-tuple (x1,x2,y1,y2): k(a,b) = exp(−‖a−b‖²/2σ²) at σ² = 64
    * (components ∈ [−1,1), d = 64 ⇒ E‖a−b‖² ≈ 43, so the kernel sits on
    * its sensitive slope), h = k(x1,x2)+k(y1,y2)−k(x1,y2)−k(x2,y1).
    */
  private[graft] val MmdTickSql =
    "CAST(floor((exp(-(n11 + n22 - 2.0 * dxx) / 128.0) " +
      "+ exp(-(m11 + m22 - 2.0 * dyy) / 128.0) " +
      "- exp(-(n11 + m22 - 2.0 * dxy) / 128.0) " +
      "- exp(-(n22 + m11 - 2.0 * dyx) / 128.0)) * 1e9 + 0.5) AS BIGINT)"

  /** x259's read over a class row (n, nt, sad): t = Σ|cum diffs| /
    * (n·N·(m−1)) with m = 16 ordered sensitive values — the standard
    * ordered-domain EMD normalization.
    */
  private[graft] val TClosenessSql =
    "CAST(sad AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(nt AS DOUBLE) * 15.0)"

  /** x260's shared A-ES key over a 32-bit ticket `ut` and weight `w`:
    * u = (ut+1)/2³² ∈ (0,1], key = ln(u)/w — u^(1/w) ordering in the
    * numerically-stable log domain.
    */
  private[graft] val ReservoirKeySql =
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
  private[graft] val DpNoiseSql =
    "-(1.0 / eps) * (CASE WHEN ut >= 2147483648 THEN 1.0 ELSE -1.0 END) * " +
      "ln(1.0 - 2.0 * abs(CAST(ut AS DOUBLE) / 4294967296.0 - 0.5))"


  /** The x144/x149 shared oracle — integer S·D numerator, (|S·D| DESC,
    * day) argmax, one final division.
    */
  private[graft] val CusumOracleSql: String =
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
  private[graft] val PsiDriftOracleSql: String =
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
  private[graft] val W1DriftOracleSql: String =
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
  private[graft] def tick(salt: String) =
    s"substr(md5('$salt:'||CAST(doc_id AS VARCHAR)),1,4)"
  private[graft] def keepCaseSql: String = {
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
  private[graft] def splitCaseSql: String = {
    import graft.operators.Sampling.thresholdHex
    val total = splitWeights.map(_._2).sum
    val cum = splitWeights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // mirror Sampling.assignSplit's cumRate >= 1.0 short-circuit exactly
    "CASE " + splitWeights.init.zip(cum).map { case ((n, _), c) =>
      if (c >= 1.0) s"WHEN TRUE THEN '$n'"
      else s"WHEN ${tick("spl")} < '${thresholdHex(c)}' THEN '$n'"
    }.mkString(" ") + s" ELSE '${splitWeights.last._1}' END"
  }

  private[graft] def x27Sql: String =
    s"$langCte SELECT doc_id, lang, $splitCaseSql AS split FROM l " +
      s"WHERE $keepCaseSql ORDER BY doc_id"

  /** x44: the assignSplit CASE over an arbitrary key expression (mirrors
    * Sampling.assignSplit keyed by group, not doc).
    */
  private[graft] def splitCaseOver(keyExpr: String): String = {
    import graft.operators.Sampling.thresholdHex
    val total = splitWeights.map(_._2).sum
    val cum = splitWeights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val t = s"substr(md5('spl:'||CAST($keyExpr AS VARCHAR)),1,4)"
    "CASE " + splitWeights.init.zip(cum).map { case ((n, _), c) =>
      if (c >= 1.0) s"WHEN TRUE THEN '$n'"
      else s"WHEN $t < '${thresholdHex(c)}' THEN '$n'"
    }.mkString(" ") + s" ELSE '${splitWeights.last._1}' END"
  }

  private[graft] def x44Sql: String =
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
  private[graft] def x08Sql: String = {
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
  private[graft] def x15Sql: String = {
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
  private[graft] def knnSql(itemsSel: String, probesSel: String, joinKeys: String,
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
  private[graft] def funnelSql: String = funnelSqlWithin(None)

  /** The funnel chain SQL, optionally with a per-stage conversion window
    * (stage i within `minutes` of stage i−1's first completion — interval
    * arithmetic is exact micros on both engines).
    */
  private[graft] def funnelSqlWithin(minutes: Option[Int]): String = {
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

  private[graft] def x26Sql: String =
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
  private[graft] def x31Sql: String = {
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

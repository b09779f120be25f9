package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Governance, privacy, causal and drift extension queries (DP releases, k-anonymity/t-closeness, secret scans, IPW/CUPED/mSPRT, MMD) — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtGovernanceQueries { this: ExtQueriesBase =>

  private[graft] def governanceQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        .ckpt() // consumers: totals + per-bin read + IV fold
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
        .ckpt() // consumers: totals + per-k violation sums
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
  )

  private[graft] def governanceOracles: Map[String, String] = Map(
    // quantile_cont ≡ Spark percentile (the x16 equivalence); identical
    // clip expression and rounding
    "x94_winsorize" ->
      ("WITH b AS (SELECT lang, quantile_cont(n_chars, 0.05) AS lo, " +
        "quantile_cont(n_chars, 0.95) AS hi FROM documents GROUP BY lang) " +
        "SELECT d.doc_id, d.lang, d.n_chars, " +
        "round(least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 4) AS clipped " +
        "FROM documents d JOIN b USING (lang) ORDER BY d.doc_id"),
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
    // same integer S·D numerator and the same (|S·D| DESC, day) argmax
    "x144_cusum_changepoint" -> CusumOracleSql,
    // same quality CTEs as x03, same integer binning (// ≡ Spark div),
    // same Laplace spine, the SHARED PsiCellSql contribution, and the
    // bin-ordered fold ≡ list_reduce
    "x166_psi_drift" -> PsiDriftOracleSql,
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
  )
}

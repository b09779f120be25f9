package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`, Bernoulli on a seeded RNG) is neither
  * reproducible across engines nor stable under repartitioning — a 100 TB
  * pipeline needs the SAME rows selected on every rerun, on any engine,
  * regardless of physical layout. The standard fix is content-hash
  * thresholding: a row is kept iff a hash of (salt, key) falls below the
  * rate threshold. Properties:
  *
  *  - deterministic & layout-independent: the decision is a pure function
  *    of the row key, so reruns, engine swaps (the DuckDB oracle computes
  *    the identical md5), and repartitioning all agree;
  *  - consistent across tables: the same key samples identically anywhere
  *    it appears (joins between sampled tables stay aligned);
  *  - independent samples by salt: 'smp' and 'spl' salts give independent
  *    decisions (md5 avalanche), so a sampling pass and a train/val/test
  *    split don't correlate.
  *
  * The hash is md5 (engine-portable, matching `TextFunctions.fingerprint`'s
  * portability argument) compared on its 4-hex-char prefix — 16 bits of
  * resolution (rate granularity 1/65536), compared LEXICOGRAPHICALLY:
  * lowercase hex strings of equal length order identically to their
  * numeric values, so no integer conversion is needed (DuckDB has no
  * `conv`). Per-row cost is one md5 over a short key — negligible next to
  * a scan at scale, and embarrassingly parallel (no shuffle, no state).
  */
object Sampling {

  /** 4-hex-digit threshold: keys whose md5 prefix sorts below it are kept.
    * Public so oracle SQL can be generated from the same constants.
    */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.floor(rate * 65536).toInt.min(65535)}%04x"
  }

  /** The 4-char md5 prefix of salt:key — the row's 16-bit sampling ticket. */
  def ticket(key: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), key.cast("string"))), 1, 4)

  /** Keep iff the ticket falls below `rate` (deterministic Bernoulli). */
  def keep(key: Column, rate: Double, salt: String = "smp"): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else ticket(key, salt) < lit(thresholdHex(rate))

  /** Stratified keep: per-stratum rates (e.g. downsample over-represented
    * languages), `defaultRate` for strata not listed. Builds a single CASE
    * chain — no join, no shuffle; rates are plan-time literals.
    */
  def stratifiedKeep(key: Column, stratum: Column, rates: Map[String, Double],
      defaultRate: Double = 1.0, salt: String = "smp"): Column =
    rates.toSeq.sortBy(_._1).foldRight(keep(key, defaultRate, salt)) {
      case ((value, rate), elseCol) =>
        when(stratum === lit(value), keep(key, rate, salt)).otherwise(elseCol)
    }

  /** Assign each key to a named split with the given weights (normalized),
    * e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Deterministic:
    * the same key lands in the same split on every engine and every run.
    */
  def assignSplit(key: Column, weights: Seq[(String, Double)],
      salt: String = "spl"): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, "weights must be non-negative, sum > 0")
    val total = weights.map(_._2).sum
    val cum = weights.init.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val t = ticket(key, salt)
    weights.init.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cumRate), elseCol) =>
        // short-circuit a cumulative fraction that reaches 1.0: thresholdHex
        // caps at 'ffff', so `t < 'ffff'` would leak md5-prefix-'ffff' keys
        // (~1/65536) past this split into later (possibly zero-weight) ones
        if (cumRate >= 1.0) lit(name)
        else when(t < lit(thresholdHex(cumRate)), lit(name)).otherwise(elseCol)
    }
  }

  /** 48-bit uniform ticket in (0, 1): the first 12 md5 hex chars as an
    * integer, centered (+0.5) so 0 is unreachable (ln(u) stays finite).
    * Engine-portable: DuckDB computes the identical value via
    * `('0x' || substr(md5(…),1,12))::BIGINT`.
    */
  def uniformTicket(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(s"$salt:"), key.cast("string"))), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(math.pow(2, 48))

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis, IPL 2006):
    * rank every row by ln(u)/w — the log of the classic u^(1/w) draw key,
    * same order, no pow() — and keep the k LARGEST. P(row sampled) scales
    * with its weight (importance / temperature sampling over quality
    * scores, domain weights, token counts). Deterministic u per (salt,
    * key): reruns, engines, and repartitionings pick the same rows, and
    * different salts give independent samples.
    *
    * Scale shape: one per-row md5 + a top-k (TakeOrdered — no global sort
    * materialization, no shuffle beyond the k-row gather). Rows with
    * non-positive weight are excluded (a zero weight cannot be sampled;
    * E–S is undefined there). Ties in `es_rank` (only from md5 collisions
    * on the 48-bit prefix) break by key for a total order.
    */
  def weightedSample(df: org.apache.spark.sql.DataFrame, keyCol: String,
      weight: Column, k: Int, salt: String = "wsmp"): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    df.filter(weight > lit(0))
      .withColumn("es_rank", log(uniformTicket(col(keyCol), salt)) / weight)
      .orderBy(col("es_rank").desc, col(keyCol).asc)
      .limit(k)
  }

  /** DOMAIN-MIXTURE ("temperature") sampling: draw a k-row corpus whose
    * domain proportions follow `n_d^alpha` instead of the raw counts
    * `n_d` — the standard rebalancing for multi-source training mixes
    * (multilingual LM sampling à la XLM-R: alpha<1 upweights small domains,
    * alpha=1 is proportional, alpha=0 is uniform-by-domain).
    *
    * Mechanics, all in one plan (no driver loop):
    *  1. per-domain counts `n_d` (one small aggregate — |domains| rows);
    *  2. quota `m_d = floor(k · n_d^alpha / Σ_e n_e^alpha)`, capped at
    *     `n_d` (a small domain cannot over-fill its quota);
    *  3. each domain keeps its `m_d` members with the SMALLEST md5 tickets
    *     (ties broken by key) — a per-domain window rank, deterministic
    *     and layout-independent like every sampler here.
    *
    * Scale shape: the quota table is |domains| rows (broadcast); the only
    * data-sized work is the per-domain rank — ONE shuffle on the domain
    * key. A skewed giant domain concentrates its rank in one task; at
    * 100 TB pre-aggregate per (domain, salt-bucket) and take per-bucket
    * quotas (the [[graft.operators.Skew]] two-phase pattern) — at that
    * point an approximate per-bucket split of `m_d` is acceptable because
    * m_d is itself statistical. floor() keeps total ≤ k (the usual
    * largest-remainder top-up is omitted: deterministic, documented).
    *
    * Output: df's columns + (n_domain, quota, domain_rank).
    */
  def temperatureMix(df: org.apache.spark.sql.DataFrame, keyCol: String,
      domainCol: String, alpha: Double, k: Long,
      salt: String = "tmix"): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_domain"))
    // Σ n^α folded in DOMAIN order (sort_array + sequential aggregate),
    // not sum(): IEEE addition is order-sensitive and this scalar decides
    // floor() boundaries — the engine-portable fold the oracle replicates.
    // |domains| is small by definition; the collect_list is bounded.
    val z = counts
      .agg(sort_array(collect_list(struct(
        col(domainCol).cast("string").as("d"),
        pow(col("n_domain").cast("double"), lit(alpha)).as("w")))).as("ws"))
      .select(aggregate(transform(col("ws"), x => x("w")), lit(0.0d),
        (a, v) => a + v).as("__z"))
    val quotas = counts.crossJoin(broadcast(z))
      .withColumn("quota", least(col("n_domain"),
        floor(lit(k.toDouble) * pow(col("n_domain").cast("double"), lit(alpha))
          / col("__z")).cast("long")))
      .select(col(domainCol), col("n_domain"), col("quota"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(domainCol))
      .orderBy(ticket(col(keyCol), salt).asc, col(keyCol).asc)
    df.join(broadcast(quotas), Seq(domainCol))
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= col("quota"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much its HASHED unigram profile looks like a small
    * TARGET domain rather than the raw corpus —
    * weight(doc) = Σ_buckets c_doc(b) · [ln p̂_target(b) − ln p̂_raw(b)]
    * with add-1-smoothed bucket distributions over `dim` md5 buckets (the
    * same CountMin row-0 bucket x64's hashed-TF uses, so the oracle
    * re-derives every bucket). Docs in the target side are scored too
    * (they rank high by construction — callers exclude them when
    * selecting pre-training data).
    *
    * Scale shape: one token explode feeding three hash aggregates
    * (target-bucket counts, raw-bucket counts, per-(doc,bucket) counts);
    * the bucket tables are `dim` rows — broadcast — and the per-doc score
    * folds in BUCKET order (sort_array + sequential aggregate, the x50
    * contract) so the IEEE sum is engine-portable. No shuffle beyond the
    * aggregations; hashing needs no vocabulary, which is the point of
    * DSIR's hashed features at corpus scale.
    *
    * The deterministic engine-portable variant of DSIR's final step is
    * top-k by weight (the paper adds Gumbel noise for a soft resample;
    * seeded noise is not portable across engines, and the ranking is the
    * operator under test).
    */
  def dsirWeights(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, isTarget: Column,
      dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = graft.engine.CacheScope.persistTracked(
      df.select(col(idCol).as("id"), isTarget.as("__t"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
        .select(col("id"), col("__t"),
          graft.functions.CountMin.bucketCol(0, col("term"), dim).as("b")))
    // BOTH bucket distributions from ONE aggregate over the token table
    // (conditional count for the target side) — half the shuffles and one
    // scalar collect instead of two
    val counts = graft.engine.CacheScope.persistTracked(
      toks.groupBy(col("b")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr")))
    val tot = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr")).head()
    val (nt, nr) = (tot.getAs[Long]("nt"), tot.getAs[Long]("nr"))
    // full bucket spine: an unseen bucket still carries its add-1 smoothed
    // mass log(1/(N+dim)) — folding it to 0 would be a different (wrong)
    // distribution, not smoothing
    val spine = df.sparkSession.range(dim).select(col("id").as("b"))
    val lr = spine.join(counts, Seq("b"), "left")
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
            lit((nt + dim).toDouble)) -
          log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
            lit((nr + dim).toDouble))).as("ratio"))
    toks.groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("b"), col("c"), col("ratio"))))
        .as("bs"))
      .select(col("id"),
        aggregate(transform(col("bs"), x => x("c").cast("double") * x("ratio")),
          lit(0.0d), (a, v) => a + v).as("weight"))
  }
}

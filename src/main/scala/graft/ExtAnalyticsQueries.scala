package graft

import graft.engine.Ckpt.BarrierOps
import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Event/relational analytics, sampling/shaping and approx-swap extension queries — extracted verbatim from ExtensionQueries in the
  * r14 per-family split; shared helpers live in
  * [[ExtQueriesBase]] (self-type), the aggregated maps in
  * [[ExtensionQueries]]. */
private[graft] trait ExtAnalyticsQueries { this: ExtQueriesBase =>

  private[graft] def analyticsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // x12: multimodal binary-column pipeline — partition-batched decode
    // (STUBBED codec, real plumbing; graft.multimodal)
    "x12_multimodal_decode" -> ((s, dir) =>
      graft.multimodal.Multimodal
        .decodePipeline(s, table(s, dir, "documents"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("n_bytes"))
        .orderBy(col("media_id"))),
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
    // x121: EWMA-smoothed daily event rate — the discrete-recursion
    // smoother (s = 0.3·x + 0.7·s — x101 weights by continuous time
    // distance; this is the per-tick recursion dashboards use). The fold
    // runs over the BOUNDED day axis per type (collect_list is #days
    // long, never rows), seeded with day 1's count on both engines.
    "x121_ewma_daily" -> ((s, dir) =>
      ewmaOverDaily(Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))),
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
          .ckpt() // consumers: totals + the count-of-counts
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
  )

  private[graft] def analyticsOracles: Map[String, String] = Map(
    // the naive global rank over the same md5-ticket order — the exact
    // truth the bucketed two-level rank must reproduce; `div`/`%` are
    // integer on both engines (DuckDB `//`)
    "x98_epoch_shards" ->
      ("WITH r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY " +
        "md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) " +
        "AS epoch_rank FROM documents) " +
        "SELECT doc_id, epoch_rank, epoch_rank // 100 AS shard, " +
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
    "x12_multimodal_decode" ->
      ("SELECT doc_id AS media_id, " +
        "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' " +
        "ELSE 'webm' END AS format, " +
        "CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width, " +
        "CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height, " +
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS INTEGER) AS channels, " +
        "octet_length(encode(text)) AS n_bytes " +
        "FROM documents ORDER BY media_id"),
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
    // identical min-timestamp chain: stage i joins stage i-1's
    // first-completion times and keeps strictly-later events. The
    // STREAMING funnel (x77) shares this oracle — its sorted stateful
    // scan advances along exactly the same chain
    "x75_funnel" -> funnelSql,
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
    "x28_bucketed_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    // same (ts, event_id) lead ordering, same per-cur window normalizer
    "x111_markov_transitions" ->
      ("WITH s AS (SELECT event_type AS cur_type, lead(event_type) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), " +
        "g AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT cur_type, next_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur_type), 6) AS p " +
        "FROM g ORDER BY cur_type, next_type"),
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
    // same per-key aggregates, the same count-of-counts cumulative p99
    // pick (SHARED SkewP99RankSql) — every statistic an exact integer
    "x197_skew_audit" -> skewAuditOracle,
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
    // quantile_cont ≡ percentile, identical rounding
    "x249_value_slo" ->
      ("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |  round(quantile_cont(value, 0.5), 6) AS p50,
         |  round(quantile_cont(value, 0.95), 6) AS p95,
         |  round(quantile_cont(value, 0.99), 6) AS p99,
         |  round(max(value), 6) AS max_value
         |FROM events GROUP BY event_type
         |ORDER BY event_type""".stripMargin.replace("\n", " ")),
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
  )
}

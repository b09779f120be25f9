package graft.operators

import graft.engine.Ckpt.BarrierOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over the event stream — the two classic
  * product-analytics operators a cube engine is usually asked for next
  * (and the batch mirror of the sessionize/as-of family):
  *
  *  - [[funnel]]: how many users progressed through stage₀ → stage₁ → …
  *    where stage i counts only events STRICTLY AFTER the user's
  *    first-completion time of stage i−1 (first-touch funnel — the
  *    min-timestamp chain makes it deterministic and oracle-exact);
  *  - [[retention]]: day-granular cohort retention — users bucketed by
  *    first-activity day, counted once per (cohort day, day offset).
  *
  * Scale shape: everything keys on user_id — per-stage aggregates are
  * map-side combined, the stage joins are equi-joins on user_id (the
  * funnel table shrinks monotonically per stage, so later joins
  * broadcast under AQE), and retention's distinct is on (user, day) —
  * bounded by activity, not event volume. No windows over unbounded
  * partitions, no driver loops over data.
  */
object EventAnalytics {

  /** One row per stage: (stage_idx, stage, n_users). Each stage's
    * per-user first-completion frame is persist-tracked because stage
    * i+1's join re-reads it — without the barrier the whole prefix chain
    * would recompute per stage count. `withinMinutes` (opt-in) is the
    * CONVERSION-WINDOW variant: stage i must land within that many
    * minutes of stage i−1's first completion (the chain still follows
    * first-touch minima, so a window missed at the first opportunity is
    * missed — the standard product-analytics semantics).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      withinMinutes: Option[Int] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var cur: DataFrame = null
    val frames = stages.zipWithIndex.map { case (st, i) =>
      val evs = events.filter(col(typeCol) === st)
      cur = graft.engine.CacheScope.persistTracked(
        if (i == 0)
          evs.groupBy(col(userCol).as("user_id"))
            .agg(min(col(tsCol)).as("t"))
        else {
          val gated = evs
            .select(col(userCol).as("user_id"), col(tsCol).as("ts"))
            .join(cur, Seq("user_id"))
            .filter(col("ts") > col("t"))
          val windowed = withinMinutes.fold(gated)(w => gated.filter(
            unix_micros(col("ts")) - unix_micros(col("t")) <= w * 60000000L))
          windowed.groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        })
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"),
          col("n_users"))
    }
    frames.reduce(_.unionByName(_)).orderBy(col("stage_idx"))
  }

  /** Multi-touch attribution: credit each conversion's value to the touch
    * events (e.g. view/click) that preceded it within a lookback window —
    * the third classic of the product-analytics triad (funnel, retention,
    * attribution). Two models in one frame:
    *
    *  - `last_touch`: the whole conversion goes to the latest preceding
    *    touch (ties broken by event id — deterministic);
    *  - `linear`: value and conversion count split evenly across ALL
    *    touches in the window (fractional credit).
    *
    * Output: (model, channel, n_conv, value_sum) — n_conv is DOUBLE
    * because linear credit is fractional.
    *
    * Determinism across engines: per-credit amounts are rounded
    * half-away to 6 digits and accumulated as DECIMAL(18,6) — decimal
    * sums are order-independent, so Spark and the SQL oracle agree to
    * the last digit no matter the partitioning (the same trick as the
    * cube money sums, SparkEntry.exactSumSql).
    *
    * Scale shape: one equi-join on user_id (conversions × touches, both
    * pre-filtered by type before the shuffle), bounded fan-out (touches
    * within the lookback window per conversion), then per-conversion
    * windows partitioned by conversion id — never by user or globally —
    * and one final small aggregate on channel. The candidate frame is
    * persist-tracked because both models read it.
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, valueCol: String, idCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackHours: Int = 72): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user_id"), col(tsCol).as("t_ts"),
        col(idCol).as("t_id"), col(typeCol).as("channel"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("user_id"), col(tsCol).as("c_ts"),
        col(idCol).as("c_id"), col(valueCol).as("value"))
    // pair through the bucketized interval join, NOT a bare per-user
    // join + window filter: the bare join materializes every (conv,
    // touch) pair in the user's WHOLE history before the 72 h filter —
    // at production time ranges that is years of touches per conversion.
    // Bucket width = the lookback, so each conversion's window spans ≤ 2
    // buckets and pairing work is bounded by in-window density (the
    // workload-inherent candidate count), not by history length. Strict
    // t_ts < c_ts becomes hi = c_micros − 1 (timestamps are integral
    // micros, so the closed bound is exact).
    val lookbackMicros = lookbackHours * 3600000000L
    val cand = graft.engine.CacheScope.persistTracked(
      RangeJoin.intervalJoin(
        touches.withColumn("__p", unix_micros(col("t_ts"))),
        convs.withColumn("__lo", unix_micros(col("c_ts")) - lookbackMicros)
          .withColumn("__hi", unix_micros(col("c_ts")) - 1L),
        Seq("user_id"), "__p", "__lo", "__hi", bucketWidth = lookbackMicros)
        .drop("__p", "__lo", "__hi"))
    // order-independent accumulation: round each credit half-away to 6
    // digits, sum as DECIMAL(18,6)
    def dec(c: Column): Column =
      graft.functions.EngineMath.roundAway(c, 6).cast("decimal(18,6)")
    def out(model: String, nConv: Column, valueSum: Column): DataFrame => DataFrame =
      _.groupBy(col("channel"))
        .agg(sum(nConv).as("nc"), sum(valueSum).as("v"))
        .select(lit(model).as("model"), col("channel"),
          graft.functions.EngineMath.roundAway(col("nc").cast("double"), 4).as("n_conv"),
          graft.functions.EngineMath.roundAway(col("v").cast("double"), 2).as("value_sum"))
    val wLast = Window.partitionBy(col("c_id"))
      .orderBy(col("t_ts").desc, col("t_id").desc)
    val lastTouch = out("last_touch", dec(lit(1.0)), dec(col("value")))(
      cand.withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1))
    val wN = Window.partitionBy(col("c_id"))
    val linear = out("linear", dec(lit(1.0) / col("n")), dec(col("value") / col("n")))(
      cand.withColumn("n", count(lit(1)).over(wN)))
    lastTouch.unionByName(linear).orderBy(col("model"), col("channel"))
  }

  /** Top-k session paths: sessionize with the SAME gap rule as
    * `StreamOps.sessionizeBatch` (micros-exact, (ts, event_id) total
    * order), concatenate each session's event types in order, count
    * identical paths, keep the k most frequent (ties broken by path —
    * deterministic page). The per-session ordered concat is
    * `array_sort(collect_list(struct(ts, event_id, type)))` — structs
    * sort lexicographically by field order, so the path is exactly the
    * session's event order regardless of partitioning.
    *
    * Scale shape: a window keyed on user_id, a (user, session) group, a
    * path group, then TakeOrdered for the top-k (per-partition heaps +
    * a k-row driver merge — never a global sort materialization). All
    * shuffles are keyed; nothing quadratic, no unbounded state.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      k: Int = 20): DataFrame = {
    val paths = sessionTagged(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Events with the x21 gap-rule session id attached — the ONE session
    * definition every sessionized operator shares (paths, sequential
    * rules), so the gap semantics cannot drift between them. The window
    * is user-partitioned; epoch-micros arithmetic (unix_timestamp would
    * truncate sub-second gaps straddling the boundary).
    */
  def sessionTagged(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sequential association rules (A then B within a session): for each
    * ordered type pair, the number of sessions where A's FIRST occurrence
    * precedes B's, and the confidence against sessions containing A —
    * the ORDER-aware complement to the co-occurrence rules (x133), which
    * cannot distinguish "browse→buy" from "buy→browse".
    *
    * Scale shape: one session window, one (session, type) first-
    * occurrence reduction (row_number, partitioned), then a per-session
    * equi-join whose fan-out is bounded by |types|² per session — never
    * event-pair quadratic. The type-pair result is |types|² cells; the
    * antecedent totals broadcast.
    */
  def sequentialRules(events: DataFrame, gapMinutes: Int = 30,
      minSupport: Long = 5, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint, not persist: firsts appears THREE times in one
    // plan (both self-join sides + the antecedent totals) and a persisted
    // frame loses cache substitution on re-aliased occurrences
    // (DeduplicateRelations — see Ranks.scala's note)
    val firsts = sessionTagged(events, gapMinutes)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("session_seq"),
          col("event_type")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("session_seq"), col("event_type"),
        unix_micros(col("ts")).as("fts"), col("event_id").as("fid"))
      .ckpt()
    val ordered = firsts.as("x").join(firsts.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.session_seq") === col("y.session_seq") &&
          col("x.event_type") =!= col("y.event_type") &&
          (col("x.fts") < col("y.fts") ||
            (col("x.fts") === col("y.fts") && col("x.fid") < col("y.fid"))))
      .groupBy(col("x.event_type").as("antecedent"),
        col("y.event_type").as("consequent"))
      .agg(count(lit(1)).as("n_ordered"))
    val na = firsts.groupBy(col("event_type").as("antecedent"))
      .agg(count(lit(1)).as("n_a"))
    ordered.join(broadcast(na), Seq("antecedent"))
      .filter(col("n_ordered") >= minSupport)
      .withColumn("confidence", graft.functions.EngineMath.roundAway(
        expr("CAST(n_ordered AS DOUBLE) / n_a"), 6))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(k)
      .select(col("antecedent"), col("consequent"), col("n_a"),
        col("n_ordered"), col("confidence"))
  }

  /** Event-rate anomaly detection: bucket events per (type, hour), flag
    * buckets whose count deviates more than `z` sample standard
    * deviations from the TRAILING `trailing`-bucket baseline (frame
    * excludes the current bucket — no self-leakage; buckets with an
    * incomplete baseline are skipped). The monitoring primitive for a
    * 100 TB ingest: per-partition counts combine map-side, the window is
    * keyed by type and bounded by the frame, so state is O(types ×
    * trailing) regardless of volume.
    *
    * Determinism across engines: mean/variance come from INTEGER window
    * sums (Σn, Σn², count — exact in any order), and the final float
    * expressions mirror the oracle operand-for-operand, so the flagged
    * set is hash-exact, not approximately equal.
    */
  def rateAnomalies(events: DataFrame, trailing: Int = 24,
      z: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = events.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    val stats = buckets
      .withColumn("cnt", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
    val mean = col("s1").cast("double") / col("cnt")
    val varS = (col("cnt") * col("s2").cast("double") -
      col("s1").cast("double") * col("s1")) /
      (col("cnt") * (col("cnt") - lit(1.0)))
    stats.filter(col("cnt") >= trailing)
      .withColumn("mean", mean)
      .withColumn("sd", sqrt(greatest(varS, lit(0.0))))
      .filter(col("sd") > 0 && abs(col("n") - col("mean")) > lit(z) * col("sd"))
      .select(col("event_type"), col("bucket"), col("n"),
        graft.functions.EngineMath.roundAway(col("mean"), 4).as("mean"),
        graft.functions.EngineMath.roundAway(col("sd"), 4).as("sd"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** (cohort_day, day_offset, n_users) for offsets 0..maxOffset, ordered.
    * `n_users` counts a user once per active day (the (user, day)
    * distinct happens before the cohort join).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int = 7): DataFrame = {
    val days = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"))
      .distinct()
    val withCohort = graft.engine.CacheScope.persistTracked(days)
    val cohort = withCohort.groupBy(col("user_id")).agg(min(col("d")).as("c"))
    withCohort.join(cohort, Seq("user_id"))
      .select(col("c").as("cohort_day"),
        datediff(col("d"), col("c")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}

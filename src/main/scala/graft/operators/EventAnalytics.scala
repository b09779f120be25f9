package graft.operators

import org.apache.spark.sql.DataFrame
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

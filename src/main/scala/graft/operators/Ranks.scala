package graft.operators

import graft.engine.Ckpt.BarrierOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global order statistics: the bucket-prefix-sum rank device.
  *
  * A bare `row_number().over(Window.orderBy(...))` (or `ntile`) with no
  * partition forces Spark to sort the WHOLE frame in a single task — fine
  * at verify SF, fatal at 100 TB. This device produces the *identical*
  * integer rank with no rows-scale single-task stage:
  *
  *  1. bucket each row by a key that is MONOTONE in the leading order
  *     column (e.g. `floor(score * 1024)`), so bucket order ≡ value order;
  *  2. rank locally inside each bucket (`row_number` PARTITIONED by
  *     bucket — each task sorts only one bucket's population);
  *  3. prefix-sum the per-bucket counts (a window over #buckets rows —
  *     thousands, not billions) and broadcast the offsets back;
  *  4. global rank = offset-of-strictly-smaller-buckets + local rank.
  *
  * Same two-level shape as x98 (ticket-keyed) and x113 (value-keyed) in
  * [[graft.ExtensionQueries]]; this is the shared extraction those query
  * comments promised ("at 100 TB it rides the x113 bucket-prefix-sum
  * rank"). Losslessness is oracle-gated: the DuckDB side of every consumer
  * keeps the naive global `row_number`/`ntile`, so a hash match proves the
  * device reproduces the total order exactly.
  */
object Ranks {

  /** Adds column `out` = global row_number over `order` (1-based, exactly
    * `row_number().over(Window.orderBy(order: _*))`) via the bucket-
    * prefix-sum device.
    *
    * `bucket` MUST be monotone non-decreasing along the total order
    * `order` (ties allowed — ties are resolved by the local per-bucket
    * sort). Callers pick the granularity: more buckets → smaller local
    * sorts, but the offset window runs over #buckets rows, so keep it
    * ≪ rows (e.g. `floor(score * 1024)` for a bounded-range double).
    */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      out: String): DataFrame = {
    requireTempColsFree(df)
    // both passes (per-bucket counts, local ranks) consume the bucketed
    // frame in ONE plan — a persist would lose cache substitution on the
    // second occurrence (the a17 DeduplicateRelations trap, see
    // x196/PlanSpec), so the device localCheckpoints: the caller's
    // upstream (often an expensive scoring projection) is computed once,
    // and what materializes is only the narrow (order cols + payload) row
    val b = df.withColumn("__bkt", bucket.cast("long")).ckpt()
    val wLoc = Window.partitionBy(col("__bkt")).orderBy(order: _*)
    // the offset pass reduces to per-bucket COUNTS first (one hash agg),
    // so the exclusive prefix-sum window below runs over #buckets rows
    // (thousands), never over rows
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off"))
    b.withColumn("__lr", row_number().over(wLoc).cast("long"))
      .join(broadcast(offsets), "__bkt")
      .withColumn(out, col("__off") + col("__lr"))
      .drop("__bkt", "__lr", "__off")
  }

  /** Adds, for each (srcCol → outCol), the INCLUSIVE running sum of
    * srcCol along the total order `order` — the cumulative-sum analogue
    * of [[globalRowNumber]]: within-bucket running sums (a PARTITIONED
    * window), per-bucket totals prefix-summed exclusively (a #buckets-
    * rows window) and broadcast back as offsets. Same monotone-bucket
    * contract; sums stay in the source column's type family (LONG in —
    * LONG out), so callers needing overflow headroom widen before.
    */
  def globalCumSums(df: DataFrame, bucket: Column, order: Seq[Column],
      sums: Seq[(String, String)]): DataFrame = {
    requireTempColsFree(df)
    // localCheckpoint for the same two-consumers-one-plan reason as
    // globalRowNumber
    val b = df.withColumn("__bkt", bucket.cast("long")).ckpt()
    val wLoc = Window.partitionBy(col("__bkt")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = sums.map { case (c, _) => sum(col(c)).as(s"__t_$c") }
    val offsets = sums.foldLeft(
        b.groupBy(col("__bkt")).agg(totals.head, totals.tail: _*)) {
        case (d, (c, _)) =>
          d.withColumn(s"__o_$c",
            coalesce(sum(col(s"__t_$c")).over(wOff), lit(0L)))
      }
      .select(col("__bkt") +: sums.map { case (c, _) => col(s"__o_$c") }: _*)
    val local = sums.foldLeft(b) { case (d, (c, out)) =>
      d.withColumn(out, sum(col(c)).over(wLoc))
    }
    sums.foldLeft(local.join(broadcast(offsets), "__bkt")) {
        case (d, (c, out)) => d.withColumn(out, col(out) + col(s"__o_$c"))
      }
      .drop("__bkt" +: sums.map { case (c, _) => s"__o_$c" }: _*)
  }

  /** The device's scratch columns would silently shadow (and be dropped
    * with) caller columns of the same name — fail loudly instead.
    */
  private def requireTempColsFree(df: DataFrame): Unit = {
    val clash = df.columns.filter(c =>
      c == "__bkt" || c == "__lr" || c == "__off" ||
        c.startsWith("__o_") || c.startsWith("__t_") || c == "__n")
    require(clash.isEmpty,
      s"Ranks device scratch column(s) ${clash.mkString(", ")} already " +
        "exist in the input — rename them before calling the device")
  }

  /** Exact `ntile(k)` bucket for a row with global rank `rk` (1-based)
    * out of `nn` rows — the closed form of SQL ntile's "first (nn mod k)
    * buckets get one extra row" contract, so a precomputed scale-safe
    * rank replaces the ntile window with per-row integer arithmetic.
    * When nn < k the second branch divides by zero, but the first branch
    * then covers every rank (rem·1 = nn ≥ rk), so it is never taken.
    */
  def ntileOfRank(rk: String, nn: String, k: Int): Column =
    expr(s"CASE WHEN $rk <= ($nn % $k) * ($nn div $k + 1) " +
      s"THEN ($rk - 1) div ($nn div $k + 1) + 1 " +
      s"ELSE ($nn % $k) + ($rk - ($nn % $k) * ($nn div $k + 1) - 1) " +
      s"div ($nn div $k) + 1 END")
}

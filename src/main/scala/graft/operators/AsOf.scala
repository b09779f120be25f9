package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent right
  * row with `rightTime <= leftTime` within the same key partition — the
  * feature-engineering staple ("state as of the event"): last model
  * checkpoint before a sample, last purchase before a click, latest
  * config before a job.
  *
  * Spark-first plan (a naive formulation would be a range theta-join —
  * O(n·m) per key): UNION both sides tagged, sort each key partition by
  * (time, right-first-at-ties), and carry the latest right payload forward
  * with `last(ignoreNulls) OVER (rows unbounded preceding)`. That is ONE
  * shuffle on the key + one sort — the same cost class as a groupBy, and
  * exactly how a 100 TB backfill wants to run (no broadcast, no
  * per-key driver loops; hot keys split by AQE).
  *
  * Right rows with duplicate (key, time) must be pre-deduplicated by the
  * caller (or the match would be nondeterministic — DuckDB's ASOF has the
  * same caveat); `latestPerKeyTime` does it deterministically.
  */
object AsOf {

  /** Deterministic dedup of the right side: one row per (keys, timeCol),
    * keeping the greatest tie-break column value.
    */
  def latestPerKeyTime(df: DataFrame, keys: Seq[String], timeCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy((keys :+ timeCol).map(col): _*)
      .orderBy(col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Left as-of join. Output = all left columns + the requested right
    * payload columns (null when no right row precedes the left row).
    *
    * @param keys       equi-partition columns (same names both sides)
    * @param leftTime   event-time column of `left`
    * @param rightTime  event-time column of `right`
    * @param payload    right columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Map[String, String]): DataFrame = {
    val keyCols = keys.map(col)
    val payloadStruct = struct(payload.toSeq.sortBy(_._1).map {
      case (src, dst) => col(src).as(dst)
    }: _*)
    val r = right.select(keyCols :+ col(rightTime).as("__t") :+
      lit(1).as("__isr") :+ payloadStruct.as("__p"): _*)
    val leftCols = left.columns.map(col)
    val l = left.select(leftCols :+ col(leftTime).as("__t") :+
      lit(0).as("__isr") :+ lit(null).cast(r.schema("__p").dataType).as("__p"): _*)
    // right-before-left at equal times → the <= (inclusive) asof semantics
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r.select(l.columns.map {
        case c if keys.contains(c) || c == "__t" || c == "__isr" || c == "__p" => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      }: _*), allowMissingColumns = false)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    val payloadCols = payload.toSeq.sortBy(_._1).map { case (_, dst) =>
      col("__asof").getField(dst).as(dst)
    }
    joined.filter(col("__isr") === 0)
      .select(leftCols ++ payloadCols: _*)
  }
}

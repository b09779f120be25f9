package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range (interval-containment) join: match each point row to
  * the interval rows containing it.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` predicate as a nested-loop /
  * cartesian join — O(n·m) work per key group, which dies at scale. The
  * standard rewrite: explode every interval into the fixed-width buckets
  * it covers, bucket each point, EQUI-join on (keys…, bucket), and filter
  * exact containment. Cost becomes one shuffle on small integer keys plus
  * per-bucket candidate pairs — linear-ish when `bucketWidth` is chosen
  * near the typical interval length (too small → interval explodes into
  * many rows; too large → buckets collect unrelated candidates).
  *
  * This composes with equi-keys (e.g. user_id) by prepending them to the
  * join key, which also keeps bucket hot-spots partitioned.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows with lo <= point <= hi (both
    * inclusive), equi-matching `keys` first. All columns are numeric
    * (cast timestamps to epoch first). Output: all point columns + all
    * interval columns except its key copies.
    *
    * @param bucketWidth bucket size in the value's unit; pick ≈ the median
    *   interval length
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pBucket = floor(col(pointCol) / bucketWidth)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    val pt = points.withColumn("__bucket", pBucket)
    pt.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}

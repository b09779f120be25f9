package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle + fixed-size sharding — the "write the
  * training corpus as shuffled shards" step of a data pipeline. Every row
  * gets a global shuffle rank (its position in the epoch's permutation) and
  * a (shard, pos) assignment with exactly `shardSize` rows per shard (the
  * last shard ragged). The permutation is the md5-ticket order of
  * `seed:key` — reruns, engines, partitionings, and retries all produce the
  * identical epoch; a different seed is a fresh independent shuffle.
  *
  * Scale shape: a global rank is NOT a global sort. Rows are range-bucketed
  * by their ticket's leading hex digits (16^`bucketHexChars` buckets — the
  * ticket is uniform, so buckets are balanced by construction, no sampling
  * pass needed); per-bucket counts (a tiny aggregate) turn into exclusive
  * prefix offsets with a window over that 256/4096-row frame (bounded by
  * the bucket count, never by the data); offsets broadcast back and each
  * bucket ranks locally. One shuffle on the bucket key, one broadcast —
  * no single-partition stage touches row-scale data. Raise `bucketHexChars`
  * with corpus size (3 hex = 4096 buckets ≈ 25M rows/bucket at 100B rows).
  */
object Shards {

  def epochShards(df: DataFrame, keyCol: String, seed: String,
      shardSize: Int, bucketHexChars: Int = 2): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1,8], got $bucketHexChars")
    val ticketed = df
      .withColumn("__ticket",
        md5(concat(lit(s"$seed:"), col(keyCol).cast("string"))))
      .withColumn("__bucket",
        conv(substring(col("__ticket"), 1, bucketHexChars), 16, 10)
          .cast("long"))
    // Exclusive prefix offsets over the bucket-count frame. The unpartitioned
    // window is bounded by 16^bucketHexChars rows (bucket COUNTS, not rows),
    // so it is a scalar-scale stage at any corpus size.
    val offsets = ticketed
      .groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bucket"), col("__offset"))
    // Bucket = ticket prefix, so (bucket asc, ticket asc) IS the global
    // ticket order; md5 collisions (the only possible ties) break by key.
    val perBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__ticket"), col(keyCol))
    ticketed
      .join(broadcast(offsets), "__bucket")
      .withColumn("epoch_rank",
        col("__offset") + row_number().over(perBucket) - lit(1))
      .withColumn("shard", expr(s"epoch_rank div $shardSize"))
      .withColumn("pos", col("epoch_rank") % lit(shardSize.toLong))
      .drop("__ticket", "__bucket", "__offset")
  }
}

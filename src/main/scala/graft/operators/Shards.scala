package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle + fixed-size sharding — the "write the
  * training corpus as shuffled shards" step of a data pipeline. Every row
  * gets a global shuffle rank (its position in the epoch's permutation) and
  * a (shard, pos) assignment with exactly `shardSize` rows per shard (the
  * last shard ragged). The permutation is the md5-ticket order of
  * `seed:key` — reruns, engines, partitionings, and retries all produce the
  * identical epoch; a different seed is a fresh independent shuffle.
  * REQUIRES `keyCol` to be unique (a doc/sample id): duplicate keys get
  * identical tickets AND identical tie-break keys, so the relative order of
  * the duplicate-key rows — whose other columns may differ — would be
  * partition-order-dependent, breaking the determinism contract (an
  * oracle's `ORDER BY md5(...), key` carries the same latent assumption).
  * [[curriculumShards]] is the priority-ordered variant: rows order by a
  * bounded-cardinality priority band FIRST (curriculum learning's
  * easy-to-hard schedule), with the ticket shuffling within each band.
  *
  * Scale shape: a global rank is NOT a global sort. Rows are range-bucketed
  * by their ticket's leading hex digits (16^`bucketHexChars` buckets — the
  * ticket is uniform, so buckets are balanced by construction, no sampling
  * pass needed); per-bucket counts (a tiny aggregate) turn into exclusive
  * prefix offsets with a window over that 256/4096-row frame (bounded by
  * the bucket count — times the band count for the curriculum variant —
  * never by the data); offsets broadcast back and each bucket ranks
  * locally. One shuffle on the bucket key, one broadcast — no
  * single-partition stage touches row-scale data. Raise `bucketHexChars`
  * with corpus size (3 hex = 4096 buckets ≈ 25M rows/bucket at 100B rows).
  */
object Shards {

  def epochShards(df: DataFrame, keyCol: String, seed: String,
      shardSize: Int, bucketHexChars: Int = 2): DataFrame =
    ranked(df, keyCol, seed, shardSize, bucketHexChars, priority = Nil)

  /** Priority-banded epoch shards: global order is (priority band, ticket)
    * — descending band when `descending` (highest-quality first), the
    * deterministic shuffle within each band. `priority` must have BOUNDED
    * cardinality (quality deciles, difficulty bands — tens, not millions):
    * the offset frame is bands × buckets rows.
    */
  def curriculumShards(df: DataFrame, keyCol: String, priority: Column,
      descending: Boolean, seed: String, shardSize: Int,
      bucketHexChars: Int = 2): DataFrame =
    ranked(df, keyCol, seed, shardSize, bucketHexChars,
      priority = Seq(priority -> descending))

  /** Source-balanced interleave — the "domain interleaving" training-order
    * layout: rows are md5-ticket-shuffled WITHIN each source, then sources
    * are round-robin woven (position 0 of every source, then position 1,
    * …) so a sequential reader sees a balanced domain mixture from the
    * first shard onward, with ragged sources simply dropping out of the
    * rotation when exhausted. Output: (row, source, src_rank, pos) where
    * `pos` is the global interleave position (row_number over
    * (src_rank, source) − 1).
    *
    * Scale shape: NO global sort and NO per-source single-partition
    * window. The per-source rank uses the same bounded bucket-prefix-sum
    * device as [[epochShards]] (offsets frame = sources × 16^bucketHexChars
    * COUNT rows); the global position is then CLOSED-FORM from the tiny
    * per-source size table: pos(r, s) = Σ_{s'} min(r, n_{s'}) +
    * |{s' < s : n_{s'} > r}| — the number of (r', s') pairs
    * lexicographically before (r, s). Sizes are collected driver-side
    * (bounded: source is a low-cardinality domain label, tens not
    * millions — same bound [[curriculumShards]] places on bands) and
    * inlined as literals, so the position is a per-row expression: one
    * shuffle (bucket key) + one broadcast, total.
    *
    * Same keyCol-uniqueness requirement as [[epochShards]].
    */
  def interleaveBySource(df: DataFrame, keyCol: String, sourceCol: String,
      seed: String, bucketHexChars: Int = 2): DataFrame = {
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1,8], got $bucketHexChars")
    val ticketed = df.withColumn("__ticket",
        md5(concat(lit(s"$seed:"), col(keyCol).cast("string"))))
      .withColumn("__bucket",
        conv(substring(col("__ticket"), 1, bucketHexChars), 16, 10)
          .cast("long"))
    // per-(source, bucket) counts → exclusive prefix offsets WITHIN each
    // source (window over the bounded counts frame, partitioned by source
    // — sources × buckets rows, never data-scale)
    val offsets = ticketed
      .groupBy(col(sourceCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(Window.partitionBy(col(sourceCol))
            .orderBy(col("__bucket").asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(sourceCol), col("__bucket"), col("__offset"))
    // the tiny per-source size table, driver-collected like a broadcast
    // dim (bounded cardinality is the operator's contract)
    val sizes: Seq[(String, Long)] = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    require(sizes.nonEmpty, "interleaveBySource: empty input")
    val perBucket = Window.partitionBy(col(sourceCol), col("__bucket"))
      .orderBy(col("__ticket"), col(keyCol))
    val r = col("src_rank")
    // pos = Σ_{s'} min(r, n_{s'})  +  |{s' < s : n_{s'} > r}|
    val pos = sizes.map { case (_, n) => least(r, lit(n)) }
      .reduce(_ + _) +
      sizes.map { case (s, n) =>
        when(lit(s) < col(sourceCol) && lit(n) > r, 1L).otherwise(0L)
      }.reduce(_ + _)
    ticketed
      .join(broadcast(offsets), Seq(sourceCol, "__bucket"))
      .withColumn("src_rank",
        col("__offset") + row_number().over(perBucket) - lit(1))
      .withColumn("pos", pos)
      .drop("__ticket", "__bucket", "__offset")
  }

  private def ranked(df: DataFrame, keyCol: String, seed: String,
      shardSize: Int, bucketHexChars: Int,
      priority: Seq[(Column, Boolean)]): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1,8], got $bucketHexChars")
    val pNames = priority.indices.map(i => s"__p$i")
    val ticketed = priority.zip(pNames).foldLeft(
      df.withColumn("__ticket",
          md5(concat(lit(s"$seed:"), col(keyCol).cast("string"))))
        .withColumn("__bucket",
          conv(substring(col("__ticket"), 1, bucketHexChars), 16, 10)
            .cast("long"))) { case (d, ((c, _), n)) => d.withColumn(n, c) }
    val keyCols = pNames.map(col) :+ col("__bucket")
    // Exclusive prefix offsets over the (band ×) bucket-count frame. The
    // unpartitioned window is bounded by bands × 16^bucketHexChars rows
    // (COUNTS, not rows), so it is a scalar-scale stage at any corpus size.
    val orderCols = priority.zip(pNames).map { case ((_, desc), n) =>
      if (desc) col(n).desc else col(n).asc } :+ col("__bucket").asc
    val offsets = ticketed
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(Window.orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(keyCols :+ col("__offset"): _*)
    // Bucket = ticket prefix, so within a band (bucket asc, ticket asc) IS
    // the ticket order; md5 collisions (the only possible ties) break by key.
    val perBucket = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ticket"), col(keyCol))
    ticketed
      .join(broadcast(offsets), pNames :+ "__bucket")
      .withColumn("epoch_rank",
        col("__offset") + row_number().over(perBucket) - lit(1))
      .withColumn("shard", expr(s"epoch_rank div $shardSize"))
      .withColumn("pos", col("epoch_rank") % lit(shardSize.toLong))
      .drop(pNames ++ Seq("__ticket", "__bucket", "__offset"): _*)
  }
}

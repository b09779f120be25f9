package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the record-linkage
  * alternative to hash blocking: sort records by a blocking key, slide a
  * window of `w` positions, verify only window-adjacent pairs. Finds
  * near-dups whose fingerprints/hash-blocks differ (prefix-similar records)
  * at O(n·w) candidate pairs instead of O(n²).
  *
  * Scale shape: ranking is windowed WITHIN a block column (`lang` here) —
  * blocks are the standard multi-pass SNM device, and on Spark they make
  * the sort a partitioned window, not a single global partition; at
  * cluster scale each block sorts inside its own partitions
  * (`repartitionByRange` on (block, key) if a block outgrows one). The
  * window-offset join is an EQUI-join on (block, rank+k) — `sequence`
  * exploded to k=1..w probes, never a rank-inequality nested loop — and
  * the verify step (token-set Jaccard) touches only the O(n·w) candidate
  * rows.
  */
object Snm {

  /** Window-adjacent candidate pairs with token-Jaccard ≥ `threshold`.
    * Blocking key: the first `prefixLen` alphanumeric chars of the
    * lowercased text; rank within `blockCol` by (key, id).
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int, prefixLen: Int,
      threshold: Double): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(TextFunctions.tokens(col(textCol))).as("ts"),
      substring(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""),
        1, prefixLen).as("bk"))
    val ranked = keyed.withColumn("rnk",
      row_number().over(Window.partitionBy(col("blk"))
        .orderBy(col("bk"), col("id"))))
    val probes = ranked
      .withColumn("k", explode(expr(s"sequence(1, $w)")))
      .select(col("blk"), col("id").as("id_a"), col("ts").as("ts_a"),
        (col("rnk") + col("k")).as("tgt"))
    probes.join(ranked.select(col("blk"), col("id").as("id_b"),
        col("ts").as("ts_b"), col("rnk").as("tgt")), Seq("blk", "tgt"))
      .withColumn("jac",
        size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
          size(array_union(col("ts_a"), col("ts_b"))))
      .filter(col("jac") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        graft.functions.EngineMath.roundAway(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

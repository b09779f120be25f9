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
      threshold: Double): DataFrame =
    candidates(docs, idCol, textCol, blockCol, w, prefixLen)
      .withColumn("jac",
        size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
          size(array_union(col("ts_a"), col("ts_b"))))
      .filter(col("jac") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        graft.functions.EngineMath.roundAway(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  /** Window-adjacent candidate pairs WITHOUT the Jaccard verify or the
    * global order — the candidate-enumeration half of [[pairs]] alone,
    * for callers that sample or verify downstream (x165's calibration
    * samples an md5-ticket subset, so computing intersections and a
    * total order for every candidate first is wasted work). The
    * nonempty-union filter keeps the pair set IDENTICAL to
    * `pairs(threshold = 0.0)`: there the 0/0 Jaccard is NaN and fails
    * the ≥ 0 filter, here the same pairs drop explicitly.
    */
  def candidateIdPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int, prefixLen: Int): DataFrame =
    candidates(docs, idCol, textCol, blockCol, w, prefixLen)
      // union nonempty ⟺ either side nonempty — no union array built
      .filter(size(col("ts_a")) > 0 || size(col("ts_b")) > 0)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))

  /** Same window-adjacent candidates, CHARACTER-level verify: unit-cost
    * Levenshtein ≤ `maxDist` (catches typo-grade near-dups whose token
    * sets already diverge). Two prunings keep the verify k-bounded
    * instead of text-length-quadratic — measured 18 s → sub-second on
    * sf0.1's 25k candidates, and the only shape that survives long
    * documents at 100 TB:
    *  1. |len(a) − len(b)| ≤ k kills most candidates before any DP
    *     (the length gap lower-bounds the distance);
    *  2. the THRESHOLDED levenshtein (Spark's 3-arg form) runs the
    *     banded DP, O(k·min(m,n)) not O(m·n), returning −1 past k and
    *     the exact distance (≡ the full DP the DuckDB oracle runs)
    *     within it.
    */
  def editPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int, prefixLen: Int, maxDist: Int): DataFrame =
    candidates(docs, idCol, textCol, blockCol, w, prefixLen)
      .filter(abs(length(col("txt_a")) - length(col("txt_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("txt_a"), col("txt_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))

  /** The shared sorted-neighborhood candidate producer: rank within
    * `blockCol` by (first-`prefixLen`-alphanumeric key, id), join each row
    * to the `w` ranks above it — O(n·w) candidates, one window + one
    * equi-join on (block, rank).
    */
  private def candidates(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int, prefixLen: Int): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(textCol).as("txt"),
      array_distinct(TextFunctions.tokens(col(textCol))).as("ts"),
      substring(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""),
        1, prefixLen).as("bk"))
    val ranked = keyed.withColumn("rnk",
      row_number().over(Window.partitionBy(col("blk"))
        .orderBy(col("bk"), col("id"))))
    val probes = ranked
      .withColumn("k", explode(expr(s"sequence(1, $w)")))
      .select(col("blk"), col("id").as("id_a"), col("ts").as("ts_a"),
        col("txt").as("txt_a"), (col("rnk") + col("k")).as("tgt"))
    probes.join(ranked.select(col("blk"), col("id").as("id_b"),
      col("ts").as("ts_b"), col("txt").as("txt_b"), col("rnk").as("tgt")),
      Seq("blk", "tgt"))
  }
}

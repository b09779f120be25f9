package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.6: "salting for skew").
  *
  * Where each tool applies at 100 TB:
  *  - plain `groupBy.agg(sum/count/avg)`: NO salting needed — Spark's
  *    partial aggregation combines map-side, so a hot group costs one
  *    final-stage row per map task, not a hot reducer.
  *  - skewed JOIN keys: AQE's skew-join split handles the sort-merge case
  *    at runtime. `saltedJoin` is the static fallback for when AQE cannot
  *    (broadcast-ineligible dimension under a streaming join, or state
  *    co-partitioning requirements).
  *  - `count_distinct` over a hot group: the distinct-expand shuffles
  *    (group, value) pairs, so ONE group with 10⁹ distinct values still
  *    lands its final merge on one reducer. `saltedCountDistinct` buckets
  *    the VALUE space (hash mod R), counts per (group, bucket), and sums —
  *    exact, because the buckets partition the values; the hot group's
  *    state is spread over R reducers.
  */
object Skew {

  /** Exact count-distinct with the value space split into `buckets`
    * hash-buckets per group. Null values are counted like countDistinct
    * does (ignored).
    */
  def saltedCountDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, buckets: Int, resultName: String = "n_distinct"): DataFrame = {
    val g = groupCols.map(col)
    val counted = df.filter(col(valueCol).isNotNull)
      .withColumn("__bucket", pmod(xxhash64(col(valueCol)), lit(buckets.toLong)))
      .groupBy(g :+ col("__bucket"): _*)
      .agg(countDistinct(col(valueCol)).as("__part"))
      .groupBy(g: _*)
      .agg(sum(col("__part")).as(resultName))
    // groups whose values are ALL null dropped out of the bucketed pass;
    // countDistinct reports them as 0 — restore for exact parity
    df.select(g: _*).distinct()
      .join(counted, groupCols, "left")
      .na.fill(0, Seq(resultName))
  }

  /** Inner equi-join with the big side salted: each small-side row is
    * replicated `salts` times (once per salt), the big side gets a
    * deterministic per-row salt, and the join runs on (key, salt) — a hot
    * key's rows spread across `salts` reducers instead of one. Exact same
    * rows as `big.join(small, keys)`; costs `salts`× the small side's
    * shuffle size (keep the small side small-ish — this is for when it is
    * too big to broadcast but a key is too hot to sort-merge).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val saltOfRow: Column = // deterministic spread: hash all key cols + a rotating component
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts.toLong))
    val bigS = big.withColumn("__salt", saltOfRow)
    val smallS = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    // Force the SHUFFLE join the salting exists for (r15): the planner
    // estimates the small side from its pre-explode file size, so the
    // `salts`×-exploded relation can still be picked for BROADCAST — the
    // driver then single-threadedly builds a hash relation of salts×|small|
    // rows (profiled at 10×: ~9 s of driver wall under a 15.5 s query with
    // only 6.5 s of executor time) and every executor holds salts copies of
    // every row, which defeats the operator's contract outright (salting is
    // for when the small side is too big to broadcast — broadcastable
    // inputs should take the plain broadcast join, not this operator). The
    // merge hint pins sort-merge on (key, salt): the hot key's rows land on
    // `salts` reducers, AQE's skew split still applies, rows unchanged.
    bigS.join(smallS.hint("merge"), keys :+ "__salt").drop("__salt")
  }
}

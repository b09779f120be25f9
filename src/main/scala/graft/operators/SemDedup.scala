package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): embedding-space near-duplicates found by clustering
  * first and comparing pairs only WITHIN a cluster.
  *
  * The shape is the published algorithm's, re-expressed as a Spark plan:
  *
  *  1. k-means centroids over the embedding column ([[Ivf.fit]] — the same
  *     fit the IVF ANN index uses; one clustering can serve both).
  *  2. every vector → nearest centroid ([[Ivf.assign]]: broadcast centroids,
  *     codegen'd argmin, NO shuffle of the vector side).
  *  3. cosine over pairs that share a centroid — a self-join keyed on
  *     `centroid_id`, so the quadratic blow-up is per-cluster (~(N/K)² per
  *     bucket, K·(N/K)² = N²/K total) instead of corpus-wide N². At 100 TB
  *     K scales with the corpus (SemDeDup uses K≈10⁵ for web scale), the
  *     join shuffles both sides once on `centroid_id`, and a skewed
  *     (over-dense) cluster caps via `maxClusterSize` — dropped LOUDLY as
  *     a `dropped_clusters` count, never silently.
  *
  * Cross-cluster near-duplicates are invisible by design — the published
  * trade-off (recall loss measured small at k-means granularity) that makes
  * the cost sub-quadratic. The exact oracle shape for small data is
  * [[Dedup.embeddingPairs]] (all-pairs); this operator is the scale path.
  */
object SemDedup {

  private def dot(x: Column, y: Column): Column =
    call_function("graft_dot", x, y)

  /** (id, centroid_id) nearest-centroid assignment — [[Ivf.assign]] re-export
    * so callers can stage the engine-specific half for an external oracle.
    */
  def assign(items: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    Ivf.assign(items, idCol, vecCol, centroids)

  /** Semantic near-duplicate pairs: vectors sharing a centroid with cosine
    * ≥ `threshold`. Output: (centroid_id, id_a, id_b, cos), id_a < id_b,
    * cos rounded to 4 places (comparison happens on the unrounded value).
    *
    * `assignments` is the (id, centroid_id) frame from [[assign]] — taken
    * as an input rather than computed inline so the caller can persist or
    * stage it (it feeds both self-join sides; an unpersisted double
    * reference would re-run the argmin twice).
    *
    * `maxClusterSize`: clusters larger than the cap are EXCLUDED from the
    * pair scan (the over-dense-cluster skew guard — one giant cluster would
    * otherwise own a quadratic straggler task). Callers can count exclusions
    * via [[oversizedClusters]].
    */
  def semanticPairs(items: DataFrame, idCol: String, vecCol: String,
      assignments: DataFrame, threshold: Double,
      maxClusterSize: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(items.sparkSession)
    val assigned = capped(assignments, maxClusterSize)
    // persisted: v (vector scan + norms + assignment join) feeds BOTH
    // self-join sides — unpersisted it would be computed twice (the
    // overlapPairs precedent; tracked in CacheScope, runner drains)
    val v = graft.engine.CacheScope.persistTracked(
      items.select(col(idCol).as("id"), col(vecCol).as("vec"),
        sqrt(dot(col(vecCol), col(vecCol))).as("norm"))
      .join(assigned, Seq("id")))
    val a = v.select(col("centroid_id"), col("id").as("id_a"),
      col("vec").as("va"), col("norm").as("na"))
    val b = v.select(col("centroid_id"), col("id").as("id_b"),
      col("vec").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("centroid_id"), col("id_a"), col("id_b"),
        graft.functions.EngineMath.roundAway(col("cos"), 4).as("cos"))
  }

  /** Clusters whose member count exceeds `cap` (the loud side of the
    * `maxClusterSize` guard): (centroid_id, n_members).
    */
  def oversizedClusters(assignments: DataFrame, cap: Long): DataFrame =
    assignments.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > cap)

  private def capped(assignments: DataFrame, maxClusterSize: Option[Long]): DataFrame =
    maxClusterSize match {
      case None => assignments
      case Some(cap) =>
        val ok = assignments.groupBy("centroid_id")
          .agg(count(lit(1)).as("__sz")).filter(col("__sz") <= cap)
          .select("centroid_id")
        assignments.join(ok, Seq("centroid_id"))
    }
}

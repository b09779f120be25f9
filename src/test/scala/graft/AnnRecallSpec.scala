package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Pq, Similarity}

/** Measures recall@10 of every approximate ANN path against the exact
  * brute-force top-10 (x10) at the production parameters the x11/x13/
  * x51/x52 queries use, and publishes the numbers into COVERAGE.md — the
  * ANN counterpart of the banding-recall artifact. The oracle rows prove
  * each path computes ITS OWN contract exactly; this artifact records how
  * much retrieval quality each speed/memory trade buys away.
  *
  * PQ distances are approximate (codebook reconstruction), so PQ/IVFxPQ
  * recall is inherently below the candidate-restricted exact paths —
  * the floor asserted here is "clearly above chance" (chance@10 over the
  * corpus is ~2% at sf0.01), while LSH/IVF must clear a real bar.
  */
class AnnRecallSpec extends SparkSpec {

  private final case class Row(sfName: String, method: String, recall: Double)

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("item_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def measure(sfName: String): Seq[Row] = {
    val dir = sf(sfName)
    val e = Tables.table(spark, dir, "embeddings")
      .withColumn("vec", transform(col("embedding"), x => x.cast("double")))
    val q = e.filter(col("vec_id") < 5)
    val brute = topkSet(Similarity.bruteForceTopK(
      e, "vec_id", "vec", q, "vec_id", "vec", k = 10))
    val centroids = Ivf.fit(e, "vec", k = 8, maxIter = 5)
    val cb = Pq.fit(e, "vec", dim = 64, m = 4, ksub = 16, maxIter = 5)
    val codes = graft.engine.CacheScope.persistTracked(
      Pq.encode(e, "vec_id", "vec", cb, dim = 64, m = 4))
    val cand = Ivf.assign(e, "vec_id", "vec", centroids)
      .join(Ivf.assignProbes(q, "vec_id", "vec", centroids, nProbe = 3)
        .select(col("query_id"), col("centroid_id")), Seq("centroid_id"))
      .select(col("query_id"), col("id"))
    def recallOf(approx: DataFrame): Double =
      (topkSet(approx) & brute).size.toDouble / brute.size
    val rows = Seq(
      Row(sfName, "hyperplane LSH (x11)", recallOf(
        Similarity.lshTopK(e, "vec_id", "vec", q, "vec_id", "vec", k = 10,
          probeRadius = Similarity.adaptiveProbeRadius(e.count())))),
      Row(sfName, "IVF nProbe=3/8 (x13)", recallOf(
        Ivf.topK(e, "vec_id", "vec", q, "vec_id", "vec", k = 10,
          centroids, nProbe = 3))),
      Row(sfName, "PQ ADC-only m=4 ksub=16", recallOf(
        Pq.topK(codes, cb, q, "vec_id", "vec", k = 10, dim = 64, m = 4))),
      Row(sfName, "PQ + exact re-rank (x51)", recallOf(
        Pq.topKRerank(codes, cb, e, "vec_id", "vec", q, "vec_id", "vec",
          k = 10, dim = 64, m = 4))),
      Row(sfName, "IVF×PQ ADC-only", recallOf(
        Pq.topKWithin(cand, codes, cb, q, "vec_id", "vec",
          k = 10, dim = 64, m = 4))),
      Row(sfName, "IVF×PQ + exact re-rank (x52)", recallOf(
        Pq.topKWithinRerank(cand, codes, cb, e, "vec_id", "vec",
          q, "vec_id", "vec", k = 10, dim = 64, m = 4))))
    graft.engine.CacheScope.drain()
    rows
  }

  test("ANN recall@10 vs brute force measured at sf0.01 and sf0.1; COVERAGE.md block refreshed") {
    val rows = measure("sf0.01") ++ measure("sf0.1")
    rows.foreach(r => info(f"${r.sfName} ${r.method}: recall@10 ${r.recall}%.2f"))
    // floors calibrated to the measured regime on the synthetic (near-
    // random) embeddings, where chance@10 is k/N = 0.02 (sf0.01) / 0.002
    // (sf0.1): IVF must clear the DedupSimilaritySpec bar, LSH its sieve
    // bar, and the PQ reconstruction-distance paths must beat chance by
    // >10x — the artifact's value is the RECORDED numbers, the floors
    // only catch a mechanism breaking
    rows.foreach { r =>
      // re-ranked paths are the shipping x51/x52 contract (bar 0.5);
      // ADC-only rows record the compressed-domain floor for the memory
      // trade; x52's re-rank is additionally capped by IVF's candidate
      // recall (nProbe=3/8), so it shares IVF's bar rather than x51's
      val floor =
        if (r.method.contains("x51")) 0.5
        else if (r.method.contains("x52")) 0.4
        else if (r.method.contains("ADC-only")) 0.05
        else if (r.method.contains("LSH")) 0.25 else 0.4
      assert(r.recall >= floor,
        f"${r.sfName} ${r.method}: recall ${r.recall}%.2f below floor $floor")
    }
    val path = Paths.get("COVERAGE.md")
    val begin = "<!-- ann-recall:begin -->"
    val end = "<!-- ann-recall:end -->"
    // generated rows stay OUT of stripMargin (it would eat their leading
    // table pipe)
    val table =
      s"""$begin
         |Measured by AnnRecallSpec against the exact brute-force top-10
         |(x10) at the production parameters of each query. PQ rows rank by
         |reconstruction distance, so their recall trades against the 64x
         |memory compression; the candidate-restricted exact paths (LSH,
         |IVF) trade only against pruning.
         |
         || sf | method | recall@10 |
         ||---|---|---|""".stripMargin + "\n" +
        rows.map(r => f"| ${r.sfName} | ${r.method} | ${r.recall}%.2f |")
          .mkString("\n") + s"\n$end"
    val current = new String(Files.readAllBytes(path), "UTF-8")
    val updated =
      if (current.contains(begin))
        current.substring(0, current.indexOf(begin)) + table +
          current.substring(current.indexOf(end) + end.length)
      else
        current + s"\n## Measured ANN recall (sf-scaled, spec-generated)\n\n$table\n"
    Files.write(path, updated.getBytes("UTF-8")): Unit
  }
}

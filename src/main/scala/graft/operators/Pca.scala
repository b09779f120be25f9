package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA over an embedding column — the whitening / decorrelation step a
  * vector pipeline runs before IVF/PQ indexing (correlated dims waste
  * codebook bits) and the "how many dims carry the variance" datacard
  * read.
  *
  * Scale shape: the ONLY rows-scale work is one pass accumulating the
  * d(d+1)/2 second-moment cells and the d first-moment cells — both
  * map-side combined, so the shuffle moves ~2·d² rows per task TOTAL,
  * independent of corpus size (d = 64 here → 2 080 cells). The
  * eigendecomposition runs on the DRIVER over the collected d×d
  * covariance (a fixed 32 KB — the same "fit is tiny, data is not"
  * split as QualityFilter's 4-parameter LBFGS), deterministic cyclic
  * Jacobi, and ships back as a k-row staged artifact (the x13
  * staged-model contract: the oracle consumes the artifact and
  * re-derives everything downstream independently).
  */
object Pca {

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric d×d
    * matrix: fixed sweep order (p < q row-major), fixed sweep count with
    * an early exit on off-diagonal mass, no data-dependent pivoting — the
    * same inputs produce bit-identical eigenpairs on any JVM.
    * Returns (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * DESC, ties broken by the post-sort column index (stable).
    */
  def jacobiEigen(m: Array[Array[Double]],
      sweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val raw = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val t = if (raw == 0.0) 1.0 else raw // theta == 0 → 45° rotation
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(j => Array.tabulate(d)(i => v(i)(j))).toArray)
  }

  /** Fixed-point scale for the moment sums: products/components are
    * quantized to 1e-9 and summed as exact DECIMAL(38,0) integers, so the
    * accumulated moments are independent of partition order and count —
    * a plain `sum(double)` can flip last-ulp bits between JVM runs, and a
    * single ulp at a micro-quantization boundary would change staged-
    * rotation hashes across otherwise-identical rounds. Integer sums are
    * associative exactly; the only (deterministic) approximation is the
    * 1e-9 quantization of each term.
    */
  private val MomentScale = 1e9

  /** Fit the top-`k` principal components of `vecCol` (array<double>,
    * uniform length). Returns the k-row artifact frame
    * (comp 1-based, eigval, trace, mu array, w array) — stage it for the
    * oracle; memoize it with [[Fitted]]. Deterministic ACROSS runs for a
    * given corpus (not just within one): see [[MomentScale]].
    */
  def fit(e: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = e.sparkSession
    // i ≤ j upper-triangle products per row; groupBy is map-side combined
    // so the shuffle carries d(d+1)/2 cells per task, not per row
    val pairs = e.select(explode(expr(
        s"flatten(transform($vecCol, (vi, i) -> " +
          s"transform(slice($vecCol, i + 1, size($vecCol) - i), " +
          s"(vj, j) -> struct(i AS i, i + j AS j, CAST(floor(vi * vj * " +
          s"${MomentScale.toLong}D + 0.5D) AS DECIMAL(38,0)) AS p))))")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("spp"), count(lit(1)).as("n"))
      .collect()
    val sums = e.select(posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(sum(expr(s"CAST(floor(v * ${MomentScale.toLong}D + 0.5D) " +
        "AS DECIMAL(38,0))")).as("sv"))
      .collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
    val d = sums.size
    require(d > 0 && k >= 1 && k <= d, s"bad pca dims d=$d k=$k")
    val n = pairs.collectFirst { case r if r.getInt(0) == 0 && r.getInt(1) == 0 =>
      r.getLong(3) }.getOrElse(0L)
    require(n > 1, s"pca needs > 1 vectors, got $n")
    val mu = Array.tabulate(d)(i => sums(i) / MomentScale / n)
    val cov = Array.ofDim[Double](d, d)
    pairs.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = r.getDecimal(2).doubleValue() / MomentScale / n - mu(i) * mu(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (evals, evecs) = jacobiEigen(cov)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val rows = (0 until k).map { c =>
      Row(c + 1L, evals(c), trace, mu.toSeq, evecs(c).toSeq)
    }
    val schema = StructType(Seq(
      StructField("comp", LongType, nullable = false),
      StructField("eigval", DoubleType, nullable = false),
      StructField("trace", DoubleType, nullable = false),
      StructField("mu", ArrayType(DoubleType, containsNull = false)),
      StructField("w", ArrayType(DoubleType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }
}

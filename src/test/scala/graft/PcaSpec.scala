package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Pins the driver-side Jacobi eigendecomposition (exactness properties a
  * staged-rotation oracle cannot check: the oracle consumes the artifact
  * verbatim, so THIS is where eigenpair validity is proven) and the x204
  * artifact's invariants on real data.
  */
class PcaSpec extends SparkSpec {

  test("jacobiEigen: A·v = λ·v, orthonormal vectors, trace preserved") {
    // fixed symmetric 4×4 with distinct eigenvalues
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (evals, evecs) = Pca.jacobiEigen(a)
    assert(evals.length == 4 && evecs.length == 4)
    // sorted desc
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // trace preserved
    assert(math.abs(evals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
    // residual ‖A·v − λ·v‖ small, per pair
    for (c <- 0 until 4) {
      val v = evecs(c)
      val av = Array.tabulate(4)(i => (0 until 4).map(j => a(i)(j) * v(j)).sum)
      val res = math.sqrt((0 until 4)
        .map(i => math.pow(av(i) - evals(c) * v(i), 2)).sum)
      assert(res < 1e-9, s"eigenpair $c residual $res")
      assert(math.abs((0 until 4).map(i => v(i) * v(i)).sum - 1.0) < 1e-9,
        s"eigvec $c not unit")
    }
    // pairwise orthogonal
    for (c1 <- 0 until 4; c2 <- c1 + 1 until 4) {
      val d = (0 until 4).map(i => evecs(c1)(i) * evecs(c2)(i)).sum
      assert(math.abs(d) < 1e-9, s"eigvecs $c1,$c2 dot $d")
    }
  }

  test("jacobiEigen is deterministic across calls") {
    val a = Array.tabulate(8, 8)((i, j) =>
      math.sin(i * 8 + j) + math.sin(j * 8 + i)) // symmetric by construction
    val (e1, v1) = Pca.jacobiEigen(a)
    val (e2, v2) = Pca.jacobiEigen(a)
    assert(e1.toSeq == e2.toSeq)
    assert(v1.map(_.toSeq).toSeq == v2.map(_.toSeq).toSeq)
  }

  test("x204 artifact: components capture descending, nonnegative variance" +
      " shares that sum ≤ 1; measured variance tracks the eigenvalue") {
    val rows = ExtensionQueries.queries("x204_pca_whitening")(spark, sf())
      .collect()
    assert(rows.length == 4)
    val shares = rows.map(_.getAs[Double]("explained_share"))
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
    assert(shares.sliding(2).forall(p => p(0) >= p(1) - 1e-9), "desc shares")
    assert(shares.sum <= 1.0 + 1e-9)
    rows.foreach { r =>
      val ev = r.getAs[Double]("eigval")
      val vp = r.getAs[Double]("var_proj")
      // population variance of the projection IS the eigenvalue (up to
      // micro-quantization of the projections)
      assert(math.abs(vp - ev) < 1e-3, s"var $vp vs eigval $ev")
    }
  }

  test("x205: ablating the positive class pins AUC to the 0.5 guard; " +
      "every other ablation stays near the full AUC") {
    val rows = ExtensionQueries.queries("x205_source_ablation")(spark, sf())
      .collect()
    assert(rows.length >= 2)
    val bySrc = rows.map(r => r.getAs[String]("source") -> r).toMap
    // excluding src0 removes every positive → single-class guard value
    assert(bySrc("src0").getAs[Double]("auc_excl") == 0.5)
    val full = rows.head.getAs[Double]("auc_full")
    rows.filter(_.getAs[String]("source") != "src0").foreach { r =>
      val excl = r.getAs[Double]("auc_excl")
      assert(math.abs(excl - full) < 0.2,
        s"${r.getAs[String]("source")}: $excl vs full $full")
      assert(math.abs(r.getAs[Double]("delta") - (excl - full)) <= 2e-6)
    }
  }
}

package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the standard dimensionality cut
  * before ANN indexing and the axis extractor behind embedding-drift
  * dashboards: fit learns the top-k principal components of the
  * corpus, project maps every row onto them. Sits beside the other
  * model-adjacent stages (k-means/IVF, quality classifier): the model
  * state is DIMENSION-bounded, never corpus-bounded.
  *
  * Scale shape: `fit` is one `treeAggregate` pass accumulating
  * (count, per-dim sum, d×d gram) — for d = 64 the gram is 32 KiB per
  * task, combined tree-wise, so driver state is O(d²) no matter the
  * corpus size; the eigen-solve (power iteration with deflation) runs
  * on the driver's d×d matrix in microseconds. `project` broadcasts
  * the components as array literals and evaluates codegen'd
  * higher-order functions (`zip_with`/`aggregate`) per row — zero
  * UDFs, zero shuffle, column-prunable.
  *
  * Determinism class: float-sum (like k-means/IVF training) — the
  * gram accumulation order varies with partitioning, so components
  * are stable to ~1e-12 but not bit-identical across repartitions;
  * the SIGN of each component is pinned (largest-|coordinate| entry
  * made positive) so downstream projections don't flip between fits.
  */
object Pca {

  /** mean + components (rows, unit length, sign-pinned) + their
    * eigenvalues (explained variance, descending).
    */
  case class PcaModel(mean: Array[Double],
                      components: Array[Array[Double]],
                      explained: Array[Double])

  def fit(df: DataFrame, embCol: String = "embedding", k: Int = 2,
          iters: Int = 100): PcaModel = {
    require(k >= 1, s"k >= 1: $k")
    val first = df.select(col(embCol)).head()
    val d = first.getSeq[Any](0).length
    require(k <= d, s"k <= dim: $k > $d")
    val rows = df.select(col(embCol)).rdd.map { r =>
      val s = r.getSeq[Any](0)
      val x = new Array[Double](s.length)
      var i = 0
      while (i < x.length) {
        x(i) = s(i).asInstanceOf[Number].doubleValue(); i += 1
      }
      x
    }
    val (n, sum, gram) = rows.treeAggregate(
      (0L, new Array[Double](d), new Array[Double](d * d)))(
      seqOp = { case ((cnt, s, g), x) =>
        var i = 0
        while (i < d) {
          s(i) += x(i)
          val xi = x(i); val base = i * d
          var j = 0
          while (j < d) { g(base + j) += xi * x(j); j += 1 }
          i += 1
        }
        (cnt + 1, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      })
    require(n > 1, s"need >= 2 rows to fit PCA, got $n")
    val mean = sum.map(_ / n)
    // covariance = E[xxT] - mean meanT
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        cov(i * d + j) = gram(i * d + j) / n - mean(i) * mean(j); j += 1
      }
      i += 1
    }
    // power iteration + deflation on the driver's d x d matrix
    def matVec(m: Array[Double], v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var r = 0
      while (r < d) {
        var s = 0.0; val base = r * d
        var c = 0
        while (c < d) { s += m(base + c) * v(c); c += 1 }
        out(r) = s; r += 1
      }
      out
    }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val comps = new Array[Array[Double]](k)
    val lambda = new Array[Double](k)
    val work = cov.clone()
    var c = 0
    while (c < k) {
      // deterministic start: unit vector at the largest diagonal entry
      var best = 0
      var bi = 1
      while (bi < d) { if (work(bi * d + bi) > work(best * d + best)) best = bi; bi += 1 }
      var v = Array.tabulate(d)(i => if (i == best) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val nv = matVec(work, v)
        val nn = norm(nv)
        if (nn == 0.0) it = iters // degenerate direction: keep v
        else { var i2 = 0; while (i2 < d) { nv(i2) /= nn; i2 += 1 }; v = nv; it += 1 }
      }
      val ev = {
        val mv = matVec(work, v)
        var s = 0.0; var i2 = 0
        while (i2 < d) { s += v(i2) * mv(i2); i2 += 1 }
        s
      }
      // pin the sign: largest-|coordinate| entry positive
      var big = 0
      var i3 = 1
      while (i3 < d) { if (math.abs(v(i3)) > math.abs(v(big))) big = i3; i3 += 1 }
      if (v(big) < 0) { var i4 = 0; while (i4 < d) { v(i4) = -v(i4); i4 += 1 } }
      comps(c) = v; lambda(c) = ev
      // deflate: work -= ev * v vT
      var r2 = 0
      while (r2 < d) {
        var c2 = 0
        while (c2 < d) { work(r2 * d + c2) -= ev * v(r2) * v(c2); c2 += 1 }
        r2 += 1
      }
      c += 1
    }
    PcaModel(mean, comps, lambda)
  }

  /** Append `outCol` = the row's centered projection onto each
    * component, as an array of k doubles. Codegen'd higher-order
    * functions over broadcast literal arrays — no UDF, no shuffle.
    */
  def project(df: DataFrame, model: PcaModel,
              embCol: String = "embedding",
              outCol: String = "pca"): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(embCol).cast("array<double>"), meanLit,
      (a, b) => a - b)
    val projs = model.components.map { comp =>
      aggregate(zip_with(centered, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn(outCol, array(projs: _*))
  }
}

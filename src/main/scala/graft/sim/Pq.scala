package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.toDouble

/** IVF-PQ product-quantized ANN (Jégou et al. 2011; the FAISS
  * IVFPQ index) — the compression rung past [[Similarity.cosineTopKQuantized]]'s
  * int8 path: instead of one byte per COMPONENT (4x vs float32), PQ
  * stores one byte per SUBSPACE — a 64-dim vector becomes M = 8
  * bytes, 32x smaller than float32 — and queries score codes through
  * a per-query ADC lookup table (M adds per candidate).
  *
  * Scale design (100 TB of vectors):
  *  - the searchable artifact is [[encodeIndex]]'s (id, cell, code)
  *    frame — corpus vectors are read ONCE at index build and never
  *    again; the search path scans only 8-byte codes.
  *  - codebooks are M·K·dsub doubles (8·256·8 ≈ 130 KB) riding plans
  *    as reference objects; the per-subspace trainers run over ONE
  *    bounded hash-deterministic sample (the in-memory-train bound
  *    FAISS imposes), collected once.
  *  - the search join broadcasts the exploded (query × probe) side
  *    with its lut; candidate codes stream per-partition, no corpus
  *    shuffle (the [[Ivf.annIvf]] plan shape with codes in place of
  *    vectors).
  *
  * Recall contract: ADC ranks by approximate inner product (query ·
  * reconstruction), so PqSpec pins recall@k against the exact
  * [[Similarity.cosineTopK]] brute force — the d_ann_ivf contract.
  */
object Pq {

  /** Plain (non-spherical) L2 Lloyd over an in-memory point set —
    * sub-vectors are NOT unit vectors, so PQ trains by Euclidean
    * k-means: nearest by L2, mean update, no re-normalization.
    * Deterministic: init = first k points, empty clusters keep their
    * previous centroid, assignment ties to the lowest id.
    */
  private[graft] def lloydL2(pts: Array[Array[Double]], k: Int,
                             iters: Int): Array[Array[Double]] = {
    require(pts.length >= k, s"PQ sub-trainer: ${pts.length} points < k=$k")
    var cents = pts.take(k).map(_.clone)
    val dims = pts.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dims) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { best = c; bestD = d }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dims) { s(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Train the M per-subspace codebooks ([M][K][dims/M]) on a
    * hash-deterministic sample of L2-normalized vectors — one bounded
    * collect, then M driver-local Euclidean k-means. K <= 256 so
    * codes fit one byte per subspace.
    */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int,
            sampleMax: Int = 10000, idCol: String = "vec_id",
            vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(m >= 1, s"m must be >= 1: $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256]: $k")
    val sample = corpus
      .select(col(idCol).as("id"),
        graft.functions.VectorOps.l2normalize(toDouble(col(vecCol))).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleMax)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    Array.tabulate(m) { s =>
      lloydL2(sample.map(_.slice(s * dsub, (s + 1) * dsub)), k, iters)
    }
  }

  /** Train codebooks on RESIDUALS to the coarse centroids (Jégou et
    * al. 2011 §IV; FAISS `by_residual=true`, the production IVFADC
    * recipe): the same bounded hash-deterministic sample, with each
    * vector replaced by (v − coarse(nearest(v))) before the
    * per-subspace k-means. Residuals have the small per-cell variance
    * the codebook's K centroids can actually resolve — the quality
    * rung that holds recall at small nprobe as nlist grows.
    */
  def trainResidual(corpus: DataFrame, coarse: Array[Array[Double]],
                    m: Int, k: Int, iters: Int, sampleMax: Int = 10000,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(m >= 1, s"m must be >= 1: $m")
    require(k >= 1 && k <= 256, s"k must be in [1, 256]: $k")
    val sample = corpus
      .select(col(idCol).as("id"),
        graft.functions.VectorOps.l2normalize(toDouble(col(vecCol))).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleMax)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val resid = sample.map { v =>
      val c = coarse(graft.functions.CentroidKernels.nearestVec(v, coarse))
      Array.tabulate(v.length)(i => v(i) - (if (i < c.length) c(i) else 0.0))
    }
    Array.tabulate(m) { s =>
      lloydL2(resid.map(_.slice(s * dsub, (s + 1) * dsub)), k, iters)
    }
  }

  /** The compact searchable index: (id, IVF cell, M-byte PQ code) —
    * the ONE pass that reads corpus vectors; everything downstream
    * touches only codes. `byResidual` (default — FAISS IVFADC)
    * PQ-encodes the residual to the assigned coarse centroid, so the
    * codebook must come from [[trainResidual]]; pass false with a
    * [[train]] codebook for the raw-vector form.
    */
  def encodeIndex(corpus: DataFrame, coarse: Array[Array[Double]],
                  codebook: Array[Array[Array[Double]]],
                  idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  byResidual: Boolean = true): DataFrame = {
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"),
        graft.functions.VectorOps.l2normalize(toDouble(col(vecCol))).as("va"))
      .withColumn("cid", Ivf.nearestCentroid(col("va"), coarse))
    val enc =
      if (byResidual)
        graft.functions.PqOps.pqEncode(
          graft.functions.CentroidOps.centroidResidual(
            col("va"), col("cid"), coarse), codebook)
      else graft.functions.PqOps.pqEncode(col("va"), codebook)
    assigned.withColumn("code", enc).select("neighbor_id", "cid", "code")
  }

  /** ANN top-k over a prebuilt (id, cid, code) index: each query
    * probes its `nprobe` nearest IVF cells, builds its ADC lut ONCE
    * (the lut joins back by query_id — broadcasting it on the
    * exploded probe side would ship nprobe copies of the M·K-double
    * table per query), and candidates score in M table adds each.
    * Under `byResidual` the score adds the query-to-coarse-centroid
    * dot per probed cell: query · x ≈ query · c_cid + ADC(code) —
    * `byResidual` MUST match the index's encode mode. Same output
    * shape and tie contract as [[Ivf.annIvf]].
    */
  def searchPq(index: DataFrame, queries: DataFrame, k: Int,
               coarse: Array[Array[Double]],
               codebook: Array[Array[Array[Double]]], nprobe: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               byResidual: Boolean = true): DataFrame = {
    val kk = codebook(0).length
    val qn = queries
      .select(col(idCol).as("query_id"),
        graft.functions.VectorOps.l2normalize(toDouble(col(vecCol))).as("vb"))
    val probes = qn
      .withColumn("cid", explode(Ivf.probeCentroids(col("vb"), coarse, nprobe)))
      .withColumn("__coarse",
        if (byResidual)
          graft.functions.CentroidOps.centroidDot(col("vb"), col("cid"), coarse)
        else lit(0.0))
      .select("query_id", "cid", "__coarse")
    val luts = qn.select(col("query_id"),
      graft.functions.PqOps.pqLut(col("vb"), codebook).as("lut"))
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(luts), Seq("query_id"))
      .withColumn("sim", col("__coarse") +
        graft.functions.PqOps.pqAdc(col("code"), col("lut"), kk))
    Similarity.topKSelect(scored, k)
  }

  /** ATTRIBUTE-FILTERED ANN over a prebuilt index — the production
    * vector-search shape (lang = X, date > Y, license ∈ …): the
    * predicate's surviving ids semi-join the index BEFORE the probe
    * join, so non-matching codes never score and the returned top-k
    * is exact over the allowed subset (pre-filtering, not the
    * post-filter recall hole where matching neighbors fall outside
    * the unfiltered top-k). `allowed` carries the allowed ids in
    * `idCol` (derive it from any attribute table); the semi-join
    * exchanges ids-only rows — the index side is (id, cell, code),
    * already the narrowest frame in the system — and AQE broadcasts
    * the allowed side when the predicate is selective. Result ==
    * [[searchPq]] over an index built from ONLY the allowed vectors
    * (encode is per-row deterministic; PqSpec pins the equality).
    */
  def searchPqFiltered(index: DataFrame, queries: DataFrame, k: Int,
                       coarse: Array[Array[Double]],
                       codebook: Array[Array[Array[Double]]], nprobe: Int,
                       allowed: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       byResidual: Boolean = true): DataFrame = {
    val filtered = index.join(
      allowed.select(col(idCol).as("neighbor_id")).distinct(),
      Seq("neighbor_id"), "left_semi")
    searchPq(filtered, queries, k, coarse, codebook, nprobe,
      idCol, vecCol, byResidual)
  }

  /** Index build + search in one call (the d_ann_pq surface). */
  def annPq(corpus: DataFrame, queries: DataFrame, k: Int,
            coarse: Array[Array[Double]],
            codebook: Array[Array[Array[Double]]], nprobe: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding",
            byResidual: Boolean = true): DataFrame =
    searchPq(encodeIndex(corpus, coarse, codebook, idCol, vecCol, byResidual),
      queries, k, coarse, codebook, nprobe, idCol, vecCol, byResidual)
}

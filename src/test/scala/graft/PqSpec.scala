package graft

import org.apache.spark.sql.functions._

import graft.functions.PqKernels
import graft.sim.{Ivf, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  // exact-arithmetic codebook: 2 subspaces x 2 centroids x 2 dims,
  // all components multiples of 1/4 (every dist/dot is an exact
  // double, so kernel assertions are equality, not tolerance)
  private val cb: Array[Array[Array[Double]]] = Array(
    Array(Array(1.0, 0.0), Array(0.0, 1.0)),
    Array(Array(0.5, 0.5), Array(-0.5, 0.25)))

  private def arr(xs: Double*) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)

  test("encode: per-subspace argmin L2, ties to the lowest id") {
    val norms = PqKernels.centroidNorms(cb)
    assert(norms.map(_.toSeq).toSeq ==
      Seq(Seq(1.0, 1.0), Seq(0.5, 0.3125)))
    // sub0 nearest (1,0) -> 0; sub1 nearest (-0.5,0.25) -> 1
    assert(PqKernels.encode(arr(0.9, 0.1, -0.4, 0.3), cb, norms).toSeq ==
      Seq[Byte](0, 1))
    // equidistant in sub0 ((0.5,0.5) to both axes): tie -> id 0
    assert(PqKernels.encode(arr(0.5, 0.5, 0.5, 0.5), cb, norms).toSeq ==
      Seq[Byte](0, 0))
  }

  test("adc == dot(query, reconstruction), lut layout is [s*K + k]") {
    val norms = PqKernels.centroidNorms(cb)
    val q = arr(0.25, -0.5, 0.75, 0.25)
    val lut = PqKernels.lut(q, cb)
    // lut entries are sub-dots of the query against every centroid
    assert(lut.getDouble(0) == 0.25)          // q_sub0 . (1,0)
    assert(lut.getDouble(1) == -0.5)          // q_sub0 . (0,1)
    assert(lut.getDouble(2) == 0.75 * 0.5 + 0.25 * 0.5)
    assert(lut.getDouble(3) == 0.75 * -0.5 + 0.25 * 0.25)
    for (c0 <- 0 to 1; c1 <- 0 to 1) {
      val code = Array(c0.toByte, c1.toByte)
      val recon = PqKernels.reconstruct(code, cb)
      val qa = Array(0.25, -0.5, 0.75, 0.25)
      val want = (0 until 2).map(s =>
        qa(s * 2) * recon(s * 2) + qa(s * 2 + 1) * recon(s * 2 + 1)).sum
      assert(PqKernels.adc(code, lut, 2) == want)
    }
  }

  test("lloydL2: two obvious clusters converge to their means; deterministic") {
    val pts = Array(
      Array(0.0, 0.0), Array(10.0, 10.0), Array(0.2, 0.0),
      Array(10.0, 10.2), Array(0.0, 0.2), Array(9.8, 10.0))
    val c = Pq.lloydL2(pts, 2, 5)
    // init = first 2 points, which already separate the clusters
    assert(c(0).toSeq == Seq(0.2 / 3, 0.2 / 3))
    assert(c(1).toSeq == Seq(29.8 / 3, 30.2 / 3))
    assert(Pq.lloydL2(pts, 2, 5).map(_.toSeq).toSeq ==
      c.map(_.toSeq).toSeq)
  }

  test("train: shape (m, k, dims/m), deterministic, partition-invariant") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val cb1 = Pq.train(emb, m = 8, k = 4, iters = 2)
    val cb2 = Pq.train(emb.repartition(7), m = 8, k = 4, iters = 2)
    assert(cb1.length == 8 && cb1.forall(_.length == 4) &&
      cb1.forall(_.forall(_.length == 8)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  // clustered corpus (the IvfSpec fixture shape): `n` points around
  // `nCenters` seeded-random unit centers with small noise — the
  // regime PQ exists for. (On UNSTRUCTURED vectors — e.g. the sf0.001
  // embeddings table, whose top-5 neighbors sit at cos ≈ 0.3 — 32-bit
  // codes cannot rank neighbors and recall is legitimately near
  // chance; a numpy replica of this trainer reads 0.08-0.23 there.)
  private def synthetic(n: Int, dims: Int, nCenters: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nCenters) {
      val c = Array.fill(dims)(rnd.nextGaussian())
      val norm = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / norm).toFloat)
    }
    (0 until n).map { i =>
      val c = centers(i % nCenters)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
  }

  test("annPq recall vs brute force on clustered data; search touches only the code index") {
    val emb = synthetic(500, 64, 10, seed = 3L).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 12)
    val k = 5
    val coarse = Ivf.train(emb, 4, 2)
    // residual codebook for the default by-residual path (the FAISS
    // IVFADC recipe encodeIndex/searchPq now default to)
    val codebook = Pq.trainResidual(emb, coarse, m = 8, k = 16, iters = 3)
    // full probe isolates PQ quantization loss from IVF routing loss
    val ann = Pq.annPq(emb, queries, k, coarse, codebook, nprobe = 4)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    // cluster precision, not exact-set recall: a tight cluster's
    // members collapse to (near-)identical codes, so ADC ties and the
    // id tie-break pick SOME k same-cluster members — the exact-5 set
    // under 0.05-noise distinctions is beneath PQ's 32-bit resolution
    // by design. What PQ must get right is the cluster.
    assert(ann.length == 12 * k)
    val precision = ann.count { case (q, n, _) => n % 10 == q % 10 }
      .toDouble / ann.length
    assert(precision >= 0.95, s"same-cluster precision $precision")
    // ADC scores of same-cluster hits approximate the true in-cluster
    // cosine (~0.99): reconstruction quality, not just rank (measured
    // 0.85 — the 0.05-noise floor across 8 subspaces; chance is ~0)
    val meanSim = ann.map(_._3).sum / ann.length
    assert(meanSim > 0.8, s"mean ADC score $meanSim")
    // the prebuilt index answers identically (annPq == searchPq(encodeIndex))
    val idx = Pq.encodeIndex(emb, coarse, codebook)
    assert(idx.columns.toSeq == Seq("neighbor_id", "cid", "code"))
    val viaIdx = Pq.searchPq(idx, queries, k, coarse, codebook, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(viaIdx.toSeq == ann.map(r => (r._1, r._2)).toSeq)
    // compression: codes are m bytes
    val codeLen = idx.select(length(col("code"))).as[Int].head()
    assert(codeLen == 8)
  }

  test("residual encoding >= raw-vector precision at small nprobe") {
    // the regime by_residual exists for: restricted probes, clustered
    // corpus — residual codebooks resolve within-cell displacement the
    // raw codebook spends its K centroids spanning globally
    val emb = synthetic(500, 64, 10, seed = 11L).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 12)
    val k = 5
    val coarse = Ivf.train(emb, 8, 2)
    def precision(rows: Array[(Long, Long)]): Double =
      rows.count { case (q, n) => n % 10 == q % 10 }.toDouble / rows.length
    val raw = Pq.annPq(emb, queries, k, coarse,
        Pq.train(emb, m = 8, k = 16, iters = 3), nprobe = 2,
        byResidual = false)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val res = Pq.annPq(emb, queries, k, coarse,
        Pq.trainResidual(emb, coarse, m = 8, k = 16, iters = 3), nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(res.length == raw.length)
    assert(precision(res) >= precision(raw),
      s"residual ${precision(res)} < raw ${precision(raw)}")
    assert(precision(res) >= 0.95, s"residual precision ${precision(res)}")
  }

  test("searchPqFiltered == searchPq over an allowed-only index; results stay in the allowed set") {
    val emb = synthetic(500, 64, 10, seed = 5L).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    val allowed = emb.filter(col("vec_id") % 2 === 0).select("vec_id")
    val coarse = Ivf.train(emb, 4, 2)
    val cb = Pq.trainResidual(emb, coarse, m = 8, k = 16, iters = 2)
    val viaFilter = Pq.searchPqFiltered(
        Pq.encodeIndex(emb, coarse, cb), queries, 5, coarse, cb,
        nprobe = 4, allowed = allowed)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // encode is per-row deterministic, so an index built from ONLY the
    // allowed vectors carries the same (cid, code) rows — pre-filtered
    // search must return the identical exact-over-subset top-k
    val viaSubIndex = Pq.searchPq(
        Pq.encodeIndex(emb.join(allowed, Seq("vec_id"), "left_semi"),
          coarse, cb), queries, 5, coarse, cb, nprobe = 4)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaFilter == viaSubIndex)
    assert(viaFilter.nonEmpty)
    assert(viaFilter.forall(_._3 % 2 == 0), "a non-allowed id scored")
  }

  test("trainResidual: deterministic, partition-invariant, residual geometry") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val coarse = Ivf.train(emb, 4, 2)
    val cb1 = Pq.trainResidual(emb, coarse, m = 8, k = 4, iters = 2)
    val cb2 = Pq.trainResidual(emb.repartition(7), coarse, m = 8, k = 4, iters = 2)
    assert(cb1.length == 8 && cb1.forall(_.length == 4) &&
      cb1.forall(_.forall(_.length == 8)))
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq)
    // residual centroids sit near the origin (per-cell displacement)
    // when cells are real clusters — the clustered fixture, NOT the
    // unstructured embeddings table, where v − unit-centroid is O(1)
    val cemb = synthetic(500, 64, 10, seed = 7L).toDF("vec_id", "embedding")
    val cCoarse = Ivf.train(cemb, 10, 3)
    def meanNorm(cb: Array[Array[Array[Double]]]): Double = {
      val all = cb.flatten
      all.map(c => math.sqrt(c.map(x => x * x).sum)).sum / all.length
    }
    val resNorm = meanNorm(Pq.trainResidual(cemb, cCoarse, m = 8, k = 4, iters = 2))
    val rawNorm = meanNorm(Pq.train(cemb, m = 8, k = 4, iters = 2))
    assert(resNorm < rawNorm, s"residual $resNorm !< raw $rawNorm")
  }
}

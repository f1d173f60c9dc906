package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters around orthogonal axes
  private def clustered = (0 until 30).map { i =>
    val base = i % 3
    val eps = 0.01f * (i / 3)
    val v = Array.fill(3)(0.0f)
    v(base) = 1.0f
    v((base + 1) % 3) = eps
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("train: centroids are deterministic, normalized, one per cluster") {
    val c1 = Ivf.train(clustered, 3, 2, sampleMax = 100)
    val c2 = Ivf.train(clustered, 3, 2, sampleMax = 100)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // each centroid dominated by a distinct axis
    assert(c1.map(_.zipWithIndex.maxBy(_._1)._2).toSet.size == 3)
  }

  test("annIvf with nprobe=1 finds same-cluster neighbors; matches brute force on probed lists") {
    val df = clustered
    val cents = Ivf.train(df, 3, 2, sampleMax = 100)
    val ann = Ivf.annIvf(df, df.filter(col("vec_id") < 3), 2, cents, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(ann.nonEmpty)
    // same-cluster: neighbor_id % 3 == query_id % 3 for these tight clusters
    ann.foreach { case (q, n) => assert(n % 3 == q % 3, s"query $q got $n") }
    // full-recall case: nprobe = nlist degenerates to exact search
    val full = Ivf.annIvf(df, df.filter(col("vec_id") < 3), 2, cents, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineTopK(df, df.filter(col("vec_id") < 3), 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
  }

  test("listSizes partitions the corpus completely") {
    val df = clustered
    val cents = Ivf.train(df, 3, 2, sampleMax = 100)
    val sizes = Ivf.listSizes(df, cents)
      .select("n_vectors").as[Long].collect()
    assert(sizes.sum == 30)
  }

  // synthetic clustered corpus: `n` points in `dims` dims around
  // `nCenters` seeded-random unit centers with small noise
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

  test("hierarchical IVF trains nlist=20000 (past the flat sample bound) with recall parity") {
    val pts = synthetic(24000, 8, 300, seed = 42L)
    val df = pts.toDF("vec_id", "embedding")

    // the flat trainer REJECTS this nlist (its init needs nlist sample
    // vectors) — the exact wall trainHierarchical exists to pass
    val e = intercept[IllegalArgumentException](Ivf.train(df, 20000, 1))
    assert(e.getMessage.contains("sample smaller than nlist"))

    val idx = Ivf.trainHierarchical(df, nlist = 20000, iters = 1,
      minPointsPerCentroid = 1)
    assert(idx.nlist == 20000)
    assert(idx.nCoarse <= math.ceil(math.sqrt(20000)).toInt)
    idx.fine.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6) // unit centroids (or unit init points)
    }
    // deterministic
    val idx2 = Ivf.trainHierarchical(df, nlist = 20000, iters = 1,
      minPointsPerCentroid = 1)
    assert(idx.fine.map(_.toSeq).toSeq == idx2.fine.map(_.toSeq).toSeq)

    // ground truth, driver-side exact cosine over the generating points
    def normalizeD(v: Array[Float]) = {
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      if (n > 0) d.map(_ / n) else d
    }
    val normed = pts.map { case (id, v) => id -> normalizeD(v) }.toMap
    val queries = pts.take(12).map(_._1)
    val k = 10
    val truth: Map[Long, Set[Long]] = queries.map { q =>
      val qv = normed(q)
      q -> normed.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, v.zip(qv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
    def recall(res: Array[(Long, Long)]): Double = {
      val byQ = res.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      queries.map(q => (byQ.getOrElse(q, Set.empty) & truth(q)).size.toDouble / k)
        .sum / queries.size
    }

    val qDf = df.filter(col("vec_id") < 12)
    // equal probe budget: nprobe=48 fine lists on both paths; the flat
    // path pays O(nlist·dims) per assignment/probe, the hier path
    // O((nCoarse + cellFine)·dims)
    val flat = Ivf.annIvf(df, qDf, k, idx.fine, nprobe = 48)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hier = Ivf.annIvfHier(df, qDf, k, idx, nprobe = 48, nprobeCoarse = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val (rFlat, rHier) = (recall(flat), recall(hier))
    assert(rFlat > 0.5, s"flat recall $rFlat suspiciously low — fixture broken?")
    assert(rHier >= rFlat - 0.1, s"hier recall $rHier vs flat $rFlat")
  }

  test("two-level kernels: full coarse probe == flat probe; assignment lands in the nearest cell") {
    val pts = synthetic(2000, 6, 40, seed = 7L)
    val df = pts.toDF("vec_id", "embedding")
    val idx = Ivf.trainHierarchical(df, nlist = 200, iters = 2,
      minPointsPerCentroid = 4)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val probe = pts.take(20).map { case (_, v) =>
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      new GenericArrayData(d.map(_ / n))
    }
    probe.foreach { v =>
      // probing EVERY coarse cell degenerates to the flat top-nprobe
      val hier = graft.functions.CentroidKernels
        .probesTwoLevel(v, idx.coarse, idx.fine, idx.offsets, idx.nCoarse, 16)
        .toIntArray().toSeq
      val flat = graft.functions.CentroidKernels
        .probes(v, idx.fine, 16).toIntArray().toSeq
      assert(hier == flat)
      // assignment: global id within the nearest coarse cell's range
      val cid = graft.functions.CentroidKernels
        .nearestTwoLevel(v, idx.coarse, idx.fine, idx.offsets)
      val cell = graft.functions.CentroidKernels.nearestVec(
        (0 until v.numElements()).map(v.getDouble).toArray, idx.coarse)
      assert(cid >= idx.offsets(cell) && cid < idx.offsets(cell + 1))
    }
  }

  test("nearDupPairs finds exactly the high-cosine pairs") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.99f, 0.02f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}

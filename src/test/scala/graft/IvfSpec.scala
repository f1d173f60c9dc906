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

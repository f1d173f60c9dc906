package graft

import graft.sim.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("fit recovers a planted principal axis; components orthonormal, variance descending") {
    // 4-dim points: strong spread along axis1, weak along axis2
    val axis1 = Array(0.5, 0.5, 0.5, 0.5)
    val axis2 = Array(0.5, -0.5, 0.5, -0.5)
    val pts = (0 until 200).map { i =>
      val t = (i % 21) - 10.0        // -10..10 along axis1
      val u = ((i * 7) % 5) - 2.0    // -2..2 along axis2
      Array.tabulate(4)(j => (3.0 + t * axis1(j) + 0.3 * u * axis2(j)).toFloat)
    }
    val df = pts.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("id", "embedding")
    val m = Pca.fit(df, k = 2)
    assert(math.abs(cos(m.components(0), axis1)) > 0.999)
    assert(math.abs(cos(m.components(1), axis2)) > 0.999)
    assert(m.explained(0) > m.explained(1) && m.explained(1) > 0)
    // unit length + orthogonal + sign pinned (largest coord positive)
    m.components.foreach(c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    assert(math.abs(m.components(0).zip(m.components(1))
      .map { case (a, b) => a * b }.sum) < 1e-6)
    m.components.foreach(c => assert(c(c.map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0))
    // mean invariance: translating every point leaves components put
    val shifted = pts.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.map(x => x + 100f)) }.toDF("id", "embedding")
    val m2 = Pca.fit(shifted, k = 2)
    assert(math.abs(cos(m.components(0), m2.components(0))) > 0.9999)
  }

  test("project: centered dot products, first coordinate carries the variance") {
    val axis1 = Array(1.0, 0.0, 0.0, 0.0)
    val pts = (0 until 50).map { i =>
      Array[Float]((i - 25).toFloat, (i % 3 - 1).toFloat * 0.1f, 0f, 0f)
    }
    val df = pts.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("id", "embedding")
    val m = Pca.fit(df, k = 2)
    assert(math.abs(cos(m.components(0), axis1)) > 0.999)
    val proj = Pca.project(df, m).select("id", "pca")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(proj.size == 50 && proj.values.forall(_.length == 2))
    // hand-check one row: projection = (x - mean) . comp
    val x0 = pts(0).map(_.toDouble)
    val expect0 = x0.zip(m.mean).map { case (a, b) => a - b }
      .zip(m.components(0)).map { case (a, b) => a * b }.sum
    assert(math.abs(proj(0L)(0) - expect0) < 1e-9)
    val var0 = proj.values.map(p => p(0) * p(0)).sum
    val var1 = proj.values.map(p => p(1) * p(1)).sum
    assert(var0 > var1 * 10)
  }
}

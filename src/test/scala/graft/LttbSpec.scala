package graft

import org.apache.spark.sql.functions._

import graft.ops.Lttb

class LttbSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential implementation of the SAME bucket-average-anchor
    * variant, to pin the distributed plan's exact semantics.
    */
  private def lttbSeq(xs: Array[Double], ys: Array[Double], thr: Int): Seq[Int] = {
    val n = xs.length
    if (thr >= n || thr <= 2) return xs.indices
    val bs = (n - 2).toDouble / (thr - 2)
    val lastBucket = thr - 3
    val byBucket = (1 until n - 1).groupBy(i =>
      math.min(math.floor((i - 1) / bs).toInt, lastBucket))
    def bAvg(b: Int): (Double, Double) = {
      val is = byBucket(b)
      (is.map(xs).sum / is.size, is.map(ys).sum / is.size)
    }
    val picks = (0 to lastBucket).map { b =>
      val (px, py) = if (b == 0) (xs(0), ys(0)) else bAvg(b - 1)
      val (nx, ny) = if (b == lastBucket) (xs(n - 1), ys(n - 1)) else bAvg(b + 1)
      byBucket(b).maxBy(i =>
        (math.abs((px - nx) * (ys(i) - py) - (px - xs(i)) * (ny - py)), -i))
    }
    0 +: picks :+ (n - 1)
  }

  test("distributed LTTB matches the sequential variant exactly") {
    val xs = (0 until 200).map(_.toDouble).toArray
    val ys = xs.map(x => math.sin(x / 7) * 100 + (if (x.toInt % 37 == 0) 500 else 0))
    val df = xs.zip(ys).toSeq.toDF("x", "y")
    val got = Lttb.downsample(df, "x", "y", 20).select("x").as[Double].collect()
    val want = lttbSeq(xs, ys, 20).map(xs)
    assert(got.toSeq == want)
  }

  test("keeps first and last, output size == threshold") {
    val df = (0 until 1000).map(i => (i.toDouble, math.cos(i / 11.0))).toDF("x", "y")
    val got = Lttb.downsample(df, "x", "y", 50).select("x").as[Double].collect()
    assert(got.length == 50)
    assert(got.head == 0.0 && got.last == 999.0)
  }

  test("range-partitioned index path == single-window path") {
    val xs = (0 until 500).map(_.toDouble).toArray
    val ys = xs.map(x => math.sin(x / 5) * 50 + (if (x.toInt % 23 == 0) 300 else 0))
    val df = xs.zip(ys).toSeq.toDF("x", "y").repartition(7)
    val a = Lttb.downsample(df, "x", "y", 40).select("x").as[Double].collect()
    val b = Lttb.downsampleRangePartitioned(df, "x", "y", 40, numPartitions = 5)
      .select("x").as[Double].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("no-op when threshold >= n") {
    val df = (0 until 10).map(i => (i.toDouble, 1.0)).toDF("x", "y")
    assert(Lttb.downsample(df, "x", "y", 100).count() == 10)
  }
}

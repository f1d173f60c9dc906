package graft


import org.apache.spark.sql.functions._

import graft.ops.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // deterministic uniform-ish uncorrelated 2D points (no RNG)
  private def points = (0 until 20000).map { i =>
    (i.toLong, (i.toLong * 48271) % 99991, (i.toLong * 69621) % 99991)
  }.toDF("id", "x", "y")

  test("interleave matches a bit-by-bit Morton reference for k=2") {
    def mortonRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L), (32768L, 1L))
    val got = vals.toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 16).as("z"))
      .as[Long].collect()
    assert(got.toSeq == vals.map { case (x, y) => mortonRef(x, y, 16) })
  }

  test("rankColumns: full range maps to [0, 2^bits), constant column ranks 0") {
    val df = Seq((0.0, 5.0), (50.0, 5.0), (100.0, 5.0)).toDF("a", "b")
    val ranked = df.select(ZOrder.rankColumns(df, Seq("a", "b"), 8): _*)
      .as[(Long, Long)].collect().toSeq
    assert(ranked == Seq((0L, 0L), (127L, 0L), (255L, 0L)))
  }

  test("rankColumns: an entirely-null column ranks 0 (no NPE)") {
    val df = Seq((0.0, none), (50.0, none), (100.0, none)).toDF("a", "b")
    val ranked = df.select(ZOrder.rankColumns(df, Seq("a", "b"), 8): _*)
      .as[(Long, Long)].collect().toSeq
    assert(ranked == Seq((0L, 0L), (127L, 0L), (255L, 0L)))
  }
  private def none: Option[Double] = None

  test("z-ordered files prune on BOTH dimensions; single-sort prunes on one") {
    val zDir = tempDir("graft_zorder")
    val xDir = tempDir("graft_xsort")
    ZOrder.clusterWrite(points, Seq("x", "y"), zDir, 16)
    points.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    def filesContaining(dir: String, colName: String, probe: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min(colName).as("mn"), max(colName).as("mx"))
        .filter(col("mn") <= probe && col("mx") >= probe)
        .count()

    // a point predicate on y: the x-sorted layout cannot prune (every
    // file spans ~the full y range); the z-ordered layout can
    val probes = Seq(10000L, 50000L, 90000L)
    val zHits = probes.map(filesContaining(zDir, "y", _)).sum
    val xHits = probes.map(filesContaining(xDir, "y", _)).sum
    assert(zHits * 2 <= xHits, s"z=$zHits vs xsort=$xHits")
    // and x-pruning must not collapse: z files still bound x usefully
    val zxHits = probes.map(filesContaining(zDir, "x", _)).sum
    assert(zxHits < 16L * probes.size)

    // range partitioning keeps files balanced (no empty/giant file)
    val sizes = spark.read.parquet(zDir).groupBy(input_file_name()).count()
      .as[(String, Long)].collect().map(_._2)
    assert(sizes.length == 16)
    assert(sizes.min > 0 && sizes.max < 4 * (20000 / 16))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points across a signed domain; ranges of varied lengths including
  // sub-bucket, multi-bucket, and empty-intersection ones
  private def points = (-25L to 60L by 3L).toDF("p")
  private def ranges = Seq(
    (1L, -30L, -20L),  // negative domain
    (2L, -5L, 9L),     // spans bucket boundary
    (3L, 10L, 11L),    // single point wide
    (4L, 11L, 10L),    // empty (end <= start): matches nothing
    (5L, 0L, 100L),    // many buckets
    (6L, 58L, 61L)     // tail edge
  ).toDF("rk", "s", "e")

  private def naive = points.crossJoin(ranges)
    .filter(col("p") >= col("s") && col("p") < col("e"))
    .select("p", "rk").as[(Long, Long)].collect().toSet

  test("pointInRange equals the naive cross-join filter for several widths") {
    for (w <- Seq(1L, 4L, 7L, 1000L)) {
      val got = RangeJoin.pointInRange(points, ranges, "p", "s", "e", w)
        .select("p", "rk").as[(Long, Long)].collect()
      assert(got.toSet == naive, s"width $w")
      assert(got.length == got.toSet.size, s"width $w produced duplicates")
    }
  }

  test("pointInRange == naive on seeded random instances") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 5) {
      val ps = Seq.fill(200)(rnd.nextLong() % 1000L).toDF("p")
      val rs = Seq.tabulate(80) { i =>
        val s = rnd.nextLong() % 1000L
        (i.toLong, s, s + 1 + rnd.nextInt(200))
      }.toDF("rk", "s", "e")
      val naiveSet = ps.crossJoin(rs)
        .filter(col("p") >= col("s") && col("p") < col("e"))
        .select("p", "rk").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val w = 1L + rnd.nextInt(300)
      val got = RangeJoin.pointInRange(ps, rs, "p", "s", "e", w)
        .select("p", "rk").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == naiveSet, s"trial $trial width $w") // multiplicity-exact
    }
  }

  test("inclusive start, exclusive end") {
    val got = RangeJoin.pointInRange(
      Seq(10L, 11L).toDF("p"), Seq((3L, 10L, 11L)).toDF("rk", "s", "e"),
      "p", "s", "e", 7L).select("p").as[Long].collect().toSet
    assert(got == Set(10L))
  }

  test("intervalOverlap equals the naive overlap filter, no duplicate pairs") {
    val l = Seq((1L, -10L, 5L), (2L, 0L, 30L), (3L, 29L, 31L), (4L, 50L, 50L))
      .toDF("lk", "ls", "le")
    val r = Seq((10L, -20L, -9L), (11L, 4L, 6L), (12L, 28L, 60L), (13L, 31L, 40L))
      .toDF("rk", "rs", "re")
    val naive = l.crossJoin(r)
      .filter(col("ls") < col("re") && col("rs") < col("le"))
      .select("lk", "rk").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L)) {
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w)
        .select("lk", "rk").as[(Long, Long)].collect()
      assert(got.toSet == naive, s"width $w")
      assert(got.length == naive.size, s"width $w produced duplicates")
    }
    // half-open semantics: [29,31) meets [28,60) but not [31,40)
    assert(naive.contains((3L, 12L)) && !naive.contains((3L, 13L)))
  }

  test("rangeAgg groups contained points per range key") {
    val got = RangeJoin.rangeAgg(points, ranges, "p", "s", "e", 7L, "rk",
      Seq(count(lit(1)).as("n"))).as[(Long, Long)].collect().toMap
    val expect = naive.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
    assert(!got.contains(4L)) // empty range absent, not zero
  }
}

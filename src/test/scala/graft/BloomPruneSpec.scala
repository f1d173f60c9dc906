package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("semiJoin == plain left_semi, antiJoin == plain left_anti (id key)") {
    val keys = docs.filter($"doc_id" % 5 === 0).select($"doc_id".as("k"))
    val semi = BloomPrune.semiJoin(docs, keys, col("doc_id"), "k")
      .select("doc_id").as[Long].collect().toSet
    val anti = BloomPrune.antiJoin(docs, keys, col("doc_id"), "k")
      .select("doc_id").as[Long].collect().toSet
    val expSemi = docs.join(keys, $"doc_id" === $"k", "left_semi")
      .select("doc_id").as[Long].collect().toSet
    val expAnti = docs.join(keys, $"doc_id" === $"k", "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(semi == expSemi)
    assert(anti == expAnti)
    // partition: every row lands on exactly one side
    assert(semi.intersect(anti).isEmpty)
    assert((semi ++ anti).size == docs.count())
  }

  test("expression keys: md5(text) blocklist, exact under a sloppy bloom") {
    val block = docs.filter($"source" === "src1" && $"doc_id" % 7 === 0)
      .select(md5($"text").as("bad_fp"))
    // fpp 0.5 forces heavy false-positive traffic through the re-check
    // join — the result must not change (bloom prunes, never decides)
    val tight = BloomPrune.antiJoin(docs, block, md5($"text"), "bad_fp", fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    val sloppy = BloomPrune.antiJoin(docs, block, md5($"text"), "bad_fp", fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val expect = docs.join(block, md5($"text") === $"bad_fp", "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(tight == expect)
    assert(sloppy == expect)
    // exact duplicates of a blocked src1 text in OTHER sources are
    // blocked too — content-keyed, not id-keyed
    assert(expect.size < docs.count())
  }

  test("disjoint and identical key sets; expectedKeys undercount stays exact") {
    val disjoint = Seq(-1L, -2L).toDF("k")
    assert(BloomPrune.semiJoin(docs, disjoint, col("doc_id"), "k").count() == 0)
    assert(BloomPrune.antiJoin(docs, disjoint, col("doc_id"), "k").count() ==
      docs.count())
    val all = docs.select($"doc_id".as("k"))
    assert(BloomPrune.semiJoin(docs, all, col("doc_id"), "k").count() ==
      docs.count())
    assert(BloomPrune.antiJoin(docs, all, col("doc_id"), "k").count() == 0)
    // a 100x undercount only degrades fpp, never correctness
    val keys = docs.filter($"doc_id" % 3 === 0).select($"doc_id".as("k"))
    val under = BloomPrune.semiJoin(docs, keys, col("doc_id"), "k",
      expectedKeys = Some(keys.count() / 100 max 1))
      .select("doc_id").as[Long].collect().toSet
    val exp = docs.join(keys, $"doc_id" === $"k", "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(under == exp)
  }

  test("guards: bad fpp and expectedKeys rejected") {
    val keys = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](
      BloomPrune.semiJoin(docs, keys, col("doc_id"), "k", fpp = 0.0))
    intercept[IllegalArgumentException](
      BloomPrune.semiJoin(docs, keys, col("doc_id"), "k", fpp = 1.0))
    intercept[IllegalArgumentException](
      BloomPrune.antiJoin(docs, keys, col("doc_id"), "k",
        expectedKeys = Some(0L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain speaks {ml, data}; the pool has one target-like doc,
  // one anti-target doc, one mixed doc
  private lazy val target = Seq(
    (100L, "ml data ml data"),
    (101L, "data ml data"),
  ).toDF("doc_id", "text")
  private lazy val rawPool = Seq(
    (1L, "ml data ml"),        // target-like
    (2L, "cats dogs cats"),    // anti-target
    (3L, "ml cats"),           // mixed
    (4L, ""),                  // empty: zero tokens, weight 0
  ).toDF("doc_id", "text")

  test("importanceWeights: hand-computed log weights; empty doc neutral") {
    val got = Dsir.importanceWeights(target, rawPool)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // model by hand: vocab = {ml, data, cats, dogs}, V=4, λ=1
    // target counts: ml=3 data=4, T_t=7;  raw counts: ml=3 data=1 cats=3 dogs=1, T_q=8
    def lr(ct: Long, cq: Long): BigDecimal = {
      val p = (ct + 1.0) / (7.0 + 4.0)
      val q = (cq + 1.0) / (8.0 + 4.0)
      BigDecimal(math.log(p / q)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val ml = lr(3, 3); val data = lr(4, 1); val cats = lr(0, 3); val dogs = lr(0, 1)
    def w6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, w6(ml * 2 + data))))
    assert(got(2L) == ((3L, w6(cats * 2 + dogs))))
    assert(got(3L) == ((2L, w6(ml + cats))))
    assert(got(4L) == ((0L, 0.0)))
    // the signal points the right way
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("selectTopK: partitioning-independent, deterministic ties, ordered cut") {
    val a = Dsir.selectTopK(target, rawPool, 2)
      .select("doc_id").as[Long].collect().toSet
    val b = Dsir.selectTopK(target.repartition(5), rawPool.repartition(7), 2)
      .select("doc_id").as[Long].collect().toSet
    // doc 4 (empty) sits at neutral 0.0, above the negative-weight docs
    assert(a == b && a == Set(1L, 4L))
  }

  test("maxVocab truncation: every doc survives, only kept words score") {
    // keep the 2 most frequent union-vocab words: data(5) ties cats(… )
    // combined: ml=6 data=5 cats=3 dogs=1 → keep {ml, data}
    val got = Dsir.importanceWeights(target, rawPool, maxVocab = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    // doc 2 has no kept-vocab tokens: neutral weight, zero scored tokens
    assert(got(2L) == ((0L, 0.0)))
    // truncated model: V=2, totals over kept vocab only
    def lr(ct: Long, cq: Long, tt: Double, tq: Double): BigDecimal = {
      val p = (ct + 1.0) / (tt + 2.0)
      val q = (cq + 1.0) / (tq + 2.0)
      BigDecimal(math.log(p / q)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val ml = lr(3, 3, 7.0, 4.0); val data = lr(4, 1, 7.0, 4.0)
    def w6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, w6(ml * 2 + data))))
    assert(got(3L) == ((1L, w6(ml))))
  }

  test("selectGumbel: seed-deterministic, temperature→0 recovers top-k") {
    val s1 = Dsir.selectGumbel(target, rawPool, 2, seed = 42L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Dsir.selectGumbel(target.repartition(3), rawPool.repartition(5), 2,
        seed = 42L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 2)
    // near-zero temperature: weights dominate the bounded Gumbel noise
    val frozen = Dsir.selectGumbel(target, rawPool, 2, seed = 7L,
        temperature = 1e-9)
      .select("doc_id").as[Long].collect().toSet
    assert(frozen == Set(1L, 4L))
    // sampling is real: across seeds the negative-weight docs get drawn
    val seen = (1L to 30L).flatMap(seed =>
      Dsir.selectGumbel(target, rawPool, 2, seed = seed)
        .select("doc_id").as[Long].collect()).toSet
    assert(seen.contains(2L) || seen.contains(3L))
  }

  test("hashed estimator == exact-word form when buckets dwarf the vocab; tiny buckets stay total") {
    // collision-free regime: occupied buckets == vocab, so totals and
    // per-word ratios — hence every weight — match the exact form
    val exact = Dsir.importanceWeights(target, rawPool)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val hashed = Dsir.importanceWeightsHashed(target, rawPool, buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hashed == exact)
    // collision-heavy regime (2 buckets): weights differ but every doc
    // still appears, token counts are intact, and the result is
    // partition-deterministic
    val tiny = Dsir.importanceWeightsHashed(target, rawPool, buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(tiny.keySet == exact.keySet)
    assert(tiny.map(_._2._1) == exact.map(_._2._1))
    val tinyAgain = Dsir.importanceWeightsHashed(
      target.repartition(5), rawPool.repartition(3), buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(tinyAgain == tiny)
  }

  test("corpus sanity at sf0.001: k respected, weights finite, src0 excluded") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val sel = Dsir.selectTopK(
      docs.filter(col("source") === "src0"),
      docs.filter(col("source") =!= "src0"), 20)
    val rows = sel.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }
}

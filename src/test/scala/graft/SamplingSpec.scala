package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("deterministicSample: same rows under any partitioning, ~fraction kept") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.45, s"got $frac")
    // different salt decorrelates
    val c = Sampling.deterministicSample(docs, "doc_id", 0.3, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(c != a)
  }

  test("stratifiedSample respects per-stratum fractions") {
    val fractions = Map("en" -> 1.0, "de" -> 0.0)
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", fractions)
    val langs = got.select("lang").distinct().as[String].collect().toSet
    assert(langs.contains("en") && !langs.contains("de"))
    assert(got.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("split3: disjoint, exhaustive, stable") {
    val (tr, va, te) = Sampling.split3(docs, "doc_id", 0.7, 0.2)
    val n = docs.count()
    assert(tr.count() + va.count() + te.count() == n)
    val ids = tr.select("doc_id").as[Long].collect().toSet ++
      va.select("doc_id").as[Long].collect().toSet ++
      te.select("doc_id").as[Long].collect().toSet
    assert(ids.size == n)
  }
}

package graft

import graft.text.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("score matches a hand computation on a tiny corpus") {
    val docs = Seq((0L, "a b a"), (1L, "a b c")).toDF("doc_id", "text")
    // bigrams — doc0: "a b","b a"; doc1: "a b","b c"; N=2
    val got = TfIdf.score(TfIdf.ngramTerms(docs, 2))
      .select("doc_id", "term", "tf", "df", "score")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    def idf(df: Long): Double =
      BigDecimal(math.log(3.0 / (df + 1.0)) + 1.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def s(tf: Long, df: Long): Double =
      BigDecimal(tf * idf(df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((0L, "a b")) == ((1L, 2L, s(1, 2))))
    assert(got((0L, "b a")) == ((1L, 1L, s(1, 1))))
    assert(got((1L, "b c")) == ((1L, 1L, s(1, 1))))
    assert(got.size == 4)
  }

  test("keywords ranks by score desc then term asc, bounded by k") {
    val docs = Seq((0L, "a b a"), (1L, "a b c")).toDF("doc_id", "text")
    val got = TfIdf.keywords(docs, 2, 2)
      .select("doc_id", "rank", "term").as[(Long, Int, String)].collect().toSeq
    // doc0: "b a" (idf ln(3/2)+1) beats "a b" (idf 1.0)
    assert(got == Seq((0L, 1, "b a"), (0L, 2, "a b"),
      (1L, 1, "b c"), (1L, 2, "a b")))
    val k1 = TfIdf.keywords(docs, 1, 2).count()
    assert(k1 == 2) // one keyword per doc
  }

  test("keywords deterministic under repartitioning") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val a = TfIdf.keywords(docs, 3, 2)
      .as[(Long, Int, String, Double)].collect().toSeq
    val b = TfIdf.keywords(docs.repartition(13), 3, 2)
      .as[(Long, Int, String, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}

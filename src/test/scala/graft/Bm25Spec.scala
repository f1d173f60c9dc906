package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("matches an independent plain-Scala BM25 on a hand corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps"),
      (3L, "lorem ipsum dolor sit amet"),
      (4L, "quick quick quick fox")).toDF("doc_id", "text")
    val queries = Seq((10L, "quick fox")).toDF("query_id", "query_text")
    val got = Bm25.search(corpus, queries, k = 4)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSeq

    // independent reference: plain Scala collections, no Spark
    val (k1, b) = (1.2, 0.75)
    val toks = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown cat sleeps",
      3L -> "lorem ipsum dolor sit amet",
      4L -> "quick quick quick fox").view.mapValues(_.split(" ").toSeq).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def round9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(doc: Seq[String], qTerms: Set[String]): Double = {
      val contribs = qTerms.toSeq.sorted.flatMap { t =>
        val tf = doc.count(_ == t).toDouble
        if (tf == 0) None else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = round9(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
          Some(BigDecimal(round9(
            idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doc.size / avgdl))))))
        }
      }
      (contribs.sum.toDouble * 1e6).round / 1e6
    }
    val q = Set("quick", "fox")
    val expect = toks.view.mapValues(d => score(d, q)).toMap.filter(_._2 > 0)
    val ranked = expect.toSeq.sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, s), i) => (10L, i + 1, id, s) }
    assert(got == ranked)
    // docs 1/2/4 contain query terms; doc 3 must be absent
    assert(!got.exists(_._3 == 3L))
  }

  test("unique-token retrieval: only the holder matches, ranks first; k bound holds") {
    // a token that exists in exactly one (injected) doc: BM25 must
    // return that doc rank 1 for it, and no doc without ANY query term
    val poison = Seq((99999L, "zzzuniqua zzzuniqua qqtokenb")).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionByName(poison)
    val queries = Seq((1L, "zzzuniqua qqtokenb")).toDF("query_id", "query_text")
    val got = Bm25.search(corpus, queries, k = 5)
      .select("rank", "doc_id").as[(Int, Long)].collect()
    assert(got.length == 1, s"word-salad corpus must not match: ${got.toSeq}")
    assert(got.head == ((1, 99999L)))
  }

  test("partitioning-invariant and deterministic") {
    val queries = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("query_id", "query_text")
    val corpus = docs.limit(200)
    val a = Bm25.search(corpus, queries, k = 10).collect().toSeq
    val c = Bm25.search(corpus.repartition(13), queries, k = 10).collect().toSeq
    assert(a == c)
  }

  test("guards") {
    val q = Seq((1L, "x")).toDF("query_id", "query_text")
    intercept[IllegalArgumentException](Bm25.search(docs, q, k = 0))
    intercept[IllegalArgumentException](Bm25.search(docs, q, k = 1, k1 = 0.0))
    intercept[IllegalArgumentException](Bm25.search(docs, q, k = 1, b = 1.5))
  }

  test("rrfFuse: hand-computed fusion, absent docs contribute nothing, doc-id ties") {
    import graft.text.HybridSearch
    // query 7: ranking 1 has A(10)=1, B(11)=2; ranking 2 has B=1, C(12)=2
    val r1 = Seq((7L, 10L, 1), (7L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((7L, 11L, 1), (7L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = HybridSearch.rrfFuse(Seq(r1, r2), k = 10, kRrf = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // B: 1/2 + 1/1 = 1.5; A: 1/1 = 1.0; C: 1/2 = 0.5
    assert(got.toSeq == Seq((7L, 1, 11L, 1.5), (7L, 2, 10L, 1.0), (7L, 3, 12L, 0.5)))
    // equal scores break on doc id: two singleton rankings at rank 1
    val t1 = Seq((1L, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val tie = HybridSearch.rrfFuse(Seq(t1, t2), k = 2, kRrf = 60)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(tie.toSeq == Seq((1, 20L), (2, 30L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("curate: no exact dups, quality gated, langs filtered, subset of input") {
    val out = Curation.curate(docs, minQuality = 0.2,
      keepLangs = Seq("en", "de"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // no two surviving docs share a text
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.distinct.length == texts.length)
    // gates hold
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.2)
      assert(Set("en", "de").contains(r.getAs[String]("pred_lang")))
    }
    // subset of the input ids
    val inIds = docs.select("doc_id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("doc_id")).forall(inIds.contains))
  }

  test("curate is deterministic under repartitioning") {
    val a = Curation.curate(docs, minQuality = 0.2, sampleFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.curate(docs.repartition(13), minQuality = 0.2,
      sampleFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, Dedup}
import graft.ops.Sampling
import graft.text.TextAnalysis

/** End-to-end training-data curation: the operators of this library
  * composed the way a 100 TB corpus build actually runs them.
  *
  *   raw docs
  *     → exact dedup        (content-hash groupBy, min-id survivor)
  *     → near-dup prune     (MinHash+LSH pairs → connected components
  *                           → min-id representative per cluster)
  *     → quality gate       (length/punct composite ≥ threshold)
  *     → language filter    (n-gram marker language ID)
  *     → deterministic sample (id-hash, partitioning-independent)
  *
  * Every stage is a declarative transform — the whole pipeline is ONE
  * Catalyst plan per action, and each stage's shuffle story is
  * documented in its own module. Deterministic end to end: same input
  * ⇒ same surviving doc ids on any cluster layout.
  */
object Curation {

  def curate(docs: DataFrame,
             shingleK: Int = 3, numPerm: Int = 32, bands: Int = 8,
             jaccardThreshold: Double = 0.8,
             minQuality: Double = 0.3,
             keepLangs: Seq[String] = Seq("en"),
             sampleFraction: Double = 1.0,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // 1. exact dedup: survivors are the min id per content hash
    val hashed = docs.withColumn("__h", md5(col(textCol).cast("binary")))
    val survivors = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactDeduped = docs.join(survivors, Seq(idCol), "left_semi")

    // 2. near-dup prune over the exact-deduped corpus
    val pairs = Dedup.minhashNearDups(
      exactDeduped.select(col(idCol), col(textCol)),
      shingleK, numPerm, bands, jaccardThreshold, textCol, idCol)
    val nearDeduped = Clusters.dedupByComponents(
      exactDeduped, pairs, idCol, "doc_a", "doc_b")

    // 3 + 4. quality gate and language filter (one narrow map)
    val scored = TextAnalysis.langId(
      TextAnalysis.qualityScore(nearDeduped, textCol), textCol)
    val gated = scored
      .filter(col("quality") >= minQuality)
      .filter(col("pred_lang").isin(keepLangs: _*))

    // 5. deterministic sample
    val sampled =
      if (sampleFraction >= 1.0) gated
      else Sampling.deterministicSample(gated, idCol, sampleFraction)

    sampled.select(col(idCol), col(textCol), col("pred_lang"), col("quality"))
      .orderBy(idCol)
  }
}

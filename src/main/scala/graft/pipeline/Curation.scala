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

  /** Sequence packing — assemble curated documents into training
    * sequences of at most `maxTokens` whitespace tokens (the
    * fill-the-context-window step between curation and tokenization).
    *
    * Semantics: first-fit CONTIGUOUS in `idCol` order — walk documents
    * ascending, open a new bin when the next document would overflow
    * `maxTokens`; a single document larger than `maxTokens` gets a bin
    * of its own. Bins never cross `blockSize`-wide id blocks, so the
    * fold is embarrassingly parallel at the price of at most one
    * underfull bin per block (negligible for blockSize ≫ docs/bin).
    *
    * Spark shape: greedy packing is a sequential fold, but it is a
    * fold over a BOUNDED block — one groupBy shuffle of (id, n_tokens)
    * pairs, then `array_sort` + the `aggregate` higher-order function
    * run the fold inside codegen. No mapPartitions, no driver loop,
    * deterministic on any cluster layout. Per-block state is
    * ≤ `blockSize` 16-byte structs, far under executor memory.
    *
    * Returns (idCol, n_tokens, bin_id), bin_id globally unique and
    * deterministic: block * 2^32 + bin-within-block.
    */
  def packSequences(docs: DataFrame, maxTokens: Long,
                    blockSize: Long = 100000,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(blockSize >= 1 && blockSize <= (1L << 32),
      s"blockSize must be in [1, 2^32], got $blockSize")
    // `div` = exact integral division — `/` on longs is DOUBLE division
    // in Spark SQL and silently mis-blocks ids above 2^53. Negative ids
    // would truncate toward zero (merging (-blockSize, blockSize) into
    // one double-width block), so they fail loudly per-row instead.
    val block = when(col(idCol) < 0, raise_error(lit(
      s"packSequences: negative $idCol — block arithmetic requires non-negative ids")))
      .otherwise(expr(s"CAST(`$idCol` AS BIGINT) div $blockSize"))
    val toks = docs.select(
      col(idCol),
      block.as("__block"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    val packed = toks.groupBy("__block")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("n_tokens").as("tok")))).as("ds"))
      .withColumn("assign", expr(
        s"""aggregate(
           |  ds,
           |  named_struct('bin', 0L, 'used', 0L,
           |    'out', cast(array() as array<struct<id:bigint,tok:bigint,bin:bigint>>)),
           |  (acc, d) -> if(acc.used + d.tok > ${maxTokens}L and acc.used > 0L,
           |    named_struct('bin', acc.bin + 1L, 'used', d.tok,
           |      'out', array_append(acc.out,
           |        named_struct('id', d.id, 'tok', d.tok, 'bin', acc.bin + 1L))),
           |    named_struct('bin', acc.bin, 'used', acc.used + d.tok,
           |      'out', array_append(acc.out,
           |        named_struct('id', d.id, 'tok', d.tok, 'bin', acc.bin)))),
           |  acc -> acc.out)""".stripMargin))
      .select(col("__block"), explode(col("assign")).as("a"))
    packed.select(
      col("a.id").as(idCol),
      col("a.tok").as("n_tokens"),
      (col("__block") * (1L << 32) + col("a.bin")).as("bin_id"))
      .orderBy(idCol)
  }
}

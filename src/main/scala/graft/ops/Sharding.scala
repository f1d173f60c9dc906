package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard layout — the last step before a curated corpus
  * leaves the pipeline: assign every document to one of `nShards`
  * output shards so distributed training readers each stream a
  * near-equal token budget, and report the realized balance.
  *
  * Assignment is the PORTABLE md5 id-hash bucket (Sampling's recipe:
  * md5("salt|id"), first 15 hex digits mod 10^6) taken mod `nShards`:
  * partitioning-independent, engine-reproducible (any SQL engine can
  * recompute which shard a doc landed in — the audit question), and
  * stable under re-runs. Hash placement balances token totals in
  * expectation with relative deviation ~1/√(docs per shard) — at
  * training scale (millions of docs per shard) that is a fraction of
  * a percent, which is why real pipelines shard by hash rather than
  * paying a global sort for exact bin-packing. [[shardReport]] is the
  * check that the realized spread is inside tolerance.
  *
  * Scale shape: assignment is a pure narrow map (no shuffle — at
  * write time it feeds `.write.partitionBy` or `repartition(shard)`);
  * the report is one partial-agg exchange of `nShards` rows.
  */
object Sharding {

  private def portableShard(idCol: String, nShards: Int, salt: String) =
    (conv(substring(md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long") % 1000000L % nShards).cast("int")

  /** `docs` plus a deterministic `shard` column in [0, nShards). */
  def assignShards(docs: DataFrame, nShards: Int,
                   idCol: String = "doc_id", salt: String = "s0"): DataFrame = {
    require(nShards > 0, s"nShards must be > 0: $nShards")
    docs.withColumn("shard", portableShard(idCol, nShards, salt))
  }

  /** Per-shard balance report: docs, whitespace-token totals and
    * doc-size extrema. Empty shards are absent (they can only occur
    * when nShards approaches the doc count).
    */
  def shardReport(docs: DataFrame, nShards: Int,
                  textCol: String = "text", idCol: String = "doc_id",
                  salt: String = "s0"): DataFrame =
    assignShards(docs, nShards, idCol, salt)
      // token-count convention: split("") -> [""], so an EMPTY text
      // counts as 1 token — deliberate (both engines agree, and the
      // oracle mirrors it); callers that must treat empty docs as 0
      // filter them before sharding
      .withColumn("__t", size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("sum_tokens"),
        min(col("__t")).as("min_tokens"),
        max(col("__t")).as("max_tokens"))
      .orderBy("shard")
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency guard: every query the driver benches
  * must either carry a DuckDB oracle or appear in the DECLARED
  * rows-only list below (operators whose outputs are rows-only by
  * construction — hash families DuckDB lacks, float k-means /
  * power-iteration classes, RNG-free-but-engine-specific plans — each
  * carrying an exact ScalaTest spec instead). A new entry without an
  * oracle fails HERE, in-session, instead of surfacing as a silent
  * `no_oracle` row in the next round's correctness artifact.
  */
class EntryConsistencySpec extends AnyFunSuite {

  private val declaredRowsOnly = Set(
    "d_ann_ivf", "d_ann_ivf_hier", "d_ann_lsh",          // ANN: tie/float class
    "d_ann_pq", "d_ann_pq_filtered",                     // float k-means class
    "d_compression_ratio",                               // DuckDB has no deflate
    "d_dedup_clusters", "d_dedup_minhash",               // xxhash64 family
    "d_dedup_minhash_delta", "d_dedup_minhash_pairs",
    "d_dedup_simhash", "d_dedup_simhash_pairs",
    "d_domain_mix",                                      // xxhash64 bucket
    "d_embed_outliers", "d_embed_pca", "d_semdedup",     // float-sum class
    "d_pipeline_curate",                                 // xxhash64 chain
    "d_lang_id_learned",                                 // iterative descent
    "d_quality_classifier",                              // iterative descent
    "d_unigram_sample",                                  // splitmix RNG draw
    "d_unigram_tok_train",                               // float EM class
    "q_approx_distinct")                                 // HLL

  test("every query has an oracle or a declared rows-only status") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val undeclared = queries -- oracles -- declaredRowsOnly
    assert(undeclared.isEmpty,
      s"entries missing BOTH an oracle and a rows-only declaration: " +
        s"${undeclared.toSeq.sorted.mkString(", ")}")
    val orphans = oracles -- queries
    assert(orphans.isEmpty,
      s"oracles without a matching query entry: ${orphans.toSeq.sorted.mkString(", ")}")
    val stale = declaredRowsOnly -- queries
    assert(stale.isEmpty,
      s"rows-only declarations for entries that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    // a rows-only declaration must not shadow an oracle that exists
    val shadowed = declaredRowsOnly & oracles
    assert(shadowed.isEmpty,
      s"declared rows-only but an oracle exists: ${shadowed.toSeq.sorted.mkString(", ")}")
  }
}

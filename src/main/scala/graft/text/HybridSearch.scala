package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * 2009) of independently-produced rankings, the standard way modern
  * retrieval stacks combine lexical (BM25) and embedding (cosine)
  * evidence without score calibration: each ranking contributes
  * 1/(kRrf + rank) per (query, doc); documents absent from a ranking
  * contribute nothing. Rank positions are comparable across arbitrary
  * scorers, which is the whole trick — raw BM25 and cosine scores are
  * not.
  *
  * Scale shape: inputs are already top-k-bounded per query (the
  * k-bounded heap in cosineTopK, the rank ≤ k filter in Bm25.search),
  * so the fusion works on rankings-sized data, not corpus-sized: one
  * union + one (query, doc) aggregation + a per-query window over ≤
  * Σk rows per query. The heavy lifting stays in the upstream
  * retrievers.
  *
  * Determinism: per-(query, doc) contributions round to 9 dp and sum
  * as exact decimals (union branch order cannot change the result),
  * the fused score emits at 6 dp, ties break on doc id — fully
  * SQL-oracle-reproducible given reproducible input rankings.
  */
object HybridSearch {

  /** Fuse ranked lists (`queryCol`, `docCol`, `rankCol` 1-based) into
    * a top-`k` per query by RRF score.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
              queryCol: String = "query_id", docCol: String = "doc_id",
              rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k >= 1, s"k must be >= 1, got $k")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    val contribs = rankings.map { r =>
      r.select(col(queryCol).cast("long").as("__q"),
        col(docCol).cast("long").as("__d"),
        round(lit(1.0) / (lit(kRrf) + col(rankCol).cast("double")), 9)
          .cast("decimal(30,12)").as("__c"))
    }.reduce(_ unionByName _)
    val fused = contribs.groupBy("__q", "__d")
      .agg(round(sum(col("__c")).cast("double"), 6).as("rrf_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q"))
      .orderBy(col("rrf_score").desc, col("__d").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__q").as(queryCol), col("rank").cast("int").as("rank"),
        col("__d").as(docCol), col("rrf_score"))
      .orderBy(queryCol, "rank")
  }

  /** Lexical + semantic hybrid search: BM25 over `corpus` text fused
    * with cosine top-k over `embeddings`, RRF-combined. `queries`
    * supplies (queryIdCol, queryTextCol); `queryVecs` the same query
    * ids with an embedding column. `fetchK` candidates are pulled from
    * each retriever (2-3× the final k is customary), `k` survive.
    */
  def search(corpus: DataFrame, embeddings: DataFrame,
             queries: DataFrame, queryVecs: DataFrame,
             k: Int, fetchK: Int, kRrf: Int = 60,
             idCol: String = "doc_id", textCol: String = "text",
             vecIdCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id",
             queryTextCol: String = "query_text"): DataFrame = {
    val lexical = Bm25.search(corpus, queries, fetchK,
      textCol = textCol, idCol = idCol,
      queryIdCol = queryIdCol, queryTextCol = queryTextCol)
      .select(col(queryIdCol).as("query_id"), col(idCol).as("doc_id"), col("rank"))
    val semantic = graft.sim.Similarity.cosineTopK(
      embeddings, queryVecs, fetchK, idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lexical, semantic), k, kRrf)
  }
}

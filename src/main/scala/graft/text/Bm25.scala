package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval: score a corpus against a query set, top-k
  * docs per query. The workhorse of lexical retrieval-for-curation —
  * "find the training docs most relevant to these eval prompts"
  * (targeted decontamination triage, seed-set expansion, RAG corpus
  * audits) without an embedding model in the loop.
  *
  * Scale shape (the corpus is the 100 TB side, queries are thousands):
  *  - ONE token-explode pass. The explode joins BROADCAST against the
  *    distinct query-term set FIRST, so the only corpus-derived
  *    exchange (the per-(doc,term) tf aggregate) carries query-term
  *    HITS, not the token stream — with 10k query terms that is a
  *    vanishing fraction of the corpus. (The corpus-stats scalar is a
  *    second, narrow text read: lengths only, no explode, no shuffle.)
  *  - Document length rides the tf exchange as a grouping key
  *    (functionally dependent on the doc id — zero extra shuffle, no
  *    doc-length side table to join).
  *  - df/idf for the query terms derives from the tf output
  *    (query-term-bounded) and joins back broadcast; AQE reuses the tf
  *    exchange for it (verified in the executed plan: the dfreq branch
  *    is a ReusedExchange of the scoring branch's tf shuffle).
  *  - The final (query, doc) score aggregate and the top-k window are
  *    hit-bounded; output is k rows per query.
  *
  * Determinism contract (same as [[TfIdf]]/unigramLogProb): idf and
  * each term contribution round to 9 decimals, per-(query,doc) sums
  * run as exact decimals, the emitted score rounds to 6 — so a SQL
  * oracle reproduces scores bit-for-bit across engines' `ln`/double
  * ulp drift. Ranking ties break by doc id ascending.
  *
  * BM25 constants: k1 ∈ [1.2, 2.0] saturates term frequency, b = 0.75
  * length-normalizes (Robertson & Zaragoza 2009). idf uses the
  * standard ln((N - df + 0.5)/(df + 0.5) + 1) form — always positive.
  * Repeated terms within one query count once (distinct-term form).
  */
object Bm25 {

  def search(corpus: DataFrame, queries: DataFrame, k: Int,
             k1: Double = 1.2, b: Double = 0.75,
             textCol: String = "text", idCol: String = "doc_id",
             queryIdCol: String = "query_id",
             queryTextCol: String = "query_text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0, s"k1 must be positive, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0,1], got $b")

    val qt = queries.select(col(queryIdCol),
      explode(array_distinct(split(lower(col(queryTextCol)), " "))).as("term"))

    val base = corpus.select(col(idCol), split(lower(col(textCol)), " ").as("__w"))
    // corpus stats as ONE broadcast scalar row — no driver action, and
    // the ids+size projection prunes the token arrays from this branch
    val stats = base.select(size(col("__w")).as("__len"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__len")).cast("double").as("__total_len"))

    val tokens = base.select(col(idCol), size(col("__w")).as("len"),
      explode(col("__w")).as("term"))
    // prune BEFORE aggregating: only query-term occurrences reach the
    // tf exchange; len is functionally dependent on the doc id, so
    // carrying it as a grouping key adds nothing to the shuffle width.
    // left_semi against the RAW query-term rows — the broadcast hash
    // relation dedups keys itself, so no distinct() aggregate (and its
    // exchange) on the query side
    val tf = tokens.join(broadcast(qt.select("term")), Seq("term"), "left_semi")
      .groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency from the tf output. The when-guard reads the
    // SAME columns as the scoring consumer (tf/len/id), keeping the two
    // consumers' column sets identical so the tf exchange is built once
    // (ReusedExchange) — see TfIdf.score for the pruning trap this
    // avoids; every branch of the guard is true by construction
    val dfreq = tf.groupBy(col("term"))
      .agg(count(when(col("tf") >= 1 && col("len") >= 0 &&
        col(idCol).isNotNull, 1)).as("df"))

    // operation ORDER mirrors the SQL oracle exactly — double ops are
    // IEEE-deterministic given identical operand order, and the 9dp
    // rounds absorb ln ulp drift
    val idf = round(log(
      (col("__n") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 9)
    val avgdl = col("__total_len") / col("__n")
    val norm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl))
    // deliberately TWO exchanges here, not a single repartition(query_id)
    // serving both the aggregate and the window (measured: that form is
    // ~20% slower at bench scale and worse at 100 TB): the (query, doc)
    // agg exchange ships map-side-COMBINED partial sums, not raw per-term
    // contribution rows, and keeps the agg at full parallelism even when
    // the query set is smaller than the cluster; the window exchange then
    // ships only WindowGroupLimit-pruned rows (<= k per query per task)
    val scored = tf.join(broadcast(dfreq), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", round(idf * norm, 9).cast("decimal(30,12)"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("__contrib")).cast("double"), 6).as("score"))

    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
      .orderBy(col(queryIdCol), col("rank"))
  }
}

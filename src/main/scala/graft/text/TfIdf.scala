package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF scoring and per-document keyword extraction.
  *
  * Scale shape: ONE wide exchange — the (doc, term) partial-count
  * aggregation (map-side combine reduces each partition to its local
  * distinct doc-term pairs first). The document-frequency table is
  * derived from that same tf output (a second, much smaller agg over
  * doc-term rows, vocab-bounded) and joined back BROADCAST, so the
  * token stream itself never shuffles twice. Keyword top-k uses the
  * k-bounded heap aggregate (graft.functions.TopK): the rank exchange
  * carries k rows per doc, not every scored term.
  *
  * Determinism contract (same pattern as TextAnalysis.unigramLogProb):
  * idf = ln((N+1)/(df+1)) + 1 rounds to 9 decimals before use, and the
  * emitted score rounds to 6 — absorbing cross-engine `ln` ulp drift so
  * a SQL oracle reproduces the result bit-for-bit.
  */
object TfIdf {

  /** (doc, term, tf, df, score) for every term occurrence set. `terms`
    * must be (idCol, term) one row per OCCURRENCE. `nDocs`, when
    * given, is a one-row (__n: double) frame holding the count of
    * docs with ≥ 1 term — [[keywords]] derives it from word counts
    * WITHOUT a second pass over the token stream; the default derives
    * it from `terms` (correct for any caller, one extra token pass).
    */
  def score(terms: DataFrame, idCol: String = "doc_id",
            termCol: String = "term",
            nDocs: Option[DataFrame] = None): DataFrame = {
    val tf = terms.groupBy(col(idCol), col(termCol))
      .agg(count(lit(1)).as("tf"))
    // df must GENUINELY read the tf column: with tf pruned away the two
    // consumers of the doc-term aggregate get different column sets,
    // the exchanges stop being canonically equal, and Spark runs the
    // whole token-explode map side TWICE instead of emitting one
    // ReusedExchange (measured: 2× ~450 ms map stages at sf0.1; at
    // 100 TB it is the difference between one and two full passes over
    // the token stream). A plain count(tf) does NOT survive: Catalyst
    // rewrites count(non-null col) → count(1), prunes tf, and
    // collapses the inner agg to a distinct. count(when(tf >= 1, 1))
    // is nullable-in-the-optimizer's-eyes, so tf stays; every tf is
    // ≥ 1 by construction, so the value is still the row count.
    val df = tf.groupBy(col(termCol))
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    // corpus size as a broadcast scalar subquery, NOT a driver-side
    // .count() action: the whole score is one job, and the N branch
    // runs concurrently with the tf exchange instead of as a separate
    // blocking query. Deriving N from tf instead does NOT pay: the
    // count-distinct rewrite changes that branch's exchange shape and
    // un-shares the token-stream exchange (measured).
    val nd = nDocs.getOrElse(terms.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("__n")))
    val idf = round(
      log((col("__n") + 1.0) / (col("df").cast("double") + 1.0)) + 1.0, 9)
    tf.join(broadcast(df), termCol)
      .crossJoin(broadcast(nd))
      .withColumn("score", round(col("tf").cast("double") * idf, 6))
      .drop("__n")
  }

  /** Word n-gram stream of a corpus: (idCol, term), one row per
    * occurrence — single-space tokenizer, same as graft.text/ops.
    */
  def ngramTerms(docs: DataFrame, n: Int, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs.select(col(idCol),
      explode(graft.functions.Hashes.gram_strings(col(textCol), n)).as("term"))
  }

  /** Top-k keywords per document by TF-IDF (ties: term ascending).
    *
    * The rank is a per-doc window over the SCORED doc-term table —
    * whose row count equals the tf aggregate's output (distinct
    * doc-term pairs, doc-length-bounded per partition key), not the
    * raw occurrence stream; the broadcast idf join adds no exchange,
    * so ranking costs one doc-keyed shuffle of the scored pairs.
    * A heap top-k is NOT used here because the tie contract orders by
    * the term STRING, which the (score, long-id) heap cannot carry.
    */
  def keywords(docs: DataFrame, k: Int, n: Int = 2, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // N (docs with >= 1 term) from WORD COUNTS — a doc emits a term
    // iff it has >= n words — so the N branch is a lengths-only scan,
    // not a second pass over the exploded token stream. That also
    // leaves the term stream with a single consumer (the tf exchange).
    val nd = docs.select(
      when(size(split(col(textCol), " ")) >= n, 1).as("__has"))
      .agg(count(col("__has")).cast("double").as("__n"))
    val scored = score(ngramTerms(docs, n, textCol, idCol), idCol,
      nDocs = Some(nd))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
      .orderBy(col(idCol), col("rank"))
  }
}

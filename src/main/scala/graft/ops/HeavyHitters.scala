package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale: per-partition Misra-Gries candidate
  * generation, then an exact recount of only the candidate set.
  *
  * Guarantee chain (this is why the result is EXACT, not approximate):
  * an item with global count > phi*N has, by pigeonhole, local count
  * > phi*N_p in at least one partition p; a Misra-Gries summary of
  * capacity ceil(1/phi) retains every item whose local count exceeds
  * phi*N_p; so the union of per-partition survivors is a SUPERSET of
  * the true heavy hitters. The recount pass then removes the false
  * positives. Same rows as `groupBy(token).count.filter(cnt > phi*N)`,
  * but the wide exchanges are bounded: at most ceil(1/phi) candidates
  * leave each partition for the distinct, and the recount's map-side
  * partial aggregation caps its shuffle at partitions x candidates
  * rows — the full token stream never shuffles, which at 100 TB is the
  * difference between a bounded job and a trillion-row exchange.
  *
  * Cost model: three narrow passes over the token stream (total count,
  * sketch, recount) and no wide pass. Recomputing a narrow
  * explode/split is deliberate — CPU-cheap scans beat staging or
  * caching a token stream that is ~10x the corpus row count.
  *
  * No reference anchor: the reference's aggregation surface is plain
  * GROUP BY (data/query_core.py); heavy hitters is part of the
  * training-data-pipeline extension (SURVEY §2c), where corpus term
  * statistics at 100 TB need the sketch formulation.
  */
object HeavyHitters {

  /** Misra-Gries streaming summary over one partition's tokens.
    * Classic decrement form: capacity live counters; an unmatched
    * arrival with a full table decrements every counter and evicts
    * zeros. Survivors are exactly the keys whose local count can
    * exceed n_p/capacity. Returns the surviving keys.
    */
  private[graft] def misraGries(it: Iterator[String], capacity: Int): Iterator[String] = {
    val counts = new java.util.HashMap[String, Long](capacity * 2)
    while (it.hasNext) {
      val t = it.next()
      val cur = counts.get(t)
      if (cur != 0L || counts.containsKey(t)) counts.put(t, cur + 1L)
      else if (counts.size < capacity) counts.put(t, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
        }
      }
    }
    val out = Vector.newBuilder[String]
    counts.keySet().forEach(k => out += k)
    out.result().iterator
  }

  /** All tokens with global count strictly above `phi * N` over the
    * `tokenCol` column of `tokens` (null tokens are ignored), with
    * their EXACT counts. Output: (token, cnt), cnt descending.
    */
  def heavyHitters(tokens: DataFrame, tokenCol: String, phi: Double,
                   totalCount: Option[Long] = None): DataFrame = {
    require(phi > 0 && phi <= 1, s"phi must be in (0, 1], got $phi")
    require(phi >= 1e-6, s"phi < 1e-6 would size the per-partition sketch above 10^6, got $phi")
    val sp = tokens.sparkSession
    import sp.implicits._
    val cap = math.ceil(1.0 / phi).toInt
    val toks: Dataset[String] =
      tokens.select(col(tokenCol).cast("string")).filter(col(tokenCol).isNotNull).as[String]
    // callers that can derive N without materializing the token stream
    // (e.g. [[topNgrams]] from word counts) pass it in — dropping one
    // of the three token passes
    val total = totalCount.getOrElse(toks.count())
    val candidates = toks.mapPartitions(it => misraGries(it, cap))
      .distinct().toDF(tokenCol)
    toks.toDF(tokenCol)
      .join(broadcast(candidates), Seq(tokenCol), "left_semi")
      .groupBy(col(tokenCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(total.toDouble))
      .orderBy(desc("cnt"), col(tokenCol))
  }

  /** Heavy-hitter word n-grams of a document corpus: split on single
    * spaces (the corpus tokenizer used across graft.text), form the
    * n-grams of each doc, and run [[heavyHitters]] at `phi`.
    */
  def topNgrams(docs: DataFrame, phi: Double, n: Int = 2,
                textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // total n-gram count from WORD COUNTS (a doc with w >= n words has
    // exactly w - n + 1 grams): a lengths-only scan instead of a full
    // pass over the exploded token stream — two token passes (sketch +
    // recount) instead of three
    val total = docs
      .select(size(split(col(textCol), " ")).as("__nw"))
      .agg(coalesce(
        sum(when(col("__nw") >= n, col("__nw") - n + 1).otherwise(0)),
        lit(0L)))
      .head().getLong(0)
    val toks = docs.select(
      explode(graft.functions.Hashes.gram_strings(col(textCol), n)).as("token"))
    heavyHitters(toks, "token", phi, totalCount = Some(total))
  }
}

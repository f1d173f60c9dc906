package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling of a raw corpus
  * toward a target domain (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", NeurIPS). The pipeline
  * stage between crawling and training: given a small in-domain
  * TARGET corpus and a huge RAW pool, score every raw document by how
  * target-like it is under cheap bag-of-words language models, then
  * keep the top-k (deterministic) or Gumbel-sample k proportional to
  * the importance weights (the paper's resampling form).
  *
  * Model: add-λ-smoothed unigram models over the UNION vocabulary,
  *   p(w) = (c_t(w)+λ) / (T_t+λV)   (target)
  *   q(w) = (c_q(w)+λ) / (T_q+λV)   (raw)
  * and the per-document log importance weight is the sum over token
  * OCCURRENCES of log(p(w)/q(w)) — exactly the paper's hashed-ngram
  * estimator with the hash replaced by the exact word identity (the
  * SQL-reproducible form; Zipf bounds the vocab table the same way
  * the paper's fixed bucket count does).
  *
  * Scale shape: both corpora are read once and never shuffled — the
  * two count aggregations exchange vocab-bounded (word, count) rows,
  * the log-ratio table joins to the raw token stream BROADCAST, and
  * the only wide exchange of doc-shaped data is the per-doc partial
  * sum. Selection is a TakeOrdered (top-k heap), not a global sort.
  * At web scale the union vocab of a 100 TB pool still fits a
  * broadcast (hundreds of MB of distinct words after Zipf truncation
  * — and `maxVocab` hard-caps it); the corpus-side cost is the same
  * two narrow passes any tokenizing gate already pays.
  *
  * Determinism contract (the repo standard): per-token log-ratios
  * round to 9 decimals and sum as exact decimals, the final weight
  * rounds to 6 — identical on any partitioning and reproducible by
  * the DuckDB oracle; ties in selection break on doc_id.
  */
object Dsir {

  /** Vocab-bounded log-ratio model: one row per union-vocab word,
    * `logratio` = round(log(p(w)/q(w)), 9) as decimal(30,12).
    * `maxVocab` keeps only the most frequent words by combined count
    * (ties: word asc) — the paper's fixed feature budget; 0 = entire
    * union vocab.
    */
  def logRatioModel(target: DataFrame, raw: DataFrame, lambda: Double = 1.0,
                    maxVocab: Int = 0, textCol: String = "text"): DataFrame = {
    require(lambda > 0, s"lambda must be > 0 for smoothing: $lambda")
    def counts(df: DataFrame) = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ct = counts(target).withColumnRenamed("cnt", "c_t")
    val cq = counts(raw).withColumnRenamed("cnt", "c_q")
    // full outer: target-only words score high, raw-only words low —
    // both matter (that asymmetry IS the signal)
    val joined = ct.join(cq, Seq("w"), "full_outer")
      .select(col("w"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_q"), lit(0L)).as("c_q"))
    val vocab =
      if (maxVocab > 0)
        joined.orderBy((col("c_t") + col("c_q")).desc, col("w").asc)
          .limit(maxVocab)
      else joined
    // totals over the KEPT vocab so p and q stay proper distributions
    // under truncation; 1-row frames, BNLJ of one row
    val tot = vocab.agg(
      sum("c_t").cast("double").as("t_t"),
      sum("c_q").cast("double").as("t_q"),
      count(lit(1)).cast("double").as("v"))
    vocab.crossJoin(broadcast(tot))
      .select(col("w"),
        round(log(
          ((col("c_t").cast("double") + lit(lambda)) / (col("t_t") + lit(lambda) * col("v"))) /
            ((col("c_q").cast("double") + lit(lambda)) / (col("t_q") + lit(lambda) * col("v")))), 9)
          .cast("decimal(30,12)").as("logratio"))
  }

  /** Per-raw-document log importance weight: Σ over token occurrences
    * of logratio(w), rounded to 6 decimals, with the token count
    * alongside. Documents whose every token misses the (possibly
    * truncated) vocab still appear, with weight 0 and n_tokens
    * counting only scored tokens — absent evidence is neutral, as in
    * the paper (unseen buckets contribute nothing).
    */
  def importanceWeights(target: DataFrame, raw: DataFrame, lambda: Double = 1.0,
                        maxVocab: Int = 0, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val model = logRatioModel(target, raw, lambda, maxVocab, textCol)
    val toks = raw
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // left join + per-doc ids frame: vocab truncation must not drop docs
    val ids = raw.select(col(idCol))
    val scored = toks.join(broadcast(model), Seq("w"), "left")
      .groupBy(idCol)
      .agg(count(col("logratio")).as("n_tokens"),
        coalesce(sum(col("logratio")), lit(BigDecimal(0)).cast("decimal(30,12)"))
          .as("sum_lr"))
    ids.join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("sum_lr"), lit(BigDecimal(0)).cast("decimal(30,12)"))
          .cast("double"), 6).as("log_weight"))
  }

  /** The paper's ACTUAL hashed-ngram estimator: words fold into
    * `buckets` hash buckets (xxhash64, the engine-native hash) and the
    * add-λ models are fit over bucket counts — no vocab table at all,
    * so the model is a FIXED `buckets`-row frame at any corpus size
    * (the exact-word form needs `maxVocab` for that bound; this form
    * gets it by construction, at the price of hash collisions merging
    * word statistics — the trade Xie et al. accept). Same scale shape
    * as [[logRatioModel]]: corpora read once, bucket-keyed count aggs,
    * broadcast model join. When `buckets` comfortably exceeds the
    * union vocab, collisions are rare and the per-doc weights equal
    * the exact-word form's (spec-pinned); engine-specific hashing
    * makes this rows-only territory, like every xxhash64 consumer.
    */
  def importanceWeightsHashed(target: DataFrame, raw: DataFrame, buckets: Int,
                              lambda: Double = 1.0, textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets must be > 0: $buckets")
    require(lambda > 0, s"lambda must be > 0 for smoothing: $lambda")
    def counts(df: DataFrame) = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(pmod(xxhash64(col("w")), lit(buckets.toLong)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    val ct = counts(target).withColumnRenamed("cnt", "c_t")
    val cq = counts(raw).withColumnRenamed("cnt", "c_q")
    val joined = ct.join(cq, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_q"), lit(0L)).as("c_q"))
    val tot = joined.agg(
      sum("c_t").cast("double").as("t_t"),
      sum("c_q").cast("double").as("t_q"),
      count(lit(1)).cast("double").as("v"))
    val model = joined.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("c_t").cast("double") + lit(lambda)) / (col("t_t") + lit(lambda) * col("v"))) /
            ((col("c_q").cast("double") + lit(lambda)) / (col("t_q") + lit(lambda) * col("v")))), 9)
          .cast("decimal(30,12)").as("logratio"))
    val toks = raw
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col(idCol), pmod(xxhash64(col("w")), lit(buckets.toLong)).as("b"))
    val ids = raw.select(col(idCol))
    val scored = toks.join(broadcast(model), Seq("b"), "left")
      .groupBy(idCol)
      .agg(count(col("logratio")).as("n_tokens"),
        coalesce(sum(col("logratio")), lit(BigDecimal(0)).cast("decimal(30,12)"))
          .as("sum_lr"))
    ids.join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("sum_lr"), lit(BigDecimal(0)).cast("decimal(30,12)"))
          .cast("double"), 6).as("log_weight"))
  }

  /** Deterministic selection: top-k raw docs by log importance weight
    * (ties: doc_id asc) — the greedy form, and the SQL-oracle-checked
    * entry point. TakeOrdered: no global sort of the pool.
    */
  def selectTopK(target: DataFrame, raw: DataFrame, k: Int, lambda: Double = 1.0,
                 maxVocab: Int = 0, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    importanceWeights(target, raw, lambda, maxVocab, textCol, idCol)
      .orderBy(col("log_weight").desc, col(idCol).asc)
      .limit(k)

  /** Gumbel-top-k resampling — the paper's actual estimator: sampling
    * k docs WITHOUT replacement with probability ∝ exp(log_weight / T)
    * is exactly taking the top k of log_weight/T + Gumbel(0,1) noise.
    * Noise is derived from xxhash64(idCol, seed): fully deterministic
    * given the seed (replay-idempotent, partitioning-independent), yet
    * distributionally uniform across docs. T→0 recovers [[selectTopK]];
    * T=1 is the paper's setting.
    */
  def selectGumbel(target: DataFrame, raw: DataFrame, k: Int, seed: Long,
                   temperature: Double = 1.0, lambda: Double = 1.0,
                   maxVocab: Int = 0, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(temperature > 0, s"temperature must be > 0: $temperature")
    val w = importanceWeights(target, raw, lambda, maxVocab, textCol, idCol)
    // u in (0,1): 53 mantissa bits of the hash, never exactly 0 or 1
    val u = ((shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0))
    w.withColumn("gumbel_key",
        col("log_weight") / lit(temperature) + -log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }
}

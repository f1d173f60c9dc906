package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set, one narrow pass over the corpus, per-query top-k via window.
  * Scale path: random-hyperplane LSH bucketing — signatures map-side,
  * then candidates only within a bucket.
  *
  * All folds are sequential `aggregate` over double-cast arrays so the
  * arithmetic is reproducible (and matches an oracle computing the
  * same left-to-right sum).
  */
object Similarity {

  private[sim] def toDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential left-fold dot product of two double arrays — a
    * codegen'd kernel expression (bit-identical to the
    * `aggregate(zip_with(...))` formulation and to DuckDB's
    * list_dot_product, but without per-pair array allocation).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Symmetric int8 quantization of an embedding column — the storage
    * form for vector corpora at 100 TB (4× smaller than float32;
    * cosine typically degrades < 1e-2 at 64-4096 dims). Per vector:
    * scale = max|x| / 127, q_i = clamp(floor(x_i / scale + 0.5), ±127);
    * the zero vector gets scale 0 and an all-zero qvec.
    *
    * Rounding is an EXPLICIT floor(x + 0.5), not round(): round()'s
    * half-mode differs across engines while floor of an IEEE double is
    * bit-deterministic everywhere, so the SQL oracle reproduces every
    * quantized component exactly. Pure codegen'd array expressions —
    * one narrow map, zero shuffle.
    */
  /** Matryoshka-style dimensionality truncation (MRL: nested prefixes
    * of a trained embedding remain usable at reduced cost): keep the
    * first `dims` components, L2-renormalize, and report the norm
    * accounting — `norm_full`, `norm_trunc`, and `frac_norm` (how
    * much of the vector's length the prefix retains; the per-corpus
    * distribution of this is the "can we afford 4× cheaper ANN"
    * dashboard number). Pure per-row codegen'd array expressions —
    * zero shuffle, column-prunable; dot products over the truncated
    * column drop 1 - dims/d of the FLOPs and bytes everywhere
    * downstream (index build, probe, rerank).
    */
  def truncateDims(df: DataFrame, dims: Int,
                   vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, s"dims >= 1: $dims")
    val t = slice(col(vecCol), 1, dims)
    def norm(c: Column) = sqrt(aggregate(toDouble(c), lit(0.0), (a, x) => a + x * x))
    df.withColumn("norm_full", round(norm(col(vecCol)), 6))
      .withColumn("norm_trunc", round(norm(t), 6))
      .withColumn("frac_norm",
        round(norm(t) / norm(col(vecCol)), 6))
      .withColumn("embedding_trunc",
        transform(t, x => x.cast("double") / norm(t)))
  }

  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__mx", expr("array_max(transform(__v, x -> abs(CAST(x AS DOUBLE))))"))
      .select(col(idCol),
        expr("CASE WHEN __mx = 0 THEN CAST(0 AS DOUBLE) ELSE __mx / 127 END").as("scale"),
        expr("transform(__v, x -> CAST(greatest(-127, least(127, " +
          "floor(CAST(x AS DOUBLE) * (CASE WHEN __mx = 0 THEN 0 ELSE 127 / __mx END) + 0.5))) AS INT))")
          .as("qvec"))
      .orderBy(idCol)

  /** Inverse of [[quantizeInt8]]: x̂_i = q_i · scale (max error
    * scale/2 per component).
    */
  def dequantizeInt8(df: DataFrame, scaleCol: String = "scale",
                     qvecCol: String = "qvec"): DataFrame =
    df.withColumn("embedding",
      transform(col(qvecCol), q => q.cast("double") * col(scaleCol)))

  /** Exact cosine top-k: for each query vector, the `k` nearest corpus
    * vectors by cosine similarity (self excluded). The query side is
    * broadcast; the corpus is scanned once — no shuffle of vectors.
    */
  /** cosine with per-side precomputed self-dots (same fp values as
    * `cosine`, but the O(pairs) stage reuses the O(rows) norms).
    */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (sqrt(na) * sqrt(nb))

  /** Per-query top-k of scored candidates via the k-bounded heap
    * aggregate (graft.functions.TopK) — shuffles k pairs per query
    * instead of window-sorting every candidate row. Tie-break: score
    * desc, neighbor_id asc (identical to the row_number formulation).
    */
  private[sim] def topKSelect(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topKByScore(
        col("sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("neighbor_id"), round(col("p.score"), 6).as("cos_sim"))
      .orderBy("query_id", "rank")

  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("va"))
      .withColumn("na", dot(col("va"), col("va")))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("vb"))
      .withColumn("nb", dot(col("vb"), col("vb")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosinePre(col("va"), col("vb"), col("na"), col("nb")))
    topKSelect(scored, k)
  }

  /** Cosine top-k over INT8-QUANTIZED, BYTE-PACKED vectors — the
    * memory/IO-bound form of [[cosineTopK]]. Vectors quantize
    * symmetrically ([[quantizeInt8]]) and pack to one byte per
    * component (graft.functions.Int8Pack): a 64-dim corpus column
    * shrinks ~4x vs float32, which at 100 TB is the scan + broadcast
    * budget of brute-force search. Scoring is the exact integer dot
    * kernel (Int8Dot, codegen'd); the per-vector quantization scale
    * cancels in the cosine normalization, so the quantized cosine is
    * the true cosine of the ROUNDED vectors — ranking error is bounded
    * by quantization noise (spec pins recall@k vs the exact path).
    * Same output shape and tie contract as [[cosineTopK]].
    */
  def cosineTopKQuantized(corpus: DataFrame, queries: DataFrame, k: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorOps.{int8dot, int8pack}
    def packed(df: DataFrame, outId: String) =
      quantizeInt8(df, vecCol, idCol)
        .select(col(idCol).as(outId), int8pack(col("qvec")).as("p"))
        .withColumn("n2", int8dot(col("p"), col("p")))
    val c = packed(corpus, "neighbor_id")
    val q = packed(queries, "query_id")
      .withColumnRenamed("p", "pq").withColumnRenamed("n2", "nq2")
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        int8dot(col("p"), col("pq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("nq2").cast("double"))))
    topKSelect(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) with
    * cosine ≥ threshold — the exact, oracle-checkable BASELINE for
    * small inputs / low thresholds, O(n²) by construction (broadcast
    * nested loop). Library callers dedup a corpus at scale via
    * [[nearDupPairsLsh]]: same verification, but candidates come from
    * a bucket join, never the cross product. This form exists to
    * oracle-check the verification math and to serve low-threshold
    * queries (cos < ~0.8), where bucketing cannot bound candidates.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("vec_a"), toDouble(col(vecCol)).as("va"))
      .withColumn("na", dot(col("va"), col("va")))
    val b = corpus.select(col(idCol).as("vec_b"), toDouble(col(vecCol)).as("vb"))
      .withColumn("nb", dot(col("vb"), col("vb")))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim", cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram `TextAnalysis.decontaminate`: flag every corpus vector
    * whose cosine to ANY eval-set vector reaches `threshold`, with the
    * offending eval id (argmax cosine, ties → min eval id). N-gram
    * decontamination misses paraphrases; this is the
    * paraphrase-robust gate modern pipelines (phi-style) layer on top,
    * at the price of needing embeddings.
    *
    * Scale shape: the eval set is benchmark-sized — it BROADCASTS, the
    * corpus streams through one nested-loop scoring pass (the same
    * budget any brute-force query join pays), and the `sim >=
    * threshold` filter runs BEFORE the per-vector argmax aggregation,
    * so the exchange carries only flagged candidates (a tiny fraction
    * of corpus × eval). Filtering before the argmax is lossless: a
    * vector appears in the output iff its max ≥ threshold, and the max
    * over the ≥-threshold subset IS the overall max.
    *
    * Determinism: cosines round to 6 dp BEFORE the argmax, so the
    * ranking (and its min-eval-id tie break) is reproducible by a SQL
    * oracle across engines' ulp drift.
    */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), toDouble(col(vecCol)).as("va"))
      .withColumn("na", dot(col("va"), col("va")))
    val e = evalSet.select(col(idCol).as("eval_id"), toDouble(col(vecCol)).as("vb"))
      .withColumn("nb", dot(col("vb"), col("vb")))
    c.join(broadcast(e))
      .withColumn("sim",
        round(cosinePre(col("va"), col("vb"), col("na"), col("nb")), 6))
      .filter(col("sim") >= threshold)
      .groupBy(idCol)
      .agg(max(struct(col("sim"), (-col("eval_id")).as("negId"))).as("m"))
      .select(col(idCol), (-col("m.negId")).as("eval_id"),
        col("m.sim").as("cos_sim"))
      .orderBy(idCol)
  }

  /** Embedding near-duplicate pairs AT SCALE: multi-band random-
    * hyperplane LSH candidate generation + exact-cosine verification —
    * the bucketed replacement for [[nearDupPairs]]'s cross product.
    *
    * Plan shape (the 100 TB story):
    *  1. every band bucket is computed in ONE kernel pass per vector
    *     (array of codegen'd `lshBucket` projections), then posexplode
    *     — not a per-band union, which would rescan the corpus `bands`
    *     times;
    *  2. the candidate self-join shuffles (band, bucket, id) tuples
    *     only — vectors never ride through the join;
    *  3. `distinct` collapses multi-band hits, then candidates
    *     rehydrate their two vectors by id and verify with the exact
    *     kernel cosine — identical arithmetic to the baseline, so any
    *     pair both paths emit carries the identical score.
    *
    * Recall: a pair at angle θ survives a band of `p` planes with
    * probability (1 − θ/π)^p and is a candidate if ≥ 1 of `bands`
    * bands agrees — for genuine near-dups (cos ≥ 0.95, θ ≤ 0.32) the
    * miss rate at the defaults is < 1e-6 per pair; identical vectors
    * (cos = 1) collide in every band, so recall on exact dups is 1 by
    * construction. More `planesPerBand` → smaller buckets (fewer false
    * candidates); more `bands` → higher recall.
    *
    * Output-size caveat (measured in the scale soak): if the corpus
    * contains a near-dup CLIQUE of size m, the pair list is Θ(m²) —
    * that is the answer's size, not a plan flaw. For corpus PRUNING
    * (the usual goal) don't materialize all pairs: feed these pairs
    * into `Clusters.dedupByComponents`, which keeps one representative
    * per component and never stores a clique's full pair set
    * downstream.
    */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double,
                      bands: Int = 8, planesPerBand: Int = 16,
                      dims: Int = 64,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      seed: Long = 42L): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val bucketArr = array((0 until bands).map(b =>
      lshBucketCol(col("v"), hyperplanes(planesPerBand, dims, seed + b))): _*)
    val buckets = base.select(col("id"),
      posexplode(bucketArr).as(Seq("band", "bkey")))
    val candA = buckets.select(col("band"), col("bkey"), col("id").as("vec_a"))
    val candB = buckets.select(col("band"), col("bkey"), col("id").as("vec_b"))
    val cand = candA.join(candB, Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val va = base.select(col("id").as("vec_a"), col("v").as("va"))
      .withColumn("na", dot(col("va"), col("va")))
    val vb = base.select(col("id").as("vec_b"), col("v").as("vb"))
      .withColumn("nb", dot(col("vb"), col("vb")))
    cand.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("sim", cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Deterministic pseudo-random hyperplanes (seeded Gaussian),
    * generated driver-side — tiny (planes × dims doubles) and baked
    * into the plan as literals, i.e. broadcast for free.
    */
  def hyperplanes(numPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dims)(rnd.nextGaussian())
  }

  /** Sign-of-projection LSH bucket id (one bit per hyperplane) — a
    * single kernel pass; the plane matrix is an expression reference
    * object, not inlined literals.
    */
  def lshBucketCol(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.CentroidOps.lshBucket(vec, planes)

  /** Bucket histogram — the data-distribution view of the LSH index. */
  def lshBucketSizes(corpus: DataFrame, numPlanes: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     seed: Long = 42L): DataFrame = {
    val dims = 64
    val planes = hyperplanes(numPlanes, dims, seed)
    corpus.withColumn("bucket", lshBucketCol(toDouble(col(vecCol)), planes))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col(idCol)).as("min_vec_id"))
      .orderBy("bucket")
  }

  /** ANN via LSH: candidates share the query's bucket; exact cosine
    * re-rank of candidates only — a bucket equi-join instead of a
    * cross product, at the cost of recall.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int,
             dims: Int, idCol: String = "vec_id",
             vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dims, seed)
    val cb = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("va"))
      .withColumn("bucket", lshBucketCol(col("va"), planes))
      .withColumn("na", dot(col("va"), col("va")))
    val qb = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("vb"))
      .withColumn("bucket", lshBucketCol(col("vb"), planes))
      .withColumn("nb", dot(col("vb"), col("vb")))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosinePre(col("va"), col("vb"), col("na"), col("nb")))
    // one bucket per vector => each (query, neighbor) pair scores once
    topKSelect(scored, k)
  }
}

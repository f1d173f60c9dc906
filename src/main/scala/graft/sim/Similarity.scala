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

  /** Embedding-cosine near-duplicate pairs: all (a < b) with
    * cosine ≥ threshold — the exact, oracle-checkable baseline.
    * One side is broadcast; filter applies before any rounding.
    * Scale path: the same verification over LSH candidates only
    * (`annLsh`-style bucket join) instead of the cross product.
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

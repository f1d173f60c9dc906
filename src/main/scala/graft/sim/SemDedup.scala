package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.toDouble

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication") — the embedding-space
  * dedup used between exact/MinHash passes and training: cluster the
  * corpus with k-means, then prune pairs above a cosine threshold
  * WITHIN each cluster only, so the quadratic comparison is paid per
  * cluster instead of per corpus. (Reference repo has no counterpart;
  * this is part of the mandated LLM-pipeline surface.)
  *
  * Scale design (100 TB embedding corpus):
  *  - clustering is [[Ivf.train]]: deterministic hash-sample k-means,
  *    centroids baked into a codegen'd map-side argmax — assignment
  *    SHUFFLES NOTHING on the corpus.
  *  - the only corpus exchange is the per-cluster grouping; members
  *    carry (id, normalized vector), and pairwise cosine runs inside
  *    codegen via the same combination-generation shape as the LSH
  *    candidate paths (normalized ⇒ dot = cosine, one fold per pair).
  *  - per-cluster work is quadratic BY DESIGN (that is the paper's
  *    trade: nlist controls the cluster-size budget — size `nlist`
  *    with corpus growth to keep expected members², and therefore
  *    per-task cost, bounded). The collect_list row for one cluster
  *    is members × (dims × 8 B); keep expected members in the 10³-10⁴
  *    range at any corpus size.
  *
  * Determinism: k-means is deterministic ([[Ivf.train]]), nearest-
  * centroid ties go to the lowest centroid id, and pair output is
  * (a < b) with a deterministic sort — same clusters, same pairs, on
  * any partitioning.
  */
object SemDedup {

  /** Pairs (a < b, cosine ≥ `tau`) that share a k-means cluster.
    * `cos_sim` rounds to 6 decimals for a stable output contract.
    *
    * `nlist <= 0` self-tunes: nlist = ceil(n / targetMembers). A FIXED
    * nlist is the scale trap here: clusters grow linearly with the
    * corpus and the per-cluster pairwise pass quadratically (the soak
    * measured 6.7× wall at 8× volume); the auto mode keeps expected
    * members — and so per-task cost — flat at any corpus size.
    *
    * Sizing cost: auto mode needs n. Pass `knownCount` when the caller
    * already knows it (a catalog row count, [[graft.sources.ParquetMeta
    * .rowCount]] over the source files — a driver-side footer read, no
    * job) and the sizing is FREE; otherwise auto mode runs one
    * O(corpus) `count()` job per call (footer-fast only when the input
    * is a raw parquet scan — any upstream projection/union makes it a
    * real pass, measured ~0.4 s of d_semdedup's bench time at sf0.1).
    */
  def semanticNearDups(corpus: DataFrame, tau: Double,
                       nlist: Int = 16, iters: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       targetMembers: Int = 128,
                       knownCount: Long = -1L): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"cosine threshold out of range: $tau")
    require(targetMembers >= 2, s"targetMembers must be >= 2, got $targetMembers")
    // cap at Ivf.train's sample bound: a 10k-point sample supports at
    // most 10k centroids (beyond ~targetMembers·10k vectors, raise
    // sampleMax or cluster hierarchically)
    val k =
      if (nlist > 0) nlist
      else {
        val n = if (knownCount >= 0) knownCount else corpus.count()
        math.max(1L, (n + targetMembers - 1) / targetMembers)
          .min(10000L).toInt
      }
    val cents = Ivf.train(corpus, k, iters, idCol = idCol, vecCol = vecCol)
    val assigned = corpus.select(
      col(idCol).as("id"),
      Ivf.normalize(toDouble(col(vecCol))).as("v"))
      .withColumn("cluster", Ivf.nearestCentroid(col("v"), cents))
    assigned.groupBy("cluster")
      .agg(collect_list(struct(col("id"), col("v"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .withColumn("xs", array_sort(col("xs"))) // ids unique -> sorts by id
      .select(explode(expr(
        """flatten(transform(xs, (x, i) ->
          |  transform(slice(xs, i + 2, size(xs)),
          |            y -> struct(x.id AS vec_a, y.id AS vec_b,
          |                        aggregate(zip_with(x.v, y.v, (p, q) -> p * q),
          |                                  CAST(0.0 AS DOUBLE), (acc, e) -> acc + e)
          |                          AS cs))))""".stripMargin)).as("p"))
      .filter(col("p.cs") >= tau)
      .select(col("p.vec_a"), col("p.vec_b"),
        round(col("p.cs"), 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Prune the corpus: of every semantic-duplicate component (pairs
    * above `tau` within a cluster, closed transitively), only the
    * min-id member survives; unique rows pass through untouched.
    */
  def dedupBySemantic(corpus: DataFrame, tau: Double,
                      nlist: Int = 16, iters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      knownCount: Long = -1L): DataFrame = {
    val pairs = semanticNearDups(corpus, tau, nlist, iters, idCol, vecCol,
      knownCount = knownCount)
    graft.dedup.Clusters.dedupByComponents(
      corpus, pairs, idCol, "vec_a", "vec_b")
  }

  /** Prototypicality scoring (Sorscher et al. 2022, "Beyond neural
    * scaling laws" — SSL-prototypes): cosine of every vector to its
    * nearest k-means prototype. The data-pruning signal that paper
    * ranks by: far-from-every-prototype vectors are either noise
    * (drop the low tail when data is abundant) or the hard examples
    * worth keeping (drop the HIGH tail when data is scarce) — this
    * emits the score and cluster id; the cut is the caller's policy.
    *
    * Scale shape: training is the bounded-sample [[Ivf.train]];
    * scoring is a single narrow pass — the codegen'd map-side
    * nearest-centroid argmax assigns, and the prototype cosine comes
    * from a BROADCAST join against the nlist-row centroid table
    * (normalized there, so dot = cosine). ZERO corpus shuffle; the
    * output is deterministic on any partitioning (same contract as
    * [[semanticNearDups]]: hash-sample k-means + lowest-id argmax
    * ties + 6 dp rounding), but float k-means is not SQL-expressible,
    * so the check is spec-level, not an oracle.
    */
  def prototypicality(corpus: DataFrame, nlist: Int = 16, iters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Ivf.train(corpus, nlist, iters, idCol = idCol, vecCol = vecCol)
    // centroids re-normalized driver-side: mean of unit vectors is not
    // unit length, and cos(v, c) needs ĉ — nlist rows, broadcast
    val centsDf = cents.zipWithIndex.map { case (c, i) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      (i, if (n > 0) c.map(_ / n).toSeq else c.toSeq)
    }.toSeq.toDF("cluster", "__c")
    corpus
      .select(col(idCol), Ivf.normalize(toDouble(col(vecCol))).as("__v"))
      .withColumn("cluster", Ivf.nearestCentroid(col("__v"), cents))
      .join(broadcast(centsDf), "cluster")
      .select(col(idCol), col("cluster"),
        round(graft.functions.VectorOps.dot(col("__v"), col("__c")), 6)
          .as("proto_cos"))
      .orderBy(idCol)
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dot, toDouble}

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * classic coarse-quantizer scale path for embedding search: train
  * `nlist` centroids (spherical k-means on a deterministic sample),
  * assign every corpus vector to its nearest centroid (the "inverted
  * list"), and answer a query by exact re-ranking within only the
  * `nprobe` lists whose centroids are nearest to the query.
  *
  * Scale design (100 TB corpus):
  *  - training touches only a hash-deterministic sample (standard IVF
  *    practice); each Lloyd step is distributed (assign map-side,
  *    per-(centroid, dim) mean via one shuffle of the sample).
  *  - centroids are nlist × dims doubles — baked into the plan as
  *    literals, i.e. broadcast for free; assignment is a map-side
  *    codegen'd argmin, no shuffle of the corpus.
  *  - the search join shuffles nothing on the corpus side either: the
  *    exploded (query × probe) side is broadcast, candidates stream
  *    per-partition; per-query top-k via window over candidates only.
  */
object Ivf {

  /** L2-normalize (zero vectors pass through unchanged) — one kernel
    * pass per row; see [[graft.functions.VectorKernels.l2normalize]].
    */
  private[sim] def normalize(v: Column): Column =
    graft.functions.VectorOps.l2normalize(v)

  /** Nearest centroid id of a normalized vector (map-side argmax dot,
    * ties to the lowest id). The centroid matrix rides along as an
    * expression reference object — see
    * [[graft.functions.CentroidKernels]] for why not literal arrays.
    */
  def nearestCentroid(vec: Column, cents: Array[Array[Double]]): Column =
    graft.functions.CentroidOps.nearestCentroid(vec, cents)

  /** The `nprobe` nearest centroid ids, nearest first. */
  def probeCentroids(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    graft.functions.CentroidOps.probeCentroids(vec, cents, nprobe)

  /** Spherical k-means on a deterministic sample: init = first `nlist`
    * vectors in xxhash64(id) order, then `iters` Lloyd steps. Each
    * step is distributed; only the (nlist × dims) means are collected.
    * Empty clusters keep their previous centroid.
    */
  def train(corpus: DataFrame, nlist: Int, iters: Int,
            sampleMax: Int = 10000, idCol: String = "vec_id",
            vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample = corpus
      .select(col(idCol).as("id"), normalize(toDouble(col(vecCol))).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleMax)
      .cache()
    var cents: Array[Array[Double]] = sample.limit(nlist).collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(cents.length == nlist, s"sample smaller than nlist=$nlist")
    for (_ <- 0 until iters) {
      val means = sample
        .withColumn("cid", nearestCentroid(col("v"), cents))
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .collect()
      val byCid: Map[Int, Array[Row]] = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        byCid.get(i) match {
          case Some(rows) =>
            val m = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
            val norm = math.sqrt(m.map(x => x * x).sum)
            if (norm > 0) m.map(_ / norm) else old
          case None => old
        }
      }
    }
    sample.unpersist()
    cents
  }

  /** ANN top-k via IVF: candidates are corpus vectors whose inverted
    * list is among the query's `nprobe` probed lists; exact cosine
    * (dot of normalized vectors) re-rank of candidates only.
    */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int,
             cents: Array[Array[Double]], nprobe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), normalize(toDouble(col(vecCol))).as("va"))
      .withColumn("cid", nearestCentroid(col("va"), cents))
    val q = queries
      .select(col(idCol).as("query_id"), normalize(toDouble(col(vecCol))).as("vb"))
      .withColumn("cid", explode(probeCentroids(col("vb"), cents, nprobe)))
    val scored = c.join(broadcast(q), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("va"), col("vb")))
    // nprobe > 1 explodes the query over distinct cids; the corpus side
    // has one cid per vector, so each (query, neighbor) pair scores once
    Similarity.topKSelect(scored, k)
  }

  /** Inverted-list histogram — the data-distribution view of the index
    * (bucket sizes drive nprobe/recall trade-offs).
    */
  def listSizes(corpus: DataFrame, cents: Array[Array[Double]],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("cid", nearestCentroid(normalize(toDouble(col(vecCol))), cents))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"), min(col(idCol)).as("min_vec_id"))
      .orderBy("cid")
}

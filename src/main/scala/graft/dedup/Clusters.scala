package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS from candidate pairs — the step between
  * pair generation (MinHash/SimHash/embedding) and corpus pruning:
  * connected components over the pair graph, then keep one
  * representative per component.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the min of
  * its own and its neighbors' labels; stop when a round changes
  * nothing. Rounds needed ≤ the graph diameter (near-dup clusters are
  * shallow — a handful of rounds); each round is one self-join +
  * aggregation on the (vertex, label) table, no driver-side graph.
  * Deterministic: the component id IS the min vertex id.
  */
object Clusters {

  /** (id, component) for every vertex appearing in `pairs`; component
    * = min id reachable. `maxIter` bounds the label-propagation rounds
    * (diameter cap); iteration stops early on convergence.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // symmetric edge list
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each vertex pulls neighbors' labels; keep the min of own + pulled
      val pulled = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"))
      val next = labels.unionByName(pulled)
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Prune a corpus: drop every doc that shares a component with a
    * smaller-id doc (the component representative survives; docs with
    * no near-dup pair survive untouched).
    */
  def dedupByComponents(docs: DataFrame, pairs: DataFrame,
                        idCol: String = "doc_id",
                        aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}

package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS from candidate pairs — the step between
  * pair generation (MinHash/SimHash/embedding) and corpus pruning:
  * connected components over the pair graph, then keep one
  * representative per component.
  *
  * Algorithm: iterative min-label propagation with ESCALATING pointer
  * doubling. Every vertex starts labeled with its own id; each round
  * every vertex takes the min of its own and its neighbors' labels
  * (pull); stop when a round changes nothing. Shallow graphs (the
  * near-dup common case) converge in ≤ diameter pull rounds. A graph
  * still unconverged after 4 rounds is deep, so later rounds append
  * two pointer-doubling shortcuts (comp[v] := comp[comp[v]]) to the
  * pull — label-chain compression makes coverage grow geometrically,
  * so a diameter-d path converges in O(log d) rounds instead of O(d).
  * Each round is still ONE materialization job, and at 100 TB round
  * count is the cost that matters: every round is a full shuffle of
  * the vertex table. Deterministic: the component id IS the min
  * vertex id.
  */
object Clusters {

  /** (id, component) for every vertex appearing in `pairs`; component
    * = min id reachable. `maxIter` bounds the label-propagation rounds
    * (diameter cap); iteration stops early on convergence.
    *
    * Each round is ONE materialization job: the aggregation carries the
    * vertex's previous label alongside the new min (tagged union, so no
    * extra join), and the round's `localCheckpoint` both executes it
    * and replaces the logical plan with the materialized RDD —
    * constant-size plans regardless of round count, no lineage growth,
    * no re-execution of earlier rounds on cache pressure. The
    * convergence probe then scans the in-memory result (`limit(1)`
    * short-circuit over checkpointed partitions — no recompute). On a
    * fault-tolerant cluster run, point `spark.sparkContext.
    * setCheckpointDir` at durable storage and swap `localCheckpoint`
    * for `checkpoint` if executor loss mid-job must be survivable.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          smallGraphEdges: Long = 1L << 20): DataFrame = {
    // symmetric edge list, materialized once — every round re-reads it.
    // Symmetrization is ONE generator (explode of the edge + its swap)
    // rather than a union of two projections of the pair subtree — the
    // union shape evaluates the whole upstream candidate generation +
    // verification (the expensive part — exact Jaccard over shingle
    // arrays) once per branch, or forces a barrier checkpoint of the
    // pair table first; the explode evaluates it exactly once in the
    // same job. Checkpointed HASH-PARTITIONED ON dst (the per-round
    // join key): localCheckpoint preserves physical partitioning, so
    // the label pull's shuffled join reshuffles only the (smaller)
    // label table each round — the edge table's exchange happens once
    // here, not once per round.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint()
    // the verified-candidate graph is orders of magnitude smaller than
    // the corpus (pairs, not documents) — when it fits comfortably on
    // the driver, a path-compressed union-find beats paying per-round
    // job + shuffle overhead for a few thousand rows. The budget is
    // JVM-realistic: each collected edge is a boxed Tuple2 row plus up
    // to two HashMap entries, ~150-200 B together, so the 2^20 default
    // is ~200 MB of driver heap — not the 16 B/edge a primitive layout
    // would suggest. The distributed loop below is
    // the general path for graphs that DON'T fit; the spec pins both
    // paths equal, and the driver's CC oracle query forces the loop
    // (smallGraphEdges = 0, which also skips the size-probe job) so
    // the iterative path stays hash-checked.
    if (smallGraphEdges > 0 && edges.count() <= smallGraphEdges)
      return unionFindLocal(edges)
    // round 0 fused into the init: with identity labels, the first
    // pull's result is exactly min(own id, neighbor ids) — one
    // aggregation over the (already materialized) edge table replaces
    // the identity-label table AND the first join round, saving a full
    // checkpoint+probe cycle per CC invocation. Every vertex appears
    // as src (the edge list is symmetric), so the vertex set is
    // complete; the loop below still detects convergence normally
    // (its first round compares against these fused labels).
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("comp"))
      .select(col("src").as("id"), col("comp"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each vertex pulls neighbors' labels; keep the min of own +
      // pulled. The own row is tagged so the same aggregation also
      // yields the previous label (min over a single tagged row) —
      // convergence detection costs no second join.
      val pulled = edges
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"), lit(false).as("own"))
      val pulledMin = labels.select(col("id"), col("comp"), lit(true).as("own"))
        .unionByName(pulled)
        .groupBy("id")
        .agg(min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
      // Pointer doubling (comp[v] := comp[comp[v]], twice), ESCALATED:
      // rounds 0-3 are plain pulls — near-dup clusters are shallow
      // (diameter ≤ 3 converges AND detects inside 4 pull rounds), and
      // the shortcut joins' extra exchanges cost more than the rounds
      // they save there (measured: +9-20% on the 4-chain oracle
      // graph). From round 4 on, an unconverged graph is deep, and each
      // shortcut roughly doubles the compressed label distance —
      // coverage grows ~4×/round, so a diameter-d chain converges in
      // O(log d) shuffle rounds instead of O(d) and cannot run out the
      // maxIter budget the way plain propagation does. Labels only ever
      // hold ids of vertices in the same component (pull invariant), so
      // the lookup join is a total map — coalesce keeps a missing id
      // from dropping a vertex. The shortcut joins sit in the SAME plan
      // as the pull: still one job per round.
      val next = (if (iter < 4) pulledMin
      else Seq(1, 2).foldLeft(pulledMin) { (cur, _) =>
        cur.join(
          cur.select(col("id").as("l_id"), col("comp").as("l_comp")),
          col("comp") === col("l_id"), "left")
          .select(col("id"), coalesce(col("l_comp"), col("comp")).as("comp"),
            col("prev"))
      }).localCheckpoint(false)
      // the round's SINGLE job: the full-scan convergence aggregation
      // is the action that materializes the lazy checkpoint — probe
      // and materialization fused, halving per-round driver
      // round-trips (a limit(1) probe would short-circuit and leave
      // partitions unmaterialized for the next round's join)
      val changed = next
        .agg(count(when(col("comp") =!= col("prev"), 1)))
        .first().getLong(0)
      labels = next.select("id", "comp")
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Driver-side path-compressed union-find over a collected edge
    * list; component id = min member id (same contract as the
    * distributed loop). Only reached under the bounded small-graph
    * threshold.
    */
  private def unionFindLocal(edges: DataFrame): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // halving
        x = parent(x)
      }
      x
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = parent.keys.toSeq.map(id => id -> find(id)).toMap
    val minOfRoot = comp.groupMapReduce(_._2)(_._1)(math.min)
    comp.toSeq.map { case (id, root) => (id, minOfRoot(root)) }
      .sortBy(_._1).toDF("id", "comp")
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

  /** Prune a corpus keeping the BEST member of each near-dup
    * component — the FineWeb-style refinement over [[dedupByComponents]]'
    * min-id rule: inside a cluster of near-duplicates, survival should
    * go to the highest-quality (or longest, or newest — any scoring
    * column) version, not the accidentally-smallest id. Representative
    * = argmax(`scoreCol`), ties broken by min id, so equal scores
    * degrade exactly to the min-id rule. Docs with no near-dup pair
    * survive untouched.
    *
    * Scale shape: the component table holds only docs that HAD a pair
    * (near-dup clusters are a small fraction of a deduped corpus); the
    * score join projects (id, score) — the corpus body never enters
    * the ranking shuffle, and the final prune is the same anti-join as
    * the min-id path. Batch-only by design: the incremental path
    * (curateDelta / streaming sinks) pins first-seen/min-id semantics
    * because an already-emitted representative cannot be retracted
    * when a better one arrives later.
    */
  def dedupByComponentsKeepBest(docs: DataFrame, pairs: DataFrame,
                                scoreCol: String,
                                idCol: String = "doc_id",
                                aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val scored = comps.join(
      docs.select(col(idCol).cast("long").as("id"), col(scoreCol).as("__s")), "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp")).orderBy(col("__s").desc, col("id").asc)
    val losers = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}

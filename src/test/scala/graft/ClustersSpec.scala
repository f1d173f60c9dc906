package graft

import graft.dedup.{Clusters, Dedup}

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents == union-find on a chain+clique+singleton-pair graph") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),           // chain -> comp 1
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle -> comp 10
      (20L, 21L),                             // pair -> comp 20
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L)) // clique + tail -> 30
    val want = ufComponents(edges)
    // small-graph fast path (default threshold)
    val fast = Clusters.connectedComponents(
      edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(fast == want)
    // distributed label-propagation loop (threshold forced to 0)
    val looped = Clusters.connectedComponents(
      edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b", smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(looped == want)
  }

  test("deep chain (diameter 63 > maxIter 20) converges via pointer-doubling escalation") {
    // plain pull-only propagation needs 63 rounds — over the default
    // maxIter budget. The escalating shortcut rounds compress the
    // chain geometrically, so this must converge to the exact
    // union-find answer well inside 20 rounds.
    val edges = (0L until 63L).map(i => (i, i + 1)) ++
      Seq((100L, 101L)) // plus a trivial pair to mix shallow + deep
    val want = ufComponents(edges)
    val looped = Clusters.connectedComponents(
      edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b", smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(looped == want)
    assert(looped.filter(_._1 <= 63L).values.toSet == Set(0L))
  }

  test("dedupByComponents keeps one representative per near-dup cluster") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg hh"),   // exact dup of 1
      (3L, "totally different text here entirely"),
      (4L, "aa bb cc dd ee ff gg xx"),   // near-dup of 1/2
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, 2, 32, 8, 0.3)
    val kept = Clusters.dedupByComponents(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(3L)) // untouched singleton
    assert(kept.contains(1L)) // cluster representative (min id)
    assert(!kept.contains(2L))
    // 4 survives only if minhash missed it; with jaccard>=0.3 over
    // 2-shingles it should cluster with 1
    assert(!kept.contains(4L))
  }

  test("dedupByComponentsKeepBest: argmax score survives, ties fall back to min id") {
    import org.apache.spark.sql.functions.col
    // components {1,2,3} (chain) and {10,11}; 20 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val docs = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.9), // argmax tie 2 vs 3 -> min id 2
      (10L, 0.5), (11L, 0.8),          // 11 wins despite larger id
      (20L, 0.0),                      // singleton untouched
    ).toDF("doc_id", "score")
    val kept = Clusters.dedupByComponentsKeepBest(docs, pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 11L, 20L))
    // equal scores degrade exactly to the min-id rule
    val flat = Clusters.dedupByComponentsKeepBest(
      docs.withColumn("score", col("score") * 0), pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    val minId = Clusters.dedupByComponents(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(flat == minId)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ivf, SemDedup, Similarity}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("semanticNearDups == brute-force pairs restricted to shared clusters") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val got = SemDedup.semanticNearDups(corpus, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // reference: exact all-pairs cosine, filtered to pairs sharing the
    // same nearest centroid under the SAME deterministic training
    val cents = Ivf.train(corpus, 16, 2)
    val assigned = corpus.select(col("vec_id"),
      Ivf.nearestCentroid(
        graft.functions.VectorOps.l2normalize(
          transform(col("embedding"), _.cast("double"))), cents).as("c"))
    val cluster = assigned.as[(Long, Int)].collect().toMap
    val allPairs: Set[(Long, Long)] = Similarity.nearDupPairs(corpus, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val brute = allPairs.filter { case (a, b) => cluster(a) == cluster(b) }
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("identical vectors always share a cluster: injected dup recall is total") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val pairs = SemDedup.semanticNearDups(corpus, 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // every (id, id+100000) injected pair must be recovered — an
    // identical vector maps to the identical nearest centroid
    val n = emb.count()
    val injected = (0L until n).map(i => (i, i + 100000)).toSet
    assert(injected.subsetOf(pairs))
  }

  test("auto nlist == explicit nlist at ceil(n/targetMembers); bounded members") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val n = corpus.count()
    val target = 50
    val expectK = ((n + target - 1) / target).toInt
    val auto = SemDedup.semanticNearDups(corpus, 0.95, nlist = 0,
        targetMembers = target)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = SemDedup.semanticNearDups(corpus, 0.95, nlist = expectK)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == explicit)
    assert(auto.nonEmpty)
    // knownCount path: sizing from a caller-supplied count (e.g. a
    // ParquetMeta footer read — no corpus job) is the SAME k, so the
    // same pairs; and ParquetMeta agrees with count() on real files
    val viaKnown = SemDedup.semanticNearDups(corpus, 0.95, nlist = 0,
        targetMembers = target, knownCount = n)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaKnown == explicit)
    assert(graft.sources.ParquetMeta.rowCount(spark,
      s"$sfDir/embeddings.parquet") * 2 == n)
  }

  test("dedupBySemantic keeps the min-id representative per component") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val kept = SemDedup.dedupBySemantic(corpus, 0.999)
      .select("vec_id").as[Long].collect().toSet
    // all originals survive; every injected copy is pruned (it pairs
    // with its original at cosine 1)
    val n = emb.count()
    assert((0L until n).forall(kept.contains))
    assert((0L until n).forall(i => !kept.contains(i + 100000)))
  }

  test("deterministic under repartitioning") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val a = SemDedup.semanticNearDups(emb, 0.9).collect().toSeq
    val b = SemDedup.semanticNearDups(emb.repartition(13), 0.9).collect().toSeq
    assert(a == b)
  }

  test("prototypicality: outlier scores below every cluster member; partition-invariant") {
    import org.apache.spark.sql.functions.col
    // two tight clusters + one vector equidistant from both prototypes
    val vecs = (
      (0 until 10).map(i => (i.toLong, Array(10f, (i % 3) * 0.1f, 0f))) ++
      (10 until 20).map(i => (i.toLong, Array(0f, 10f, (i % 3) * 0.1f))) ++
      Seq((99L, Array(1f, 1f, 1f)))
    ).toDF("vec_id", "embedding")
    val got = SemDedup.prototypicality(vecs, nlist = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 21)
    val memberMin = (0L until 20L).map(got).min
    assert(got(99L) < memberMin,
      s"outlier ${got(99L)} not below member floor $memberMin")
    // members sit essentially on their prototype
    assert(memberMin > 0.99)
    val again = SemDedup.prototypicality(vecs.repartition(7), nlist = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == got)
    // scores are bounded cosines
    assert(got.values.forall(v => v >= -1.000001 && v <= 1.000001))
  }
}

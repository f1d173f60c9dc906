package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks the aligned vector first") {
    val got = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(got(1) == 1L) // closest to (1,0,0) is (0.9,0.1,0)
  }

  test("bucketed near-dup (LSH) recall >= brute force on injected near-dups") {
    // perturbed copies of real embeddings: cos ~ 0.999 — genuine
    // near-dups, not byte-identical vectors
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val perturbed = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") * 1.001d + 0.0005d).cast("float")).as("embedding"))
    val corpus = emb.unionByName(perturbed)
    val brute = Similarity.nearDupPairs(corpus, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(corpus, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty) // every injected copy qualifies
    // recall: the bucketed path finds every pair the exact path finds
    assert(brute.subsetOf(lsh))
    // precision is exact by construction (candidates verify with the
    // same kernel cosine) — no extra pairs either
    assert(lsh == brute)
  }

  test("bucketed near-dup scores match the exact path bit-for-bit") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val brute = Similarity.nearDupPairs(corpus, 0.95)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(corpus, 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh == brute)
  }

  test("lsh ann: identical query finds its own bucket's neighbors deterministically") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val brute = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 5), 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annLsh(emb, emb.filter(col("vec_id") < 5), 3, 8, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // ANN trades recall for speed but must return valid, nonempty results
    assert(ann.nonEmpty)
    // determinism: rerun yields identical output
    val ann2 = Similarity.annLsh(emb, emb.filter(col("vec_id") < 5), 3, 8, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ann == ann2)
    assert(brute.nonEmpty)
  }

  test("semanticDecontaminate: argmax eval with min-id ties, sub-threshold silent") {
    val evalSet = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f)),  // cos 1.0 to eval 0
      (11L, Array(1.0f, 1.0f)),  // 0.707107 to BOTH -> tie -> eval 0
      (12L, Array(-1.0f, 0.0f)), // cos -1 and 0: below threshold, absent
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(corpus, evalSet, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((10L, 0L, 1.0), (11L, 0L, 0.707107)))
  }

  test("int8 quantize: bounded round-trip error, cosine preserved, zero vector safe") {
    val embs = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .unionByName(Seq((999999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val q = Similarity.quantizeInt8(embs)
    // every component within ±127 and per-component error ≤ scale/2
    val joined = Similarity.dequantizeInt8(q).select(col("vec_id"),
        col("scale"), col("qvec"), col("embedding").as("recon"))
      .join(embs.select(col("vec_id"), col("embedding").as("orig")), "vec_id")
    val bad = joined.filter(expr(
      """exists(qvec, v -> v < -127 OR v > 127) OR
        |exists(zip_with(recon, orig, (r, o) -> abs(r - CAST(o AS DOUBLE))),
        |       e -> e > scale / 2 + 1e-12)""".stripMargin)).count()
    assert(bad == 0)
    // zero vector: scale 0, all-zero qvec (no division blow-up)
    val z = q.filter(col("vec_id") === 999999L)
      .select(col("scale"), expr("exists(qvec, v -> v != 0)"))
      .as[(Double, Boolean)].head()
    assert(z == ((0.0, false)))
    // cosine between original and reconstruction stays ~1 on real vectors
    val minCos = joined.filter(col("vec_id") =!= 999999L)
      .select(min(Similarity.cosine(
        expr("transform(orig, x -> CAST(x AS DOUBLE))"), col("recon"))))
      .as[Double].head()
    assert(minCos > 0.995, s"min cosine after int8 round-trip: $minCos")
  }

  test("int8 pack/dot kernels: byte-exact pack, integer dot matches reference") {
    import graft.functions.VectorOps.{int8dot, int8pack}
    val rows = Seq(
      (1L, Array(1, -1, 127, -127, 0)),
      (2L, Array(100, 50, -3, 7, 9))).toDF("id", "v")
    val packed = rows.select(col("id"), int8pack(col("v")).as("p"))
    val bytes = packed.as[(Long, Array[Byte])].collect().toMap
    assert(bytes(1L).toSeq == Seq[Byte](1, -1, 127, -127, 0))
    assert(bytes(1L).length == 5) // ONE byte per component
    val d = packed.as("a").join(packed.as("b"),
        col("a.id") === 1 && col("b.id") === 2)
      .select(int8dot(col("a.p"), col("b.p"))).as[Long].head()
    assert(d == (1 * 100 + -1 * 50 + 127 * -3 + -127 * 7 + 0 * 9).toLong)
  }

  test("quantized cosine top-k: high recall vs the exact path") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ranks(Similarity.cosineTopK(emb, queries, k))
    val quant = ranks(Similarity.cosineTopKQuantized(emb, queries, k))
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, ex) =>
      quant(q).intersect(ex).size.toDouble / ex.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"mean recall@$k: $meanRecall")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("curate: no exact dups, quality gated, langs filtered, subset of input") {
    val out = Curation.curate(docs, minQuality = 0.2,
      keepLangs = Seq("en", "de"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // no two surviving docs share a text
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.distinct.length == texts.length)
    // gates hold
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.2)
      assert(Set("en", "de").contains(r.getAs[String]("pred_lang")))
    }
    // subset of the input ids
    val inIds = docs.select("doc_id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("doc_id")).forall(inIds.contains))
  }

  test("curate is deterministic under repartitioning") {
    val a = Curation.curate(docs, minQuality = 0.2, sampleFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.curate(docs.repartition(13), minQuality = 0.2,
      sampleFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("curate: learned classifier gate drops low-probability docs; None is identity") {
    import org.apache.spark.sql.functions._
    // plant the marker the model must reject: every doc_id % 4 == 0
    // carries junk tokens; train on those weak labels, gate at 0.5
    val marked = docs.withColumn("text",
      when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" zzjunk zzspam zzfiller"))).otherwise(col("text")))
    val labels = marked.select(col("doc_id"),
      (col("doc_id") % 4 =!= 0).cast("int").as("label"))
    val m = graft.pipeline.TextClassifier.train(marked, labels,
      dim = 1 << 13, iters = 6, lr = 1.0, l1Normalize = false)
    // the model must rank every junk doc below every clean doc; gate at
    // the midpoint of the learned margin (threshold choice is the
    // caller's calibration problem, not the gate's)
    val probs = graft.pipeline.TextClassifier.score(marked, m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val junkMax = probs.filter(_._1 % 4 == 0).map(_._2).max
    val cleanMin = probs.filter(_._1 % 4 != 0).map(_._2).min
    assert(junkMax < cleanMin, s"no learned separation: $junkMax vs $cleanMin")
    val gatedIds = Curation.curate(marked, minQuality = 0.2,
      classifier = Some(m), minClassifierProb = (junkMax + cleanMin) / 2)
      .select("doc_id").as[Long].collect().toSet
    val plainIds = Curation.curate(marked, minQuality = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(gatedIds.nonEmpty)
    // every gated survivor passes the classifier; all junk-marked docs gone
    assert(gatedIds.forall(_ % 4 != 0))
    assert(plainIds.exists(_ % 4 == 0), "ungated pipeline keeps junk docs")
    // the gate only ever removes: gated ⊆ plain
    assert(gatedIds.subsetOf(plainIds))
  }

  test("curate keepBestQuality: highest-quality cluster member survives instead of min id") {
    // near-dup pairs where the LARGER id carries the fuller text:
    // 30 words (quality 0.30 — under the 100-word cap, so quality is
    // strictly monotone in length) vs a 24-word truncation (0.24).
    // Per-doc word stems keep clusters from merging across docs.
    def mk(id: Long, from: Int) =
      (id, (from to 30).map(j => s"w${id % 1000}x$j").mkString(" "))
    val corpus = ((1L to 20L).map(mk(_, 7)) ++
      (1001L to 1020L).map(mk(_, 1))).toDF("doc_id", "text")
    val langs = graft.text.TextAnalysis.langId(corpus)
      .select("pred_lang").distinct().as[String].collect().toSeq
    val minIdKept = Curation.curate(corpus, minQuality = 0.0,
      jaccardThreshold = 0.3, keepLangs = langs)
      .select("doc_id").as[Long].collect().toSet
    val bestKept = Curation.curate(corpus, minQuality = 0.0,
      jaccardThreshold = 0.3, keepLangs = langs, keepBestQuality = true)
      .select("doc_id").as[Long].collect().toSet
    // min-id keeps the truncated small-id variant; keep-best keeps the
    // fuller +1000 variant of every cluster
    assert(minIdKept == (1L to 20L).toSet,
      s"min-id policy surprised: $minIdKept")
    assert(bestKept == (1001L to 1020L).toSet,
      s"keep-best policy surprised: $bestKept")
  }

  test("curateDelta: batched union == one-shot curate (connector-free, monotone ids); replay-idempotent") {
    val corpus = docs.select("doc_id", "text").filter("doc_id < 300")
    // near-dups landing across the batch boundary: first-3-words-dropped
    // copies of some batch-1 docs under high ids (DedupSpec construction)
    val mutated = corpus.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
    // plus one exact duplicate of a batch-1 doc arriving in batch 2
    val exactDup = corpus.filter($"doc_id" === 7)
      .select(($"doc_id" + 200000).as("doc_id"), $"text")
    val all = corpus.unionByName(mutated).unionByName(exactDup)
    val batch1 = all.filter($"doc_id" < 150)
    val batch2 = all.filter($"doc_id" >= 150)
    val langs = Seq("en", "de", "es", "fr", "zh")

    val oneShot = Curation.curate(all, shingleK = 3, numPerm = 32, bands = 8,
        jaccardThreshold = 0.5, minQuality = 0.2, keepLangs = langs,
        sampleFraction = 0.9)
      .select("doc_id").as[Long].collect().toSet

    val seenDir = tempDir("graft_cdelta_s") + "/s"
    val idxDir = tempDir("graft_cdelta_i") + "/i"
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      Curation.curateDelta(b, id, seenDir, idxDir, shingleK = 3,
        numPerm = 32, bands = 8, jaccardThreshold = 0.5, minQuality = 0.2,
        keepLangs = langs, sampleFraction = 0.9)
        .select("doc_id").as[Long].collect().toSet
    val d1 = run(batch1, 0L)
    val d2 = run(batch2, 1L)
    assert((d1 ++ d2) == oneShot)
    assert(d1.nonEmpty && d2.nonEmpty)
    // the cross-batch exact dup and at least one cross-batch near-dup
    // were dropped in batch 2
    assert(!d2.contains(200007L))
    assert(mutated.select("doc_id").as[Long].collect().exists(id => !d2.contains(id)))

    // replay of batch 2 (same id): stores exclude their own partitions,
    // output identical
    assert(run(batch2, 1L) == d2)
  }

  private def tokDocs(rs: (Long, Int)*) =
    rs.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")

  test("packSequences: first-fit contiguous greedy, oversize doc gets its own bin") {
    // token counts 4,4,4,9,12,1 with maxTokens=10:
    //   bin0={1,2} (8), bin1={3} (4+9 would overflow), bin2={4} (9),
    //   bin3={5} (12 - oversize, own bin), bin4={6} (12+1 overflows)
    val got = Curation.packSequences(
      tokDocs((1L, 4), (2L, 4), (3L, 4), (4L, 9), (5L, 12), (6L, 1)),
      maxTokens = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 0L), (2L, 4L, 0L), (3L, 4L, 1L),
      (4L, 9L, 2L), (5L, 12L, 3L), (6L, 1L, 4L)))
  }

  test("packSequences: bins never cross id blocks; bin ids encode the block") {
    val B = 1L << 32
    val got = Curation.packSequences(
      tokDocs((1L, 4), (2L, 4), (3L, 4), (4L, 9), (5L, 12), (6L, 1)),
      maxTokens = 10, blockSize = 4)
      .as[(Long, Long, Long)].collect().toSeq
    // block 0 = ids {1,2,3}: bin0={1,2}, bin1={3}
    // block 1 = ids {4,5,6}: bin0={4}, bin1={5}, bin2={6}
    assert(got == Seq((1L, 4L, 0L), (2L, 4L, 0L), (3L, 4L, 1L),
      (4L, 9L, B), (5L, 12L, B + 1), (6L, 1L, B + 2)))
  }

  test("packSequences is deterministic under repartitioning and fills bins") {
    val input = tokDocs((1L to 200L).map(i => (i, (i % 7 + 1).toInt)): _*)
    val a = Curation.packSequences(input, maxTokens = 16)
      .as[(Long, Long, Long)].collect().toSeq
    val b = Curation.packSequences(input.repartition(13), maxTokens = 16)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    // every bin holds <= maxTokens unless it is a single oversize doc
    val byBin = a.groupBy(_._3).values
    byBin.foreach(ds => assert(ds.map(_._2).sum <= 16 || ds.size == 1))
    // greedy invariant: no bin could absorb its successor's first doc
    val bins = a.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.sortBy(_._1))
    bins.sliding(2).foreach {
      case Seq(cur, nxt) =>
        assert(cur.map(_._2).sum + nxt.head._2 > 16)
      case _ =>
    }
  }
}

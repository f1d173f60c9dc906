package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Hashes

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 1
    (3L, "completely different words about spark query engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val got = Dedup.exact(docs).select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhash LSH recovers near-duplicate pairs, no false positives") {
    val pairs = Dedup.minhashNearDups(docs, 2, 32, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("portable minhash: JVM-reference signatures, pairs recovered, stable") {
    // signature arithmetic against an independent JVM reference
    val one = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.minhashIndexPortable(one, 3, 4).collect().head
    val hsGot = got.getSeq[Long](1).toSet
    val sigGot = got.getSeq[Long](2)
    def h(s: String): Long = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(dg.substring(0, 15), 16)) % 2147483648L
    }
    val hs = Set("a b c", "b c d", "c d e").map(h)
    assert(hsGot == hs)
    val p = 2147483647L
    val sigRef = (0 until 4).map(i =>
      hs.map(v => ((2 * i + 1) * v + (i * 2654435761L) % p) % p).min)
    assert(sigGot == sigRef)
    // the planted near-dups come back; the unrelated doc never pairs
    val pairs = Dedup.minhashNearDupsPortable(docs, 2, 32, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
    // deterministic on any partitioning
    val again = Dedup.minhashNearDupsPortable(docs.repartition(5), 2, 32, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(again == pairs)
  }

  test("incremental index: batch1 pairs + delta pairs == one-shot pairs") {
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(300)
    // near-dups across the batch boundary: copies of batch-1 docs with
    // the first 3 words dropped, landing in batch 2 under new ids
    val mutated = corpus.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 4, 1000000), ' ')").as("text"))
    val all = corpus.unionByName(mutated)
    val batch1 = all.filter($"doc_id" < 150)
    val batch2 = all.filter($"doc_id" >= 150)

    val oneShot = Dedup.minhashNearDups(all, 3, 32, 8, 0.5)
      .as[(Long, Long, Double)].collect().toSet

    val index1 = Dedup.minhashIndex(batch1, 3, 32)
    val batch1Pairs = Dedup.minhashNearDups(batch1, 3, 32, 8, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val (delta, newRows) = Dedup.minhashNearDupsDelta(index1, batch2, 3, 32, 8, 0.5)
    val deltaPairs = delta.as[(Long, Long, Double)].collect().toSet

    assert(batch1Pairs ++ deltaPairs == oneShot)
    // every delta pair has at least one new side
    val newIds = batch2.select("doc_id").as[Long].collect().toSet
    assert(deltaPairs.forall { case (a, b, _) => newIds(a) || newIds(b) })
    // the cross-boundary injected near-dups were found by the delta
    assert(deltaPairs.exists { case (a, b, _) => a < 150 && b >= 100000 })
    // returned index rows cover exactly the new batch
    assert(newRows.select("doc_id").as[Long].collect().toSet == newIds)
    // appending keeps the index equivalent to a fresh build
    val rebuilt = Dedup.minhashIndex(all, 3, 32)
    val appended = index1.unionByName(newRows)
    assert(appended.select("doc_id", "sig").as[(Long, Seq[Long])].collect().toSet ==
      rebuilt.select("doc_id", "sig").as[(Long, Seq[Long])].collect().toSet)
  }

  test("portable kernels == published expression forms on corpus docs") {
    // the codegen kernels (gram_md5_mod31 / minhash_sig_portable) must
    // be value-identical to the spec's SQL-expression formulation —
    // the form the DuckDB oracle and any external auditor recompute
    val sample = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(60)
    val viaExpr = Dedup.shingles(sample, 3)
      .withColumn("hs", array_distinct(expr(
        "transform(shingles, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % 2147483648)")))
      .withColumn("sig", expr(
        """transform(sequence(0, 31), i ->
          |  array_min(transform(hs, h ->
          |    ((2*i + 1) * h + (i * 2654435761) % 2147483647) % 2147483647)))""".stripMargin))
      .select("doc_id", "hs", "sig")
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (id, hs, sig) => (id, (hs.toSet, sig)) }.toMap
    val viaKernel = Dedup.minhashIndexPortable(sample, 3, 32)
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (id, hs, sig) => (id, (hs.toSet, sig)) }.toMap
    assert(viaKernel.keySet == viaExpr.keySet)
    viaKernel.foreach { case (id, v) => assert(v == viaExpr(id), s"doc $id") }
  }

  test("containmentPairs: excerpt ~1.0 one-way, jaccard-blind pair found, df cap gates") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"w$i").mkString(" ")   // strict prefix
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, 3, 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    val (_, _, cAinB, cBinA) = got.head
    // doc 2's 8 distinct shingles are all in doc 1's 58 — containment
    // is 1.0 excerpt-side, tiny source-side (the jaccard-blind case)
    assert(cBinA == 1.0)
    assert(cAinB < 0.2)
    // a stopword-grade shingle shared by everyone generates no
    // candidates once its df exceeds the cap
    val common = Seq.tabulate(5)(i => (10L + i, s"the same lede y$i z$i q$i")).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(common, 3, 0.1, maxShingleDf = 4)
    val uncapped = Dedup.containmentPairs(common, 3, 0.1, maxShingleDf = 100)
    assert(capped.count() < uncapped.count())
    assert(uncapped.count() == 10) // all C(5,2) pairs share 'the same lede'
  }

  test("delta against an empty index == one-shot on the batch") {
    val empty = Dedup.minhashIndex(docs.filter($"doc_id" < 0), 2, 32)
    val (delta, _) = Dedup.minhashNearDupsDelta(empty, docs, 2, 32, 8, 0.5)
    val oneShot = Dedup.minhashNearDups(docs, 2, 32, 8, 0.5)
    assert(delta.as[(Long, Long, Double)].collect().toSet ==
      oneShot.as[(Long, Long, Double)].collect().toSet)
  }

  test("ngram jaccard: identical=1, disjoint=0") {
    val j = Dedup.ngramJaccardAdjacent(
      Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text"), 2)
      .select("doc_id_a", "jaccard").as[(Long, Double)].collect().toMap
    assert(j(1L) == 1.0 && j(2L) == 0.0)
  }

  test("minhash_sig kernel == per-permutation xxhash64(i, h) formulation") {
    val sh = Dedup.shingles(docs, 3)
      .withColumn("__h0", expr("transform(shingles, s -> xxhash64(s))"))
    val viaKernel = sh
      .withColumn("sig", Hashes.minhash_sig(col("__h0"), 8))
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val viaExprs = sh
      .withColumn("sig", array((0 until 8).map(i =>
        array_min(transform(col("__h0"), h => xxhash64(lit(i), h)))): _*))
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel == viaExprs)
  }

  test("gram_hashes kernel == distinct xxhash64(joined slice) formulation") {
    // edge shapes on purpose: fewer words than k, empty text, repeated
    // grams (distinctness), consecutive/leading/trailing spaces (empty
    // words), multi-byte UTF-8
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), // fewer words than k=3 -> single whole-text gram
      (3L, ""),
      (4L, "a b a b a b a b"), // repeated grams
      (5L, "x  y   z"), // empty words from consecutive spaces
      (6L, " leading and trailing "),
      (7L, "héllo wörld caffè latte ünïcode"),
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val viaKernel = texts
        .withColumn("hs", Hashes.gram_hashes(col("text"), k))
        .select("doc_id", "hs").as[(Long, Seq[Long])].collect().toMap
      val viaExprs = texts
        .withColumn("__words", split(col("text"), " "))
        .withColumn("hs", array_distinct(expr(
          s"transform(sequence(0, greatest(size(__words) - $k, 0)), " +
            s"i -> xxhash64(array_join(slice(__words, i + 1, $k), ' ')))")))
        .select("doc_id", "hs").as[(Long, Seq[Long])].collect().toMap
      assert(viaKernel == viaExprs, s"k=$k")
    }
  }

  test("regroup_words kernel == slice/array_join line formulation") {
    val texts = Seq(
      (1L, "a b c d e f g h i j k l m"), // 13 words -> 5/5/3 lines
      (2L, "a b c d e"), // exactly one full line
      (3L, "a"),
      (4L, ""),
      (5L, "héllo wörld caffè latte ünïcode mixé sept"),
    ).toDF("doc_id", "text")
    for (g <- Seq(1, 2, 5)) {
      val viaKernel = texts
        .withColumn("t", Hashes.regroup_words(col("text"), g))
        .select("doc_id", "t").as[(Long, String)].collect().toMap
      val viaExpr = texts
        .withColumn("t", expr(
          s"array_join(transform(sequence(1, CAST(ceil(size(split(text, ' ')) / $g.0) AS INT)), " +
            s"x -> array_join(slice(split(text, ' '), (x - 1) * $g + 1, $g), ' ')), '\n')"))
        .select("doc_id", "t").as[(Long, String)].collect().toMap
      assert(viaKernel == viaExpr, s"g=$g")
    }
  }

  test("gram_strings kernel == CASE/transform/array_join formulation") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), // fewer words than n -> EMPTY (no clamp)
      (3L, ""),
      (4L, "x  y   z"), // empty words from consecutive spaces
      (5L, "héllo wörld caffè"),
    ).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 4)) {
      val viaKernel = texts
        .withColumn("g", Hashes.gram_strings(col("text"), n))
        .select("doc_id", "g").as[(Long, Seq[String])].collect().toMap
      val viaExpr = texts
        .withColumn("__w", split(col("text"), " "))
        .withColumn("g", expr(
          s"CASE WHEN size(__w) >= $n THEN " +
            s"transform(sequence(0, size(__w) - $n), i -> array_join(slice(__w, i + 1, $n), ' ')) " +
            "ELSE array() END"))
        .select("doc_id", "g").as[(Long, Seq[String])].collect().toMap
      assert(viaKernel == viaExpr, s"n=$n")
    }
  }

  test("simhash near-dup pairs: banding recovers hamming<=3 pairs exactly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // identical -> hamming 0
      (3L, "completely different words about database synchronization engines"),
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.simhashNearDups(docs, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("simhash: identical tokens agree, near tokens within small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
    ).toDF("doc_id", "text")
      .withColumn("sh", Hashes.simhash64(split(col("text"), " ")))
    val m = df.select("doc_id", "sh").as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) < 20)
  }

  test("dedupSpans removes duplicated k-windows except from the min-id keeper") {
    val docs = Seq(
      (1L, "a b c d e"),        // keeper of every window it shares
      (2L, "x y a b c d q"),    // 'a b c d' duplicated vs doc 1 -> removed
      (3L, "u v w x y z"),      // unique text, survives untouched
      (4L, "a b c d e"),        // full duplicate of doc 1 -> empty
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dedupSpans(docs, 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c d e")     // min id holds every dup window
    // doc 2: windows 'a b c','b c d' (+ 'c d q'? unique) dup vs doc 1;
    // covered positions 2..5 -> 'x y ... q' remain
    assert(out(2L) == "x y q")
    assert(out(3L) == "u v w x y z")
    assert(out(4L) == "")              // fully duplicated non-keeper
    // short doc (< k tokens) passes through
    val short = graft.dedup.Dedup.dedupSpans(
      Seq((9L, "a b")).toDF("doc_id", "text"), 3)
      .as[(Long, String)].collect().toMap
    assert(short(9L) == "a b")
  }

  test("rolling hash: deterministic, shift-sensitive") {
    val df = Seq((1L, "abcdef"), (2L, "abcdef"), (3L, "abcdeg"))
      .toDF("doc_id", "text")
      .withColumn("rh", Hashes.rolling_hash(col("text")))
    val m = df.select("doc_id", "rh").as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L) && m(1L) != m(3L))
  }
}

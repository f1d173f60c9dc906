package graft

import org.apache.spark.sql.functions._
// Sharding shares Sampling's portable-bucket recipe; its specs live here.

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.documents(spark, sfDir)

  test("deterministicSample: same rows under any partitioning, ~fraction kept") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.45, s"got $frac")
    // different salt decorrelates
    val c = Sampling.deterministicSample(docs, "doc_id", 0.3, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(c != a)
  }

  test("stratifiedSample respects per-stratum fractions") {
    val fractions = Map("en" -> 1.0, "de" -> 0.0)
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", fractions)
    val langs = got.select("lang").distinct().as[String].collect().toSet
    assert(langs.contains("en") && !langs.contains("de"))
    assert(got.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("mixFractions: scarcest domain keeps 100%, others hit exact weight shares") {
    // counts 100/300/600, target 50/25/25: domain a limits — total =
    // min(100/.5, 300/.25, 600/.25) = 200 → keep 1.0, 200*.25/300, 200*.25/600
    val f = Sampling.mixFractions(
      Map("a" -> 100L, "b" -> 300L, "c" -> 600L),
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    assert(f("a") == 1.0)
    assert(math.abs(f("b") - 50.0 / 300) < 1e-12)
    assert(math.abs(f("c") - 50.0 / 600) < 1e-12)
    // degenerate: equal weights over equal counts keeps everything
    assert(Sampling.mixFractions(Map("x" -> 10L, "y" -> 10L),
      Map("x" -> 0.5, "y" -> 0.5)).values.forall(_ == 1.0))
    // invalid inputs fail loudly
    intercept[IllegalArgumentException](
      Sampling.mixFractions(Map("x" -> 10L), Map("x" -> 0.0)))
    intercept[IllegalArgumentException](
      Sampling.mixFractions(Map("x" -> 10L), Map("y" -> 1.0)))
  }

  test("mixDomains: unweighted domains dropped, mixture near target, deterministic") {
    // documents has 20 uniform 'source' domains; rebalance 3 of them 2:1:1
    val w = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val got = Sampling.mixDomains(docs, "source", "doc_id", w)
    val bySrc = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.keySet == w.keySet) // everything else dropped
    // src0 is the limiting domain (weight 2× over equal counts): kept fully
    assert(bySrc("src0") == docs.filter(col("source") === "src0").count())
    // the id-hash filter is approximate for fractional domains; at 25
    // docs/domain just require a real downsample toward the half share
    assert(bySrc("src1") < bySrc("src0") && bySrc("src1") > 0)
    assert(bySrc("src2") < bySrc("src0") && bySrc("src2") > 0)
    val again = Sampling.mixDomains(docs.repartition(5), "source", "doc_id", w)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("deterministicSamplePortable: md5 bucket matches a JVM reference, stable") {
    val got = Sampling.deterministicSamplePortable(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    // reference implementation of the documented formula, independent of Spark
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"s0|$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    val expect = docs.select("doc_id").as[Long].collect()
      .filter(id => bucket(id) < 250000L).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < docs.count())
    val again = Sampling.deterministicSamplePortable(docs.repartition(7), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
  }

  test("mixDomainsPortable: matches a JVM md5 reference end-to-end") {
    val w = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val got = Sampling.mixDomainsPortable(docs, "source", "doc_id", w)
      .select("doc_id").as[Long].collect().toSet
    // independent reference: recompute counts, fractions, and md5
    // membership from the documented spec with plain JVM code
    val counts = docs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val fr = Sampling.mixFractions(counts, w)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mix|$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    val expect = docs.select("doc_id", "source").as[(Long, String)].collect()
      .filter { case (id, src) =>
        fr.get(src).exists(f => bucket(id) < (f * 1000000L).toLong) }
      .map(_._1).toSet
    assert(got == expect)
    // limiting domain kept fully; others genuinely downsampled
    val bySrc = Sampling.mixDomainsPortable(docs, "source", "doc_id", w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == counts("src0"))
    assert(bySrc("src1") < bySrc("src0") && bySrc("src1") > 0)
  }

  test("temperatureWeights: natural at alpha=1, flattens toward uniform, guards") {
    val counts = Map("a" -> 800L, "b" -> 150L, "c" -> 50L)
    val natural = Sampling.temperatureWeights(counts, 1.0)
    assert(math.abs(natural("a") - 0.8) < 1e-12)
    assert(math.abs(natural("b") - 0.15) < 1e-12)
    assert(math.abs(natural("c") - 0.05) < 1e-12)
    val t = Sampling.temperatureWeights(counts, 0.3)
    assert(math.abs(t.values.sum - 1.0) < 1e-12)
    // scarce domains gain share, dominant domains lose it; order kept
    assert(t("c") > natural("c") && t("a") < natural("a"))
    assert(t("a") > t("b") && t("b") > t("c"))
    // alpha→0 approaches uniform
    val flat = Sampling.temperatureWeights(counts, 1e-9)
    flat.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
    intercept[IllegalArgumentException](
      Sampling.temperatureWeights(counts, 0.0))
    intercept[IllegalArgumentException](
      Sampling.temperatureWeights(Map("x" -> 0L), 1.0))
    // feeds mixDomains: temperature weights are valid mixture weights
    val mixed = Sampling.mixDomains(docs, "source", "doc_id",
      Sampling.temperatureWeights(
        Map("src0" -> 25L, "src1" -> 25L, "src2" -> 25L), 0.5))
    assert(mixed.count() > 0)
  }

  test("sampleKPerGroup: exact k per big group, whole small groups, layout-stable") {
    val got = Sampling.sampleKPerGroup(docs, "lang", "doc_id", 7)
    val sizes = got.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(n, 7L), s"$lang: ${sizes.get(lang)}")
    }
    // same rows on any partitioning
    val a = got.select("doc_id").as[Long].collect().toSet
    val b = Sampling.sampleKPerGroup(docs.repartition(11), "lang", "doc_id", 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // JVM md5 reference picks the identical members for one group
    val en = docs.filter($"lang" === "en").select("doc_id").as[Long].collect()
    def ref(id: Long): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s0|$id".getBytes("UTF-8"))
      BigInt(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val want = en.sortBy(id => (ref(id), id)).take(7).toSet
    val gotEn = got.filter($"lang" === "en").select("doc_id")
      .as[Long].collect().toSet
    assert(gotEn == want)
  }

  test("split3: disjoint, exhaustive, stable") {
    val (tr, va, te) = Sampling.split3(docs, "doc_id", 0.7, 0.2)
    val n = docs.count()
    assert(tr.count() + va.count() + te.count() == n)
    val ids = tr.select("doc_id").as[Long].collect().toSet ++
      va.select("doc_id").as[Long].collect().toSet ++
      te.select("doc_id").as[Long].collect().toSet
    assert(ids.size == n)
  }

  test("sharding: total partition, partition-invariant, report sums the corpus") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val n = docs.count()
    val assigned = graft.ops.Sharding.assignShards(docs, 8)
    // every doc lands in exactly one shard in [0, 8)
    assert(assigned.count() == n)
    assert(assigned.filter(col("shard") < 0 || col("shard") >= 8).isEmpty)
    // assignment is a pure function of the id — any partitioning agrees
    val a = assigned.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = graft.ops.Sharding.assignShards(docs.repartition(13), 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
    val rep = graft.ops.Sharding.shardReport(docs, 8).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == n)
    // hash balance sanity at this corpus size: no shard empty, no shard
    // holding more than half the corpus
    assert(rep.length == 8)
    assert(rep.map(_.getAs[Long]("n_docs")).max < n / 2)
    // per-shard token extrema bound each other
    rep.foreach { r =>
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
      assert(r.getAs[Long]("sum_tokens") >= r.getAs[Long]("n_docs") * r.getAs[Long]("min_tokens"))
    }
  }

  test("selectByTokenBudget: inclusive prefix cut, no back-fill, budget edges, repartition-stable") {
    // (id, score, tokens): quality order by (score desc, id) is
    // b(9),d(9),a(5),c(3),e(1) with tokens 4,3,5,2,10
    val docs = Seq(
      (1L, 5.0, 5L), (2L, 9.0, 4L), (3L, 3.0, 2L), (4L, 9.0, 3L),
      (5L, 1.0, 10L),
    ).toDF("doc_id", "score", "n_tokens")
    def ids(budget: Long, df: org.apache.spark.sql.DataFrame = docs) =
      Sampling.selectByTokenBudget(df, budget)
        .collect().map(_.getLong(0)).toSet
    // cum: 2->4, 4->7, 1->12, 3->14, 5->24
    assert(ids(14) == Set(2L, 4L, 1L, 3L))   // inclusive boundary
    assert(ids(13) == Set(2L, 4L, 1L))       // 14 > 13: doc 3 out
    // NO back-fill: budget 11 cuts at doc 1 (cum 12 > 11); doc 3
    // (2 tokens, would fit) must NOT sneak in past the quality order
    assert(ids(11) == Set(2L, 4L))
    assert(ids(0) == Set.empty[Long])
    assert(ids(1000) == Set(1L, 2L, 3L, 4L, 5L))
    // bit-stable on any input partitioning
    assert(ids(14, docs.repartition(7)) == Set(2L, 4L, 1L, 3L))
    assert(ids(14, docs.coalesce(1)) == Set(2L, 4L, 1L, 3L))
  }

  test("splitAssignPortable: exhaustive, portable md5 reference, repartition-stable") {
    val got = Sampling.splitAssignPortable(docs, "doc_id", 0.8, 0.1)
    val n = docs.count()
    assert(got.count() == n)
    val byLabel = got.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel.values.sum == n)
    // ~80/10/10 at corpus size (hash balance, generous bounds)
    assert(byLabel("train").toDouble / n > 0.7)
    assert(byLabel("test").toDouble / n < 0.2)
    // the label is the published md5-bucket spec — JVM reference
    def ref(id: Long): String = {
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$id".getBytes("UTF-8"))
      val b = (BigInt(dg.map("%02x".format(_)).mkString.substring(0, 15), 16)
        % 1000000).toLong
      if (b < 800000) "train" else if (b < 900000) "val" else "test"
    }
    val m = got.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    m.take(50).foreach { case (id, s) => assert(s == ref(id), s"doc $id") }
    // pure function of the id: any partitioning agrees
    val again = Sampling.splitAssignPortable(docs.repartition(11), "doc_id", 0.8, 0.1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == m)
  }

  test("splitLeakage: crossing pairs only, labels match assignment, no corpus join") {
    // find one id per label so the hand-built pairs cover all shapes
    val labelOf = Sampling.splitAssignPortable(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def pick(l: String) = labelOf.collectFirst { case (id, `l`) => id }.get
    val (tr, va, te) = (pick("train"), pick("val"), pick("test"))
    val tr2 = labelOf.collect { case (id, "train") => id }.drop(1).head
    val pairs = Seq((tr, tr2), (tr, va), (va, te), (te, tr))
      .toDF("doc_a", "doc_b")
    val got = Sampling.splitLeakage(pairs, 0.8, 0.1)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getString(3))).toSet
    assert(rows == Set((tr, va, "train", "val"), (va, te, "val", "test"),
      (te, tr, "test", "train")))
    // labels come from arithmetic, not a corpus join
    assert(!got.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("curriculumOrder: quantile buckets, md5 JVM reference, repartition-stable") {
    val docs = (0L until 8L).map(i => (i, i.toDouble)).toDF("doc_id", "score")
    val got = Sampling.curriculumOrder(docs, buckets = 2, salt = "s")
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap
    // median of 0..7 = 3.5: scores <= 3.5 -> bucket 0
    (0L to 3L).foreach(i => assert(got(i)._1 == 0))
    (4L to 7L).foreach(i => assert(got(i)._1 == 1))
    // shuffle_key is the portable md5 of "id:salt"
    val mdRef = java.security.MessageDigest.getInstance("MD5")
      .digest("5:s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(5L)._2 == mdRef)
    val again = Sampling.curriculumOrder(docs.repartition(5), buckets = 2, salt = "s")
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(again == got)
  }

  test("weightedSamplePortable: JVM A-ES reference, weight bias, repartition-stable") {
    // bimodal weights: ids 0..99 weight 1, ids 100..199 weight 20
    val rows = (0L until 200L).map(i => (i, if (i < 100) 1.0 else 20.0))
    val df = rows.toDF("doc_id", "weight")
    val got = Sampling.weightedSamplePortable(df, 50, "weight", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == 50)
    // JVM reference: the exact same arithmetic outside Spark
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(s"ws0|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 48)
      BigDecimal(math.log(u) / w).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ref = rows.sortBy { case (i, w) => (-key(i, w), i) }.take(50).map(_._1).toSet
    assert(got == ref)
    // the heavy-weight half dominates the sample (E[heavy] ~ 45/50)
    assert(got.count(_ >= 100L) > 35, s"heavy picked ${got.count(_ >= 100L)}")
    // stable under any partitioning; k > n passes everything through
    val again = Sampling.weightedSamplePortable(df.repartition(7), 50, "weight", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
    assert(Sampling.weightedSamplePortable(df, 1000, "weight", "doc_id").count() == 200)
    // top-k plans as TakeOrdered, never a global sort
    val plan = Sampling.weightedSamplePortable(df, 50, "weight", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // zero/negative/null weights carry no sampling mass: they can
    // never rank first (the A-ES key is undefined there) — they are
    // excluded, not promoted
    val tainted = (Seq((900L, 0.0), (901L, -5.0)) ++ rows)
      .toDF("doc_id", "weight")
      .withColumn("weight", when(col("doc_id") === 902L, lit(null)).otherwise(col("weight")))
    val cleaned = Sampling.weightedSamplePortable(tainted, 50, "weight", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned == got)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries retains every item above n/capacity (superset guarantee)") {
    // 1000 tokens: "hot" 300x, "warm" 150x, rest singletons
    val stream = Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 550).map(i => s"t$i")
    // adversarial order: singletons interleaved to force decrements
    val shuffled = scala.util.Random.shuffle(stream) // superset holds for ANY order
    val survivors = HeavyHitters.misraGries(shuffled.iterator, 10).toSet
    assert(survivors.contains("hot"))   // 300 > 1000/10
    assert(survivors.contains("warm"))  // 150 > 1000/10
    assert(survivors.size <= 10)
  }

  test("heavyHitters equals the full groupBy count + filter (exactness)") {
    // skewed multi-partition stream: token t_k appears k*k times
    val rows = (1 to 40).flatMap(k => Seq.fill(k * k)(s"t$k"))
    val toks = rows.toDF("token").repartition(8)
    val n = rows.size.toDouble
    val phi = 0.03
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > phi * n)
      .as[(String, Long)].collect().toSet
    val got = HeavyHitters.heavyHitters(toks, "token", phi)
      .as[(String, Long)].collect()
    assert(got.toSet == exact)
    assert(exact.nonEmpty)
    // strictly-above threshold: nothing at or below phi*N leaks through
    assert(got.forall(_._2 > phi * n))
    // sorted cnt desc
    assert(got.map(_._2).sameElements(got.map(_._2).sortBy(-_)))
  }

  test("heavyHitters ignores null tokens and is partitioning-independent") {
    val toks = (Seq.fill(50)(Some("a")) ++ Seq.fill(10)(Option.empty[String]) ++
      (0 until 40).map(i => Some(s"x$i"))).toDF("token")
    val one = HeavyHitters.heavyHitters(toks.repartition(1), "token", 0.2)
      .as[(String, Long)].collect().toSet
    val many = HeavyHitters.heavyHitters(toks.repartition(16), "token", 0.2)
      .as[(String, Long)].collect().toSet
    assert(one == many)
    assert(one == Set(("a", 50L))) // 50 of 90 non-null > 0.2 * 90
  }

  test("topNgrams forms bigrams and matches a hand count") {
    val docs = Seq(
      (0L, "a b a b c"),   // bigrams: "a b", "b a", "a b", "b c"
      (1L, "a b"),         // "a b"
      (2L, "z")            // too short: none
    ).toDF("doc_id", "text")
    val got = HeavyHitters.topNgrams(docs, 0.3, 2)
      .as[(String, Long)].collect().toSet
    // N = 5 bigrams; phi*N = 1.5 — only "a b" (3) passes
    assert(got == Set(("a b", 3L)))
  }
}

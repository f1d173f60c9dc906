package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.queries.Analytics
import graft.text.TextAnalysis

/** Funnel, cohort retention, and winnowing fingerprints — exact
  * small-case semantics the oracle can't pin (ordering edge cases,
  * tie rules), plus the winnowing guarantee property.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String)]): String = {
    val dir = tempDir("graft_ev")
    rows.toDF("event_id", "tss", "user_id", "event_type")
      // the real events table stores ts as raw INT64 nanos
      .withColumn("ts", expr("unix_micros(tss) * 1000L")).drop("tss")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: steps must be strictly ordered in time, greedy earliest") {
    val dir = writeEvents(Seq(
      // u1 completes view -> click -> purchase in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase"),
      // u2: purchase BEFORE click -> only reaches step 2
      (4L, ts("2024-01-01 09:00:00"), 2L, "purchase"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view"),
      (6L, ts("2024-01-01 09:45:00"), 2L, "click"),
      // u3: click only, never viewed -> reaches no step
      (7L, ts("2024-01-01 08:00:00"), 3L, "click"),
      // u4: greedy trap — earliest view is late, but an EARLIER view
      // exists whose later click+purchase complete; greedy takes the
      // earliest view first and still completes (earliest completion)
      (8L, ts("2024-01-02 10:00:00"), 4L, "view"),
      (9L, ts("2024-01-02 11:00:00"), 4L, "click"),
      (10L, ts("2024-01-02 12:00:00"), 4L, "purchase"),
      (11L, ts("2024-01-02 09:00:00"), 4L, "view"),
    ))
    val got = Analytics.funnel(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "view", 3L), (2, "click", 3L), (3, "purchase", 2L)))
  }

  test("funnelWindowed: gap bound prunes slow steps, boundary inclusive, greedy") {
    val dir = writeEvents(Seq(
      // u1 converts with every gap exactly AT the 1h bound (inclusive)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      // u2: click 61 minutes after view -> funnel stops at step 1
      (4L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 11:01:00"), 2L, "click"),
      (6L, ts("2024-01-01 11:02:00"), 2L, "purchase"),
      // u3: greedy contract — the EARLIEST view starts the clock; the
      // later view that would have converted is not retried
      (7L, ts("2024-01-02 08:00:00"), 3L, "view"),
      (8L, ts("2024-01-02 10:00:00"), 3L, "view"),
      (9L, ts("2024-01-02 10:30:00"), 3L, "click"),
      (10L, ts("2024-01-02 11:00:00"), 3L, "purchase"),
    ))
    val got = Analytics.funnelWindowed(spark, dir, maxGapSeconds = 3600)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
    // with a wide-open window it degrades to the plain funnel
    val wide = Analytics.funnelWindowed(spark, dir, maxGapSeconds = 86400L * 365)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val plain = Analytics.funnel(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(wide === plain)
  }

  test("funnel: same-timestamp step does NOT count (strictly after)") {
    val t = ts("2024-01-01 10:00:00")
    val dir = writeEvents(Seq(
      (1L, t, 1L, "view"),
      (2L, t, 1L, "click"), // same instant as the view -> not after it
      (3L, ts("2024-01-01 10:01:00"), 1L, "purchase"),
    ))
    val got = Analytics.funnel(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got === Seq((1, 1L), (2, 0L), (3, 0L)))
  }

  test("funnel: corpus with no funnel events reports 0 per step, not null") {
    val dir = writeEvents(Seq((1L, ts("2024-01-01 10:00:00"), 1L, "error")))
    val got = Analytics.funnel(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got === Seq((1, 0L), (2, 0L), (3, 0L)))
  }

  test("retention: week offsets anchor on each user's own first day") {
    val dir = writeEvents(Seq(
      // u1 cohort 2024-01-01, active day 0, day 6 (week 0) and day 7 (week 1)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-07 10:00:00"), 1L, "view"),
      (3L, ts("2024-01-08 10:00:00"), 1L, "view"),
      // u2 cohort 2024-01-03, active day 0 and day 14 (week 2); two
      // events the same day collapse to one active day
      (4L, ts("2024-01-03 09:00:00"), 2L, "click"),
      (5L, ts("2024-01-03 20:00:00"), 2L, "click"),
      (6L, ts("2024-01-17 09:00:00"), 2L, "click"),
    ))
    val got = Analytics.retentionCohorts(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L),
      ("2024-01-03", 0, 1L), ("2024-01-03", 2, 1L)))
  }

  test("winnowing: identical docs share fingerprints; disjoint docs don't") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z"),
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowing(df, 3, 4).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("winnowingPairs: shifted copy pairs with its original; unrelated docs don't") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq(
      (1L, base),
      (2L, base.split(" ").drop(2).mkString(" ")), // shares a long suffix
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowingPairs(df, 3, 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // a hot fingerprint shared by every doc must not expand: with the
    // cap at 2 docs-per-hash, three identical docs yield no pair at all
    val hot = Seq((1L, base), (2L, base), (3L, base)).toDF("doc_id", "text")
    assert(TextAnalysis.winnowingPairs(hot, 3, 4, 1, maxDocsPerHash = 2).count() === 0)
    // and with a roomier cap all three pairs appear
    assert(TextAnalysis.winnowingPairs(hot, 3, 4, 1, maxDocsPerHash = 3).count() === 3)
  }

  test("winnowing kernels == expression formulations (gram hashes, window mins, selections)") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"), // fewer words than k -> single clamped gram
      (3L, ""),
      (4L, "x x x x x x x"), // all-equal hashes -> rightmost ties, heavy dedup
      (5L, "p  q   r"), // empty words
      (6L, "héllo wörld caffè latte ünïcode mixé"),
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (2, 3), (1, 1))) {
      val base = texts
        .withColumn("__words", split(col("text"), " "))
        .withColumn("__hs0", expr(
          s"transform(transform(sequence(1, greatest(size(__words) - ${k - 1}, 1)), " +
            s"i -> array_join(slice(__words, i, $k), ' ')), g -> g)"))
        .withColumn("__hsExpr", transform(col("__hs0"),
          g => graft.functions.Hashes.rolling_hash(g)))
      val viaExpr = base
        .withColumn("mins", expr(
          s"""array_distinct(transform(
             |  sequence(0, greatest(size(__hsExpr) - $w, 0)),
             |  j -> array_min(slice(__hsExpr, j + 1, $w))))""".stripMargin))
        .withColumn("sel", expr(
          s"""array_distinct(transform(
             |  sequence(0, greatest(size(__hsExpr) - $w, 0)),
             |  j -> concat(
             |    lpad(CAST(array_max(transform(
             |      sequence(j, least(j + $w, size(__hsExpr)) - 1),
             |      i -> CASE WHEN __hsExpr[i] = array_min(slice(__hsExpr, j + 1, $w))
             |                THEN i ELSE -1 END)) AS STRING), 8, '0'),
             |    ':',
             |    CAST(array_min(slice(__hsExpr, j + 1, $w)) AS STRING))))""".stripMargin))
        .select("doc_id", "__hsExpr", "mins", "sel")
        .as[(Long, Seq[Long], Seq[Long], Seq[String])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val viaKernel = texts
        .withColumn("hs", graft.functions.Hashes.gram_rolling_hashes(col("text"), k))
        .withColumn("mins", graft.functions.Hashes.window_min_distinct(col("hs"), w))
        .withColumn("sel", graft.functions.Hashes.winnow_select(col("hs"), w))
        .select("doc_id", "hs", "mins", "sel")
        .as[(Long, Seq[Long], Seq[Long], Seq[String])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(viaKernel == viaExpr, s"k=$k w=$w")
    }
  }

  test("winnowing: every window selects its min hash (guarantee) and short docs fingerprint") {
    // reference winnowing in plain Scala over the same kernel
    def refSelect(hs: Seq[Long], w: Int): Seq[(Int, Long)] =
      (0 to math.max(hs.length - w, 0)).map { j =>
        val win = hs.slice(j, j + w)
        val m = win.min
        val pos = (j until math.min(j + w, hs.length)).filter(hs(_) == m).max
        (pos, m)
      }.distinct
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a b"), // fewer words than k -> single clamped gram
      (3L, "one two three four"),
    )
    val df = texts.toDF("doc_id", "text")
    // per-gram hashes via the same expression the operator uses
    val hs = df.withColumn("__words", split(col("text"), " "))
      .withColumn("__grams", expr(
        "transform(sequence(1, greatest(size(__words) - 2, 1)), " +
          "i -> array_join(slice(__words, i, 3), ' '))"))
      .withColumn("hs", transform(col("__grams"),
        g => graft.functions.Hashes.rolling_hash(g)))
      .select("doc_id", "hs").as[(Long, Seq[Long])].collect().toMap
    val got = TextAnalysis.winnowing(df, 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toList
    got.foreach { case (id, nFp, digest) =>
      val sel = refSelect(hs(id), 4)
      assert(nFp === sel.length.toLong, s"doc $id fingerprint count")
      val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        sel.sortBy(_._1).map { case (p, h) => f"$p%08d:$h" }.mkString(","))
      assert(digest === expected, s"doc $id digest")
    }
  }

  test("eventTransitions: pairs per user in time order, rows normalize to 1") {
    val ev = Seq(
      // user 1: A -> B -> A ; user 2: A -> C ; user 3: lone A (no pair)
      (1L, "2024-01-01 00:00:00", 1L, "A"), (2L, "2024-01-01 00:01:00", 1L, "B"),
      (3L, "2024-01-01 00:02:00", 1L, "A"), (4L, "2024-01-01 00:00:00", 2L, "A"),
      (5L, "2024-01-01 00:05:00", 2L, "C"), (6L, "2024-01-01 00:00:00", 3L, "A"),
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Analytics.eventTransitions(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 0.5)), ("A", "C") -> ((1L, 0.5)),
      ("B", "A") -> ((1L, 1.0))))
    // per-from probabilities sum to 1
    got.groupBy(_._1._1).foreach { case (_, m) =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12) }
  }

  test("anomalyZscore: planted spike flagged, constant series scores 0") {
    // type A: 1 event/hour for 9 hours + a 13-event spike in hour 10;
    // type B: exactly 2 events every hour (sigma = 0)
    val rows = (0 until 9).map(h => (f"2024-01-01 $h%02d:15:00", "A")) ++
      (1 to 13).map(m => (f"2024-01-01 09:${m}%02d:00", "A")) ++
      (0 until 6).flatMap(h => Seq((f"2024-01-02 $h%02d:05:00", "B"),
        (f"2024-01-02 $h%02d:35:00", "B")))
    val ev = rows.zipWithIndex
      .map { case ((t, ty), i) => (i.toLong, t, ty) }
      .toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Analytics.anomalyZscore(ev, "event_type", "ts", "1 hour", 2.5)
      .as[(String, java.sql.Timestamp, Long, Double, Boolean)].collect()
    val a = got.filter(_._1 == "A")
    // mean 2.2, var (9*1 + 169)/10 - 4.84 = 12.96, sigma 3.6
    val spike = a.filter(_._3 == 13L)
    assert(spike.length == 1 && spike.head._5 && math.abs(spike.head._4 - 3.0) < 1e-9)
    assert(a.count(_._5) == 1) // only the spike flags
    val b = got.filter(_._1 == "B")
    assert(b.forall(r => r._4 == 0.0 && !r._5)) // sigma = 0 -> z 0, never NaN
  }

  test("Bpe.fertility: words from </w> markers, no corpus join in the plan") {
    val docs = Seq((1L, "the and thin"), (2L, "a")).toDF("doc_id", "text")
    val enc = graft.text.Bpe.encode(docs, SparkEntry.bpeMerges)
    val got = graft.text.Bpe.fertility(enc)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // "the"->1 tok, "and"->1, "thin"->[th,in,</w>]=3 => 5 tokens / 3 words
    assert(got(1L) == ((1L, 3L, 5L, 5.0 / 3.0)))
    assert(got(2L) == ((2L, 1L, 2L, 2.0))) // "a" -> [a, </w>]
    assert(!graft.text.Bpe.fertility(enc).queryExecution.executedPlan
      .toString.contains("Join"))
  }
}

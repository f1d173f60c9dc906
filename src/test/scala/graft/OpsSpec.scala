package graft

import org.apache.spark.sql.functions._

import graft.ops.{TableStats, TimeBucketAgg, TypeInference}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("time-bucket agg buckets to epoch-aligned windows") {
    val df = Seq(
      ("2024-01-01 00:03:00", 2.0),
      ("2024-01-01 00:07:00", 4.0),
      ("2024-01-01 00:12:00", 10.0),
    ).toDF("ts_s", "value").withColumn("ts", col("ts_s").cast("timestamp"))
    val got = TimeBucketAgg.bucketed(df, "ts", "10 minutes", Seq("value"))
      .select("point_count", "value_avg").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 3.0), (1L, 10.0)))
  }

  test("fillTimeGaps: dense axis per group, zero and forward fill, guards") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val sparse = Seq(
      ("a", ts(0), 5L, 1.5), ("a", ts(3), 2L, 9.0), // gap at 1,2
      ("b", ts(1), 7L, 4.0)                          // singleton span
    ).toDF("g", "bucket_ts", "n", "gauge")
    val got = TimeBucketAgg.fillTimeGaps(sparse, "bucket_ts", "1 hour",
      groupCols = Seq("g"), zeroFill = Seq("n"), forwardFill = Seq("gauge"))
      .as[(String, Timestamp, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", ts(0), 5L, 1.5), ("a", ts(1), 0L, 1.5),
      ("a", ts(2), 0L, 1.5), ("a", ts(3), 2L, 9.0),
      ("b", ts(1), 7L, 4.0)))
    // ungrouped: one global axis; unfilled column stays null in gaps
    val got2 = TimeBucketAgg.fillTimeGaps(
      sparse.filter($"g" === "a").drop("g"), "bucket_ts", "1 hour",
      zeroFill = Seq("n"))
      .as[(Timestamp, Long, Option[Double])].collect().toSeq
    assert(got2 == Seq(
      (ts(0), 5L, Some(1.5)), (ts(1), 0L, None),
      (ts(2), 0L, None), (ts(3), 2L, Some(9.0))))
    intercept[IllegalArgumentException](
      TimeBucketAgg.fillTimeGaps(sparse, "bucket_ts", "1 hour",
        groupCols = Seq("g"), zeroFill = Seq("nope")))
  }

  test("timeWeightedAvg: LOCF weighting, zero-span fallback, tie-break, one exchange") {
    val df = Seq(
      // key a: 10.0 for 60s, then 20.0 for 30s, last sample weightless
      // -> (10*60 + 20*30) / 90 = 13.333...
      ("a", "2024-01-01 00:00:00", 1L, 10.0),
      ("a", "2024-01-01 00:01:00", 2L, 20.0),
      ("a", "2024-01-01 00:01:30", 3L, 99.0),
      // key b: burst of three at one instant then nothing -> plain mean
      ("b", "2024-01-01 00:00:00", 4L, 1.0),
      ("b", "2024-01-01 00:00:00", 5L, 2.0),
      ("b", "2024-01-01 00:00:00", 6L, 6.0),
      // key c: single sample
      ("c", "2024-01-01 05:00:00", 7L, 42.0),
    ).toDF("k", "ts_s", "event_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = TimeBucketAgg.timeWeightedAvg(df, "k", "ts", "value", "event_id")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, 90.0, (10.0 * 60 + 20.0 * 30) / 90.0)))
    assert(got("b") == ((3L, 0.0, 3.0)))
    assert(got("c") == ((1L, 0.0, 42.0)))
    // plain AVG for key a would be 43.0 — the burst-resistance point
    val plan = TimeBucketAgg.timeWeightedAvg(df, "k", "ts", "value", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("QualityRules: null assertions violate, uniqueness counts extras, one scan") {
    val df = Seq(
      (1L, Some(10.0), "O"), (2L, Some(-5.0), "O"),
      (3L, None, "F"), (4L, Some(3.0), "X"), (1L, Some(7.0), "O"),
    ).toDF("k", "price", "status")
    val got = graft.ops.QualityRules.check(df,
      rowRules = Seq(
        "price_positive" -> (col("price") > 0), // null price MUST violate
        "status_ok" -> col("status").isin("O", "F")),
      uniqueRules = Seq("k_unique" -> Seq("k")))
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("price_positive") == ((5L, 2L, 0.4, false))) // -5 AND the null
    assert(got("status_ok") == ((5L, 1L, 0.2, false)))
    assert(got("k_unique") == ((5L, 1L, 0.2, false)))       // duplicate k=1
    // all-pass rule reports pass
    val ok = graft.ops.QualityRules.check(df,
      rowRules = Seq("k_not_null" -> col("k").isNotNull))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(ok == (("k_not_null", 5L, 0L, 0.0, true)))
    // ONE scan regardless of rule count
    val plan = graft.ops.QualityRules.check(df,
      rowRules = Seq("a" -> (col("price") > 0), "b" -> col("k").isNotNull),
      uniqueRules = Seq("u" -> Seq("k")))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 1, plan)
    intercept[IllegalArgumentException](
      graft.ops.QualityRules.check(df, rowRules = Seq(
        "dup" -> col("k").isNotNull, "dup" -> (col("price") > 0))))
    // rule names are data, not syntax: quotes/backticks/dots can't
    // break the plan or inject an expression
    val hostile = graft.ops.QualityRules.check(df,
      rowRules = Seq("o'brien's `rule`, x.y" -> col("k").isNotNull))
      .as[(String, Long, Long, Double, Boolean)].head()
    assert(hostile == (("o'brien's `rule`, x.y", 5L, 0L, 0.0, true)))
  }

  test("JsonOps.field/flatten: typed extraction, total on malformed/missing/untypeable") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a", "nested": {"x": 1.5}}"""),
      (2L, """{"k": "not-a-number"}"""),
      (3L, """not json at all"""),
      (4L, null.asInstanceOf[String]),
    ).toDF("id", "props")
    val got = graft.ops.JsonOps.flatten(df, "props", Seq(
        ("k", "k", "BIGINT"), ("tag", "tag", "STRING"),
        ("x", "nested.x", "DOUBLE"), ("gone", "nope", "STRING")))
      .select("id", "k", "tag", "x", "gone")
      .as[(Long, Option[Long], Option[String], Option[Double], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(7L), Some("a"), Some(1.5), None)))
    assert(got(2L) == ((None, None, None, None))) // untypeable k -> null, not throw
    assert(got(3L) == ((None, None, None, None))) // malformed -> null, not throw
    assert(got(4L) == ((None, None, None, None)))
    // per-row scalar: no shuffle in the plan
    val plan = graft.ops.JsonOps.flatten(df, "props", Seq(("k", "k", "BIGINT")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("numericStats computes one row of min/max/avg") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val row = TableStats.numericStats(df, Seq("x")).head()
    assert(row.getLong(0) == 3L)
    assert(row.getDouble(1) == 1.0 && row.getDouble(2) == 3.0 && row.getDouble(3) == 2.0)
  }

  test("approx_count_distinct within 5% of exact on lineitem partkeys") {
    val got = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("type inference converts >=90% numeric strings, leaves others") {
    val good = (1 to 95).map(_.toString) ++ Seq.fill(5)("x")
    val bad = (1 to 50).map(_.toString) ++ Seq.fill(50)("x")
    assert(TypeInference.numericParseRate(good.toDF("s"), "s") >= 0.9)
    assert(TypeInference.numericParseRate(bad.toDF("s"), "s") < 0.9)
    val conv = TypeInference.convertIfNumeric(good.toDF("s"), "s")
    assert(conv.schema("s").dataType.typeName == "double")
    val kept = TypeInference.convertIfNumeric(bad.toDF("s"), "s")
    assert(kept.schema("s").dataType.typeName == "string")
  }

  test("SQL function registration: simhash64/rolling_hash/dot_product callable from SQL") {
    graft.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(split('a b c', ' ')) AS sh,
        |       rolling_hash('abc') AS rh,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin)
      .head()
    assert(row.getLong(0) == graft.functions.HashKernels.simhash64(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString))))
    assert(row.getLong(1) != 0L)
    assert(row.getDouble(2) == 11.0)
    // minhash_sig: SQL call equals the Column API on the same input
    val sqlSig = spark.sql(
      "SELECT minhash_sig(transform(split('a b c', ' '), w -> xxhash64(w)), 8) AS sig")
      .head().getSeq[Long](0)
    val apiSig = Seq("a b c").toDF("t")
      .select(graft.functions.Hashes.minhash_sig(
        expr("transform(split(t, ' '), w -> xxhash64(w))"), 8).as("sig"))
      .head().getSeq[Long](0)
    assert(sqlSig == apiSig && sqlSig.length == 8)
    // int8 pack/dot: SQL surface matches the integer reference
    val i8 = spark.sql(
      "SELECT int8_dot(int8_pack(array(1, -2, 3)), int8_pack(array(4, 5, -6))) AS d")
      .head().getLong(0)
    assert(i8 == (4 - 10 - 18).toLong)
    // l2_normalize: unit norm from SQL, matches the Column API kernel
    val l2 = spark.sql("SELECT l2_normalize(array(3.0d, 4.0d)) AS v")
      .head().getSeq[Double](0)
    assert(l2 == Seq(0.6, 0.8))
  }

  test("varchar numeric stats parse with try_cast, count parseable") {
    val df = Seq("1.5", "2.5", "x", "4.0").toDF("v")
    val row = graft.ops.TableStats.varcharNumericStats(df, Seq("v")).head()
    // row_count, v_parsed, v_min, v_max, v_avg
    assert(row.getLong(0) == 4L && row.getLong(1) == 3L)
    assert(row.getDouble(2) == 1.5 && row.getDouble(3) == 4.0)
  }

  test("histogram: bins cover all rows, edges fold correctly") {
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val h = graft.ops.TableStats.histogram(df, "x", 10)
      .as[(Int, Long)].collect().toMap
    assert(h.values.sum == 100)
    assert(h.keys.min == 0 && h.keys.max == 9)
    assert(h(9) == 10) // 90..99 including the max edge fold
    // flat column -> single bin
    val flat = Seq(5.0, 5.0, 5.0).toDF("x")
    val hf = graft.ops.TableStats.histogram(flat, "x", 10)
      .as[(Int, Long)].collect()
    assert(hf.toSeq == Seq((0, 3L)))
  }

  test("incremental bucket-agg merge == full recompute, bit-identical") {
    import graft.ops.{IncrementalAgg, TimeBucketAgg}
    val events = graft.core.Tables.events(spark, sfDir)
    val cut = "2024-01-15 00:00:00"
    val old = events.filter(col("ts") < lit(cut).cast("timestamp"))
    val fresh = events.filter(col("ts") >= lit(cut).cast("timestamp"))
    val merged = IncrementalAgg.readState(IncrementalAgg.mergeStates(
      IncrementalAgg.bucketState(old, "ts", "1 hour", "value"),
      IncrementalAgg.bucketState(fresh, "ts", "1 hour", "value")))
    val full = TimeBucketAgg.bucketed(events, "ts", "1 hour", Seq("value"))
    val m = merged.as[(java.sql.Timestamp, Long, Double, Double, Double)]
      .collect().toSet
    val f = full.as[(java.sql.Timestamp, Long, Double, Double, Double)]
      .collect().toSet
    assert(m == f)
    assert(m.nonEmpty)
  }

  test("yAxisRange pads 5%, handles flat series and empty input") {
    import graft.ops.VizPrep
    val df = Seq(10.0, 20.0).toDF("v")
    assert(VizPrep.yAxisRange(df, "v").contains((9.5, 20.5)))
    val flat = Seq(10.0, 10.0).toDF("v")
    val Some((lo, hi)) = VizPrep.yAxisRange(flat, "v")
    assert(lo < 10.0 && hi > 10.0)
    assert(VizPrep.yAxisRange(Seq.empty[Double].toDF("v"), "v").isEmpty)
    assert(VizPrep.filterByRange(df, "v", 0, 15).count() == 1)
  }

  test("HLL distinct state: merge estimates == full recompute; <= 5% of exact") {
    import graft.ops.IncrementalAgg
    val events = graft.core.Tables.events(spark, sfDir)
    val cut = "2024-01-15 00:00:00"
    val old = events.filter(col("ts") < lit(cut).cast("timestamp"))
    val fresh = events.filter(col("ts") >= lit(cut).cast("timestamp"))
    val merged = IncrementalAgg.distinctFromState(
      IncrementalAgg.mergeDistinctStates(
        IncrementalAgg.distinctState(old, "ts", "1 day", "user_id"),
        IncrementalAgg.distinctState(fresh, "ts", "1 day", "user_id")))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val full = IncrementalAgg.distinctFromState(
      IncrementalAgg.distinctState(events, "ts", "1 day", "user_id"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    // union registers == direct-build registers: estimates identical
    assert(merged == full)
    assert(merged.nonEmpty)
    val exact = events.groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start"), col("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    exact.foreach { case (b, n) =>
      val e = merged(b)
      assert(math.abs(e - n).toDouble / n <= 0.05, s"bucket $b: est $e exact $n")
    }
  }

  test("histogram quantile state: merge == full recompute bit-identical; error <= bin width") {
    import graft.ops.IncrementalAgg
    val events = graft.core.Tables.events(spark, sfDir)
    val (lo, hi, bins) = (0.0, 1000.0, 200)
    val cut = "2024-01-15 00:00:00"
    val old = events.filter(col("ts") < lit(cut).cast("timestamp"))
    val fresh = events.filter(col("ts") >= lit(cut).cast("timestamp"))
    val merged = IncrementalAgg.mergeHistStates(
      IncrementalAgg.histState(old, "ts", "1 day", "value", lo, hi, bins),
      IncrementalAgg.histState(fresh, "ts", "1 day", "value", lo, hi, bins))
    val full = IncrementalAgg.histState(events, "ts", "1 day", "value", lo, hi, bins)
    val m = merged.as[(java.sql.Timestamp, Seq[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    val f = full.as[(java.sql.Timestamp, Seq[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(m == f) // exact integer counts: merge IS the recompute
    assert(m.nonEmpty)

    // quantile estimates land within one bin width of the exact
    // NEAREST-RANK value (the estimator's contract: it emits the upper
    // edge of the bin containing the rank-ceil(q*n) element)
    val binWidth = (hi - lo) / bins
    val approx = IncrementalAgg.quantilesFromState(full, lo, hi, Seq(0.5, 0.99))
      .as[(java.sql.Timestamp, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(sort_array(collect_list(col("value").cast("double"))).as("vs"))
      .select(col("w.start"), col("vs"))
      .as[(java.sql.Timestamp, Seq[Double])].collect()
      .map { case (ts, vs) =>
        def nearestRank(q: Double): Double =
          vs(math.max(math.ceil(q * vs.size).toInt, 1) - 1)
        ts -> ((nearestRank(0.5), nearestRank(0.99)))
      }.toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (ts, (p50, p99)) =>
      val (a50, a99) = approx(ts)
      assert(math.abs(a50 - p50) <= binWidth + 1e-9, s"$ts p50 $a50 vs $p50")
      assert(math.abs(a99 - p99) <= binWidth + 1e-9, s"$ts p99 $a99 vs $p99")
    }
  }

  test("prepareAggregatedForViz renames _avg and time_bucket, skips collisions") {
    import graft.ops.VizPrep
    val df = Seq((1L, 2.0, 3.0, 4.0)).toDF("time_bucket", "s1_avg", "s1_max", "s1_min")
    val out = VizPrep.prepareAggregatedForViz(df)
    assert(out.columns.toSeq == Seq("time", "s1", "s1_max", "s1_min"))
    // collision: s2 already exists — s2_avg must NOT rename onto it
    val clash = Seq((1.0, 2.0)).toDF("s2", "s2_avg")
    assert(VizPrep.prepareAggregatedForViz(clash).columns.toSeq == Seq("s2", "s2_avg"))
  }

  test("detectNumericColumns / detectDatetimeColumns are schema-level") {
    import graft.ops.VizPrep
    val df = Seq((1L, 1.5, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Date.valueOf("2024-01-01"))).toDF("i", "d", "s", "ts", "dt")
    assert(VizPrep.detectNumericColumns(df) == Seq("i", "d"))
    assert(VizPrep.detectDatetimeColumns(df) == Seq("ts", "dt"))
  }

  test("yAxisRange ignores NaN; filterByRange is inclusive and drops NaN") {
    import graft.ops.VizPrep
    val withNan = Seq(10.0, 20.0, Double.NaN).toDF("v")
    assert(VizPrep.yAxisRange(withNan, "v").contains((9.5, 20.5)))
    assert(VizPrep.yAxisRange(Seq(Double.NaN).toDF("v"), "v").isEmpty)
    // boundaries inclusive, NaN excluded
    val f = VizPrep.filterByRange(withNan, "v", 10.0, 20.0)
    assert(f.count() == 2)
  }

  test("Retry.withRetries: succeeds after transient failures, rethrows at cap") {
    var calls = 0
    val got = graft.sync.Retry.withRetries(3) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got == 42 && calls == 3)
    var calls2 = 0
    intercept[RuntimeException] {
      graft.sync.Retry.withRetries(2) { calls2 += 1; throw new RuntimeException("hard") }
    }
    assert(calls2 == 2)
  }

  test("numeric/datetime column detection from schema") {
    val df = Seq((1L, 2.0, "x")).toDF("a", "b", "c")
      .withColumn("t", current_timestamp())
    assert(graft.ops.TableStats.numericColumns(df) == Seq("a", "b"))
    assert(graft.ops.TableStats.datetimeColumns(df) == Seq("t"))
  }

  test("inferAndConvert: numeric wins, then datetime, else string") {
    val df = (1 to 100).map(i =>
      (i.toString, f"2024-01-${i % 28 + 1}%02d 12:00:00", s"txt$i"))
      .toDF("num_s", "dt_s", "plain_s")
    val conv = TypeInference.inferAndConvert(df, Seq("num_s", "dt_s", "plain_s"))
    assert(conv.schema("num_s").dataType.typeName == "double")
    assert(conv.schema("dt_s").dataType.typeName == "timestamp")
    assert(conv.schema("plain_s").dataType.typeName == "string")
  }

  test("suggestConversions reports convertible string columns only") {
    val df = (1 to 100).map(i =>
      (i.toLong, i.toString, f"2024-01-${i % 28 + 1}%02d 12:00:00", s"txt$i"))
      .toDF("already_num", "num_s", "dt_s", "plain_s")
    val got = TypeInference.suggestConversions(df)
    // non-string and non-parseable columns are absent from suggestions
    assert(got == Map("num_s" -> "numeric", "dt_s" -> "datetime"))
  }

  test("applyConversions converts the selected subset, leaves the rest untouched") {
    val df = (1 to 100).map(i =>
      (i.toString, f"2024-01-${i % 28 + 1}%02d 12:00:00", s"txt$i"))
      .toDF("num_s", "dt_s", "plain_s")
    // user accepts only the numeric suggestion — dt_s stays string even
    // though it is convertible (the rejected-suggestion contract)
    val conv = TypeInference.applyConversions(df, Map("num_s" -> "numeric"))
    assert(conv.schema("num_s").dataType.typeName == "double")
    assert(conv.schema("dt_s").dataType.typeName == "string")
    assert(conv.schema("plain_s").dataType.typeName == "string")
    // unknown columns and targets are skipped; a 0%-parseable selection
    // leaves the column unconverted rather than wiping it to nulls
    val same = TypeInference.applyConversions(df,
      Map("missing" -> "numeric", "plain_s" -> "numeric", "num_s" -> "bogus"))
    assert(same.schema == df.schema)
  }
}

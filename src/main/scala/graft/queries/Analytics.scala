package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The analytics surface under the reference's dashboard/agent —
  * aggregation, joins, windows, top-k, pivot, rollup, sessionize,
  * as-of — expressed as declarative Spark plans.
  *
  * Scale notes: all dims (region/nation/supplier at TPC-H ratios)
  * are explicitly broadcast; fact-fact joins shuffle on their keys
  * with AQE; every groupBy benefits from map-side partial
  * aggregation. Float aggregates are rounded identically to the
  * DuckDB oracle (SURVEY.md §5).
  */
object Analytics {

  /** Flagship: pricing summary (TPC-H Q1 shape) over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity").cast("decimal(30,12)")).cast("double"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(30,12)")).cast("double"), 2).as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(30,12)")).cast("double"), 2).as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(30,12)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_discount").cast("decimal(30,12)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue per nation: fact joined to broadcast dims. */
  def joinDim(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice").cast("decimal(30,12)")).cast("double"), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  /** TPC-H Q5 shape: 5-way join, region filter, revenue per nation. */
  def multiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
                          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(30,12)")).cast("double"), 2)
        .as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q3 shape — shipping priority: top-10 unshipped orders of one
    * market segment by outstanding revenue. The pattern [[multiJoin]]
    * (Q5 shape) doesn't cover: a HIGH-cardinality groupBy (per order,
    * not per nation) whose result is immediately top-N'd — the
    * orderBy+limit lowers to TakeOrdered, so the full per-order
    * aggregate never sorts globally. Both date filters push to the
    * scans; the selective segment filter lets AQE broadcast the
    * customer side. Revenue sums through decimal (repo contract) with
    * (o_orderdate, l_orderkey) tie-breaks for a deterministic top-10.
    */
  def shippingPriority(spark: SparkSession, dir: String,
                       segment: String = "BUILDING",
                       cutoff: String = "1996-06-30"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === segment)
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,12)")).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Top-10 customers by total order value (TakeOrdered — no global
    * sort materialization).
    */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("o_totalprice").cast("decimal(30,12)")).cast("double"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  /** Top-3 customers by balance within each nation (window rank). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select("c_nationkey", "rank_in_nation", "c_custkey", "c_name", "c_acctbal")
      .orderBy("c_nationkey", "rank_in_nation")
  }

  /** Running order-value total per customer over time. Bounded to a
    * keyset so the oracle output stays small; the plan is the same at
    * any scale (one shuffle on the partition key).
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 50)
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "running_total")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Exact interpolated percentiles per group — the stats-panel
    * quantile view. Spark's `percentile` and DuckDB's quantile_cont
    * share the sorted-interpolation definition.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95"))
      .orderBy("l_returnflag")

  /** Time-range moving aggregate: 7-day trailing average order value
    * per customer — window rangeBetween over an epoch-seconds key (one
    * shuffle on the partition key; the range frame is evaluated with a
    * sliding pointer, not a re-scan).
    */
  def movingAverage(spark: SparkSession, dir: String): DataFrame = {
    val epoch = unix_timestamp(col("o_orderdate"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(epoch)
      .rangeBetween(-7L * 86400, 0)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 50)
      .withColumn("avg_7d", round(avg(col("o_totalprice")).over(w), 6))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "avg_7d")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Exact distinct counts per group (partial-agg distinct). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** EXISTS / NOT EXISTS via left_semi / left_anti joins. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("segment"), col("n"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("segment"), col("n"))
    withOrders.unionByName(withoutOrders).orderBy("segment")
  }

  /** Pivot order counts: status × priority via conditional aggregation
    * (portable to ANSI SQL, unlike engine-specific PIVOT).
    */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_pending"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0)).cast("decimal(30,12)")).cast("double"), 2).as("finished_value"))
      .orderBy("o_orderpriority")

  /** ROLLUP subtotals over returnflag × linestatus. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity").cast("decimal(30,12)")).cast("double"), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Set operations (distinct semantics, like SQL INTERSECT/EXCEPT/
    * UNION): customer activity across two years.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    def custIn(y: Int) = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select("o_custkey")
    val a = custIn(1996)
    val b = custIn(1997)
    def seg(name: String, df: DataFrame) =
      df.distinct().agg(count(lit(1)).as("n")).select(lit(name).as("segment"), col("n"))
    seg("both_years", a.intersect(b))
      .unionByName(seg("only_1996", a.except(b)))
      .unionByName(seg("either_year", a.union(b)))
      .orderBy("segment")
  }

  /** HAVING: post-aggregation filter on group counts. */
  def havingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 18)
      .orderBy("o_custkey")

  /** NULL-handling sweep: coalesce / nullif / conditional nulls. */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal_pos"),
        col("c_acctbal").isNull.cast("int").as("bal_was_null"))
      .orderBy("c_custkey").limit(300)

  /** CUBE: all grouping-set combinations of returnflag × linestatus. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity").cast("decimal(30,12)")).cast("double"), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Arbitrary GROUPING SETS — the general form behind rollup/cube:
    * per-(flag,status) detail plus independent per-flag and per-status
    * subtotals and the grand total, one aggregation pass (Catalyst
    * expands each input row once per set before the partial agg, so
    * the exchange carries |sets| × detail rows, not |sets| scans).
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity").cast("decimal(30,12)")).cast("double"), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
        col("sum_qty"))

  /** Calendar breakdown: revenue by (year, quarter, month). */
  def datePartsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice").cast("decimal(30,12)")).cast("double"), 2).as("revenue"))
      .orderBy("y", "q", "m")

  /** String-function sweep over customer names (codegen'd built-ins,
    * ANSI-identical semantics on both engines).
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("name_seg"))
      .orderBy("c_custkey").limit(200)

  /** As-of join, composed window formulation — ORACLE BASELINE ONLY.
    * The equi-join with `o_orderdate <= ts` materializes every
    * (event × prior-order) pair per user before the window keeps rank
    * 1: quadratic in per-key history, measured 3.4× slower than the
    * merge path at sf0.1 on identical output. It exists to hash-check
    * the semantics against DuckDB; library callers get
    * `AsOf.asofJoinTables` (cogroup two-pointer, O(events + orders)
    * per key) via `QueryService.asofJoin`.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    // spread: the broadcast-join probe side otherwise inherits the
    // single-split scan and runs the join + per-event window serially
    val e = Tables.spread(
      Tables.events(spark, dir).select("event_id", "ts", "user_id"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val joined = e.join(o,
      col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
      "left")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("event_id", "ts", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id")
  }

  /** Sessionize events: a >30-minute gap starts a new session; emit
    * per-session stats. lag + cumulative flag sum — two window passes
    * over one shuffle on user_id.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // unix_micros (exact integer µs) == DuckDB epoch_us: the gap
    // comparison is integer on both engines, no float truncation.
    val gapFlag = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > 1800000000L, 1
    ).otherwise(0)
    Tables.events(spark, dir)
      .withColumn("new_session", gapFlag)
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Ordered-step funnel: for each prefix of `steps`, how many users
    * completed the whole prefix IN ORDER, each step strictly after the
    * previous one — the standard product-analytics funnel (reference
    * surfaces event rollups via query_builder.py's filtered aggregates;
    * the ordered-sequence form is the composition a dashboard builds on
    * top). Completion is computed greedily on the earliest possible
    * per-step timestamp, which is optimal for reachability: the
    * earliest completion of steps(0..i) uses the earliest step-i event
    * after the earliest completion of steps(0..i-1).
    *
    * Scale shape: ONE wide shuffle (groupBy user) — per-user events
    * collapse to a sorted (ts, type) array and a codegen'd `aggregate`
    * fold carries the earliest-completion timestamp per step, so the
    * shuffled payload is the filtered funnel events only (the
    * `isInCollection` filter is pushed to the scan) and the final
    * per-step count is a single tiny global aggregation. No window
    * function, no per-step join cascade — at 100 TB a join-per-step
    * funnel shuffles the event table once per step; this shuffles it
    * once total.
    */
  def funnel(spark: SparkSession, dir: String,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    val n = steps.length
    val stepsSql = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    val reach = Tables.events(spark, dir)
      .filter(col("event_type").isInCollection(steps))
      .select(col("user_id"), col("ts"), col("event_type").as("et"))
      .groupBy("user_id")
      // struct sort = (ts, et) lexicographic: deterministic on ts ties,
      // and the fold's strict `<` makes tie order irrelevant anyway
      .agg(sort_array(collect_list(struct(col("ts"), col("et")))).as("evs"))
      // acc(i) = earliest ts at which steps(0..i) were completed in
      // order, NULL while unreached; an event advances step i iff the
      // step is unreached, the type matches, and the previous step was
      // reached strictly earlier.
      .withColumn("reach", expr(
        s"""aggregate(evs,
           |  array_repeat(CAST(NULL AS TIMESTAMP), $n),
           |  (acc, e) -> transform(acc, (t, i) ->
           |    CASE WHEN t IS NULL AND e.et = element_at($stepsSql, i + 1)
           |              AND (i = 0 OR (acc[i - 1] IS NOT NULL AND acc[i - 1] < e.ts))
           |         THEN e.ts ELSE t END))""".stripMargin))
    val counts = reach.select(
      (0 until n).map(i =>
        // coalesce: a global sum over ZERO users is NULL, but an empty
        // funnel must report 0 per step (matching the oracle's count)
        coalesce(sum(when(col("reach")(i).isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"u$i")): _*)
    counts.select(expr(
      s"stack($n, ${(0 until n).map(i => s"${i + 1}, '${steps(i)}', u$i").mkString(", ")})" +
        " AS (step, step_name, users)"))
      .orderBy("step")
  }

  /** TIME-CONSTRAINED funnel — [[funnel]] with a per-step conversion
    * window: step i+1 counts only if it happens within `maxGapSeconds`
    * of step i's reach time (a view→click→purchase chain spread over
    * a month is not a funnel conversion). Semantics are the same
    * GREEDY earliest-reach fold as [[funnel]] with the gap bound on
    * the advance condition; because events fold in time order, the
    * reach times are exactly the sequential correlated minima
    *   t0 = min ts(step0);  t_{i+1} = min ts(step_{i+1}) in
    *   (t_i, t_i + gap]
    * — which is what the oracle replays as chained aggregates. (A
    * later, slower step-i occurrence that would have converted is NOT
    * retried — the greedy contract, explicit and deterministic.)
    *
    * Scale shape: identical to [[funnel]] — one wide groupBy(user)
    * shuffle, codegen'd fold, stack of a single counts row.
    */
  def funnelWindowed(spark: SparkSession, dir: String,
                     maxGapSeconds: Long,
                     steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive: $maxGapSeconds")
    val n = steps.length
    val stepsSql = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    val reach = Tables.events(spark, dir)
      .filter(col("event_type").isInCollection(steps))
      .select(col("user_id"), col("ts"), col("event_type").as("et"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("et")))).as("evs"))
      .withColumn("reach", expr(
        s"""aggregate(evs,
           |  array_repeat(CAST(NULL AS TIMESTAMP), $n),
           |  (acc, e) -> transform(acc, (t, i) ->
           |    CASE WHEN t IS NULL AND e.et = element_at($stepsSql, i + 1)
           |              AND (i = 0 OR (acc[i - 1] IS NOT NULL AND acc[i - 1] < e.ts
           |                             AND e.ts <= acc[i - 1] + INTERVAL '$maxGapSeconds' SECOND))
           |         THEN e.ts ELSE t END))""".stripMargin))
    val counts = reach.select(
      (0 until n).map(i =>
        coalesce(sum(when(col("reach")(i).isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(s"u$i")): _*)
    counts.select(expr(
      s"stack($n, ${(0 until n).map(i => s"${i + 1}, '${steps(i)}', u$i").mkString(", ")})" +
        " AS (step, step_name, users)"))
      .orderBy("step")
  }

  /** Weekly cohort retention: users grouped by their first-activity
    * date (the cohort), counted once per week-offset they were active
    * in — the standard retention triangle behind every growth
    * dashboard. Week offsets are computed from the user's own cohort
    * date (`floor(days/7)`), not calendar-week truncation, so the
    * result is engine-portable (no ISO-week boundary semantics).
    *
    * Scale shape: ONE wide shuffle — groupBy(user) with map-side
    * partial `collect_set` over ACTIVE DAYS (bounded by days in the
    * observation window, not event volume), then explode + a tiny
    * (cohort, offset) aggregation. The (user, cohort, offset) distinct
    * rides the same exploded stream.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(min(col("d")).as("cohort_date"), collect_set(col("d")).as("days"))
      .select(col("user_id"), col("cohort_date"), explode(col("days")).as("d"))
      .withColumn("week_offset",
        floor(datediff(col("d"), col("cohort_date")) / 7).cast("int"))
      .select("user_id", "cohort_date", "week_offset")
      .distinct()
      .groupBy("cohort_date", "week_offset")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_date", "week_offset")

  /** Z-SCORE anomaly detection over a bucketed event series — the
    * dashboard alerting primitive ("this hour's click volume is 4σ
    * off"): per series (typeCol), events bucket to `interval` counts,
    * and each bucket's count is scored against the series' own
    * population mean/σ. A constant series (σ = 0) scores 0 — no
    * division blowup, no NaN on the hash path.
    *
    * Determinism contract: bucket counts are exact longs; mean and
    * variance derive from exact integer sums in one FIXED operation
    * order (mean = sum/n; var = sumsq/n − mean²), sqrt and the final
    * quotient are single IEEE ops — identical in any engine, left
    * unrounded (the [[graft.ops.TimeBucketAgg.bucketed]] convention).
    *
    * Scale shape: one map-side-combining groupBy to the bucket frame
    * (buckets × types — small at any corpus size), then series stats
    * as windows over that frame; the raw events are touched exactly
    * once.
    */
  def anomalyZscore(events: DataFrame, typeCol: String, timeCol: String,
                    interval: String, zFlag: Double): DataFrame = {
    require(zFlag > 0, s"zFlag must be positive, got $zFlag")
    val buckets = events
      .groupBy(col(typeCol), window(col(timeCol), interval).as("w"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_ts", col("w.start")).drop("w")
    val w = Window.partitionBy(col(typeCol))
    val cnt = count(lit(1)).over(w).cast("double")
    val mean = sum(col("n")).over(w).cast("double") / cnt
    val variance = sum(col("n") * col("n")).over(w).cast("double") / cnt -
      mean * mean
    buckets
      .withColumn("z", when(variance <= 0, lit(0.0))
        .otherwise((col("n").cast("double") - mean) / sqrt(variance)))
      .withColumn("is_anomaly", abs(col("z")) >= zFlag)
      .select(col(typeCol), col("bucket_ts"), col("n"), col("z"),
        col("is_anomaly"))
  }

  /** Event TRANSITION MATRIX — the first-order Markov view of user
    * behavior (what follows what?): per key, order events by
    * (timeCol, tieBreak), pair each event with its successor, count
    * (from, to) pairs and normalize per `from` into transition
    * probabilities. The row-normalized matrix feeds journey
    * dashboards, anomaly baselines ("this path never happens"), and
    * synthetic-session generators.
    *
    * Scale shape: one key exchange for the lead window; the pair
    * count is a map-side-combining groupBy to a TYPE²-bounded frame,
    * and the per-from normalization windows over that tiny frame.
    * Probabilities are unrounded quotients of exact longs — engine-
    * stable by construction.
    */
  def eventTransitions(events: DataFrame, keyCol: String, typeCol: String,
                       timeCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieBreak))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob", col("n").cast("double") /
        sum("n").over(Window.partitionBy(col("from_type"))).cast("double"))
  }
}

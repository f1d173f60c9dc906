package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed aggregation — the reference's core dashboard query.
  *
  * Reference: src/oracle_duckdb_sync/data/query_core.py:198
  * (`time_bucket(INTERVAL i, ts)` + COUNT + per-column AVG/MIN/MAX),
  * and the legacy variant src/oracle_duckdb_sync/application/
  * query_service.py:310-320 which first parses a `YYYYMMDDHHMMSS`
  * varchar timestamp with strptime.
  *
  * Spark realization: `window(ts, interval)` — a codegen'd
  * expression, epoch-aligned like DuckDB's time_bucket for
  * day-dividing intervals. The groupBy gets a map-side partial
  * aggregate, so at 100 TB the shuffle carries only
  * (bucket × columns) partial states, not rows.
  */
object TimeBucketAgg {

  /** AVG + exact MIN/MAX per value column, plus the bucket row count.
    *
    * The average is double(SUM(decimal)) / count, UNROUNDED: double
    * summation is order-dependent (a distributed partial-agg order
    * differs from any single-node engine's), so the sum runs through
    * associative DECIMAL(30,12) — bit-identical for any plan shape or
    * parallelism. The quotient of identical doubles is identical, and
    * skipping the final round also sidesteps engine-specific
    * round-half behavior at exact .5·10⁻ⁿ boundaries (observed at
    * sf0.1: power-of-two bucket counts over 2-dp data land there
    * often).
    */
  def bucketed(table: DataFrame, timeCol: String, interval: String,
               valueCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("point_count") +:
      valueCols.flatMap { c =>
        Seq((sum(col(c).cast("decimal(30,12)")).cast("double") /
              count(lit(1))).as(s"${c}_avg"),
            min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"))
      }
    table
      .groupBy(window(col(timeCol), interval).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_ts", col("w.start"))
      .drop("w")
      .select(("bucket_ts" +: "point_count" +: valueCols.flatMap(c =>
        Seq(s"${c}_avg", s"${c}_min", s"${c}_max"))).map(col): _*)
      .orderBy("bucket_ts")
  }

  /** Legacy path: the timestamp arrives as a YYYYMMDDHHMMSS varchar;
    * parse then bucket (query_service.py:314 strptime equivalent).
    */
  def bucketedFromVarchar(table: DataFrame, varcharTimeCol: String,
                          interval: String, valueCols: Seq[String]): DataFrame =
    bucketed(
      table.withColumn("__ts",
        to_timestamp(col(varcharTimeCol), "yyyyMMddHHmmss")),
      "__ts", interval, valueCols)

  /** Densify a bucketed series for charting: one row per `interval`
    * step between each group's min and max bucket — a chart over a
    * sparse series otherwise silently interpolates across gaps the
    * data never saw (the reference's line charts feed straight from
    * the bucket aggregate, visualization.py:22, and inherit the
    * problem). Missing buckets take 0 in `zeroFill` columns (counts),
    * the last seen value in `forwardFill` columns (gauges), NULL
    * otherwise.
    *
    * Scale shape: runs on the AGGREGATE (bucket-grain) table, never
    * the raw rows. The dense axis is `sequence(min, max, interval)`
    * per group — span-bounded, generated where each group's agg row
    * lives; the fill join and the forward-fill window both key on the
    * same (group, bucket) partitioning, so the whole densify adds ONE
    * group-keyed exchange of bucket-grain rows.
    */
  def fillTimeGaps(bucketed: DataFrame, bucketCol: String, interval: String,
                   groupCols: Seq[String] = Nil,
                   zeroFill: Seq[String] = Nil,
                   forwardFill: Seq[String] = Nil): DataFrame = {
    val dataCols = bucketed.columns.toSeq
      .filterNot(c => c == bucketCol || groupCols.contains(c))
    require((zeroFill ++ forwardFill).forall(dataCols.contains),
      s"fill columns must be non-key columns of the input: $dataCols")
    val gCols = groupCols.map(col)
    val axis = bucketed
      .groupBy(gCols: _*)
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
      .select(gCols :+ explode(expr(
        s"sequence(__mn, __mx, interval $interval)")).as(bucketCol): _*)
    val joined = axis.join(bucketed, groupCols :+ bucketCol, "left")
    val zeroed = zeroFill.foldLeft(joined)((df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L))))
    val filled =
      if (forwardFill.isEmpty) zeroed
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(gCols: _*).orderBy(col(bucketCol).asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        forwardFill.foldLeft(zeroed)((df, c) =>
          df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      }
    filled.select(((groupCols :+ bucketCol) ++ dataCols).map(col): _*)
      .orderBy((groupCols :+ bucketCol).map(col): _*)
  }

  /** TIME-WEIGHTED average over an irregular sample series — the
    * number a dashboard must show when samples arrive unevenly (a
    * plain AVG over-weights bursts: ten readings in one busy minute
    * should not drown an hour at a steady value). Semantics: per key,
    * samples order by (timeCol, tieBreak); each sample's value holds
    * until the next sample (last-observation-carried-forward step
    * function; the final sample spans zero time), and the average is
    * weighted by each step's duration. A zero-span series (single
    * sample, or all samples at one instant) degrades to the plain
    * mean.
    *
    * Determinism contract: durations are exact microsecond longs
    * (`unix_micros`); the per-row value·duration product is one IEEE
    * double multiply (identical in any engine), and the weighted sum
    * FOLDS the products in (timeCol, tieBreak) order — the
    * d_domain_mix_temp ordered-fold convention — because neither a
    * distributed partial-agg double sum nor a double→decimal cast is
    * engine-stable (the decimal cast was tried and diverged in the
    * last ulp: Spark rounds the double's shortest decimal rendering,
    * DuckDB the exact binary value). The final quotient is a double
    * division of identical inputs, left UNROUNDED (the [[bucketed]]
    * convention). Per-key fold state is bounded by samples-per-key.
    *
    * Scale shape: ONE key exchange — the lead window and the per-key
    * aggregate share the key partitioning; only (key, value, dur)
    * survive into the agg.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, timeCol: String,
                      valueCol: String, tieBreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieBreak))
    val dur = coalesce(
      unix_micros(lead(col(timeCol), 1).over(w)) - unix_micros(col(timeCol)),
      lit(0L))
    df.withColumn("__dur", dur)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(col("__dur")).as("__span"),
        expr(s"""aggregate(
          |  array_sort(collect_list(named_struct(
          |    't', $timeCol, 'tb', $tieBreak,
          |    'p', $valueCol * __dur, 'v', CAST($valueCol AS DOUBLE)))),
          |  named_struct('ws', CAST(0 AS DOUBLE), 'vs', CAST(0 AS DOUBLE)),
          |  (a, x) -> named_struct('ws', a.ws + x.p, 'vs', a.vs + x.v))"""
          .stripMargin).as("__f"))
      .select(col(keyCol), col("n_samples"),
        (col("__span").cast("double") / 1000000.0).as("span_seconds"),
        when(col("__span") > 0,
          col("__f.ws") / col("__span").cast("double"))
          .otherwise(col("__f.vs") / col("n_samples"))
          .as("twa"))
  }
}

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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of time-bucket aggregates — the reference's
  * cached-aggregation layer (enhanced_query_service + incremental
  * loader: keep aggregated state, merge only the fresh slice) without
  * recomputing history.
  *
  * State per (bucket, value-col): count, DECIMAL sum, min, max — all
  * decomposable, so  state(old ∪ fresh) = merge(state(old),
  * state(fresh))  exactly. The decimal sum keeps the merge
  * bit-identical to a full recompute under any slicing (same
  * associativity argument as TimeBucketAgg). avg is derived on read.
  *
  * At 100 TB this is the difference between re-aggregating the table
  * per refresh and aggregating only the watermark tail: the state is
  * buckets × columns rows (tiny), the fresh slice is a pushed-down
  * time-range scan.
  */
object IncrementalAgg {

  /** Aggregate a raw slice into mergeable bucket state. */
  def bucketState(slice: DataFrame, timeCol: String, interval: String,
                  valueCol: String): DataFrame =
    slice
      .groupBy(window(col(timeCol), interval).as("w"))
      .agg(
        count(lit(1)).as("point_count"),
        sum(col(valueCol).cast("decimal(30,12)")).as("value_sum"),
        min(col(valueCol)).as("value_min"),
        max(col(valueCol)).as("value_max"))
      .select(col("w.start").as("bucket_ts"), col("point_count"),
        col("value_sum"), col("value_min"), col("value_max"))

  /** Merge two bucket states (either may have buckets the other lacks). */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket_ts"))
      .agg(
        sum(col("point_count")).as("point_count"),
        sum(col("value_sum")).as("value_sum"),
        min(col("value_min")).as("value_min"),
        max(col("value_max")).as("value_max"))

  /** Reader view: the TimeBucketAgg output shape (avg derived from the
    * exact decimal sum — identical to a full recompute).
    */
  def readState(state: DataFrame): DataFrame =
    state.select(
      col("bucket_ts"),
      col("point_count"),
      (col("value_sum").cast("double") / col("point_count")).as("value_avg"),
      col("value_min"),
      col("value_max"))
      .orderBy("bucket_ts")
}

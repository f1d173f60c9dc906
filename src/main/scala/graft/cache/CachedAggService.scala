package graft.cache

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.IncrementalAgg

/** Cached TIME-BUCKET AGGREGATES: the dashboard-latency core of the
  * reference's caching layer married to mergeable aggregate state.
  *
  * Where [[CachedQueryService]] caches raw rows, this caches the
  * bucket STATE (count / decimal sum / min / max per bucket) and
  * refreshes it by aggregating ONLY the watermark tail and merging —
  * `state(old ∪ fresh) = merge(state(old), state(fresh))` exactly
  * (IncrementalAgg's decimal-sum argument), so a refresh is
  * bit-identical to a full recompute while reading only new rows.
  *
  * At 100 TB: the cached state is buckets × 4 values (tiny — it
  * broadcasts), the refresh scan is a pushed time-range predicate, and
  * the merge shuffles state rows, never history.
  *
  * Watermark contract (same as CachedQueryService): refresh reads rows
  * STRICTLY past the stored watermark. The bit-identical guarantee
  * holds for append-in-time-order sources; late arrivals that EQUAL
  * the watermark are out-of-order data — handle those with the
  * streaming path (event-time watermarks) or clearCache + rebuild.
  */
class CachedAggService(spark: SparkSession, dir: String,
                       cache: QueryCacheManager,
                       nowMillis: () => Long = () => System.currentTimeMillis()) {

  private def aggKey(timeCol: String, interval: String, valueCol: String) =
    Some(s"agg_${timeCol}_${interval.replace(' ', '_')}_$valueCol")

  private def maxTsString(df: DataFrame, tc: String): Option[String] =
    Option(df.agg(max(col(tc)).cast("string")).head().getString(0))

  /** The bucketed aggregate of `table`, served from cached state —
    * initial full aggregation on first call, merge-only refresh after.
    * Output shape matches `TimeBucketAgg.bucketed` (bucket_ts,
    * point_count, value_avg, value_min, value_max).
    */
  def aggregateWithCaching(table: String, timeCol: String, interval: String,
                           valueCol: String): CachedQueryResult = {
    val key = aggKey(timeCol, interval, valueCol)
    val meta = if (cache.hasCache(table, key)) cache.getMetadata(table, key) else None
    val base = Tables.loadNormalized(spark, dir, table)
    meta.flatMap(_.lastTimestamp) match {
      case Some(wm) =>
        val fresh = base.filter(
          col(timeCol) > lit(wm).cast(base.schema(timeCol).dataType))
        val freshCount = fresh.count()
        val state = cache.getCachedData(table, key)
          .getOrElse(sys.error(s"agg cache metadata present but state missing for '$table'"))
        if (freshCount == 0)
          CachedQueryResult(IncrementalAgg.readState(state),
            isIncremental = true, meta.get.rowCount, 0)
        else {
          val merged = IncrementalAgg.mergeStates(state,
            IncrementalAgg.bucketState(fresh, timeCol, interval, valueCol))
          val newWm = maxTsString(fresh, timeCol).orElse(meta.flatMap(_.lastTimestamp))
          val n = meta.get.rowCount + freshCount
          cache.setCachedData(table, merged,
            CachedQueryMetadata(newWm, n, nowMillis()), key)
          val back = cache.getCachedData(table, key).getOrElse(merged)
          CachedQueryResult(IncrementalAgg.readState(back),
            isIncremental = true, n, freshCount)
        }
      case None =>
        val state = IncrementalAgg.bucketState(base, timeCol, interval, valueCol)
        val n = base.count()
        val wm = maxTsString(base, timeCol)
        cache.setCachedData(table, state, CachedQueryMetadata(wm, n, nowMillis()), key)
        val back = cache.getCachedData(table, key).getOrElse(state)
        CachedQueryResult(IncrementalAgg.readState(back),
          isIncremental = false, n, n)
    }
  }

  def clearCache(table: String, timeCol: String, interval: String,
                 valueCol: String): Unit =
    cache.clearCache(Some(table), aggKey(timeCol, interval, valueCol))

  private def histKey(timeCol: String, interval: String, valueCol: String,
                      lo: Double, hi: Double, nBins: Int) =
    Some(s"hist_${timeCol}_${interval.replace(' ', '_')}_${valueCol}_${lo}_${hi}_$nBins")

  /** Per-bucket quantiles served from cached HISTOGRAM state — same
    * merge-only refresh contract as [[aggregateWithCaching]], with the
    * same bit-identical guarantee (bin counts are exact integers, so
    * element-wise merge IS the recompute). The domain/bin parameters
    * are part of the cache key: changing them starts a fresh state.
    */
  def quantilesWithCaching(table: String, timeCol: String, interval: String,
                           valueCol: String, lo: Double, hi: Double,
                           nBins: Int, qs: Seq[Double]): CachedQueryResult = {
    val key = histKey(timeCol, interval, valueCol, lo, hi, nBins)
    val meta = if (cache.hasCache(table, key)) cache.getMetadata(table, key) else None
    val base = Tables.loadNormalized(spark, dir, table)
    def read(state: DataFrame) = IncrementalAgg.quantilesFromState(state, lo, hi, qs)
    meta.flatMap(_.lastTimestamp) match {
      case Some(wm) =>
        val fresh = base.filter(
          col(timeCol) > lit(wm).cast(base.schema(timeCol).dataType))
        val freshCount = fresh.count()
        val state = cache.getCachedData(table, key)
          .getOrElse(sys.error(s"hist cache metadata present but state missing for '$table'"))
        if (freshCount == 0)
          CachedQueryResult(read(state), isIncremental = true, meta.get.rowCount, 0)
        else {
          val merged = IncrementalAgg.mergeHistStates(state,
            IncrementalAgg.histState(fresh, timeCol, interval, valueCol, lo, hi, nBins))
          val newWm = maxTsString(fresh, timeCol).orElse(meta.flatMap(_.lastTimestamp))
          val n = meta.get.rowCount + freshCount
          cache.setCachedData(table, merged,
            CachedQueryMetadata(newWm, n, nowMillis()), key)
          val back = cache.getCachedData(table, key).getOrElse(merged)
          CachedQueryResult(read(back), isIncremental = true, n, freshCount)
        }
      case None =>
        val state = IncrementalAgg.histState(base, timeCol, interval, valueCol, lo, hi, nBins)
        val n = base.count()
        val wm = maxTsString(base, timeCol)
        cache.setCachedData(table, state, CachedQueryMetadata(wm, n, nowMillis()), key)
        val back = cache.getCachedData(table, key).getOrElse(state)
        CachedQueryResult(read(back), isIncremental = false, n, n)
    }
  }
}

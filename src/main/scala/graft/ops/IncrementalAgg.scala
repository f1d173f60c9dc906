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

  // ── Mergeable quantile state ──────────────────────────────────────
  //
  // count/sum/min/max decompose exactly, but percentile_approx state
  // is NOT mergeable across refreshes in this layer. A fixed-bin
  // histogram over a configured [lo, hi) domain is: bin counts are
  // exact integers, merging is element-wise addition, so
  // merge(state(A), state(B)) == state(A ∪ B) BIT-IDENTICAL under any
  // slicing, and any quantile reads off the cumulative counts with
  // error bounded by one bin width. State size: buckets × nBins longs.

  /** Histogram bucket state: per time bucket, `nBins` counts over the
    * fixed domain [lo, hi) (out-of-range values clamp to the edge
    * bins, so the state also absorbs outliers deterministically).
    */
  def histState(slice: DataFrame, timeCol: String, interval: String,
                valueCol: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 100000, s"nBins out of range: $nBins")
    require(hi > lo, s"empty histogram domain [$lo, $hi)")
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((col(valueCol).cast("double") - lo) / (hi - lo) * nBins).cast("int")))
    slice
      .groupBy(window(col(timeCol), interval).as("w"), bin.as("__bin"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("w"))
      .agg(expr(s"""aggregate(
        |  collect_list(struct(__bin, __c)),
        |  cast(array_repeat(0L, $nBins) as array<bigint>),
        |  (acc, e) -> transform(acc, (v, i) -> if(i = e.__bin, v + e.__c, v)))"""
        .stripMargin).as("hist"))
      .select(col("w.start").as("bucket_ts"), col("hist"))
  }

  /** Merge histogram states: element-wise sum per time bucket. */
  def mergeHistStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket_ts"))
      .agg(expr(
        """aggregate(
          |  collect_list(hist),
          |  cast(array_repeat(0L, size(first(hist))) as array<bigint>),
          |  (acc, h) -> zip_with(acc, h, (x, y) -> x + y))""".stripMargin)
        .as("hist"))

  // ── Mergeable distinct-count state ────────────────────────────────
  //
  // countDistinct does not decompose, so an incremental dashboard
  // cannot maintain exact per-bucket distinct users without re-reading
  // history. A DataSketches HLL sketch does decompose: registers are
  // per-slot maxima over the input set, so union(sketch(A), sketch(B))
  // holds the same registers as sketch(A ∪ B) — the MERGED state
  // estimates identically to a full recompute (the spec pins estimate
  // equality; binary layout may differ), insertion-order-independent,
  // within HLL's standard error (~1.04/√2^lgK ≈ 1.6% at lgK 12) of
  // exact. State: buckets × one sketch (≤ ~2^lgK bytes).

  /** Distinct-count bucket state: per time bucket, an HLL sketch of
    * `keyCol` (Spark's built-in DataSketches `hll_sketch_agg`).
    */
  def distinctState(slice: DataFrame, timeCol: String, interval: String,
                    keyCol: String, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    slice
      .groupBy(window(col(timeCol), interval).as("w"))
      .agg(expr(s"hll_sketch_agg(`$keyCol`, $lgK)").as("sketch"))
      .select(col("w.start").as("bucket_ts"), col("sketch"))
  }

  /** Merge distinct states: HLL union per time bucket. */
  def mergeDistinctStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket_ts"))
      .agg(expr("hll_union_agg(sketch)").as("sketch"))

  /** Reader view: approximate distinct count per bucket. */
  def distinctFromState(state: DataFrame): DataFrame =
    state.select(col("bucket_ts"),
      expr("hll_sketch_estimate(sketch)").as("approx_distinct"))
      .orderBy("bucket_ts")

  /** Quantiles from histogram state: for each requested q, the upper
    * edge of the first bin whose cumulative count reaches ceil(q * n)
    * — a deterministic estimate within one bin width of the exact
    * rank-q value (for in-domain data; q = 0 degenerates to the first
    * bin's upper edge). Empty buckets yield null. Output columns are
    * named `q_<percent>` (q_50, q_99, ...).
    */
  def quantilesFromState(state: DataFrame, lo: Double, hi: Double,
                         qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles $qs")
    val withN = state
      .withColumn("__n", expr("aggregate(hist, 0L, (a, x) -> a + x)"))
    val qCols = qs.map { q =>
      // single fold over the bins: carry (cumulative, position, found
      // index); the found index freezes once the target rank is reached
      val idx = expr(
        s"""aggregate(
           |  hist,
           |  named_struct('cum', 0L, 'pos', 0, 'idx', -1),
           |  (acc, c) -> named_struct(
           |    'cum', acc.cum + c,
           |    'pos', acc.pos + 1,
           |    'idx', if(acc.idx >= 0, acc.idx,
           |      if(acc.cum + c >= ceil($q * __n), acc.pos, -1))),
           |  acc -> acc.idx)""".stripMargin)
      when(col("__n") === 0, lit(null).cast("double"))
        .otherwise(lit(lo) + (idx + 1).cast("double") *
          lit(hi - lo) / expr("CAST(size(hist) AS DOUBLE)"))
        .as(s"q_${math.round(q * 100)}")
    }
    withN.select(col("bucket_ts") +: qCols: _*).orderBy("bucket_ts")
  }
}

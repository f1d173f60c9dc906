package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-range join (non-equi temporal/interval join).
  *
  * Spark's planner turns a bare `p >= start AND p < end` join into a
  * broadcast-nested-loop or cartesian product — O(|points| x |ranges|)
  * comparisons, the classic scale killer. This operator BUCKETS the
  * domain: each point lands in exactly one width-`w` bucket, each range
  * explodes to the buckets it overlaps (len/w + 1 copies), and the join
  * becomes a plain equi shuffle join on the bucket id with the exact
  * predicate re-applied as a post-filter. No distinct is needed — a
  * point's single bucket meets each overlapping range exactly once.
  *
  * Cost model at 100 TB: comparisons drop from |P| x |R| to
  * sum-per-bucket |P_b| x |R_b|; pick `bucketWidth` near the median
  * range length (wider → fewer range copies but more false candidates,
  * narrower → the reverse). AQE's skew-join split handles hot buckets.
  */
object RangeJoin {

  /** Join `points` to every row of `ranges` whose
    * `[startCol, endCol)` interval contains `pointCol`. The three
    * columns must share an integral domain (epoch days/seconds/micros).
    */
  def pointInRange(points: DataFrame, ranges: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val p = points.withColumn("__b", floor(col(pointCol) / bucketWidth).cast("long"))
    val r = ranges.withColumn("__b", explode(sequence(
      floor(col(startCol) / bucketWidth).cast("long"),
      floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    p.join(r, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b")
  }

  /** Per-range aggregation of contained points without materializing
    * the joined rows downstream: point-in-range join, then group by the
    * range key with map-side partial aggregation.
    */
  def rangeAgg(points: DataFrame, ranges: DataFrame,
               pointCol: String, startCol: String, endCol: String,
               bucketWidth: Long, rangeKey: String,
               aggs: Seq[Column]): DataFrame =
    pointInRange(points, ranges, pointCol, startCol, endCol, bucketWidth)
      .groupBy(col(rangeKey))
      .agg(aggs.head, aggs.tail: _*)

  /** Interval OVERLAP join: every (left, right) pair whose half-open
    * intervals `[lStart, lEnd)` and `[rStart, rEnd)` intersect.
    *
    * Both sides explode to their overlapped buckets, so a pair can
    * meet in several buckets — instead of a distinct, each candidate
    * pair is kept only in ONE canonical bucket: the bucket of
    * `greatest(lStart, rStart)` (the overlap's first instant, which
    * both sides necessarily cover when they intersect). This keeps the
    * join purely equi + filter — no dedup exchange — which at 100 TB
    * is the difference between one shuffle and two.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    def exploded(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor((col(e) - 1) / bucketWidth).cast("long"))))
    // explicit-N bucket exchanges, deliberately UNCONDITIONAL (unlike
    // winnowingPairs' narrow-input guard): the join needs a hash
    // exchange on __b on both sides regardless — no input arrives
    // pre-partitioned on a bucket id that exists only after explode —
    // so the explicit N never ADDS an exchange, it only pins the count
    // and exempts it from AQE coalescing. That exemption is the point:
    // interval rows are bytes-small but each bucket's pair expansion is
    // CPU-heavy, so AQE's byte heuristic collapses the join to a
    // handful of tasks. Measured (sf0.1, 7-run medians, isolated):
    // unconditional 0.80 s vs input-partition-guarded 1.62 s on
    // q_interval_overlap — the r9 in-suite 1.58 s that suggested the
    // guard was suite-order warmup noise, since fixed in Bench by the
    // per-query discarded warm pass.
    val n = left.sparkSession.sparkContext.defaultParallelism
    exploded(left, lStart, lEnd).repartition(n, col("__b"))
      .join(exploded(right, rStart, rEnd).repartition(n, col("__b")), Seq("__b"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__b") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth).cast("long"))
      .drop("__b")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Largest-Triangle-Three-Buckets downsampling, distributed.
  *
  * Reference: src/oracle_duckdb_sync/data/lttb.py:92 (`_lttb_core`) —
  * first/last always kept; interior indices split into threshold-2
  * equal buckets; per bucket keep the point forming the largest
  * triangle with an anchor on each side.
  *
  * The textbook algorithm anchors on the *previously selected* point,
  * a sequential dependency. This implementation uses the standard
  * parallel variant: anchor on the previous bucket's AVERAGE (the
  * next-side anchor is the next bucket's average, same as the
  * reference). Every bucket then selects independently — one groupBy
  * for the averages, one self-join against tiny anchor tables
  * (broadcast), one window argmax per bucket. Visual fidelity is
  * equivalent (both preserve local extrema); the spec pins the exact
  * variant semantics.
  *
  * Two global-index strategies:
  *  - `downsample`: single-partition window row_number — fine up to
  *    ~10M points per series (viz inputs), simplest plan.
  *  - `downsampleRangePartitioned`: range-partition on x, sort within
  *    partitions, per-partition offsets via zipWithIndex — no
  *    single-partition stage, the 100 TB path. Spec pins it equal to
  *    `downsample`.
  */
object Lttb {

  def downsample(df: DataFrame, xCol: String, yCol: String,
                 threshold: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    val n = df.count()
    if (threshold >= n || threshold <= 2) return df.orderBy(xCol)
    val indexed = df
      .withColumn("__x", col(xCol).cast("double"))
      .withColumn("__y", col(yCol).cast("double"))
      .withColumn("__i", row_number().over(
        Window.orderBy(col("__x") +: tieBreak.map(col): _*)) - 1)
      .persist() // core() reads it from 3 branches (interior/first/last)
    core(indexed, n, df.columns, threshold)
  }

  /** Scale path: global index without a single-partition window.
    * repartitionByRange + sortWithinPartitions gives a total order
    * across partitions; zipWithIndex stamps contiguous indices with
    * one lightweight count job (partition sizes only to the driver).
    */
  def downsampleRangePartitioned(df: DataFrame, xCol: String, yCol: String,
                                 threshold: Int, tieBreak: Seq[String] = Nil,
                                 numPartitions: Int = 0): DataFrame = {
    val n = df.count()
    if (threshold >= n || threshold <= 2) return df.orderBy(xCol)
    val prepared = df
      .withColumn("__x", col(xCol).cast("double"))
      .withColumn("__y", col(yCol).cast("double"))
    val sortCols = (col("__x") +: tieBreak.map(col)).map(_.asc)
    val parts = if (numPartitions > 0) numPartitions
      else prepared.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = prepared.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add("__i", LongType, nullable = false)
    val indexed = sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
      .persist() // core() reads it from 3 branches; avoids re-sorting
    core(indexed, n, df.columns, threshold)
  }

  // Scale note: persist() assumes the input is the viz slice (the
  // reference range-filters before downsampling). For a full-table
  // 100 TB input, filter to the plotted range first — the output is
  // `threshold` rows either way.

  /** Shared bucket-anchor-argmax stage over a globally-indexed input
    * (`__x`, `__y`, `__i` ∈ [0, n)).
    */
  private def core(indexed: DataFrame, n: Long, cols: Array[String],
                   threshold: Int): DataFrame = {
    val sp = indexed.sparkSession
    import sp.implicits._
    val bs = (n - 2).toDouble / (threshold - 2)
    val lastBucket = threshold - 3

    val interior = indexed.filter(col("__i") > 0 && col("__i") < n - 1)
      .withColumn("__b",
        least(floor((col("__i") - 1) / bs).cast("int"), lit(lastBucket)))

    // bucket averages and the two endpoints are tiny (threshold-sized):
    // collect once and rebuild the anchor tables as LOCAL relations, so
    // the two broadcast joins don't each re-execute an agg subplan
    val avgRows: Map[Int, (Double, Double)] = interior
      .groupBy(col("__b"))
      .agg(avg(col("__x")).as("__ax"), avg(col("__y")).as("__ay"))
      .as[(Int, Double, Double)].collect()
      .map { case (b, ax, ay) => b -> ((ax, ay)) }.toMap
    val endpoints = indexed.filter(col("__i") === 0 || col("__i") === n - 1)
      .select(col("__i"), col("__x"), col("__y"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val (fx, fy) = (endpoints.head._2, endpoints.head._3)
    val (lx, ly) = (endpoints.last._2, endpoints.last._3)

    val prevAnchors = (0 to lastBucket).map { b =>
      if (b == 0) (b, fx, fy)
      else { val (ax, ay) = avgRows(b - 1); (b, ax, ay) }
    }.toDF("__b", "__px", "__py")
    val nextAnchors = (0 to lastBucket).map { b =>
      if (b == lastBucket) (b, lx, ly)
      else { val (ax, ay) = avgRows(b + 1); (b, ax, ay) }
    }.toDF("__b", "__nx", "__ny")

    val firstRow = indexed.filter(col("__i") === 0)
    val lastRow = indexed.filter(col("__i") === n - 1)

    val withArea = interior
      .join(broadcast(prevAnchors), "__b")
      .join(broadcast(nextAnchors), "__b")
      .withColumn("__area", abs(
        (col("__px") - col("__nx")) * (col("__y") - col("__py")) -
        (col("__px") - col("__x")) * (col("__ny") - col("__py"))))

    val pick = Window.partitionBy(col("__b"))
      .orderBy(col("__area").desc, col("__i"))
    val selected = withArea
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(cols.map(col) :+ col("__i"): _*)

    firstRow.select(cols.map(col) :+ col("__i"): _*)
      .unionByName(selected)
      .unionByName(lastRow.select(cols.map(col) :+ col("__i"): _*))
      .orderBy("__i")
      .select(cols.map(col): _*)
  }
}

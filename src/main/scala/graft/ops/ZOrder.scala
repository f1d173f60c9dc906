package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column file pruning.
  *
  * A table sorted by one column gives tight per-file min/max bounds on
  * that column only; predicates on any other column read every file.
  * Sorting by the INTERLEAVED bits of several columns' rank spaces
  * gives every clustered column partially-tight bounds, so file-level
  * min/max pruning (parquet footers, Spark's partition/file skipping)
  * cuts scans for predicates on ANY of them — the standard lakehouse
  * layout technique for 100 TB fact tables queried along multiple
  * dimensions.
  *
  * Everything is plain Column arithmetic (codegen'd): per-column
  * min/max from ONE aggregation pass, linear scaling into b-bit rank
  * space, bit interleaving as a folded shift/mask expression, then
  * `repartitionByRange + sortWithinPartitions` on the z-value — the
  * write itself is the only wide exchange.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit i of column c
    * lands at position i*k + c. Columns must already be non-negative
    * longs below 2^bits (see [[rankColumns]]).
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * columns must fit a signed long: $bits * ${cols.size}")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale each column linearly into [0, 2^bits) rank space using its
    * observed min/max (one aggregation pass over `df`). Null ranks as
    * 0 (sorts first, same as Spark's default null ordering). Constant
    * columns rank as 0 everywhere — they contribute nothing to the
    * interleave, which is correct (no pruning dimension to gain).
    */
  def rankColumns(df: DataFrame, cols: Seq[String], bits: Int): Seq[Column] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bits) - 1
    cols.zipWithIndex.map { case (c, i) =>
      // an entirely-null column yields null min/max — rank it 0
      // everywhere, same as a constant column (no pruning dimension)
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else {
      val (mn, mx) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
      if (!(mx > mn)) lit(0L)
      else least(lit(top), greatest(lit(0L),
        floor((col(c).cast("double") - mn) / (mx - mn) * top).cast("long")))
      }
    }
  }

  /** Z-value column for `cols`, each scaled into its share of 63 bits
    * (2 cols → 31 bits each, 3 → 21, 4 → 15).
    */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 6,
      s"z-order needs 2-6 columns, got ${cols.size}")
    val bits = 63 / cols.size
    interleave(rankColumns(df, cols, bits), bits)
  }

  /** Write `df` clustered into `numFiles` z-ordered files. Range
    * partitioning on the z-value balances file sizes; the within-file
    * sort tightens footer min/max on every clustered column.
    */
  def clusterWrite(df: DataFrame, cols: Seq[String], outDir: String,
                   numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = zValue(df, cols).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}

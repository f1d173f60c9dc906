package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-based string→typed column inference and conversion.
  *
  * Reference: src/oracle_duckdb_sync/data/converter.py:19-233
  * (`is_numeric_string` / `is_datetime_string`: sample up to 1000
  * values, convert if ≥ TYPE_CONVERSION_THRESHOLD=0.9 parse), and
  * src/oracle_duckdb_sync/config/query_constants.py (thresholds).
  *
  * Spark realization: `try_cast`-style parsing is a codegen'd
  * expression; the parse-rate check is an aggregate over a bounded
  * sample (limit), so inference cost is constant regardless of table
  * size — same contract as the reference's 1000-row sample.
  */
object TypeInference {
  val DefaultThreshold = 0.9
  val DefaultSampleSize = 1000

  // try_cast (not cast): Spark 4 runs ANSI mode by default, where a
  // failed cast throws instead of yielding NULL. The reference's
  // semantics are "count how many parse" — that is exactly try_cast.

  /** Fraction of non-null sampled values of `c` that parse as DOUBLE. */
  def numericParseRate(table: DataFrame, c: String,
                       sampleSize: Int = DefaultSampleSize): Double = {
    val row = table.select(col(c)).filter(col(c).isNotNull)
      .limit(sampleSize)
      .agg(
        count(lit(1)).as("n"),
        count(expr(s"try_cast(`$c` AS DOUBLE)")).as("ok"))
      .head()
    val n = row.getLong(0)
    if (n == 0) 0.0 else row.getLong(1).toDouble / n
  }

  /** Fraction of sampled values parsing as timestamp. */
  def datetimeParseRate(table: DataFrame, c: String,
                        sampleSize: Int = DefaultSampleSize): Double = {
    val row = table.select(col(c)).filter(col(c).isNotNull)
      .limit(sampleSize)
      .agg(
        count(lit(1)).as("n"),
        count(expr(s"try_cast(`$c` AS TIMESTAMP)")).as("ok"))
      .head()
    val n = row.getLong(0)
    if (n == 0) 0.0 else row.getLong(1).toDouble / n
  }

  /** Convert the string column in place iff its parse rate clears the
    * threshold (reference convert_automatic semantics); otherwise
    * return the table unchanged.
    */
  def convertIfNumeric(table: DataFrame, c: String,
                       threshold: Double = DefaultThreshold): DataFrame =
    if (numericParseRate(table, c) >= threshold)
      table.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
    else table

  /** Datetime counterpart of [[convertIfNumeric]]. */
  def convertIfDatetime(table: DataFrame, c: String,
                        threshold: Double = DefaultThreshold): DataFrame =
    if (datetimeParseRate(table, c) >= threshold)
      table.withColumn(c, expr(s"try_cast(`$c` AS TIMESTAMP)"))
    else table

  /** The reference's convert_automatic (converter.py:150-233): for each
    * candidate string column, numeric wins if it clears the threshold,
    * else datetime, else leave as string.
    */
  def inferAndConvert(table: DataFrame, candidates: Seq[String],
                      threshold: Double = DefaultThreshold): DataFrame =
    candidates.foldLeft(table) { (t, c) =>
      if (numericParseRate(t, c) >= threshold)
        t.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
      else if (datetimeParseRate(t, c) >= threshold)
        t.withColumn(c, expr(s"try_cast(`$c` AS TIMESTAMP)"))
      else t
    }
}

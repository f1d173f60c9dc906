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

  // ---- selective conversion (user-in-the-loop) -----------------------
  // Reference: data/query.py:392 `_detect_conversion_suggestions`,
  // data/type_converter_service.py:56 `convert_selected`, and
  // data/converter.py:359-429 (`detect_convertible_columns` /
  // `convert_selected_columns`): the engine SUGGESTS per-column
  // conversions; the caller picks a subset; only the picked columns
  // convert — a rejected suggestion leaves its column untouched.

  /** Suggested target per convertible string column —
    * `col -> "numeric" | "datetime"` (numeric wins when both parse,
    * same precedence as the automatic path). Non-string columns and
    * columns clearing neither threshold are absent, exactly the
    * reference's suggestion dict. Sample-bounded: cost is constant in
    * table size.
    */
  def suggestConversions(table: DataFrame,
                         threshold: Double = DefaultThreshold,
                         sampleSize: Int = DefaultSampleSize): Map[String, String] =
    table.schema.fields
      .filter(_.dataType.typeName == "string").map(_.name)
      .flatMap { c =>
        if (numericParseRate(table, c, sampleSize) >= threshold) Some(c -> "numeric")
        else if (datetimeParseRate(table, c, sampleSize) >= threshold) Some(c -> "datetime")
        else None
      }.toMap

  /** Apply ONLY the caller-selected conversions; every unselected
    * column stays untouched even when convertible. Unknown columns and
    * unknown targets are skipped (reference logs-and-skips). By
    * default a column whose sample parses 0% is left unconverted — the
    * Spark-shaped form of the reference's "all-NaN conversion is
    * discarded" guard (converter.py:423), checked on the bounded
    * sample so the plan stays lazy. `force = true` skips that guard
    * and applies the map VERBATIM — required when a recorded schema
    * decision must reapply to a new slice regardless of what the
    * slice's values look like (the cache refresh path: an unparseable
    * tail must become a null double column, not flip back to string).
    */
  def applyConversions(table: DataFrame, selected: Map[String, String],
                       sampleSize: Int = DefaultSampleSize,
                       force: Boolean = false): DataFrame =
    selected.foldLeft(table) { case (t, (c, target)) =>
      if (!t.columns.contains(c)) t
      else target match {
        case "numeric" if force || numericParseRate(t, c, sampleSize) > 0.0 =>
          t.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
        case "datetime" if force || datetimeParseRate(t, c, sampleSize) > 0.0 =>
          t.withColumn(c, expr(s"try_cast(`$c` AS TIMESTAMP)"))
        case _ => t
      }
    }
}

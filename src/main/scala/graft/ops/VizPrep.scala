package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Visualization preparation — the reference's chart-feeding helpers
  * (reference: src/oracle_duckdb_sync/ui/visualization.py:
  * `calculate_y_axis_range` at :56 (5% padding), `_detect_numeric_
  * columns`/`_detect_datetime_columns`, `filter_dataframe_by_range`
  * at :116) as one agg pass + pure functions. The heavy lifting
  * (column detection) lives in TableStats; downsampling in Lttb.
  */
object VizPrep {
  val DefaultPaddingPercent = 0.05

  /** Padded y-axis (min, max) from one min/max aggregation pass.
    * Zero-spread series pad by |value|·percent (reference behavior:
    * a flat line still gets visual headroom); all-null yields None.
    */
  def yAxisRange(df: DataFrame, valueCol: String,
                 paddingPercent: Double = DefaultPaddingPercent): Option[(Double, Double)] = {
    // NaN-safe like the reference's np.nanmin/nanmax: Spark's min/max
    // sort NaN as the LARGEST double, so an unfiltered max would be NaN
    val v = col(valueCol).cast("double")
    val row: Row = df.filter(v.isNotNull && !isnan(v))
      .agg(min(v).as("mn"), max(v).as("mx")).head()
    if (row.isNullAt(0)) None
    else {
      val (mn, mx) = (row.getDouble(0), row.getDouble(1))
      val pad = if (mx > mn) (mx - mn) * paddingPercent
                else math.max(math.abs(mx) * paddingPercent, 1e-9)
      Some((mn - pad, mx + pad))
    }
  }

  /** Inclusive range filter (outlier removal) — pushed to the scan. */
  def filterByRange(df: DataFrame, column: String,
                    minValue: Double, maxValue: Double): DataFrame =
    df.filter(col(column).between(minValue, maxValue))

  /** Chart-feeding renames (visualization.py:22
    * `_prepare_aggregated_data_for_viz`): `<base>_avg` → `<base>`
    * (primary series) and `time_bucket` → `time`. Pure metadata — no
    * job. Mirrors the reference's overwrite-on-collision behavior,
    * except a rename that would DUPLICATE an existing column name is
    * skipped (a DataFrame with duplicate names breaks every downstream
    * select; pandas tolerates it, Catalyst does not).
    */
  def prepareAggregatedForViz(df: DataFrame): DataFrame = {
    val existing = df.columns.toSet
    val renames = df.columns.flatMap {
      case c if c.endsWith("_avg") && !existing.contains(c.stripSuffix("_avg")) =>
        Some(c -> c.stripSuffix("_avg"))
      case "time_bucket" if !existing.contains("time") =>
        Some("time_bucket" -> "time")
      case _ => None
    }
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** Schema-level numeric column detection (visualization.py:103) —
    * Catalyst types replace pandas dtype sniffing; no data pass.
    */
  def detectNumericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq

  /** Schema-level datetime column detection (visualization.py:90). */
  def detectDatetimeColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.TimestampNTZType ||
        f.dataType == org.apache.spark.sql.types.DateType => f.name
    }.toSeq
}

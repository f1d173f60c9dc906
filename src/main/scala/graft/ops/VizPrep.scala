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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table statistics — the agent's GetTableStats tool and the stats
  * panel, as single-pass aggregations.
  *
  * Reference: src/oracle_duckdb_sync/agent/tools/query_tools.py:43
  * (GetTableStatsTool), src/oracle_duckdb_sync/application/
  * query_service.py:280-310 (MIN/MAX/AVG per numeric column, with
  * TRY_CAST for varchar-typed numerics), src/oracle_duckdb_sync/
  * data/query_core.py:63 (row count).
  *
  * One job, one partial-agg shuffle of a single row of state per
  * column — O(columns), not O(rows), over the wire at any scale.
  */
object TableStats {

  /** count + min/max/avg(rounded) for each numeric column, one row. */
  def numericStats(table: DataFrame, numericCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("row_count") +:
      numericCols.flatMap { c =>
        // avg via associative decimal sum: deterministic across any
        // partitioning (see TimeBucketAgg scaladoc)
        Seq(min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"),
            (sum(col(c).cast("decimal(30,12)")).cast("double") /
              count(col(c))).as(s"${c}_avg"))
      }
    table.agg(aggs.head, aggs.tail: _*)
  }

  /** Stats over VARCHAR columns holding numerics — the reference's
    * TRY_CAST stats path (query_service.py:280-310): cast failures
    * count as NULL, min/max/avg over the parseable values.
    */
  def varcharNumericStats(table: DataFrame, varcharCols: Seq[String]): DataFrame = {
    val casted = varcharCols.foldLeft(table) { (t, c) =>
      t.withColumn(s"__$c", expr(s"try_cast(`$c` AS DOUBLE)"))
    }
    val aggs: Seq[Column] =
      count(lit(1)).as("row_count") +:
      varcharCols.flatMap { c =>
        Seq(count(col(s"__$c")).as(s"${c}_parsed"),
            min(col(s"__$c")).as(s"${c}_min"),
            max(col(s"__$c")).as(s"${c}_max"),
            round(avg(col(s"__$c")), 6).as(s"${c}_avg"))
      }
    casted.agg(aggs.head, aggs.tail: _*)
  }

  /** Numeric / datetime column detection from the schema — the
    * reference's visualization column picker (ui/visualization.py
    * numeric_columns / datetime_columns).
    */
  def numericColumns(table: DataFrame): Seq[String] =
    table.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq

  def datetimeColumns(table: DataFrame): Seq[String] =
    table.schema.fields.collect {
      case f if f.dataType.typeName.startsWith("timestamp") ||
                f.dataType.typeName == "date" => f.name
    }.toSeq

  /** Equal-width histogram of a numeric column: one min/max pass (tiny
    * driver round-trip), then one groupBy over computed bin ids — the
    * distribution view behind the stats panel. The top edge folds into
    * the last bin (`least`), matching the usual closed-right-edge rule.
    */
  def histogram(table: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val r = table.agg(min(col(c).cast("double")).as("lo"),
      max(col(c).cast("double")).as("hi")).head()
    if (r.isNullAt(0))
      return table.sparkSession.emptyDataFrame
        .select(lit(0).as("bin"), lit(0L).as("n"))
        .limit(0)
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    if (hi == lo)
      return table.filter(col(c).isNotNull)
        .agg(count(lit(1)).as("n")).select(lit(0).as("bin"), col("n"))
    val width = (hi - lo) / bins
    table.filter(col(c).isNotNull)
      .select(least(floor((col(c).cast("double") - lo) / width).cast("int"),
        lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** COUNT(*) per table of a catalog — list_tables + row counts. */
  def rowCounts(spark: SparkSession, dir: String,
                names: Seq[String]): DataFrame = {
    import graft.core.Tables
    names.map { n =>
      Tables.load(spark, dir, n)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }
}

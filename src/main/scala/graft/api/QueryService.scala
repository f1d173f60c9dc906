package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{TableStats, TimeBucketAgg, TypeInference}
import graft.sync.SyncOps

/** The reference's user-facing query surface as one facade — the API a
  * dashboard/agent calls (reference:
  * src/oracle_duckdb_sync/application/query_service.py `QueryService`,
  * src/oracle_duckdb_sync/data/query_builder.py `QueryBuilder`,
  * src/oracle_duckdb_sync/agent/tools/query_tools.py list/stats/query
  * tools). Each method returns a lazy DataFrame plan; nothing executes
  * until the caller acts, so composition stays optimizable by
  * Catalyst (unlike the reference's string-SQL round trips).
  */
class QueryService(spark: SparkSession, dir: String) {

  /** get_available_tables (query_core.py:20). */
  def listTables(): Seq[String] = Tables.all

  /** get_table_row_count (query_service.py:66). */
  def rowCount(table: String): Long = Tables.loadNormalized(spark, dir, table).count()

  /** query_table (query_service.py:98) + build_select_query
    * (query_builder.py:21): projection + deterministic limit, with
    * optional automatic type conversion of string columns
    * (converter.py's ≥90% rule). `orderBy` makes LIMIT deterministic —
    * the reference inherits DuckDB's stable scan order; a distributed
    * engine must order explicitly.
    */
  def queryTable(table: String, columns: Seq[String] = Nil,
                 limit: Int = 10000, orderBy: Seq[String] = Nil,
                 convertTypes: Boolean = false): DataFrame = {
    val base = Tables.loadNormalized(spark, dir, table)
    val projected = if (columns.nonEmpty) base.select(columns.map(col): _*) else base
    val converted =
      if (convertTypes) {
        val stringCols = projected.schema.fields
          .filter(_.dataType.typeName == "string").map(_.name).toSeq
        TypeInference.inferAndConvert(projected, stringCols)
      } else projected
    val ordered = if (orderBy.nonEmpty)
      converted.orderBy(orderBy.map(col): _*) else converted
    ordered.limit(limit)
  }

  /** build_incremental_query (query_builder.py:57): rows past the
    * watermark, time-ordered, optional limit.
    */
  def incrementalQuery(table: String, timeCol: String,
                       lastTimestamp: Option[String] = None,
                       limit: Option[Int] = None): DataFrame = {
    val base = Tables.loadNormalized(spark, dir, table)
    val filtered = lastTimestamp match {
      case Some(ts) => SyncOps.incremental(base, timeCol, ts)
      case None => base.orderBy(col(timeCol))
    }
    limit.map(filtered.limit).getOrElse(filtered)
  }

  /** query_table_aggregated (query_service.py:155): time-bucket
    * AVG/MIN/MAX/COUNT of `valueCols`.
    */
  def queryAggregated(table: String, timeCol: String, interval: String,
                      valueCols: Seq[String]): DataFrame =
    TimeBucketAgg.bucketed(Tables.loadNormalized(spark, dir, table), timeCol,
      interval, valueCols)

  /** query_table_aggregated_legacy (query_service.py:222): varchar
    * YYYYMMDDHHMMSS timestamps.
    */
  def queryAggregatedLegacy(table: String, varcharTimeCol: String,
                            interval: String, valueCols: Seq[String]): DataFrame =
    TimeBucketAgg.bucketedFromVarchar(Tables.loadNormalized(spark, dir, table),
      varcharTimeCol, interval, valueCols)

  /** GetTableStats tool (query_tools.py): single-pass stats over the
    * auto-detected numeric columns.
    */
  def tableStats(table: String): DataFrame = {
    val t = Tables.loadNormalized(spark, dir, table)
    TableStats.numericStats(t, TableStats.numericColumns(t))
  }

  /** As-of join between two catalog tables — ALWAYS the merge
    * (cogroup two-pointer) path, O(left + right) per key. The composed
    * window formulation (Analytics.asofJoin) is the oracle baseline
    * only; library callers get this.
    */
  def asofJoin(leftTable: String, rightTable: String,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightTieBreak: Seq[String] = Nil): DataFrame =
    graft.queries.AsOf.asofJoinTables(
      Tables.loadNormalized(spark, dir, leftTable),
      Tables.loadNormalized(spark, dir, rightTable),
      leftKey, rightKey, leftTime, rightTime, rightTieBreak)
}

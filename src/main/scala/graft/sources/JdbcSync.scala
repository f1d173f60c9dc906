package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC-source sync plumbing — the Spark-native form of the
  * reference's Oracle source (reference:
  * src/oracle_duckdb_sync/database/oracle_source.py — batched
  * `fetchmany` cursors, `build_incremental_query` at
  * oracle_source.py:239-240, schema introspection).
  *
  * Spark's JDBC source replaces every piece of that machinery:
  *  - batched fetch       → `fetchsize` (cursor batching per task)
  *  - cursor parallelism  → `partitionColumn`/`lowerBound`/
  *                          `upperBound`/`numPartitions` (N concurrent
  *                          range-predicated cursors — the reference is
  *                          single-cursor; this is the 1000-executor
  *                          ingest path)
  *  - incremental WHERE   → pushed predicate (Catalyst pushes the
  *                          watermark filter into the remote query)
  *  - full snapshot write → `df.write.parquet` (partitioned)
  *
  * Option-building is a pure function so the partitioning logic is
  * unit-testable without a live database.
  */
object JdbcSync {

  /** Reader options for a partitioned range-scan of `table`.
    * `partitionCol` must be numeric/date-like, indexed at the source.
    */
  def partitionedReadOptions(url: String, table: String, partitionCol: String,
                             lower: Long, upper: Long, numPartitions: Int,
                             fetchSize: Int = 10000): Map[String, String] = {
    require(numPartitions > 0 && upper >= lower,
      s"bad partition spec [$lower, $upper] x $numPartitions")
    Map(
      "url" -> url,
      "dbtable" -> table,
      "partitionColumn" -> partitionCol,
      "lowerBound" -> lower.toString,
      "upperBound" -> upper.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> fetchSize.toString)
  }

  /** Plain-identifier shape that may pass through unquoted: bare or
    * schema-qualified SQL identifiers only.
    */
  private val PlainIdent =
    "^[A-Za-z_][A-Za-z0-9_$#]*(\\.[A-Za-z_][A-Za-z0-9_$#]*)?$".r

  /** Defensive identifier quoting: plain (optionally schema-qualified)
    * identifiers pass through; anything else is double-quoted per
    * dot-part with embedded quotes doubled, so a hostile value can
    * never escape into SQL. Control characters are rejected outright.
    */
  private[sources] def safeIdent(id: String): String = {
    require(id.nonEmpty && !id.exists(_ < ' '),
      s"invalid SQL identifier: ${id.take(40)}")
    id match {
      case PlainIdent(_) => id
      case _ => id.split('.')
        .map(part => "\"" + part.replace("\"", "\"\"") + "\"")
        .mkString(".")
    }
  }

  /** The reference's incremental pull (`WHERE col > last ORDER BY col`)
    * as a pushed-down subquery — the remote engine sees only the tail.
    * `table`/`timeCol` are quoted defensively; `lastValue` is
    * escaped as a string literal.
    */
  def incrementalQuery(table: String, timeCol: String, lastValue: String): String = {
    val esc = lastValue.replace("'", "''")
    s"(SELECT * FROM ${safeIdent(table)} WHERE ${safeIdent(timeCol)} > '$esc') sync_src"
  }

  /** Partitioned JDBC read. The caller appends `.filter(...)` freely:
    * Spark pushes eligible predicates into the remote WHERE clause.
    */
  def read(spark: SparkSession, opts: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(opts).load()

  /** Snapshot sink: write a synced table as (optionally partitioned)
    * parquet — the engine-side replacement for DuckDB INSERT.
    */
  def writeSnapshot(df: DataFrame, outDir: String,
                    partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(outDir)
  }
}

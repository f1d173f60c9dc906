package graft.sync

import org.apache.spark.sql.types._

/** Source-RDBMS type → engine (Catalyst) type mapping.
  *
  * Reference: src/oracle_duckdb_sync/database/sync_engine.py:20
  * (`map_oracle_type`) — NUMBER→DOUBLE, *CHAR*→VARCHAR, DATE and
  * TIMESTAMP→TIMESTAMP, default VARCHAR. Same precedence order kept:
  * NUMBER before CHAR (so "NUMBER" wins over a hypothetical
  * "NUMBERCHAR"), DATE before TIMESTAMP.
  */
object TypeMapper {

  /** Engine type name for a source type string (case-insensitive). */
  def mapSourceType(sourceType: String): String = {
    val t = sourceType.toUpperCase
    if (t.contains("NUMBER")) "DOUBLE"
    else if (t.contains("VARCHAR") || t.contains("CHAR")) "STRING"
    else if (t.contains("DATE")) "TIMESTAMP"
    else if (t.contains("TIMESTAMP")) "TIMESTAMP"
    else "STRING"
  }

  /** Catalyst DataType for a source type string. */
  def toCatalyst(sourceType: String): DataType = mapSourceType(sourceType) match {
    case "DOUBLE"    => DoubleType
    case "TIMESTAMP" => TimestampType
    case _           => StringType
  }
}

package graft.sync

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Per-table sync configuration — which tables sync, how.
  *
  * Reference: src/oracle_duckdb_sync/table_config/models.py
  * (`TableConfig` with schema/table/target/pk/time-column/enabled/
  * batch-size + `validate`) and table_config/service.py (create/
  * update/delete/toggle/get_sync_targets). The reference keeps these
  * rows in a DuckDB table; here they are small JSON documents on the
  * Hadoop filesystem (one per target table, atomic rename), the same
  * pattern as StateStore — no database dependency, works on object
  * stores, readable by every executor.
  */
case class TableConfig(
    sourceSchema: String,
    sourceTable: String,
    targetTable: String,
    primaryKey: String,
    timeColumn: Option[String] = None,
    syncEnabled: Boolean = true,
    batchSize: Int = 10000,
    description: Option[String] = None) {

  /** schema.table, the reference's get_oracle_full_name. */
  def sourceFullName: String = s"$sourceSchema.$sourceTable"

  def hasTimeColumn: Boolean = timeColumn.exists(_.nonEmpty)

  /** Mirrors table_config/models.py `validate`: required identifiers
    * present, batch size in (0, 100000].
    */
  def validate: Either[String, TableConfig] =
    if (sourceSchema.isEmpty) Left("source schema is required")
    else if (sourceTable.isEmpty) Left("source table is required")
    else if (targetTable.isEmpty) Left("target table is required")
    else if (primaryKey.isEmpty) Left("primary key is required")
    else if (batchSize <= 0) Left("batch size must be positive")
    else if (batchSize > 100000) Left("batch size must be <= 100000")
    else Right(this)
}

object TableConfig {
  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")

  private[sync] def toJson(c: TableConfig): String = {
    val tc = c.timeColumn.map(v => s""""${esc(v)}"""").getOrElse("null")
    val desc = c.description.map(v => s""""${esc(v)}"""").getOrElse("null")
    s"""{"source_schema": "${esc(c.sourceSchema)}", """ +
      s""""source_table": "${esc(c.sourceTable)}", """ +
      s""""target_table": "${esc(c.targetTable)}", """ +
      s""""primary_key": "${esc(c.primaryKey)}", """ +
      s""""time_column": $tc, "sync_enabled": ${c.syncEnabled}, """ +
      s""""batch_size": ${c.batchSize}, "description": $desc}"""
  }

  private def str(json: String, name: String): Option[String] =
    (s""""$name":\\s*(?:null|"((?:[^"\\\\]|\\\\.)*)")""").r
      .findFirstMatchIn(json).flatMap(m => Option(m.group(1))).map(unesc)

  private[sync] def fromJson(json: String): Option[TableConfig] =
    for {
      ss <- str(json, "source_schema")
      st <- str(json, "source_table")
      tt <- str(json, "target_table")
      pk <- str(json, "primary_key")
    } yield TableConfig(ss, st, tt, pk,
      timeColumn = str(json, "time_column").filter(_.nonEmpty),
      syncEnabled = """"sync_enabled":\s*(true|false)""".r
        .findFirstMatchIn(json).forall(_.group(1) == "true"),
      batchSize = """"batch_size":\s*(\d+)""".r
        .findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(10000),
      description = str(json, "description"))
}

/** CRUD over the config directory (table_config/repository+service).
  * Keyed by target table — one sync destination, one config.
  */
class TableConfigRepo(spark: SparkSession, dir: String) {

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def path(target: String) = new Path(dir, s"$target.config.json")

  /** Create or replace a config; rejects invalid ones
    * (service.create_table_config / update_table_config).
    */
  def upsert(cfg: TableConfig): Either[String, TableConfig] =
    cfg.validate.map { c =>
      val p = path(c.targetTable)
      val tmp = new Path(dir, s".${c.targetTable}.config.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(TableConfig.toJson(c).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.exists(p)) fs.delete(p, false)
      fs.rename(tmp, p)
      c
    }

  def get(targetTable: String): Option[TableConfig] = {
    val p = path(targetTable)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, StandardCharsets.UTF_8)
      } finally in.close()
      TableConfig.fromJson(body)
    }
  }

  def all(enabledOnly: Boolean = false): Seq[TableConfig] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".config.json") && !n.startsWith("."))
      .flatMap(n => get(n.stripSuffix(".config.json")))
      .filter(c => !enabledOnly || c.syncEnabled)
      .sortBy(_.targetTable)
  }

  /** Enabled configs — what a sync cycle runs (get_sync_targets). */
  def syncTargets: Seq[TableConfig] = all(enabledOnly = true)

  /** Flip sync on/off without touching the rest (toggle_sync). */
  def toggleSync(targetTable: String, enabled: Boolean): Boolean =
    get(targetTable) match {
      case Some(c) => upsert(c.copy(syncEnabled = enabled)).isRight
      case None => false
    }

  def delete(targetTable: String): Boolean = {
    val p = path(targetTable)
    fs.exists(p) && fs.delete(p, false)
  }
}

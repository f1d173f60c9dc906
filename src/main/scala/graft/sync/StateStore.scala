package graft.sync

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Watermark / checkpoint state for batch incremental sync.
  *
  * Reference: src/oracle_duckdb_sync/database/sync_engine.py:568-760
  * (save_state / load_state / create_state_checkpoint / rollback /
  * partial progress) — a JSON state file keyed by table.
  *
  * Implemented over the Hadoop FileSystem API so the same code works
  * on local FS, HDFS, or an object store; writes go through a temp
  * file + atomic rename (the cluster-safe equivalent of the
  * reference's overwrite).
  */
class StateStore(spark: SparkSession, storePath: String) {

  private def fs: FileSystem =
    new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def path(table: String) = new Path(storePath, s"$table.state.json")

  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** Save the last-synced watermark value for a table. */
  def saveWatermark(table: String, value: String): Unit = {
    val p = path(table)
    val tmp = new Path(storePath, s".${table}.state.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"table": "${esc(table)}", "last_value": "${esc(value)}"}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Load the last-synced watermark, or None on first sync. */
  def loadWatermark(table: String): Option[String] = {
    val p = path(table)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, StandardCharsets.UTF_8)
      } finally in.close()
      """"last_value":\s*"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(body)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    }
  }

  // ---- schema mapping versions (sync_engine.py:589 save_schema_mapping /
  // load_schema_mapping): one file per (table, version) + a latest
  // pointer, so schema drift across syncs is detectable and reversible.

  private def schemaPath(table: String, version: String) =
    new Path(storePath, s"$table.schema.$version.json")
  private def latestPath(table: String) =
    new Path(storePath, s"$table.schema.LATEST")

  private def writeFile(p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  private def readFile(p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }

  /** Save a table's schema (e.g. `df.schema.json`) under a version and
    * move the latest pointer.
    */
  def saveSchema(table: String, schemaJson: String, version: String): Unit = {
    writeFile(schemaPath(table, version), schemaJson)
    writeFile(latestPath(table), version)
  }

  /** Load a schema by version (default: latest). */
  def loadSchema(table: String, version: Option[String] = None): Option[String] =
    version.orElse(readFile(latestPath(table)))
      .flatMap(v => readFile(schemaPath(table, v)))

  /** All saved versions for a table, sorted. */
  def schemaVersions(table: String): Seq[String] = {
    val dir = new Path(storePath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(s"$table.schema.") && n.endsWith(".json"))
      .map(_.stripPrefix(s"$table.schema.").stripSuffix(".json"))
      .sorted
  }

  /** True iff `schemaJson` differs from the latest saved version —
    * the sync engine's drift check before an incremental run.
    */
  def schemaChanged(table: String, schemaJson: String): Boolean =
    !loadSchema(table).contains(schemaJson)

  // ---- partial-progress records (sync_engine.py:709-760
  // save_partial_progress / load_partial_progress /
  // clear_partial_progress): a long full sync persists how far it got
  // so an interrupted run resumes mid-table instead of restarting.

  private def progressPath(table: String) =
    new Path(storePath, s"$table.progress.json")

  /** Record how far a running full sync has advanced: rows completed
    * and the last id covered by a finished slice.
    */
  def savePartialProgress(table: String, rowsProcessed: Long,
                          lastRowId: Long): Unit =
    writeFile(progressPath(table),
      s"""{"table": "${esc(table)}", "rows_processed": $rowsProcessed, """ +
        s""""last_row_id": $lastRowId}""")

  /** (rowsProcessed, lastRowId) of an interrupted sync, or None. */
  def loadPartialProgress(table: String): Option[(Long, Long)] = {
    val rp = """"rows_processed":\s*(-?\d+)""".r
    val lr = """"last_row_id":\s*(-?\d+)""".r
    readFile(progressPath(table)).flatMap { body =>
      for {
        r <- rp.findFirstMatchIn(body).map(_.group(1).toLong)
        l <- lr.findFirstMatchIn(body).map(_.group(1).toLong)
      } yield (r, l)
    }
  }

  /** Drop the progress record after a sync completes. */
  def clearPartialProgress(table: String): Unit = {
    val p = progressPath(table)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** Snapshot all table states (the reference's checkpoint). */
  def checkpoint(): Map[String, String] = {
    val dir = new Path(storePath)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".state.json"))
      .map(_.stripSuffix(".state.json"))
      .flatMap(t => loadWatermark(t).map(t -> _))
      .toMap
  }

  /** Restore a previously taken checkpoint (the reference's rollback). */
  def rollback(state: Map[String, String]): Unit =
    state.foreach { case (t, v) => saveWatermark(t, v) }
}

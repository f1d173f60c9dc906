package graft.sync

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-process sync mutex: a lease file with owner, pid, and a
  * heartbeat, so two sync drivers pointed at the same state/target
  * directory cannot interleave a parquet overwrite with a watermark
  * advance.
  *
  * Reference: src/oracle_duckdb_sync/state/sync_state.py:30-40 — a
  * PID-stamped lock file with a timeout and stale-lock detection.
  *
  * Shape: `storePath/_sync.lease.json` holding
  * `{"owner": ..., "pid": ..., "acquired_ms": ..., "heartbeat_ms": ...}`.
  *  - acquire: `fs.create(overwrite = false)` — one creator wins; a
  *    live foreign lease (heartbeat younger than `staleMillis`) loses.
  *  - stale takeover: a heartbeat older than `staleMillis` marks a
  *    crashed holder; the taker deletes that SPECIFIC lease content and
  *    re-creates. The delete-then-create window is narrow and create is
  *    exclusive, so two takers cannot both think they won — the loser's
  *    create throws.
  *  - renew: the holder refreshes `heartbeat_ms` between long steps
  *    (e.g. per table in a syncAll pass).
  *  - release: delete — only by the current owner.
  *
  * On an object store without atomic exclusive-create the same layout
  * works with a conditional PUT (if-none-match); the Hadoop local/HDFS
  * semantics used here are the test and on-prem path.
  */
class SyncLease(spark: SparkSession, storePath: String, val owner: String,
                staleMillis: Long = 60000L,
                nowMillis: () => Long = () => System.currentTimeMillis()) {

  require(staleMillis > 0, s"staleMillis must be positive: $staleMillis")

  private def fs: FileSystem =
    new Path(storePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def leasePath = new Path(storePath, "_sync.lease.json")

  private def pid: Long = ProcessHandle.current().pid()

  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def writeLease(acquiredMs: Long): Unit = {
    // exclusive create: overwrite = false throws if the file appeared
    // between our check and now — the loser of a takeover race fails here
    val out = fs.create(leasePath, false)
    try out.write(
      (s"""{"owner": "${esc(owner)}", "pid": $pid, """ +
        s""""acquired_ms": $acquiredMs, "heartbeat_ms": ${nowMillis()}}""")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** (owner, pid, heartbeatMs) of the current lease file, if any. */
  def holder: Option[(String, Long, Long)] =
    if (!fs.exists(leasePath)) None
    else {
      val in = fs.open(leasePath)
      val body = try {
        val bytes = new Array[Byte](fs.getFileStatus(leasePath).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, StandardCharsets.UTF_8)
      } finally in.close()
      for {
        o <- """"owner":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        p <- """"pid":\s*(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
        h <- """"heartbeat_ms":\s*(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
      } yield (o, p, h)
    }

  /** True iff this owner holds the lease after the call. Re-acquiring
    * a lease we already hold renews it (idempotent).
    */
  def tryAcquire(): Boolean = {
    val now = nowMillis()
    holder match {
      case None =>
        try { writeLease(now); true }
        catch { case _: java.io.IOException => false } // lost the create race
      case Some((o, _, _)) if o == owner =>
        renew(); true
      case Some((_, _, heartbeat)) if now - heartbeat > staleMillis =>
        // stale: the holder stopped heartbeating (crashed / wedged).
        // Take over via delete + exclusive create; a concurrent taker's
        // create throws and it correctly reports failure.
        fs.delete(leasePath, false)
        try { writeLease(now); true }
        catch { case _: java.io.IOException => false }
      case _ => false // live foreign lease
    }
  }

  /** Refresh the heartbeat — call between long steps while holding. */
  def renew(): Unit =
    holder.foreach { case (o, _, _) =>
      if (o == owner) {
        // rewrite via temp + rename: readers never see a torn lease
        val tmp = new Path(storePath, "._sync.lease.json.tmp")
        val out = fs.create(tmp, true)
        try out.write(
          (s"""{"owner": "${esc(owner)}", "pid": $pid, """ +
            s""""acquired_ms": ${nowMillis()}, "heartbeat_ms": ${nowMillis()}}""")
            .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        if (fs.exists(leasePath)) fs.delete(leasePath, false)
        fs.rename(tmp, leasePath)
      }
    }

  /** Release if (and only if) held by this owner. */
  def release(): Unit =
    holder.foreach { case (o, _, _) =>
      if (o == owner) fs.delete(leasePath, false)
    }
}

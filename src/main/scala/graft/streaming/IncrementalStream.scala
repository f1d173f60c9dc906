package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's scheduler loop (scheduler/sync_worker.py: poll →
  * incremental_sync → sleep) re-expressed as Structured Streaming:
  * the file source discovers new files, the watermark replaces the
  * manual last_value state, and checkpointing replaces the state
  * file (sync_engine.py:568 save_state/load_state).
  *
  * At scale: the file-source maxFilesPerTrigger bounds batch size
  * (the reference's batch_size), state lives in the checkpoint (HDFS/
  * object store), and the windowed aggregation state is distributed
  * across executors — no driver-held watermark.
  */
object IncrementalStream {

  /** Streaming incremental read of an events directory. */
  def readEvents(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Windowed per-type aggregation with a watermark — the streaming
    * equivalent of TimeBucketAgg.bucketed for the dashboard.
    */
  def bucketedCounts(events: DataFrame, timeCol: String,
                     interval: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), interval), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(avg(col("value")), 6).as("value_avg"))
      .select(col("window.start").as("bucket_ts"), col("event_type"),
        col("n_events"), col("value_avg"))

  /** Streaming keep-latest per key (the upsert side of incremental
    * sync) via dropDuplicates within the watermark.
    */
  def latestPerKey(events: DataFrame, timeCol: String, keyCol: String,
                   watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(keyCol))

  /** Per-key sync watermark as CUSTOM distributed state
    * (mapGroupsWithState): for every key, track the max event time and
    * how many rows arrived past the previous watermark — the
    * reference's driver-held `last_value` (sync_engine.py:568) sharded
    * across executors, checkpoint-backed, no driver bottleneck.
    * Emits one (key, watermark, new_rows, total_rows) row per key per
    * micro-batch.
    */
  case class KeyWatermark(key: Long, watermark: Timestamp,
                          new_rows: Long, total_rows: Long)

  def watermarkPerKey(events: DataFrame, keyCol: String,
                      timeCol: String): Dataset[KeyWatermark] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col(keyCol).cast("long").as("k"), col(timeCol).as("t"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Timestamp, Long), KeyWatermark](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Timestamp, Long)]) =>
          val batch = rows.toSeq
          val (prevWm, prevTotal) = state.getOption.getOrElse(
            (new Timestamp(Long.MinValue), 0L))
          val fresh = batch.filter(_._2.after(prevWm))
          val newWm = (prevWm +: batch.map(_._2)).maxBy(_.getTime)
          val total = prevTotal + fresh.size
          state.update((newWm, total))
          KeyWatermark(key, newWm, fresh.size.toLong, total)
      }
  }

  case class SessionOut(key: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)
  /** Open-session state (public: the state encoder codegen needs a
    * visible constructor).
    */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  private def usToTs(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Streaming sessionization with CUSTOM state
    * (flatMapGroupsWithState + event-time timeout): events within
    * `gapMinutes` of the open session extend it; a larger gap closes
    * and emits it; the timeout flushes a session once the watermark
    * passes its close point. This is the streaming form of the batch
    * `Analytics.sessionize` — same gap rule (strictly-greater starts a
    * new session), state sharded per key across executors.
    *
    * Late events beyond the watermark are dropped by the watermark
    * itself; in-batch disorder is handled by sorting each micro-batch.
    */
  def sessionizeStream(events: DataFrame, keyCol: String, timeCol: String,
                       gapMinutes: Int, watermark: String): Dataset[SessionOut] = {
    val sp = events.sparkSession
    import sp.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark(timeCol, watermark)
      // the watermarked timestamp column must survive projection for
      // the event-time timeout to resolve
      .select(col(keyCol).cast("long").as("k"), col(timeCol).as("t"),
        unix_micros(col(timeCol)).as("us"))
      .as[(Long, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq
              .map(s => SessionOut(key, usToTs(s.startUs), usToTs(s.lastUs), s.n))
            state.remove()
            out.iterator
          } else {
            val batch = rows.map(_._3).toArray.sorted
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            batch.foreach { t =>
              open match {
                case null => open = OpenSession(t, t, 1)
                case o if t - o.lastUs <= gapUs =>
                  open = o.copy(lastUs = math.max(o.lastUs, t), n = o.n + 1)
                case o =>
                  closed += SessionOut(key, usToTs(o.startUs), usToTs(o.lastUs), o.n)
                  open = OpenSession(t, t, 1)
              }
            }
            if (open != null) {
              state.update(open)
              // flush once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1000L,
                open.lastUs / 1000L + gapMinutes * 60L * 1000L))
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream interval join: each left row joined to right rows
    * of the same key within `[ts - interval, ts]`. Both sides carry
    * watermarks so the join state is bounded and expired by event
    * time — the streaming form of the as-of/enrichment join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   interval: String, watermark: String): DataFrame =
    left.withWatermark(leftTime, watermark)
      .join(right.withWatermark(rightTime, watermark),
        expr(s"$leftKey = $rightKey AND " +
          s"$rightTime BETWEEN $leftTime - INTERVAL $interval AND $leftTime"))

  /** Streaming upsert sink (foreachBatch): every micro-batch merges
    * into a parquet target keeping the latest row per key — the
    * reference's INSERT OR REPLACE loop (duckdb_source.py:74) as a
    * streaming sink. `localCheckpoint` materializes the merge before
    * the overwrite so the target can be read and rewritten in one
    * batch; a production deployment writes a fresh snapshot directory
    * per batch and swaps a pointer (or uses a table format's atomic
    * commit) instead.
    */
  def sinkUpsert(df: DataFrame, targetDir: String, checkpointDir: String,
                 keys: Seq[String], timeCol: String,
                 tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val existing =
          try Some(sp.read.parquet(targetDir))
          catch { case _: Throwable => None }
        val merged = existing match {
          case Some(t) => graft.sync.SyncOps
            .applyIncremental(t, batch.select(t.columns.map(col): _*),
              keys, timeCol, tieBreak)
          case None => graft.sync.SyncOps
            .upsertKeepLatest(batch, keys, timeCol, tieBreak)
        }
        merged.localCheckpoint(eager = true)
          .write.mode("overwrite").parquet(targetDir)
      }

  /** Streaming CACHED-AGGREGATE sink: every micro-batch aggregates its
    * rows into mergeable bucket state (count / decimal sum / min /
    * max) and merges it into the parquet-backed state — the streaming
    * form of CachedAggService's refresh, and the full replacement for
    * the reference's "scheduler re-aggregates the dashboard query"
    * loop. Because the state algebra is associative and the sums run
    * through DECIMAL, the maintained state is bit-identical to
    * aggregating all batches at once (same argument as
    * IncrementalAgg) regardless of how the stream was micro-batched.
    * Exactly-once per batch id is the streaming checkpoint's job; the
    * overwrite is atomic per the same localCheckpoint note as
    * [[sinkUpsert]].
    */
  def sinkAggState(df: DataFrame, stateDir: String, checkpointDir: String,
                   timeCol: String, interval: String,
                   valueCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val fresh = graft.ops.IncrementalAgg
          .bucketState(batch, timeCol, interval, valueCol)
        val merged =
          (try Some(sp.read.parquet(stateDir))
           catch { case _: Throwable => None }) match {
            case Some(prev) => graft.ops.IncrementalAgg.mergeStates(prev, fresh)
            case None => fresh
          }
        merged.localCheckpoint(eager = true)
          .write.mode("overwrite").parquet(stateDir)
      }

  /** Write an incremental stream to a parquet sink with checkpointed
    * state — the full sync-pipeline shape.
    */
  def sinkParquet(df: DataFrame, outDir: String,
                  checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
}

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

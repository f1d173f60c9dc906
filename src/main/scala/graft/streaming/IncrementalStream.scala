package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
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

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

  /** One upsert micro-batch against the snapshot-store target —
    * exposed so the replay/crash semantics are directly testable.
    * Keep-latest-per-key is idempotent, so a replayed batch would be
    * harmless anyway; the batch-id skip still avoids the wasted merge
    * job, and the [[SnapshotStore]] commit makes the target rewrite
    * atomic (no window where concurrent readers see no data).
    */
  def mergeUpsertBatch(batch: DataFrame, batchId: Long, targetDir: String,
                       keys: Seq[String], timeCol: String,
                       tieBreak: String): Unit = {
    val store = new SnapshotStore(batch.sparkSession, targetDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay
    val merged = store.read() match {
      case Some(t) => graft.sync.SyncOps
        .applyIncremental(t, batch.select(t.columns.map(col): _*),
          keys, timeCol, tieBreak)
      case None => graft.sync.SyncOps
        .upsertKeepLatest(batch, keys, timeCol, tieBreak)
    }
    store.commit(merged, batchId)
  }

  /** Streaming upsert sink (foreachBatch): every micro-batch merges
    * into a parquet target keeping the latest row per key — the
    * reference's INSERT OR REPLACE loop (duckdb_source.py:74) as a
    * streaming sink. The target is a [[SnapshotStore]]: fresh snapshot
    * directory per batch + atomic pointer swap, read back with
    * [[readUpsertTarget]].
    */
  def sinkUpsert(df: DataFrame, targetDir: String, checkpointDir: String,
                 keys: Seq[String], timeCol: String,
                 tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeUpsertBatch(batch, batchId, targetDir, keys, timeCol, tieBreak)
      }

  /** The committed upsert target (None until the first batch commits). */
  def readUpsertTarget(spark: SparkSession, targetDir: String): Option[DataFrame] =
    new SnapshotStore(spark, targetDir).read()

  /** One SCD2 history micro-batch merge — the streaming form of
    * [[graft.sync.SyncOps.scd2Delta]], exposed for replay testing.
    * An SCD2 merge is NOT idempotent (re-merging a batch would
    * violate the strictly-later contract against its own effects), so
    * the batch-id skip is load-bearing, not an optimization: replay
    * of a committed batch is a no-op, and `scd2Delta`'s delta ==
    * one-shot property makes the maintained history row-identical to
    * running [[graft.sync.SyncOps.scd2]] over everything at once, for
    * any micro-batching.
    */
  def mergeScd2Batch(batch: DataFrame, batchId: Long, historyDir: String,
                     keys: Seq[String], attrCols: Seq[String],
                     timeCol: String, tieBreak: String): Unit = {
    val store = new SnapshotStore(batch.sparkSession, historyDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay
    val merged = store.read() match {
      case Some(h) => graft.sync.SyncOps
        .scd2Delta(h, batch, keys, attrCols, timeCol, tieBreak)
      case None => graft.sync.SyncOps
        .scd2(batch, keys, attrCols, timeCol, tieBreak)
    }
    store.commit(merged, batchId)
  }

  /** Streaming SCD2 sink (foreachBatch): the dimension-history twin
    * of [[sinkUpsert]] — instead of overwriting each key's row, every
    * change opens/extends validity intervals. Read back with
    * [[readUpsertTarget]] over `historyDir`. Caller contract
    * (inherited from scd2Delta): batches arrive in event-time order
    * per key — true of a real change feed; a file-backed test source
    * must write its waves time-sliced.
    */
  def sinkScd2(df: DataFrame, historyDir: String, checkpointDir: String,
               keys: Seq[String], attrCols: Seq[String], timeCol: String,
               tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeScd2Batch(batch, batchId, historyDir, keys, attrCols,
          timeCol, tieBreak)
      }

  /** One CDC-changelog micro-batch merge — the streaming form of
    * [[graft.sync.SyncOps.applyChangeLog]], exposed for replay
    * testing. The standing snapshot's layout is the batch minus the
    * op column (the order column stays — it is the row's version);
    * the first committed batch freezes it. The batch-id skip makes a
    * replayed committed batch a no-op (the sinkScd2 contract), and
    * applyChangeLog's last-wins algebra makes the maintained snapshot
    * row-identical to one applyChangeLog over the concatenated log —
    * for any micro-batching, provided batches arrive in (orderCol,
    * tieBreak) order per key (true of a real change feed; Debezium
    * partitions by key precisely to guarantee it).
    */
  def mergeCdcBatch(batch: DataFrame, batchId: Long, targetDir: String,
                    keys: Seq[String], opCol: String, orderCol: String,
                    tieBreak: String): Unit = {
    val store = new SnapshotStore(batch.sparkSession, targetDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay
    val target = store.read().getOrElse(batch.drop(opCol).limit(0))
    val merged = graft.sync.SyncOps.applyChangeLog(
      target, batch, keys, opCol, orderCol, tieBreak)
    store.commit(merged, batchId)
  }

  /** Streaming CDC sink (foreachBatch): every micro-batch of
    * insert/update/delete envelopes merges into a parquet snapshot —
    * the Debezium-stream story the reference's incremental sync
    * gestures at (reference: oracle_source.py:239 incremental
    * fetch), closed as a streaming sink: per key the LAST envelope
    * wins, a final delete removes the key, untouched keys pass
    * through. The target is a [[SnapshotStore]] (fresh snapshot dir
    * per batch + atomic pointer swap); read back with
    * [[readUpsertTarget]] over `targetDir`.
    */
  def sinkCdc(df: DataFrame, targetDir: String, checkpointDir: String,
              keys: Seq[String], opCol: String, orderCol: String,
              tieBreak: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCdcBatch(batch, batchId, targetDir, keys, opCol, orderCol,
          tieBreak)
      }

  /** One aggregate-state micro-batch merge — exposed for direct replay
    * testing. foreachBatch is at-least-once and a state MERGE is NOT
    * idempotent: after a failure between the state write and the
    * streaming checkpoint commit, the replayed batch would be merged a
    * second time and permanently double-count sums/counts. The
    * [[SnapshotStore]] records the last committed batch id with the
    * state, so a replayed `batchId <= lastCommitted` is skipped — the
    * sink is effectively-once end to end.
    */
  def mergeAggBatch(batch: DataFrame, batchId: Long, stateDir: String,
                    timeCol: String, interval: String,
                    valueCol: String): Unit = {
    val store = new SnapshotStore(batch.sparkSession, stateDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay: already merged
    val fresh = graft.ops.IncrementalAgg
      .bucketState(batch, timeCol, interval, valueCol)
    val merged = store.read() match {
      case Some(prev) => graft.ops.IncrementalAgg.mergeStates(prev, fresh)
      case None => fresh
    }
    store.commit(merged, batchId)
  }

  /** Streaming CACHED-AGGREGATE sink: every micro-batch aggregates its
    * rows into mergeable bucket state (count / decimal sum / min /
    * max) and merges it into the snapshot-store-backed state — the
    * streaming form of CachedAggService's refresh, and the full
    * replacement for the reference's "scheduler re-aggregates the
    * dashboard query" loop. Because the state algebra is associative
    * and the sums run through DECIMAL, the maintained state is
    * bit-identical to aggregating all batches at once (same argument
    * as IncrementalAgg) regardless of how the stream was
    * micro-batched; the batch-id skip in [[mergeAggBatch]] extends
    * that to at-least-once replays, and the snapshot commit makes
    * every state transition atomic. Read back with [[readAggState]].
    */
  def sinkAggState(df: DataFrame, stateDir: String, checkpointDir: String,
                   timeCol: String, interval: String,
                   valueCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeAggBatch(batch, batchId, stateDir, timeCol, interval, valueCol)
      }

  /** The committed aggregate state (None until the first batch commits). */
  def readAggState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    new SnapshotStore(spark, stateDir).read()

  /** One exact-dedup micro-batch against an APPEND-ONLY seen-hash
    * store — streaming ingest dedup with an UNBOUNDED horizon: every
    * arriving doc whose content hash was seen in ANY earlier batch
    * drops; within a batch the min-id occurrence wins. (Contrast
    * `dropDuplicatesWithinWatermark`, whose dedup horizon is bounded
    * by the watermark — corpus ingest needs "never ingest this text
    * again", which is store-backed state, not stream state.)
    *
    * Store layout is per-batch partition dirs (`batch=<id>`), so a
    * batch commit APPENDS O(batch) hash rows — never a rewrite of the
    * O(history) store (the SnapshotStore pattern would rewrite the
    * whole seen set every batch). Idempotent under foreachBatch's
    * at-least-once replay: both writes target the replayed batch's own
    * partition dir with overwrite, and the seen-set read EXCLUDES the
    * current batch id — a replay after a complete-but-uncommitted
    * batch recomputes the same survivors instead of seeing its own
    * hashes and emitting an empty (data-losing) overwrite.
    *
    * 100 TB accounting: per batch, the BATCH side builds the bloom
    * (two O(batch) jobs over the persisted batch dedup) and the
    * history store gets exactly ONE column-pruned scan (16-byte
    * hashes only), filtered by that bloom before the join — so the
    * join's build side is `true-dups + fpp·history` rows, never the
    * store. No sizing count runs against the store. At very deep
    * history, prefix-bucket the store dirs and prune scans by the
    * batch's hash prefixes.
    *
    * Maintenance: the per-batch partition dirs accumulate — run
    * [[StoreMaintenance.compactStore]] periodically to consolidate
    * committed batches (store answers are row-identical before and
    * after), and [[StoreMaintenance.dropBatchesBelow]] to bound the
    * dedup horizon deliberately.
    */
  def dedupBatch(batch: DataFrame, batchId: Long, storeDir: String,
                 outDir: String, textCol: String = "text",
                 idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    val hashed = batch.withColumn("__h", md5(col(textCol).cast("binary")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol).asc)
    val firsts = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    firsts.persist()
    try {
      val nBatch = firsts.count()
      // an empty batch must not write: a part-file-less partition dir
      // would poison later schema inference on the store/output roots
      if (nBatch == 0) return
      val survivors =
        if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir))) firsts
        else {
          val seen = spark.read.parquet(storeDir)
            .filter(col("batch") =!= batchId) // replay: own hashes are not "seen"
            .select("__h")
          // batch-side bloom prunes the history scan: store hashes that
          // can't be in this batch (the vast majority) never reach the
          // join; within-batch hashes are distinct, so nBatch sizes the
          // bloom exactly
          val might = graft.ops.BloomPrune.bloomMight(
            firsts, "__h", col("__h"), expectedKeys = Some(nBatch))
          firsts.join(seen.filter(might), Seq("__h"), "left_anti")
        }
      survivors.persist()
      try {
        if (survivors.count() > 0) {
          survivors.drop("__h").write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
          survivors.select("__h").write.mode("overwrite")
            .parquet(s"$storeDir/batch=$batchId")
        }
      } finally survivors.unpersist(blocking = true)
    } finally firsts.unpersist(blocking = true)
  }

  /** Streaming exact-dedup sink (foreachBatch over [[dedupBatch]]).
    * Read the deduped corpus back with [[readDeduped]].
    *
    * `compactEvery = n` folds the store's committed batch dirs into a
    * consolidated partition after every n-th batch
    * ([[StoreMaintenance.compactStore]] — answer-preserving, and safe
    * under replay: the just-written batch id is the store's max, which
    * compaction always retains individually).
    */
  def sinkDedup(df: DataFrame, storeDir: String, outDir: String,
                checkpointDir: String, textCol: String = "text",
                idCol: String = "doc_id",
                compactEvery: Int = 0): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, batchId, storeDir, outDir, textCol, idCol)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          StoreMaintenance.compactStore(batch.sparkSession, storeDir): Unit
      }

  /** The deduped corpus across all committed batches (None before the
    * first commit). The `batch` partition column records arrival.
    */
  def readDeduped(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(outDir)) else None
  }

  /** Streaming NEAR-dup ingest: per micro-batch, detect every
    * verified MinHash near-dup pair with at least one side in the
    * batch, against an append-only signature index — the streaming
    * form of [[graft.dedup.Dedup.minhashNearDupsDelta]], completing
    * the ingest-dedup story next to [[dedupBatch]] (exact).
    *
    * 100 TB accounting per batch (delegated to the delta path): only
    * the BATCH is shingled/hashed; the stored index is scanned, its
    * bucket keys re-derived by a narrow map, and the batch's buckets
    * broadcast against it — the index is never shuffled and old text
    * is never re-read. Commit = one O(batch) index append + the
    * batch's pair rows; never an O(history) rewrite.
    *
    * Replay-idempotent like [[dedupBatch]]: the index read excludes
    * the replayed batch's own partition, so a complete-but-uncommitted
    * batch recomputes the same pairs instead of pairing against its
    * own leftover signatures.
    *
    * Maintenance: [[StoreMaintenance.compactStore]] over `indexDir`
    * (and `pairsDir`) consolidates the per-batch dirs;
    * [[StoreMaintenance.dropBatchesBelow]] bounds the near-dup horizon.
    */
  def nearDupBatch(batch: DataFrame, batchId: Long, indexDir: String,
                   pairsDir: String, k: Int = 3, numPerm: Int = 32,
                   bands: Int = 8, threshold: Double = 0.8,
                   textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return // a part-file-less dir poisons later reads
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index =
      if (!fs.exists(idxPath))
        // empty index with the exact stored shape (id, hs, sig)
        graft.dedup.Dedup.minhashIndex(batch.limit(0), k, numPerm, textCol, idCol)
      else spark.read.parquet(indexDir)
        .filter(col("batch") =!= batchId) // replay: own signatures are not history
        .select(col(idCol), col("hs"), col("sig"))
    val (pairs, newIdx) = graft.dedup.Dedup.minhashNearDupsDelta(
      index, batch, k, numPerm, bands, threshold, textCol, idCol)
    pairs.persist()
    try {
      if (pairs.count() > 0)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      newIdx.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    } finally pairs.unpersist(blocking = true)
  }

  /** Streaming near-dup sink (foreachBatch over [[nearDupBatch]]).
    * Read accumulated pairs with [[readDeduped]] over `pairsDir`
    * (None/absent before the first pair-producing batch).
    */
  def sinkNearDup(df: DataFrame, indexDir: String, pairsDir: String,
                  checkpointDir: String, k: Int = 3, numPerm: Int = 32,
                  bands: Int = 8, threshold: Double = 0.8,
                  textCol: String = "text", idCol: String = "doc_id",
                  compactEvery: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupBatch(batch, batchId, indexDir, pairsDir,
          k, numPerm, bands, threshold, textCol, idCol)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          StoreMaintenance.compactStore(batch.sparkSession, indexDir): Unit
      }

  /** One IMAGE-dedup ingest micro-batch — [[nearDupBatch]]'s shape
    * applied to the perceptual-hash index
    * ([[graft.mm.Multimodal.dhashPairsDelta]]): the batch's payloads
    * decode and hash ONCE (rasters die inside the decode task), the
    * standing index contributes 8-byte hashes only — payloads are
    * never re-read or re-decoded — and the batch's bands broadcast
    * against the index's. Replay-idempotent the same way: the index
    * read excludes the replayed batch's own partition.
    */
  def imageDedupBatch(batch: DataFrame, batchId: Long, indexDir: String,
                      pairsDir: String, maxHamming: Int = 3): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val newHashes = graft.mm.Multimodal.dhash(
      batch.as[graft.mm.Multimodal.MediaRow]).toDF()
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index =
      if (!fs.exists(idxPath)) newHashes.limit(0)
      else spark.read.parquet(indexDir)
        .filter(col("batch") =!= batchId) // replay: own hashes are not history
        .select(newHashes.columns.map(col): _*)
    val pairs = graft.mm.Multimodal.dhashPairsDelta(index, newHashes, maxHamming)
    pairs.persist()
    try {
      if (pairs.count() > 0)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      newHashes.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    } finally pairs.unpersist(blocking = true)
  }

  /** Streaming image-dedup sink (foreachBatch over [[imageDedupBatch]])
    * — completes multimodal parity with the text near-dup sink: image
    * batches arrive as MediaRow-shaped frames, the dhash index
    * accumulates per batch, pairs land under `pairsDir` (read with
    * [[readDeduped]]).
    */
  def sinkImageDedup(df: DataFrame, indexDir: String, pairsDir: String,
                     checkpointDir: String, maxHamming: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        imageDedupBatch(batch, batchId, indexDir, pairsDir, maxHamming)
      }

  /** One micro-batch of incremental AUDIO near-dup ingest — the
    * [[imageDedupBatch]] contract over [[graft.mm.Multimodal.audioFingerprint]]
    * rows: the standing index holds (id, count, 16-byte fingerprint)
    * rows only — payloads are never re-read or re-decoded — and the
    * batch's bands broadcast against the index's. Replay-idempotent
    * the same way: the index read excludes the replayed batch's own
    * partition.
    */
  def audioDedupBatch(batch: DataFrame, batchId: Long, indexDir: String,
                      pairsDir: String, maxHamming: Int = 3): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val newFps = graft.mm.Multimodal.audioFingerprint(
      batch.as[graft.mm.Multimodal.MediaRow]).toDF()
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index =
      if (!fs.exists(idxPath)) newFps.limit(0)
      else spark.read.parquet(indexDir)
        .filter(col("batch") =!= batchId) // replay: own hashes are not history
        .select(newFps.columns.map(col): _*)
    val pairs = graft.mm.Multimodal.audioNearDupsDelta(index, newFps, maxHamming)
    pairs.persist()
    try {
      if (pairs.count() > 0)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
      newFps.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    } finally pairs.unpersist(blocking = true)
  }

  /** Streaming audio-dedup sink (foreachBatch over [[audioDedupBatch]])
    * — closes the multimodal streaming-dedup matrix (text/image/AUDIO):
    * audio batches arrive as MediaRow-shaped frames, the fingerprint
    * index accumulates per batch, pairs land under `pairsDir` (read
    * with [[readDeduped]]).
    */
  def sinkAudioDedup(df: DataFrame, indexDir: String, pairsDir: String,
                     checkpointDir: String, maxHamming: Int = 3)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        audioDedupBatch(batch, batchId, indexDir, pairsDir, maxHamming)
      }

  /** One ANN-INDEX ingest micro-batch: PQ-encode the batch's vectors
    * (coarse routing + residual PQ codes —
    * [[graft.sim.Pq.encodeIndex]]) into `indexDir/batch=<id>`. The
    * searchable artifact GROWS with the stream while each commit
    * costs O(batch): vectors are read once, at arrival; search scans
    * only the accumulated 8-byte codes. Replay-idempotent by the
    * per-batch-partition overwrite (the [[nearDupBatch]] convention)
    * — a re-delivered batch rewrites its own partition bit-identically
    * (encode is deterministic under a fixed coarse/codebook) and
    * touches nothing else.
    */
  def annIndexBatch(batch: DataFrame, batchId: Long, indexDir: String,
                    coarse: Array[Array[Double]],
                    codebook: Array[Array[Array[Double]]],
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    byResidual: Boolean = true): Unit = {
    if (batch.isEmpty) return // a part-file-less dir poisons later reads
    graft.sim.Pq.encodeIndex(batch, coarse, codebook, idCol, vecCol, byResidual)
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
  }

  /** Streaming ANN-index sink (foreachBatch over [[annIndexBatch]]) —
    * the vector-index twin of the dedup-store sinks: a growing corpus
    * of embeddings maintains a searchable IVF-PQ index incrementally
    * instead of re-encoding from scratch. The coarse centroids and
    * codebooks are FROZEN at sink-construction time (the FAISS
    * contract: retraining quantizers invalidates every stored code —
    * retrain offline, re-encode, swap directories). Query the
    * accumulated index with [[readAnnIndex]] +
    * [[graft.sim.Pq.searchPq]].
    */
  def sinkAnnIndex(df: DataFrame, indexDir: String, checkpointDir: String,
                   coarse: Array[Array[Double]],
                   codebook: Array[Array[Array[Double]]],
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   byResidual: Boolean = true,
                   compactEvery: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        annIndexBatch(batch, batchId, indexDir, coarse, codebook,
          idCol, vecCol, byResidual)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          StoreMaintenance.compactStore(batch.sparkSession, indexDir): Unit
      }

  /** The accumulated (neighbor_id, cid, code) ANN index across all
    * committed batches (None before the first commit) — feed to
    * [[graft.sim.Pq.searchPq]] with the SAME coarse/codebook/
    * byResidual the sink was built with.
    */
  def readAnnIndex(spark: SparkSession, indexDir: String): Option[DataFrame] =
    readDeduped(spark, indexDir)
      .map(_.select("neighbor_id", "cid", "code"))

  /** Streaming CURATION sink: foreachBatch over
    * [[graft.pipeline.Curation.curateDelta]] — each micro-batch is
    * exact-deduped against the seen-hash store, near-dup-pruned
    * against the MinHash index, gated, sampled, and its survivors
    * land under `outDir/batch=<id>`. Store commits are O(batch);
    * replay recomputes identically (curateDelta excludes a batch's
    * own store partitions). Read the curated corpus back with
    * [[readDeduped]] over `outDir`.
    */
  def sinkCurate(df: DataFrame, seenDir: String, indexDir: String,
                 outDir: String, checkpointDir: String,
                 minQuality: Double = 0.3,
                 keepLangs: Seq[String] = Seq("en"),
                 sampleFraction: Double = 1.0,
                 classifier: Option[graft.pipeline.TextClassifier.Model] = None,
                 minClassifierProb: Double = 0.5,
                 textCol: String = "text", idCol: String = "doc_id",
                 compactEvery: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = graft.pipeline.Curation.curateDelta(
          batch, batchId, seenDir, indexDir,
          minQuality = minQuality, keepLangs = keepLangs,
          sampleFraction = sampleFraction,
          classifier = classifier, minClassifierProb = minClassifierProb,
          idCol = idCol, textCol = textCol)
        // materialize once; empty batches write nothing (a
        // part-file-less dir poisons later reads — dedupBatch rule)
        out.persist()
        try {
          if (out.count() > 0)
            out.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        } finally out.unpersist(blocking = true)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          StoreMaintenance.compactStore(batch.sparkSession, seenDir)
          StoreMaintenance.compactStore(batch.sparkSession, indexDir): Unit
        }
      }

  /** Sessionization via the NATIVE `session_window` operator — the
    * high-throughput alternative to [[sessionizeStream]] when only
    * per-session aggregates are needed: state lives inside the
    * streaming aggregation (merging session windows), not custom
    * mapGroups state, so it scales with Spark's aggregation state
    * store. Works identically as a batch query.
    *
    * Boundary contract differs from the batch `sessionize` at EXACT
    * gap multiples: `session_window` closes a session when the next
    * event lands at or past lastEvent + gap (half-open extension),
    * while the reference-shaped sessionize keeps an event at exactly
    * the gap in the SAME session (strict `>` split). Identical for
    * any data without exact-gap arrivals.
    */
  def sessionWindowAgg(events: DataFrame, keyCol: String, timeCol: String,
                       gap: String, watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(events)(events.withWatermark(timeCol, _))
    in.groupBy(col(keyCol), session_window(col(timeCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** Histogram-state form of [[mergeAggBatch]]: micro-batches maintain
    * the mergeable QUANTILE state (IncrementalAgg.histState) under the
    * same atomic-commit + replay-skip contract. Exact integer bin
    * counts make the maintained state bit-identical to histogramming
    * all batches at once, under any micro-batching.
    */
  def mergeHistBatch(batch: DataFrame, batchId: Long, stateDir: String,
                     timeCol: String, interval: String, valueCol: String,
                     lo: Double, hi: Double, nBins: Int): Unit = {
    val store = new SnapshotStore(batch.sparkSession, stateDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay: already merged
    val fresh = graft.ops.IncrementalAgg
      .histState(batch, timeCol, interval, valueCol, lo, hi, nBins)
    val merged = store.read() match {
      case Some(prev) => graft.ops.IncrementalAgg.mergeHistStates(prev, fresh)
      case None => fresh
    }
    store.commit(merged, batchId)
  }

  /** Streaming quantile-state sink — [[sinkAggState]] for the
    * histogram state; read quantiles back with
    * `IncrementalAgg.quantilesFromState(readAggState(...), ...)`.
    */
  def sinkHistState(df: DataFrame, stateDir: String, checkpointDir: String,
                    timeCol: String, interval: String, valueCol: String,
                    lo: Double, hi: Double, nBins: Int): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeHistBatch(batch, batchId, stateDir, timeCol, interval, valueCol,
          lo, hi, nBins)
      }

  /** HLL form of [[mergeAggBatch]]: micro-batches maintain the
    * mergeable DISTINCT-count state (IncrementalAgg.distinctState)
    * under the same atomic-commit + replay-skip contract. Union
    * registers equal direct-build registers, so the maintained state
    * estimates identically to sketching all batches at once, under
    * any micro-batching.
    */
  def mergeDistinctBatch(batch: DataFrame, batchId: Long, stateDir: String,
                         timeCol: String, interval: String, keyCol: String,
                         lgK: Int = 12): Unit = {
    val store = new SnapshotStore(batch.sparkSession, stateDir)
    if (store.lastCommittedBatch.exists(batchId <= _)) return // replay: already merged
    val fresh = graft.ops.IncrementalAgg
      .distinctState(batch, timeCol, interval, keyCol, lgK)
    val merged = store.read() match {
      case Some(prev) => graft.ops.IncrementalAgg.mergeDistinctStates(prev, fresh)
      case None => fresh
    }
    store.commit(merged, batchId)
  }

  /** Streaming distinct-count sink — [[sinkAggState]] for the HLL
    * state; read estimates back with
    * `IncrementalAgg.distinctFromState(readAggState(...))`.
    */
  def sinkDistinctState(df: DataFrame, stateDir: String, checkpointDir: String,
                        timeCol: String, interval: String, keyCol: String,
                        lgK: Int = 12): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeDistinctBatch(batch, batchId, stateDir, timeCol, interval, keyCol, lgK)
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

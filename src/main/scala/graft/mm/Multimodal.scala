package graft.mm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary payloads with
  * typed metadata, batch-decoded per partition.
  *
  * The decode itself is STUBBED (no image/audio libs in this
  * environment): `decodeStub` produces a deterministic fingerprint of
  * the payload bytes instead of real pixels/samples. Everything
  * Spark-side — schema, binary column handling, partition-batched
  * decode signature, downstream joins — is real and tested; swapping
  * `decodeStub` for a JNI/lib decoder changes no plumbing.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Int)
  case class MediaFeature(doc_id: Long, media_type: String, payload_bytes: Int,
                          width: Int, height: Int, feature_hash: String)

  /** Derive a media table from the documents corpus: payload = UTF-8
    * bytes of the text (deterministic stand-in for real media bytes),
    * metadata derived from the id.
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
      (lit(48) + (col("doc_id") % 12) * 8).cast("int").as("height"),
      ((col("doc_id") % 30 + 1) * 1000).cast("int").as("duration_ms"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode pixels/samples
    * here; this produces the md5 of the payload as the "feature".
    * Deterministic so the pipeline is oracle-checkable end to end.
    */
  private def decodeStub(payload: Array[Byte]): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(payload).map("%02x".format(_)).mkString
  }

  /** Partition-batched feature extraction: the decoder is invoked once
    * per partition iterator (the batch shape a native decoder wants),
    * never per-row on the driver.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      // per-partition setup cost (decoder init) amortized here
      rows.map { r =>
        MediaFeature(r.doc_id, r.media_type, r.payload.length,
          r.width, r.height, decodeStub(r.payload))
      }
    }
  }

  /** Resize plan for image rows: target box fit preserving aspect
    * ratio (the metadata math is real; the pixel resample itself would
    * live in the decoder slot of extractFeatures). Ceil-free integer
    * math: scaled = dim * scaleNum / scaleDen with the larger-side fit.
    */
  def resizePlan(media: Dataset[MediaRow], maxW: Int, maxH: Int): DataFrame =
    media.toDF()
      .filter(col("media_type") === "image")
      // floor division spelled out so the semantics are engine-agnostic
      // (Spark casts double->int by truncation, DuckDB by rounding)
      .withColumn("out_w",
        when(col("width") * maxH <= col("height") * maxW, // height-bound
          floor(col("width") * maxH / col("height")).cast("int"))
        .otherwise(lit(maxW)))
      .withColumn("out_h",
        when(col("width") * maxH <= col("height") * maxW, lit(maxH))
        .otherwise(floor(col("height") * maxW / col("width")).cast("int")))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
      .orderBy("doc_id")

  /** Frame energy for audio rows: RMS per fixed-size sample frame —
    * the silence-detection / loudness-normalization signal an audio
    * curation pass gates on. The DECODE slot is the stub convention:
    * payload bytes surface as the decoded text's code points (a
    * deterministic stand-in for PCM samples — swapping in a real
    * decoder changes the sample source, not the frame math). The
    * frame fold is pure codegen'd array expressions: zero shuffle
    * before the deterministic-output sort, sum-of-squares in exact
    * longs, one IEEE sqrt + 6dp round so a SQL oracle reproduces the
    * RMS bit-for-bit.
    */
  def audioFrameEnergy(media: Dataset[MediaRow],
                       frameSamples: Int = 64): DataFrame = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    media.toDF()
      .filter(col("media_type") === "audio")
      .withColumn("__cs",
        expr("transform(split(CAST(payload AS STRING), ''), c -> ascii(c))"))
      .withColumn("__g", explode(expr(
        s"sequence(1, CAST(ceil(size(__cs) / ${frameSamples}.0) AS INT))")))
      .withColumn("__f",
        expr(s"slice(__cs, (__g - 1) * $frameSamples + 1, $frameSamples)"))
      .select(col("doc_id"),
        (col("__g") - 1).cast("long").as("frame_id"),
        size(col("__f")).cast("long").as("n_samples"),
        round(sqrt(
          expr("aggregate(__f, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)")
            .cast("double") / size(col("__f"))), 6).as("rms"))
      .orderBy("doc_id", "frame_id")
  }

  /** Frame-sample offsets for video rows: one offset per second. */
  def frameSampleOffsets(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .filter(col("media_type") === "video")
      .withColumn("frame_offsets_ms",
        sequence(lit(0), col("duration_ms") - 1, lit(1000)))
      .select(col("doc_id"), col("duration_ms"), col("frame_offsets_ms"),
        size(col("frame_offsets_ms")).as("n_frames"))
      .orderBy("doc_id")
}

package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500) record reader — the arrival format of web crawls
  * (Common Crawl ships `.warc.gz`), and the step BEFORE
  * [[graft.text.HtmlExtract]] in a crawl-sourced curation pipeline.
  * Pure-byte record walker in the same style as the ISO-BMFF box
  * parser (graft.mm.Multimodal.decodeVideoMeta): header block parsed
  * as ASCII lines, payload advanced by Content-Length (NEVER by
  * scanning for a delimiter — payloads legally contain "WARC/1.0"),
  * malformed or truncated tails quarantined, never thrown.
  *
  * Scale shape: WARC records are not splittable mid-file (records
  * span arbitrary byte offsets, and `.warc.gz` members are the only
  * sync points), so the unit of parallelism is the FILE — exactly how
  * crawl archives are laid out (Common Crawl: ~1 GiB per warc file,
  * tens of thousands of files per snapshot). [[read]] maps one task
  * per file; a 100 TB crawl is ~100k files = ~100k independent tasks,
  * no shuffle at all until the caller aggregates.
  *
  * Memory shape: the walker is INCREMENTAL — [[StreamWalker]] emits
  * records one at a time off an InputStream, so only the current
  * record's header block and payload are ever resident. A real Common
  * Crawl file (~1 GiB gzip, 3–5 GiB decompressed — past the JVM's
  * 2 GiB array limit) streams through one task in bounded heap;
  * per-record payloads stay page-sized. [[parseRecords]] is the same
  * grammar run over an in-memory blob (specs, synthetic corpora).
  */
object Warc {

  /** One parsed record: its WARC headers (original case preserved in
    * `headers`; lookups below are case-insensitive per the spec) and
    * raw payload bytes. `offset` is the record's start position in the
    * DECOMPRESSED stream.
    */
  final case class WarcRecord(offset: Long, warcType: String,
                              targetUri: String, contentType: String,
                              headers: Map[String, String],
                              payload: Array[Byte])

  /** Parse result: complete records plus the byte offset of the first
    * malformed/truncated structure (-1 = clean EOF). Everything from
    * `quarantinedAt` on is unparseable — the caller decides whether a
    * non-negative value is an error or an expected truncated tail.
    */
  final case class WarcParse(records: Seq[WarcRecord], quarantinedAt: Long)

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Incremental record walker over a (decompressed) WARC byte
    * stream. Grammar per record: version line (`WARC/1.0` or
    * `WARC/1.1`), header lines (`Name: value`) up to an empty line,
    * `Content-Length` payload bytes, then CRLF CRLF (the two
    * record-terminating CRLFs are optional on the LAST record of a
    * stream per common writer practice; between records the skip loop
    * absorbs them). Anything else stops the walk with the offending
    * DECOMPRESSED offset in [[quarantinedAt]] (valid once the iterator
    * is exhausted; -1 = clean EOF so far).
    *
    * Bounded memory: one header line (capped at `maxLineBytes` —
    * streaming input is unbounded, unlike the blob form) plus one
    * payload at a time. Line scanning looks for the exact CRLF pair —
    * a bare LF or lone CR inside a header line is line CONTENT, same
    * as the blob walker.
    */
  final class StreamWalker(raw: InputStream, maxLineBytes: Int = 1 << 20)
      extends Iterator[WarcRecord] {
    private val in = new PushbackInputStream(
      new BufferedInputStream(raw, 64 * 1024), 2)
    private var pos = 0L
    private var quarantinedOff = -1L
    private var done = false
    private var pending: WarcRecord = _
    private var fetched = false

    /** Offset of the first malformed structure; -1 if the stream was
      * clean. Only final once `hasNext` has returned false.
      */
    def quarantinedAt: Long = quarantinedOff

    private def rd(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    private def unrd(b: Int): Unit = { in.unread(b); pos -= 1 }

    // bytes until the exact CRLF pair; null = EOF or oversize line
    // (both malformed mid-record)
    private def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(64)
      while (buf.size <= maxLineBytes) {
        val b = rd()
        if (b < 0) return null
        if (b == '\r') {
          val b2 = rd()
          if (b2 == '\n')
            return new String(buf.toByteArray, StandardCharsets.UTF_8)
          if (b2 >= 0) unrd(b2)
          buf.write(b)
        } else buf.write(b)
      }
      null
    }

    private def advance(): WarcRecord = {
      if (done) return null
      // skip inter-record CRLF pairs (a lone CR is record content —
      // push it back and let the version check quarantine it)
      var skipping = true
      while (skipping) {
        val b = rd()
        if (b < 0) { done = true; return null } // clean EOF
        if (b == '\r') {
          val b2 = rd()
          if (b2 != '\n') {
            if (b2 >= 0) unrd(b2)
            unrd('\r'); skipping = false
          }
        } else { unrd(b); skipping = false }
      }
      val recStart = pos
      def fail(): WarcRecord = {
        quarantinedOff = recStart; done = true; null
      }
      val version = readLine()
      if (version == null || (version != "WARC/1.0" && version != "WARC/1.1"))
        return fail()
      var headers = Map.empty[String, String]
      var inHdrs = true
      while (inHdrs) {
        val line = readLine()
        if (line == null) return fail()
        else if (line.isEmpty) inHdrs = false
        else {
          val colon = line.indexOf(':')
          if (colon <= 0) return fail()
          headers += (line.substring(0, colon).trim ->
            line.substring(colon + 1).trim)
        }
      }
      def hdr(name: String): Option[String] =
        headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
      val len = hdr("Content-Length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || len > Int.MaxValue) return fail()
      val payload = new Array[Byte](len.toInt)
      var got = 0
      while (got < payload.length) {
        val r = in.read(payload, got, payload.length - got)
        if (r < 0) return fail()
        got += r; pos += r
      }
      WarcRecord(recStart,
        hdr("WARC-Type").getOrElse(""), hdr("WARC-Target-URI").getOrElse(""),
        hdr("Content-Type").getOrElse(""), headers, payload)
    }

    override def hasNext: Boolean = {
      if (!fetched) { pending = advance(); fetched = true }
      pending != null
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      fetched = false
      val r = pending; pending = null; r
    }
  }

  /** Walk concatenated WARC records in an in-memory blob — the
    * [[StreamWalker]] grammar over a byte array (one code path, so the
    * blob-built oracle corpora and the streaming file reader can never
    * diverge).
    */
  def parseRecords(bytes: Array[Byte]): WarcParse = {
    val w = new StreamWalker(new ByteArrayInputStream(bytes))
    val recs = w.toVector
    WarcParse(recs, w.quarantinedAt)
  }

  /** Serialize one record — the writer half of the round-trip, and
    * what the specs and the oracle entry build corpora with.
    */
  def writeRecord(warcType: String, targetUri: String,
                  contentType: String, payload: Array[Byte],
                  extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    if (contentType.nonEmpty)
      sb.append("Content-Type: ").append(contentType).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    head ++ payload ++ Crlf ++ Crlf
  }

  /** Distributed WARC export — the writer half of the interchange
    * story: a curated corpus re-exports as standard `.warc.gz` files
    * any WARC consumer (including [[read]]) can ingest. `records`
    * carries (warc_type, target_uri, content_type, payload) plus an
    * optional `warc_date` column; one FILE per non-empty input
    * partition (size files with a repartition upstream), one GZIP
    * MEMBER per record — the Common Crawl convention that keeps
    * files re-syncable and lets [[read]] stream them in bounded
    * heap. Returns one (file, n_records) row per written file —
    * file-shaped, safely collectible.
    *
    * File IO happens inside the task (the media-decoder/Compaction
    * RDD-boundary contract): each task writes a private temp name
    * and atomically renames on success, so a re-executed or
    * speculative attempt can never leave a partial file under the
    * final name (local/NFS semantics; on an object store, route
    * through its committer instead). Each member's GZIPOutputStream
    * is closed per record behind a close-shield (releases its
    * native Deflater eagerly — the compressionRatio lesson) without
    * closing the shared file stream.
    */
  def write(records: DataFrame, dir: String, gzip: Boolean = true): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val hasDate = records.columns.contains("warc_date")
    val cols = Seq("warc_type", "target_uri", "content_type", "payload") ++
      (if (hasDate) Seq("warc_date") else Nil)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    records.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val ext = if (gzip) ".warc.gz" else ".warc"
          val fin = java.nio.file.Paths.get(dir, f"part-${tc.partitionId}%05d$ext")
          val tmp = java.nio.file.Paths.get(
            dir, f".part-${tc.partitionId}%05d.${tc.taskAttemptId}%d.tmp")
          val fos = java.nio.file.Files.newOutputStream(tmp)
          val shield = new java.io.FilterOutputStream(fos) {
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              out.write(b, off, len)
            override def close(): Unit = out.flush() // member close only
          }
          var n = 0L
          try {
            while (it.hasNext) {
              val r = it.next()
              val date =
                if (hasDate && !r.isNullAt(4)) Seq("WARC-Date" -> r.getString(4))
                else Nil
              val bytes = writeRecord(r.getString(0), r.getString(1),
                r.getString(2), r.getAs[Array[Byte]](3), date)
              if (gzip) {
                val gz = new GZIPOutputStream(shield, 64 * 1024)
                gz.write(bytes)
                gz.close() // finish member + end() its Deflater
              } else fos.write(bytes)
              n += 1
            }
          } finally fos.close()
          java.nio.file.Files.move(tmp, fin,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          Iterator.single((fin.toString, n))
        }
      }.toDF("file", "n_records")
  }

  /** Strip the HTTP header block from a `response` record's payload
    * (the payload of an HTTP response capture is headers + body split
    * by the first CRLF CRLF); identity when no header block is found
    * (resource/conversion records carry the bare content).
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val looksHttp = payload.length >= 5 &&
      new String(payload, 0, 5, StandardCharsets.US_ASCII) == "HTTP/"
    if (!looksHttp) payload
    else {
      var i = 0
      while (i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
          return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
        i += 1
      }
      payload
    }
  }

  // gzip magic peek: WARC gzip files are a SEQUENCE of gzip members
  // (one per record, so readers can re-sync); GZIPInputStream consumes
  // multi-member streams natively and incrementally.
  private def maybeGunzip(in: InputStream): InputStream = {
    val pb = new PushbackInputStream(in, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(pb, 64 * 1024) else pb
  }

  /** Read WARC files under `path` (plain or gzip, single- or
    * multi-member) into one row per record: (file, decompressed record
    * offset, warc_type, target_uri, content_type, warc_date — the
    * WARC-Date header, empty when absent (ISO-8601 UTC per the spec,
    * so string order IS fetch order) — payload bytes,
    * quarantined_at). Record rows carry quarantined_at = -1; a file
    * whose tail is malformed/truncated additionally emits ONE sentinel
    * row (empty type/uri/payload, offset = quarantined_at = the bad
    * offset) AFTER its records — callers filter
    * `quarantined_at >= 0` for the quarantine report, and the
    * `warc_type` gates every pipeline already applies drop sentinels
    * for free.
    *
    * One task per file via `sparkContext.binaryFiles` — its
    * PortableDataStream hands the walker a true InputStream, so a
    * multi-GiB-decompressed file streams through in bounded heap
    * (the DataFrame binaryFile source would materialize each file as
    * one <2 GiB row instead). Genuinely imperative per-file byte
    * walking — the same RDD-boundary contract as the media decoders.
    */
  def read(spark: SparkSession, path: String,
           pathGlobFilter: String = "*"): DataFrame = {
    import spark.implicits._
    val target = if (pathGlobFilter == "*") path else s"$path/$pathGlobFilter"
    val rows = spark.sparkContext.binaryFiles(target)
      .flatMap { case (file, pds) =>
        val in = maybeGunzip(new BufferedInputStream(pds.open(), 64 * 1024))
        // release the file handle + Inflater native memory even when
        // the iterator is abandoned mid-file (limit/take queries)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val w = new StreamWalker(in)
        w.map { r =>
          val date = r.headers.collectFirst {
            case (k, v) if k.equalsIgnoreCase("WARC-Date") => v
          }.getOrElse("")
          (file, r.offset, r.warcType, r.targetUri, r.contentType, date,
            r.payload, -1L)
        } ++
          // deferred: quarantinedAt is only final after exhaustion
          Iterator.single(()).flatMap { _ =>
            in.close()
            if (w.quarantinedAt >= 0)
              Iterator.single((file, w.quarantinedAt, "", "", "", "",
                Array.emptyByteArray, w.quarantinedAt))
            else Iterator.empty
          }
      }
    spark.createDataset(rows).toDF("file", "offset", "warc_type",
      "target_uri", "content_type", "warc_date", "payload", "quarantined_at")
  }

  // bounded view of a seekable stream: exactly `limit` bytes then EOF
  // (the split reader hands each task its member-run slice);
  // package-visible so the spec can pin the available()-dependent
  // member-concatenation window without a 64 KiB-aligned file fixture
  private[graft] final class LimitedInputStream(in: InputStream, limit: Long)
      extends InputStream {
    private var remaining = limit
    override def read(): Int =
      if (remaining <= 0) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (remaining <= 0) return -1
      val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
    // MUST mirror the underlying stream (capped at the limit):
    // stock-JDK GZIPInputStream.readTrailer only continues to the
    // NEXT gzip member when in.available() > 0 or the inflater holds
    // > 26 leftover bytes — InputStream's default (always 0) made a
    // member boundary landing within ~26 bytes of a buffer-fill
    // boundary look like EOF, silently dropping the rest of the
    // split. (Some current JDK builds carry the upstream fix that
    // removes the gate; the override keeps splits byte-complete on
    // the many that don't.)
    override def available(): Int =
      if (remaining <= 0) 0
      else math.min(in.available().toLong, remaining).toInt
    override def close(): Unit = in.close()
  }

  /** Intra-file split descriptors for `.warc.gz` archives — the fix
    * for the one-giant-archive case where one-task-per-file
    * ([[read]]) serializes a multi-hour decompress behind a single
    * core. WARC gzip files are a SEQUENCE of gzip members (Common
    * Crawl: one member per record — the format's own sync points), so
    * a file splits at member boundaries: ONE cheap sequential pass
    * over the COMPRESSED bytes (no decompression except validation
    * probes) scans for member-header candidates (`1f 8b 08` + clear
    * reserved flag bits), and the first VALIDATED candidate past each
    * `targetSplitBytes` boundary opens a new split — validation
    * inflates a small prefix and requires the member to open with
    * `WARC/`, so a byte coincidence inside compressed data can never
    * mint a bogus split (~one probe per split, not per member).
    * Plain `.warc` files and single-member archives yield one
    * whole-file split. Returns (file, start, end) compressed-offset
    * ranges; end = -1 means to-EOF.
    *
    * Scale shape: the scan is one task per file over compressed bytes
    * (IO-bound, ~the cost of a checksum pass); the expensive
    * decompress+parse then fans out across `(file size /
    * targetSplitBytes)` tasks in [[readSplit]]. For many-file crawls
    * [[read]] remains the right entry — this path exists for the few
    * oversized archives that would otherwise straggle a stage.
    */
  def memberSplits(spark: SparkSession, path: String,
                   pathGlobFilter: String = "*",
                   targetSplitBytes: Long = 128L << 20): DataFrame = {
    require(targetSplitBytes >= 1, s"targetSplitBytes >= 1: $targetSplitBytes")
    import spark.implicits._
    val target = if (pathGlobFilter == "*") path else s"$path/$pathGlobFilter"
    val rows = spark.sparkContext.binaryFiles(target)
      .flatMap { case (file, pds) =>
        val probe = 1 << 16
        val in = new PushbackInputStream(
          new BufferedInputStream(pds.open(), 64 * 1024), probe + 8)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        val h0 = in.read(); val h1 = in.read()
        if (h1 >= 0) in.unread(h1)
        if (h0 >= 0) in.unread(h0)
        val starts = Seq.newBuilder[Long]
        starts += 0L
        if (h0 == 0x1f && h1 == 0x8b) {
          // last-4-byte window scan over the compressed stream
          var b0, b1, b2, b3 = -2
          var pos = 0L
          var nextBoundary = targetSplitBytes
          var eof = false
          while (!eof) {
            val nb = in.read()
            if (nb < 0) eof = true
            else {
              b0 = b1; b1 = b2; b2 = b3; b3 = nb; pos += 1
              val cand = pos - 4
              if (b0 == 0x1f && b1 == 0x8b && b2 == 0x08 &&
                (b3 & 0xE0) == 0 && cand >= nextBoundary) {
                val buf = new Array[Byte](probe)
                var got = 0
                var r = 0
                while (got < buf.length && r >= 0) {
                  r = in.read(buf, got, buf.length - got)
                  if (r > 0) got += r
                }
                val head = Array(b0.toByte, b1.toByte, b2.toByte, b3.toByte) ++
                  java.util.Arrays.copyOf(buf, got)
                val valid =
                  try {
                    val gz = new GZIPInputStream(
                      new ByteArrayInputStream(head), 1024)
                    val magic = new Array[Byte](5)
                    var m = 0
                    var rr = 0
                    while (m < 5 && rr >= 0) {
                      rr = gz.read(magic, m, 5 - m)
                      if (rr > 0) m += rr
                    }
                    m == 5 && new String(magic, StandardCharsets.US_ASCII) == "WARC/"
                  } catch { case _: java.io.IOException => false }
                if (got > 0) in.unread(buf, 0, got)
                if (valid) {
                  starts += cand
                  nextBoundary = cand + targetSplitBytes
                }
              }
            }
          }
        } else in.close()
        val ss = starts.result()
        ss.zipWithIndex.map { case (s, i) =>
          (file, s, if (i + 1 < ss.length) ss(i + 1) else -1L)
        }
      }
    spark.createDataset(rows).toDF("file", "start", "end")
  }

  /** [[read]] with intra-file parallelism: fan the member runs of
    * each archive ([[memberSplits]]) across tasks — one seek + one
    * bounded-heap [[StreamWalker]] per split, so ONE oversized
    * `.warc.gz` decompresses on many cores instead of straggling a
    * stage. Same row contract as [[read]] plus a `split_start` column
    * (the split's compressed byte offset); `offset` and any
    * quarantine sentinel are relative to the split's decompressed
    * stream — (file, split_start, offset) is the global record
    * identity. The record MULTISET equals [[read]]'s bit-for-bit
    * (specs pin it): split boundaries are validated member starts, so
    * every member is walked exactly once by exactly one task.
    */
  def readSplit(spark: SparkSession, path: String,
                pathGlobFilter: String = "*",
                targetSplitBytes: Long = 128L << 20): DataFrame = {
    import spark.implicits._
    val desc = memberSplits(spark, path, pathGlobFilter, targetSplitBytes)
      .as[(String, Long, Long)].rdd
    // round-robin the splits across the cluster: descriptor count is
    // file-shaped x splits-per-file, tiny next to the data it describes
    val spread = desc.repartition(
      math.max(spark.sparkContext.defaultParallelism, 1))
    // the session's Hadoop conf (spark.hadoop.* — object-store creds,
    // endpoints, timeouts), same view binaryFiles/memberSplits get
    val hadoopConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = spread.flatMap { case (file, start, end) =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(file))
      val fs = p.getFileSystem(hadoopConf.value.value)
      val raw = fs.open(p)
      raw.seek(start)
      val sliced: InputStream =
        if (end < 0) raw else new LimitedInputStream(raw, end - start)
      val in = maybeGunzip(new BufferedInputStream(sliced, 64 * 1024))
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => in.close()))
      val w = new StreamWalker(in)
      w.map { r =>
        val date = r.headers.collectFirst {
          case (k, v) if k.equalsIgnoreCase("WARC-Date") => v
        }.getOrElse("")
        (file, start, r.offset, r.warcType, r.targetUri, r.contentType,
          date, r.payload, -1L)
      } ++
        Iterator.single(()).flatMap { _ =>
          in.close()
          if (w.quarantinedAt >= 0)
            Iterator.single((file, start, w.quarantinedAt, "", "", "", "",
              Array.emptyByteArray, w.quarantinedAt))
          else Iterator.empty
        }
    }
    spark.createDataset(rows).toDF("file", "split_start", "offset",
      "warc_type", "target_uri", "content_type", "warc_date", "payload",
      "quarantined_at")
  }

  /** Read Common-Crawl-style WET files (extracted-text WARC:
    * `conversion` records carrying text/plain payloads) into
    * (file, url, warc_date, text) — the shortcut arrival format when
    * the crawl provider already ran extraction, feeding the text
    * gates directly and skipping [[graft.text.HtmlExtract]]. Same
    * streaming walker and one-task-per-file shape as [[read]]; WET
    * payloads are UTF-8 by spec (non-conversion records — the
    * per-file warcinfo header — and quarantine sentinels drop with
    * the same `warc_type` gate every consumer applies).
    */
  def readWet(spark: SparkSession, path: String,
              pathGlobFilter: String = "*"): DataFrame =
    read(spark, path, pathGlobFilter)
      .filter(col("warc_type") === "conversion")
      .select(col("file"), col("target_uri").as("url"), col("warc_date"),
        col("payload").cast("string").as("text"))
}

package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * per file via the binaryFile source; a 100 TB crawl is ~100k files
  * = ~100k independent tasks, no shuffle at all until the caller
  * aggregates.
  */
object Warc {

  /** One parsed record: its WARC headers (original case preserved in
    * `headers`; lookups below are case-insensitive per the spec) and
    * raw payload bytes.
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

  /** Walk concatenated WARC records in `bytes`. Grammar per record:
    * version line (`WARC/1.0` or `WARC/1.1`), header lines
    * (`Name: value`) up to an empty line, `Content-Length` payload
    * bytes, then CRLF CRLF. Anything else stops the walk with the
    * offending offset quarantined.
    */
  def parseRecords(bytes: Array[Byte]): WarcParse = {
    val out = ArrayBuffer.empty[WarcRecord]
    val n = bytes.length
    var off = 0
    // the two record-terminating CRLFs are optional on the LAST record
    // of a stream per common writer practice; require them between
    // records (content-length advancement re-syncs on the next version
    // line anyway)
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    while (off < n) {
      // skip inter-record CRLFs
      while (off + 1 < n && bytes(off) == '\r' && bytes(off + 1) == '\n') off += 2
      if (off >= n) return WarcParse(out.toSeq, -1L)
      val recStart = off
      val ve = lineEnd(off)
      if (ve < 0) return WarcParse(out.toSeq, recStart.toLong)
      val version = new String(bytes, off, ve - off, StandardCharsets.US_ASCII)
      if (version != "WARC/1.0" && version != "WARC/1.1")
        return WarcParse(out.toSeq, recStart.toLong)
      off = ve + 2
      var headers = Map.empty[String, String]
      var bad = false
      var done = false
      while (!done && !bad) {
        val he = lineEnd(off)
        if (he < 0) bad = true
        else if (he == off) { off += 2; done = true } // empty line
        else {
          val line = new String(bytes, off, he - off, StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon <= 0) bad = true
          else {
            headers += (line.substring(0, colon).trim -> line.substring(colon + 1).trim)
            off = he + 2
          }
        }
      }
      if (bad) return WarcParse(out.toSeq, recStart.toLong)
      def hdr(name: String): Option[String] =
        headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
      val len = hdr("Content-Length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || len > Int.MaxValue || off + len > n)
        return WarcParse(out.toSeq, recStart.toLong)
      val payload = java.util.Arrays.copyOfRange(bytes, off, off + len.toInt)
      out += WarcRecord(recStart.toLong,
        hdr("WARC-Type").getOrElse(""), hdr("WARC-Target-URI").getOrElse(""),
        hdr("Content-Type").getOrElse(""), headers, payload)
      off += len.toInt
    }
    WarcParse(out.toSeq, -1L)
  }

  /** Serialize one record — the writer half of the round-trip, and
    * what the specs and the oracle entry build corpora with.
    */
  def writeRecord(warcType: String, targetUri: String,
                  contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    if (contentType.nonEmpty)
      sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    head ++ payload ++ Crlf ++ Crlf
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

  /** Gunzip a whole `.warc.gz` stream. WARC gzip files are a SEQUENCE
    * of gzip members (one per record, so readers can re-sync);
    * GZIPInputStream consumes multi-member streams natively.
    */
  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    try {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Read WARC files under `path` (plain or per-record-gzip) into one
    * row per record: (file, record offset, warc_type, target_uri,
    * content_type, payload bytes, quarantined_at for the file's tail).
    * One task per file (binaryFile source); genuinely imperative
    * per-file byte walking, so mapPartitions is the right tool here —
    * the same contract as the media decoders.
    */
  def read(spark: SparkSession, path: String,
           pathGlobFilter: String = "*"): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlobFilter).load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.mapPartitions { it =>
      it.flatMap { case (file, raw) =>
        val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
        val parsed = parseRecords(bytes)
        parsed.records.iterator.map { r =>
          (file, r.offset, r.warcType, r.targetUri, r.contentType,
            r.payload, parsed.quarantinedAt)
        }
      }
    }.toDF("file", "offset", "warc_type", "target_uri", "content_type",
      "payload", "quarantined_at")
  }
}

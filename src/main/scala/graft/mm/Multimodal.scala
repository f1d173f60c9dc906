package graft.mm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary payloads with
  * typed metadata, batch-decoded per partition.
  *
  * Image rows get a REAL decode: `javax.imageio` (JDK-only — PNG,
  * JPEG, GIF, BMP) turns the payload into pixels, and the feature is
  * the Rec.601 mean luma with width/height taken from the DECODED
  * image, not the metadata columns. Audio rows likewise:
  * `javax.sound.sampled` (JDK-only — WAV/AIFF/AU, 8/16-bit PCM)
  * yields format facts + full-scale RMS from the decoded samples.
  * Payloads no reader claims (and video, which the JDK cannot
  * decode) fall back to a deterministic md5 fingerprint with the
  * metadata dimensions — so the pipeline is total over arbitrary
  * bytes and oracle-checkable end to end. Swapping in a richer
  * decoder (libjpeg-turbo, ffmpeg via JNI) replaces only
  * `decodeImage`/`decodeAudio`; no plumbing changes.
  */
object Multimodal {

  /** JVM-global, idempotent, touched by every decode path: ImageIO's
    * DEFAULT stream cache backs each decode with a temp FILE
    * (FileCacheImageInputStream) — measured on this box, 32 threads
    * doing 32x the decodes of one thread took 22.2 s where the
    * single thread took 0.95 s (filesystem contention serializes the
    * executor); with the memory cache the same 32-thread load runs
    * 1.19 s — near-perfect scaling. In-memory payloads never benefit
    * from a disk cache, so this is strictly better for the decode
    * shapes this engine runs. (The audio analogue — the
    * AudioSystem SPI registry lock — is bypassed in [[parseWavPcm]].)
    */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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

  /** Fallback feature for undecodable payloads: md5 of the bytes —
    * deterministic, so the pipeline stays oracle-checkable even over
    * opaque media the JDK has no codec for.
    */
  private def fingerprint(payload: Array[Byte]): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(payload).map("%02x".format(_)).mkString
  }

  /** Decoded image facts: true pixel dimensions + the feature string
    * `luma:<mean>` (Rec.601 luma averaged over all pixels, 6 dp —
    * integer accumulation, so the value is identical on any JVM).
    */
  private[graft] case class DecodedImage(width: Int, height: Int, feature: String)

  /** Real image decode via `javax.imageio`. None when no installed
    * reader claims the bytes (text payloads, truncated files) — the
    * caller falls back to [[fingerprint]]. ImageIO.read probes headers
    * first, so a non-image payload fails in microseconds, not after a
    * full parse attempt.
    */
  /** Rec.601 mean-luma fact for a decoded frame: Σ(299R + 587G + 114B)
    * accumulated exactly in a long (the coefficients sum to 1000, so a
    * uniform gray g has mean luma exactly g), divided once at the end.
    */
  private def lumaFacts(img: java.awt.image.BufferedImage): DecodedImage = {
    var lumaMilli = 0L // Σ round-free (299R + 587G + 114B), exact in long
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        lumaMilli += 299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val px = img.getWidth.toLong * img.getHeight
    val mean = lumaMilli.toDouble / (1000.0 * px)
    DecodedImage(img.getWidth, img.getHeight,
      "luma:" + String.format(java.util.Locale.ROOT, "%.6f", Double.box(mean)))
  }

  private[mm] def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    try {
      imageIoMemCache
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(lumaFacts(img))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Multi-frame decode (animated GIF — the one multi-frame container
    * the JDK ships a codec for; a still PNG/JPEG is simply n = 1):
    * frame COUNT plus the decoded frames at indices 0, step, 2·step, …
    * — only sampled frames are read, skipped ones are never decoded.
    * Frames are the container's raw rasters (no disposal-method
    * composition across frames — each sampled frame's own pixels).
    * None when no reader claims the bytes.
    */
  private[graft] def decodeFrames(payload: Array[Byte],
                                  step: Int): Option[(Int, Seq[(Int, DecodedImage)])] = {
    require(step >= 1, s"step >= 1: $step")
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      imageIoMemCache
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((n, (0 until n by step).map(i => (i, lumaFacts(reader.read(i))))))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Decoded audio facts: format parameters and the feature string
    * `pcm:<rate>hz:<ch>ch:<bits>bit:rms:<v>` — overall RMS over every
    * sample of every channel, normalized to [0,1] full scale,
    * accumulated in exact longs so the value is identical on any JVM.
    */
  private[graft] case class DecodedAudio(sampleRate: Int, channels: Int,
                                      bitsPerSample: Int, nFrames: Long,
                                      feature: String)

  /** Real audio decode via `javax.sound.sampled` (JDK-only — WAV/AIFF/AU
    * containers, 8/16-bit integer PCM). None when no installed reader
    * claims the bytes or the encoding isn't integer PCM — the caller
    * falls back to [[fingerprint]]. The header probe rejects non-audio
    * payloads in microseconds.
    */
  /** Decoded integer PCM: format facts + every sample as a centered
    * long (8-bit unsigned re-centered at 0) + the full-scale divisor.
    */
  private[mm] case class PcmSamples(sampleRate: Int, channels: Int,
                                    bitsPerSample: Int, nFrames: Long,
                                    samples: Array[Long], fullScale: Double)

  /** Shared PCM extraction for [[decodeAudio]] and
    * [[audioFrameEnergyDecoded]]: JDK container probe + sample decode.
    */
  /** Direct RIFF/WAVE PCM parse — the byte-level container walk
    * [[decodeVideoMeta]] does for MP4, applied to WAV, and here it is
    * a THROUGHPUT fix, not a convenience: `AudioSystem
    * .getAudioInputStream` funnels every call through the JVM-global
    * SPI provider registry, whose lock serializes ALL decode threads
    * in the JVM — measured on this box: 32 threads doing 32x the
    * decodes take 19x the single-thread wall (flat throughput, plus
    * contention overhead), so a 16-core executor decodes audio no
    * faster than 1 core. Chunk walk per the RIFF spec (u32le sizes,
    * odd sizes padded to even); accepts plain-PCM `fmt ` (tag 1,
    * 8/16-bit); anything else — AIFF, AU, float WAV, extensible —
    * falls back to the AudioSystem path below.
    */
  private def parseWavPcm(payload: Array[Byte]): Option[PcmSamples] = {
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, len
    while (pos + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(pos)
      val len = u32(pos + 4)
      if (len < 0 || pos + 8 + len > payload.length) return None
      val body = pos + 8
      if (id == "fmt " && len >= 16)
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
      else if (id == "data")
        data = Some((body, len.toInt))
      pos = body + len.toInt + (len.toInt & 1) // odd chunks pad to even
    }
    (fmt, data) match {
      case (Some((1, ch, rate, bits)), Some((off, dlen)))
          if (bits == 8 || bits == 16) && ch >= 1 && rate > 0 =>
        val bytesPerSample = bits / 8
        val n = dlen / bytesPerSample
        if (n == 0) None
        else {
          val out = new Array[Long](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (bits == 8) (payload(off + i) & 0xff).toLong - 128L
              else {
                val o = off + i * 2
                (((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff))
                  .toShort.toLong
              }
            i += 1
          }
          Some(PcmSamples(rate, ch, bits, n.toLong / ch, out,
            if (bits == 8) 128.0 else 32768.0))
        }
      case _ => None
    }
  }

  private[mm] def pcmSamples(payload: Array[Byte]): Option[PcmSamples] =
    parseWavPcm(payload).orElse(try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!(signed || unsigned) || (bits != 8 && bits != 16) ||
          ais.getFrameLength <= 0) None
        else {
          val bytes = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val n = bytes.length / bytesPerSample
          val out = new Array[Long](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (bits == 8) {
                if (signed) bytes(i).toLong
                else (bytes(i) & 0xff).toLong - 128L
              } else {
                val off = i * 2
                val lo = bytes(off) & 0xff
                val hi = bytes(off + 1) & 0xff
                val raw = if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo
                if (signed) raw.toShort.toLong else raw.toLong - 32768L
              }
            i += 1
          }
          Some(PcmSamples(fmt.getSampleRate.toInt, fmt.getChannels, bits,
            ais.getFrameLength, out, if (bits == 8) 128.0 else 32768.0))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None })

  private[graft] def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] =
    pcmSamples(payload).map { p =>
      // Σ s² in exact longs: |s| ≤ 2^15 so n·s² overflows long only
      // past 2^33 samples per payload — far beyond a row's bytes
      var sumSq = 0L
      var i = 0
      while (i < p.samples.length) { sumSq += p.samples(i) * p.samples(i); i += 1 }
      val rms = math.sqrt(sumSq.toDouble / p.samples.length) / p.fullScale
      DecodedAudio(p.sampleRate, p.channels, p.bitsPerSample, p.nFrames,
        s"pcm:${p.sampleRate}hz:${p.channels}ch:${p.bitsPerSample}bit:rms:" +
          String.format(java.util.Locale.ROOT, "%.6f", Double.box(rms)))
    }

  /** Parsed video-container facts: presentation duration and the video
    * track's pixel dimensions, read from the container structure.
    */
  private[graft] case class DecodedVideo(durationMs: Long, width: Int,
                                         height: Int, feature: String)

  /** Real video-CONTAINER parse: ISO-BMFF (MP4/MOV) box structure —
    * pure byte scanning, no codec required, so it is JDK-only like the
    * image/audio decoders. Walks top-level boxes (u32 size + fourcc,
    * size 1 ⇒ u64 largesize, size 0 ⇒ to-EOF), requires a leading
    * `ftyp` (rejects non-MP4 payloads in nanoseconds), then inside
    * `moov` reads `mvhd` (timescale + duration → presentation ms) and
    * the first `trak`/`tkhd` with a nonzero width (the video track;
    * audio tracks carry 0×0) for 16.16-fixed pixel dimensions.
    * Version 0 and 1 boxes both handled. None on any malformed/
    * truncated structure — the caller falls back to [[fingerprint]].
    * FRAME decode stays out of scope (no JDK video codec); this gives
    * the metadata a video curation pass actually gates on (duration,
    * resolution) from the real bytes instead of trusting row metadata.
    */
  private[graft] def decodeVideoMeta(payload: Array[Byte]): Option[DecodedVideo] =
    try {
      val n = payload.length
      def u16(o: Int): Int = ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
      def u32(o: Int): Long =
        ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
          ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
      def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
      def fourcc(o: Int): String =
        new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // walk boxes in [from, until); returns (contentStart, contentEnd)
      // of the first box with the wanted type, or None
      def findBox(from: Int, until: Int, want: String): Option[(Int, Int)] = {
        var off = from
        while (off + 8 <= until) {
          val size0 = u32(off)
          val typ = fourcc(off + 4)
          val (hdr, size): (Int, Long) =
            if (size0 == 1L) { if (off + 16 > until) return None; (16, u64(off + 8)) }
            else if (size0 == 0L) (8, (until - off).toLong)
            else (8, size0)
          // bound check as `size > until - off` (Int RHS): the naive
          // `off + size > until` overflows the Long add for adversarial
          // u64 sizes near Long.MaxValue and lets garbage through
          if (size < hdr || size > until - off) return None
          if (typ == want) return Some((off + hdr, (off + size).toInt))
          off += size.toInt
        }
        None
      }
      if (n < 16 || u32(0) < 8 || fourcc(4) != "ftyp") None
      else findBox(0, n, "moov").flatMap { case (ms, me) =>
        findBox(ms, me, "mvhd").flatMap { case (hs, _) =>
          val ver = payload(hs) & 0xff
          val (timescale, duration) =
            if (ver == 1) (u32(hs + 20), u64(hs + 24))
            else (u32(hs + 12), u32(hs + 16))
          // u64 mvhd durations above Long.MaxValue/1000 would overflow
          // the ms scaling into garbage (possibly negative) — reject the
          // payload as malformed rather than emit a wrong decoded 'fact'
          if (timescale <= 0 || duration < 0 ||
            duration > Long.MaxValue / 1000L) None
          else {
            val durMs = duration * 1000L / timescale
            // first trak whose tkhd has nonzero width = the video track
            var trakFrom = ms
            var dims: Option[(Int, Int)] = None
            var continue = true
            while (continue && dims.isEmpty) {
              findBox(trakFrom, me, "trak") match {
                case None => continue = false
                case Some((ts, te)) =>
                  findBox(ts, te, "tkhd").foreach { case (ks, ke) =>
                    val kv = payload(ks) & 0xff
                    val wOff = ks + (if (kv == 1) 88 else 76)
                    if (wOff + 8 <= ke) {
                      val w = (u32(wOff) >> 16).toInt
                      val h = (u32(wOff + 4) >> 16).toInt
                      if (w > 0 && h > 0) dims = Some((w, h))
                    }
                  }
                  trakFrom = te
              }
            }
            val (w, h) = dims.getOrElse((0, 0))
            val res = if (dims.isDefined) s":${w}x$h" else ""
            Some(DecodedVideo(durMs, w, h, s"mp4:${durMs}ms$res"))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-batched feature extraction: the decoder is invoked once
    * per partition iterator (the batch shape a native decoder wants),
    * never per-row on the driver. Image rows whose payload decodes get
    * DECODER-derived width/height and the mean-luma feature; audio rows
    * whose payload is a real PCM container get format + full-scale-RMS
    * facts from the DECODED samples; video rows whose payload is a real
    * ISO-BMFF container get duration + video-track dimensions parsed
    * from the bytes; anything else keeps the metadata dimensions and
    * the md5 fingerprint.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      // per-partition setup cost (decoder init) amortized here; the
      // ImageIO plugin registry scan happens once per JVM, not per row
      rows.map { r =>
        val decoded = r.media_type match {
          case "image" => decodeImage(r.payload)
          case "audio" => decodeAudio(r.payload).map(a =>
            // width/height are image facts — metadata passes through;
            // the decoded format + RMS ride the feature string
            DecodedImage(r.width, r.height, a.feature))
          case "video" => decodeVideoMeta(r.payload).map(v =>
            // container-parsed dimensions when the video track carries
            // them; duration rides the feature string
            DecodedImage(if (v.width > 0) v.width else r.width,
              if (v.height > 0) v.height else r.height, v.feature))
          case _ => None
        }
        decoded match {
          case Some(d) =>
            MediaFeature(r.doc_id, r.media_type, r.payload.length,
              d.width, d.height, d.feature)
          case None =>
            MediaFeature(r.doc_id, r.media_type, r.payload.length,
              r.width, r.height, fingerprint(r.payload))
        }
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

  /** A really-resampled image row: box-fit output dims + re-encoded
    * PNG payload.
    */
  final case class ResizedImage(doc_id: Long, out_w: Int, out_h: Int,
                                payload: Array[Byte])

  /** REAL image resample — executes [[resizePlan]]'s metadata math on
    * actual pixels: decode ([[decodeImage]]'s codec family), box-fit
    * to (maxW, maxH) with the identical floor-division semantics, then
    * NEAREST-NEIGHBOR resample via an explicit integer source map
    * (src = out · in/out, floored) — pure int arithmetic, so the
    * output pixels are bit-identical on any JVM (AffineTransformOp
    * and getScaledInstance interpolate through platform-variable
    * float paths; an LLM-pipeline thumbnail step must not depend on
    * the executor's JVM build). Output re-encodes as PNG (lossless —
    * the pixels survive exactly). Undecodable payloads drop (the
    * caller keeps originals via the id).
    *
    * Same mapPartitions batch shape as [[extractFeatures]] — one
    * decoder init per partition, never a driver loop.
    */
  def resizeImages(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    require(maxW >= 1 && maxH >= 1, s"target box must be positive: ${maxW}x$maxH")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type != "image") None
        else try {
          imageIoMemCache
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // identical box-fit arithmetic to resizePlan (floor division)
            val (ow, oh) =
              if (w.toLong * maxH <= h.toLong * maxW)
                (math.max(1, (w.toLong * maxH / h).toInt), maxH)
              else (maxW, math.max(1, (h.toLong * maxW / w).toInt))
            val out = new java.awt.image.BufferedImage(ow, oh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < oh) {
              val sy = (y.toLong * h / oh).toInt
              var x = 0
              while (x < ow) {
                out.setRGB(x, y, img.getRGB((x.toLong * w / ow).toInt, sy) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            if (!javax.imageio.ImageIO.write(out, "png", baos)) None
            else Some(ResizedImage(r.doc_id, ow, oh, baos.toByteArray))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

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
    *
    * Contract: a ZERO-BYTE payload produces zero frame rows (filtered
    * explicitly — split('','') semantics would otherwise diverge from
    * the oracle engine's: Spark yields [""], DuckDB []).
    */
  def audioFrameEnergy(media: Dataset[MediaRow],
                       frameSamples: Int = 64): DataFrame = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    media.toDF()
      .filter(col("media_type") === "audio")
      .filter(length(col("payload")) > 0)
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

  /** Clipping / loudness statistics over the stub-PCM convention
    * ([[audioFrameEnergy]]'s code-point samples): per doc, sample
    * count, peak amplitude, count and 6dp fraction of samples at or
    * above `clipLevel`, and overall RMS. Clipping (samples pinned at
    * full scale) is the cheap recording-damage gate an audio curation
    * pass runs before spending transcription compute; loudness feeds
    * normalization. One codegen'd fold per payload — sample arrays
    * never explode to rows, zero shuffle.
    */
  def audioClipping(media: Dataset[MediaRow], clipLevel: Int = 250): DataFrame = {
    require(clipLevel > 0, s"clipLevel > 0: $clipLevel")
    media.toDF()
      .filter(col("media_type") === "audio")
      .filter(length(col("payload")) > 0)
      .withColumn("__cs",
        expr("transform(split(CAST(payload AS STRING), ''), c -> ascii(c))"))
      .select(col("doc_id"),
        size(col("__cs")).cast("long").as("n_samples"),
        expr("CAST(array_max(__cs) AS BIGINT)").as("peak"),
        expr(s"aggregate(__cs, 0L, (a, x) -> a + IF(x >= $clipLevel, 1L, 0L))")
          .as("n_clipped"),
        expr("aggregate(__cs, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)")
          .as("__sumsq"))
      .withColumn("clip_frac",
        round(col("n_clipped").cast("double") / col("n_samples"), 6))
      .withColumn("rms",
        round(sqrt(col("__sumsq").cast("double") / col("n_samples")), 6))
      .select("doc_id", "n_samples", "peak", "n_clipped", "clip_frac", "rms")
  }

  /** One clipping-stats row of a really-decoded audio payload. */
  final case class AudioClipRow(doc_id: Long, n_samples: Long, peak: Long,
                                n_clipped: Long, clip_frac: Double, rms: Double)

  /** [[audioClipping]] over DECODED integer PCM (WAV/AIFF/AU):
    * centered samples, clipping at `clipFrac` of full scale
    * (|s| >= clipFrac·FS — both rails count), RMS normalized to
    * [0, 1] full scale. Undecodable payloads drop — the
    * [[audioFrameEnergyDecoded]] contract.
    */
  def audioClippingDecoded(media: Dataset[MediaRow],
                           clipFrac: Double = 0.99): Dataset[AudioClipRow] = {
    require(clipFrac > 0 && clipFrac <= 1, s"clipFrac in (0,1]: $clipFrac")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "audio").flatMap { r =>
        pcmSamples(r.payload).map { p =>
          val clipAt = clipFrac * p.fullScale
          var sumSq = 0L; var peak = 0L; var clipped = 0L
          var j = 0
          while (j < p.samples.length) {
            val s = p.samples(j); val a = math.abs(s)
            sumSq += s * s
            if (a > peak) peak = a
            if (a >= clipAt) clipped += 1
            j += 1
          }
          val n = p.samples.length
          def r6(d: Double) = BigDecimal(d)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          AudioClipRow(r.doc_id, n.toLong, peak, clipped,
            if (n == 0) 0.0 else r6(clipped.toDouble / n),
            if (n == 0) 0.0 else r6(math.sqrt(sumSq.toDouble / n) / p.fullScale))
        }
      }
    }
  }

  /** One frame-energy row of a really-decoded audio payload. */
  final case class AudioFrameRow(doc_id: Long, frame_id: Long,
                                 n_samples: Long, rms: Double)

  /** Voice-activity segmentation over a frame-energy stream
    * ([[audioFrameEnergy]] / [[audioFrameEnergyDecoded]] output) —
    * the silence-trimming gate an audio curation pass runs before
    * transcription: frames with `rms >= threshold` are active,
    * consecutive active frames group into segments (classic
    * gaps-and-islands: island key = frame_id − per-(doc, activity)
    * row number), each segment reports its frame span and 6dp mean
    * RMS (decimal-summed — deterministic on any partitioning).
    *
    * Scale shape: one doc-keyed window + one (doc, island) partial
    * agg + one doc-keyed numbering window — all over FRAME-shaped
    * rows; the samples died inside the energy fold.
    */
  def vadSegments(frames: DataFrame, threshold: Double = 10.0): DataFrame = {
    require(threshold > 0, s"threshold > 0: $threshold")
    val wIsl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("__active")).orderBy("frame_id")
    val wSeg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy("start_frame")
    frames.withColumn("__active", col("rms") >= threshold)
      .withColumn("__isl", col("frame_id") - row_number().over(wIsl))
      .filter(col("__active"))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min("frame_id").as("start_frame"),
        max("frame_id").as("end_frame"),
        count(lit(1)).as("n_frames"),
        round(sum(col("rms").cast("decimal(30,12)")).cast("double") /
          count(lit(1)), 6).as("mean_rms"))
      .select(col("doc_id"),
        (row_number().over(wSeg) - 1).cast("long").as("seg_id"),
        col("start_frame"), col("end_frame"), col("n_frames"),
        col("mean_rms"))
  }

  /** REAL-audio frame energy: [[audioFrameEnergy]]'s frame math over
    * DECODED PCM samples instead of the stub code-point stand-in —
    * the silence/loudness gate as it runs on actual recordings.
    * Payloads the JDK cannot decode as integer PCM drop (the stub
    * variant covers synthetic corpora; this one covers real WAV/AIFF/
    * AU). Identical frame semantics: fixed `frameSamples` windows,
    * ragged tail keeps its true length, RMS = sqrt(Σs²/n) normalized
    * to full scale, 6 dp. Exact long accumulation per frame — the
    * value is identical on any JVM and any partitioning.
    */
  def audioFrameEnergyDecoded(media: Dataset[MediaRow],
                              frameSamples: Int = 64): Dataset[AudioFrameRow] = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media_type == "audio").flatMap { r =>
        pcmSamples(r.payload).toSeq.flatMap { p =>
          p.samples.grouped(frameSamples).zipWithIndex.map { case (f, i) =>
            var sumSq = 0L
            var j = 0
            while (j < f.length) { sumSq += f(j) * f(j); j += 1 }
            val rms = BigDecimal(math.sqrt(sumSq.toDouble / f.length) / p.fullScale)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            AudioFrameRow(r.doc_id, i.toLong, f.length.toLong, rms)
          }
        }
      }
    }
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

  /** Encode solid-gray frames as an animated GIF — the writer half of
    * [[decodeFrames]] (the same role [[graft.sources.Warc.writeRecord]]
    * plays for the WARC walker): each frame carries an EXPLICIT
    * 2-entry indexed palette so no quantization touches the gray value
    * and the decode-side mean luma is exactly g (coefficients sum to
    * 1000). Used by the frame-sampling round-trip entry and specs.
    */
  private[graft] def grayGif(grays: Seq[Int], w: Int, h: Int): Array[Byte] = {
    require(grays.nonEmpty && grays.forall(g => g >= 0 && g <= 255),
      s"gray values in [0,255]: $grays")
    require(w > 0 && h > 0, s"positive dims: ${w}x$h")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(g.toByte, 0.toByte), Array(g.toByte, 0.toByte),
          Array(g.toByte, 0.toByte))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Single-frame GIF with PER-PIXEL grays (row-major, length w*h)
    * against an explicit 256-gray palette — nothing quantizes, so a
    * decoder reading any pixel gets the exact planted value. The
    * per-pixel sibling of [[grayGif]]'s uniform frames; feeds the
    * perceptual-hash oracles, where the hash bits must be derivable
    * from (doc_id, x, y) arithmetic alone.
    */
  private def grayPixelImage(grays: Seq[Int], w: Int, h: Int): java.awt.image.BufferedImage = {
    require(grays.length == w * h, s"need ${w * h} grays, got ${grays.length}")
    require(grays.forall(g => g >= 0 && g <= 255), "gray values in [0,255]")
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    var i = 0
    while (i < grays.length) {
      img.getRaster.setSample(i % w, i / w, 0, grays(i))
      i += 1
    }
    img
  }

  private[graft] def grayPixelGif(grays: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grayPixelImage(grays, w, h), "gif", baos)
    baos.toByteArray
  }

  /** Multi-frame sibling of [[grayPixelGif]]: an animated GIF whose
    * every frame carries exact per-pixel grays — feeds the
    * frame-hash oracles ([[videoNearDups]]).
    */
  private[graft] def grayPixelGifFrames(frames: Seq[Seq[Int]], w: Int,
                                        h: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { g =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(grayPixelImage(g, w, h), null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** 64-bit difference hash (dHash) of a decoded image: grid-sample a
    * 9x8 luma thumbnail (integer midpoint sampling — sx = floor((2x+1)
    * w / 18), sy = floor((2y+1)h / 16); deterministic on any JVM, and
    * the identity map when the input is already 9x8), then one bit per
    * horizontally adjacent pair: bit (y*8+x), MSB first, is set iff
    * luma(x+1,y) > luma(x,y). Lumas compare as exact Rec.601 integer
    * milli-sums — no float anywhere, so the hash is bit-reproducible.
    * None when no reader claims the bytes (same contract as
    * [[decodeImage]]).
    */
  /** The 64-bit dHash of one decoded raster — shared by the
    * single-image and per-frame paths.
    */
  private def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    def lumaMilli(x: Int, y: Int): Long = {
      val rgb = img.getRGB(x, y)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
    }
    val th = Array.tabulate(8, 9) { (y, x) =>
      lumaMilli(((2 * x + 1).toLong * w / 18).toInt,
                ((2 * y + 1).toLong * h / 16).toInt)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (th(y)(x + 1) > th(y)(x)) hash |= 1L << (63 - (y * 8 + x))
        x += 1
      }
      y += 1
    }
    hash
  }

  private[graft] def dhash64(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      imageIoMemCache
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some((img.getWidth, img.getHeight, dhashOf(img)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame dHashes of a multi-frame payload — [[decodeFrames]]'s
    * walk with [[dhashOf]] instead of luma facts; only sampled frames
    * decode. None when no reader claims the bytes.
    */
  private[graft] def dhashFrames(payload: Array[Byte],
                                 step: Int): Option[Seq[(Int, Long)]] = {
    require(step >= 1, s"step >= 1: $step")
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      imageIoMemCache
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n by step).map(i => (i, dhashOf(reader.read(i)))))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  final case class DhashRow(doc_id: Long, width: Int, height: Int,
                            dhash_i64: Long, dhash: String)

  /** Perceptual hashes for an image corpus — the image-side analogue
    * of MinHash signatures: one 64-bit dHash per decodable payload
    * (undecodable payloads drop — same contract as the other decoded
    * variants), as both the raw i64 (for XOR hamming) and the
    * zero-padded 16-hex form (for banding, display, and external
    * audit). Scale shape: the rasters die inside the decode task;
    * only (id, dims, 8-byte hash) rows ever move.
    */
  def dhash(media: Dataset[MediaRow]): Dataset[DhashRow] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        dhash64(r.payload).map { case (w, h, hash) =>
          DhashRow(r.doc_id, w, h, hash,
            String.format("%016x", java.lang.Long.valueOf(hash)))
        }
      }
    }
  }

  /** Near-duplicate image pairs by dHash hamming distance — the image
    * dedup candidate generator (resize/re-encode/small-edit copies
    * land within a few bits of each other): band the 16-hex hash into
    * `maxHamming + 1` equal slices (pigeonhole: two hashes within
    * `maxHamming` bits MUST agree on at least one slice — no missed
    * pairs), self-join per band, then verify the TRUE hamming via
    * `bit_count(a XOR b)`. Results are exact for the banding scheme:
    * the verify step makes the pair set independent of HOW candidates
    * were generated, which is what lets a SQL oracle with the same
    * pigeonhole argument hash-match. `maxHamming + 1` must divide 16
    * (hex-char bands), so maxHamming in {0, 1, 3, 7, 15}; 3 is the
    * usual near-dup radius.
    *
    * Scale shape: the MinHash-LSH accounting — one exchange on the
    * band key (16-byte rows), verified pairs only after the bucket
    * join; no all-pairs product anywhere.
    */
  private def bandWidth(maxHamming: Int): Int = {
    val nBands = maxHamming + 1
    require(nBands > 0 && 16 % nBands == 0,
      s"maxHamming + 1 must divide 16, got $maxHamming")
    16 / nBands
  }

  /** One (id, h, band_idx, band) row per hash per band slice. */
  private def meltBands(hashes: DataFrame, idCol: String,
                        maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val width = bandWidth(maxHamming)
    val bands = (0 until maxHamming + 1).map(i =>
      struct(lit(i).as("band_idx"),
        substring(col("dhash"), i * width + 1, width).as("band")))
    hashes
      .select(col(idCol), col("dhash_i64"), explode(array(bands: _*)).as("b"))
      .select(col(idCol), col("dhash_i64"),
        col("b.band_idx").as("band_idx"), col("b.band").as("band"))
  }

  /** `maxBandDf` (default unlimited, oracle-stable) drops band
    * buckets hotter than the cap before the self-join — the
    * videoNearDups/containmentPairs stopword convention for corpora
    * where one band value (e.g. an all-black stripe) is shared by
    * thousands of images and would mint quadratic candidates.
    */
  def dhashPairs(hashes: DataFrame, maxHamming: Int = 3,
                 idCol: String = "doc_id",
                 maxBandDf: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxBandDf >= 2, s"maxBandDf must be >= 2: $maxBandDf")
    // Materialize the hash frame before the band self-join: both join
    // sides otherwise re-execute the FULL upstream lineage — for a
    // dhash/audioFingerprint input that is the whole corpus DECODE,
    // twice (the r15 soak measured m_audio_dedup at 14.8x for 8x
    // volume from exactly this; with the checkpoint the hash frame —
    // 8 bytes a row — computes once and both sides read it).
    val melted0 = meltBands(hashes.localCheckpoint(false), idCol, maxHamming)
    val melted =
      if (maxBandDf == Int.MaxValue) melted0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band")
        melted0.withColumn("__df", count(lit(1)).over(w))
          .filter(col("__df") <= maxBandDf).drop("__df")
      }
    val a = melted.select(col("band_idx"), col("band"),
      col(idCol).as("doc_a"), col("dhash_i64").as("h_a"))
    val b = melted.select(col("band_idx"), col("band"),
      col(idCol).as("doc_b"), col("dhash_i64").as("h_b"))
    a.join(b, Seq("band_idx", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "h_a", "h_b").distinct()
      .withColumn("hamming",
        expr("bit_count(h_a ^ h_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Incremental image near-dup ingest — the sync engine's
    * fetch-only-the-delta philosophy applied to image dedup (the
    * [[graft.dedup.Dedup.minhashNearDupsDelta]] shape): the standing
    * corpus is a persisted [[dhash]] index ((id, dims, i64, hex)
    * rows — 8 bytes of hash per image, no payloads); a new batch is
    * hashed once, and pairs = batch × index ∪ batch × batch. Index
    * payloads are never re-read or re-decoded; the batch's bands
    * BROADCAST against the index's (the batch is the small side), so
    * the index never shuffles. Same pigeonhole + exact-XOR-verify
    * contract as [[dhashPairs]] — the union of delta results over
    * any ingest order equals the one-shot pair set.
    */
  def dhashPairsDelta(index: DataFrame, newHashes: DataFrame,
                      maxHamming: Int = 3,
                      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions._
    // the batch's hashes feed BOTH the cross join and the in-batch
    // dhashPairs — checkpoint so a lazily-built batch (hash-of-decode
    // lineage) computes once (the dhashPairs rationale)
    val newH = newHashes.localCheckpoint(false)
    val newBands = meltBands(newH, idCol, maxHamming)
      .select(col("band_idx"), col("band"),
        col(idCol).as("__new_id"), col("dhash_i64").as("__new_h"))
    val cross = meltBands(index, idCol, maxHamming)
      .join(broadcast(newBands), Seq("band_idx", "band"))
      .filter(col(idCol) =!= col("__new_id"))
      .select(least(col(idCol), col("__new_id")).as("doc_a"),
        greatest(col(idCol), col("__new_id")).as("doc_b"),
        when(col(idCol) < col("__new_id"), col("dhash_i64"))
          .otherwise(col("__new_h")).as("h_a"),
        when(col(idCol) < col("__new_id"), col("__new_h"))
          .otherwise(col("dhash_i64")).as("h_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
    cross.unionByName(dhashPairs(newH, maxHamming, idCol)).distinct()
  }

  final case class AudioFpRow(doc_id: Long, n_samples: Long, fp_hi: Long,
                              fp_lo: Long, fp: String)

  /** 128-bit acoustic fingerprint of an integer PCM stream — the
    * chromaprint SHAPE (per-window band energies → sign-delta bits)
    * in exact integer DSP, so every bit is bit-reproducible on any
    * JVM and replayable by a SQL oracle (the [[dhashOf]] convention):
    * the clip splits into `nFrames` equal frames (tail remainder
    * dropped); per frame, band b ∈ [0, nBands) carries the
    * lag-difference energy E[b] = Σᵢ (x[i] − x[i−(b+1)])² over the
    * frame — a comb filterbank whose small lags pass the
    * high-frequency end and large lags the low end, i.e. a coarse
    * spectral-energy profile without an FFT; bit(f, b) = E[f][b+1] >
    * E[f][b], MSB-first (bit index f·(nBands−1) + b), exactly dHash's
    * adjacent-comparison rule over an nFrames×nBands "energy image".
    *
    * WHY 128 bits where image dHash is 64: the pigeonhole banding
    * that finds hamming ≤ 3 pairs needs 4 equal band slices, and a
    * 64-bit code leaves 16-bit bands — a 65 536-value space whose
    * birthday collisions mint candidate pairs ≈ N²/2¹⁶ per band as
    * the corpus grows (the r15 soak measured the compounding; exact
    * verify keeps it CORRECT but the join volume is quadratic).
    * 128 bits give 32-bit bands — collision constant 1/2³², so
    * random candidates stay negligible at any realistic corpus.
    * dHash's 64 is fixed by the algorithm; this fingerprint is ours
    * to size.
    *
    * The invariances are the audio-meaningful ones: EXACT under DC
    * offset (differences cancel the bias — re-centered transfers
    * hash identically), order-preserving under amplitude scaling
    * (every E scales by c², so bits survive re-leveled/re-encoded
    * copies up to rounding near energy ties), and local edits
    * perturb only their own frame's 7 bits. `nFrames·(nBands−1)`
    * must equal 128.
    *
    * Overflow-safe by construction: |diff| < 2¹⁷ for 16-bit PCM, so
    * a frame of < 2²⁹ samples keeps Σ diff² below 2⁶³.
    */
  private[graft] def audioFp128(samples: Array[Long], nFrames: Int = 16,
                                nBands: Int = 9): Option[(Long, Long)] = {
    require(nFrames * (nBands - 1) == 128,
      s"nFrames*(nBands-1) must be 128: $nFrames x ($nBands-1)")
    val frameLen = samples.length / nFrames
    if (frameLen <= nBands) None
    else {
      var hi = 0L
      var lo = 0L
      var f = 0
      while (f < nFrames) {
        val from = f * frameLen
        val e = new Array[Long](nBands)
        var b = 0
        while (b < nBands) {
          val lag = b + 1
          var s = 0L
          var i = from + lag
          val until = from + frameLen
          while (i < until) {
            val d = samples(i) - samples(i - lag)
            s += d * d
            i += 1
          }
          e(b) = s
          b += 1
        }
        var c = 0
        while (c < nBands - 1) {
          if (e(c + 1) > e(c)) {
            val idx = f * (nBands - 1) + c
            if (idx < 64) hi |= 1L << (63 - idx)
            else lo |= 1L << (127 - idx)
          }
          c += 1
        }
        f += 1
      }
      Some((hi, lo))
    }
  }

  /** Acoustic fingerprints for an audio corpus — the audio-side
    * analogue of [[dhash]]: one 128-bit [[audioFp128]] per REALLY-
    * decoded payload (undecodable or too-short clips drop), as two
    * raw i64 words + the zero-padded 32-hex form. Scale shape
    * identical to dhash: PCM arrays die inside the decode task; only
    * (id, count, 16-byte fingerprint) rows ever move.
    */
  def audioFingerprint(media: Dataset[MediaRow], nFrames: Int = 16,
                       nBands: Int = 9): Dataset[AudioFpRow] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        pcmSamples(r.payload).flatMap { p =>
          audioFp128(p.samples, nFrames, nBands).map { case (hi, lo) =>
            AudioFpRow(r.doc_id, p.samples.length.toLong, hi, lo,
              String.format("%016x%016x",
                java.lang.Long.valueOf(hi), java.lang.Long.valueOf(lo)))
          }
        }
      }
    }
  }

  /** One (id, hi, lo, band_idx, band) row per fingerprint per 32-hex
    * band slice — [[meltBands]] for the 128-bit audio code.
    */
  private def meltAudioBands(fps: DataFrame, idCol: String,
                             maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    require(nBands > 0 && 32 % nBands == 0,
      s"maxHamming + 1 must divide 32, got $maxHamming")
    val width = 32 / nBands
    val bands = (0 until nBands).map(i =>
      struct(lit(i).as("band_idx"),
        substring(col("fp"), i * width + 1, width).as("band")))
    // keep every input column (windowed callers thread window_idx)
    fps
      .withColumn("__b", explode(array(bands: _*)))
      .withColumn("band_idx", col("__b.band_idx"))
      .withColumn("band", col("__b.band"))
      .drop("__b")
  }

  /** Near-duplicate audio pairs by fingerprint hamming distance —
    * completes the multimodal near-dup matrix (text MinHash, image
    * dHash, video frame-hash sets, AUDIO [[audioFp128]]): re-leveled /
    * DC-shifted / lightly-edited copies land within a few bits, and
    * candidates come from the [[dhashPairs]] pigeonhole scheme over
    * 32-bit band slices (two fingerprints within `maxHamming` bits
    * MUST agree on one of the `maxHamming + 1` slices — no missed
    * pairs) with the true hamming verified as the two-word XOR
    * popcount sum. Same one-exchange accounting as dhashPairs; the
    * 32-bit band space keeps random bucket collisions — and with
    * them the candidate join — linear in the corpus.
    */
  def audioNearDups(media: Dataset[MediaRow], maxHamming: Int = 3,
                    nFrames: Int = 16, nBands: Int = 9): DataFrame =
    audioPairsOf(audioFingerprint(media, nFrames, nBands).toDF(),
      maxHamming, "doc_id")

  private def audioPairsOf(fps: DataFrame, maxHamming: Int,
                           idCol: String): DataFrame = {
    // checkpoint before the self-join — both sides would otherwise
    // re-execute the full decode lineage (the dhashPairs rationale)
    val melted = meltAudioBands(fps.localCheckpoint(false), idCol, maxHamming)
    val a = melted.select(col("band_idx"), col("band"),
      col(idCol).as("doc_a"), col("fp_hi").as("hi_a"), col("fp_lo").as("lo_a"))
    val b = melted.select(col("band_idx"), col("band"),
      col(idCol).as("doc_b"), col("fp_hi").as("hi_b"), col("fp_lo").as("lo_b"))
    a.join(b, Seq("band_idx", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .withColumn("hamming",
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Incremental audio near-dup ingest — the [[dhashPairsDelta]]
    * contract over [[audioFingerprint]] rows: the standing index is
    * (id, count, fingerprint) rows (16 bytes of hash per clip,
    * payloads never re-decoded); a new batch fingerprints once;
    * pairs = batch×index ∪ batch×batch with the batch's bands
    * broadcast — the index never shuffles. Union of delta results
    * over any ingest order == the one-shot pair set.
    */
  def audioNearDupsDelta(index: DataFrame, newFps: DataFrame,
                         maxHamming: Int = 3,
                         idCol: String = "doc_id"): DataFrame = {
    val newH = newFps.localCheckpoint(false)
    val newBands = meltAudioBands(newH, idCol, maxHamming)
      .select(col("band_idx"), col("band"), col(idCol).as("__new_id"),
        col("fp_hi").as("__new_hi"), col("fp_lo").as("__new_lo"))
    val cross = meltAudioBands(index, idCol, maxHamming)
      .join(broadcast(newBands), Seq("band_idx", "band"))
      .filter(col(idCol) =!= col("__new_id"))
      .select(least(col(idCol), col("__new_id")).as("doc_a"),
        greatest(col(idCol), col("__new_id")).as("doc_b"),
        when(col(idCol) < col("__new_id"), col("fp_hi"))
          .otherwise(col("__new_hi")).as("hi_a"),
        when(col(idCol) < col("__new_id"), col("fp_lo"))
          .otherwise(col("__new_lo")).as("lo_a"),
        when(col(idCol) < col("__new_id"), col("__new_hi"))
          .otherwise(col("fp_hi")).as("hi_b"),
        when(col(idCol) < col("__new_id"), col("__new_lo"))
          .otherwise(col("fp_lo")).as("lo_b"))
      .distinct()
      .withColumn("hamming",
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
    cross.unionByName(audioPairsOf(newH, maxHamming, idCol)).distinct()
  }

  final case class AudioFpWindowRow(doc_id: Long, window_idx: Long,
                                    fp_hi: Long, fp_lo: Long, fp: String)

  /** Per-WINDOW fingerprints for long audio — the [[frameHashes]]
    * analogue on a 1-D signal: the decoded PCM splits into fixed
    * windows of `windowSamples` advancing by `hop` (default:
    * non-overlapping), one [[audioFp128]] per complete window (the
    * ragged tail drops, windows too short for the lag bank drop).
    * Whole-clip fingerprints break when a long recording is trimmed
    * or spliced; window fingerprints survive because untouched
    * windows still hash within a few bits.
    */
  def audioFingerprintWindows(media: Dataset[MediaRow],
                              windowSamples: Int = 4096, hop: Int = 0,
                              nFrames: Int = 16, nBands: Int = 9)
      : Dataset[AudioFpWindowRow] = {
    require(windowSamples > nFrames * nBands,
      s"windowSamples too small for the lag bank: $windowSamples")
    val step = if (hop <= 0) windowSamples else hop
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        pcmSamples(r.payload).toSeq.flatMap { p =>
          Iterator.from(0).map(_ * step)
            .takeWhile(_ + windowSamples <= p.samples.length)
            .zipWithIndex.flatMap { case (off, wi) =>
              audioFp128(java.util.Arrays.copyOfRange(
                p.samples, off, off + windowSamples), nFrames, nBands)
                .map { case (hi, lo) =>
                  AudioFpWindowRow(r.doc_id, wi.toLong, hi, lo,
                    String.format("%016x%016x",
                      java.lang.Long.valueOf(hi), java.lang.Long.valueOf(lo)))
                }
            }.toSeq
        }
      }
    }
  }

  /** Long-audio near-dup by WINDOW-fingerprint overlap — the
    * [[videoNearDups]] contract with hamming tolerance: candidate
    * window pairs come from the [[audioNearDups]] banding (pigeonhole
    * over 32-bit slices), verify is the exact two-word popcount, and
    * doc pairs aggregate matched-window counts plus the matched
    * FRACTION of each side's windows (a trimmed copy matches a high
    * fraction of the SHORTER side). Same-doc matches are excluded;
    * output: (doc_a, doc_b, n_window_pairs, frac_a, frac_b), filtered
    * to `minFrac` on the smaller side's fraction.
    *
    * Scale shape: one exchange on the band key over WINDOW-shaped
    * rows (16 bytes a window), candidate-bounded verify, counts-only
    * aggregation — payloads decode once and die in the task.
    */
  def audioNearDupsWindowed(media: Dataset[MediaRow], maxHamming: Int = 3,
                            windowSamples: Int = 4096, hop: Int = 0,
                            minFrac: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.functions._
    val fps = audioFingerprintWindows(media, windowSamples, hop).toDF()
      .localCheckpoint(false)
    val counts = fps.groupBy("doc_id").agg(count(lit(1)).as("n_win"))
    val melted = meltAudioBands(
      fps.select(col("doc_id"), col("window_idx"), col("fp_hi"),
        col("fp_lo"), col("fp")), "doc_id", maxHamming)
      .select(col("doc_id"), col("window_idx"), col("fp_hi"),
        col("fp_lo"), col("band_idx"), col("band"))
    val a = melted.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_a"), col("window_idx").as("win_a"),
      col("fp_hi").as("hi_a"), col("fp_lo").as("lo_a"))
    val b = melted.select(col("band_idx"), col("band"),
      col("doc_id").as("doc_b"), col("window_idx").as("win_b"),
      col("fp_hi").as("hi_b"), col("fp_lo").as("lo_b"))
    val winPairs = a.join(b, Seq("band_idx", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "win_a", "hi_a", "lo_a",
        "doc_b", "win_b", "hi_b", "lo_b").distinct()
      .withColumn("hamming",
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .cast("int"))
      .filter(col("hamming") <= maxHamming)
    winPairs
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_window_pairs"),
        countDistinct(col("win_a")).as("__ma"),
        countDistinct(col("win_b")).as("__mb"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_win").as("__na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_win").as("__nb")), "doc_b")
      .withColumn("frac_a", round(col("__ma") / col("__na"), 6))
      .withColumn("frac_b", round(col("__mb") / col("__nb"), 6))
      .filter(greatest(col("frac_a"), col("frac_b")) >= minFrac)
      .select("doc_a", "doc_b", "n_window_pairs", "frac_a", "frac_b")
  }

  /** Minimal RIFF/WAVE encode of unsigned 8-bit mono PCM — the audio
    * twin of [[grayPixelGif]]: a REAL container the JDK audio stack
    * decodes back byte-exactly, so specs and oracle queries can plant
    * arithmetic-derived sample streams behind a genuine decode step.
    */
  private[graft] def pcmWavU8(samples: Seq[Int], sampleRate: Int = 8000): Array[Byte] = {
    val n = samples.length
    val out = new java.io.ByteArrayOutputStream(44 + n)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    // RIFF requires odd chunks padded to even; data-chunk size stays
    // n, the pad byte counts toward the enclosing RIFF size
    val pad = n % 2
    ascii("RIFF"); u32(36L + n + pad); ascii("WAVE")
    ascii("fmt "); u32(16L); u16(1); u16(1) // PCM, mono
    u32(sampleRate.toLong); u32(sampleRate.toLong) // byte rate = rate (8-bit mono)
    u16(1); u16(8) // block align, bits
    ascii("data"); u32(n.toLong)
    samples.foreach { s =>
      require(s >= 0 && s <= 255, s"u8 sample out of range: $s")
      out.write(s)
    }
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  final case class FrameHashRow(doc_id: Long, frame_idx: Long, fhash: Long)

  /** Per-frame dHash rows for a video corpus — the frame-level
    * fingerprints behind [[videoNearDups]]. Only every `step`-th
    * frame decodes; undecodable payloads drop. Rasters die inside
    * the decode task — (id, idx, 8-byte hash) rows are all that move.
    */
  def frameHashes(media: Dataset[MediaRow], step: Int = 1): Dataset[FrameHashRow] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        dhashFrames(r.payload, step).toSeq.flatMap(_.map { case (i, h) =>
          FrameHashRow(r.doc_id, i.toLong, h)
        })
      }
    }
  }

  /** Video near-duplicate pairs by FRAME-HASH SET overlap — the
    * re-upload / re-edit detector (trimmed intros, appended outros,
    * re-encodes: the surviving frames hash identically, so overlap
    * over per-doc frame-hash SETS is the cheap video dedup signal):
    * candidates = docs sharing at least one frame hash (equi-join on
    * the 8-byte hash — never rasters), verified by exact set jaccard
    * >= `threshold`, reported with the shared count. A doc whose
    * every frame is unique pairs with nothing and never leaves its
    * bucket.
    *
    * Scale shape: the MinHash-LSH accounting again — one exchange on
    * the frame hash, per-bucket combination generation, verify joins
    * bounded by candidates. A frame shared by MANY docs (a standard
    * intro card, a black frame) is a stopword, not a signal:
    * `maxFrameDf` caps the bucket size for CANDIDATE generation
    * (the containmentPairs `maxShingleDf` convention — same default),
    * so a frame hash shared by N docs can never mint N²/2 candidates;
    * the verify step stays exact over the FULL frame-hash sets, so
    * any pair that also shares a sub-cap frame is still found with
    * its true jaccard.
    */
  def videoNearDups(media: Dataset[MediaRow], threshold: Double,
                    step: Int = 1, maxFrameDf: Int = 100): DataFrame = {
    import org.apache.spark.sql.functions._
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    require(maxFrameDf >= 2, s"maxFrameDf must be >= 2: $maxFrameDf")
    // checkpoint: `sets` feeds both the bucket derivation and the
    // verify join — without it the per-frame DECODE lineage executes
    // twice (the dhashPairs rationale)
    val sets = frameHashes(media, step).toDF()
      .groupBy("doc_id").agg(collect_set(col("fhash")).as("hs"))
      .localCheckpoint(false)
    val buckets = sets.select(col("doc_id"), explode(col("hs")).as("k"))
    val pairs = buckets.groupBy("k")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxFrameDf)
      .withColumn("ids", array_sort(col("ids")))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin))
        .as("p"))
      .select("p.doc_a", "p.doc_b").distinct()
    val melted = pairs.select(col("doc_a"), col("doc_b"),
      explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
    sets.join(melted, "doc_id")
      .groupBy("doc_a", "doc_b")
      .agg(max(when(col("doc_id") === col("doc_a"), col("hs"))).as("hs_a"),
           max(when(col("doc_id") === col("doc_b"), col("hs"))).as("hs_b"))
      .withColumn("n_shared",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jaccard", round(col("n_shared").cast("double") /
        size(array_union(col("hs_a"), col("hs_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_shared", "jaccard")
  }

  final case class VideoFrameRow(doc_id: Long, frame_idx: Long,
                                 n_frames: Long, width: Int, height: Int,
                                 feature: String)

  /** Shot-boundary detection over decoded frames — scene segmentation
    * for video curation (sample one frame per SHOT instead of one per
    * time step): a boundary is frame 0 or a mean-luma jump >=
    * `threshold` against the previous frame, `shot_id` numbers the
    * segments from 0. The luma-delta rule is the classic cheap cut
    * detector; a histogram or embedding delta slots into the same
    * window shape. Frames whose feature is not a decoded-pixel fact
    * (md5 fallbacks of undecodable payloads) drop — there is no luma
    * to compare.
    *
    * Scale shape: one doc-keyed window exchange over FRAME-shaped
    * rows — the rasters died inside the decode task
    * ([[frameSampleDecoded]]); only per-frame facts shuffle.
    */
  def shotBoundaries(frames: DataFrame, threshold: Double = 30.0): DataFrame = {
    require(threshold > 0, s"threshold > 0: $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    val luma = when(col("feature").startsWith("luma:"),
      col("feature").substr(lit(6), lit(Int.MaxValue)).cast("double"))
    frames.withColumn("__luma", luma).filter(col("__luma").isNotNull)
      .withColumn("__delta", col("__luma") - lag(col("__luma"), 1).over(w))
      .withColumn("is_boundary",
        col("__delta").isNull || abs(col("__delta")) >= threshold)
      .withColumn("shot_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L)).over(w) - 1)
      .select(col("doc_id"), col("frame_idx"), col("__luma").as("luma"),
        col("is_boundary"), col("shot_id"))
  }

  /** REALLY-decoded frame sampling — the execution half of
    * [[frameSampleOffsets]]'s plan, the way [[audioFrameEnergyDecoded]]
    * executes [[audioFrameEnergy]]'s frame math over real PCM: decode
    * every `step`-th frame of each multi-frame payload (animated GIF —
    * the one multi-frame format with a JDK codec; MP4 frame decode has
    * none, which is exactly why [[decodeVideoMeta]] stops at container
    * metadata) and emit per-frame pixel facts. Payloads no reader
    * claims are dropped — same contract as the other decoded variants.
    * Same mapPartitions batch shape; a real video decoder slots into
    * [[decodeFrames]] with no plumbing changes.
    */
  def frameSampleDecoded(media: Dataset[MediaRow],
                         step: Int = 1): Dataset[VideoFrameRow] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeFrames(r.payload, step).toSeq.flatMap { case (n, frames) =>
          frames.map { case (i, f) =>
            VideoFrameRow(r.doc_id, i.toLong, n.toLong, f.width, f.height,
              f.feature)
          }
        }
      }
    }
  }
}

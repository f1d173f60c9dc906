package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{HashKernels, TopKBuffer}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks for the pure kernels (no Spark session). */
object KernelProperties extends Properties("graft.kernels") {

  private val scoreIdGen = Gen.listOf(Gen.zip(
    Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L)))

  property("TopKBuffer == sort-take reference, any insertion order") =
    forAll(scoreIdGen, Gen.chooseNum(1, 10)) { (pairs, k) =>
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, id) => buf.add(s, id) }
      val wantDup = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
      buf.sorted == wantDup
    }

  property("TopKBuffer merge == single-buffer over concatenation") =
    forAll(scoreIdGen, scoreIdGen, Gen.chooseNum(1, 8)) { (a, b, k) =>
      val b1 = new TopKBuffer(k); a.foreach { case (s, id) => b1.add(s, id) }
      val b2 = new TopKBuffer(k); b.foreach { case (s, id) => b2.add(s, id) }
      b1.addAll(b2)
      val ref = new TopKBuffer(k); (a ++ b).foreach { case (s, id) => ref.add(s, id) }
      b1.sorted == ref.sorted
    }

  property("rollingHash: incremental append law h(s+c) = h(s)*B + c") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableChar) { (s, c) =>
      val h = HashKernels.rollingHash(UTF8String.fromString(s))
      val h2 = HashKernels.rollingHash(UTF8String.fromString(s + c))
      h2 == h * 1000003L + (c.toByte & 0xff)
    }

  property("nfc kernel: idempotent, identity on ASCII, matches java.text reference") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar,
      Gen.oneOf('e', 'a', 'o', 'n'),
      Gen.oneOf('̀', '́', '̂', '̃'),
      Gen.oneOf('é', 'à', '中')))) { chars =>
      val s = chars.mkString
      val got = graft.functions.UnicodeKernels.nfc(UTF8String.fromString(s)).toString
      val ref = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val again = graft.functions.UnicodeKernels.nfc(UTF8String.fromString(got)).toString
      got == ref && again == got &&
        (!s.forall(_ < 128) || got == s)
    }

  property("simhash64: permutation-invariant over token multisets") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr)) { tokens =>
      def sig(ts: Seq[String]): Long = HashKernels.simhash64(
        ArrayData.toArrayData(ts.map(UTF8String.fromString).toArray))
      sig(tokens) == sig(scala.util.Random.shuffle(tokens))
    }

  property("dot kernel == left fold") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)),
           Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))) { (a, b) =>
      val got = graft.functions.VectorKernels.dot(
        ArrayData.toArrayData(a.toArray),
        ArrayData.toArrayData(b.toArray))
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      got == want
    }

  // ---- exact sequential LTTB kernel invariants ----------------------

  private val seriesGen = for {
    n <- Gen.chooseNum(3, 300)
    ys <- Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))
  } yield ys.toArray

  // word lists may contain EMPTY words (consecutive spaces in the
  // joined text) — the byte-range kernels must agree with Spark's
  // split(' ') semantics on those boundaries too
  private val wordsGen =
    Gen.listOf(Gen.listOf(Gen.alphaNumChar).map(_.mkString))

  private def splitWords(text: String): Seq[String] =
    text.split(" ", -1).toSeq // "" → Seq("") — matches Spark split

  property("gramRollingHashes == rollingHash over clamped word k-grams") =
    forAll(wordsGen, Gen.chooseNum(2, 5)) { (ws, k) =>
      val text = ws.mkString(" ")
      val words = splitWords(text)
      val nGrams = math.max(words.length - k, 0) + 1
      val want = (0 until nGrams).map { i =>
        val gram = words.slice(i, math.min(i + k, words.length)).mkString(" ")
        HashKernels.rollingHash(UTF8String.fromString(gram))
      }
      HashKernels.gramRollingHashes(UTF8String.fromString(text), k)
        .toLongArray().toSeq == want
    }

  property("gramHashes == first-occurrence-distinct xxhash64 of clamped gram bytes") =
    forAll(wordsGen, Gen.chooseNum(2, 4)) { (ws, k) =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val text = ws.mkString(" ")
      val words = splitWords(text)
      val nGrams = math.max(words.length - k, 0) + 1
      val want = (0 until nGrams).map { i =>
        val b = words.slice(i, math.min(i + k, words.length)).mkString(" ")
          .getBytes("UTF-8")
        XXH64.hashUnsafeBytes(b,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }.distinct
      HashKernels.gramHashes(UTF8String.fromString(text), k)
        .toLongArray().toSeq == want
    }

  property("gramStrings == sliding word n-gram join; none for short docs") =
    forAll(wordsGen, Gen.chooseNum(2, 4)) { (ws, n) =>
      val text = ws.mkString(" ")
      val words = splitWords(text)
      val want =
        if (words.length >= n)
          (0 to words.length - n).map(i => words.slice(i, i + n).mkString(" "))
        else Seq.empty[String]
      HashKernels.gramStrings(UTF8String.fromString(text), n)
        .array.map(_.toString).toSeq == want
    }

  property("regroupWords: every Nth space becomes a newline, bytes otherwise untouched") =
    forAll(wordsGen, Gen.chooseNum(1, 4)) { (ws, every) =>
      val text = ws.mkString(" ")
      var cnt = 0
      val want = text.map {
        case ' ' => cnt += 1; if (cnt % every == 0) '\n' else ' '
        case c   => c
      }.mkString
      HashKernels.regroupWords(UTF8String.fromString(text), every)
        .toString == want
    }

  property("windowMinDistinct == first-occurrence-distinct window minima") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)),
           Gen.chooseNum(1, 6)) { (xs, w) =>
      val nWin = math.max(xs.length - w, 0) + 1
      val want = (0 until nWin)
        .map(j => xs.slice(j, math.min(j + w, xs.length)).min).distinct
      HashKernels.windowMinDistinct(
        ArrayData.toArrayData(xs.toArray), w).toLongArray().toSeq == want
    }

  property("winnowSelect == rightmost-tie min 'pos:hash' selections") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 8L)), // tiny range forces ties
           Gen.chooseNum(1, 5)) { (xs, w) =>
      val nWin = math.max(xs.length - w, 0) + 1
      val want = (0 until nWin).map { j =>
        val end = math.min(j + w, xs.length)
        var mn = Long.MaxValue; var pos = -1
        (j until end).foreach { i => if (xs(i) <= mn) { mn = xs(i); pos = i } }
        f"$pos%08d:$mn"
      }.distinct
      HashKernels.winnowSelect(ArrayData.toArrayData(xs.toArray), w)
        .array.map(_.toString).toSeq == want
    }

  property("windowMinDistinct/winnowSelect on an empty array yield empty (no sentinel)") =
    forAll(Gen.chooseNum(1, 6)) { w =>
      HashKernels.windowMinDistinct(
        ArrayData.toArrayData(Array.empty[Long]), w).numElements() == 0 &&
      HashKernels.winnowSelect(
        ArrayData.toArrayData(Array.empty[Long]), w).numElements() == 0
    }

  property("lttbIndices: size == min(threshold, n); endpoints kept; strictly increasing") =
    forAll(seriesGen, Gen.chooseNum(3, 50)) { (ys, thr) =>
      val xs = Array.tabulate(ys.length)(_.toDouble)
      val idx = graft.ops.Lttb.lttbIndices(xs, ys, thr)
      val expectedLen = if (thr >= ys.length) ys.length else thr
      Prop(idx.length == expectedLen) :| s"len ${idx.length} != $expectedLen" &&
        Prop(idx.head == 0 && idx.last == ys.length - 1) :| "endpoints" &&
        Prop(idx.zip(idx.tail).forall { case (a, b) => a < b }) :| "monotone"
    }

  property("misraGries: survivors cover every item with count > n/capacity") =
    forAll(Gen.listOf(Gen.chooseNum(0, 30).map(i => s"t$i")),
      Gen.chooseNum(1, 12)) { (tokens, cap) =>
      val survivors = graft.ops.HeavyHitters.misraGries(tokens.iterator, cap).toSet
      val counts = tokens.groupBy(identity).view.mapValues(_.size).toMap
      val mustKeep = counts.filter { case (_, c) => c * cap > tokens.size }.keySet
      survivors.size <= cap && mustKeep.subsetOf(survivors)
    }

  property("lttbIndices: the global max and min of a spiky series survive") =
    forAll(Gen.chooseNum(30, 200), Gen.chooseNum(5, 25)) { (n, thr) =>
      val xs = Array.tabulate(n)(_.toDouble)
      val ys = xs.map(x => math.sin(x / 3) * 10)
      val hi = n / 3
      val lo = 2 * n / 3
      ys(hi) = 10000.0
      ys(lo) = -10000.0
      val kept = graft.ops.Lttb.lttbIndices(xs, ys, thr).toSet
      // a spike dominates every triangle in its bucket; with >= 5
      // interior buckets both extremes must be selected
      thr < 7 || (kept.contains(hi) && kept.contains(lo))
    }

  // decodeVideoMeta is a byte parser over untrusted input — fuzz it:
  // arbitrary bytes must never throw, and only structurally valid
  // ISO-BMFF (leading ftyp) may parse
  property("decodeVideoMeta: total on arbitrary bytes; garbage never parses") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val out = graft.mm.Multimodal.decodeVideoMeta(arr)
      // no 'ftyp' fourcc at offset 4 => must be None; any result is
      // non-throwing by reaching this line
      val hasFtyp = arr.length >= 16 &&
        new String(arr, 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "ftyp"
      hasFtyp || out.isEmpty
    }

  property("decodeVideoMeta: truncating a valid MP4 anywhere never throws") =
    forAll(Gen.chooseNum(0, 200), Gen.chooseNum(1L, 1L << 31),
      Gen.chooseNum(1L, 1000000L)) { (cut, dur, ts) =>
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      def box(t: String, c: Array[Byte]): Array[Byte] =
        be32(c.length + 8) ++ t.getBytes("US-ASCII") ++ c
      val mp4 = box("ftyp", "isomxxxxisom".getBytes("US-ASCII")) ++
        box("moov", box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur)) ++
          box("trak", box("tkhd",
            Array.fill[Byte](76)(0) ++ be32(320L << 16) ++ be32(240L << 16))))
      // full parse recovers the planted facts; any truncation is total
      val full = graft.mm.Multimodal.decodeVideoMeta(mp4)
      val trunc = graft.mm.Multimodal.decodeVideoMeta(mp4.take(math.min(cut, mp4.length)))
      full.exists(v => v.durationMs == dur * 1000L / ts &&
        v.width == 320 && v.height == 240) &&
        (trunc.isEmpty || trunc == full)
    }

  // Warc.parseRecords is the other byte parser over untrusted input —
  // same fuzz contract as the MP4 walker: total on arbitrary bytes,
  // and every complete record it does return is internally consistent
  property("warc: total on arbitrary bytes; quarantine offset in range") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val p = graft.sources.Warc.parseRecords(arr)
      (p.quarantinedAt == -1L ||
        (p.quarantinedAt >= 0L && p.quarantinedAt <= arr.length)) &&
        p.records.forall(r => r.offset >= 0 && r.offset < math.max(arr.length, 1))
    }

  property("warc: writeRecord -> parseRecords round-trips any record sequence") =
    forAll(Gen.listOf(Gen.zip(
      Gen.alphaNumStr.map(s => s"http://x.example/$s"),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))) { recs =>
      val blob = recs.map { case (uri, body) =>
        graft.sources.Warc.writeRecord("resource", uri, "application/octet-stream", body)
      }.foldLeft(Array.emptyByteArray)(_ ++ _)
      val p = graft.sources.Warc.parseRecords(blob)
      p.quarantinedAt == -1L && p.records.size == recs.size &&
        p.records.zip(recs).forall { case (r, (uri, body)) =>
          r.targetUri == uri && r.payload.sameElements(body)
        }
    }

  property("warc: truncating a valid stream anywhere is total, prefix-consistent") =
    forAll(Gen.chooseNum(0, 400), Gen.alphaNumStr) { (cut, s) =>
      val blob = graft.sources.Warc.writeRecord("resource",
        "http://t.example/a", "text/plain", s.getBytes("UTF-8")) ++
        graft.sources.Warc.writeRecord("resource",
          "http://t.example/b", "text/plain", ("tail " + s).getBytes("UTF-8"))
      val full = graft.sources.Warc.parseRecords(blob)
      val part = graft.sources.Warc.parseRecords(blob.take(math.min(cut, blob.length)))
      full.quarantinedAt == -1L && full.records.size == 2 &&
        part.records.size <= 2 &&
        part.records.zip(full.records).forall { case (a, b) =>
          a.targetUri == b.targetUri && a.payload.sameElements(b.payload)
        }
    }

  // HtmlExtract's keep-rule runs inside Spark; the fuzz surface here is
  // the un-markup'd fast path: tag-free text must survive extraction
  // verbatim as one block (whitespace-collapsed), and arbitrary
  // strings must never throw — exercised via the same expressions the
  // operator uses, evaluated through a local relation in SparkSpec
  // (see HtmlExtractSpec); kernel-level fuzz is not applicable.
}

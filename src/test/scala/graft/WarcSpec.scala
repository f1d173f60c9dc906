package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.sources.Warc

class WarcSpec extends SparkSpec {

  private def rec(uri: String, body: String, typ: String = "resource") =
    Warc.writeRecord(typ, uri, "text/plain", body.getBytes(UTF_8))

  test("multi-record walk: types, uris, payloads, offsets") {
    val bytes = Warc.writeRecord("warcinfo", "", "application/warc-fields",
      "software: graft\r\n".getBytes(UTF_8)) ++
      rec("http://a.example/1", "first body") ++
      rec("http://a.example/2", "second body, a bit longer")
    val p = Warc.parseRecords(bytes)
    assert(p.quarantinedAt == -1L)
    assert(p.records.map(_.warcType) == Seq("warcinfo", "resource", "resource"))
    assert(p.records(1).targetUri == "http://a.example/1")
    assert(new String(p.records(2).payload, UTF_8) == "second body, a bit longer")
    assert(p.records.head.offset == 0L)
    assert(p.records(1).offset > 0 && p.records(2).offset > p.records(1).offset)
  }

  test("payload containing 'WARC/1.0' does not resync the walker") {
    val trap = "fake\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n tail"
    val bytes = rec("http://t.example/x", trap) ++ rec("http://t.example/y", "real")
    val p = Warc.parseRecords(bytes)
    assert(p.quarantinedAt == -1L)
    assert(p.records.map(_.targetUri) ==
      Seq("http://t.example/x", "http://t.example/y"))
    assert(new String(p.records.head.payload, UTF_8) == trap)
  }

  test("truncated tail and malformed headers quarantine from the record start") {
    val good = rec("http://q.example/ok", "intact record")
    // truncated payload: declared length runs past EOF
    val truncated = good ++ ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes(UTF_8)
    val p1 = Warc.parseRecords(truncated)
    assert(p1.records.size == 1 && p1.quarantinedAt == good.length.toLong)
    // header line with no colon
    val badHdr = good ++ ("WARC/1.0\r\nNOT A HEADER LINE\r\n\r\n").getBytes(UTF_8)
    val p2 = Warc.parseRecords(badHdr)
    assert(p2.records.size == 1 && p2.quarantinedAt == good.length.toLong)
    // wrong magic
    val p3 = Warc.parseRecords("GIF89a not a warc".getBytes(UTF_8))
    assert(p3.records.isEmpty && p3.quarantinedAt == 0L)
    // empty input is clean
    assert(Warc.parseRecords(Array.emptyByteArray).quarantinedAt == -1L)
  }

  test("missing record-final CRLFs on the last record still parse") {
    val full = rec("http://e.example/1", "body one")
    val noTail = full.dropRight(4) // strip the record-final CRLF CRLF
    val p = Warc.parseRecords(noTail)
    assert(p.quarantinedAt == -1L)
    assert(p.records.size == 1 &&
      new String(p.records.head.payload, UTF_8) == "body one")
  }

  test("httpBody strips the response header block, passes bare content through") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>the body</html>").getBytes(UTF_8)
    assert(new String(Warc.httpBody(http), UTF_8) == "<html>the body</html>")
    val bare = "no http header here".getBytes(UTF_8)
    assert(Warc.httpBody(bare).sameElements(bare))
  }

  test("case-insensitive header lookup per spec") {
    val bytes = ("WARC/1.1\r\nwarc-type: resource\r\n" +
      "warc-target-uri: http://c.example/z\r\ncontent-length: 4\r\n\r\nbody\r\n\r\n")
      .getBytes(UTF_8)
    val p = Warc.parseRecords(bytes)
    assert(p.quarantinedAt == -1L)
    assert(p.records.head.warcType == "resource")
    assert(p.records.head.targetUri == "http://c.example/z")
  }

  test("read(): one row per record across plain and multi-member-gzip files") {
    val dir = Files.createTempDirectory("graft_warc").toString
    val plain = rec("http://f.example/1", "plain file record one") ++
      rec("http://f.example/2", "plain file record two")
    Files.write(Paths.get(dir, "a.warc"), plain)
    // per-record gzip members concatenated — the .warc.gz layout
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val gzBytes = gz(rec("http://f.example/3", "gz member record")) ++
      gz(rec("http://f.example/4", "second gz member"))
    Files.write(Paths.get(dir, "b.warc.gz"), gzBytes)

    val got = Warc.read(spark, dir).selectExpr(
      "target_uri", "cast(payload as string) AS body", "quarantined_at")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 4).map(i => s"http://f.example/$i"))
    assert(got.map(_._2).toSeq == Seq("plain file record one",
      "plain file record two", "gz member record", "second gz member"))
    assert(got.forall(_._3 == -1L))
  }

  test("memberSplits/readSplit: one archive fans across tasks, bit-equal to the single walker") {
    val dir = Files.createTempDirectory("graft_warc_split").toString
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // 40 member-per-record pages in ONE archive; a tiny
    // targetSplitBytes forces many intra-file splits
    val members = (1 to 40).map(i =>
      gz(rec(s"http://s.example/$i", s"page body number $i " + ("x" * 50))))
    Files.write(Paths.get(dir, "one.warc.gz"), members.flatten.toArray)
    val splits = Warc.memberSplits(spark, dir, targetSplitBytes = 400)
      .orderBy("start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(splits.length > 4, s"expected many splits, got ${splits.toSeq}")
    // contiguous coverage: starts at 0, each end == the next start,
    // last runs to EOF, and every boundary is a true member offset
    assert(splits.head._1 == 0L && splits.last._2 == -1L)
    assert(splits.sliding(2).forall {
      case Array((_, e), (s2, _)) => e == s2
      case _ => true
    })
    val memberOffsets = members.map(_.length.toLong).scanLeft(0L)(_ + _).toSet
    assert(splits.forall { case (s, _) => memberOffsets(s) })
    // record multiset identical to the one-task walker, offsets aside
    def key(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
        "target_uri", "warc_type", "cast(payload as string)", "quarantined_at")
      .collect().map(_.toSeq).toSet
    assert(key(Warc.readSplit(spark, dir, targetSplitBytes = 400)) ==
      key(Warc.read(spark, dir)))
    // single-member archive and plain .warc: one whole-file split each,
    // even when a payload embeds the gzip magic bytes
    val dir2 = Files.createTempDirectory("graft_warc_split1").toString
    Files.write(Paths.get(dir2, "single.warc.gz"),
      gz((1 to 10).map(i => rec(s"http://m.example/$i", "b" * 200)).flatten.toArray))
    Files.write(Paths.get(dir2, "trap.warc"),
      Warc.writeRecord("resource", "http://m.example/trap", "application/octet-stream",
        Array.fill(300)(Seq(0x1f, 0x8b, 0x08, 0x00).map(_.toByte)).flatten.toArray))
    val s2 = Warc.memberSplits(spark, dir2, targetSplitBytes = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s2.length == 2 && s2.forall(t => t._2 == 0L && t._3 == -1L), s2.toSeq)
    assert(key(Warc.readSplit(spark, dir2, targetSplitBytes = 100)) ==
      key(Warc.read(spark, dir2)))
  }

  test("LimitedInputStream: available() mirrors the underlying stream, capped at the limit") {
    // Stock-JDK GZIPInputStream.readTrailer only advances to the NEXT
    // gzip member when in.available() > 0 or the inflater retains
    // > 26 leftover bytes (this box's Debian 17.0.20 carries the
    // upstream fix that drops the gate, so the record loss can't
    // reproduce here — but Spark commonly runs on JDKs that still
    // have it). InputStream's default available() (always 0) made a
    // member boundary landing within ~26 bytes of a 64 KiB fill look
    // like EOF on such JDKs — pin the override's contract directly.
    val data = new Array[Byte](1000)
    val bais = new java.io.ByteArrayInputStream(data)
    val lim = new Warc.LimitedInputStream(bais, 600L)
    assert(lim.available() == 600) // capped at the limit, not 1000
    val buf = new Array[Byte](250)
    assert(lim.read(buf) == 250)
    assert(lim.available() == 350) // tracks consumption
    assert(lim.read(buf) == 250)
    assert(lim.read(buf) == 100)   // limit reached mid-request
    assert(lim.available() == 0)   // exhausted view reports 0
    assert(lim.read() == -1)
    // limit wider than the stream: available() is the stream's own
    val lim2 = new Warc.LimitedInputStream(
      new java.io.ByteArrayInputStream(data), 5000L)
    assert(lim2.available() == 1000)
    // a fill-aligned multi-member decode through the readSplit stack
    // stays complete (belt-and-suspenders on any JDK: sizes sweep the
    // stock-JDK trailer window [65518, 65536] compressed bytes)
    val rnd = new scala.util.Random(42)
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    (65330 to 65360).foreach { p =>
      val body = new Array[Byte](p)
      rnd.nextBytes(body)
      val m1 = gz(Warc.writeRecord("resource", "http://lim.example/big",
        "application/octet-stream", body))
      val m2 = gz(rec("http://lim.example/tail", "the record after the boundary"))
      val blob = m1 ++ m2
      val w = new Warc.StreamWalker(new java.util.zip.GZIPInputStream(
        new java.io.BufferedInputStream(
          new Warc.LimitedInputStream(
            new java.io.ByteArrayInputStream(blob), blob.length.toLong),
          64 * 1024), 64 * 1024))
      val uris = w.map(_.targetUri).toVector
      assert(uris == Vector("http://lim.example/big", "http://lim.example/tail"),
        s"payload $p (member ${m1.length}): got $uris")
      assert(w.quarantinedAt == -1L)
    }
  }

  test("readSplit: split with a ~64 KiB member keeps every record (file path)") {
    val dir = Files.createTempDirectory("graft_warc_win").toString
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val rnd = new scala.util.Random(7)
    // per file: one big (~64 KiB compressed, swept) member, a small
    // member and an incompressible filler inside split 1 (the filler
    // pushes the LAST member's start past targetSplitBytes, so split 1
    // is a BOUNDED slice ending after the small member) — a dropped
    // small member breaks the multiset equality with the single walker
    (0 until 24).foreach { i =>
      val body = new Array[Byte](65280 + i * 8)
      rnd.nextBytes(body)
      val fill = new Array[Byte](2000)
      rnd.nextBytes(fill)
      val last = new Array[Byte](800)
      rnd.nextBytes(last)
      val bytes = gz(Warc.writeRecord("resource", s"http://w.example/$i/big",
          "application/octet-stream", body)) ++
        gz(rec(s"http://w.example/$i/tail", "record after the big member")) ++
        gz(Warc.writeRecord("resource", s"http://w.example/$i/fill",
          "application/octet-stream", fill)) ++
        gz(Warc.writeRecord("resource", s"http://w.example/$i/next",
          "application/octet-stream", last))
      Files.write(Paths.get(dir, f"f$i%02d.warc.gz"), bytes)
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
        "target_uri", "warc_type", "cast(payload as string)", "quarantined_at")
      .collect().map(_.toSeq).toSet
    val split = Warc.readSplit(spark, dir, targetSplitBytes = 66000)
    assert(split.selectExpr("count(distinct file, split_start)")
      .collect().head.getLong(0) == 48L) // two splits per file
    assert(key(split) == key(Warc.read(spark, dir)))
  }

  test("write(): distributed export round-trips through read, one gzip member per record") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_warc_w").toString + "/out"
    val rows = (1 to 7).map(i => ("response", s"http://w.example/$i",
      "text/html", s"body number $i".getBytes(UTF_8),
      f"2026-03-${i}%02dT00:00:00Z"))
    val df = rows.toDF("warc_type", "target_uri", "content_type",
      "payload", "warc_date")
    // more partitions than rows: empty partitions must write no file
    val report = Warc.write(df.repartition(10), dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(report.map(_._2).sum == 7L)
    assert(report.forall(_._1.endsWith(".warc.gz")))
    val files = new java.io.File(dir).listFiles.map(_.getName).toSeq
    assert(files.forall(f => f.startsWith("part-") && f.endsWith(".warc.gz")))
    assert(files.size == report.length)
    val back = Warc.read(spark, dir).selectExpr("warc_type", "target_uri",
      "cast(payload as string) AS body", "warc_date", "quarantined_at")
      .collect()
    assert(back.forall(_.getLong(4) == -1L))
    assert(back.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3))).toSet ==
      rows.map(t => (t._1, t._2, s"body number ${t._2.split('/').last}", t._5)).toSet)
    // plain (non-gzip) export round-trips the same
    val dir2 = Files.createTempDirectory("graft_warc_w2").toString + "/out"
    Warc.write(df.repartition(2), dir2, gzip = false).collect()
    val back2 = Warc.read(spark, dir2)
      .selectExpr("target_uri").as[String].collect().toSet
    assert(back2 == rows.map(_._2).toSet)
  }

  test("read(): quarantined tail surfaces as one sentinel row after the records") {
    val dir = Files.createTempDirectory("graft_warc_q").toString
    val good = rec("http://q.example/ok", "intact record")
    val bytes = good ++ ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes(UTF_8)
    Files.write(Paths.get(dir, "t.warc"), bytes)
    val got = Warc.read(spark, dir)
      .selectExpr("target_uri", "offset", "quarantined_at")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(
      ("http://q.example/ok", 0L, -1L),
      ("", good.length.toLong, good.length.toLong)))
  }

  test("read(): multi-GiB decompressed .warc.gz streams in bounded heap") {
    // 2300 x 1 MiB payloads ≈ 2.3 GiB decompressed — past the JVM's
    // Int-indexed array wall a whole-file reader dies on (and past
    // what an 8g heap could hold twice over for a copy). Zero-filled
    // payloads keep the compressed file ~2 MiB so the disk footprint
    // and deflate time stay small; the INFLATED volume is what the
    // walker must stream through in bounded memory.
    val dir = Files.createTempDirectory("graft_warc_big").toString
    val payload = new Array[Byte](1 << 20)
    val n = 2300
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.BufferedOutputStream(
        Files.newOutputStream(Paths.get(dir, "big.warc.gz")), 1 << 20))
    try (0 until n).foreach { i =>
      out.write(Warc.writeRecord("resource", s"http://big.example/$i",
        "application/octet-stream", payload))
    } finally out.close()
    val agg = Warc.read(spark, dir).selectExpr(
      "count(*) AS n", "sum(length(payload)) AS bytes",
      "max(quarantined_at) AS q").collect().head
    assert(agg.getLong(0) == n.toLong)
    assert(agg.getLong(1) == n.toLong * (1 << 20)) // 2.3e9 > Int.MaxValue
    assert(agg.getLong(2) == -1L)
  }
}

package graft

import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // vocab {aaab: 2, aab: 1}; hand-derived merge sequence:
  //   r1: (a,a)=5 beats (a,b)=3, (b,</w>)=3            -> "aa"
  //   r2: (b,</w>)=3 beats (aa,a)=2, (a,b)=2, (aa,b)=1 -> "b</w>"
  //   r3: tie (aa,a)=2 vs (a,b</w>)=2 -> lexicographic  -> "ab</w>"
  //   r4: (aa,ab</w>)=2 beats (aa,b</w>)=1              -> "aaab</w>"
  //   r5: best remaining count 1 < 2 -> stop early
  private val wantMerges = Seq(
    ("a", "a"), ("b", "</w>"), ("a", "b</w>"), ("aa", "ab</w>"))

  test("train: hand-derived merge order, deterministic ties, early stop") {
    val docs = Seq((1L, "aaab aab aaab")).toDF("doc_id", "text")
    assert(Bpe.train(docs, numMerges = 10) == wantMerges)
    // a smaller budget is a strict prefix
    assert(Bpe.train(docs, numMerges = 2) == wantMerges.take(2))
  }

  test("encodeWord: trained words reach their training-time symbols; unseen compose") {
    val ranks = wantMerges.zipWithIndex.toMap
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aaab</w>"))
    assert(Bpe.encodeWord("aab", ranks).toSeq == Seq("aa", "b</w>"))
    // unseen word: (a,a) then no further merge applies
    assert(Bpe.encodeWord("aaa", ranks).toSeq == Seq("aa", "a", "</w>"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x", "</w>"))
  }

  test("encode: distributed tokens concatenate per doc; lossless under </w>") {
    val docs = Seq((1L, "aaab aab"), (2L, "aaa")).toDF("doc_id", "text")
    val merges = Bpe.train(
      Seq((1L, "aaab aab aaab")).toDF("doc_id", "text"), 10)
    val got = Bpe.encode(docs, merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("aaab</w>", "aa", "b</w>"))
    assert(got(2L) == Seq("aa", "a", "</w>"))
    // lossless: stripping </w> and re-joining reconstructs the text
    got.foreach { case (id, toks) =>
      val text = toks.mkString("").replace("</w>", " ").trim
      val want = docs.filter($"doc_id" === id).as[(Long, String)].head()._2
      assert(text == want)
    }
  }

  test("initialPairCounts: freq-weighted, (cnt desc, a, b) order") {
    val docs = Seq((1L, "aaab aab aaab")).toDF("doc_id", "text")
    val got = Bpe.initialPairCounts(docs, 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "a", 5L), ("a", "b", 3L), ("b", "</w>", 3L)))
  }

  test("train on a larger corpus slice runs off one vocab job and encodes it") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(100)
    val merges = Bpe.train(docs, numMerges = 50)
    assert(merges.nonEmpty && merges.size <= 50)
    val enc = Bpe.encode(docs, merges)
    assert(enc.count() == 100)
    // every doc's token stream is non-empty and ends with a </w>-bearing symbol
    val toks = enc.as[(Long, Seq[String])].collect()
    assert(toks.forall(_._2.nonEmpty))
    assert(toks.forall(_._2.last.endsWith("</w>")))
  }

  test("greedy encodeWord == in-rank-order replace replay on corpus words") {
    // the d_bpe_encode oracle replays the fixed merge table as
    // sequential non-overlapping string replaces; pin the classic
    // in-order == greedy equivalence on real corpus words
    val merges = SparkEntry.bpeMerges
    val ranks = merges.zipWithIndex.toMap
    def replay(w: String): Seq[String] = {
      var s = "||" + w.map(c => s"$c||").mkString + "</w>||"
      merges.foreach { case (a, b) =>
        s = s.replace(s"|$a||$b|", s"|$a$b|") }
      s.stripPrefix("||").stripSuffix("||").split("\\|\\|").toSeq
    }
    val words = (graft.core.Tables.documents(spark, sfDir)
      .select("text").limit(200).as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      ++ Seq("the", "and", "then", "thine", "onion", "banana", "error"))
      .distinct
    assert(words.length > 30)
    words.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).toSeq == replay(w), s"word '$w'") }
    // the chained merges actually fire somewhere
    assert(words.exists(w => Bpe.encodeWord(w, ranks).contains("the</w>")))
    assert(Bpe.encodeWord("the", ranks).toSeq == Seq("the</w>"))
    assert(Bpe.encodeWord("and", ranks).toSeq == Seq("and</w>"))
    assert(Bpe.encodeWord("thin", ranks).toSeq == Seq("th", "in", "</w>"))
  }

  test("byte-level: no UNK ever, lossless round-trip, hex form") {
    // hex-pair base symbols; byte merges mirror the char table
    val merges = graft.SparkEntry.bpeByteMerges
    val ranks = merges.zipWithIndex.toMap
    // 'the' = 74 68 65 -> chained merges land the full word
    assert(Bpe.encodeWordBytes("the", ranks).toSeq == Seq("746865</w>"))
    assert(Bpe.encodeWordBytes("and", ranks).toSeq == Seq("616E64</w>"))
    // round-trip: stripping </w> and unhexing the concatenation
    // recovers the word's exact UTF-8 bytes — for ANY input,
    // including multibyte scripts no merge has ever seen (no UNK)
    def roundTrip(w: String): String = {
      val toks = Bpe.encodeWordBytes(w, ranks)
      val hexStr = toks.mkString.replace("</w>", "")
      val bytes = hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
    for (w <- Seq("the", "error", "café", "的是", "naïve",
        new String(Character.toChars(0x1F600)), "mixed的word")) {
      assert(roundTrip(w) == w, s"round-trip '$w'")
      assert(!Bpe.encodeWordBytes(w, ranks).contains("[UNK]"))
    }
    // multibyte chars split to byte symbols (C3A9 = é) but merges
    // trained on ASCII still fire inside mixed words
    assert(Bpe.encodeWordBytes("é", ranks).toSeq == Seq("C3", "A9", "</w>"))
  }

  test("trainBytes: hand-derived byte merges, deterministic on any partitioning") {
    // the:3, and:2, in:1 — counts hand-derived over hex symbols.
    // (NOT the hex image of char merges: ties break pair-lex ASC and
    // hex digits sort BEFORE '<', so ("65","72") would beat
    // ("65","</w>") where char-level ("e","</w>") beats ("e","r") —
    // the tie ORDER is alphabet-specific by design.)
    val docs = Seq((1L, "the the and in"), (2L, "the and")).toDF("doc_id", "text")
    val got = Bpe.trainBytes(docs, 4)
    assert(got == Seq("65" -> "</w>", "68" -> "65</w>",
      "74" -> "6865</w>", "61" -> "6E"))
    assert(Bpe.trainBytes(docs.repartition(5), 4) == got)
  }

  test("encodeBytes: distributed, fertility carries over") {
    val merges = graft.SparkEntry.bpeByteMerges
    val docs = Seq((1L, "the and café"), (2L, "on 的")).toDF("doc_id", "text")
    val enc = Bpe.encodeBytes(docs, merges).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
    assert(enc(0)._2 == Seq("746865</w>", "616E64</w>",
      "63", "61", "66", "C3", "A9", "</w>"))
    val fert = Bpe.fertility(Bpe.encodeBytes(docs, merges)).orderBy("doc_id")
      .select("doc_id", "n_words", "n_tokens").as[(Long, Long, Long)].collect()
    assert(fert(0) == ((1L, 3L, 8L)))
  }
}

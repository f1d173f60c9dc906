package graft

import graft.text.Wordpiece

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  // corpus {aab: 2, ab: 1, b: 3}; hand-derived likelihood merges:
  //   unigrams a:3 ##a:2 ##b:3 b:3
  //   r1: (a,##a) 2/(3·2)=1/3 ties (##a,##b) 2/(2·3)=1/3,
  //       (a,##b) 1/9 loses; lexicographic -> ("##a","##b") -> "##ab"
  //   r2: (a,##ab) 2/(3·2)=1/3 ties (a,##b) 1/(3·1)=1/3;
  //       lexicographic -> ("a","##ab") -> "aab"
  //   r3: best remaining (a,##b) count 1 < 2 -> stop early
  private val handDocs = Seq((1L, "aab aab ab b b b"))
  private val wantVocab =
    Seq("##a", "##b", "a", "b") ++ Seq("##ab", "aab")

  test("train: hand-derived likelihood merges, deterministic ties, early stop") {
    val docs = handDocs.toDF("doc_id", "text")
    assert(Wordpiece.train(docs, numMerges = 10) == wantVocab)
    // a smaller budget is a strict prefix of the merged suffix
    assert(Wordpiece.train(docs, numMerges = 1) == wantVocab.dropRight(1))
    // partition-invariant
    assert(Wordpiece.train(docs.repartition(3), numMerges = 10) == wantVocab)
  }

  test("encodeWord: greedy longest-match, continuation forms, whole-word [UNK]") {
    val v = wantVocab.toSet
    assert(Wordpiece.encodeWord("aab", v).toSeq == Seq("aab"))
    assert(Wordpiece.encodeWord("ab", v).toSeq == Seq("a", "##b"))
    assert(Wordpiece.encodeWord("ba", v).toSeq == Seq("b", "##a"))
    // greedy prefers the longest piece at each position: "aab" wins
    // at 0, then "##a" (no "##aa") leaves "ab" for "##ab"
    assert(Wordpiece.encodeWord("aabaab", v).toSeq == Seq("aab", "##a", "##ab"))
    // uncoverable character -> the WHOLE word is [UNK]
    assert(Wordpiece.encodeWord("abc", v).toSeq == Seq("[UNK]"))
    assert(Wordpiece.encodeWord("c", v).toSeq == Seq("[UNK]"))
    // maxChars guard
    assert(Wordpiece.encodeWord("a" * 101, v).toSeq == Seq("[UNK]"))
    assert(Wordpiece.encodeWord("", v).isEmpty)
  }

  test("non-BMP codepoints: one symbol each, never split across surrogates") {
    val emoji = new String(Character.toChars(0x1F600)) // 😀, 2 code units
    // symbols() walks codepoints: the emoji is ONE symbol
    assert(Wordpiece.symbols(s"a${emoji}b").toSeq ==
      Seq("a", "##" + emoji, "##b"))
    // a vocab carrying the emoji pieces encodes cleanly — greedy match
    // boundaries never land inside the surrogate pair
    val v = Set("a", "##" + emoji, "##b", "a" + emoji)
    assert(Wordpiece.encodeWord(s"a${emoji}b", v).toSeq ==
      Seq("a" + emoji, "##b"))
    // maxChars counts CODEPOINTS (oracle len semantics): 100 emoji =
    // 200 code units but exactly 100 codepoints -> not [UNK]
    val hundred = emoji * 100
    assert(Wordpiece.encodeWord(hundred, Set("##" + emoji) + emoji).toSeq
      .forall(_ != "[UNK]"))
    assert(Wordpiece.encodeWord(emoji * 101, Set("##" + emoji) + emoji).toSeq ==
      Seq("[UNK]"))
  }

  test("encode: distributed tokens per doc, frozen-vocab corpus behavior") {
    val docs = Seq((1L, "aab ab"), (2L, "ba c")).toDF("doc_id", "text")
    val got = Wordpiece.encode(docs, wantVocab)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("aab", "a", "##b"))
    assert(got(2L) == Seq("b", "##a", "[UNK]"))
    // the frozen entry vocabulary on real corpus words: multi-char
    // pieces win greedily; the missing ##p makes dup/group [UNK]
    val corpus = Seq((1L, "window table the dup group value stream spark"))
      .toDF("doc_id", "text")
    val enc = Wordpiece.encode(corpus, SparkEntry.wordpieceFrozen)
      .as[(Long, Seq[String])].collect().head._2
    assert(enc == Seq("wind", "##ow", "tab", "##le", "the", "[UNK]",
      "[UNK]", "val", "##ue", "str", "##eam", "sp", "##a", "##r", "##k"))
  }

  test("initialPairScores: likelihood ranking, freq-weighted, deterministic ties") {
    val docs = handDocs.toDF("doc_id", "text")
    val got = Wordpiece.initialPairScores(docs, 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("##a", "##b", 2L, 2.0 / (2.0 * 3.0)),
      ("a", "##a", 2L, 2.0 / (3.0 * 2.0)),
      ("a", "##b", 1L, 1.0 / (3.0 * 3.0))))
  }

  test("train + encode on a corpus slice: coverage means no [UNK]") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(100)
    val vocab = Wordpiece.train(docs, numMerges = 30)
    // seeding keeps every observed initial/continuation character, so
    // the training corpus itself never hits [UNK]
    val toks = Wordpiece.encode(docs, vocab)
      .select(org.apache.spark.sql.functions.explode($"tokens").as("t"))
      .as[String].collect()
    assert(toks.nonEmpty && !toks.contains("[UNK]"))
  }
}

package graft

import graft.text.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(ps: (String, Double)*) = Unigram.Model(ps.toMap)

  test("expectedCounts: hand forward-backward on the two-path lattice") {
    // "ab" under p(a)=p(b)=0.4, p(ab)=0.2: paths [a,b] 0.16, [ab] 0.2,
    // Z = 0.36 -> E[a] = E[b] = 4/9, E[ab] = 5/9
    val m = model("a" -> math.log(0.4), "b" -> math.log(0.4),
      "ab" -> math.log(0.2))
    val got = Unigram.expectedCounts("ab", m).toSeq.toMap
    assert(math.abs(got("a") - 4.0 / 9) < 1e-12)
    assert(math.abs(got("b") - 4.0 / 9) < 1e-12)
    assert(math.abs(got("ab") - 5.0 / 9) < 1e-12)
    // a word with an uncovered char still normalizes (unk edge)
    val got2 = Unigram.expectedCounts("axb", m).toSeq.toMap
    assert(math.abs(got2("a") - 1.0) < 1e-12) // 'x' forces the a|x|b split
    assert(!got2.contains("ab"))
  }

  test("viterbiWord: brute-force enumeration agreement + tie rules + unk") {
    // independent brute force: enumerate EVERY segmentation
    def brute(word: String, m: Unigram.Model): (Double, Int) = {
      def segs(i: Int): Seq[List[String]] =
        if (i == word.length) Seq(Nil)
        else (for {
          j <- (i + 1) to word.length
          s = word.substring(i, j)
          if m.pieces.contains(s) || j - i == 1
          rest <- segs(j)
        } yield s :: rest)
      def score(seg: List[String]) = seg.map(s =>
        m.pieces.getOrElse(s, m.unkScore)).sum
      val all = segs(0).map(s => (score(s), s.length))
      val bs = all.map(_._1).max
      (bs, all.filter(_._1 == bs).map(_._2).min)
    }
    val m = Unigram.Model(
      Map("ab" -> -1.0, "ba" -> -1.1, "aba" -> -2.0, "a" -> -2.5,
        "b" -> -2.7), unkScore = -9.0)
    val alphabet = "abx" // x = unk
    def words(len: Int): Seq[String] =
      if (len == 0) Seq("")
      else for (w <- words(len - 1); c <- alphabet) yield w + c
    for (len <- 1 to 6; w <- words(len)) {
      val (pieces, lp) = Unigram.viterbiWord(w, m)
      val (blp, bnp) = brute(w, m)
      assert(math.abs(lp - blp) < 1e-9, s"score mismatch on '$w'")
      assert(pieces.length == bnp, s"piece count mismatch on '$w'")
      assert(pieces.mkString == w, s"pieces must tile '$w'")
    }
  }

  test("train: tiny hand EM — dominant piece wins, singles survive, deterministic") {
    val docs = Seq(
      (1L, "abab abab abab"),
      (2L, "abab ab"),
      (3L, "ba"),
    ).toDF("doc_id", "text")
    val m = Unigram.train(docs, vocabSize = 6, seedSize = 10,
      maxPieceLen = 4, emRounds = 2)
    // coverage: every corpus char is a piece
    assert(m.pieces.contains("a") && m.pieces.contains("b"))
    // the whole-word piece dominates: "abab" must out-score any
    // 2-piece split of it, and must be the highest-probability
    // multi-char piece
    assert(m.pieces.contains("abab"))
    assert(m.pieces("abab") > m.pieces("a") + m.pieces("b"))
    // Viterbi under the trained model segments the dominant word whole
    assert(Unigram.viterbiWord("abab", m)._1.toSeq == Seq("abab"))
    // exact determinism on any partitioning (decimal-sum contract)
    val m2 = Unigram.train(docs.repartition(7), vocabSize = 6,
      seedSize = 10, maxPieceLen = 4, emRounds = 2)
    assert(m2.pieces == m.pieces)
  }

  test("encode: document order, logp total, empty text, partition stability") {
    val m = Unigram.Model(
      Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -2.5),
      unkScore = -9.0)
    val docs = Seq((1L, "ab cab"), (2L, ""), (3L, "zz")).toDF("doc_id", "text")
    val got = Unigram.encode(docs, m).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == Seq("ab", "c", "ab"))
    assert(math.abs(got(1L)._2 - (-1.0 + (-2.5 - 1.0))) < 1e-12)
    assert(got(2L)._1.isEmpty && got(2L)._2 == 0.0)
    assert(got(3L)._1 == Seq("z", "z") && got(3L)._2 == -18.0) // unk chars kept
    val again = Unigram.encode(docs.repartition(5), m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(again(1L) == got(1L)._1)
  }

  test("encodeSampled: exact segmentation law, alpha limits, reproducible, partition-free") {
    // "ab" under p(a)=p(b)=0.4, p(ab)=0.2 has two segmentations with
    // P([ab]) = 0.2/0.36 = 5/9 at alpha=1. Sample over 3000 docs and
    // check the empirical law (3-sigma band ~ 0.027).
    val m = model("a" -> math.log(0.4), "b" -> math.log(0.4),
      "ab" -> math.log(0.2))
    val docs = (1L to 3000L).map((_, "ab")).toDF("doc_id", "text")
    def fracWhole(alpha: Double, seed: Long): Double = {
      val rows = Unigram.encodeSampled(docs, m, alpha, seed).collect()
      rows.count(_.getSeq[String](1) == Seq("ab")).toDouble / rows.length
    }
    val f1 = fracWhole(1.0, 7L)
    assert(math.abs(f1 - 5.0 / 9) < 0.03, s"alpha=1 law: $f1")
    // alpha=0: uniform over the two segmentations
    val f0 = fracWhole(0.0, 7L)
    assert(math.abs(f0 - 0.5) < 0.03, s"alpha=0 uniform: $f0")
    // tempered law at alpha=16: (0.2/0.16)^16 / (1 + (0.2/0.16)^16)
    // = 0.9726... — the measured 0.97 is the THEORY, not noise
    val f16 = fracWhole(16.0, 7L)
    val want16 = math.pow(1.25, 16) / (1 + math.pow(1.25, 16))
    assert(math.abs(f16 - want16) < 0.02, s"alpha=16 law: $f16 vs $want16")
    // large alpha: collapses to Viterbi ([ab] wins: 1.25^64 ~ 1.6e6)
    assert(fracWhole(64.0, 7L) > 0.999)
    // reproducible under the same seed, different under another,
    // partition-independent (the d_sample_portable contract)
    val a = Unigram.encodeSampled(docs, m, 1.0, 7L).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = Unigram.encodeSampled(docs.repartition(11), m, 1.0, 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
    val c = Unigram.encodeSampled(docs, m, 1.0, 8L).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(c != a)
    // every sample tiles the word; unk chars survive
    val z = Unigram.encodeSampled(Seq((1L, "axb")).toDF("doc_id", "text"),
      m, 1.0, 7L).head().getSeq[String](1)
    assert(z.mkString == "axb")
  }

  test("seedPieces: substring counts freq-weighted, capped length") {
    val docs = Seq((1L, "abc abc"), (2L, "ab")).toDF("doc_id", "text")
    val got = Unigram.seedPieces(docs, seedSize = 100, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("ab") == 3L) // twice in "abc", once alone
    assert(got("a") == 3L && got("bc") == 2L && got("c") == 2L)
    assert(!got.contains("abc")) // over maxPieceLen
  }
}

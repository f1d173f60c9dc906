package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the
  * BERT-family vocabulary algorithm) — completes the subword trio
  * next to [[Bpe]] (count-scored merges) and [[Unigram]] (EM-pruned
  * pieces): WordPiece merges by LIKELIHOOD gain — score(A,B) =
  * count(AB) / (count(A)·count(B)) — and word-internal pieces carry
  * the `##` continuation prefix, so the trained artifact is a plain
  * vocabulary and inference is greedy longest-match-first (a word
  * that cannot be covered becomes a single `[UNK]` token, the BERT
  * behavior).
  *
  * Scale design — the [[Bpe]] conventions verbatim: ONE corpus pass
  * collapses text into the Zipf-bounded (word, freq) table, the
  * merge loop runs driver-local over that bounded table (zero Spark
  * jobs per round), and encoding broadcasts the vocabulary and maps
  * per row (genuine per-word imperative logic, shuffle-free).
  * Determinism: likelihood scores are ratios of exact longs and
  * compare by BigInt cross-multiplication — no float enters the
  * ranking — with ties broken (pair lexicographic asc), so training
  * is bit-identical on any partitioning.
  *
  * Reference scope note: the reference engine (oracle-duckdb-sync)
  * stops at whitespace token counting; the tokenizer family is part
  * of this engine's LLM-pipeline surface.
  */
object Wordpiece {

  /** `[c0, ##c1, ##c2, …]` — a word's initial symbol sequence, one
    * symbol per CODEPOINT (not UTF-16 code unit): a non-BMP character
    * (emoji, supplementary CJK) is one symbol, matching the DuckDB
    * oracle's codepoint `substring`/`len` semantics — iterating code
    * units would split it into two surrogate symbols and diverge.
    */
  private[graft] def symbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    var first = true
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      val s = word.substring(i, i + n)
      out += (if (first) s else "##" + s)
      first = false
      i += n
    }
    out.result()
  }

  private def stripHash(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Train a WordPiece vocabulary: seed with the corpus' observed
    * symbols (initial + continuation characters), then `numMerges`
    * likelihood-scored merges — each round merges the adjacent pair
    * maximizing count(AB)/(count(A)·count(B)) over the freq-weighted
    * word table, rewriting non-overlapping occurrences left-to-right
    * (the merged piece keeps the left symbol's continuation status).
    * Rounds stop early when the best pair's count < 2. Returns the
    * vocabulary: seed symbols sorted, then merged pieces in merge
    * order.
    */
  def train(docs: DataFrame, numMerges: Int, maxVocab: Int = 100000,
            textCol: String = "text"): Seq[String] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val vocab: Array[(Array[String], Long)] =
      Bpe.wordFreq(docs, textCol)
        .orderBy(col("freq").desc, col("word").asc).limit(maxVocab)
        .collect()
        .map(r => (symbols(r.getString(0)), r.getLong(1)))
    trainOnVocab(vocab, numMerges)
  }

  /** The driver-local likelihood-merge loop, exposed for spec'ing. */
  private[graft] def trainOnVocab(vocab0: Array[(Array[String], Long)],
                                  numMerges: Int): Seq[String] = {
    var vocab = vocab0
    val seed = vocab0.iterator.flatMap(_._1).toSeq.distinct.sorted
    val merged = Seq.newBuilder[String]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val units = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          units.update(syms(i), units.getOrElse(syms(i), 0L) + f)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairs.update(k, pairs.getOrElse(k, 0L) + f)
          }
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        // argmax of c_ab/(c_a·c_b) by exact cross-multiplication —
        // no float enters the ranking; ties break (a asc, b asc)
        val best = pairs.toSeq.reduceLeft { (x, y) =>
          val lx = BigInt(x._2) * BigInt(units(y._1._1)) * BigInt(units(y._1._2))
          val ly = BigInt(y._2) * BigInt(units(x._1._1)) * BigInt(units(x._1._2))
          if (lx > ly) x
          else if (ly > lx) y
          else if (implicitly[Ordering[(String, String)]].lteq(x._1, y._1)) x
          else y
        }
        if (best._2 < 2) done = true
        else {
          val piece = best._1._1 + stripHash(best._1._2)
          merged += piece
          vocab = vocab.map { case (syms, f) =>
            (mergePair(syms, best._1), f)
          }
        }
      }
      round += 1
    }
    seed ++ merged.result()
  }

  /** Rewrite every non-overlapping adjacent (x, y) left-to-right;
    * the merged symbol keeps x's `##` status.
    */
  private def mergePair(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + stripHash(syms(i + 1))
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Greedy longest-match-first segmentation of one word (the BERT
    * WordpieceTokenizer rule): at each position take the LONGEST
    * vocabulary piece (continuation positions require the `##`
    * form); if no piece matches — or the word exceeds `maxChars`
    * CODEPOINTS — the WHOLE word becomes `[UNK]`. Match boundaries
    * walk codepoints (the [[symbols]] rationale): a candidate piece
    * never splits a surrogate pair, and the length cutoff counts
    * characters the way the oracle's `len` does.
    */
  private[graft] def encodeWord(word: String, vocab: Set[String],
                                maxChars: Int = 100): Array[String] = {
    if (word.isEmpty) return Array.empty
    // codepoint start offsets + the end sentinel
    val bounds = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < word.length) {
        b += i
        i += Character.charCount(word.codePointAt(i))
      }
      b += word.length
      b.result()
    }
    val nCp = bounds.length - 1
    if (nCp > maxChars) return Array("[UNK]")
    val out = Array.newBuilder[String]
    var pos = 0
    while (pos < nCp) {
      var end = nCp
      var found: String = null
      while (end > pos && found == null) {
        val cand = (if (pos > 0) "##" else "") +
          word.substring(bounds(pos), bounds(end))
        if (vocab(cand)) found = cand else end -= 1
      }
      if (found == null) return Array("[UNK]")
      out += found
      pos = end
    }
    out.result()
  }

  /** Encode the corpus: (idCol, tokens) in document order. The
    * vocabulary broadcasts; per-word greedy longest-match is genuine
    * per-row imperative logic (the documented typed-map last resort),
    * shuffle-free and off the driver.
    */
  def encode(docs: DataFrame, vocab: Seq[String], maxChars: Int = 100,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, bc.value, maxChars)).toArray
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Round-0 likelihood scores over the corpus' initial symbols —
    * the trainer's first ranking as a declarative query (the oracle
    * surface, mirroring [[Bpe.initialPairCounts]]): adjacent-pair and
    * unigram symbol counts both come from ONE word-freq pass, and
    * score = cnt / (cnt_a · cnt_b) computed in double (a single
    * multiply + divide — IEEE-identical in any engine). Output
    * ordered (score desc, a asc, b asc), top `limit` rows.
    */
  def initialPairScores(docs: DataFrame, limit: Int,
                        textCol: String = "text"): DataFrame = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    val sp = docs.sparkSession
    import sp.implicits._
    val unigrams = Bpe.wordFreq(docs, textCol).as[(String, Long)]
      .flatMap { case (w, f) => symbols(w).map(s => (s, f)) }
      .toDF("sym", "freq")
      .groupBy("sym").agg(sum("freq").as("ucnt"))
    val pairs = Bpe.wordFreq(docs, textCol).as[(String, Long)]
      .flatMap { case (w, f) =>
        val s = symbols(w)
        (0 until s.length - 1).map(i => (s(i), s(i + 1), f))
      }
      .toDF("a", "b", "freq")
      .groupBy("a", "b").agg(sum("freq").as("cnt"))
    val scored = pairs
      .join(broadcast(unigrams.select(col("sym").as("a"), col("ucnt").as("ca"))), "a")
      .join(broadcast(unigrams.select(col("sym").as("b"), col("ucnt").as("cb"))), "b")
      .select(col("a"), col("b"), col("cnt"),
        (col("cnt").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double"))).as("score"))
      .orderBy(col("score").desc, col("a").asc, col("b").asc)
      .limit(limit)
    scored
  }
}

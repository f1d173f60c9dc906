package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer support (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the missing piece between corpus curation and token counting: the
  * engine can TRAIN the subword vocabulary and ENCODE the corpus with
  * it, not just count whitespace tokens.
  *
  * Scale design — the classic trainer is a K-round sequential loop,
  * which naively means K passes over a 100 TB corpus. The standard
  * fix (and Sennrich's own) is to train on the WORD-FREQUENCY table
  * instead: ONE corpus pass builds (word, freq) — Zipf-bounded output
  * (a few M rows at any corpus size) — and every merge round runs
  * over that table. Here the bounded table collects to the driver
  * (`maxVocab` caps it, keeping the most frequent words — the tail's
  * contribution to pair counts is negligible by construction) and the
  * K rounds are a driver loop costing zero Spark jobs. Encoding is
  * embarrassingly parallel: merge ranks broadcast, greedy
  * lowest-rank-first merging per word — genuine per-row imperative
  * logic, the documented mapPartitions case.
  *
  * Conventions: symbols are the word's characters plus a terminal
  * `</w>` end-of-word symbol; a merge rewrites every non-overlapping
  * adjacent occurrence left-to-right; candidate ties break (count
  * desc, pair lexicographic asc), so training is deterministic on any
  * partitioning; rounds stop early when the best pair's count < 2 (a
  * singleton merge compresses nothing).
  */
object Bpe {

  /** (word, freq) over whitespace-split text — the ONE corpus pass. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial adjacent symbol-pair counts, freq-weighted — round 0 of
    * the trainer as a declarative query (the oracle surface). Pair
    * formation runs on the VOCAB table (posexplode + element_at, the
    * bigram-scorer shape), so the corpus is touched exactly once, by
    * [[wordFreq]]. Output ordered (cnt desc, a asc, b asc), top
    * `limit` rows.
    */
  def initialPairCounts(docs: DataFrame, limit: Int,
                        textCol: String = "text"): DataFrame = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    wordFreq(docs, textCol)
      .withColumn("syms", array_append(split(col("word"), ""), lit("</w>")))
      .select(col("freq"), col("syms"),
        posexplode(expr("slice(syms, 1, size(syms) - 1)")).as(Seq("i", "a")))
      .withColumn("b", expr("element_at(syms, i + 2)"))
      .groupBy("a", "b").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(limit)
  }

  /** Train `numMerges` BPE merges from the corpus. One Spark job
    * (the word-frequency aggregate, truncated to the `maxVocab` most
    * frequent words); the merge loop is driver-local over that
    * bounded table. Returns merges in rank order.
    */
  def train(docs: DataFrame, numMerges: Int, maxVocab: Int = 100000,
            textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val vocab: Array[(Array[String], Long)] =
      wordFreq(docs, textCol)
        .orderBy(col("freq").desc, col("word").asc).limit(maxVocab)
        .collect()
        .map(r => (r.getString(0).map(_.toString).toArray :+ "</w>",
          r.getLong(1)))
    trainOnVocab(vocab, numMerges)
  }

  /** The driver-local merge loop, exposed for spec'ing. */
  private[graft] def trainOnVocab(vocab0: Array[(Array[String], Long)],
                                 numMerges: Int): Seq[(String, String)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) done = true
        else {
          merges += best._1
          vocab = vocab.map { case (syms, f) => (mergeOnce(syms, best._1), f) }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Rewrite every non-overlapping adjacent (x, y) left-to-right. */
  private def mergeOnce(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Greedy BPE encoding of one word's symbols under `ranks`
    * (merge → rank): repeatedly apply the present merge with the
    * LOWEST rank until none applies — the standard inference rule,
    * and exactly training's rewrite order, so any word seen at
    * training encodes to its training-time symbols.
    */
  private[graft] def encodeWord(word: String,
                               ranks: Map[(String, String), Int]): Array[String] =
    greedyMerge(word.map(_.toString).toArray :+ "</w>", ranks)

  /** The shared greedy lowest-rank-first loop over an initial symbol
    * sequence (char-level [[encodeWord]] and byte-level
    * [[encodeWordBytes]] differ only in their base alphabet).
    */
  private def greedyMerge(syms0: Array[String],
                          ranks: Map[(String, String), Int]): Array[String] = {
    var syms = syms0
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** A word's BYTE-level initial symbols: one uppercase hex pair per
    * UTF-8 byte plus the terminal `</w>` — the GPT-2-family base
    * alphabet (Radford et al. 2019 use a byte→unicode remap; hex
    * pairs carry the same information and replay portably — DuckDB's
    * `hex()` emits exactly this form). All 256 bytes are base
    * symbols, so EVERY word is encodable — byte fallback is inherent
    * and `[UNK]` never exists at this level.
    */
  private[graft] def byteSymbols(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length + 1)
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xff
      out(i) = new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf)))
      i += 1
    }
    out(bs.length) = "</w>"
    out
  }

  /** Greedy byte-level encoding of one word (no UNK — see
    * [[byteSymbols]]); tokens are concatenated hex pairs, the last
    * one `</w>`-terminated.
    */
  private[graft] def encodeWordBytes(word: String,
                                     ranks: Map[(String, String), Int]): Array[String] =
    greedyMerge(byteSymbols(word), ranks)

  /** Train `numMerges` BYTE-level BPE merges — [[train]] with the
    * byte base alphabet: same one-pass Zipf-bounded word-frequency
    * table, same driver-local likelihood loop, merges over hex-pair
    * symbols. The practical difference from char-level is the
    * alphabet bound (≤ 257 base symbols regardless of script) and
    * the no-UNK guarantee at encode time.
    */
  def trainBytes(docs: DataFrame, numMerges: Int, maxVocab: Int = 100000,
                 textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val vocab: Array[(Array[String], Long)] =
      wordFreq(docs, textCol)
        .orderBy(col("freq").desc, col("word").asc).limit(maxVocab)
        .collect()
        .map(r => (byteSymbols(r.getString(0)), r.getLong(1)))
    trainOnVocab(vocab, numMerges)
  }

  /** Encode the corpus: (idCol, tokens) with each word's subword
    * symbols concatenated in document order. The merge table
    * broadcasts (numMerges small structs); per-word greedy merging is
    * genuine per-row imperative logic — the documented mapPartitions
    * (here `map` over a typed Dataset) last resort, kept off the
    * driver and shuffle-free.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, bc.value)).toArray
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Byte-level corpus encode — [[encode]] with [[encodeWordBytes]]:
    * merge ranks broadcast, per-word greedy merging off the driver,
    * shuffle-free; tokens are hex-pair concatenations (last one
    * `</w>`-terminated), so the output is engine-replayable and
    * [[fertility]] applies unchanged.
    */
  def encodeBytes(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWordBytes(w, bc.value)).toArray
        (id, toks)
      }
      .toDF(idCol, "tokens")
  }

  /** Per-doc tokenizer FERTILITY (tokens per word — the standard
    * "how well does this vocabulary fit this corpus/language" number;
    * high fertility = the tokenizer fragments, costing context budget)
    * from [[encode]] output alone: the word count is recovered from
    * the `</w>` markers — every word contributes exactly one
    * terminal-bearing token, and the terminal can only sit at a
    * token's end — so no join back to the corpus is ever paid. The
    * quotient of two exact longs is left unrounded (the engine-stable
    * convention).
    */
  def fertility(encoded: DataFrame, idCol: String = "doc_id"): DataFrame =
    encoded.select(col(idCol),
        expr("size(filter(tokens, t -> endswith(t, '</w>')))")
          .cast("long").as("n_words"),
        size(col("tokens")).cast("long").as("n_tokens"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words").cast("double"))
}

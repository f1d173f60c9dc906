package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure codegen'd string expressions — no UDFs — so each op is a
  * single narrow map over the corpus at any scale (no shuffle at all
  * until a downstream aggregation).
  */
object TextAnalysis {

  /** Exact occurrence count of literal `s` in `c` (replace trick —
    * identical arithmetic is expressible in ANSI SQL for the oracle).
    */
  def countOccurrences(c: Column, s: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(s), ""))) / s.length

  private def score(c: Column, markers: Seq[String]): Column =
    markers.map(countOccurrences(c, _)).reduce(_ + _)

  /** Stopword-marker language ID. Deterministic argmax with a fixed
    * priority order (en, de, es, fr, zh) on ties.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val sEn = score(t, Seq(" the ", " and "))
    val sDe = score(t, Seq(" der ", " und "))
    val sEs = score(t, Seq(" el ", " los "))
    val sFr = score(t, Seq(" le ", " les "))
    val sZh = score(t, Seq("的", "是"))
    docs.withColumn("pred_lang",
      when(sEn >= sDe && sEn >= sEs && sEn >= sFr && sEn >= sZh, "en")
        .when(sDe >= sEs && sDe >= sFr && sDe >= sZh, "de")
        .when(sEs >= sFr && sEs >= sZh, "es")
        .when(sFr >= sZh, "fr")
        .otherwise("zh"))
  }

  /** Unicode SCRIPT mix — the writing-system histogram a multilingual
    * curation pass runs alongside [[langId]] (language says WHAT is
    * written, script says HOW; mixed-script docs are a spam/encoding
    * signal, and script routing picks the tokenizer): per-doc counts
    * and 6dp fractions for latin / cyrillic / greek / arabic / cjk
    * (han + kana + hangul) / digit over BMP codepoint classes, plus
    * the dominant LETTER script (digits excluded; ties resolve in the
    * listed priority order; no letters at all → "none").
    *
    * Per-row codegen'd `regexp_count` over explicit codepoint-range
    * classes — the classes are plain character ranges on purpose:
    * they mean the same thing in any regex engine, so the whole
    * histogram sits on the oracle hash path. Zero shuffle,
    * column-prunable.
    */
  def scriptMix(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) = regexp_count(t, lit(cls)).cast("long")
    val nLatin = cnt("[A-Za-zÀ-ɏ]")
    val nCyr = cnt("[Ѐ-ӿ]")
    val nGreek = cnt("[Ͱ-Ͽ]")
    val nArabic = cnt("[؀-ۿ]")
    val nCjk = cnt("[一-鿿぀-ヿ가-힯]")
    val nDigit = cnt("[0-9]")
    val m = greatest(nLatin, nCyr, nGreek, nArabic, nCjk)
    docs
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_latin", nLatin)
      .withColumn("n_cyrillic", nCyr)
      .withColumn("n_greek", nGreek)
      .withColumn("n_arabic", nArabic)
      .withColumn("n_cjk", nCjk)
      .withColumn("n_digit", nDigit)
      .withColumn("frac_latin",
        round(col("n_latin").cast("double") / col("n_chars"), 6))
      .withColumn("frac_cyrillic",
        round(col("n_cyrillic").cast("double") / col("n_chars"), 6))
      .withColumn("frac_cjk",
        round(col("n_cjk").cast("double") / col("n_chars"), 6))
      .withColumn("dominant_script",
        when(m === 0, "none")
          .when(col("n_latin") === m, "latin")
          .when(col("n_cyrillic") === m, "cyrillic")
          .when(col("n_greek") === m, "greek")
          .when(col("n_arabic") === m, "arabic")
          .otherwise("cjk"))
  }

  /** Length / punctuation / stopword quality features + a composite
    * score in [0, 1].
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nWords = size(split(t, " "))
    val punct = length(t) - length(regexp_replace(t, "[.,!?;:]", ""))
    val stop = countOccurrences(t, " the ") + countOccurrences(t, " a ")
    docs
      .withColumn("n_words", nWords)
      .withColumn("punct_ratio", round(punct.cast("double") / length(t), 6))
      .withColumn("stopword_ratio", round(stop.cast("double") / nWords, 6))
      .withColumn("quality",
        round(least(lit(1.0), nWords.cast("double") / 100) *
          (lit(1.0) - punct.cast("double") / length(t)), 6))
  }

  /** Sentence segmentation — the unit everything between document and
    * token operates on (per-sentence quality filters, sentence-level
    * dedup, sliding-window chunk alignment): a sentence is a maximal
    * run without terminal punctuation plus its trailing `[.!?]` run,
    * trimmed, empties dropped. Deliberately lookbehind-free — the
    * pattern is a plain character-class regex that means the same
    * thing in RE2 as in Java regex (lookbehind would be
    * JVM-only), which is what puts the segmentation on the oracle
    * hash path. One posexplode to (doc, sent) rows — the row shape
    * any per-sentence pass materializes anyway; everything before it
    * is per-row array expressions, zero shuffle.
    */
  def sentences(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val sents = filter(
      transform(regexp_extract_all(col(textCol),
        lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
      s => s =!= "")
    docs.select(col(idCol), posexplode(sents).as(Seq("__i", "sentence")))
      .select(col(idCol), (col("__i") + 1).cast("long").as("sent_id"),
        col("sentence"),
        size(split(col("sentence"), " ")).cast("long").as("n_words"))
  }

  /** Whitespace tokens + a BPE-ish regex token count + char count. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_chars_calc", length(t))
      .withColumn("ws_tokens", size(split(trim(t), "\\s+")))
      .withColumn("bpe_tokens", regexp_count(t, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")))
  }

  /** Sliding-window document chunking — split each document into
    * token windows of `maxTokens` with `overlap` tokens of context
    * carried between consecutive chunks (the context-window prep step
    * before embedding or training long corpora; RAG-style splitters
    * use exactly this stride contract).
    *
    * Chunk c starts at token c·(maxTokens−overlap); the last chunk may
    * be shorter but never empty; a document of ≤ maxTokens tokens
    * yields itself as chunk 0. Pure codegen'd array expressions — one
    * narrow map, zero shuffle (the deterministic-output sort is the
    * query layer's concern), scale-independent of document count.
    */
  def chunkDocs(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap")
    val stride = maxTokens - overlap
    docs
      .withColumn("__w", split(col(textCol), " "))
      .select(col(idCol),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(greatest(ceil((size(__w) - $maxTokens) / CAST($stride AS DOUBLE)), 0) AS INT)),
             |  c -> array_join(slice(__w, c * $stride + 1, $maxTokens), ' '))""".stripMargin))
          .as(Seq("chunk_id", "chunk")))
      .withColumn("n_tokens", size(split(col("chunk"), " ")))
  }

  /** Canonical-form md5 fingerprint: lowercase, collapsed whitespace.
    * (The rolling-hash variant lives in graft.functions.RollingHash.)
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fp_md5",
      md5(regexp_replace(lower(col(textCol)), "\\s+", " ").cast("binary")))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS algorithm): hash every word `k`-gram with the polynomial
    * rolling-hash kernel, slide a window of `w` consecutive gram
    * hashes, and select the minimum hash of each window (rightmost
    * occurrence on ties, per the paper). The distinct selected
    * (position, hash) pairs are the document's fingerprint — winnowing
    * guarantees any shared substring of length ≥ w+k−1 words yields at
    * least one shared fingerprint, which makes it the robust
    * substring-level dedup signal (vs whole-doc hashing's
    * all-or-nothing match).
    *
    * Emits `n_grams`, `n_fp` (fingerprint count) and `fp_digest` — an
    * md5 over the position-ordered selections (array outputs break
    * downstream tooling; a digest compares exactly). Pure codegen'd
    * array expressions over each row: zero shuffle, one narrow pass at
    * any corpus size. Per-window min recomputes over w elements
    * (O(n·w) per doc) — the classic O(n) monotonic-queue trick is a
    * per-row loop, invisible at w=4 and irrelevant next to the scan.
    */
  def winnowing(docs: DataFrame, k: Int = 3, w: Int = 4,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")
    // per-gram hashing + window selection run as codegen'd kernels
    // ([[graft.functions.Hashes.gram_rolling_hashes]] /
    // [[graft.functions.Hashes.winnow_select]]) — the expression
    // formulation built a gram string per position inside interpreted
    // transform() lambdas. Values are identical: grams i (1-based)
    // cover words [i, i+k) clamped (short docs produce one whole-text
    // gram, so every doc has >= 1 fingerprint); hashes compare as
    // SIGNED 64-bit (the oracle folds HUGEINT then reinterprets BEFORE
    // its list_min — same total order); window j (0-based) covers gram
    // indices [j, j+w) and selects the RIGHTMOST minimum as
    // "lpad(pos):hash", so plain STRING sort/distinct give the
    // canonical position order in both engines.
    docs
      .withColumn("__hs",
        graft.functions.Hashes.gram_rolling_hashes(col(textCol), k))
      .withColumn("__sel", graft.functions.Hashes.winnow_select(col("__hs"), w))
      .select(col(idCol),
        size(col("__hs")).cast("long").as("n_grams"),
        size(col("__sel")).cast("long").as("n_fp"),
        md5(array_join(array_sort(col("__sel")), ",")).as("fp_digest"))
  }

  /** Candidate near-dup pairs from shared winnowing fingerprints: two
    * docs are candidates when they select at least `minShared` common
    * window-min hashes — the substring-level analogue of MinHash LSH
    * banding, with winnowing's guarantee that any shared run of
    * ≥ w+k−1 words yields a shared fingerprint.
    *
    * Scale shape: NO self-join. Fingerprints group by hash and each
    * group expands to its doc-id combinations with a codegen'd nested
    * `transform` (a self-join on the fingerprint key would evaluate
    * the whole hashing pipeline once per side and shuffle the corpus
    * twice). Hashes selected by more than `maxDocsPerHash` docs are
    * dropped before expansion — boilerplate fingerprints otherwise
    * expand quadratically, exactly like a hot LSH bucket; the count
    * cut is deterministic so the oracle can mirror it.
    */
  def winnowingPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                     minShared: Int = 2, maxDocsPerHash: Int = 100,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minShared >= 1 && maxDocsPerHash >= 2,
      s"minShared >= 1 and maxDocsPerHash >= 2 required: $minShared/$maxDocsPerHash")
    // Per-gram hashing is CPU-bound at bytes-per-task rates far below
    // a scan split, so parallelism must come from partition COUNT, not
    // input size: a single-file local corpus arrives as 1-2 splits and
    // serializes the whole fingerprint pass. Spread it when (and only
    // when) the input has fewer partitions than cores — on a real
    // cluster a 100 TB scan already exceeds defaultParallelism and
    // this is a no-op, so the corpus never pays a gratuitous shuffle.
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions < cores) docs.repartition(cores) else docs
    spread
      // the doc's distinct window-min hashes (selection positions are
      // irrelevant for pairing) — gram hashing + window minima as
      // codegen'd kernels, same value contract as [[winnowing]]
      .select(col(idCol).as("__id"), explode(
        graft.functions.Hashes.window_min_distinct(
          graft.functions.Hashes.gram_rolling_hashes(col(textCol), k), w))
        .as("__h"))
      // explicit-N repartition on the group key: it satisfies the
      // groupBy's distribution (no second exchange) and, unlike the
      // planner's own exchange, is exempt from AQE partition
      // coalescing — fingerprint rows are only a few bytes each, so
      // AQE's byte heuristic would collapse this CPU-heavy
      // (collect_list + combination-expansion) stage to one task
      .repartition(cores, col("__h"))
      .groupBy("__h")
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .filter(size(col("__ids")).between(2, maxDocsPerHash))
      // per-hash doc-id combinations (ids sorted, so a < b by
      // construction and every pair appears once per hash), expanded
      // by two stacked generators instead of nested `transform`
      // lambdas: GenerateExec + slice stay inside whole-stage codegen,
      // while higher-order-function lambdas are interpreted per group —
      // at one tiny group per shared fingerprint the lambda dispatch
      // overhead dominated this stage's CPU by an order of magnitude
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "doc_a")))
      .select(col("doc_a"),
        explode(expr("slice(__ids, __i + 2, size(__ids))")).as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Repetition signals — the Gopher/C4-style "repetitious document"
    * filters: fraction of duplicate words and of duplicate word
    * 3-grams (1 − distinct/total). Machine-generated and boilerplate
    * text scores high; a pipeline gates on these exactly like quality.
    * Pure codegen'd array expressions — zero shuffle, one pass.
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val grams = expr(
      s"transform(sequence(0, greatest(size(split($textCol, ' ')) - 3, 0)), " +
      s"i -> array_join(slice(split($textCol, ' '), i + 1, 3), ' '))")
    docs
      .withColumn("n_words", size(words))
      .withColumn("dup_word_frac", round(
        lit(1.0) - size(array_distinct(words)).cast("double") / size(words), 6))
      .withColumn("n_grams", size(grams))
      .withColumn("dup_3gram_frac", round(
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6))
  }

  /** PII redaction — the scrub pass a training corpus runs before
    * anything else ships: emails, phone numbers, SSN-shaped ids, and
    * IPv4 addresses replaced with typed placeholders. Chained
    * codegen'd `regexp_replace` — one narrow map, zero shuffle, and
    * the patterns are dialect-portable (same regexes run in the
    * DuckDB oracle). Order matters and is part of the contract:
    * emails first (they contain digits and dots), then phones (the
    * leading `+` disambiguates them from SSNs), then SSNs, then IPs.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val steps = Seq(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
      "\\+\\d{1,2}-\\d{3}-\\d{4}" -> "<PHONE>",
      "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")
    docs.withColumn(textCol, steps.foldLeft(col(textCol)) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    })
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * one word `n`-gram with an evaluation set, with the overlap count
    * (the 13-gram check of GPT-3 appendix C / PaLM, here over word
    * shingles). Returns (id, n_contaminated_grams), ordered.
    *
    * Scale shape: the EVAL side is small by definition (benchmarks are
    * MBs) — its distinct gram hashes broadcast; the corpus side is one
    * narrow shingle map + explode, so the join is broadcast-hash with
    * ZERO corpus shuffle before the per-doc partial count. Grams ride
    * as xxhash64 longs, never strings (~2^-64 collision, the same
    * convention as MinHash verification).
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    def grams(df: DataFrame, cols: Column*) =
      df.select(cols :+ explode(
        graft.functions.Hashes.gram_hashes(col(textCol), n)).as("gh"): _*)
    val evalGrams = grams(evalDocs).distinct()
    grams(docs, col(idCol))
      .join(broadcast(evalGrams), "gh")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy(idCol)
  }

  /** C4-style line quality filtering (Raffel et al. 2020 §2.2): keep
    * only lines that end in terminal punctuation, have at least
    * `minWordsPerLine` words, and carry none of the boilerplate
    * markers ("javascript", "lorem ipsum", a curly brace); drop
    * documents with no surviving lines. Returns (id, text,
    * n_lines_kept) with surviving lines in original order.
    *
    * Pure codegen'd array expressions (`filter` HOF over the split
    * lines) — one narrow map; the only exchange is the final
    * deterministic-output orderBy. The terminal-punctuation test is
    * `right(l, 1)` rather than a `$`-anchored regex on purpose: Java
    * regex `$` also matches BEFORE a final line terminator while RE2's
    * does not, so a regex version silently judges CRLF lines
    * differently in Spark and in the DuckDB oracle — the last-char
    * comparison is byte-identical in both engines (a trailing `\r`
    * fails the test on both; strip CRLF upstream if it must pass).
    */
  def c4Clean(docs: DataFrame, minWordsPerLine: Int = 3,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine must be >= 1, got $minWordsPerLine")
    // fixed internal alias: the caller's column name never lands in a
    // raw SQL fragment (names needing backticks work like in every
    // sibling operator)
    val kept = expr(
      s"""filter(split(__t, '\n'), l ->
         |  right(l, 1) IN ('.', '!', '?', '"')
         |  AND size(split(l, ' ')) >= $minWordsPerLine
         |  AND NOT contains(lower(l), 'javascript')
         |  AND NOT contains(lower(l), 'lorem ipsum')
         |  AND NOT contains(l, '{'))""".stripMargin)
    docs.select(col(idCol), col(textCol).as("__t"))
      .select(col(idCol), kept.as("__kept"))
      .filter(size(col("__kept")) > 0)
      .select(col(idCol),
        array_join(col("__kept"), "\n").as(textCol),
        size(col("__kept")).as("n_lines_kept"))
      .orderBy(idCol)
  }

  /** WITHIN-document repeated-line removal — the in-document half of
    * the RefinedWeb/MassiveText boilerplate pass ([[c4Clean]] gates
    * line QUALITY, [[graft.dedup.Dedup.dedupLines]] drops lines hot
    * ACROSS the corpus; this drops lines repeated INSIDE one document:
    * scraped nav menus, cookie banners, footer blocks that repeat per
    * page). Keeps each line's FIRST occurrence, in order.
    *
    * Pure per-row codegen'd array expressions — zero shuffle
    * (deterministic-output sort aside). The positional filter is
    * O(lines²) per doc; line counts are tens, the text scan dominates.
    */
  def dedupLinesWithinDoc(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    docs.select(col(idCol), split(col(textCol), "\n").as("__l"))
      .select(col(idCol),
        size(col("__l")).cast("long").as("n_lines"),
        // first occurrences in order: Spark's filter-HOF index is
        // 0-based, array_position 1-based
        expr("filter(__l, (x, i) -> array_position(__l, x) = i + 1)").as("__k"))
      .select(col(idCol), col("n_lines"),
        size(col("__k")).cast("long").as("n_lines_kept"),
        array_join(col("__k"), "\n").as(textCol))
      .orderBy(idCol)
  }

  /** Unigram log-probability scoring — the CCNet-style LM-quality
    * proxy: score each document by the mean log P(word) under the
    * corpus's OWN unigram distribution. Gibberish, OCR noise, and
    * rare-token spam score low; fluent text tracks the corpus mode.
    *
    * Two corpus passes: (1) explode + groupBy builds the unigram
    * table — vocab-bounded output (Zipf: MBs at any corpus size);
    * (2) scoring re-explodes and joins the BROADCAST freq table, so
    * the corpus itself never shuffles — the only wide exchange is the
    * per-doc partial count/sum.
    *
    * Determinism contract: per-word logp rounds to 9 decimals and
    * sums as exact decimals, so the result is identical on any
    * partitioning AND reproducible by the SQL oracle (double `ln`
    * may differ by an ulp across engines; the rounding absorbs it).
    */
  /** CCNet-style perplexity partitioning (Wenzek et al. 2020): split
    * the corpus into head/middle/tail thirds by the LM-quality proxy
    * ([[unigramLogProb]]'s mean log-prob — higher = more
    * in-distribution; CCNet buckets on exactly this signal, with
    * a KenLM in place of the self-trained unigram model), the
    * standard precursor to training-data mixing ("train on head,
    * sample middle, drop tail").
    *
    * Scale shape: bucket by TERCILE THRESHOLDS compared per row — the
    * two cut points are one tiny aggregate broadcast back — NOT by a
    * global ntile, which would range-sort the whole corpus through a
    * single-partition window. Ties at a cut go to the better bucket
    * (>=). Cuts round to 9 dp (absorbing interpolation ulp drift)
    * over the 6 dp scores, so the verdict reproduces cross-engine.
    */
  def perplexityBuckets(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        exactCuts: Boolean = true): DataFrame = {
    val scores = unigramLogProb(docs, textCol, idCol)
      .select(col(idCol), col("mean_logp"))
    // exactCuts = true: percentile() — oracle-reproducible, but its
    // merge state is O(distinct score values) on one reducer; fine up
    // to millions of distinct 6dp scores. At real corpus scale pass
    // false: approx_percentile's KLL-class sketch is bounded-memory
    // and the thresholds only steer a three-way split. (The two
    // passes over the score pipeline are inherent — cuts must exist
    // before bucketing; a deployment checkpoints `scores` between.)
    val (tHead, tMid) =
      if (exactCuts) (expr("percentile(mean_logp, 2.0D / 3.0D)"),
        expr("percentile(mean_logp, 1.0D / 3.0D)"))
      else (expr("approx_percentile(mean_logp, 2.0D / 3.0D, 10000)"),
        expr("approx_percentile(mean_logp, 1.0D / 3.0D, 10000)"))
    val cuts = scores.agg(
      round(tHead, 9).as("__t_head"), round(tMid, 9).as("__t_mid"))
    scores.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("mean_logp") >= col("__t_head"), "head")
          .when(col("mean_logp") >= col("__t_mid"), "middle")
          .otherwise("tail"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("mean_logp").cast("decimal(30,12)")).cast("double") /
          count(lit(1)), 6).as("mean_logp"),
        round(min(col("mean_logp")), 6).as("min_logp"),
        round(max(col("mean_logp")), 6).as("max_logp"))
      .orderBy("bucket")
  }

  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    val freq = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum("cnt").as("total"))
    words.join(broadcast(freq), "w").crossJoin(broadcast(tot))
      .withColumn("logp",
        round(log(col("cnt").cast("double") / col("total")), 9).cast("decimal(30,12)"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        round(sum(col("logp")).cast("double") / count(lit(1)), 6).as("mean_logp"))
      .orderBy(idCol)
  }

  /** Per-doc mean log-probability under an INTERPOLATED BIGRAM model
    * trained on the corpus itself — one model order up from
    * [[unigramLogProb]], the Spark-expressible analog of the KenLM-
    * style perplexity gate most large corpus builds run (docs far
    * below the corpus-typical score are boilerplate/gibberish; far
    * above are degenerate repetition).
    *
    * Model: p(b|a) = λ·C(ab)/C(a·) + (1−λ)·C(·b)/T over the corpus
    * bigram stream (counts all derived from one groupBy of the pair
    * stream). Scale shape: the token-pair stream is formed WITHOUT a
    * shuffle (posexplode over the word array + element_at — no
    * self-join, no window), then exchanged ONCE on (a, b); both
    * consumers — the model's count aggregation and the scoring join —
    * require exactly that distribution, so ReuseExchange shares one
    * evaluation + one shuffle write of the expensive subtree (the r8
    * "one consumer per expensive subtree" rule; previously the stream
    * was formed twice). The big exchange is the honest 100 TB cost:
    * the distinct-bigram model of a web corpus does NOT broadcast, so
    * the scoring join shuffles the stream regardless — sharing it with
    * the model build makes that shuffle pay for both. Derived count
    * tables (C(a·), C(·b), T) re-aggregate from the reused shuffle
    * files — local reads of bounded bigram-count rows, not re-parses
    * of the corpus.
    *
    * Determinism: identical IEEE op order to the SQL oracle; per-
    * bigram log-probs round to 9 dp and sum as exact decimals, the
    * per-doc mean rounds to 6. Docs with fewer than two words have no
    * bigrams and are absent from the output.
    */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.75,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1]: $lambda")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__w"))
    // the ONE exchange of the expensive subtree: every consumer below
    // (model count agg, scoring join) sits directly on this repartition,
    // so physical planning emits a single shuffle of the pair stream and
    // ReusedExchange serves every other reader from its shuffle files
    val pairs = toks
      .select(col(idCol), col("__w"),
        posexplode(slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))))
          .as(Seq("i", "a")))
      .select(col(idCol), col("a"),
        element_at(col("__w"), col("i") + lit(2)).as("b"))
      // b is never null (i+2 <= size by the slice bound) — but the
      // scoring join INFERS isnotnull(b) into its branch; stating it
      // explicitly puts the same Filter in every branch, keeping all
      // five consumers' subtrees canonically identical for stage reuse
      .filter(col("b").isNotNull)
      .repartition(col("a"), col("b"))
    // the when-guard keeps idCol in this consumer's column set (true by
    // construction: doc ids are non-null keys) — column pruning would
    // otherwise push a narrower Project under the repartition and split
    // the exchange into non-identical (un-reusable) copies; same trick
    // as Bm25.search, and a plain coalesce won't do (NullPropagation
    // folds count(non-nullable) back to count(1) and re-enables pruning)
    val big = pairs.groupBy("a", "b")
      .agg(count(when(col(idCol).isNotNull, 1)).as("c_ab"))
    val ctx = big.groupBy("a").agg(sum("c_ab").as("c_a"))
    val nxt = big.groupBy("b").agg(sum("c_ab").as("c_b"))
    val tot = big.agg(sum("c_ab").cast("double").as("t"))
    val model = big.join(ctx, "a").join(nxt, "b").crossJoin(broadcast(tot))
      .select(col("a"), col("b"), round(log(
        lit(lambda) * (col("c_ab").cast("double") / col("c_a")) +
          lit(1.0 - lambda) * (col("c_b").cast("double") / col("t"))), 9)
        .cast("decimal(30,12)").as("logp"))
    pairs.join(model, Seq("a", "b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("logp")).cast("double") / count(lit(1)), 6).as("mean_logp"))
      .orderBy(idCol)
  }

  /** Per-doc mean log-probability under an interpolated KNESER-NEY
    * bigram model — the smoothing KenLM actually ships (and the one
    * CCNet-class perplexity gates are calibrated against), one rung
    * up from [[bigramLogProb]]'s count-interpolation: the backoff
    * distribution is the CONTINUATION probability (how many distinct
    * contexts a word follows — "francisco" is frequent but follows
    * almost nothing, so its KN backoff mass is tiny where a raw
    * unigram model overrates it), and probability mass moves by
    * absolute discounting:
    *
    *   p(b|a) = max(C(ab) − D, 0)/C(a·)
    *            + D · N1+(a·)/C(a·) · N1+(·b)/N1+(··)
    *
    * with N1+ the distinct-bigram-type counts. All four count tables
    * derive from ONE groupBy of the same pair stream
    * [[bigramLogProb]] shares (the single honest exchange — model
    * build and scoring join reuse its shuffle files); the type
    * counts are plain `count(*)` over the bigram-count table, no
    * extra corpus pass. Every scored bigram is in-model by
    * construction (trained on the stream it scores), so the
    * discounted term is always ≥ (1 − D)/C(a·) > 0 and the log is
    * total.
    *
    * Determinism: D = 0.75 is exact in binary, per-bigram log-probs
    * round to 9 dp and sum as exact decimals, the per-doc mean
    * rounds to 6 — identical IEEE op order to the SQL oracle. Docs
    * with fewer than two words have no bigrams and are absent.
    */
  def kneserNeyLogProb(docs: DataFrame, discount: Double = 0.75,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1): $discount")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__w"))
    val pairs = toks
      .select(col(idCol), col("__w"),
        posexplode(slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))))
          .as(Seq("i", "a")))
      .select(col(idCol), col("a"),
        element_at(col("__w"), col("i") + lit(2)).as("b"))
      .filter(col("b").isNotNull)
      .repartition(col("a"), col("b"))
    // the idCol when-guard: same exchange-reuse contract as
    // bigramLogProb (column pruning would split the shared shuffle)
    val big = pairs.groupBy("a", "b")
      .agg(count(when(col(idCol).isNotNull, 1)).as("c_ab"))
    // N1+(a.) = distinct bigram types per context = rows of big per a
    val ctx = big.groupBy("a")
      .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1a"))
    val nxt = big.groupBy("b").agg(count(lit(1)).as("n1b"))
    val tot = big.agg(count(lit(1)).cast("double").as("np"))
    val model = big.join(ctx, "a").join(nxt, "b").crossJoin(broadcast(tot))
      .select(col("a"), col("b"), round(log(
        greatest(col("c_ab").cast("double") - lit(discount), lit(0.0)) / col("c_a") +
          lit(discount) * (col("n1a").cast("double") / col("c_a")) *
            (col("n1b").cast("double") / col("np"))), 9)
        .cast("decimal(30,12)").as("logp"))
    pairs.join(model, Seq("a", "b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("logp")).cast("double") / count(lit(1)), 6).as("mean_logp"))
      .orderBy(idCol)
  }

  /** Per-doc mean log-probability under an interpolated TRIGRAM
    * Kneser-Ney model with RECURSIVE backoff — KenLM's standard order
    * extended from [[kneserNeyLogProb]]'s order-2 special case (Chen
    * & Goodman 1999 interpolated form, single discount D per level):
    *
    *   p₃(c|ab) = max(C(abc)−D, 0)/C(ab·)
    *              + D·N1+(ab·)/C(ab·) · p₂(c|b)
    *   p₂(c|b)  = max(N1+(·bc)−D, 0)/N1+(·b·)
    *              + D·N1+(b·)/N1+(·b·) · p₁(c)
    *   p₁(c)    = N1+(·c)/N1+(··)
    *
    * where the lower-level "counts" are CONTINUATION type counts
    * derived from the trigram type table (the KenLM convention: each
    * level's counts come from the order above it, so "francisco"
    * backs off small however often it follows "san"). Every count
    * table is a re-aggregation of the ONE trigram-type groupBy, which
    * itself sits on the single honest (a,b,c) exchange of the trigram
    * stream — the scoring join reuses the same shuffle files
    * (bigramLogProb's ReuseExchange contract, one order up). Every
    * scored trigram is in-model (trained on the stream it scores), so
    * p₃ ≥ (1−D)·D·(stuff > 0) … strictly positive and the log total.
    *
    * Determinism: D = 0.75 exact in binary, per-trigram log-probs
    * round to 9 dp and sum as exact decimals, per-doc mean rounds to
    * 6 — the oracle replays the identical IEEE op order. Docs with
    * fewer than three words have no trigrams and are absent.
    *
    * Scale shape: one (a,b,c)-keyed exchange of the trigram stream +
    * bounded type-table re-aggregations — trigram-TYPE growth is
    * super-bigram (the d_kneser_ney soak lesson, one order worse) and
    * inherent to the model; everything else is node-shaped joins on
    * the type tables.
    */
  def kneserNeyTrigramLogProb(docs: DataFrame, discount: Double = 0.75,
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1): $discount")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__w"))
    val tris = toks
      .select(col(idCol), col("__w"),
        posexplode(slice(col("__w"), lit(1), greatest(size(col("__w")) - 2, lit(0))))
          .as(Seq("i", "a")))
      .select(col(idCol), col("a"),
        element_at(col("__w"), col("i") + lit(2)).as("b"),
        element_at(col("__w"), col("i") + lit(3)).as("c"))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .repartition(col("a"), col("b"), col("c"))
    // the idCol when-guard: same exchange-reuse contract as
    // bigramLogProb (column pruning would split the shared shuffle)
    val tri = tris.groupBy("a", "b", "c")
      .agg(count(when(col(idCol).isNotNull, 1)).as("c_abc"))
    // highest level: context totals + distinct-continuation types per (a,b)
    val ctx = tri.groupBy("a", "b")
      .agg(sum("c_abc").as("c_ab"), count(lit(1)).as("n1_ab"))
    // bigram-type table with continuation counts: rows of tri per
    // (b,c) = N1+(·bc) (tri is distinct on (a,b,c))
    val bt = tri.groupBy("b", "c").agg(count(lit(1)).as("n1_bc"))
    // middle-level context: N1+(·b·) = Σ_c N1+(·bc); N1+(b·) = rows per b
    val mid = bt.groupBy("b")
      .agg(sum("n1_bc").as("n1_mb"), count(lit(1)).as("nt_b"))
    // lowest level: N1+(·c) over bigram types; N1+(··) = |bt|
    val uni = bt.groupBy("c").agg(count(lit(1)).as("n1_c"))
    val tot = bt.agg(count(lit(1)).cast("double").as("nb"))
    val d = lit(discount)
    val model = tri.join(ctx, Seq("a", "b")).join(bt, Seq("b", "c"))
      .join(mid, Seq("b")).join(uni, Seq("c")).crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("c"), round(log(
        greatest(col("c_abc").cast("double") - d, lit(0.0)) / col("c_ab") +
          d * (col("n1_ab").cast("double") / col("c_ab")) *
            (greatest(col("n1_bc").cast("double") - d, lit(0.0)) / col("n1_mb") +
              d * (col("nt_b").cast("double") / col("n1_mb")) *
                (col("n1_c").cast("double") / col("nb")))), 9)
        .cast("decimal(30,12)").as("logp"))
    tris.join(model, Seq("a", "b", "c"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(col("logp")).cast("double") / count(lit(1)), 6).as("mean_logp"))
      .orderBy(idCol)
  }

  /** Per-language corpus roll-up: the pipeline-health dashboard over a
    * corpus — doc counts, token volume, duplicate fingerprints, mean
    * quality. One narrow map (all of the above) + one partial-agg
    * shuffle of per-language states.
    */
  /** Character-entropy quality signal — per-document Shannon entropy
    * (bits/char) of the character distribution. Low entropy flags
    * repeated-character spam, padding, and template boilerplate; very
    * high entropy flags binary-in-text and encoding garbage — both
    * tails get gated in C4/RefinedWeb-style cleaning, alongside
    * [[repetitionSignals]] (which sees word-level repetition this
    * signal misses, and vice versa).
    *
    * Scale shape: a pure per-row computation — zero shuffle, one
    * narrow pass, no per-doc groupBy (a char-explode + groupBy would
    * shuffle ~1 row per CHARACTER of a 100 TB corpus for a histogram
    * every row can build locally). The distinct-char alphabet of real
    * text is tiny (≤ a few hundred), so the O(alphabet · len)
    * filter-count is ~one extra scan of each string.
    *
    * Determinism contract (TfIdf convention): each character's
    * p·log2(p) term rounds to 9 decimals and sums as exact decimals
    * (associative ⇒ any partitioning), entropy emits rounded to 6 —
    * bit-reproducible by a SQL oracle across engines' log ulp drift.
    * Characters are code points on both sides for BMP text; non-BMP
    * (surrogate-pair) input diverges between engines' split("")
    * semantics and is out of the oracle contract.
    */
  /** Deflate compression ratio per document — the quality gate
    * char-level entropy can't fully express: zlib models REPEATED
    * SUBSTRINGS, so boilerplate spam, template farms and
    * keyword-stuffing compress far below prose (ratio = compressed /
    * raw bytes; RefinedWeb-class pipelines gate on exactly this
    * signal), while binary garbage refuses to compress (ratio ≈ 1).
    * Complements [[charEntropy]] (distribution-level) and
    * [[repetitionSignals]] (word/3-gram-level) with the
    * arbitrary-length-repeat view.
    *
    * Genuinely imperative per-row work (a zlib stream), so this is
    * the mapPartitions batch shape the media decoders use: ONE
    * Deflater per partition, reset between rows — allocation cost
    * amortizes, zero shuffle, pipelines inside the scan. Ratios are
    * deterministic for a given JDK (Deflater is pure JDK code, no
    * native zlib version drift inside one runtime), hence rows-only +
    * spec rather than a cross-engine oracle: DuckDB has no deflate.
    */
  def compressionRatio(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level in [1,9]: $level")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level, true)
        // Deflater holds NATIVE memory — release it when the task ends
        // rather than waiting on finalization (a long-lived executor
        // running many partitions would otherwise accumulate native
        // buffers until GC happens to notice)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val raw = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio =
            if (raw.length == 0) 1.0
            else BigDecimal(compressed.toDouble / raw.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, raw.length.toLong, compressed, ratio)
        }
      }
      .toDF(idCol, "raw_bytes", "compressed_bytes", "ratio")
  }

  def charEntropy(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    // fixed internal alias so caller column names never land raw in a
    // SQL fragment (c4Clean convention)
    val withT = docs.select(col(idCol), col(textCol).as("__t"))
    val entropy = expr(
      """CASE WHEN length(__t) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
        |round(CAST(-aggregate(
        |  transform(array_distinct(split(__t, '')),
        |    c -> CAST(round(
        |      (size(filter(split(__t, ''), x -> x = c)) / CAST(length(__t) AS DOUBLE))
        |        * log2(size(filter(split(__t, ''), x -> x = c)) / CAST(length(__t) AS DOUBLE)),
        |      9) AS DECIMAL(30,12))),
        |  CAST(0 AS DECIMAL(38,12)),
        |  (acc, t) -> CAST(acc + t AS DECIMAL(38,12))) AS DOUBLE), 6)
        |END""".stripMargin)
    withT.select(col(idCol),
      length(col("__t")).cast("long").as("n_chars"),
      // split('', '') yields [""], not [] — guard the empty doc
      when(length(col("__t")) === 0, lit(0L))
        .otherwise(size(array_distinct(split(col("__t"), ""))).cast("long"))
        .as("n_unique_chars"),
      entropy.as("entropy"))
      .orderBy(idCol)
  }

  /** Gopher quality rules (Rae et al. 2021, appendix A1.1) — the
    * classic composite document gate, emitted as SIGNALS plus the
    * combined verdict so a pipeline can tune thresholds without
    * recomputing:
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10] chars
    *   - symbol-to-word ratio (# or ...) ≤ 0.1
    *   - ≤ 90% of lines bullet-started, ≤ 30% ellipsis-ended
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 distinct required stop words present
    *
    * Pure per-row codegen'd array expressions — zero shuffle, one
    * narrow pass (deterministic-output sort aside), same shape as
    * [[repetitionSignals]]/[[charEntropy]]. All ratios are exact
    * int/int IEEE divisions rounded to 6dp, so a SQL oracle
    * reproduces every signal and the verdict bit-for-bit.
    */
  def gopherRules(docs: DataFrame, minWords: Long = 50,
                  maxWords: Long = 100000,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got $minWords/$maxWords")
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val d = docs.select(col(idCol), col(textCol).as("__t"))
      .withColumn("__w", split(col("__t"), " "))
      .withColumn("__l", split(col("__t"), "\n"))
    val nW = size(col("__w")).cast("long")
    val meanLen = round(
      expr("aggregate(transform(__w, w -> length(w)), 0L, (a, x) -> a + x)")
        .cast("double") / nW, 6)
    // occurrence counts by length difference — dialect-free
    val nHash = length(col("__t")) - length(regexp_replace(col("__t"), "#", ""))
    val nEll = (length(col("__t")) -
      length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / 3
    val symbolRatio = round((nHash + nEll).cast("double") / nW, 6)
    val nL = size(col("__l")).cast("long")
    val bulletFrac = round(
      expr("size(filter(__l, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %'))")
        .cast("double") / nL, 6)
    val ellipsisFrac = round(
      expr("size(filter(__l, l -> right(l, 3) = '...'))").cast("double") / nL, 6)
    val alphaFrac = round(
      expr("size(filter(__w, w -> w RLIKE '[a-zA-Z]'))").cast("double") / nW, 6)
    val nStop = stopwords.map(s =>
      when(array_contains(col("__w"), s), 1L).otherwise(0L)).reduce(_ + _)
    d.select(col(idCol), nW.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"), alphaFrac.as("alpha_word_frac"),
        nStop.as("n_stopwords_present"))
      .withColumn("pass",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("alpha_word_frac") >= 0.8 &&
        col("n_stopwords_present") >= 2)
      .orderBy(idCol)
  }

  /** Exact top-V vocabulary with cumulative stream coverage — the
    * tokenizer-prep question "how much of the corpus does a V-entry
    * vocabulary cover?" (vocab truncation / UNK-rate analysis; the
    * exact counterpart of [[graft.ops.HeavyHitters]]' sketch path).
    *
    * Scale shape: one token explode into a map-side-combined partial
    * aggregate — the only wide exchange is vocab-bounded (Zipf: MBs
    * at any corpus size), and the top-V cut is a TakeOrdered, not a
    * global sort. The rank/cumulative window runs over V rows only
    * (single tiny partition by construction). Ties break (count desc,
    * token asc); coverage = exact integer cumsum / total, rounded 6dp.
    */
  def vocabTopK(docs: DataFrame, v: Int,
                textCol: String = "text"): DataFrame = {
    require(v >= 1, s"v must be >= 1, got $v")
    val freq = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum("cnt").as("total"))
    val order = Seq(col("cnt").desc, col("token").asc)
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    freq.orderBy(order: _*).limit(v)
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
      .withColumn("cum_coverage",
        round(sum(col("cnt")).over(w).cast("double") / col("total"), 6))
      .select(col("rank").cast("long").as("rank"), col("token"),
        col("cnt"), col("cum_coverage"))
      .orderBy("rank")
  }

  def corpusStats(docs: DataFrame, textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val enriched = fingerprint(
      qualityScore(tokenCounts(docs, textCol), textCol), textCol)
    enriched.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens").cast("long")).as("total_ws_tokens"),
        countDistinct(col("fp_md5")).as("n_unique_fp"),
        (sum(col("quality").cast("decimal(30,12)")).cast("double") /
          count(lit(1))).as("quality_avg"))
      .orderBy(langCol)
  }

  /** Cross-source n-gram overlap matrix — provenance/contamination
    * analysis over a multi-source corpus: for every source pair, how
    * many distinct word n-grams they share and the Jaccard of their
    * gram sets. The report that answers "which crawl snapshots /
    * vendors overlap enough that cross-source dedup must run before
    * mixing" and "does any source leak into the eval source".
    *
    * Scale shape: grams never materialize as strings — the codegen'd
    * GramHashes expression emits distinct 64-bit gram hashes per doc
    * map-side, so the ONE corpus-shaped exchange carries (8 B hash,
    * source) rows keyed by hash. Pair counting uses the bucketPairs
    * pattern (Dedup.scala candidate generation), not a gram-table
    * self-join: each gram's deduped source set expands its (a < b)
    * combinations inside codegen — fan-out per gram bounded by
    * |sources|², output matrix |sources|² rows, and per-source totals
    * ride the SAME hash-keyed exchange (ReusedExchange serves the
    * second aggregation). Source pairs sharing zero grams are absent
    * (inner semantics — the oracle mirrors this).
    *
    * Hash-collision tolerance matches every other gram consumer
    * (MinHash, Jaccard-on-hashes): counts are over distinct 64-bit
    * hashes, which the string-gram oracle reproduces exactly unless
    * two distinct grams of the same corpus collide.
    */
  def domainOverlap(docs: DataFrame, n: Int, textCol: String = "text",
                    domainCol: String = "source"): DataFrame = {
    require(n > 0, s"gram size must be > 0: $n")
    val sets = docs
      .select(col(domainCol).as("src"),
        explode(graft.functions.Hashes.gram_hashes(col(textCol), n)).as("h"))
      .groupBy("h").agg(array_sort(collect_set(col("src"))).as("srcs"))
    val tot = sets.select(explode(col("srcs")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n_grams"))
    val pairs = sets.filter(size(col("srcs")) > 1)
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |            y -> struct(x AS src_a, y AS src_b))))""".stripMargin))
        .as("p"))
      .groupBy("p.src_a", "p.src_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(tot.select(col("src").as("src_a"), col("n_grams").as("grams_a"))), "src_a")
      .join(broadcast(tot.select(col("src").as("src_b"), col("n_grams").as("grams_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        col("shared"),
        round(col("shared").cast("double") /
          (col("grams_a") + col("grams_b") - col("shared")), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown → plain text for code/docs corpora (The Stack, RedPajama
  * GitHub, StackExchange dumps arrive as markdown): the text gates
  * downstream — langId, quality scores, shingle dedup, tokenizer
  * training — all assume PROSE, and raw markdown syntax (link urls,
  * fence payloads, emphasis runs) pollutes every one of them.
  *
  * The transform is a FIXED ORDER of plain regexp_replace passes,
  * deliberately lookbehind-free and backreference-free in the MATCH
  * (RE2-compatible — the same patterns mean the same thing in Java
  * regex and in DuckDB/RE2, which is what puts the stripped text on
  * the oracle hash path):
  *
  *  1. fenced code blocks ```...``` drop whole (code is not prose;
  *     a code-aware pipeline routes fences to a code pipeline BEFORE
  *     this pass)
  *  2. images ![alt](url) → alt   (before links — the ! form nests)
  *  3. links  [text](url) → text
  *  4. inline code `x` → x        (after fences — a fence's interior
  *     backticks are already gone)
  *  5. ATX headers: leading #-runs strip (the title text stays)
  *  6. blockquote '>' markers strip
  *  7. emphasis ***x*** / **x** / *x* and __x__ unwrap (single _
  *     deliberately left alone: snake_case identifiers are data)
  *  8. unordered/ordered list markers strip
  *  9. horizontal rules drop
  *
  * Counts (links, images, fences, code spans, headers) are taken
  * BEFORE stripping — markdown density is a quality signal in its
  * own right (a README wall of links reads very differently from
  * prose documentation).
  *
  * Scale shape: pure per-row codegen'd string expressions — zero
  * shuffle, column-prunable, partitioning-independent.
  */
object Markdown {

  /** Markdown syntax counts over raw text, cheap quality signals.
    * n_links is (all bracket-paren forms) − (image forms): an image
    * `![a](u)` contains a plain-link match starting one char in, and
    * subtraction keeps the patterns lookbehind-free (RE2 has no
    * lookbehind — the count must replay in any engine).
    */
  def counts(text: Column): Seq[(String, Column)] = {
    val images = regexp_count(text, lit("!\\[[^\\]]*\\]\\([^)]*\\)"))
    Seq(
      "n_code_blocks" -> regexp_count(text, lit("(?s)```.*?```")),
      "n_images" -> images,
      "n_links" ->
        (regexp_count(text, lit("\\[[^\\]]*\\]\\([^)]*\\)")) - images),
      "n_headers" -> regexp_count(text, lit("(?m)^#{1,6} ")))
  }

  /** The stripped text — the fixed regexp chain above as one Column. */
  def stripColumn(text: Column): Column = {
    val noFence = regexp_replace(text, "(?s)```.*?```", "")
    val noImg = regexp_replace(noFence, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noCode = regexp_replace(noLink, "`([^`]*)`", "$1")
    val noHead = regexp_replace(noCode, "(?m)^#{1,6} +", "")
    val noQuote = regexp_replace(noHead, "(?m)^> ?", "")
    val noEm = regexp_replace(
      regexp_replace(noQuote, "\\*{1,3}([^*\\n]+)\\*{1,3}", "$1"),
      "__([^_\\n]+)__", "$1")
    val noList = regexp_replace(noEm, "(?m)^[ \\t]*([-*+]|\\d+\\.) +", "")
    val noRule = regexp_replace(noList, "(?m)^ *(-{3,}|\\*{3,}) *$", "")
    trim(regexp_replace(noRule, "\\n{3,}", "\n\n"))
  }

  /** Per-doc stripped text + markdown-density counts. */
  def strip(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol) +:
        stripColumn(t).as("md_text") +:
        counts(t).map { case (n, c) => c.cast("long").as(n) }: _*)
  }
}

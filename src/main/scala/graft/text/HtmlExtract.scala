package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the step every crawl-sourced curation
  * pipeline (C4, RefinedWeb, FineWeb) runs BEFORE the text gates this
  * repo already ships (c4Clean, gopher rules, line dedup all assume
  * clean `text`). Strips markup, segments the page into block-level
  * units, and applies a jusText-style boilerplate rule per block
  * (Pomikálek 2011: boilerplate blocks are short and/or link-dense
  * and/or stopword-poor — navigation, footers, cookie banners), then
  * reassembles the kept blocks into the document text.
  *
  * Scale shape: the whole operator is per-row array expressions —
  * split / transform / filter / aggregate over the block array — so
  * it is ZERO-shuffle and pipelines inside the scan stage. No explode
  * + groupBy round-trip (that would shuffle one row per BLOCK of a
  * 100 TB crawl), no UDF. This is deliberately a regex tag parser,
  * not an HTML5 tree builder: block segmentation + density gates are
  * robust to the malformed markup real crawls carry (unclosed tags
  * degrade into larger blocks, never errors), and the reference
  * pipelines' extractors are the same class of tool.
  *
  * Reference behavior anchor: the C4 paper's "lines" and jusText's
  * "blocks" both segment on block-level elements; link density =
  * anchor-text chars / block chars; `<script>`/`<style>`/`<head>`
  * content never reaches the text. (reference repo has no HTML
  * ingest — its sources are relational tables; this opens the crawl
  * front the brief's curation mandate starts from.)
  */
object HtmlExtract {

  /** Tags that delimit text blocks (display:block / structural).
    * `br`/`hr` count: consecutive inline runs separated by them are
    * distinct visual blocks, which is what the density rule wants.
    */
  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|blockquote|pre" +
      "|section|article|header|footer|nav|aside|main|form|fieldset|figure" +
      "|figcaption|address|center|body|html|title|br|hr"

  /** Drop these elements with their CONTENT (non-rendered or
    * head-only); comments too. (?is) = case-insensitive + dotall so
    * multi-line scripts and uppercase legacy markup both match.
    */
  private def stripNonContent(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?is)<head\\b[^>]*>.*?</head>", " ")
  }

  /** Inline-tag strip + character-reference decode + whitespace
    * collapse. The decode is [[graft.functions.HtmlKernels]]'s
    * single left-to-right pass over named AND numeric (`&#8217;`,
    * `&#x2019;`) references — the scan continues after each
    * replacement, so `&amp;lt;` yields the literal `&lt;` (the
    * decode-order contract the old `&amp;`-last regexp chain kept).
    * Decoded characters are text, never markup: tags were stripped
    * BEFORE the decode, so `&#x3C;p&#x3E;` stays visible text.
    */
  private def blockText(seg: Column): Column = {
    val noTags = regexp_replace(seg, "<[^>]*>", " ")
    trim(regexp_replace(graft.functions.Html.decode_entities(noTags), "\\s+", " "))
  }

  /** Extract article text from `htmlCol`: returns one row per input
    * row with every non-html input column passed through plus `text`
    * (kept blocks joined by \n — empty string when every block is
    * boilerplate), `n_blocks_kept`, `n_blocks_dropped`. Input columns
    * named `text`/`n_blocks_kept`/`n_blocks_dropped` would collide —
    * rename before calling.
    *
    * Keep rule per block (jusText-style):
    *   - normalized length >= `minChars` (short blocks are headers /
    *     buttons / crumbs)
    *   - anchor-text chars / block chars <= `maxLinkDensity`
    *     (navigation and footers are link-dense)
    *   - stopword fraction >= `minStopwordFrac` when `stopwords` is
    *     non-empty (full-sentence prose carries function words;
    *     jusText's low/high-stopword split). Empty list = gate off,
    *     for corpora whose language has no curated list.
    */
  def extract(docs: DataFrame, htmlCol: String = "html",
              idCol: String = "doc_id",
              maxLinkDensity: Double = 0.2, minChars: Int = 20,
              stopwords: Seq[String] = Nil,
              minStopwordFrac: Double = 0.0): DataFrame = {
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity in [0,1]: $maxLinkDensity")
    require(minChars >= 0, s"minChars >= 0: $minChars")
    require(minStopwordFrac >= 0 && minStopwordFrac <= 1,
      s"minStopwordFrac in [0,1]: $minStopwordFrac")

    val segs = split(stripNonContent(col(htmlCol)),
      s"(?i)</?(?:$BlockTags)\\b[^>]*>")
    // per segment: visible text, and visible text with anchor CONTENT
    // removed — the length difference is the anchor-text contribution
    // (both sides whitespace-normalized, so the ratio is stable)
    val blocks = filter(
      transform(segs, seg => struct(
        blockText(seg).as("txt"),
        blockText(regexp_replace(seg, "(?is)<a\\b[^>]*>.*?</a>", " ")).as("noa"))),
      b => b.getField("txt") =!= "")

    val swLit = array(stopwords.map(w => lit(w.toLowerCase)): _*)
    def stopFrac(txt: Column): Column = {
      val ws = split(txt, " ")
      size(filter(ws, w => array_contains(swLit, lower(w)))).cast("double") /
        size(ws).cast("double")
    }
    def keep(b: Column): Column = {
      val txt = b.getField("txt")
      val len = length(txt).cast("double")
      val linkDen = (len - length(b.getField("noa")).cast("double")) / len
      val base = length(txt) >= minChars && linkDen <= maxLinkDensity
      if (stopwords.isEmpty) base
      else base && stopFrac(txt) >= minStopwordFrac
    }

    val kept = filter(blocks, keep(_))
    // every non-html input column passes through (idCol first for the
    // common (id, text, …) shape) — callers carrying fetch metadata or
    // a domain annotation keep it without a join-back
    val passthrough = idCol +: docs.columns.filterNot(c => c == htmlCol || c == idCol)
    docs.select(passthrough.map(col) ++ Seq(
      array_join(transform(kept, _.getField("txt")), "\n").as("text"),
      size(kept).cast("long").as("n_blocks_kept"),
      (size(blocks) - size(kept)).cast("long").as("n_blocks_dropped")): _*)
  }
}

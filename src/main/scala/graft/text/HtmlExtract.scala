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

  // one match per anchor element; group 1 = quoted-or-bare href value,
  // group 2 = anchor inner markup. Three parallel regexp_extract_all
  // calls (full match / href / inner) stay aligned because they run
  // the SAME pattern — arrays_zip then pairs them positionally.
  private val APat =
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>(.*?)</a>"

  /** Extract the link graph of `htmlCol`: one row per resolvable
    * anchor — (passthrough cols, `href` resolved against the page's
    * `urlCol`, `anchor_text` extracted like any text block,
    * `nofollow`). Resolution covers the crawl-relevant forms:
    * absolute http(s), protocol-relative `//host/…`, root-relative
    * `/path`, and path-relative (against the base's directory);
    * fragment-only, `javascript:`, `mailto:` and other non-http
    * schemes drop. The row explosion is ONE row per link — the same
    * shape any link-graph job must materialize — and everything
    * before it is per-row array expressions (zero shuffle).
    */
  def extractLinks(docs: DataFrame, htmlCol: String = "html",
                   urlCol: String = "url"): DataFrame = {
    val html = col(htmlCol)
    val zipped = arrays_zip(
      regexp_extract_all(html, lit(APat), lit(1)).as("h"),
      regexp_extract_all(html, lit(APat), lit(2)).as("t"),
      regexp_extract_all(html, lit(APat), lit(0)).as("f"))
    val passthrough = docs.columns.filterNot(_ == htmlCol)
    val exploded = docs
      .select(passthrough.map(col) :+ explode(zipped).as("__a"): _*)
      .select(passthrough.map(col) :+
        regexp_replace(col("__a").getField("h"), "^[\"']|[\"']$", "").as("__href") :+
        blockText(col("__a").getField("t")).as("anchor_text") :+
        col("__a").getField("f")
          .rlike("(?i)\\brel\\s*=\\s*[\"']?[^\"'>]*\\bnofollow")
          .as("nofollow"): _*)
    val base = col(urlCol)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    // base directory: origin + path up to the last '/'; "/" when the
    // base has no path (greedy + required trailing '/' backtracks off
    // the last segment)
    val dirRaw = regexp_extract(base,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(?:/[^?#]*)?/)", 1)
    val dir = when(dirRaw === "", concat(origin, lit("/"))).otherwise(dirRaw)
    val h = col("__href")
    val resolved =
      when(h.rlike("^[Hh][Tt][Tt][Pp][Ss]?://"), h)
        .when(h.startsWith("//"), concat(scheme, lit(":"), h))
        .when(h.startsWith("/"), concat(origin, h))
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") || h.startsWith("#") || h === "",
          lit(null))
        .otherwise(concat(dir, h))
    exploded
      .withColumn("href", resolved)
      .filter(col("href").isNotNull)
      .drop("__href")
  }
}

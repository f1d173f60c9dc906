package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org XML, the discovery seed robots.txt
  * points crawlers at): `<urlset>` entries become fetch candidates
  * with their freshness hints, `<sitemapindex>` entries name further
  * sitemap files to ingest. Feeds [[graft.pipeline.Crawl.frontier]]
  * directly (`hrefCol = "loc"`) — sitemap discovery and link-graph
  * discovery share one admission path.
  *
  * Scale shape: the [[graft.text.HtmlExtract.extractLinks]] recipe —
  * aligned `regexp_extract_all` passes over one entry pattern zip
  * positionally, everything before the one-row-per-entry explode is
  * per-row array expressions, zero shuffle. Entry order within a
  * sitemap is preserved into row order per input row; no corpus-wide
  * ordering is imposed.
  */
object Sitemaps {

  /** One `<url>`/`<sitemap>` block: kind in group 1, inner XML in
    * group 2 (backreference closes the same tag; DOTALL — lastmod and
    * friends span lines in pretty-printed sitemaps).
    */
  private val Entry = "(?is)<(url|sitemap)\\b[^>]*>(.*?)</\\1\\s*>"

  private def field(block: org.apache.spark.sql.Column, tag: String) = {
    val raw = regexp_extract(block, s"(?is)<$tag\\b[^>]*>\\s*(.*?)\\s*</$tag\\s*>", 1)
    // sitemap locs are XML-escaped by spec (&amp; in query strings is
    // mandatory) — decode before anything downstream canonicalizes
    nullif(graft.functions.Html.decode_entities(raw), lit(""))
  }

  /** docs (`xmlCol` + passthrough) → one row per sitemap entry:
    * `kind` (`url` | `sitemap`), `loc` (XML-unescaped), `lastmod`
    * (ISO-8601 kept as string — string order IS time order, the
    * repo's warc_date convention), `changefreq`, `priority`
    * (double, null when absent — the spec default 0.5 is a consumer
    * policy, not parser output). Entries with no `<loc>` drop —
    * there is nothing to fetch.
    */
  def parse(docs: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val xml = col(xmlCol)
    val zipped = arrays_zip(
      regexp_extract_all(xml, lit(Entry), lit(1)).as("k"),
      regexp_extract_all(xml, lit(Entry), lit(2)).as("b"))
    val passthrough = docs.columns.filterNot(_ == xmlCol).toSeq
    val block = col("__s").getField("b")
    docs.select(passthrough.map(col) :+ explode(zipped).as("__s"): _*)
      .select(passthrough.map(col) :+
        lower(col("__s").getField("k")).as("kind") :+
        field(block, "loc").as("loc") :+
        field(block, "lastmod").as("lastmod") :+
        field(block, "changefreq").as("changefreq") :+
        // ANSI mode: a malformed priority must yield null, not throw
        when(field(block, "priority").rlike("^[0-9]*\\.?[0-9]+$"),
          field(block, "priority").cast("double")).as("priority"): _*)
      .filter(col("loc").isNotNull)
  }
}

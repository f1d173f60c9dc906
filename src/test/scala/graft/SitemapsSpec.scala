package graft

import graft.ops.Sitemaps

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: urlset + sitemapindex entries, escaped locs, hint fields, malformed priority") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://a.example/page?x=1&amp;y=2</loc>
        |    <lastmod>2026-03-01</lastmod>
        |    <changefreq>weekly</changefreq>
        |    <priority>0.9</priority>
        |  </url>
        |  <url><loc> https://a.example/bare </loc></url>
        |  <url><loc>https://a.example/bad</loc><priority>often</priority></url>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap>
        |<loc>https://a.example/maps/s1.xml</loc><lastmod>2026-02-02</lastmod>
        |</sitemap></sitemapindex>""".stripMargin
    val got = Sitemaps.parse(Seq((1, urlset), (2, index)).toDF("id", "xml"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    // the loc-less entry drops; whitespace trims; &amp; decodes;
    // malformed priority nulls instead of throwing under ANSI
    assert(got.toSet == Set(
      (1, "url", "https://a.example/page?x=1&y=2",
        Some("2026-03-01"), Some("weekly"), Some(0.9)),
      (1, "url", "https://a.example/bare", None, None, None),
      (1, "url", "https://a.example/bad", None, None, None),
      (2, "sitemap", "https://a.example/maps/s1.xml",
        Some("2026-02-02"), None, None)))
    // entry order within one blob is preserved
    assert(got.filter(_._1 == 1).map(_._3).toSeq == Seq(
      "https://a.example/page?x=1&y=2", "https://a.example/bare",
      "https://a.example/bad"))
  }

  test("parse feeds frontier: sitemap locs anti-join fetched and admit the rest") {
    val xml = "<urlset><url><loc>https://s.example/seen?utm_x=1</loc></url>" +
      "<url><loc>https://s.example/new</loc></url></urlset>"
    val entries = Sitemaps.parse(Seq((1, xml)).toDF("id", "xml"))
      .filter($"kind" === "url")
    val got = graft.pipeline.Crawl.frontier(
        entries, Seq("https://s.example/seen").toDF("url"), hrefCol = "loc")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("https://s.example/new", 1L)))
  }
}

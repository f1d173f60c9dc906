package graft

import org.apache.spark.sql.functions._

import graft.ops.Robots

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def verdict(robots: String, agent: String, path: String): Boolean =
    Seq((robots, path)).toDF("robots_txt", "path")
      .select(Robots.robots_allowed(
        Robots.robots_rules(col("robots_txt"), agent), col("path")))
      .head().getBoolean(0)

  test("group selection: named group beats *, longest token wins, split groups merge") {
    val robots =
      "User-agent: evilbot\nDisallow: /\n\n" +
        "User-agent: graft\nDisallow: /graft-short/\n\n" +
        "User-agent: graftbot\nDisallow: /graft-long/\n\n" +
        "User-agent: graftbot\nDisallow: /graft-more/\n\n" +
        "User-agent: *\nDisallow: /everyone/\n"
    // graftbot: the two 'graftbot' groups (longest prefix token) merge;
    // 'graft' and '*' groups don't apply
    assert(!verdict(robots, "graftbot", "/graft-long/x"))
    assert(!verdict(robots, "graftbot", "/graft-more/x"))
    assert(verdict(robots, "graftbot", "/graft-short/x"))
    assert(verdict(robots, "graftbot", "/everyone/x"))
    // an unrelated agent falls to '*'
    assert(!verdict(robots, "otherbot", "/everyone/x"))
    assert(verdict(robots, "otherbot", "/graft-long/x"))
    // the blanket evilbot ban applies only to evilbot
    assert(!verdict(robots, "evilbot-news", "/anything"))
  }

  test("longest pattern wins; allow wins equal-length ties; no rule = allowed") {
    val robots = "User-agent: *\n" +
      "Disallow: /private/\nAllow: /private/public/\n" +
      "Allow: /page\nDisallow: /page\n"
    assert(!verdict(robots, "bot", "/private/secret"))
    assert(verdict(robots, "bot", "/private/public/doc"))
    assert(verdict(robots, "bot", "/page?id=1")) // tie -> allow
    assert(verdict(robots, "bot", "/open/doc"))  // no rule
  }

  test("wildcards: * spans segments, $ anchors the end; empty Disallow is no rule") {
    val robots = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/work\n"
    assert(!verdict(robots, "bot", "/files/report.pdf"))
    assert(verdict(robots, "bot", "/files/report.pdfx")) // $ anchor
    assert(verdict(robots, "bot", "/files/report.pdf.txt"))
    assert(!verdict(robots, "bot", "/tmp123/work/file"))
    assert(verdict(robots, "bot", "/tmp123/play/file"))
    assert(verdict("User-agent: *\nDisallow:\n", "bot", "/anything"))
  }

  test("comments, unknown directives, CRLF lines, and junk are ignored") {
    val robots = "# global policy\r\n" +
      "User-agent: * # everyone\r\n" +
      "Crawl-delay: 10\r\n" +
      "Sitemap: https://x.example/sitemap.xml\r\n" +
      "Disallow: /hidden/ # keep out\r\n" +
      "not a directive line\r\n"
    assert(!verdict(robots, "bot", "/hidden/x"))
    assert(verdict(robots, "bot", "/visible/x"))
  }

  test("robotsVerdict/applyRobots: per-host join, missing robots row allows") {
    val docs = Seq(
      (1L, "https://a.example.com/private/1"),
      (2L, "https://a.example.com/open/2"),
      (3L, "https://b.example.com/private/3"), // no robots row
      (4L, "https://a.example.com"),           // no path -> "/"
    ).toDF("doc_id", "url")
    val robots = Seq(
      ("a.example.com", "User-agent: *\nDisallow: /private/\n"),
    ).toDF("host", "robots_txt")
    val got = Robots.robotsVerdict(docs, robots, "graftbot")
      .orderBy("doc_id").select("doc_id", "allowed")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == Seq((1L, false), (2L, true), (3L, true), (4L, true)))
    val kept = Robots.applyRobots(docs, robots, "graftbot")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
    // the robots frame's columns never leak into the output
    assert(Robots.applyRobots(docs, robots, "graftbot").columns.toSeq
      == Seq("doc_id", "url"))
  }

  test("metaNoindex / headerNoindex: both opt-out spellings, no false trips") {
    val cases = Seq(
      ("<html><head><meta name=\"robots\" content=\"noindex, nofollow\"></head></html>", true),
      ("<meta content='noindex' name='robots'>", true),
      ("<META NAME=ROBOTS CONTENT=NOINDEX>", true),
      ("<meta name=\"robots\" content=\"index, follow\">", false),
      ("<meta name=\"googlebot\" content=\"noindex\">", false), // other agent's tag
      ("plain text mentioning noindex and robots separately", false),
    ).zipWithIndex.map { case ((h, e), i) => (i.toLong, h, e) }
    val got = cases.toDF("id", "html", "expect")
      .select(col("id"), Robots.metaNoindex(col("html")).as("got"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), s"case ${r.getLong(0)}"))

    val hdr = "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n\r\n<p>body</p>"
    val hdrOk = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>X-Robots-Tag: noindex as body text does not count</p>"
    val verdicts = Seq((1L, hdr), (2L, hdrOk)).toDF("id", "p")
      .select(col("id"), Robots.headerNoindex(col("p")).as("v"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(verdicts(1L) && !verdicts(2L))
  }

  test("blanket Disallow: / blocks everything for the selected group only") {
    val robots = "User-agent: ccbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert(!verdict(robots, "ccbot", "/"))
    assert(!verdict(robots, "ccbot", "/any/path?q=1"))
    assert(verdict(robots, "newsbot", "/any/path"))
  }

  test("sitemapUrls: case-insensitive directives in order; none -> empty array") {
    import spark.implicits._
    val robots =
      "# comment\nUser-agent: *\nDisallow: /private/\n" +
        "Sitemap: https://a.example/sitemap.xml\n" +
        "sitemap:\thttps://a.example/maps/s2.xml \nSITEMAPS: not-this\n"
    val got = Seq((1, robots), (2, "User-agent: *\nAllow: /\n"))
      .toDF("id", "txt")
      .select($"id", graft.ops.Robots.sitemapUrls($"txt").as("maps"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1) == List("https://a.example/sitemap.xml",
      "https://a.example/maps/s2.xml"))
    assert(got(2) == Nil)
  }

  test("crawl_delay: group selection, last-wins merge, junk ignored, absent null") {
    def delay(robots: String, agent: String): Option[Double] = {
      val r = Seq(Tuple1(robots)).toDF("txt")
        .select(Robots.crawl_delay(col("txt"), agent)).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val specific = "User-agent: graftbot\nCrawl-delay: 2.5\n\n" +
      "User-agent: *\nCrawl-delay: 9\n"
    assert(delay(specific, "graftbot") == Some(2.5))
    assert(delay(specific, "otherbot") == Some(9.0))
    // same-specificity groups merge with the LAST declared delay winning
    val split = "User-agent: graftbot\nCrawl-delay: 1\n\n" +
      "User-agent: graftbot\nCrawl-delay: 4\nDisallow: /x\n"
    assert(delay(split, "graftbot") == Some(4.0))
    // unparseable value ignored (earlier good value survives)
    assert(delay("User-agent: *\nCrawl-delay: fast\n", "g") == None)
    assert(delay("User-agent: *\nCrawl-delay: 3\nCrawl-delay: soon\n", "g") == Some(3.0))
    // no delay declared, or no robots group at all
    assert(delay("User-agent: *\nDisallow: /p\n", "g") == None)
    assert(delay("# just comments\n", "g") == None)
  }

  test("fetchScheduleWithDelay: wave spacing by host delay, default for silent hosts") {
    val frontier = Seq(
      ("https://a.example/1", 5L), ("https://a.example/2", 4L),
      ("https://a.example/3", 3L), ("https://b.example/1", 9L),
      ("https://b.example/2", 1L), ("https://b.example/3", 0L),
    ).toDF("url", "n_inlinks")
    val delays = Seq(("a.example", 2.5)).toDF("host", "crawl_delay")
    val got = graft.pipeline.Crawl
      .fetchScheduleWithDelay(frontier, delays, 10.0, perHostPerWave = 2)
      .select("url", "wave", "crawl_delay", "fetch_at_sec")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("https://a.example/1") == ((0L, 2.5, 0.0)))
    assert(got("https://a.example/3") == ((1L, 2.5, 2.5)))
    assert(got("https://b.example/2") == ((0L, 10.0, 0.0)))
    assert(got("https://b.example/3") == ((1L, 10.0, 10.0)))
    // the delay table rides a broadcast join — the frontier never shuffles for it
    val plan = graft.pipeline.Crawl
      .fetchScheduleWithDelay(frontier, delays, 10.0, perHostPerWave = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}

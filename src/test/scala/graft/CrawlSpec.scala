package graft

import graft.pipeline.Crawl

class CrawlSpec extends SparkSpec {
  import spark.implicits._

  test("curate: warcinfo dropped, blocked domain dropped, boilerplate stripped, tokens counted") {
    val page = "<html><body><div><a href=\"/\">home</a> <a href=\"/b\">more</a></div>" +
      "<p>the extracted article body has exactly nine tokens</p></body></html>"
    val records = Seq(
      ("warcinfo", "", "software: graft".getBytes("UTF-8")),
      ("response", "HTTPS://WWW.Good.COM/a?utm_x=1",
        ("HTTP/1.1 200 OK\r\n\r\n" + page).getBytes("UTF-8")),
      ("resource", "http://evil.example.net/x", page.getBytes("UTF-8")),
    ).toDF("warc_type", "target_uri", "payload")
    val block = Seq("example.net").toDF("domain")
    val got = Crawl.curate(records, block).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("url") == "https://good.com/a")
    assert(r.getAs[String]("domain") == "good.com")
    assert(r.getAs[String]("text") == "the extracted article body has exactly nine tokens")
    assert(r.getAs[Long]("n_tokens") == 8L) // "exactly nine" is a lie the count catches
    assert(r.getAs[Long]("n_blocks_kept") == 1L)
    assert(r.getAs[Long]("n_blocks_dropped") == 1L) // the link-dense nav
  }

  test("curate: all-boilerplate page survives with empty text and zero tokens") {
    val records = Seq(
      ("response", "http://empty.org/",
        ("HTTP/1.1 200 OK\r\n\r\n<div><a href=\"/x\">only links here</a></div>")
          .getBytes("UTF-8")),
    ).toDF("warc_type", "target_uri", "payload")
    val got = Crawl.curate(records, Seq.empty[String].toDF("domain")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("text") == "")
    assert(got.head.getAs[Long]("n_tokens") == 0L)
    assert(got.head.getAs[Long]("n_blocks_kept") == 0L)
  }
}

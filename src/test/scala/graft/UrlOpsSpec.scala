package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).head().getString(0)
  private def regdom(h: String): String =
    Seq(h).toDF("h").select(UrlOps.registeredDomain(col("h"))).head().getString(0)

  test("canonicalize: case, www, default ports, fragments, tracking params") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/Stays?id=7&utm_source=feed#frag")
      == "https://example.com/Path/Stays?id=7")
    assert(canon("http://News.Site.org:80/") == "http://news.site.org/")
    // non-default port survives; param order preserved; unknown params kept
    assert(canon("https://a.example.com:8443/x?b=2&a=1")
      == "https://a.example.com:8443/x?b=2&a=1")
    // all-tracking query drops the '?' entirely, leading tracking heals
    assert(canon("https://e.com/p?utm_a=1&utm_b=2") == "https://e.com/p")
    assert(canon("https://e.com/p?utm_a=1&id=9") == "https://e.com/p?id=9")
    assert(canon("https://e.com/p?id=9&gclid=xyz&q=2") == "https://e.com/p?id=9&q=2")
  }

  test("canonicalize is total on malformed input") {
    assert(canon("not a url at all") == "not a url at all")
    assert(canon("relative/path?x=1&fbclid=z#f") == "relative/path?x=1")
    assert(canon("") == "")
    assert(canon("://missing.scheme/x") == "://missing.scheme/x")
  }

  test("registered domain: 2-label default, multi-part suffixes at 3, short hosts pass") {
    assert(regdom("a.b.example.com") == "example.com")
    assert(regdom("news.bbc.co.uk") == "bbc.co.uk")
    assert(regdom("deep.sub.tree.ac.jp") == "tree.ac.jp")
    assert(regdom("example.com") == "example.com")
    assert(regdom("localhost") == "localhost")
    // 'com' as sld but nothing to spare -> stays 2 labels
    assert(regdom("co.uk") == "co.uk")
    // multi-part rule needs a SHORT tld (co.uk yes, co.verylongtld no)
    assert(regdom("x.co.website") == "co.website")
  }

  test("urlFilter drops blocked registered domains incl. subdomain forms") {
    val docs = Seq(
      (1L, "https://WWW.Blocked-one.COM/a?utm_x=1", "t1"),
      (2L, "https://sub.blocked-one.com/b", "t2"),
      (3L, "https://fine.example.net/c#frag", "t3"),
      (4L, "http://archive.blocked-two.co.uk:80/d", "t4"),
    ).toDF("doc_id", "url", "text")
    val block = Seq("blocked-one.com", "blocked-two.co.uk").toDF("domain")
    val got = UrlOps.urlFilter(docs, block).orderBy("doc_id")
      .select("doc_id", "url", "domain").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got.head.getString(1) == "https://fine.example.net/c")
    assert(got.head.getString(2) == "example.net")
  }

  test("canonicalize matches an independent java.net.URI reference on 300 generated urls") {
    // independent implementation: parse with the JDK's URI machinery
    // (a completely different mechanism than the operator's regexes)
    // and rebuild the canonical form by the documented rules
    def reference(u: String): String = {
      val uri = java.net.URI.create(u)
      val scheme = uri.getScheme.toLowerCase
      var host = uri.getHost.toLowerCase.stripPrefix("www.")
      val port = uri.getPort
      val keepPort = port != -1 &&
        !((scheme == "http" && port == 80) || (scheme == "https" && port == 443))
      val q = Option(uri.getRawQuery).map(_.split("&").filterNot(p =>
        p.takeWhile(_ != '=') match {
          case k if k.startsWith("utm_") => true
          // bare `ref` is content-bearing and NOT in the default
          // tracking set — it must survive canonicalization
          case "gclid" | "fbclid" | "msclkid" | "mc_cid" | "mc_eid" | "ref_src" => true
          case _ => false
        }).mkString("&")).filter(_.nonEmpty)
      scheme + "://" + host + (if (keepPort) s":$port" else "") +
        uri.getRawPath + q.map("?" + _).getOrElse("")
    }
    val rnd = new scala.util.Random(7)
    val hosts = Seq("www.Example.COM", "sub.Site.org", "a-b.co.uk", "X9.net")
    val urls = (0 until 300).map { i =>
      val scheme = if (rnd.nextBoolean()) "http" else "HTTPS"
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("/", "/Path/To/Doc", s"/d$i", "/x.html")(rnd.nextInt(4))
      val params = (0 until rnd.nextInt(4)).map(_ =>
        Seq(s"id=$i", "utm_source=f", "gclid=z", s"q=v$i", "ref=r")(rnd.nextInt(5)))
      val frag = if (rnd.nextBoolean()) "#sec" else ""
      (i.toLong, s"$scheme://${hosts(rnd.nextInt(hosts.length))}$port$path" +
        (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag)
    }
    val got = urls.toDF("id", "url")
      .select(col("id"), UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    urls.foreach { case (id, u) =>
      assert(got(id) == reference(u), s"url: $u")
    }
  }

  test("percent-encoding normalization: unreserved decode, reserved uppercase, malformed pass") {
    def norm(u: String): String =
      Seq(u).toDF("u").select(UrlOps.normalizePercentEncoding(col("u")))
        .head().getString(0)
    // %41/%61/%7e are unreserved (A/a/~) -> decode; %2f is reserved
    // '/' -> keep, hex uppercased; %g1 / trailing % are malformed ->
    // literal
    assert(norm("https://Ex%41mple.com/p%61th%2Fdoc?q=%2fv%7e&x=%g1&y=%2")
      == "https://ExAmple.com/path%2Fdoc?q=%2Fv~&x=%g1&y=%2")
    // idempotent: a normalized url re-normalizes to itself
    val once = norm("/a%20b%5a%2f%25c%")
    assert(once == "/a%20bZ%2F%25c%")
    assert(norm(once) == once)
    // no '%' at all is identity
    assert(norm("https://example.com/plain?a=1") == "https://example.com/plain?a=1")
    // composes with canonicalizeUrl: encoded-host variants of one page
    // collapse
    val canon = Seq("HTTPS://WWW.Ex%41mple.COM:443/Doc%7E1?id=2")
      .toDF("u")
      .select(UrlOps.canonicalizeUrl(UrlOps.normalizePercentEncoding(col("u"))))
      .head().getString(0)
    assert(canon == "https://example.com/Doc~1?id=2")
  }

  test("registeredDomainWithPsl: longest listed suffix + one label; fallback and pass-through") {
    val psl = Seq("com", "uk", "co.uk", "de.com", "github.io", "io", "de",
      "ap-south-1.es.amazonaws.com").toDF("suffix")
    val hosts = Seq(
      "pages.user.github.io",  // github.io beats io -> user.github.io
      "shop.example.de.com",   // de.com beats com -> example.de.com
      "news.bbc.co.uk",        // co.uk beats uk -> bbc.co.uk
      "a.b.example.com",       // com -> example.com
      "my-search.ap-south-1.es.amazonaws.com", // 4-label rule, depth cap
      "github.io",             // host IS a suffix: no label to spare -> unchanged
      "x.y.sometld.test",      // unlisted tld: implicit * default -> sometld.test
      "localhost",             // single label -> unchanged
    ).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val got = graft.ops.UrlOps.registeredDomainWithPsl(
        hosts.toDF("id", "host"), psl)
      .orderBy("id").select("domain").collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "user.github.io", "example.de.com", "bbc.co.uk", "example.com",
      "my-search.ap-south-1.es.amazonaws.com",
      "github.io", "sometld.test", "localhost"))
  }

  test("registeredDomainWithPsl: wildcard and exception rules with PSL priority") {
    val psl = Seq("com", "*.ck", "!www.ck", "*.kawasaki.jp", "jp")
      .toDF("suffix")
    val hosts = Seq(
      "a.b.foo.ck",       // *.ck: foo.ck is the suffix -> b.foo.ck
      "b.foo.ck",         // *.ck -> b.foo.ck
      "foo.ck",           // host IS a wildcard suffix: no spare label,
                          //   implicit-* fallback ALSO has none -> unchanged
      "www.ck",           // exception: the match IS the domain
      "deep.www.ck",      // exception beats the covering wildcard
      "x.city.kawasaki.jp", // 3-label wildcard -> x.city.kawasaki.jp
      "plain.jp",         // plain rule under the same tld -> plain.jp
    ).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val got = graft.ops.UrlOps.registeredDomainWithPsl(
        hosts.toDF("id", "host"), psl)
      .orderBy("id").select("domain").collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "b.foo.ck", "b.foo.ck", "foo.ck", "www.ck", "www.ck",
      "x.city.kawasaki.jp", "plain.jp"))
  }

  test("registeredDomainWithPsl agrees with the heuristic on its own ground") {
    // on hosts whose suffixes the fixed heuristic models (plain tld,
    // co.uk-class), PSL-as-data and the heuristic must agree — the
    // heuristic is the zero-dependency default for the same semantics
    val psl = Seq("com", "uk", "co.uk", "org", "net").toDF("suffix")
    val hosts = Seq("a.b.example.com", "news.bbc.co.uk", "example.org",
      "deep.x.site.net", "plain.com").zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = hosts.toDF("id", "host")
    val viaPsl = graft.ops.UrlOps.registeredDomainWithPsl(df, psl)
      .orderBy("id").select("domain").collect().map(_.getString(0)).toSeq
    val viaHeuristic = df.orderBy("id")
      .select(graft.ops.UrlOps.registeredDomain(col("host"))).collect()
      .map(_.getString(0)).toSeq
    assert(viaPsl == viaHeuristic)
  }

  test("dedupByUrl: canonical-equivalent fetches collapse, newest wins, ties by tiecol") {
    val fetches = Seq(
      // three shapes of ONE page: tracking noise, www/case, clean
      (1L, "HTTPS://WWW.Site.COM/a?utm_x=1", "v1", 10L),
      (2L, "https://site.com/a", "v2", 30L),
      (3L, "https://Site.com:443/a", "v3", 20L),
      // a different page survives independently
      (4L, "https://site.com/b", "other", 5L),
      // equal scores: tie falls to the smaller id
      (5L, "https://site.com/c", "tie-lo", 7L),
      (6L, "https://site.com/c", "tie-hi", 7L),
    ).toDF("id", "url", "text", "fetched_at")
    val got = UrlOps.dedupByUrl(fetches, scoreCol = "fetched_at", tieCol = "id")
      .orderBy("url")
      .select("url", "text", "n_fetches").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("https://site.com/a", "v2", 3L),
      ("https://site.com/b", "other", 1L),
      ("https://site.com/c", "tie-lo", 2L)))
  }

  test("domainStats aggregates per registered domain") {
    val docs = Seq(
      (1L, "https://a.example.com/x", "aaaa"),
      (2L, "https://b.example.com/y", "bb"),
      (3L, "https://other.net/z", "c"),
    ).toDF("doc_id", "url", "text")
    val got = UrlOps.domainStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("example.com", 2L, 6L), ("other.net", 1L, 1L)))
  }
}

package graft

import graft.text.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String, maxLinkDensity: Double = 0.2,
                  minChars: Int = 20, stopwords: Seq[String] = Nil,
                  minStopwordFrac: Double = 0.0): (String, Long, Long) = {
    val r = HtmlExtract.extract(
      Seq((1L, html)).toDF("doc_id", "html"),
      maxLinkDensity = maxLinkDensity, minChars = minChars,
      stopwords = stopwords, minStopwordFrac = minStopwordFrac).head()
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("strips script/style/head/comments; drops link-dense nav and short headings") {
    val html =
      """<html><head><title>T</title><style>p {color: red}</style>
        |<script>var trap = "<p>not text</p>";</script></head><body>
        |<div id="nav"><a href="/">home</a> <a href="/a">about</a> <a href="/b">contact us</a></div>
        |<h2>Heading</h2>
        |<p>the quick brown fox jumps over the lazy dog repeatedly</p>
        |<div class="footer"><a href="/tos">terms of service</a> 2026</div>
        |</body></html>""".stripMargin
    val (text, kept, dropped) = run(html)
    assert(text == "the quick brown fox jumps over the lazy dog repeatedly")
    assert(kept == 1)
    // nav (link-dense), "Heading" (short), footer (link-dense) — the
    // head/script/style/comment content never forms a block at all
    assert(dropped == 3)
  }

  test("moderate anchor inside long prose is kept, anchor text preserved") {
    val html = "<p>See the <a href=\"/ref\">reference section</a> for the full " +
      "derivation of the result discussed above in considerable detail</p>"
    val (text, kept, _) = run(html)
    assert(kept == 1)
    assert(text == "See the reference section for the full derivation of the " +
      "result discussed above in considerable detail")
  }

  test("entity decode: &amp; decodes last so double-escapes stay literal") {
    val html = "<p>a &lt; b &amp;&amp; c &gt; d &quot;q&quot; &#39;s&#39; " +
      "&amp;lt; stays literal here</p>"
    val (text, _, _) = run(html, minChars = 1)
    assert(text == "a < b && c > d \"q\" 's' &lt; stays literal here")
  }

  test("numeric character references: decimal, hex, double-escape, invalid pass-through") {
    val html = "<p>It&#8217;s 5 &#x3C; 7 &#38;lt; stays &#xA0;spaced " +
      "&#abc; &#; &#x110000; &#xD800; ok</p>"
    val (text, _, _) = run(html, minChars = 1)
    // &#8217; -> ’, &#x3C; -> literal '<' text (tags were stripped
    // before the decode), &#38;lt; -> '&' then literal "lt;" (the
    // single-pass scan never re-reads its own output), &#xA0; -> a
    // plain space that collapses, malformed/overflow/surrogate refs
    // pass through as literal text
    assert(text == "It’s 5 < 7 &lt; stays spaced " +
      "&#abc; &#; &#x110000; &#xD800; ok")
  }

  test("br/hr split inline runs into separate blocks") {
    val html = "<p>first visual block with enough characters here<br>" +
      "second visual block also long enough to keep<hr/>short</p>"
    val (text, kept, dropped) = run(html)
    assert(kept == 2 && dropped == 1)
    assert(text == "first visual block with enough characters here\n" +
      "second visual block also long enough to keep")
  }

  test("malformed markup degrades, never fails: unclosed tags, stray brackets") {
    // unclosed <div> and <b>: the texts merge into larger blocks;
    // an unclosed <a ...> swallows only its own tag
    val (t1, k1, _) = run("<div>alpha beta gamma delta epsilon zeta eta theta",
      minChars = 10)
    assert(k1 == 1 && t1 == "alpha beta gamma delta epsilon zeta eta theta")
    val (t2, _, _) = run(
      "<p>left side <b>bold run continues with the sentence to the end</p>",
      minChars = 10)
    assert(t2 == "left side bold run continues with the sentence to the end")
    // a bare '<' that never closes eats to the next '>' like a tag
    // (regex parser contract); everything after survives
    val (t3, _, _) = run("<p>x < y and the remainder of the text stays</p>",
      minChars = 5)
    assert(t3.endsWith("y and the remainder of the text stays") ||
      t3 == "x < y and the remainder of the text stays")
  }

  test("stopword gate: prose with function words kept, keyword-stuffing dropped") {
    val sw = Seq("the", "of", "and", "a", "in", "to")
    val prose = "<p>the quality of the corpus depends on the curation of the text</p>"
    val stuffing = "<p>buy cheap widgets best widgets cheap deals widgets sale now</p>"
    val (t1, k1, _) = run(prose, stopwords = sw, minStopwordFrac = 0.25)
    val (t2, k2, d2) = run(stuffing, stopwords = sw, minStopwordFrac = 0.25)
    assert(k1 == 1 && t1.startsWith("the quality"))
    assert(k2 == 0 && d2 == 1 && t2 == "")
  }

  test("plain text with no markup is a single kept block; empty html keeps the row") {
    val (t1, k1, d1) = run("no markup at all just a plain sentence of words")
    assert((t1, k1, d1) == ("no markup at all just a plain sentence of words", 1L, 0L))
    val (t2, k2, d2) = run("")
    assert((t2, k2, d2) == ("", 0L, 0L))
    val (t3, k3, d3) = run("<div><p></p>  <br/> </div>")
    assert((t3, k3, d3) == ("", 0L, 0L))
  }

  test("matches an independent char-scanner reference on 150 generated pages") {
    // independent implementation: a hand-rolled tag tokenizer (no
    // regexes) walking chars — different mechanism, same documented
    // semantics
    def refExtract(html: String, maxLink: Double, minChars: Int): (String, Long, Long) = {
      val blockTags = ("p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr " +
        "td th blockquote pre section article header footer nav aside main form " +
        "fieldset figure figcaption address center body html title br hr").split(" ").toSet
      // 1. drop comments and script/style/head elements with content
      val sb = new StringBuilder
      var i = 0
      val low = html.toLowerCase
      while (i < html.length) {
        if (low.startsWith("<!--", i)) {
          val e = low.indexOf("-->", i + 4)
          sb.append(' '); i = if (e < 0) html.length else e + 3
        } else {
          val dropped = Seq("script", "style", "head").find(t =>
            low.startsWith(s"<$t", i) && (i + 1 + t.length >= html.length ||
              !Character.isLetterOrDigit(html.charAt(i + 1 + t.length))))
          dropped match {
            case Some(t) =>
              val e = low.indexOf(s"</$t", i)
              sb.append(' ')
              i = if (e < 0) html.length
              else { val g = low.indexOf('>', e); if (g < 0) html.length else g + 1 }
            case None => sb.append(html.charAt(i)); i += 1
          }
        }
      }
      val body = sb.toString
      // 2. tokenize into blocks, tracking anchor content
      // numeric refs via java.util.regex callback (a different
      // mechanism than the engine's single-pass scanner), then the
      // named chain — the generator avoids pathological double-escape
      // overlaps where sequential and single-pass decoding diverge
      def decodeNum(s: String): String = {
        val m = java.util.regex.Pattern
          .compile("&#(?:[xX]([0-9a-fA-F]{1,6})|([0-9]{1,7}));").matcher(s)
        val sb = new StringBuffer
        while (m.find()) {
          val cp = if (m.group(1) != null) Integer.parseInt(m.group(1), 16)
            else Integer.parseInt(m.group(2))
          val rep = if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
            new String(Character.toChars(if (cp == 0xA0) ' ' else cp))
          else m.group(0)
          m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
        }
        m.appendTail(sb)
        sb.toString
      }
      def norm(s: String): String = {
        val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
          .foldLeft(decodeNum(s)) { case (c, (f, t)) => c.replace(f, t) }
        ent.replaceAll("\\s+", " ").trim
      }
      var full = new StringBuilder
      var noa = new StringBuilder
      var anchorDepth = 0
      val blocks = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      def flush(): Unit = {
        val t = norm(full.toString)
        if (t.nonEmpty) blocks += ((t, norm(noa.toString)))
        full = new StringBuilder; noa = new StringBuilder; anchorDepth = 0
      }
      var j = 0
      val lb = body.toLowerCase
      while (j < body.length) {
        if (body.charAt(j) == '<') {
          val close = lb.indexOf('>', j)
          val end = if (close < 0) body.length else close
          val inner = lb.substring(math.min(j + 1, body.length), end)
          val name = inner.stripPrefix("/").takeWhile(c => c.isLetterOrDigit)
          if (blockTags.contains(name)) flush()
          else if (name == "a") {
            if (inner.startsWith("/")) { anchorDepth = math.max(0, anchorDepth - 1) }
            else { anchorDepth += 1; noa.append(' ') }
            full.append(' '); if (anchorDepth == 0 && !inner.startsWith("/")) ()
          } else { full.append(' '); noa.append(' ') }
          j = if (close < 0) body.length else close + 1
        } else {
          full.append(body.charAt(j))
          if (anchorDepth == 0) noa.append(body.charAt(j))
          j += 1
        }
      }
      flush()
      val kept = blocks.filter { case (t, n) =>
        val len = t.length.toDouble
        t.length >= minChars && (len - n.length) / len <= maxLink
      }
      (kept.map(_._1).mkString("\n"), kept.size.toLong, (blocks.size - kept.size).toLong)
    }

    val rnd = new scala.util.Random(11)
    val words = "alpha beta gamma delta epsilon zeta theta lambda sigma omega".split(" ")
    def sentence(n: Int) = (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val pages = (0 until 150).map { i =>
      val nBlocks = 1 + rnd.nextInt(5)
      val body = (0 until nBlocks).map { _ =>
        val tag = Seq("p", "div", "li", "h2")(rnd.nextInt(4))
        val inner = rnd.nextInt(4) match {
          case 0 => sentence(2 + rnd.nextInt(10))
          case 1 => s"${sentence(3)} <a href=\"/x\">${sentence(1 + rnd.nextInt(3))}</a> ${sentence(rnd.nextInt(8))}"
          case 2 => s"${sentence(2)} <b>${sentence(2)}</b> &amp; it&#8217;s " +
            s"${sentence(3)} &lt;tag&gt; &#x2014; ${sentence(2)}"
          case _ => s"<a href=\"/only\">${sentence(1 + rnd.nextInt(2))}</a>"
        }
        s"<$tag>$inner</$tag>"
      }.mkString
      val head = if (rnd.nextBoolean())
        "<head><title>T</title><style>p{}</style><script>var a=1;</script></head>" else ""
      val comment = if (rnd.nextBoolean()) s"<!-- ${sentence(3)} -->" else ""
      (i.toLong, s"<html>$head<body>$comment$body</body></html>")
    }
    val got = HtmlExtract.extract(pages.toDF("doc_id", "html"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    pages.zip(got).foreach { case ((_, html), g) =>
      assert(g == refExtract(html, 0.2, 20), s"page: $html")
    }
  }

  test("total on 200 pseudo-random byte-salad strings; tag-free text is identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val salad = (0 until 200).map { i =>
      val chars = "<>&/\"'= abcDEF\n\r\t#;"
      (i.toLong, (0 until rnd.nextInt(80)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    }
    // never throws, one row out per row in
    val out = HtmlExtract.extract(salad.toDF("doc_id", "html")).collect()
    assert(out.length == 200)
    // tag-free, entity-free text round-trips as a single block modulo
    // whitespace collapse
    val clean = (0 until 50).map(i =>
      (i.toLong, s"plain words only number $i with several tokens present"))
    val got = HtmlExtract.extract(clean.toDF("doc_id", "html"), minChars = 1)
      .orderBy("doc_id").collect()
    assert(got.zip(clean).forall { case (r, (_, t)) => r.getString(1) == t })
  }

  test("uppercase legacy markup and attributes with spaces handled") {
    val html = "<DIV CLASS=\"main\"><P>uppercase tags are still block " +
      "delimiters in legacy pages</P></DIV>"
    val (text, kept, _) = run(html)
    assert(kept == 1)
    assert(text == "uppercase tags are still block delimiters in legacy pages")
  }
}

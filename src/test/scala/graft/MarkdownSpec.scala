package graft

import org.apache.spark.sql.functions._

import graft.text.Markdown

class MarkdownSpec extends SparkSpec {
  import spark.implicits._

  private def stripOne(s: String): (String, Long, Long, Long, Long) =
    Markdown.strip(Seq((1L, s)).toDF("doc_id", "text"))
      .as[(Long, String, Long, Long, Long, Long)].head() match {
        case (_, t, cb, im, ln, hd) => (t, cb, im, ln, hd)
      }

  test("strip: every construct unwraps, counts taken before stripping") {
    val md = "# Title\n\nSee [docs](https://d.example/x) and ![alt](i.png).\n\n" +
      "> quoted line\n\nUse `fn()` with **bold** and *em* and __dunder__.\n\n" +
      "```\ncode *stays* out\n```\n\n- item one\n- item two\n\n1. first\n\n---\n\ntail"
    val (t, cb, im, ln, hd) = stripOne(md)
    assert(t == "Title\n\nSee docs and alt.\n\nquoted line\n\n" +
      "Use fn() with bold and em and dunder.\n\nitem one\nitem two\n\nfirst\n\ntail")
    assert((cb, im, ln, hd) == ((1L, 1L, 1L, 1L)))
  }

  test("strip: fences drop whole, inline backtick survives fence removal") {
    val (t, cb, _, _, _) = stripOne("a\n\n```py\nx = [1](2)\n**not em**\n```\n\nb `c` d")
    assert(t == "a\n\nb c d")
    assert(cb == 1L)
  }

  test("strip: snake_case untouched, multi-line blanks collapse, plain text identity") {
    val (t1, _, _, _, _) = stripOne("keep snake_case and a_b_c words")
    assert(t1 == "keep snake_case and a_b_c words")
    val (t2, _, _, _, _) = stripOne("a\n\n\n\n\nb")
    assert(t2 == "a\n\nb")
    val plain = "Just prose with no markup at all."
    assert(stripOne(plain)._1 == plain)
  }

  test("strip: image inside link text, nested emphasis orders, zero-shuffle plan") {
    // ***x*** unwraps in one pass; links before code spans
    val (t, _, im, ln, _) = stripOne("***very*** [a `b`](u) ![i](j)")
    assert(t == "very a b i")
    assert((im, ln) == ((1L, 1L)))
    val plan = Markdown.strip(Seq((1L, "x")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

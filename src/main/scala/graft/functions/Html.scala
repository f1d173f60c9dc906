package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding kernel: one left-to-right pass
  * over the text, decoding the named references real extractors need
  * (`&lt; &gt; &quot; &apos; &nbsp; &amp;`) AND the numeric forms
  * (`&#8217;` decimal, `&#x2019;` hex) that dominate real pages —
  * smart quotes, dashes, ellipses arrive as numeric references and
  * would otherwise survive as literal `&#8217;` text, silently
  * corrupting tokens, shingles, and dedup hashes downstream.
  *
  * Single-pass semantics (what a spec-grade HTML tokenizer does): the
  * scan continues AFTER each replacement, so `&amp;lt;` yields the
  * literal `&lt;` — the same contract the previous sequential
  * regexp_replace chain guaranteed by decoding `&amp;` last.
  * Anything that is not a well-formed reference (unknown name, empty
  * `&#;`, overflow, surrogate-range codepoint) passes through as
  * literal text — total on the malformed markup crawls carry.
  *
  * U+00A0 (both `&nbsp;` and `&#160;`/`&#xA0;`) decodes to a PLAIN
  * space: Java's `\s` does not match U+00A0, so a faithful decode
  * would survive the extractor's whitespace collapse and poison
  * whitespace tokenization — normalizing it is what the previous
  * `&nbsp;` rule already did, now applied to the numeric spellings
  * too.
  */
object HtmlKernels {

  /** Decimal/hex digits only, bounded length (caller caps at 7 dec /
    * 6 hex chars so the value fits an Int without overflow checks);
    * -1 on any non-digit.
    */
  private def parseCodepoint(num: String): Int = {
    val (digits, radix) =
      if (num.length >= 2 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
        (num.substring(1), 16)
      else (num, 10)
    val maxLen = if (radix == 16) 6 else 7
    if (digits.isEmpty || digits.length > maxLen) return -1
    var v = 0
    var i = 0
    while (i < digits.length) {
      val d = Character.digit(digits.charAt(i), radix)
      if (d < 0) return -1
      v = v * radix + d
      i += 1
    }
    v
  }

  def decodeEntities(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        // longest valid reference is 10 chars: &#1114111; / &#x10FFFF;
        val semi = str.indexOf(';', i + 1)
        var cp = -1
        if (semi > i + 1 && semi - i <= 9) {
          val body = str.substring(i + 1, semi)
          cp = body match {
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case "amp" => '&'
            case _ if body.charAt(0) == '#' => parseCodepoint(body.substring(1))
            case _ => -1
          }
        }
        if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
          sb.appendCodePoint(if (cp == 0xA0) ' ' else cp)
          i = semi + 1
        } else { sb.append('&'); i += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd single-pass character-reference decode — stays inside the
  * WholeStageCodegen span (generated Java calls the static kernel), vs
  * the 7 chained regexp_replace passes it replaces.
  */
case class DecodeEntities(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    HtmlKernels.decodeEntities(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernels.decodeEntities($c)")

  override protected def withNewChildInternal(c: Expression): DecodeEntities =
    copy(c)
}

object Html {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Decode HTML named + numeric character references in `text`. */
  def decode_entities(text: Column): Column =
    column(DecodeEntities(expression(text)))
}

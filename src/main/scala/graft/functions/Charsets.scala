package graft.functions

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row charset decoding for crawl payloads. Real crawls are
  * ~5–10% legacy-charset pages (Latin-1, Shift-JIS, GBK, EUC-JP …);
  * decoding their bytes as UTF-8 mojibakes silently through HTML
  * extraction and poisons langId / quality scoring downstream. The
  * charset arrives as DATA (parsed per page from the HTTP
  * `Content-Type` header or `<meta charset>` tag), so the decode
  * charset must be a per-row COLUMN — Spark's own `decode()` takes a
  * literal charset, restricts the name set, and (since 3.5) throws on
  * malformed bytes, all of which are the wrong failure modes for a
  * 100 TB crawl.
  *
  * Convention: TOTAL, never throws, never drops. Unknown/unsupported
  * charset names fall back to UTF-8; malformed byte sequences decode
  * to U+FFFD replacement characters (`new String(bytes, charset)`
  * semantics — the JDK's REPLACE action). Pages that mojibake under
  * the fallback carry visible replacement chars into the text, where
  * the existing quality gates (alpha-word fraction, langId score)
  * already filter them — a counted drop at decode time would hide
  * those pages from the quality report instead.
  */
object CharsetKernels {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Charset]()

  /** Charset for `name` (any JDK-recognized name or alias,
    * case-insensitive); UTF-8 when unknown, unsupported, or empty.
    */
  def charsetFor(name: String): Charset = {
    if (name.isEmpty) return StandardCharsets.UTF_8
    val cached = cache.get(name)
    if (cached != null) return cached
    val cs =
      try Charset.forName(name)
      catch { case _: IllegalArgumentException => StandardCharsets.UTF_8 }
    cache.putIfAbsent(name, cs)
    cs
  }

  def decodeWith(bytes: Array[Byte], charset: UTF8String): UTF8String =
    UTF8String.fromString(new String(bytes, charsetFor(charset.toString)))
}

/** Codegen'd per-row-charset binary→string decode — see
  * [[CharsetKernels]]. Left: binary payload; right: charset name
  * string.
  */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(bin: Any, cs: Any): Any =
    CharsetKernels.decodeWith(bin.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, c) => s"graft.functions.CharsetKernels.decodeWith($b, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeCharset =
    copy(left = newLeft, right = newRight)
}

object HttpKernels {
  /** Byte length of the leading HTTP header block (status line +
    * header lines + the terminating CRLFCRLF), 0 when the payload is
    * not an HTTP message or carries no blank line —
    * [[graft.sources.Warc.httpBody]]'s split contract as a codegen
    * kernel. Exact in BYTES regardless of what the header bytes
    * decode to (a regex over the pseudo-UTF-8 cast undercounts
    * multibyte/malformed header bytes and costs a full-payload regex
    * pass; this is one linear byte scan that stops at the blank
    * line).
    */
  def headerLen(p: Array[Byte]): Int = {
    if (p.length < 5 || p(0) != 'H' || p(1) != 'T' || p(2) != 'T' ||
      p(3) != 'P' || p(4) != '/') return 0
    var i = 0
    while (i + 3 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n' &&
        p(i + 2) == '\r' && p(i + 3) == '\n') return i + 4
      i += 1
    }
    0
  }
}

/** Codegen'd byte-exact HTTP header-block length — see
  * [[HttpKernels.headerLen]].
  */
case class HttpHeaderLen(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(bin: Any): Any =
    HttpKernels.headerLen(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.HttpKernels.headerLen($b)")

  override protected def withNewChildInternal(
      newChild: Expression): HttpHeaderLen = copy(child = newChild)
}

object Charsets {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Decode `bin` with the per-row charset named in `charset` —
    * total: unknown names fall back to UTF-8, malformed bytes become
    * U+FFFD.
    */
  def decode_charset(bin: Column, charset: Column): Column =
    column(DecodeCharset(expression(bin), expression(charset)))

  /** Byte length of `bin`'s leading HTTP header block incl. the
    * CRLFCRLF terminator; 0 when not an HTTP message.
    */
  def http_header_len(bin: Column): Column =
    column(HttpHeaderLen(expression(bin)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text ingestion. Crawled text mixes
  * composed and decomposed forms of the same glyph ("é" as U+00E9 vs
  * `e` + U+0301): exact dedup, shingle hashing, token counting, and
  * vocabulary building all treat the two spellings as DIFFERENT
  * strings unless the corpus is normalized first, so NFC is the
  * canonical first transform of a text pipeline (NFKC additionally
  * folds compatibility forms — fullwidth digits, ligatures — the
  * usual choice before tokenizer training). Spark has no built-in
  * normalizer; this is the codegen'd kernel form (static call from
  * generated code — stays inside WholeStageCodegen).
  *
  * The fast path matters at corpus scale: `Normalizer.isNormalized`
  * is a cheap scan that short-circuits the (allocating) normalize
  * call, and ASCII-only text — the overwhelming majority of a web
  * corpus — never allocates at all.
  */
object UnicodeKernels {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }
}

/** Codegen'd Unicode normalization — `form` is "NFC" or "NFKC"
  * (a plan-time constant, so codegen dispatches to a static
  * monomorphic call).
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  require(form == "NFC" || form == "NFKC", s"form NFC|NFKC: $form")
  override def dataType: DataType = StringType

  private def fn = if (form == "NFC") "nfc" else "nfkc"

  override def nullSafeEval(s: Any): Any =
    if (form == "NFC") UnicodeKernels.nfc(s.asInstanceOf[UTF8String])
    else UnicodeKernels.nfkc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.$fn($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeUnicode = copy(child = newChild)
}

object Unicode {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Canonical composition (NFC) of `c`. */
  def nfc(c: Column): Column = column(NormalizeUnicode(expression(c), "NFC"))

  /** Compatibility composition (NFKC) of `c` — also folds fullwidth
    * forms, ligatures, superscripts; the pre-tokenizer-training form.
    */
  def nfkc(c: Column): Column = column(NormalizeUnicode(expression(c), "NFKC"))
}

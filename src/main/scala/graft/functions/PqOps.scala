package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Product-quantization kernels (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search" — the FAISS IVF-PQ
  * recipe): a d-dim vector splits into M contiguous sub-vectors, each
  * encoded as its nearest sub-codebook centroid id — ONE BYTE per
  * subspace (requires K <= 256) — and queries score codes by ADC
  * (asymmetric distance computation): a per-query lookup table of
  * sub-dot-products, after which every candidate costs M table adds
  * instead of a d-term dot product.
  *
  * The codebook rides expressions as a reference object (the
  * CentroidKernels rationale — literals would inline M·K·dsub
  * constants into generated code). Sub-centroid selection is argmin
  * L2 over the subspace, computed as cnorm − 2·dot (the vector's own
  * sub-norm is constant across candidates), ties to the lowest id;
  * fold order is strictly left-to-right so results are
  * oracle-replayable.
  */
object PqKernels {

  /** Per-(subspace, centroid) self dot products — hoisted once per
    * codebook, not per row.
    */
  def centroidNorms(cents: Array[Array[Array[Double]]]): Array[Array[Double]] =
    cents.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })

  private def subDot(v: ArrayData, off: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += v.getDouble(off + i) * c(i); i += 1 }
    acc
  }

  /** PQ-encode: per subspace the argmin-L2 sub-centroid id (via
    * cnorm − 2·dot; ties to the lowest id), one byte each.
    */
  def encode(v: ArrayData, cents: Array[Array[Array[Double]]],
             cnorms: Array[Array[Double]]): Array[Byte] = {
    val m = cents.length
    val out = new Array[Byte](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cs = cents(s)
      var best = 0
      var bestD = cnorms(s)(0) - 2.0 * subDot(v, off, cs(0))
      var k = 1
      while (k < cs.length) {
        val d = cnorms(s)(k) - 2.0 * subDot(v, off, cs(k))
        if (d < bestD) { best = k; bestD = d }
        k += 1
      }
      out(s) = best.toByte
      off += cs(0).length
      s += 1
    }
    out
  }

  /** Per-query ADC lookup table: lut[s·K + k] = dot(query_sub_s,
    * cents(s)(k)) — built ONCE per query row (M·K·dsub work), after
    * which every candidate code scores in M adds.
    */
  def lut(v: ArrayData, cents: Array[Array[Array[Double]]]): GenericArrayData = {
    val m = cents.length
    val kk = cents(0).length
    val out = new Array[Any](m * kk)
    var s = 0
    var off = 0
    while (s < m) {
      val cs = cents(s)
      var k = 0
      while (k < kk) { out(s * kk + k) = subDot(v, off, cs(k)); k += 1 }
      off += cs(0).length
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score of one code against a query's lookup table: the
    * left-to-right sum of M table entries — the approximate inner
    * product of the query with the code's reconstruction.
    */
  def adc(code: Array[Byte], lut: ArrayData, kk: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < code.length) {
      acc += lut.getDouble(s * kk + (code(s) & 0xff))
      s += 1
    }
    acc
  }

  /** Decode a PQ code back to its reconstruction (sub-centroids
    * concatenated) — the analysis/debug surface.
    */
  def reconstruct(code: Array[Byte],
                  cents: Array[Array[Array[Double]]]): Array[Double] = {
    val dsub = cents(0)(0).length
    val out = new Array[Double](code.length * dsub)
    var s = 0
    while (s < code.length) {
      System.arraycopy(cents(s)(code(s) & 0xff), 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }
}

/** array<double> → M-byte PQ code under a fixed codebook. */
case class PqEncodeExpr(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  @transient private lazy val cnorms = PqKernels.centroidNorms(cents)

  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cents, cnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("cents", cents, "double[][][]")
    val refN = ctx.addReferenceObj("cnorms", cnorms, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqKernels.encode($c, $refC, $refN)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** array<double> query → flattened M·K ADC lookup table. */
case class PqLutExpr(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.lut($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** (binary code, lut) → ADC score; `kk` is the per-subspace centroid
  * count the lut was built with.
  */
case class PqAdcExpr(left: Expression, right: Expression, kk: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(code: Any, lut: Any): Any =
    PqKernels.adc(code.asInstanceOf[Array[Byte]],
      lut.asInstanceOf[ArrayData], kk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, l) => s"graft.functions.PqKernels.adc($c, $l, $kk)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqOps {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** PQ-encode an array<double> column to an M-byte binary code. */
  def pqEncode(v: Column, cents: Array[Array[Array[Double]]]): Column =
    column(PqEncodeExpr(expression(v), cents))

  /** Per-query flattened ADC lookup table. */
  def pqLut(v: Column, cents: Array[Array[Array[Double]]]): Column =
    column(PqLutExpr(expression(v), cents))

  /** ADC score of a code column against a lut column. */
  def pqAdc(code: Column, lut: Column, kk: Int): Column =
    column(PqAdcExpr(expression(code), expression(lut), kk))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels for embedding math — called from both interpreted
  * eval and generated Java (static forwarders, see HashKernels).
  *
  * The fold order is strictly left-to-right over doubles, bit-identical
  * to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and to DuckDB's
  * list_dot_product — required for oracle hash-matches on similarity
  * scores.
  */
object VectorKernels {
  /** Sequential dot product of two double arrays (null if sizes differ). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Pack an array<int> of int8-range values into a binary column —
    * ONE byte per component (a 64-dim vector is 64 bytes vs ~296 for
    * an unsafe array<float> row region): the genuine 4x storage /
    * shuffle / cache win of int8 quantization. Values must already be
    * in [-127, 127] (quantizeInt8's clamp guarantees it; out-of-range
    * inputs here would silently truncate, so callers own the clamp).
    */
  def int8Pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = a.getInt(i).toByte; i += 1 }
    out
  }

  /** Integer dot product of two packed int8 vectors — exact (no FP),
    * the scoring kernel of the quantized search path.
    */
  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  /** L2-normalize in one pass (zero vectors pass through). A
    * `transform(v, x => x / sqrt(aggregate(...)))` formulation would
    * re-evaluate the norm aggregate per element — O(dims²) per row.
    */
  def l2normalize(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    if (norm > 0) while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    else while (i < n) { out(i) = a.getDouble(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd dot product over two array<double> columns — replaces the
  * `aggregate(zip_with(...))` higher-order pipeline, which allocates an
  * intermediate array per row-pair and is the hot path of brute-force
  * similarity (O(corpus × queries) evaluations).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd single-pass L2 normalization of an array<double> column. */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.l2normalize($c)")

  override protected def withNewChildInternal(c: Expression): L2Normalize =
    copy(child = c)
}

/** array<int> (int8-range) → 1-byte-per-component binary. */
case class Int8Pack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(input: Any): Any =
    VectorKernels.int8Pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.int8Pack($c)")

  override protected def withNewChildInternal(c: Expression): Int8Pack =
    copy(child = c)
}

/** Exact integer dot product of two packed int8 binary vectors. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.int8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.int8Dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Dot product of two array<double> columns (codegen'd kernel). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Single-pass L2 normalization of an array<double> column. */
  def l2normalize(v: Column): Column =
    column(L2Normalize(expression(v)))

  /** Pack an int8-range array<int> into a 1-byte-per-component binary. */
  def int8pack(v: Column): Column =
    column(Int8Pack(expression(v)))

  /** Exact integer dot product of two int8-packed binary vectors. */
  def int8dot(a: Column, b: Column): Column =
    column(Int8Dot(expression(a), expression(b)))
}

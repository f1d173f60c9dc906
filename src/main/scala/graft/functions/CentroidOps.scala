package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Centroid-assignment kernels. The centroid matrix lives in the
  * expression as a reference object — NOT as per-centroid literal
  * arrays, which would inline nlist × dims constants into generated
  * code (compilation blowup and per-row literal array construction;
  * measured 3× slower at nlist=8, dims=64).
  *
  * Scoring is dot product against each centroid; "nearest" = max dot
  * (centroids are unit-normalized by the trainer), ties to the lowest
  * centroid id — identical to sorting (-dot, cid) structs ascending.
  */
object CentroidKernels {

  private def dotRow(v: ArrayData, c: Array[Double]): Double = {
    val n = math.min(v.numElements(), c.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += v.getDouble(i) * c(i); i += 1 }
    acc
  }

  def nearest(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = dotRow(v, cents(0))
    var i = 1
    while (i < cents.length) {
      val d = dotRow(v, cents(i))
      if (d > bestDot) { best = i; bestDot = d }
      i += 1
    }
    best
  }

  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      if (dotRow(v, planes(p)) > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Driver-side variant of [[nearest]] over a plain vector (the
    * hierarchical trainer's in-memory assignment loop).
    */
  def nearestVec(v: Array[Double], cents: Array[Array[Double]]): Int = {
    def dot(c: Array[Double]): Double = {
      val n = math.min(v.length, c.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += v(i) * c(i); i += 1 }
      acc
    }
    var best = 0
    var bestDot = dot(cents(0))
    var i = 1
    while (i < cents.length) {
      val d = dot(cents(i))
      if (d > bestDot) { best = i; bestDot = d }
      i += 1
    }
    best
  }

  /** Two-level assignment: nearest coarse cell, then nearest fine
    * centroid WITHIN that cell — O((nCoarse + cellFine) · dims) per
    * row instead of the flat argmax's O(nlist · dims). Returns the
    * GLOBAL fine centroid id (flat index into `fine`); `offsets` maps
    * coarse cell c to fine ids [offsets(c), offsets(c+1)). Every cell
    * holds >= 1 fine centroid (the trainer compacts empty cells out).
    */
  def nearestTwoLevel(v: ArrayData, coarse: Array[Array[Double]],
                      fine: Array[Array[Double]], offsets: Array[Int]): Int = {
    val cell = nearest(v, coarse)
    val end = offsets(cell + 1)
    var best = offsets(cell)
    var bestDot = dotRow(v, fine(best))
    var i = best + 1
    while (i < end) {
      val d = dotRow(v, fine(i))
      if (d > bestDot) { best = i; bestDot = d }
      i += 1
    }
    best
  }

  /** Two-level probe: the `nprobeCoarse` nearest coarse cells, then
    * the top `nprobe` fine centroids among those cells' lists, nearest
    * first (global fine ids, ties to the lowest id — the same order
    * [[probes]] yields when every cell is probed).
    */
  def probesTwoLevel(v: ArrayData, coarse: Array[Array[Double]],
                     fine: Array[Array[Double]], offsets: Array[Int],
                     nprobeCoarse: Int, nprobe: Int): ArrayData = {
    val cellDots = Array.tabulate(coarse.length)(i => dotRow(v, coarse(i)))
    val cellPicked = new Array[Boolean](coarse.length)
    val nCells = math.min(nprobeCoarse, coarse.length)
    var nCand = 0
    val cells = new Array[Int](nCells)
    var c = 0
    while (c < nCells) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < coarse.length) {
        if (!cellPicked(i) && cellDots(i) > bestDot) { best = i; bestDot = cellDots(i) }
        i += 1
      }
      cellPicked(best) = true
      cells(c) = best
      nCand += offsets(best + 1) - offsets(best)
      c += 1
    }
    // gather candidate fine ids, then select top nprobe by (dot, -id)
    val cand = new Array[Int](nCand)
    val dots = new Array[Double](nCand)
    var j = 0
    c = 0
    while (c < nCells) {
      var i = offsets(cells(c))
      val end = offsets(cells(c) + 1)
      while (i < end) { cand(j) = i; dots(j) = dotRow(v, fine(i)); i += 1; j += 1 }
      c += 1
    }
    val picked = new Array[Boolean](nCand)
    val out = new Array[Int](math.min(nprobe, nCand))
    var k = 0
    while (k < out.length) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var bestId = Int.MaxValue
      var i = 0
      while (i < nCand) {
        if (!picked(i) && (dots(i) > bestDot ||
            (dots(i) == bestDot && cand(i) < bestId))) {
          best = i; bestDot = dots(i); bestId = cand(i)
        }
        i += 1
      }
      picked(best) = true
      out(k) = cand(best)
      k += 1
    }
    new GenericArrayData(out.map(Int.box))
  }

  /** v − cents(cid): the IVF residual (Jégou et al. 2011 §IV — FAISS
    * `by_residual`). PQ codebooks trained on residuals see the
    * small-variance displacement around each coarse cell instead of
    * the full vector spread, which is what holds recall at small
    * nprobe as nlist grows. Components past the centroid's length
    * pass through unchanged (the dotRow convention).
    */
  def residual(v: ArrayData, cid: Int, cents: Array[Array[Double]]): GenericArrayData = {
    val c = cents(cid)
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = v.getDouble(i) - (if (i < c.length) c(i) else 0.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** dot(v, cents(cid)) — the query-to-coarse-centroid term a
    * residual-encoded ADC score adds back (query · x ≈ query · c_cid +
    * query · residual-reconstruction).
    */
  def dotAt(v: ArrayData, cid: Int, cents: Array[Array[Double]]): Double =
    dotRow(v, cents(cid))

  /** Top-`nprobe` centroid ids, nearest first (selection over nlist). */
  def probes(v: ArrayData, cents: Array[Array[Double]], nprobe: Int): ArrayData = {
    val dots = Array.tabulate(cents.length)(i => dotRow(v, cents(i)))
    val picked = new Array[Boolean](cents.length)
    val out = new Array[Int](math.min(nprobe, cents.length))
    var k = 0
    while (k < out.length) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        if (!picked(i) && dots(i) > bestDot) { best = i; bestDot = dots(i) }
        i += 1
      }
      picked(best) = true
      out(k) = best
      k += 1
    }
    new GenericArrayData(out.map(Int.box))
  }
}

/** Random-hyperplane LSH bucket id: bit p is the sign of the
  * projection onto plane p. Planes ride as a reference object.
  */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.lshBucket(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidKernels.lshBucket($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
}

case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.nearest(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CentroidKernels.nearest($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

case class ProbeCentroids(child: Expression, cents: Array[Array[Double]],
                          nprobe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.probes(input.asInstanceOf[ArrayData], cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CentroidKernels.probes($c, $ref, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): ProbeCentroids =
    copy(child = c)
}

case class NearestCentroidHier(child: Expression, coarse: Array[Array[Double]],
                               fine: Array[Array[Double]], offsets: Array[Int])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.nearestTwoLevel(input.asInstanceOf[ArrayData], coarse, fine, offsets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fi = ctx.addReferenceObj("fine", fine, "double[][]")
    val of = ctx.addReferenceObj("offsets", offsets, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CentroidKernels.nearestTwoLevel($c, $co, $fi, $of)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidHier =
    copy(child = c)
}

case class ProbeCentroidsHier(child: Expression, coarse: Array[Array[Double]],
                              fine: Array[Array[Double]], offsets: Array[Int],
                              nprobeCoarse: Int, nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.probesTwoLevel(input.asInstanceOf[ArrayData], coarse, fine,
      offsets, nprobeCoarse, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fi = ctx.addReferenceObj("fine", fine, "double[][]")
    val of = ctx.addReferenceObj("offsets", offsets, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CentroidKernels.probesTwoLevel($c, $co, $fi, $of, $nprobeCoarse, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): ProbeCentroidsHier =
    copy(child = c)
}

/** (vec, cid) → vec − cents(cid): the IVF residual under a fixed
  * centroid matrix (reference object, the LshBucket rationale).
  */
case class CentroidResidual(left: Expression, right: Expression,
                            cents: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, cid: Any): Any =
    CentroidKernels.residual(v.asInstanceOf[ArrayData],
      cid.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.CentroidKernels.residual($v, $c, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** (vec, cid) → dot(vec, cents(cid)) — the ADC coarse term. */
case class CentroidDot(left: Expression, right: Expression,
                       cents: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any, cid: Any): Any =
    CentroidKernels.dotAt(v.asInstanceOf[ArrayData],
      cid.asInstanceOf[Int], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.CentroidKernels.dotAt($v, $c, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidDot =
    copy(left = newLeft, right = newRight)
}

object CentroidOps {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def nearestCentroid(vec: Column, cents: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(vec), cents))

  /** vec − cents(cid) per row (the IVF residual). */
  def centroidResidual(vec: Column, cid: Column,
                       cents: Array[Array[Double]]): Column =
    column(CentroidResidual(expression(vec), expression(cid), cents))

  /** dot(vec, cents(cid)) per row. */
  def centroidDot(vec: Column, cid: Column,
                  cents: Array[Array[Double]]): Column =
    column(CentroidDot(expression(vec), expression(cid), cents))

  def probeCentroids(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    column(ProbeCentroids(expression(vec), cents, nprobe))

  def nearestCentroidHier(vec: Column, coarse: Array[Array[Double]],
                          fine: Array[Array[Double]], offsets: Array[Int]): Column =
    column(NearestCentroidHier(expression(vec), coarse, fine, offsets))

  def probeCentroidsHier(vec: Column, coarse: Array[Array[Double]],
                         fine: Array[Array[Double]], offsets: Array[Int],
                         nprobeCoarse: Int, nprobe: Int): Column =
    column(ProbeCentroidsHier(expression(vec), coarse, fine, offsets,
      nprobeCoarse, nprobe))

  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    column(LshBucket(expression(vec), planes))
}

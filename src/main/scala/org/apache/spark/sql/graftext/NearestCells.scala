package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** Coarse-quantizer shortlist for cell-partitioned near-dup
  * ([[graft.ext.Similarity.cellNearDupPairs]]): for one embedding row,
  * score every codebook cell by float cosine and return the 1-based
  * codebook positions whose score survives the nProbe guard band.
  *
  * Exists because the Column formulation — `transform` over an
  * nCells-element codebook literal — is a higher-order function, and
  * HOFs are CodegenFallback: every per-cell dot and every sort
  * comparison runs through interpreted `Expression.eval`. At the
  * constant-cell-size dial (nCells ∝ corpus) that interpreted constant
  * made the ASSIGNMENT pass the quadratic bottleneck (a 20k-row ×
  * 640-cell occupancy audit did not finish in 8 minutes; this
  * expression runs the identical arithmetic as one JIT-compiled loop).
  *
  * Bit-parity contract with the Column formulation it replaces
  * (pinned by SimilaritySpec):
  *   - per-cell score `-dotF(e,c) / (sqrt(dotF(e,e)) · ‖c‖)` with
  *     [[FloatVecDot]] accumulation order (float products summed in
  *     double, index order);
  *   - cut = score of the min(nProbe, nCells)-th cell in ascending
  *     (negated-score) order; survivors = all cells ≤ cut + 1e-3 —
  *     the same guard band the exact-decimal re-rank then resolves.
  * NULL on null/ragged input (any null element, or length ≠ dim),
  * mirroring [[FloatVecDot]]'s poison rule.
  */
case class NearestCellsShortlist(child: Expression, codebook: Array[Float],
                                 norms: Array[Double], dim: Int, nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells_shortlist"

  @transient private lazy val nCells = norms.length

  // Per-task scratch: one score buffer + one embedding buffer reused
  // across rows (at the nCells ∝ n dial the per-row ns allocation is
  // 50 KB+ of pure GC churn). compute() is not re-entrant within a
  // thread, which is exactly the Expression.eval contract.
  @transient private lazy val nsBuf =
    ThreadLocal.withInitial[Array[Double]](() => new Array[Double](nCells))
  @transient private lazy val eBuf =
    ThreadLocal.withInitial[Array[Double]](() => new Array[Double](dim))
  @transient private lazy val topBuf =
    ThreadLocal.withInitial[Array[Double]](() =>
      new Array[Double](math.min(nProbe, math.max(nCells, 1))))

  /** One compiled pass: dim-loop per cell over the flattened codebook,
    * with the cut found by p-smallest insertion selection (p = nProbe,
    * tiny) instead of sorting all nCells scores — the full sort was
    * ~nCells·log nCells compares per ROW, which at 200k rows × 6400
    * cells out-costed the 82 GFLOP of scoring itself. Called from both
    * interpreted eval and generated code. */
  def compute(x: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n != dim) return null
    val e = eBuf.get()
    var f2 = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      e(i) = v
      f2 += v * v
      i += 1
    }
    val root = math.sqrt(f2)
    val ns = nsBuf.get()
    // top = the p smallest scores seen so far, ascending; top(p-1)
    // after the loop is the p-th smallest counting duplicates — the
    // same cut element_at(sorted, p) selected in the HOF formulation
    val top = topBuf.get()
    val p = top.length
    java.util.Arrays.fill(top, Double.PositiveInfinity)
    var k = 0
    while (k < nCells) {
      var acc = 0.0
      var j = 0
      val off = k * dim
      while (j < dim) {
        acc += e(j) * codebook(off + j).toDouble
        j += 1
      }
      val s = -acc / (root * norms(k))
      ns(k) = s
      if (s < top(p - 1)) {
        var m = p - 1
        while (m > 0 && top(m - 1) > s) { top(m) = top(m - 1); m -= 1 }
        top(m) = s
      }
      k += 1
    }
    val cut = top(p - 1) + 1e-3
    var cnt = 0
    k = 0
    while (k < nCells) { if (ns(k) <= cut) cnt += 1; k += 1 }
    val out = new Array[Int](cnt)
    var o = 0
    k = 0
    while (k < nCells) {
      if (ns(k) <= cut) { out(o) = k + 1; o += 1 }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nearestCells", this,
        classOf[NearestCellsShortlist].getName)
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCellsShortlist = copy(child = newChild)
}

/** private[sql] access bridge, same pattern as [[DecimalVecBridge]]. */
object NearestCellsBridge {
  def shortlistColumn(emb: Column, codebook: Array[Float],
                      norms: Array[Double], dim: Int, nProbe: Int): Column =
    ExpressionUtils.column(NearestCellsShortlist(
      ExpressionUtils.expression(emb), codebook, norms, dim, nProbe))

  def childShortlistColumn(emb: Column, supers: Column,
                           codebook: Array[Float], norms: Array[Double],
                           childrenBySuper: Array[Array[Int]],
                           dim: Int, nProbe: Int): Column =
    ExpressionUtils.column(NearestChildCellsShortlist(
      ExpressionUtils.expression(emb), ExpressionUtils.expression(supers),
      codebook, norms, childrenBySuper, dim, nProbe))
}

/** Child stage of the two-level (hierarchical) cell shortlist: given
  * the probed SUPER-cell positions for a row, score only the child
  * cells belonging to those supers and return the nProbe guard-band
  * survivors as 1-based child-codebook positions.
  *
  * This is the O(n·√nCells) remedy SCALE.md §12 sizes: the flat
  * shortlist is n·nCells fused-multiply-adds — quadratic overall at
  * the constant-cell-size dial (nCells ∝ n) — while ranking ~√nCells
  * supers and then only the probed supers' children keeps the
  * assignment near-linear with the same exact-decimal re-rank on the
  * survivor handful. Scoring and cut semantics are identical to
  * [[NearestCellsShortlist]], restricted to the candidate children.
  */
case class NearestChildCellsShortlist(left: Expression, right: Expression,
                                      codebook: Array[Float],
                                      norms: Array[Double],
                                      childrenBySuper: Array[Array[Int]],
                                      dim: Int, nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_child_cells_shortlist"

  @transient private lazy val eBuf =
    ThreadLocal.withInitial[Array[Double]](() => new Array[Double](dim))
  @transient private lazy val topBuf =
    ThreadLocal.withInitial[Array[Double]](() =>
      new Array[Double](math.max(nProbe, 1)))

  def compute(x: ArrayData, sup: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n != dim) return null
    val e = eBuf.get()
    var f2 = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      e(i) = v
      f2 += v * v
      i += 1
    }
    val root = math.sqrt(f2)
    val nSup = sup.numElements()
    var total = 0
    var s = 0
    while (s < nSup) {
      total += childrenBySuper(sup.getInt(s) - 1).length
      s += 1
    }
    val candPos = new Array[Int](total)
    val candNs = new Array[Double](total)
    val top = topBuf.get()
    val p = math.min(nProbe, math.max(total, 1))
    java.util.Arrays.fill(top, Double.PositiveInfinity)
    var c = 0
    s = 0
    while (s < nSup) {
      val kids = childrenBySuper(sup.getInt(s) - 1)
      var t = 0
      while (t < kids.length) {
        val k = kids(t)
        var acc = 0.0
        var j = 0
        val off = k * dim
        while (j < dim) {
          acc += e(j) * codebook(off + j).toDouble
          j += 1
        }
        val sc = -acc / (root * norms(k))
        candPos(c) = k + 1
        candNs(c) = sc
        if (sc < top(p - 1)) {
          var m = p - 1
          while (m > 0 && top(m - 1) > sc) { top(m) = top(m - 1); m -= 1 }
          top(m) = sc
        }
        c += 1
        t += 1
      }
      s += 1
    }
    if (total == 0) return new GenericArrayData(Array.empty[Int])
    val cut = top(p - 1) + 1e-3
    var cnt = 0
    c = 0
    while (c < total) { if (candNs(c) <= cut) cnt += 1; c += 1 }
    val out = new Array[Int](cnt)
    var o = 0
    c = 0
    while (c < total) {
      if (candNs(c) <= cut) { out(o) = candPos(c); o += 1 }
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("nearestChildCells", this,
        classOf[NearestChildCellsShortlist].getName)
      s"""
         |${ev.value} = $ref.compute($a, $b);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestChildCellsShortlist =
    copy(left = newLeft, right = newRight)
}

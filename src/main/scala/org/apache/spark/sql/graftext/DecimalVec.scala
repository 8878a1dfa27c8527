package org.apache.spark.sql.graftext

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exact-decimal vector kernels, bit-compatible with the
  * `aggregate(zip_with(...))` DECIMAL(25,12) folds in
  * [[graft.ext.Similarity]] but executed as one compiled loop per row
  * instead of an interpreted per-element lambda chain (higher-order
  * functions evaluate their lambda boxed, per element, rebuilding a
  * struct accumulator each step — measured ~10× slower than these
  * kernels on the ANN paths).
  *
  * Exactness contract (must never drift from the Column formulation,
  * or oracle hashes flip):
  *   - each product is `(double) a[i] * (double) b[i]`, then
  *     `BigDecimal.valueOf(product).setScale(12, HALF_UP)` — exactly
  *     Spark's `Cast(double, DecimalType(25,12))` (Scala's
  *     `BigDecimal.decimal` = `valueOf` shortest-repr semantics,
  *     HALF_UP at scale 12);
  *   - the running sum is plain BigDecimal addition, which at a fixed
  *     scale of 12 is exact and order-independent — identical to the
  *     fold's `(acc + v).cast(DECIMAL(25,12))` whose cast never
  *     rounds (scale already 12).
  *
  * Null semantics mirror [[FloatVecDot]]: NULL on mismatched lengths
  * and on null elements.
  */
object DecimalVec {

  val AccType: DecimalType = DecimalType(25, 12)

  /** Exact DECIMAL(25,12) dot; null on length mismatch / null elems /
    * non-finite or precision-overflowing products / an overflowing
    * RUNNING sum — the HOF fold's semantics under
    * `spark.sql.ansi.enabled=false`, where every Cast(NaN/Inf/huge ->
    * decimal) yields NULL. Deliberate divergence under ANSI mode
    * (Spark 4's default): there the fold THROWS on a sum overflow
    * (NaN products still cast to null) — a kernel that killed a
    * whole job on one dirty vector would be unusable at corpus
    * scale, so out-of-range rows degrade to NULL instead and can be
    * filtered, counted, or quarantined like any other malformed
    * input. In-range values are bit-identical to the fold under
    * EITHER mode (the cast arithmetic only differs at the
    * error/null boundary). */
  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      if (!java.lang.Double.isFinite(p) || math.abs(p) >= 1e13) return null
      acc = acc.add(JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      // the HOF fold casts EVERY running sum back to decimal(25,12),
      // so a transient overflow poisons the whole dot (null non-ANSI,
      // exception ANSI) even when sign-cancelling later terms bring
      // the total back in range — check each step, not just the final
      // value, so the kernel never reports a value where the fold
      // reports none
      if (acc.precision - acc.scale > 13) return null
      i += 1
    }
    Decimal(acc, 25, 12)
  }

  /** Exact DECIMAL(25,12) dot restricted to elements
    * [start, start+len) of BOTH arrays — the product-quantization
    * subspace kernel: a PQ codeword is stored as a full-width vector
    * aligned at its subspace offset, so one shared offset addresses
    * both sides and no per-row array slicing ever materializes.
    * Same exactness/null contract as [[dot]]; additionally null when
    * the range falls outside either array (a misconfigured m would
    * otherwise read garbage silently). */
  def dotRange(a: ArrayData, b: ArrayData, start: Int, len: Int): Decimal = {
    if (start < 0 || len < 0 ||
        a.numElements() < start + len || b.numElements() < start + len)
      return null
    var acc = JBigDecimal.ZERO
    var i = start
    val end = start + len
    while (i < end) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      if (!java.lang.Double.isFinite(p) || math.abs(p) >= 1e13) return null
      acc = acc.add(JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      if (acc.precision - acc.scale > 13) return null
      i += 1
    }
    Decimal(acc, 25, 12)
  }

  /** Packed SRP sign bits (Charikar 2002): plane p's projection is the
    * exact-decimal sum of ±x_i with deterministic hash-parity weights;
    * bit p set iff projection >= 0. Matches
    * [[graft.ext.Similarity.srpBucket]] / its DuckDB twin term by
    * term. Null on null input array or null elements; a non-finite
    * element yields bucket 0, matching the HOF fold (every plane's
    * NULL projection fails the `>= 0` test, so no bit is set) instead
    * of throwing from `BigDecimal.valueOf(NaN)`. */
  def srpBucket(emb: ArrayData, nPlanes: Int, planeOffset: Int): Any = {
    val dim = emb.numElements()
    val acc = Array.fill(nPlanes)(JBigDecimal.ZERO)
    var i = 0
    while (i < dim) {
      if (emb.isNullAt(i)) return null
      val x = emb.getFloat(i).toDouble
      if (!java.lang.Double.isFinite(x)) return 0L
      var p = 0
      while (p < nPlanes) {
        val plane = planeOffset + p
        val h = (plane.toLong * 1315423911L + i.toLong * 2654435761L) %
          2038074743L
        val w = if ((h & 1L) == 1L) 1.0 else -1.0
        acc(p) = acc(p).add(
          JBigDecimal.valueOf(x * w).setScale(12, RoundingMode.HALF_UP))
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      if (acc(p).signum() >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Codegen wrapper for [[DecimalVec.dot]] — one static call inside
  * whole-stage codegen. */
case class DecimalVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DecimalVec.AccType
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dot")
      s"""
         |org.apache.spark.sql.types.Decimal $d =
         |  org.apache.spark.sql.graftext.DecimalVec.dot($a, $b);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalVecDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen wrapper for [[DecimalVec.dotRange]] with the subspace
  * offset supplied as a COLUMN (`sub`), so one compiled expression
  * serves every subspace row of an exploded PQ frame: the evaluated
  * range is [sub·subLen, (sub+1)·subLen). */
case class DecimalVecDotSub(first: Expression, second: Expression,
                            third: Expression, subLen: Int)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)
  override def dataType: DataType = DecimalVec.AccType
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_vec_dot_sub"

  override protected def nullSafeEval(a: Any, b: Any, sub: Any): Any =
    DecimalVec.dotRange(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      sub.asInstanceOf[Int] * subLen, subLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, sub) => {
      val d = ctx.freshName("dotSub")
      s"""
         |org.apache.spark.sql.types.Decimal $d =
         |  org.apache.spark.sql.graftext.DecimalVec.dotRange(
         |    $a, $b, $sub * $subLen, $subLen);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DecimalVecDotSub =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen wrapper for [[DecimalVec.srpBucket]]. */
case class SrpBucketExpr(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_bucket"

  override protected def nullSafeEval(emb: Any): Any =
    DecimalVec.srpBucket(emb.asInstanceOf[ArrayData], nPlanes, planeOffset)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val b = ctx.freshName("bucket")
      s"""
         |Object $b = org.apache.spark.sql.graftext.DecimalVec.srpBucket(
         |  $emb, $nPlanes, $planeOffset);
         |if ($b == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $b).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SrpBucketExpr = copy(child = newChild)
}

/** private[sql] access bridge (ExpressionUtils) for graft code. */
object DecimalVecBridge {
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(DecimalVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def srpBucketColumn(emb: Column, nPlanes: Int, planeOffset: Int): Column =
    ExpressionUtils.column(SrpBucketExpr(
      ExpressionUtils.expression(emb), nPlanes, planeOffset))

  def dotSubColumn(a: Column, b: Column, sub: Column, subLen: Int): Column =
    ExpressionUtils.column(DecimalVecDotSub(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(sub), subLen))
}

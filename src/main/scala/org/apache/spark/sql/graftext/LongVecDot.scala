package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native integer dot product over two `array<long>` columns — the
  * quantized-search twin of [[FloatVecDot]]: int8-quantized vectors
  * carry their components as small longs, and their ranking score is
  * a pure int64 multiply-add (exact, no fold-order concerns). The
  * generated code is one primitive loop inside whole-stage codegen
  * instead of the boxed per-element chain `aggregate(zip_with(...))`
  * plans to — the difference between a memory-bandwidth scan and an
  * allocation benchmark on a brute-force pass over the corpus.
  *
  * Same null contract as [[FloatVecDot]]: NULL on length mismatch or
  * any null element.
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vec_dot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}

/** private[sql] access bridge for [[graft.functions.VecMath]]. */
object LongVecDot {
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(LongVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

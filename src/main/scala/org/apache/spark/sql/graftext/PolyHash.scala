package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash h = fold(cp)( (h*31 + cp) mod P ) over
  * Unicode code points — the compiled twin of
  * [[graft.functions.Hashing.polyHashHof]] (an `aggregate` over
  * `split(s, "")`, which evaluates an interpreted lambda per character
  * and allocates the single-char array first; this kernel is one loop,
  * no allocation, inside whole-stage codegen).
  *
  * Code-point iteration matches DuckDB's `ascii(c)` (code point) on
  * the oracle side for ALL inputs; the HOF twin is only
  * char-equivalent on ASCII (Spark's `ascii` on multi-byte chars
  * differs), so the kernel-vs-HOF pin in HashingSpec is asserted on
  * ASCII data — which is also all the fixtures contain.
  */
object PolyHash {
  /** Decodes UTF-8 code points straight off the UTF8String's bytes —
    * no java.lang.String materialization (this runs once per distinct
    * gram/token of the corpus; a toString here would be billions of
    * decode+copy allocations). UTF8String contents are valid UTF-8 by
    * construction, so the decoder handles only well-formed
    * 1-4 byte sequences. */
  def hash(s: UTF8String, p: Long): Long = {
    val n = s.numBytes
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { len = 2; cp = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { len = 3; cp = b0 & 0x0f }
      else { len = 4; cp = b0 & 0x07 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      i += len
      h = (h * 31L + cp) % p
    }
    h
  }
}

case class PolyHashExpr(child: Expression, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any): Any =
    PolyHash.hash(s.asInstanceOf[UTF8String], p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graftext.PolyHash.hash($s, ${p}L)")

  override protected def withNewChildInternal(
      newChild: Expression): PolyHashExpr = copy(child = newChild)
}

object PolyHashBridge {
  def column(s: Column, p: Long): Column =
    ExpressionUtils.column(PolyHashExpr(ExpressionUtils.expression(s), p))
}

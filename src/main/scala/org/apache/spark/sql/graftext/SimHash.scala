package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document simhash in one compiled pass (Charikar 2002) —
  * replaces the explode(tokens) → 48-conditional-sum groupBy pipeline
  * with a per-row loop: distinct whitespace tokens, polynomial
  * code-point hash + universal-hash permutation per token, ±1 per bit,
  * sign test packs the bits. Semantically identical to
  * [[graft.ext.Dedup.simhashViaAgg]] (pinned by DedupSpec) and to the
  * DuckDB oracle — same token split (trailing empties kept, like
  * Spark/DuckDB regex split), same hashes, same `> 0` sign rule —
  * but with NO shuffle: the signature never leaves its input row.
  */
object SimHash {

  /** Polynomial code-point hash of a token (same fold as
    * [[PolyHash.hash]], over a substring of a decoded document). */
  private def hashToken(s: String, from: Int, until: Int, p: Long): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % p
    }
    h
  }

  /** Bits per universal-hash permutation: perm values live in
    * [0, P2) with P2 < 2^31, so exactly bits 0..30 carry entropy. A
    * signature of `bits` (<= 62) therefore draws bits 0..30 from perm
    * (a, b) and the rest from perm (a2, b2) — a single perm would
    * leave the top bits constant-zero, making the top band identical
    * for every document and its band join a full quadratic all-pairs. */
  val PermBits = 31

  def simhash(text: UTF8String, bits: Int, p: Long, permA: Long,
              permB: Long, permA2: Long, permB2: Long, permP: Long): Long = {
    val str = text.toString
    val counts = new Array[Int](bits)
    val seen = new java.util.HashSet[String]()
    var start = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        if (seen.add(tok)) {
          val h0 = hashToken(str, start, i, p)
          val h1 = (h0 * permA + permB) % permP
          val h2 = (h0 * permA2 + permB2) % permP
          var j = 0
          while (j < bits) {
            val bit =
              if (j < PermBits) (h1 >> j) & 1L
              else (h2 >> (j - PermBits)) & 1L
            if (bit == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

case class SimHashExpr(child: Expression, bits: Int, p: Long, permA: Long,
                       permB: Long, permA2: Long, permB2: Long, permP: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(s: Any): Any =
    SimHash.simhash(s.asInstanceOf[UTF8String], bits, p, permA, permB,
      permA2, permB2, permP)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graftext.SimHash.simhash(" +
        s"$s, $bits, ${p}L, ${permA}L, ${permB}L, ${permA2}L, ${permB2}L, " +
        s"${permP}L)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashBridge {
  def column(text: Column, bits: Int, p: Long, permA: Long, permB: Long,
             permA2: Long, permB2: Long, permP: Long): Column =
    ExpressionUtils.column(SimHashExpr(
      ExpressionUtils.expression(text), bits, p, permA, permB,
      permA2, permB2, permP))
}

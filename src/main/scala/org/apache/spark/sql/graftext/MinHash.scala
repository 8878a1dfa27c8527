package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document minhash signature in one compiled pass (Broder
  * 1997): word `shingle`-grams over the whitespace tokens, polynomial
  * code-point hash per distinct gram, k universal-hash permutation
  * minima. Replaces the explode(grams) → k-min groupBy pipeline —
  * the signature never leaves its input row. Pinned bit-identical to
  * [[graft.ext.Dedup.minhashSignatureViaAgg]] by DedupSpec.
  *
  * Returns NULL when the document has fewer than `shingle` tokens —
  * exactly the aggregate formulation's behavior, where a doc with no
  * grams contributes no group and so has NO signature row (callers
  * filter nulls before banding).
  */
object MinHash {

  def signature(text: UTF8String, shingle: Int, perms: Array[Long],
                p: Long, permP: Long): ArrayData = {
    val str = text.toString
    // token boundaries (regex-split semantics: empty tokens kept)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        starts.add(start); ends.add(i); start = i + 1
      }
      i += 1
    }
    val nTok = starts.size()
    if (nTok < shingle) return null
    val k = perms.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var g = 0
    while (g <= nTok - shingle) {
      // gram = tokens g..g+shingle-1 joined by a single space — which
      // is exactly the substring between the first token's start and
      // the last token's end (tokens are space-separated in `str`)
      val from = starts.get(g)
      val until = ends.get(g + shingle - 1)
      val gram = str.substring(from, until)
      if (seen.add(gram)) {
        var h = 0L
        var ci = from
        while (ci < until) {
          val cp = str.codePointAt(ci)
          ci += Character.charCount(cp)
          h = (h * 31L + cp) % p
        }
        var pi = 0
        while (pi < k) {
          val hp = (h * perms(2 * pi) + perms(2 * pi + 1)) % permP
          if (hp < mins(pi)) mins(pi) = hp
          pi += 1
        }
      }
      g += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashExpr(child: Expression, shingle: Int, perms: Seq[Long],
                       p: Long, permP: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private lazy val permArr: Array[Long] = perms.toArray

  override protected def nullSafeEval(s: Any): Any =
    MinHash.signature(s.asInstanceOf[UTF8String], shingle, permArr, p, permP)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val permsRef = ctx.addReferenceObj("perms", permArr, "long[]")
    nullSafeCodeGen(ctx, ev, s => {
      val sig = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $sig =
         |  org.apache.spark.sql.graftext.MinHash.signature(
         |    $s, $shingle, $permsRef, ${p}L, ${permP}L);
         |if ($sig == null) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashExpr = copy(child = newChild)
}

object MinHashBridge {
  def column(text: Column, shingle: Int, perms: Seq[(Long, Long)], p: Long,
             permP: Long): Column =
    ExpressionUtils.column(MinHashExpr(ExpressionUtils.expression(text),
      shingle, perms.flatMap(ab => Seq(ab._1, ab._2)), p, permP))
}

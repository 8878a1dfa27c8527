package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document winnowed fingerprint set in one compiled pass
  * (Schleimer, Wilkerson, Aiken, SIGMOD 2003): polynomial code-point
  * hash per word `k`-gram (positional, duplicates kept — the window
  * stream), sliding `w`-window minima via a monotonic deque (O(n)
  * total, not O(n·w)), distinct minima in first-occurrence order.
  * Replaces the interpreted transform(grams → hash) → transform(
  * windows → array_min) HOF pipeline, which CodegenFallback executes
  * per element. Pinned bit-identical to
  * [[graft.ext.Dedup.winnowedFingerprintsHof]] by DedupSpec.
  *
  * Returns NULL when the document has fewer than `k` tokens (no
  * grams) — callers filter nulls, matching the oracle's
  * `len(hs) > 0` guard. Documents with 1..w-1 gram hashes yield the
  * min of the single truncated window, same as `slice` truncation in
  * both engines.
  */
object Winnow {

  def fingerprints(text: UTF8String, k: Int, w: Int, p: Long): ArrayData = {
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
    if (nTok < k) return null
    val nGrams = nTok - k + 1
    val hs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      // gram = tokens g..g+k-1 joined by one space = the substring
      // from the first token's start to the last token's end
      var h = 0L
      var ci = starts.get(g)
      val until = ends.get(g + k - 1)
      while (ci < until) {
        val cp = str.codePointAt(ci)
        ci += Character.charCount(cp)
        h = (h * 31L + cp) % p
      }
      hs(g) = h
      g += 1
    }
    // sliding-window minima, monotonic deque over indices; one window
    // per start position 0..max(nGrams-w, 0) (trailing truncation
    // adds no new windows — slice semantics)
    val nWin = math.max(nGrams - w + 1, 1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Integer]()
    var j = 0
    while (j < nGrams) {
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(j))
        deque.removeLast()
      deque.addLast(j)
      val winStart = j - w + 1
      if (winStart >= 0 || j == nGrams - 1) {
        while (deque.peekFirst() < math.max(winStart, 0))
          deque.removeFirst()
        if (math.max(winStart, 0) < nWin)
          out.add(hs(deque.peekFirst()))
      }
      j += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var oi = 0
    while (it.hasNext) { arr(oi) = it.next(); oi += 1 }
    new GenericArrayData(arr)
  }
}

case class WinnowExpr(child: Expression, k: Int, w: Int, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(s: Any): Any =
    Winnow.fingerprints(s.asInstanceOf[UTF8String], k, w, p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val fps = ctx.freshName("fps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $fps =
         |  org.apache.spark.sql.graftext.Winnow.fingerprints(
         |    $s, $k, $w, ${p}L);
         |if ($fps == null) { ${ev.isNull} = true; } else { ${ev.value} = $fps; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowExpr = copy(child = newChild)
}

object WinnowBridge {
  def column(text: Column, k: Int, w: Int, p: Long): Column =
    ExpressionUtils.column(
      WinnowExpr(ExpressionUtils.expression(text), k, w, p))
}

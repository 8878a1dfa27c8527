package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.SuffixArray

/** Brute-force properties for the prefix-doubling suffix ranks: every
  * claim is checked against a plain-Scala recomputation on a randomly
  * generated corpus (fixed seed) engineered for heavy rank collisions
  * (5-word vocabulary, many shared prefixes, short docs). */
class SuffixArraySpec extends SparkSpec {

  private val rnd = new Random(42)
  private val vocab = Array("a", "b", "ab", "ba", "aa")

  /** 40 docs, lengths 1-14 tokens; ~25% start as copies of another
    * doc's prefix so long shared prefixes (and exact dup windows)
    * definitely exist. */
  private val corpus: Seq[(Long, String)] = {
    val base = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(14)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    base.map { case (i, t) =>
      if (i % 4 == 3) (i, base((i - 1).toInt)._2) else (i, t)
    }
  }

  private lazy val docs: DataFrame = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  /** (doc -> token array), splitting exactly like Spark's split. */
  private val toks: Map[Long, Array[String]] =
    corpus.map { case (i, t) => i -> t.split(" ", -1) }.toMap

  private def prefix(d: Long, pos: Int, p: Int): String =
    toks(d).slice(pos, pos + p).mkString(" ")

  test("denseRank equals the sorted-distinct index") {
    import spark.implicits._
    val keys = Seq.fill(500)((rnd.nextLong() % 20, rnd.nextLong() % 20))
      .distinct
    val got = SuffixArray.denseRank(keys.toDF("k1", "k2"), Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }
      .toMap
    assert(got == want)
  }

  test("prefixRanks(8) is the dense rank of the 8-token prefix string") {
    val got = SuffixArray.prefixRanks(docs, col("doc_id"), col("text"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: dense rank over sorted distinct prefix strings
    val all = toks.toSeq.flatMap { case (d, w) =>
      w.indices.map(i => (d, i.toLong, prefix(d, i, 8)))
    }
    val rank = all.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val want = all.map { case (d, i, s) => (d, i) -> rank(s) }.toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("prefixRanks(4) ties exactly the equal 4-prefixes (collision case)") {
    val got = SuffixArray.prefixRanks(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val byRank = got.groupBy(_._2).values
    byRank.foreach { grp =>
      val pfx = grp.map { case ((d, i), _) => prefix(d, i.toInt, 4) }.distinct
      assert(pfx.size == 1, s"one rank spans distinct prefixes: $pfx")
    }
    // and distinct ranks order like the prefix strings
    val rep = got.groupBy(_._2).map { case (r, g) =>
      r -> prefix(g.head._1._1, g.head._1._2.toInt, 4)
    }.toSeq.sortBy(_._1)
    assert(rep.map(_._2) == rep.map(_._2).sorted)
  }

  test("dupWindows(5) matches the brute-force window census") {
    val got = SuffixArray.dupWindows(docs, col("doc_id"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wins = toks.toSeq.flatMap { case (d, w) =>
      (0 to w.length - 5).map(i => (d, i.toLong, prefix(d, i, 5)))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = wins.collect {
      case (d, i, s) if counts(s) > 1 => (d, i, counts(s))
    }.toSet
    assert(want.nonEmpty, "corpus must contain duplicated 5-windows")
    assert(got == want)
  }

  test("dupWindows(4) power-of-two path agrees with brute force") {
    val got = SuffixArray.dupWindows(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wins = toks.toSeq.flatMap { case (d, w) =>
      (0 to w.length - 4).map(i => (d, i.toLong, prefix(d, i, 4)))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = wins.collect {
      case (d, i, s) if counts(s) > 1 => (d, i, counts(s))
    }.toSet
    assert(got == want)
  }

  test("dupSpans are maximal islands of duplicated window starts") {
    val dup = SuffixArray.dupWindows(docs, col("doc_id"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val spans = SuffixArray.dupSpans(docs, col("doc_id"), col("text"), 5)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // spans tile the duplicated positions exactly, and are maximal
    val covered = spans.flatMap { case (d, s, n, _) =>
      (s until s + n).map(p => (d, p))
    }.toSet
    assert(covered == dup)
    spans.foreach { case (d, s, n, tokLen) =>
      assert(tokLen == n + 4) // contiguous starts: len = n + l - 1
      assert(!dup.contains((d, s - 1)), "span start not maximal")
      assert(!dup.contains((d, s + n)), "span end not maximal")
    }
  }

  test("scrubStats matches the brute-force canonical-first census") {
    val got = SuffixArray.scrubStats(docs, col("doc_id"), col("text"), 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wins = toks.toSeq.flatMap { case (d, w) =>
      (0 to w.length - 5).map(i => (d, i.toLong, prefix(d, i, 5)))
    }
    val groups = wins.groupBy(_._3).filter(_._2.size > 1)
    val dropped = groups.values.flatMap { occ =>
      val canon = occ.map(o => (o._1, o._2)).min
      occ.collect { case (d, i, _) if (d, i) != canon =>
        (i until i + 5).map(t => (d, t))
      }.flatten
    }.toSet
    val want = toks.map { case (d, w) =>
      d -> (w.length.toLong, dropped.count(_._1 == d).toLong)
    }
    assert(got == want)
    assert(dropped.nonEmpty, "corpus must exercise the scrub path")
  }

  test("a doc that is the unique canonical copy drops nothing") {
    import spark.implicits._
    // doc 1 and 2 identical; doc 3 unrelated. Canonical = doc 1:
    // doc 1 keeps all tokens, doc 2 drops all covered tokens.
    val tiny = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val got = SuffixArray.scrubStats(tiny, col("doc_id"), col("text"), 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (7L, 0L))
    assert(got(2L) == (7L, 7L))
    assert(got(3L) == (7L, 0L))
  }

  test("documents shorter than the window contribute no windows") {
    import spark.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c a b c"))
      .toDF("doc_id", "text")
    val d = SuffixArray.dupWindows(tiny, col("doc_id"), col("text"), 5)
      .collect()
    // only doc 3 has any 5-window, and its two windows differ
    assert(d.isEmpty)
    val r = SuffixArray.prefixRanks(tiny, col("doc_id"), col("text"), 8)
    assert(r.count() == 10) // every position still ranked
  }
}

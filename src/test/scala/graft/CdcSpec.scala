package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ext.Dedup

/** Content-defined chunking: the shift-robustness property that
  * motivates CDC over fixed tiles, plus boundary/edge semantics. */
class CdcSpec extends SparkSpec {

  // docB = docA with ONE word inserted at the front: every fixed tile
  // re-aligns; CDC boundaries re-derive from content and realign
  private val wordsA = (0 until 60).map(i => s"w$i")
  private def shifted = {
    import spark.implicits._
    Seq((1L, wordsA.mkString(" ")),
      (2L, ("zzz" +: wordsA).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("CDC chunks survive a front-insertion that kills every fixed tile") {
    val cdc = Dedup.cdcChunkStats(shifted, col("doc_id"), col("text"),
      win = 4, mod = 8).collect().map(r => r.getLong(0) -> r).toMap
    // simulated offline: A cuts into 9 chunks, 8 shared with B
    assert(cdc(1L).getLong(1) == 9)
    assert(cdc(1L).getLong(2) == 8, "shared span must re-chunk identically")
    assert(cdc(2L).getLong(2) == 8)
    // fixed 5-word tiles on the same corpus: zero duplicate tiles
    val fixed = Dedup.chunkDupStats(shifted, col("doc_id"), col("text"), 5)
      .collect()
    fixed.foreach(r => assert(r.getLong(3) == 0,
      "a 1-word shift must break every fixed tile (that's the contrast)"))
  }

  test("identical docs share every chunk; short docs are one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, wordsA.mkString(" ")), (2L, wordsA.mkString(" ")),
      (3L, "a b")).toDF("doc_id", "text")
    val out = Dedup.cdcChunkStats(docs, col("doc_id"), col("text"),
      win = 4, mod = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == out(1L).getLong(2), "full dup coverage")
    assert(out(2L).getLong(2) == out(1L).getLong(2))
    // shorter than the window: no boundary possible, one chunk, no dup
    assert(out(3L).getLong(1) == 1 && out(3L).getLong(2) == 0)
  }

  test("cdcIncremental: copies hit the index fully, fresh docs not at all") {
    import spark.implicits._
    val fresh = (100 until 160).map(i => s"q$i")
    val index = Seq((1L, wordsA.mkString(" ")),
      (2L, (0 until 30).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val batch = Seq((3L, wordsA.mkString(" ")),
      (4L, fresh.mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.cdcIncremental(index, batch, col("doc_id"),
      col("text"), win = 4, mod = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(3L, 4L), "only batch docs in the output")
    assert(out(3L).getLong(2) == out(3L).getLong(1),
      "an exact copy of an index doc chunks identically")
    assert(out(4L).getLong(2) == 0, "fresh content shares no chunk")
  }

  test("cdcScrub: clean docs reconstruct byte-identically, copies empty out") {
    import spark.implicits._
    val fresh = (200 until 260).map(i => s"f$i").mkString(" ")
    val docs = Seq((1L, wordsA.mkString(" ")), (2L, wordsA.mkString(" ")),
      (3L, fresh)).toDF("doc_id", "text")
    val out = Dedup.cdcScrub(docs, col("doc_id"), col("text"),
      win = 4, mod = 8).collect().map(r => r.getLong(0) -> r).toMap
    // canonical first occurrence: doc 1 keeps everything, intact
    assert(out(1L).getLong(1) == 0)
    assert(out(1L).getString(2) == wordsA.mkString(" "),
      "CDC chunks tile the doc — no-dup docs must reassemble exactly")
    // the exact copy loses every chunk
    assert(out(2L).getString(2) == "")
    assert(out(2L).getLong(1) > 0)
    // unrelated doc untouched
    assert(out(3L).getLong(1) == 0 && out(3L).getString(2) == fresh)
    // dropped counts reconcile with the stats view
    val stats = Dedup.cdcChunkStats(docs, col("doc_id"), col("text"),
      win = 4, mod = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getLong(1) == stats(2L).getLong(2))
  }

  test("property: chunks tile every doc; scrub is an ordered sub-tiling") {
    import spark.implicits._
    // small alphabet so duplicate chunks arise naturally across docs
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(2, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 80)
        ws <- Gen.listOfN(len, Gen.oneOf("ga", "bu", "zo", "meu", "ra"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val samples = Iterator.continually(corpusGen.sample)
      .flatten.take(12).toSeq
    samples.foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val byId = rows.toMap
      // tiling identity: re-joining all chunks in order IS the doc
      val tiled = Dedup.cdcChunks(docs, col("doc_id"), col("text"),
          win = 3, mod = 4)
        .groupBy("doc_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk")), " ").as("whole"))
        .collect()
      tiled.foreach(r => assert(r.getString(1) == byId(r.getLong(0)),
        s"chunks must tile doc ${r.getLong(0)} exactly"))
      // scrub output: ordered subsequence of the original words, and
      // clean docs (n_dropped = 0) round-trip untouched
      val scrub = Dedup.cdcScrub(docs, col("doc_id"), col("text"),
        win = 3, mod = 4).collect()
      assert(scrub.length == rows.length)
      scrub.foreach { r =>
        val orig = byId(r.getLong(0)).split(" ")
        val kept = r.getString(2) match {
          case "" => Array.empty[String]
          case s => s.split(" ")
        }
        assert(kept.length <= orig.length)
        if (r.getLong(1) == 0) assert(kept.sameElements(orig))
        // order-preserving subsequence check
        var i = 0
        kept.foreach { w =>
          while (i < orig.length && orig(i) != w) i += 1
          assert(i < orig.length, s"scrub invented a word: $w")
          i += 1
        }
      }
    }
  }

  test("chunks tile the document: word counts reconcile") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = 50
    val sample = docs.filter(col("doc_id") < n)
    val out = Dedup.cdcChunkStats(sample, col("doc_id"), col("text"),
      win = 4, mod = 8).collect()
    assert(out.length == sample.count())
    out.foreach { r =>
      assert(r.getLong(1) >= 1, "every doc has at least one chunk")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

class CorpusSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("sampleSplit covers every doc, is deterministic, roughly proportioned") {
    val split = Corpus.sampleSplit(docs.select("doc_id"), col("doc_id"))
    assert(split.count() == docs.count())
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9,
      s"train fraction off: $counts")
    // re-derivation yields the identical assignment (hash, not rand)
    val again = Corpus.sampleSplit(docs.select("doc_id"), col("doc_id"))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("sampleSplit survives extreme int64 ids without wraparound drift") {
    import spark.implicits._
    import graft.functions.Hashing
    val ids = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MinValue + 1,
      -3000000000000000L, 3000000000000000L, 0L, -1L)
    val out = Corpus.sampleSplit(ids.toDF("doc_id"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (a, b) = Hashing.Perms.head
    ids.foreach { id =>
      val expected = (((BigInt(id).mod(Hashing.P2)) * a + b)
        .mod(Hashing.P2) % 100).toLong
      assert(out(id) == expected, s"id=$id bucket=${out(id)} != $expected")
      assert(out(id) >= 0 && out(id) < 100)
    }
  }

  test("stratifiedSample: exact per-stratum hash rule, independent of sampleSplit") {
    import graft.functions.Hashing
    val sample = Corpus.stratifiedSample(docs.select("doc_id", "lang"),
      col("doc_id"), col("lang"), Seq("en" -> 300))
    val rows = sample.collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    val (a, b) = Hashing.Perms(1)
    rows.foreach { r =>
      val expected = (((BigInt(r.getAs[Long]("doc_id")).mod(Hashing.P2)) * a
        + b).mod(Hashing.P2) % 1000).toLong
      assert(r.getAs[Long]("bucket1k") == expected)
      assert(r.getAs[Long]("rate_permille") ==
        (if (r.getAs[String]("lang") == "en") 300L else 1000L))
      assert(r.getAs[Long]("bucket1k") < r.getAs[Long]("rate_permille"))
    }
    // non-'en' strata keep everything at the default 1000‰
    assert(sample.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
    // kept 'en' fraction tracks 300‰
    val enAll = docs.filter(col("lang") === "en").count().toDouble
    val enKept = sample.filter(col("lang") === "en").count().toDouble
    assert(enKept / enAll > 0.15 && enKept / enAll < 0.45,
      s"en keep fraction ${enKept / enAll} far from 0.3")
    // a DIFFERENT permutation than sampleSplit: membership must not be
    // a function of the split bucket (Perms(1) vs Perms.head)
    val joint = Corpus.sampleSplit(
      Corpus.stratifiedSample(docs.select("doc_id", "lang"), col("doc_id"),
        col("lang"), Seq.empty, 500), col("doc_id"))
    assert(joint.select("split").distinct().count() == 3,
      "a 50% sample must still contain all three splits")
  }

  test("vocabTopK is ordered by count with doc-frequency bounds") {
    val top = Corpus.vocabTopK(docs, col("doc_id"), col("text"), 20).collect()
    assert(top.nonEmpty)
    val occs = top.map(_.getAs[Long]("n_occurrences"))
    assert(occs.zip(occs.tail).forall { case (a, b) => a >= b })
    top.foreach(r => assert(r.getAs[Long]("n_docs") <=
      r.getAs[Long]("n_occurrences")))
  }

  test("tfidfTopTerms ranks at most k terms per doc, scores non-increasing") {
    val terms = Corpus.tfidfTopTerms(docs, col("doc_id"), col("text"), 3)
    assert(terms.filter(col("rank") > 3).count() == 0)
    val perDoc = terms.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") > 3).count() == 0)
    val bad = terms.as("a").join(terms.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.rank") < col("b.rank") &&
        col("a.score_q") < col("b.score_q")).count()
    assert(bad == 0, "score must be non-increasing in rank")
  }

  test("lengthQuantiles are ordered and bounded by the data") {
    val q = Corpus.lengthQuantiles(docs, col("lang"),
      length(col("text")).cast("long"))
    val bad = q.filter(col("p25") > col("p50") || col("p50") > col("p75"))
      .count()
    assert(bad == 0)
    assert(q.count() == docs.select("lang").distinct().count())
  }

  test("seqPack: each shard's stream is contiguous and budget-bounded") {
    val budget = 256
    val packed = Corpus.seqPack(docs, col("doc_id"), col("text"),
      budget, 4).collect()
    assert(packed.length == docs.count())
    // offsets live inside a sequence; spans cover exactly the doc's tokens
    packed.foreach { r =>
      val off = r.getAs[Long]("seq_offset")
      assert(off >= 0 && off < budget)
      val expectSpans = (r.getAs[Long]("tokens_before") +
        r.getAs[Long]("n_tokens") - 1) / budget -
        r.getAs[Long]("tokens_before") / budget + 1
      assert(r.getAs[Long]("n_seqs") == expectSpans)
    }
    // per shard: tokens_before is the prefix sum of n_tokens in id order
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var run = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("tokens_before") == run,
          s"gap at doc ${r.getAs[Long]("doc_id")}")
        run += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("packManifest spans tile every doc and never overflow a sequence") {
    val budget = 128
    val m = Corpus.packManifest(docs, col("doc_id"), col("text"),
      budget, 4).collect()
    // per doc: spans are contiguous from 0 and sum to the doc's tokens
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    m.groupBy(_.getLong(0)).foreach { case (id, spans) =>
      val sorted = spans.sortBy(_.getAs[Long]("seq_id"))
      var at = 0L
      sorted.foreach { s =>
        assert(s.getAs[Long]("doc_tok_start") == at,
          s"doc $id spans not contiguous")
        at += s.getAs[Long]("n_toks")
      }
      assert(at == toks(id), s"doc $id spans don't tile its tokens")
    }
    // per (shard, seq): occupied ranges fit the budget and don't overlap
    m.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id")))
      .foreach { case ((sh, seq), spans) =>
        val ranges = spans.map(s => (s.getAs[Long]("seq_tok_start"),
          s.getAs[Long]("seq_tok_start") + s.getAs[Long]("n_toks")))
          .sortBy(_._1)
        ranges.foreach { case (lo, hi) =>
          assert(lo >= 0 && hi <= budget, s"seq ($sh,$seq) overflows")
        }
        ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"seq ($sh,$seq) spans overlap")
        }
      }
  }

  test("seqPackGlobal equals the one-stream spec (two-phase = global prefix)") {
    val budget = 256
    val global = Corpus.seqPackGlobal(docs, col("doc_id"), col("text"),
      budget, 4).collect()
    // recompute the single global token stream driver-side: order by
    // (shard, doc_id), one running total — the spec formulation
    val ordered = global.sortBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("doc_id")))
    var run = 0L
    ordered.foreach { r =>
      assert(r.getAs[Long]("global_offset") == run,
        s"two-phase offset diverged at doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("seq_id") == run / budget)
      assert(r.getAs[Long]("seq_offset") == run % budget)
      run += r.getAs[Long]("n_tokens")
    }
    // the packed stream covers every token exactly once
    assert(run == global.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("mixWeights: shares sum to the corpus and weights invert share") {
    val w = Corpus.mixWeights(docs, col("lang"), col("source"),
      col("text")).collect()
    val total = w.head.getAs[Long]("total_tokens")
    assert(w.map(_.getAs[Long]("group_tokens")).sum == total)
    assert(w.forall(_.getAs[Long]("n_groups") == w.length))
    w.foreach { r =>
      val expected = total.toDouble /
        (w.length.toLong * r.getAs[Long]("group_tokens")).toDouble
      assert(r.getAs[Double]("weight") == expected)
    }
  }

  test("fixedNSample: exactly n per stratum, deterministic, unbiased vs split") {
    val n = 7
    val sample = Corpus.fixedNSample(docs, col("doc_id"), col("source"), n)
    val counts = sample.groupBy("g").count().collect()
    assert(counts.forall(_.getLong(1) == n), counts.mkString(","))
    // re-derivation identical
    val again = Corpus.fixedNSample(docs, col("doc_id"), col("source"), n)
    assert(sample.exceptAll(again).isEmpty)
    // the carve must not correlate with the train/val/test assignment
    // (independent permutation index): sampled docs land in every split
    val splits = Corpus.sampleSplit(
        sample.select(col("doc_id")), col("doc_id"))
      .groupBy("split").count().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"), splits.toString)
  }

  test("dsirWeights: target-language docs are upweighted, quota exact") {
    val w = Corpus.dsirWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", col("source"))
    assert(w.count() == docs.count())
    // en docs carry the en marker tokens the target LM upweights:
    // their mean LLR weight must exceed the non-en mean
    val means = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("w_fp").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en not upweighted: $means")
    // per-stratum selection quota: exactly ceil(n/4) per source
    val quota = w.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum("selected").as("sel"), count(lit(1)).as("n")).collect()
    quota.foreach { r =>
      val (sel, n) = (r.getLong(1), r.getLong(2))
      assert(sel == (n + 3) / 4, s"${r.getString(0)}: $sel of $n")
    }
    // selected docs are exactly the top-w_fp docs of their stratum
    val again = Corpus.dsirWeights(docs, col("doc_id"), col("text"),
      col("lang") === "en", col("source"))
    assert(w.exceptAll(again).isEmpty, "not deterministic")
  }

  test("docChunks: hand-computed windows, full coverage, exact overlap") {
    import spark.implicits._
    // 10 words, chunkLen=8, stride=6 -> chunks [0,8) and [6,10)
    val planted = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.docChunks(planted, col("doc_id"), col("text"), 8, 6)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 8L, (1 to 8).map(i => s"w$i").mkString(" ")),
      (1L, 6L, 4L, (7 to 10).map(i => s"w$i").mkString(" "))),
      s"got ${got.toSeq}")
    // fixture-wide: every word position is covered by >=1 chunk and
    // consecutive chunks overlap by exactly chunkLen - stride (or hit
    // the doc end)
    val chunks = Corpus.docChunks(docs, col("doc_id"), col("text"), 32, 24)
    val bad = chunks
      .groupBy("doc_id")
      .agg(max(col("chunk_start") + col("chunk_words")).as("covered"),
        count(lit(1)).as("nc"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nw")), "doc_id")
      .filter(col("covered") =!= col("nw") ||
        col("nc") =!= expr("(nw + 23) div 24"))
      .count()
    assert(bad == 0)
  }

  test("bm25TopK: tf monotone at equal length, rare term outranks common") {
    import spark.implicits._
    // equal-length docs, single query term with tf 3/2/1/0: ranking
    // must follow tf (saturation is monotone), ties/zeroes by doc_id
    val tf = Seq(
      (1L, "x x x a b c"), (2L, "x x a b c d"),
      (3L, "x a b c d e"), (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val got = Corpus.bm25TopK(tf, col("doc_id"), col("text"),
      Seq("x"), 4).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"got $got")
    // a doc matching only the RARE term must outrank a doc matching
    // only the COMMON term (idf image is monotone in rarity)
    val idf = Seq(
      (1L, "rare b c"), (2L, "common b c"),
      (3L, "common x y"), (4L, "common y z"))
      .toDF("doc_id", "text")
    val top = Corpus.bm25TopK(idf, col("doc_id"), col("text"),
      Seq("rare", "common"), 1).collect()(0).getLong(0)
    assert(top == 1L, s"rare-term doc should rank first, got $top")
  }

  test("bm25PrfExpand: brute parity on the fixture, seeds excluded") {
    val seeds = Seq("spark", "merge", "window", "customer")
    val fbIds = Corpus.bm25TopK(docs, col("doc_id"), col("text"),
      seeds, 20).collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = all.length.toLong
    val tfFb = scala.collection.mutable.Map.empty[String, Long]
    all.filter(d => fbIds(d._1)).foreach(_._2.split(" ", -1)
      .filterNot(seeds.contains).foreach(w =>
        tfFb(w) = tfFb.getOrElse(w, 0L) + 1))
    val dfAll = all.flatMap(_._2.split(" ", -1).distinct)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val brute = tfFb.toSeq.map { case (w, tf) =>
      val df = dfAll(w)
      (w, tf, df,
        (BigInt(tf) * (2 * n - 2 * df + 1) * 1000 / (2 * df + 1)).toLong)
    }.sortBy { case (w, _, _, s) => (-s, w) }.take(15)
    val got = Corpus.bm25PrfExpand(docs, col("doc_id"), col("text"),
      seeds, kDocs = 20, mTerms = 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == brute, s"\ngot:   $got\nbrute: $brute")
    assert(got.forall(r => !seeds.contains(r._1)))
  }

  test("dsirIncremental scores only the batch; novel buckets still score") {
    import spark.implicits._
    val inc = Corpus.dsirIncremental(docs, col("doc_id"), col("text"),
      col("lang") === "en", col("source"), 400L)
    val ids = inc.select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ >= 400L), "fit side leaked into output")
    // planted: the fit side never contains the batch's vocabulary —
    // the dense smoothed LLR table must still give the batch doc a
    // full-token weight (an inner-join llr table would drop tokens)
    val planted = Seq(
      (1L, "alpha alpha alpha", "en", "s1"),
      (2L, "alpha beta", "de", "s1"),
      (10L, "gamma delta epsilon", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Corpus.dsirIncremental(planted, col("doc_id"), col("text"),
      col("lang") === "en", col("source"), 10L).collect()
    assert(got.length == 1 && got(0).getLong(0) == 10L)
    assert(got(0).getAs[Long]("n_toks") == 3L,
      s"novel-bucket tokens dropped: ${got(0)}")
  }

  test("cmsTopkAudit: estimates upper-bound exact counts, rows tighten") {
    val wide = Corpus.cmsTopkAudit(docs, col("text"), 20).collect()
    assert(wide.length == 20)
    wide.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS must never under-count: ${r}"))
    // a 2-cell-wide sketch forces collisions: some token overshoots
    val narrow = Corpus.cmsTopkAudit(docs, col("text"), 20, depth = 4,
      width = 2).collect()
    assert(narrow.exists(r => r.getLong(2) > r.getLong(1)),
      "width=2 must collide somewhere")
    // more rows can only tighten: est(depth=4) <= est(depth=1) per token
    val d1 = Corpus.cmsTopkAudit(docs, col("text"), 20, depth = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    wide.foreach(r =>
      assert(r.getLong(2) <= d1(r.getString(0)),
        s"extra rows loosened ${r.getString(0)}"))
  }

  test("tokenBudgetSample: greedy fill reaches the budget, never under") {
    val budget = 600L
    val out = Corpus.tokenBudgetSample(docs, col("doc_id"), col("text"),
      col("source"), budget).collect()
    assert(out.length == docs.count())
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val kept = rows.filter(_.getBoolean(4))
      val keptTokens = kept.map(_.getLong(2)).sum
      // never undershoots: either the whole stratum is kept or the
      // kept mass reaches the budget
      assert(kept.length == rows.length || keptTokens >= budget,
        s"$src undershot: $keptTokens < $budget")
      // greedy prefix: dropping the LAST kept doc must fall under
      if (kept.length < rows.length) {
        val lastKept = kept.maxBy(_.getLong(3))
        assert(lastKept.getLong(3) < budget)
        assert(keptTokens - lastKept.getLong(2) < budget,
          s"$src kept a doc past the full budget")
      }
      // kept = exactly the cum_before < budget rows
      rows.foreach(r =>
        assert(r.getBoolean(4) == (r.getLong(3) < budget)))
    }
  }

  test("cmsCells merge: sketch(A union B) = sketch(A) + sketch(B)") {
    val a = docs.filter(col("doc_id") < 200)
    val b = docs.filter(col("doc_id") >= 200)
    def cellsMap(df: org.apache.spark.sql.DataFrame) =
      Corpus.cmsCells(df, col("text")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cellsMap(docs)
    val merged = (cellsMap(a).toSeq ++ cellsMap(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(whole == merged, "CMS must be cell-wise additive")
  }

  test("curriculumManifest: positions dense, shards balanced, " +
    "quality monotone over global order") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = graft.ext.Corpus.curriculumManifest(docs, col("doc_id"),
      col("text"), 8)
    m.cache()
    val n = m.count()
    assert(m.agg(min("global_pos"), max("global_pos"),
      countDistinct("global_pos")).first().toSeq == Seq(1L, n, n))
    val sizes = m.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L to 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // quality never increases as global_pos grows
    val ordered = m.orderBy("global_pos").select("quality_score")
      .collect().map(_.getDouble(0))
    assert(ordered.sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
    m.unpersist()
  }

  test("zipfBands: bands partition the vocabulary, mass shares sum") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = graft.ext.Corpus.zipfBands(docs, col("text")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val totalTokens = docs.select(explode(split(col("text"), " ")))
      .count()
    assert(got.values.map(_._2).sum == totalTokens)
    // each band's cumulative fence is respected: head mass <= 50%,
    // head+middle <= 90% (within one word's rounding), all bands
    // together carry everything
    got.get("head").foreach(h => assert(h._3 <= 500000L))
    val headMid = got.get("head").map(_._3).getOrElse(0L) +
      got.get("middle").map(_._3).getOrElse(0L)
    assert(headMid <= 900000L + 1L)
    val shares = got.values.map(_._3).sum
    assert(shares >= 1000000L - got.size && shares <= 1000000L)
    // (no head-vs-tail type-count assertion: the fixture vocabulary
    // is near-uniform, not Zipfian — the band FENCES are the
    // operator's contract, the shape is the data's)
  }

  test("shardBalance: deal is complete, conserved, and folded-deal tight") {
    val n = 8
    val out = Corpus.shardBalance(docs, col("doc_id"), col("text"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).sorted.toSeq == (0L until n.toLong))
    // every doc dealt exactly once; token mass conserved
    assert(out.map(_._2).sum == docs.count())
    val totalToks = docs
      .select(sum(size(split(col("text"), " "))).cast("long"))
      .collect()(0).getLong(0)
    assert(out.map(_._3).sum == totalToks)
    // round-robin by rank: doc counts differ by at most 1 across shards
    assert(out.map(_._2).max - out.map(_._2).min <= 1L)
    // folded-deal bound: shard-mass spread <= the single largest doc
    // (shard i takes one doc from every n-wide weight band; band
    // spreads telescope because band b's max <= band b-1's min)
    val maxDoc = docs.select(max(size(split(col("text"), " "))).cast("long"))
      .collect()(0).getLong(0)
    assert(out.map(_._3).max - out.map(_._3).min <= maxDoc,
      s"spread ${out.map(_._3).max - out.map(_._3).min} > maxDoc $maxDoc")
    // imbalance_ppm is the decimal-folded signed share error
    out.foreach { case (_, _, toks, ppm) =>
      val expect = (BigInt(toks) * n * 1000000 / BigInt(totalToks) -
        1000000).toLong
      assert(ppm == expect)
    }
  }

  test("domainCap keeps exactly the per-domain quality top-cap") {
    val cap = 5
    val out = Corpus.domainCap(docs, col("doc_id"), col("text"),
        col("source"), cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ranks dense from 1, never past the cap
    out.groupBy(_._1).foreach { case (d, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.size.toLong), d)
      assert(rows.size <= cap)
    }
    // brute-force the keep set for one domain from the raw frame
    val dom = out.head._1
    val brute = docs.filter(col("source") === dom)
      .withColumn("__w", split(col("text"), " "))
      .select(col("doc_id").cast("long"),
        graft.ext.TextAnalysis.qualityPpmFrom(col("__w")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, q) => (-q, id) }.take(cap).map(_._1).toSet
    assert(out.filter(_._1 == dom).map(_._2).toSet == brute)
  }

  test("prioritySample: kept set is exactly the global top-n by " +
      "priority, and token mass biases inclusion") {
    import spark.implicits._
    val n = 25
    val kept = Corpus.prioritySample(docs, col("doc_id"), col("text"), n)
      .as[(Long, Long, Long)].collect().toSeq
    assert(kept.size == n)
    // priorities ascend with the deterministic (priority, id) order
    assert(kept == kept.sortBy { case (id, _, p) => (p, id) })
    // the kept set equals the n smallest of the FULL projection
    val full = Corpus.prioritySample(docs, col("doc_id"), col("text"),
      1000000).as[(Long, Long, Long)].collect().toSeq
    assert(kept == full.sortBy { case (id, _, p) => (p, id) }.take(n))
    // weight bias: 100 heavy docs (60 tokens) vs 400 light (3
    // tokens) -> heavies dominate the sample despite being 20% of
    // docs (priority ~ u/w: expected heavy share ≈ 95%)
    val heavyTxt = Seq.fill(60)("w").mkString(" ")
    val synth = ((1L to 100L).map(i => (i, heavyTxt)) ++
      (101L to 500L).map(i => (i, "a b c"))).toDF("doc_id", "text")
    val picked = Corpus.prioritySample(synth, col("doc_id"),
      col("text"), 50).as[(Long, Long, Long)].collect()
    assert(picked.count(_._1 <= 100L) >= 35,
      s"heavy docs under-sampled: ${picked.count(_._1 <= 100L)}/50")
  }

  test("weightedQuantiles: token-mass fences land where the MASS " +
      "lives, not where the docs are") {
    import spark.implicits._
    // six 1-token docs, one 2-token, one 10-token: 8 docs, 18 tokens.
    // Doc-count median is length 1; the token-mass median is 10 —
    // the long doc holds over half the mass
    val synth = ((1L to 6L).map(i => (i, "w")) ++
      Seq((7L, "w w"), (8L, Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val got = Corpus.weightedQuantiles(synth, col("text"),
      Seq(250000L, 500000L, 990000L))
      .as[(Long, Long, Long)].collect().toSeq
    // cum masses: len1 -> 6/18 = 333333 ppm, len2 -> 8/18 = 444444,
    // len10 -> 18/18 = 1000000
    assert(got == Seq(
      (250000L, 1L, 333333L),
      (500000L, 10L, 1000000L),
      (990000L, 10L, 1000000L)))
    // and on the fixture: fences are monotone in p, cum covers p
    val fx = Corpus.weightedQuantiles(docs, col("text"),
      Seq(250000L, 500000L, 750000L, 900000L, 990000L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(fx.map(_._2) == fx.map(_._2).sorted)
    fx.foreach { case (p, _, cum) => assert(cum >= p) }
  }

  test("sourceTerms: each source's distinctive token outranks the " +
      "shared one, lift is the exact rate ratio") {
    import spark.implicits._
    val synth = Seq(
      (1L, "A", (Seq.fill(10)("apple") ++ Seq.fill(10)("the"))
        .mkString(" ")),
      (2L, "B", (Seq.fill(10)("banana") ++ Seq.fill(10)("the"))
        .mkString(" "))
    ).toDF("doc_id", "source", "text")
    val got = Corpus.sourceTerms(synth, col("source"), col("text"),
        k = 2, minTf = 5L)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    // apple: (10/20) / (10/40) = 2.0 -> 2e6 ppm; the: 1.0 -> 1e6
    assert(got == Seq(
      ("A", 1L, "apple", 10L, 10L, 2000000L),
      ("A", 2L, "the", 10L, 20L, 1000000L),
      ("B", 1L, "banana", 10L, 10L, 2000000L),
      ("B", 2L, "the", 10L, 20L, 1000000L)))
  }

  test("vocabGrowth: types attribute to their first-seen bucket, " +
      "curve ends at the exact corpus totals") {
    import spark.implicits._
    // bucket 0 (docs 0-1): tokens a b a b -> 2 new types, 4 tokens
    // bucket 1 (docs 2-3): b c c a    -> 1 new type (c), 4 tokens
    val synth = Seq((0L, "a b"), (1L, "a b"), (2L, "b c"), (3L, "c a"))
      .toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(synth, col("doc_id"), col("text"), 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 2L), (1L, 8L, 3L)))
    // fixture: cumulative curves are monotone and end at the truth
    val fx = Corpus.vocabGrowth(docs, col("doc_id"), col("text"), 100L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(fx.map(_._2) == fx.map(_._2).sorted)
    assert(fx.map(_._3) == fx.map(_._3).sorted)
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    assert(fx.last._2 == toks.count())
    assert(fx.last._3 == toks.distinct().count())
  }

  test("domainCapIncremental is row-identical to the full recompute") {
    val cap = 5
    // delta slices that leave some domains untouched (tests the
    // carried-forward branch) and one that touches every domain
    Seq(col("doc_id") >= 450, col("doc_id") % 2 === 0).foreach { isDelta =>
      val inc = Corpus.domainCapIncremental(
        docs.filter(!isDelta), docs.filter(isDelta),
        col("doc_id"), col("text"), col("source"), cap)
      val full = Corpus.domainCap(docs, col("doc_id"), col("text"),
        col("source"), cap)
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"incremental drifted from full recompute for delta $isDelta")
    }
  }
}

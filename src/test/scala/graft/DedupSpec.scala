package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact dedup on word-set key finds planted permutation dups") {
    val groups = Dedup.exactGroups(docs, Dedup.wordSetKey(col("text")),
      col("doc_id")).filter(col("n_docs") > 1)
    assert(groups.count() > 0)
    // representative is the min doc_id of its group
    val bad = groups.join(docs,
      Dedup.wordSetKey(col("text")) === col("dedup_key") &&
        col("doc_id") < col("keep_id")).count()
    assert(bad == 0)
  }

  test("minhash LSH candidates cover all high-jaccard pairs") {
    val sigs = Dedup.minhashSignature(docs, col("doc_id"), col("text"), 3, 8)
    val cands = Dedup.minhashCandidates(sigs, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: pairs with 3-gram jaccard >= 0.8 must all be found
    val truth = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      3, 4, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("minhash kernel is bit-identical to the aggregate formulation") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until r.length).map(r.getLong).toSeq).toSet
    val kern = canon(Dedup.minhashSignature(docs, col("doc_id"),
      col("text"), 3, 8))
    val agg = canon(Dedup.minhashSignatureViaAgg(docs, col("doc_id"),
      col("text"), 3, 8))
    assert(kern == agg && kern.nonEmpty)
    // short docs (< shingle tokens) must be absent from BOTH, and
    // whitespace edge cases must agree
    import spark.implicits._
    val edge = Seq((1L, "a b"), (2L, ""), (3L, "a  b c d"),
      (4L, "x y z"), (5L, "p q r p q r")).toDF("doc_id", "text")
    val ek = canon(Dedup.minhashSignature(edge, col("doc_id"),
      col("text"), 3, 8))
    val ea = canon(Dedup.minhashSignatureViaAgg(edge, col("doc_id"),
      col("text"), 3, 8))
    assert(ek == ea, s"edge-case drift: kernel=$ek agg=$ea")
    assert(!ek.exists(_.head == 1L) && !ek.exists(_.head == 2L),
      "short docs must have no signature")
  }

  test("incremental candidates = full candidates with a new right doc") {
    val sigs = Dedup.minhashSignature(docs, col("doc_id"), col("text"), 3, 8)
    val cutoff = 40L
    val expected = Dedup.minhashCandidates(sigs, 8, 2)
      .filter(col("d2") >= cutoff)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.minhashCandidatesIncremental(sigs, 8, 2, cutoff)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == expected)
    assert(inc.forall(_._2 >= cutoff), "no settled corpus-internal pairs")
    // sanity: the restriction actually prunes something on the fixture
    val full = Dedup.minhashCandidates(sigs, 8, 2).count()
    assert(inc.size < full)
  }

  test("nearDupBestKeep keeps the highest-quality near-dup, id as tiebreak") {
    import spark.implicits._
    val t1 = "spark shuffle partition join broadcast catalyst codegen"
    val t2 = "apple banana cherry date elderberry fig grape kiwi"
    val docs = Seq(
      (1L, t1, 0.1),  // near-dup of 2 and 4, lowest quality -> dropped
      (2L, t1, 0.9),  // best of its group -> kept
      (3L, t2, 0.5),  // no near-dup -> kept
      (4L, t1, 0.9)   // ties 2 on quality, larger id -> dropped
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.nearDupBestKeep(docs, col("doc_id"), col("text"),
      col("q")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // the min-id rule would have kept doc 1 instead: quality order wins
  }

  test("simhash kernel is bit-identical to the aggregate formulation") {
    val fixture = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashViaAgg(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixture == agg, "kernel drifted from the aggregate spec")
    // whitespace edge cases: empty tokens from leading/trailing/double
    // spaces must hash identically in both formulations
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, " "), (3L, "a  b"), (4L, " lead"),
      (5L, "trail "), (6L, "a a a b")).toDF("doc_id", "text")
    val ek = Dedup.simhash(edge, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ea = Dedup.simhashViaAgg(edge, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ek == ea, s"edge-case drift: kernel=$ek agg=$ea")
  }

  test("every simhash band carries entropy (regression: constant band 3)") {
    // pre-round-6 the signature drew all 48 bits from one perm whose
    // values fit 31 bits: bits 31-47 were constant zero, band 3 (bits
    // 36-47) was identical for every doc, and its LSH join was a full
    // all-pairs quadratic. Pin that each band of the signature spreads
    // over many values on the fixtures (derived from SimBits so a
    // width change cannot silently resurrect a dead band).
    val sims = Dedup.simhash(docs, col("doc_id"), col("text"))
    val bandBits = Dedup.SimBits / Dedup.SimBands
    (0 until Dedup.SimBands).foreach { b =>
      val distinct = sims.select(
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND(lit(Dedup.SimBandMask)).as("bv"))
        .distinct().count()
      assert(distinct > 10,
        s"band $b has only $distinct distinct values — degenerate banding")
    }
  }

  test("simhash: identical docs get identical hashes, pairs are symmetric-free") {
    val sims = Dedup.simhash(docs, col("doc_id"), col("text"))
    assert(sims.count() == docs.count())
    val pairs = Dedup.simhashPairs(sims, 3)
    assert(pairs.filter(col("d1") >= col("d2")).count() == 0)
    assert(pairs.filter(col("hamming") > 3).count() == 0)
  }

  test("ngram jaccard pairs are exact and thresholded") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      3, 1, 2)
    // jaccard >= 0.5 check holds by construction of the filter
    val viol = pairs.filter(
      col("inter") * 2 < (col("n1") + col("n2") - col("inter"))).count()
    assert(viol == 0)
  }

  test("simhash drops null-text docs exactly like the aggregate formulation") {
    import spark.implicits._
    val edge = Seq((1L, Some("a b c")), (2L, None), (3L, Some("a b c")),
      (4L, None)).toDF("doc_id", "text")
    val kern = Dedup.simhash(edge, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashViaAgg(edge, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kern == agg, s"null-text drift: kernel=$kern agg=$agg")
    assert(kern.keySet == Set(1L, 3L), "null-text docs must have no row")
    // and the keep/drop decision must not collapse null-text docs into
    // a fake hamming-0 cluster: only the true duplicate (3) drops
    val drops = Dedup.nearDupDropIds(
        Dedup.simhash(edge, col("doc_id"), col("text")), 3)
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(3L), s"expected only doc 3 dropped, got $drops")
  }

  test("minhash->exact-verify composition = exact pairs restricted to candidates") {
    val cands = Dedup.minhashCandidates(
        Dedup.minhashSignature(docs, col("doc_id"), col("text"), 3, 8), 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        3, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val composed = Dedup.ngramJaccardViaMinhash(docs, col("doc_id"),
        col("text"), 3, 1, 2, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val expected = exact.filter { case (pair, _) => cands.contains(pair) }
    assert(composed == expected,
      s"missing=${expected.keySet -- composed.keySet} " +
        s"extra=${composed.keySet -- expected.keySet}")
    assert(composed.nonEmpty, "fixture should contain verified near-dups")
  }

  test("nearDupComponents equals brute-force union-find, fixes chain loss") {
    val sims = Dedup.simhash(docs, col("doc_id"), col("text"))
    val comp = Dedup.nearDupComponents(sims, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force union-find over the same pair set
    val pairs = Dedup.simhashPairs(sims, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // expected keyed on the INPUT doc set, not the output's own keys —
    // a doc silently dropped by the components computation must fail
    // here, not shrink both sides of the compare
    val expected = sims.select("doc_id").collect().map(_.getLong(0))
      .map(d => d -> find(d)).toMap
    assert(comp == expected,
      s"missing=${expected.keySet -- comp.keySet} " +
        s"wrong=${comp.filter { case (k, v) => expected.get(k) != Some(v) }}")
    // every component labels its minimum; keep = (doc == component)
    // retains exactly one doc per cluster — no chain loss
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
    // the one-hop drop rule loses chain tails; components must not:
    // a component representative (the member minimum) is never itself
    // dropped, so every dropped doc keeps a SURVIVING near-duplicate
    // representative — the guarantee one-hop lacks
    val dropped = Dedup.nearDupDropIds(sims, 3)
      .collect().map(_.getLong(0)).toSet
    dropped.foreach(d => assert(!dropped.contains(comp(d)),
      s"doc $d's representative ${comp(d)} was dropped too"))
    // a NULL signature (no bands) must come back self-labeled, not
    // vanish in the membership equi-join or cluster with other nulls
    import spark.implicits._
    val withNull = Seq((1L, Some(5L)), (2L, Option.empty[Long]),
      (3L, Some(5L)), (4L, Option.empty[Long])).toDF("doc_id", "simhash")
    val c2 = Dedup.nearDupComponents(withNull, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L), s"got $c2")
  }

  test("prefix-filtered jaccard join returns the identical pair set") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    for ((num, den) <- Seq((1, 2), (4, 5))) {
      val inverted = canon(Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), 3, num, den))
      val prefixed = canon(Dedup.ngramJaccardPairsPrefix(
        docs, col("doc_id"), col("text"), 3, num, den))
      assert(prefixed == inverted,
        s"prefix variant diverged at t=$num/$den: " +
          s"missing=${inverted -- prefixed} extra=${prefixed -- inverted}")
    }
  }

  test("chunkDupStats: hand-computed tiles on a planted corpus") {
    import spark.implicits._
    // k=3 tiles: doc 1 = [a b c][d e f] (+tail g), doc 2 = [a b c],
    // doc 3 = [x y z][x y z] (within-doc repeat), doc 4 = "a b" (too
    // short → no row)
    val planted = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c"),
      (3L, "x y z x y z"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(planted, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      // doc, n_words, n_chunks, dup_chunks, kept_tokens, dup_ratio
      (1L, 7L, 2L, 1L, 4L, 0.5),   // [a b c] dup'd with doc 2; tail g kept
      (2L, 3L, 1L, 1L, 0L, 1.0),
      (3L, 6L, 2L, 2L, 0L, 1.0)),  // within-doc repeat counts
      s"got ${got.toSeq}")
  }

  test("ngramContainment catches a planted excerpt that Jaccard misses") {
    import spark.implicits._
    // doc 2 = a 6-word excerpt of the 60-word doc 1: containment of
    // the excerpt is 1.0 while Jaccard is ~0.07
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (20 to 25).map(i => s"w$i").mkString(" ")
    val planted = Seq((1L, long), (2L, excerpt),
      (3L, "x y z q r s")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(planted, col("doc_id"),
      col("text"), 3, 4, 5).collect()
    assert(cont.length == 1)
    val r = cont(0)
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getAs[Long]("cont2_ppm") == 1000000L,
      s"excerpt containment must be exact 1.0: $r")
    // the same pair fails the symmetric Jaccard gate at the same bar
    val jac = Dedup.ngramJaccardPairs(planted, col("doc_id"),
      col("text"), 3, 4, 5).collect()
    assert(jac.isEmpty, s"jaccard should miss the excerpt: ${jac.toSeq}")
  }

  test("dupSpanMerge: consecutive dup tiles merge, gaps split spans") {
    import spark.implicits._
    // k=3: docs 1/2 share tiles [a b c][d e f] (consecutive → ONE
    // 2-tile span each); doc 3 repeats [p q r] at tile 0 and 2 with a
    // unique tile between → TWO 1-tile spans
    val planted = Seq(
      (1L, "a b c d e f g h i"),
      (2L, "a b c d e f q r s"),
      (3L, "p q r s t u p q r")).toDF("doc_id", "text")
    val got = Dedup.dupSpanMerge(planted, col("doc_id"), col("text"), 3)
      .orderBy("doc_id", "span_start_word").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // doc, span_start_word, span_tiles, span_words
      (1L, 0L, 2L, 6L),
      (2L, 0L, 2L, 6L),
      (3L, 0L, 1L, 3L),
      (3L, 6L, 1L, 3L)), s"got ${got.toSeq}")
  }

  test("dupSpanMerge: span tiles reconcile with chunkDupStats dup counts") {
    val spans = Dedup.dupSpanMerge(docs, col("doc_id"), col("text"), 5)
      .groupBy("doc_id").agg(sum("span_tiles").as("merged_tiles"))
    val stats = Dedup.chunkDupStats(docs, col("doc_id"), col("text"), 5)
      .select(col("doc_id"), col("dup_chunks"))
    // every doc with dup tiles has spans covering exactly those tiles
    val bad = stats.join(spans, Seq("doc_id"), "left")
      .filter(coalesce(col("merged_tiles"), lit(0L)) =!= col("dup_chunks"))
      .count()
    assert(bad == 0)
  }

  test("chunkDupStats: fixture docs are fully tiled and ratios bounded") {
    val stats = Dedup.chunkDupStats(docs, col("doc_id"), col("text"), 5)
    val rows = stats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nc, dup, kept) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(nc == nw / 5, "every full tile must be counted")
      assert(dup >= 0 && dup <= nc)
      assert(kept == (nc - dup) * 5 + (nw - nc * 5))
    }
    // the fixture plants exact duplicates, so some tile must repeat
    assert(rows.exists(_.getLong(3) > 0), "planted dups must surface")
  }

  test("chunkScrub: canonical-first-occurrence scrub on a planted corpus") {
    import spark.implicits._
    val planted = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c"),
      (3L, "x y z x y z"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = Dedup.chunkScrub(planted, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      // doc 1 owns the canonical [a b c]; doc 2's copy is scrubbed away;
      // doc 3 keeps the first of its within-doc repeats; doc 4 too short
      (1L, 0L, "a b c d e f g"),
      (2L, 1L, ""),
      (3L, 1L, "x y z"),
      (4L, 0L, "a b")), s"got ${got.toSeq}")
  }

  test("chunkDupExact rejects an engineered polyhash collision") {
    import spark.implicits._
    // "Aa" and "BB" collide under the base-31 rolling hash
    // (65·31+97 = 66·31+66 = 2112) and an identical suffix preserves
    // the collision — so these two k=3 tiles hash equal but differ:
    val t1 = "Aa x y"
    val t2 = "BB x y"
    val h = Seq(t1, t2).toDF("s")
      .select(graft.functions.Hashing.polyHash(col("s"))).collect()
    assert(h(0).getLong(0) == h(1).getLong(0),
      "fixture broken: tiles no longer collide")
    // doc 1 and 3 are true exact duplicates; doc 2 is hash-equal only
    val planted = Seq(
      (1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
    val got = Dedup.chunkDupExact(planted, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cand_chunks"),
        r.getAs[Long]("dup_chunks"), r.getAs[Long]("collision_chunks")))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 0L),   // verified duplicate
      (2L, 1L, 0L, 1L),   // hash candidate REJECTED by the string compare
      (3L, 1L, 1L, 0L)), s"got ${got.toSeq}")
    // the unverified stats call the collision a duplicate — the defect
    // the verify stage exists to stop
    val unverified = Dedup.chunkDupStats(planted, col("doc_id"),
      col("text"), 3).orderBy("doc_id").collect()
    assert(unverified.map(_.getAs[Long]("dup_chunks")).toSeq ==
      Seq(1L, 1L, 1L))
    // and the exact scrub keeps doc 2's text while the hash-keyed
    // scrub would have dropped it
    val exactScrub = Dedup.chunkScrub(planted, col("doc_id"), col("text"),
      3, exact = true).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(exactScrub.toSeq == Seq(
      (1L, 0L, t1), (2L, 0L, t2), (3L, 1L, "")),
      s"got ${exactScrub.toSeq}")
    val hashScrub = Dedup.chunkScrub(planted, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect().map(r => r.getString(2))
    assert(hashScrub(1) == "", "hash-keyed scrub over-scrubs the collision")
  }

  test("chunkScrub agrees with chunkDupStats on the fixture") {
    val stats = Dedup.chunkDupStats(docs, col("doc_id"), col("text"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val scrub = Dedup.chunkScrub(docs, col("doc_id"), col("text"), 5)
      .collect()
    // every row comes back (scrub never loses documents)
    assert(scrub.length == docs.count())
    scrub.foreach { r =>
      val (id, dropped, text) = (r.getLong(0), r.getLong(1), r.getString(2))
      val dup = stats.getOrElse(id, 0L)
      // can't drop more tiles than were duplicated, and a doc with no
      // duplicated tile must keep all of them
      assert(dropped <= dup, s"doc $id dropped $dropped > dup $dup")
      if (dup == 0L) assert(dropped == 0L)
      assert(text != null)
    }
    // corpus-wide: each duplicated hash keeps exactly one instance, so
    // total drops = total dup instances - distinct dup'd hashes > 0
    val totalDropped = scrub.map(_.getLong(1)).sum
    val totalDup = stats.values.sum
    assert(totalDropped > 0 && totalDropped < totalDup)
  }

  test("bandSweep: candidate volume shrinks loose -> tight (prefix " +
    "bands are subsets), counts self-consistent, r > 2 rejected") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // declared loose -> tight order: 8 bands of 1, then 4/2/1 bands
    // of 2 via signature prefixes
    val configs = Seq((8, 1), (8, 2), (4, 2), (2, 2))
    val rows = graft.ext.Dedup.bandSweep(docs, col("doc_id"),
        col("text"), 3, configs, 1, 2).collect()
      .map(r => (r.getAs[Long]("sig_k"), r.getAs[Long]("rows_per_band")) ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_true"))).toMap
    val vols = configs.map { case (k, r) => rows((k.toLong, r.toLong))._1 }
    assert(vols.zip(vols.tail).forall { case (a, b) => a >= b },
      s"volumes not monotone loose->tight: $vols")
    assert(vols.head > vols.last, "sweep should actually discriminate")
    rows.values.foreach { case (nc, nt) => assert(nt <= nc && nt >= 0) }
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.bandSweep(docs, col("doc_id"), col("text"), 3,
        Seq((8, 4)), 1, 2)
    }
  }

  test("leakageScrub: only cross-split train members drop") {
    import spark.implicits._
    // 1/2: near-dup pair inside train (kept); 3 (train) near-dups
    // 4 (val) -> 3 drops, 4 kept; 5 clean train
    val docs = Seq(
      (1L, "a b c d e f g h", "train"),
      (2L, "a b c d e f g h", "train"),
      (3L, "p q r s t u v w", "train"),
      (4L, "p q r s t u v w", "val"),
      (5L, "x y z zz yy xx ww vv", "train")
    ).toDF("doc_id", "text", "split")
    val got = graft.ext.Dedup.leakageScrub(docs, col("doc_id"),
        col("text"), col("split"), 3, 8, 2)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("componentSplit: no near-dup pair under EITHER detector ever " +
    "straddles splits; splitLeakage on its output is clean; " +
    "assignment deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val split = graft.ext.Dedup.componentSplit(docs, col("doc_id"),
      col("text"), 3).localCheckpoint()
    // the enforcement property, per detector: every pair either
    // detector can see shares a split (this is exactly what a
    // per-doc random split violates — splitLeakage exists because
    // it does, and a simhash-only split still leaked 2 minhash
    // pairs on this fixture)
    def straddling(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(split.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(split.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .filter(col("s1") =!= col("s2"))
    val sPairs = graft.ext.Dedup.simhashPairs(
      graft.ext.Dedup.simhash(docs, col("doc_id"), col("text")), 3)
    val mPairs = graft.ext.Dedup.minhashCandidates(
      graft.ext.Dedup.minhashSignature(docs, col("doc_id"),
        col("text"), 3, 8), 8, 2).select(col("d1"), col("d2"))
    assert(sPairs.count() > 0 && mPairs.count() > 0,
      "fixture should have near-dup pairs under both detectors")
    assert(straddling(sPairs).isEmpty,
      "a simhash pair straddles the eval boundary")
    assert(straddling(mPairs).isEmpty,
      "a minhash pair straddles the eval boundary")
    // and the audit itself agrees: zero cross-split leakage rows
    val leak = graft.ext.Dedup.splitLeakage(
      docs.join(split.select("doc_id", "split"), "doc_id"),
      col("doc_id"), col("text"), col("split"), 3, 8, 2)
      .filter(col("split_a") =!= col("split_b"))
    assert(leak.isEmpty, "splitLeakage found cross-split pairs")
    // all three splits materialize on the fixture (cut points bite)
    assert(split.select("split").distinct().count() == 3)
    // deterministic: a second derivation is row-identical
    val again = graft.ext.Dedup.componentSplit(docs, col("doc_id"),
      col("text"), 3)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("boilerplateRatio: common grams flagged, rare docs clean") {
    import spark.implicits._
    // gram "a b c" appears in 3 docs (df 3 > cut 2); doc 4 disjoint
    val docs = Seq(
      (1L, "a b c x1 y1"),
      (2L, "a b c x2 y2"),
      (3L, "a b c x3 y3"),
      (4L, "p q r s t")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.boilerplateRatio(docs, col("doc_id"),
        col("text"), 3, 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // each of docs 1-3 has 3 distinct 3-grams, exactly 1 common
    (1L to 3L).foreach(d => assert(got(d) == ((3L, 1L)), s"doc $d"))
    assert(got(4L) == ((3L, 0L)))
  }

  test("ngramNovelty: exact dup has zero novel, short docs zero grams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),        // grams: "a b c", "b c d" — both novel
      (2L, "a b c d"),        // exact dup — zero novel
      (3L, "x y z w"),        // disjoint — all novel
      (4L, "b c d a b c"),    // "b c d" seen (doc 1); others novel
      (5L, "a b")             // too short: zero grams, on the curve
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.ngramNovelty(docs, col("doc_id"),
        col("text"), 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 0L, 0L),
      (3L, 2L, 2L, 1000000L),
      (4L, 4L, 2L, 500000L),  // "b c d"/"a b c" seen in doc 1; 2 novel
      (5L, 0L, 0L, 0L)))
  }
}

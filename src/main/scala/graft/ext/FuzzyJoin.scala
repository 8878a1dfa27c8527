package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join — the entity-resolution
  * primitive (spell variants, OCR noise, boilerplate drift) that the
  * hash near-dup family (minhash/simhash) cannot express: those bound
  * SET overlap; edit distance bounds SEQUENCE divergence, and a
  * k-char guarantee ("differs by at most 3 edits") is what a
  * dedup-audit or record-linkage user actually asks for.
  *
  * The all-pairs form is O(n²·L²) and unthinkable at 100 TB, so this
  * is the partition-based pigeonhole join (PASS-JOIN, Li/Deng/Wang/
  * Feng, ICDE 2011 — public paper): split every string into `k`+1
  * disjoint consecutive segments; `k` edits can touch at most `k`
  * segments, so any pair within distance `k` shares at least one
  * segment VERBATIM, shifted by at most `k` positions. Candidates are
  * therefore an equi-join on segment content — a hash-partitioned
  * shuffle on selective ~(L/(k+1))-char keys, never an all-pairs
  * product — pruned by a length band (|la−lb| ≤ k) and the shift band
  * (|j−p| ≤ k), then verified with Spark's codegen `levenshtein`
  * (threshold form: banded O(k·L) DP with early exit, not O(L²)).
  *
  * Both filters are LOSSLESS (pigeonhole + triangle inequality), so
  * the result is exactly the brute-force pair set — FuzzyJoinSpec
  * pins that equality on a corpus with dupes, shorts, and near-pairs.
  *
  * Scale posture: index side is (k+1) rows/string; probe side is one
  * row per substring of a partner-segment length (~3 lengths × L
  * starts ≈ 3L rows/string — bounded, linear in corpus size). The
  * shuffle key is the segment CONTENT, so skew follows content
  * frequency: boilerplate-heavy corpora salt the top segments the
  * same way `skew_join` does; the fixture's 30-word vocabulary is the
  * stress case and still joins in seconds (SCALE.md). Strings shorter
  * than k+1 chars cannot host k+1 non-empty segments and take the
  * short-bucket path: a length-banded cross join over ONLY the ≤k-char
  * strings — a vanishing fraction of any real corpus, and the band
  * keeps it quadratic only in that fraction.
  */
object FuzzyJoin {

  /** (doc_id, s, len) with the truncation applied. */
  private[graft] def prep(docs: DataFrame, id: Column, text: Column,
                   prefixLen: Int): DataFrame =
    docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"),
        substring(text, 1, prefixLen).as("s"))
      .withColumn("len", length(col("s")))

  /** Index side: the k+1 even segments of each ≥(k+1)-char string.
    * Segment i has length len/(k+1) (+1 for the first len mod (k+1)
    * of them); start(i) = 1 + i·(len div nSeg) + min(i, len mod
    * nSeg). Emits (doc_a, la, p, seg). */
  private[graft] def segments(base: DataFrame, k: Int): DataFrame = {
    val nSeg = k + 1
    base.filter(col("len") >= nSeg)
      .select(col("doc_id"), col("len"), col("s"),
        explode(transform(sequence(lit(0), lit(k)), i => {
          val q = col("len").cast("int") / lit(nSeg)
          val base0 = floor(q).cast("int")
          val rem = col("len").cast("int") % lit(nSeg)
          val start = lit(1) + i * base0 + least(i, rem)
          val segLen = base0 + when(i < rem, 1).otherwise(0)
          struct(start.as("p"), segLen.as("sl"))
        })).as("g"))
      .select(col("doc_id").as("doc_a"), col("len").as("la"),
        col("g.p").as("p"), col("s").substr(col("g.p"), col("g.sl")).as("seg"))
  }

  /** Probe side: every substring whose length equals SOME partner's
    * segment length — partner lengths la ∈ [lb−k, lb+k], so segment
    * lengths span [max(1,(lb−k) div nSeg), (lb+k+nSeg−1) div nSeg].
    * Emits (doc_b, lb, j, sub). */
  private def probes(base: DataFrame, k: Int): DataFrame = {
    val nSeg = k + 1
    base.filter(col("len") >= nSeg)
      .select(col("doc_id"), col("len"), col("s"),
        explode(flatten(transform(
          sequence(
            greatest(lit(1), floor((col("len") - lit(k)) / lit(nSeg)).cast("int")),
            least(col("len").cast("int"),
              floor((col("len") + lit(k) + lit(nSeg - 1)) / lit(nSeg)).cast("int")),
          ),
          l => transform(sequence(lit(1), col("len").cast("int") - l + lit(1)),
            j => struct(j.as("j"), col("s").substr(j, l).as("sub")))))).as("g"))
      .select(col("doc_id").as("doc_b"), col("len").as("lb"),
        col("g.j").as("j"), col("g.sub").as("sub"))
  }

  /** Pigeonhole candidate pairs segs(A) ⋈ probes(B) with the length
    * and shift bands, as raw (doc_a, doc_b) id pairs. */
  private def candJoin(segs: DataFrame, subs: DataFrame,
                       k: Int): DataFrame =
    segs.join(subs,
        col("seg") === col("sub") &&
          col("doc_a") =!= col("doc_b") &&
          abs(col("la") - col("lb")) <= k &&
          abs(col("j") - col("p")) <= k)
      .select(col("doc_a"), col("doc_b"))

  /** Short-bucket candidates: ≤k-char strings of `shorts` against
    * ≤2k-char partners within the length band (no k+1-segment
    * pigeonhole exists below k+1 chars). */
  private def shortCand(shorts: DataFrame, partners: DataFrame,
                        k: Int): DataFrame =
    shorts.filter(col("len") <= k)
      .select(col("doc_id").as("doc_a"), col("len").as("la"))
      .join(partners.filter(col("len") <= 2 * k)
          .select(col("doc_id").as("doc_b"), col("len").as("lb")),
        col("doc_a") =!= col("doc_b") &&
          abs(col("la") - col("lb")) <= k)
      .select(col("doc_a"), col("doc_b"))

  /** Verify raw candidate id pairs with the codegen threshold
    * levenshtein (banded DP, -1 above k); emits (doc_a, doc_b, dist). */
  private def verify(cand: DataFrame, baseA: DataFrame, baseB: DataFrame,
                     k: Int): DataFrame = {
    val sa = baseA.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val sb = baseB.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("dist",
        expr(s"levenshtein(sa, sb, $k)").cast("long"))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** All unordered pairs of docs whose first `prefixLen` chars are
    * within edit distance `k`, with the exact distance.
    * Output: (doc_a, doc_b, dist) with doc_a < doc_b. */
  def editNeardup(docs: DataFrame, id: Column, text: Column,
                  prefixLen: Int, k: Int): DataFrame = {
    require(k >= 1 && prefixLen > k, s"need prefixLen > k >= 1, got ($prefixLen, $k)")
    val base = prep(docs, id, text, prefixLen)
    val cand = candJoin(segments(base, k), probes(base, k), k)
      .union(shortCand(base, base, k))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
    verify(cand, base, base, k)
  }

  /** Incremental twin — the `dedup_incremental` contract for the
    * edit-distance engine: only INDEX×BATCH pairs are produced (the
    * settled index never re-joins itself; the arriving batch pays its
    * own segments/probes and one content-keyed join against the
    * index). The pigeonhole needs the SEGMENT side ≥ k+1 chars, so
    * both orientations run (index segments × batch substrings and
    * vice versa — a pair is caught whenever EITHER end can host k+1
    * segments) plus the cross short bucket for ≤k-char strings.
    * Output: (doc_a ∈ index, doc_b ∈ batch, dist). */
  def editNeardupIncremental(index: DataFrame, batch: DataFrame,
                             id: Column, text: Column,
                             prefixLen: Int, k: Int): DataFrame = {
    require(k >= 1 && prefixLen > k, s"need prefixLen > k >= 1, got ($prefixLen, $k)")
    val bi = prep(index, id, text, prefixLen)
    val bb = prep(batch, id, text, prefixLen)
    val flip = (df: DataFrame) =>
      df.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
    val cand = candJoin(segments(bi, k), probes(bb, k), k)
      .union(flip(candJoin(segments(bb, k), probes(bi, k), k)))
      .union(shortCand(bi, bb, k))
      .union(flip(shortCand(bb, bi, k)))
      .distinct()
    verify(cand, bi, bb, k)
  }

  /** Entity-resolution labels over the edit-distance graph:
    * transitive closure of [[editNeardup]] pairs via the shared
    * bounded star-contraction core ([[Dedup.starComponents]] —
    * ⌈log₂e⌉+2 rounds, no driver iteration), with the canonical
    * member (minimum id, the library-wide witness convention) and a
    * keep flag per doc. The chain A↔B↔C that pairwise one-hop dedup
    * splits inconsistently resolves to ONE canonical here — the same
    * reason neardup_components exists for the hash engines, applied
    * to the exact-edit-distance signal. */
  def editComponents(docs: DataFrame, id: Column, text: Column,
                     prefixLen: Int, k: Int): DataFrame = {
    val pairs = editNeardup(docs, id, text, prefixLen, k)
      .select(col("doc_a").as("d1"), col("doc_b").as("d2"))
    val vertices = docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"))
    Dedup.starComponents(pairs, vertices)
      .select(col("doc_id"), col("component"),
        when(col("doc_id") === col("component"), 1L).otherwise(0L)
          .as("is_canonical"))
  }

  /** DuckDB twin of [[editComponents]] over `documents` (recursive
    * CTE closure over the banded nested-loop pair set). */
  def editComponentsOracleSql(prefixLen: Int, k: Int): String =
    s"""
    |WITH RECURSIVE p AS (
    |  SELECT doc_id, substr(text, 1, $prefixLen) AS s
    |  FROM documents WHERE text IS NOT NULL),
    |pairs AS (
    |  SELECT a.doc_id AS d1, b.doc_id AS d2
    |  FROM p a JOIN p b
    |    ON a.doc_id < b.doc_id
    |   AND abs(length(a.s) - length(b.s)) <= $k
    |   AND levenshtein(a.s, b.s) <= $k),
    |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
    |reach(doc_id, label) AS (
    |  SELECT doc_id, doc_id FROM p
    |  UNION
    |  SELECT e.d1, r.label FROM edges e JOIN reach r ON r.doc_id = e.d2)
    |SELECT doc_id, min(label) AS component,
    |  CAST(CASE WHEN doc_id = min(label) THEN 1 ELSE 0 END AS BIGINT)
    |    AS is_canonical
    |FROM reach GROUP BY doc_id
    |ORDER BY doc_id
    |""".stripMargin.trim

  /** Brute-force twin of [[editNeardup]] (spec-only losslessness
    * witness — the O(n²) plan this operator exists to avoid). */
  def editNeardupBrute(docs: DataFrame, id: Column, text: Column,
                       prefixLen: Int, k: Int): DataFrame = {
    val base = docs.filter(text.isNotNull)
      .select(id.cast("long").as("doc_id"),
        substring(text, 1, prefixLen).as("s"))
    val a = base.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val b = base.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", expr(s"levenshtein(sa, sb, $k)").cast("long"))
      .filter(col("dist") >= 0)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** DuckDB twin of [[editNeardupIncremental]] over `documents`
    * split at `splitId` (index < splitId ≤ batch). */
  def editNeardupIncrementalOracleSql(prefixLen: Int, k: Int,
                                      splitId: Long): String =
    s"""
    |WITH p AS (
    |  SELECT doc_id, substr(text, 1, $prefixLen) AS s
    |  FROM documents WHERE text IS NOT NULL)
    |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    |FROM p a JOIN p b
    |  ON a.doc_id < $splitId AND b.doc_id >= $splitId
    | AND abs(length(a.s) - length(b.s)) <= $k
    | AND levenshtein(a.s, b.s) <= $k
    |ORDER BY doc_a, doc_b
    |""".stripMargin.trim

  /** DuckDB twin over `documents` — the nested-loop form with the
    * same length band, feasible at oracle scale only. */
  def editNeardupOracleSql(prefixLen: Int, k: Int): String =
    s"""
    |WITH p AS (
    |  SELECT doc_id, substr(text, 1, $prefixLen) AS s
    |  FROM documents WHERE text IS NOT NULL)
    |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    |FROM p a JOIN p b
    |  ON a.doc_id < b.doc_id
    | AND abs(length(a.s) - length(b.s)) <= $k
    | AND levenshtein(a.s, b.s) <= $k
    |ORDER BY doc_a, doc_b
    |""".stripMargin.trim

  /** Numeric band (ε-distance) self-join: all within-group pairs
    * whose values differ by at most `delta` — the record-linkage /
    * reconciliation primitive for CONTINUOUS attributes ("candidate
    * duplicate payments within $5", "sensor readings within ε"),
    * the 1-D special case of a similarity join that neither an
    * equi-join (exact match only) nor the hash near-dup family
    * (set overlap, not numeric distance) expresses.
    *
    * A theta self-join `abs(a.x − b.x) <= δ` is a cartesian product
    * per group under Spark's join planner — O(n²) compares and a
    * broadcast-nested-loop plan that dies at 100 TB. The classic fix
    * (the "grid file" / ε-join bucketing of the spatial-join
    * literature) makes it an EQUI-join: bucket every value by
    * `floor(x/δ)`; two values within δ land in the same or ADJACENT
    * buckets (|⌊a/δ⌋−⌊b/δ⌋| ≤ 1 whenever |a−b| ≤ δ), so replicating
    * the left side to buckets {b, b+1} and hash-joining on the
    * replica key finds every candidate. Replication factor is a
    * CONSTANT 2 — not data-dependent — and the shuffle is a plain
    * hash partition on (group, bucket); the exact |a−b| ≤ δ filter
    * after the join makes the bucketing lossless (FuzzyJoinSpec pins
    * bucketed ≡ brute theta on data with negatives and exact-δ gaps).
    *
    * Pair orientation is canonicalized by (bucket, key): for
    * same-bucket pairs both orientations survive the join and the
    * key tiebreak keeps one; for adjacent-bucket pairs only the
    * lower-bucket-left orientation can match the replica key, so the
    * bucket order keeps exactly that one. Every unordered pair is
    * emitted once, no distinct needed.
    *
    * Output: one row per group — pair count and the gap spread
    * (min/max/sum of |a−b|) — the audit a reconciliation pipeline
    * logs. Unbounded pair OUTPUT would be the caller's variant; the
    * declared aggregate keeps the result |groups|-bounded. */
  def bandSelfJoinAgg(rows: DataFrame, group: Column, key: Column,
                      value: Column, delta: Long): DataFrame = {
    val base = rows.select(group.as("g"), key.cast("long").as("k"),
        value.cast("long").as("x"))
      // floor division (not `div`, which truncates toward zero):
      // negative values must bucket downward or adjacency breaks
      // across zero. |x| ≤ ~1e15 keeps the double floor exact.
      .withColumn("b", floor(col("x").cast("double") / delta.toDouble)
        .cast("long"))
    val left = base.select(col("g"), col("k").as("ka"), col("x").as("xa"),
        col("b").as("ba"),
        explode(array(col("b"), col("b") + 1)).as("probe"))
    val right = base.select(col("g"), col("k").as("kb"), col("x").as("xb"),
      col("b").as("probe"))
    left.join(right, Seq("g", "probe"))
      .filter((col("ba") < col("probe")) ||
        (col("ba") === col("probe") && col("ka") < col("kb")))
      .filter(abs(col("xa") - col("xb")) <= delta)
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        min(abs(col("xa") - col("xb"))).cast("long").as("min_gap"),
        max(abs(col("xa") - col("xb"))).cast("long").as("max_gap"),
        sum(abs(col("xa") - col("xb"))).cast("long").as("sum_gap"))
      .orderBy("g")
  }

  /** Brute theta-join twin of [[bandSelfJoinAgg]] — spec-only
    * witness, never declared. */
  private[graft] def bandSelfJoinAggBrute(rows: DataFrame, group: Column,
      key: Column, value: Column, delta: Long): DataFrame = {
    val base = rows.select(group.as("g"), key.cast("long").as("k"),
      value.cast("long").as("x"))
    val a = base.select(col("g"), col("k").as("ka"), col("x").as("xa"))
    val b = base.select(col("g").as("gb"), col("k").as("kb"),
      col("x").as("xb"))
    a.join(b, col("g") === col("gb") && col("ka") < col("kb") &&
        abs(col("xa") - col("xb")) <= delta)
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        min(abs(col("xa") - col("xb"))).cast("long").as("min_gap"),
        max(abs(col("xa") - col("xb"))).cast("long").as("max_gap"),
        sum(abs(col("xa") - col("xb"))).cast("long").as("sum_gap"))
      .orderBy("g")
  }

  /** Two-dimensional ε self-join: within-group pairs close in BOTH a
    * numeric and a time dimension (|Δamount| ≤ δx AND |Δdays| ≤ δy)
    * — the duplicate-payment / double-billing candidate generator,
    * where closeness in either dimension alone is meaningless (many
    * same-week orders, many similar amounts — suspicious only
    * together). Same grid-file idea as [[bandSelfJoinAgg]] lifted to
    * 2-D: each row owns a (δx, δy) grid cell; a qualifying partner's
    * cell differs by at most 1 in each axis, so replicating the
    * probe side to its 3×3 cell neighborhood makes candidates an
    * EQUI-join on (group, cellx, celly) — constant ×9 replication,
    * never data-dependent — and the exact band filter keeps it
    * lossless. Each unordered pair matches through exactly one
    * replica per orientation; the key tiebreak keeps one
    * orientation. Output is the sparse candidate pair list the dual
    * band implies (the audit's premise: real dup pairs are rare). */
  def band2dPairs(rows: DataFrame, group: Column, key: Column,
                  x: Column, y: Column, dx: Long, dy: Long): DataFrame = {
    val base = rows.select(group.as("g"), key.cast("long").as("k"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("bx", floor(col("x").cast("double") / dx.toDouble)
        .cast("long"))
      .withColumn("by", floor(col("y").cast("double") / dy.toDouble)
        .cast("long"))
    val offsets = array((-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j")))): _*)
    val probes = base.select(col("g"), col("k").as("ka"),
        col("x").as("xa"), col("y").as("ya"),
        explode(offsets).as("o"),
        col("bx"), col("by"))
      .select(col("g"), col("ka"), col("xa"), col("ya"),
        (col("bx") + col("o.i")).as("cx"),
        (col("by") + col("o.j")).as("cy"))
    val build = base.select(col("g"), col("k").as("kb"),
      col("x").as("xb"), col("y").as("yb"),
      col("bx").as("cx"), col("by").as("cy"))
    probes.join(build, Seq("g", "cx", "cy"))
      .filter(col("ka") < col("kb") &&
        abs(col("xa") - col("xb")) <= dx &&
        abs(col("ya") - col("yb")) <= dy)
      .select(col("g"), col("ka"), col("kb"),
        abs(col("xa") - col("xb")).cast("long").as("x_gap"),
        abs(col("ya") - col("yb")).cast("long").as("y_gap"))
      .orderBy("g", "ka", "kb")
  }

  /** DuckDB twin of [[band2dPairs]] over `orders` (same customer,
    * close total, close date). */
  def dupPaymentOracleSql(dxCents: Long, dyDays: Long): String =
    s"""
    |WITH r AS (
    |  SELECT o_custkey AS g, CAST(o_orderkey AS BIGINT) AS k,
    |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
    |    CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT)
    |      AS y
    |  FROM orders)
    |SELECT a.g, a.k AS ka, b.k AS kb,
    |  CAST(abs(a.x - b.x) AS BIGINT) AS x_gap,
    |  CAST(abs(a.y - b.y) AS BIGINT) AS y_gap
    |FROM r a JOIN r b
    |  ON a.g = b.g AND a.k < b.k
    | AND abs(a.x - b.x) <= $dxCents AND abs(a.y - b.y) <= $dyDays
    |ORDER BY a.g, ka, kb
    |""".stripMargin.trim

  /** DuckDB twin of [[bandSelfJoinAgg]] over `customer` —
    * (mktsegment, custkey, acctbal cents); the oracle may use the
    * theta form because DuckDB's IEJoin handles band predicates and
    * oracle scale is small. */
  def bandJoinOracleSql(delta: Long): String =
    s"""
    |WITH r AS (
    |  SELECT c_mktsegment AS g, CAST(c_custkey AS BIGINT) AS k,
    |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    |  FROM customer)
    |SELECT a.g, CAST(count(*) AS BIGINT) AS n_pairs,
    |  CAST(min(abs(a.x - b.x)) AS BIGINT) AS min_gap,
    |  CAST(max(abs(a.x - b.x)) AS BIGINT) AS max_gap,
    |  CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sum_gap
    |FROM r a JOIN r b
    |  ON a.g = b.g AND a.k < b.k AND abs(a.x - b.x) <= $delta
    |GROUP BY a.g ORDER BY a.g
    |""".stripMargin.trim
}

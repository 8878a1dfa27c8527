package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's built-in `hash`/`xxhash64` have no DuckDB equivalent, so
  * oracle-checked operators (minhash/simhash dedup, fingerprints) use
  * a polynomial rolling hash over character codepoints that both
  * engines express exactly in 64-bit integer arithmetic:
  *
  *   h = fold(c in chars)( (h * 31 + codepoint(c)) mod P )
  *
  * Spark side: `aggregate` higher-order function (whole-stage
  * codegen'd, no UDF). DuckDB side: `list_reduce` with a prepended
  * zero accumulator. Permutations for minhash are the classic
  * universal-hash family h_i(x) = (a_i·x + b_i) mod P2, with
  * a_i < 10^5 and x < 10^9+7 so products stay far below 2^63.
  */
object Hashing {
  /** Base modulus (fits 31·P + 0x10FFFF in int64). */
  val P: Long = 1000000007L
  /** Permutation modulus (prime). */
  val P2: Long = 2038074743L

  /** Fixed minhash permutation coefficients (a, b). */
  val Perms: Seq[(Long, Long)] = Seq(
    (32771L, 11L), (49157L, 1009L), (65537L, 8191L), (92821L, 131L),
    (75479L, 2357L), (54679L, 6173L), (88523L, 947L), (41233L, 521L))

  /** Second-stage mixing coefficients for COMPOSED two-stage
    * permutations (e.g. the neighbor-set minhash in
    * [[graft.ext.Graph.linkPredictApprox]], where stage 1 is
    * Perms(i) and stage 2 re-wraps the result so small stage-1
    * outputs can't stay order-preserving). Deliberately NOT a member
    * of [[Perms]]: if stage 2 reused Perms(j), position i = j would
    * compose the same affine map with itself and the per-position
    * independence argument breaks for that position. a < 10^5 keeps
    * the product bounded exactly as for Perms (P2·a < 2^48). */
  val Stage2: (Long, Long) = (99991L, 7919L)

  /** Polynomial hash of a string column (Spark side) — the compiled
    * [[org.apache.spark.sql.graftext.PolyHashExpr]] kernel; HashingSpec
    * pins it to [[polyHashHof]] below. */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graftext.PolyHashBridge.column(s, P)

  /** Reference formulation as built-in higher-order functions — the
    * executable spec of the kernel (ASCII-equivalent; see the kernel
    * scaladoc for the non-ASCII caveat). */
  def polyHashHof(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c).cast("long"), lit(P)))

  /** Polynomial hash (DuckDB oracle side), over SQL expression `s`. */
  def polyHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(str_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P)"

  /** i-th minhash permutation of base hash `h` (Spark side). */
  def perm(h: Column, i: Int): Column = {
    val (a, b) = Perms(i)
    pmod(h * lit(a) + lit(b), lit(P2))
  }

  /** Deterministic bucket in [0, mod) of an int64 id via permutation
    * `i` — the single source of the sampling/split assignment hash
    * (different perm indices give mutually independent assignments).
    *
    * The id is reduced into [0, P2) BEFORE the multiply: id·a would
    * silently wrap int64 for |id| above ~2.8e14 in Spark's non-ANSI
    * arithmetic while the DuckDB twin errors on BIGINT overflow — the
    * reduced form is congruent mod P2 (identical buckets where the raw
    * form didn't wrap) and its product is bounded by P2·a < 2^47, so
    * neither engine can overflow on any int64 id. */
  def permBucket(id: Column, i: Int, mod: Int): Column = {
    val (a, b) = Perms(i)
    pmod(pmod(id, lit(P2)) * lit(a) + lit(b), lit(P2)) % mod
  }

  /** DuckDB twin of [[permBucket]]. DuckDB's `%` is sign-preserving
    * while Spark's `pmod` is not, so the twin normalizes into [0, P2)
    * explicitly — without it a negative id would bucket negative and
    * the engines would diverge. Same mod-before-multiply reduction. */
  def permBucketSql(id: String, i: Int, mod: Int): String = {
    val (a, b) = Perms(i)
    s"((((($id % $P2 + $P2) % $P2) * $a + $b) % $P2 + $P2) % $P2) % $mod"
  }

  /** i-th minhash permutation (DuckDB oracle side). */
  def permSql(h: String, i: Int): String = {
    val (a, b) = Perms(i)
    s"(($h * $a + $b) % $P2)"
  }
}

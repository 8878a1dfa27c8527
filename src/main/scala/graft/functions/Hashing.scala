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

  /** i-th minhash permutation (DuckDB oracle side). */
  def permSql(h: String, i: Int): String = {
    val (a, b) = Perms(i)
    s"(($h * $a + $b) % $P2)"
  }
}

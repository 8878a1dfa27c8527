package graft

import org.apache.spark.sql.functions._

import graft.ext.Privacy
import graft.functions.Hashing

class PrivacySpec extends SparkSpec {

  test("maskDigits masks every digit, leaves structure intact") {
    import spark.implicits._
    val out = Seq("Customer#000000001", "no digits", "a1b2c3")
      .toDF("v").select(Privacy.maskDigits(col("v")).as("m"))
      .collect().map(_.getString(0))
    assert(out(0) == "Customer##########")
    assert(out(1) == "no digits")
    assert(out(2) == "a#b#c#")
  }

  test("pseudonym is the engine-portable poly hash: stable and collision-free on the fixture") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val tokens = cust.select(col("c_name"),
      Privacy.pseudonym(col("c_name")).as("tok"))
    assert(tokens.filter(col("tok").isNull).count() == 0)
    // distinct names -> distinct tokens (no collisions at fixture size)
    assert(tokens.select("tok").distinct().count() ==
      cust.select("c_name").distinct().count())
    // equals the Hashing kernel it claims to be
    assert(tokens.filter(Privacy.pseudonym(col("c_name")) =!=
      Hashing.polyHash(col("c_name"))).count() == 0)
  }

  test("bucketize floors toward -inf in fixed-width buckets") {
    import spark.implicits._
    val out = Seq(1863.84, -250.5, 0.0, 999.99, 1000.0)
      .toDF("v").select(Privacy.bucketize(col("v"), 1000).as("b"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1000L, -1000L, 0L, 0L, 1000L))
  }

  test("kAnonymity: size histogram and k-violation flags") {
    import spark.implicits._
    // QI groups: (a: 3 rows), (b: 3 rows), (c: 1 row), (d: 1 row),
    // (e: 5 rows) -> sizes {1: 2 groups, 3: 2 groups, 5: 1 group}
    val df = (Seq.fill(3)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d") ++
      Seq.fill(5)("e")).toDF("qi")
    val got = Privacy.kAnonymity(df, Seq(col("qi")), 5L)
      .orderBy("group_size")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1L),   // singletons violate k=5
      (3L, 2L, 6L, 1L),   // size-3 groups violate
      (5L, 1L, 5L, 0L)))  // size-5 group is safe
  }

  test("lDiversity: group size is not diversity — a large uniform " +
      "group still violates") {
    import spark.implicits._
    // group a: 6 rows, ALL the same sensitive value (diversity 1 —
    // k-anonymous at k=5 yet fully disclosing); group b: 3 rows,
    // 3 distinct values; group c: 2 rows, 2 values
    val df = (Seq.fill(6)(("a", "s1")) ++
      Seq(("b", "s1"), ("b", "s2"), ("b", "s3")) ++
      Seq(("c", "s1"), ("c", "s2"))).toDF("qi", "sv")
    val got = Privacy.lDiversity(df, Seq(col("qi")), col("sv"), 3L)
      .orderBy("diversity")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 6L, 1L),   // the uniform group of 6: diversity 1
      (2L, 1L, 2L, 1L),   // c violates l=3
      (3L, 1L, 3L, 0L)))  // b satisfies
  }

  test("suppressedRollup: small groups merge into one residual row, " +
      "totals are conserved") {
    import spark.implicits._
    val df = (Seq.fill(6)(("a", 1.00)) ++
      Seq(("b", 0.75), ("b", 0.75), ("c", 0.50))).toDF("g", "amt")
    val got = Privacy.suppressedRollup(df, Seq(col("g")), col("amt"), 5L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 6L, 600L, 0L),
      ("(suppressed)", 3L, 200L, 1L)))
    // conservation: published mass equals raw mass
    assert(got.map(_._2).sum == 9L && got.map(_._3).sum == 800L)
    // no small groups -> no residual row
    val none = Privacy.suppressedRollup(df, Seq(col("g")), col("amt"), 1L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(none.forall(_._4 == 0L) && none.map(_._1).toSet ==
      Set("a", "b", "c"))
  }

  test("tCloseness: skewed groups carry half the mass in EMD, " +
      "a global-matching group carries zero") {
    import spark.implicits._
    // bands {1, 2}, global 6+6; A all band-1, B all band-2, C
    // matches the global 50/50 split exactly
    val df = (Seq.fill(4)(("A", 1L)) ++ Seq.fill(4)(("B", 2L)) ++
      Seq(("C", 1L), ("C", 1L), ("C", 2L), ("C", 2L))).toDF("g", "b")
    val got = Privacy.tCloseness(df, col("g"), col("b"), 400000L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 4L, 500000L, 1L),
      ("B", 4L, 500000L, 1L),
      ("C", 4L, 0L, 0L)))
  }

  test("tCloseness: a group absent from a band still pays that " +
      "band's cumulative mass (dense grid, not sparse join)") {
    import spark.implicits._
    // three bands; group X sits entirely in the TOP band: its cum
    // shortfall accrues across both lower bands
    val df = (Seq.fill(3)(("X", 3L)) ++
      Seq(("Y", 1L), ("Y", 2L), ("Y", 3L))).toDF("g", "b")
    // global: b1=1, b2=2... wait: counts are b1:1, b2:1, b3:4; n=6
    // cumQ_ppm: b1 = 166666, b2 = 333333, b3 = 1000000
    // X (3 rows, all b3): cumP = 0, 0, 1e6 ->
    //   |0-166666| + |0-333333| + 0 = 499999; /(m-1)=2 -> 249999
    val gotX = Privacy.tCloseness(df, col("g"), col("b"), 100000L)
      .as[(String, Long, Long, Long)].collect()
      .find(_._1 == "X").get
    assert(gotX == (("X", 3L, 249999L, 1L)))
  }
}

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
}

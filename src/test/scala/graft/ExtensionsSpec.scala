package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftext.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook must make the native functions reachable from
  * plain SQL in a session built with .withExtensions. Extensions bind
  * at session build time, so this builds a sibling session (sharing
  * any existing SparkContext) rather than reusing the shared one —
  * and must NOT stop() it, which would kill the context under the
  * other suites. */
class ExtensionsSpec extends AnyFunSuite {

  test("float_vec_dot is callable from spark.sql") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = spark.sql(
        """SELECT float_vec_dot(
          |  cast(array(1.0, 2.0, 3.0) as array<float>),
          |  cast(array(4.0, 5.0, 6.0) as array<float>)) AS d""".stripMargin)
        .first().getDouble(0)
      assert(math.abs(got - 32.0) < 1e-12)
      val dec = spark.sql(
        """SELECT cast(decimal_vec_dot(
          |  cast(array(1.0, 2.0) as array<float>),
          |  cast(array(3.0, 4.0) as array<float>)) as double) AS d""".stripMargin)
        .first().getDouble(0)
      assert(math.abs(dec - 11.0) < 1e-12)
      val ldot = spark.sql(
        """SELECT long_vec_dot(
          |  cast(array(1, -2, 3) as array<bigint>),
          |  cast(array(4, 5, 6) as array<bigint>)) AS d""".stripMargin)
        .first().getLong(0)
      assert(ldot == 12L)
      // null contract: length mismatch scores NULL, not a truncated dot
      assert(spark.sql(
        """SELECT long_vec_dot(
          |  cast(array(1, 2) as array<bigint>),
          |  cast(array(3) as array<bigint>)) AS d""".stripMargin)
        .first().isNullAt(0))
      val bucket = spark.sql(
        """SELECT srp_bucket(
          |  cast(array(1.0, -1.0, 0.5) as array<float>), 4, 0) AS b""".stripMargin)
        .first().getLong(0)
      assert(bucket >= 0L && bucket < 16L)
      val ph = spark.sql("SELECT poly_hash('abc', 1000000007) AS h")
        .first().getLong(0)
      // ((0*31+97)*31+98)*31+99 = 96354
      assert(ph == 96354L)
      // winnow: < k tokens -> NULL; the kernel itself is pinned to
      // the HOF formulation by WinnowShuffleSpec
      val wf = spark.sql(
        "SELECT winnow_fps('a b c d e f g h', 5, 4, 1000000007) AS f")
        .first().getSeq[Long](0)
      assert(wf.nonEmpty && wf.toSet.size == wf.length)
      assert(spark.sql(
        "SELECT winnow_fps('a b', 5, 4, 1000000007) AS f")
        .first().isNullAt(0))
      val fhv = spark.sql(
        "SELECT feature_hash_vec('a b a', 8, 1000000007) AS v")
        .first().getSeq[Long](0)
      assert(fhv.length == 8 && fhv.sum == 3L && fhv.max == 2L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

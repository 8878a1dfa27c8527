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
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

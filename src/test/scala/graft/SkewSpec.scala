package graft

import org.apache.spark.sql.functions._

import graft.ext.Skew

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals plain groupBy exactly") {
    val ev = Queries.eventsTable(spark, sf)
    val salted = Skew.saltedSumCount(ev, Seq("event_type"),
        col("value").cast("decimal(14,4)"), col("event_id"), 16)
      .orderBy("event_type").collect()
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(14,4)")).as("sum_value"),
        count(lit(1)).as("n_rows"))
      .orderBy("event_type").collect()
    assert(salted.length == plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (s, p) => assert(s == p) }
  }

  test("salted join equals the plain inner join exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_brand"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_partkey", "l_orderkey", "l_linenumber", "p_partkey",
          "p_brand")
        .collect().map(_.toSeq).toSet
    val salted = canon(Skew.saltedJoin(li, p, col("l_partkey"),
      col("p_partkey"), col("l_orderkey"), 8))
    val plain = canon(li.join(p, col("l_partkey") === col("p_partkey")))
    assert(salted == plain && salted.nonEmpty)
    // every probe row matched in exactly one bucket: row counts equal
    assert(Skew.saltedJoin(li, p, col("l_partkey"), col("p_partkey"),
      col("l_orderkey"), 8).count() ==
      li.join(p, col("l_partkey") === col("p_partkey")).count())
  }

  test("salted join keeps probe rows with a NULL salt source") {
    import spark.implicits._
    val probe = Seq((1L, Some(10L)), (1L, None), (2L, Some(7L)))
      .toDF("k", "salt_src")
    val build = Seq((1L, "a"), (2L, "b")).toDF("bk", "attr")
    val joined = Skew.saltedJoin(probe, build, col("k"), col("bk"),
      col("salt_src"), 8)
    // the null-salt row must still meet its match, like the plain join
    assert(joined.count() == 3L)
    assert(joined.filter(col("salt_src").isNull).count() == 1L)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, col("k"), col("bk"),
        col("salt_src"), 0)
    }
  }

  test("salt fan-out is bounded by the bucket count") {
    val ev = Queries.eventsTable(spark, sf)
    val perKeyGroups = ev
      .withColumn("__salt", pmod(col("event_id"), lit(16)))
      .groupBy("event_type", "__salt").count()
      .groupBy("event_type").count()
      .agg(max("count")).first().getLong(0)
    assert(perKeyGroups <= 16)
  }
}

package graft.meta

import java.time.LocalDateTime

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Watermark tracker — reference `etl_load_tracker` (SQL:242-256).
  *
  * One row per target table. `last_successful_load` is the DATA
  * watermark: the max source change timestamp actually loaded.
  * `last_successful_execution_time` is the wall clock of the last
  * successful run. The distinction is load-bearing (reference
  * SQL:635-651): a rerun that finds no new data advances the clock but
  * must NOT move the data watermark, or late rows between the old
  * watermark and "now" would be skipped forever.
  *
  * The table is a handful of rows — reading it to the driver is the
  * one sanctioned driver-side materialization (SURVEY §7.6); the
  * watermark is then injected into source scans as a literal so
  * Parquet predicate pushdown prunes row groups at any scale.
  */
final class LoadTracker(spark: SparkSession, path: String) {
  import LoadTracker._

  def read(): Map[String, LocalDateTime] = {
    // heal a crashed publish first: without this, a tracker that died
    // between rename-aside and rename-in reads as "no tracker" and
    // every watermark silently resets to 1900 (full reload)
    StagedWrite.recover(spark, path)
    if (!exists()) Map.empty
    else spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getAs[LocalDateTime](1)).toMap
  }

  /** Data watermark for `table`, seeded to 1900-01-01 (SQL:252-255). */
  def watermark(table: String): LocalDateTime =
    read().getOrElse(table, Epoch)

  /** Advance after a successful load. `dataWatermark=None` means the
    * delta was empty: bump only the execution clock (SQL:643-651
    * `IF @lastedit IS NOT NULL`). */
  def advance(table: String, dataWatermark: Option[LocalDateTime]): Unit = {
    val now = LocalDateTime.now()
    val cur = read()
    val nextLoad = dataWatermark.getOrElse(cur.getOrElse(table, Epoch))
    val rows = (cur - table).toSeq.map { case (k, v) => (k, v) } :+ (table -> nextLoad)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v, now) }, 1),
      schema)
    StagedWrite.overwrite(df, path)
  }

  private def exists(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

object LoadTracker {
  /** "Beginning of time" sentinel (reference SQL:252-255). */
  val Epoch: LocalDateTime = LocalDateTime.of(1900, 1, 1, 0, 0, 0)

  val schema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("last_successful_load", TimestampNTZType, nullable = false),
    StructField("last_successful_execution_time", TimestampNTZType, nullable = false)))
}

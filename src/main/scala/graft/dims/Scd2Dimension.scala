package graft.dims

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{LoadTracker, RunLog, StagedWrite}

/** A parameterized SCD2 dimension load — the generic form of the
  * reference's three per-dim stored procedures `etl_load_dimcustomer` /
  * `etl_load_dimsalesperson` / `etl_load_dimproduct` (SQL:915-1326),
  * which are copy-pastes of one pattern with different keys/attrs.
  *
  * Each run:
  *   1. reads the data watermark (driver-side scalar, SURVEY §2.C10)
  *   2. pulls the delta from the change feed (`history` filtered to
  *      rows newer than the watermark — predicate pushed to the scan)
  *   3. recomputes the dimension as a pure SCD2 derivation over
  *      (existing versions ∪ delta), drops no-op changes, reassigns
  *      validity with [[Scd2.deriveVersions]]
  *   4. detects deletes against the current source snapshot
  *      (reference SQL:974-988) and closes those versions out
  *   5. publishes via staged swap, advances the watermark only if the
  *      delta was non-empty (SQL:643-651), appends a run-log row
  *
  * @param name      dimension name (warehouse table + tracker key)
  * @param nk        natural key column in the change feed
  * @param changeTs  change timestamp column in the change feed
  * @param tracked   attribute columns versioned by the dimension
  * @param tiebreak  deterministic ordering tiebreak columns
  */
final class Scd2Dimension(name: String, nk: String, changeTs: String,
                          tracked: Seq[String], tiebreak: Seq[String] = Nil) {

  private val versionKey = Seq(nk, "active_from")

  /** Incremental (and first-time) load. `changeFeed` is the full
    * watermark-filterable history source; `snapshotKeys` the current
    * live natural keys (None disables delete detection). */
  def load(spark: SparkSession, changeFeed: DataFrame,
           snapshotKeys: Option[DataFrame], dimPath: String,
           tracker: LoadTracker, log: RunLog): Long = {
    val started = new Timestamp(System.currentTimeMillis())
    try {
      val wm = tracker.watermark(name)
      // 2. delta: watermark filter is a literal -> parquet pushdown
      val delta = changeFeed.filter(col(changeTs) > lit(wm))

      val existing: Option[DataFrame] =
        if (pathExists(spark, dimPath)) Some(spark.read.parquet(dimPath)) else None

      val attrs = (Seq(nk) ++ tracked ++ Seq(changeTs) ++ tiebreak).distinct
      val history = existing match {
        case Some(dim) =>
          dim.select(attrs.map(col): _*).unionByName(delta.select(attrs.map(col): _*))
        case None => delta.select(attrs.map(col): _*)
      }

      // 3. pure recompute: collapse no-ops, re-derive intervals + SKs
      val versions = Scd2.deriveVersions(
        Scd2.dropNoOpChanges(history.dropDuplicates(versionKeyCols(attrs)),
          nk, changeTs, tracked, tiebreak),
        nk, changeTs, tiebreak)
      val keyed = Scd2.withSurrogate(versions, s"${name}_id", versionKey)

      // 4. delete detection: close out vanished keys "as of now"
      val withDeletes = snapshotKeys match {
        case Some(snap) =>
          val gone = Scd2.deletedKeys(
            keyed.filter(col("is_current") === 1L), snap, nk)
            .select(col(nk)).distinct()
          val closeTs = lit(LocalDateTime.now())
          keyed.join(gone.withColumn("__gone", lit(1)), Seq(nk), "left")
            .withColumn("active_to",
              when(col("__gone") === 1 && col("is_current") === 1L, closeTs)
                .otherwise(col("active_to")))
            .withColumn("is_current",
              when(col("__gone") === 1, 0L).otherwise(col("is_current")))
            .drop("__gone")
        case None => keyed
      }

      val inserted = delta.count()
      // 5. publish + advance watermark + log
      StagedWrite.overwrite(withDeletes, dimPath)
      val dataWm =
        if (inserted == 0) None
        else Option(delta.agg(max(col(changeTs))).first().getAs[LocalDateTime](0))
      tracker.advance(name, dataWm)
      log.append(s"etl_load_$name", started, inserted, 0L, 0L, RunLog.Success, None)
      inserted
    } catch {
      case e: Throwable =>
        log.append(s"etl_load_$name", started, 0L, 0L, 0L, RunLog.Fail,
          Some(String.valueOf(e.getMessage)))
        throw e
    }
  }

  private def versionKeyCols(attrs: Seq[String]): Seq[String] =
    Seq(nk, changeTs) ++ tiebreak

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

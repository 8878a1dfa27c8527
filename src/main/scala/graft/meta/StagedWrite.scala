package graft.meta

import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Staged-swap publish — the Spark-side answer to the reference's
  * `BEGIN TRAN … COMMIT/ROLLBACK` around each load (reference
  * SQL:924-925, 990, 1026-1044).
  *
  * Plain `mode("overwrite")` on a path we are also *reading from* in
  * the same plan deletes the input mid-job; and a failed overwrite
  * leaves a half-written table. Writing the full result to a sibling
  * staging dir first and renaming it in is the commit point: the
  * target is either the complete old version or the complete new one.
  * On a real cluster the rename becomes a metastore / table-format
  * (Delta/Iceberg) commit; the call sites don't change.
  */
object StagedWrite {
  def overwrite(df: DataFrame, target: String): Unit = {
    val staging = target + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = new Path(staging).getFileSystem(conf)
    val tgt = new Path(target)
    if (fs.exists(tgt)) fs.delete(tgt, true)
    if (!fs.rename(new Path(staging), tgt))
      throw new RuntimeException(s"staged-swap rename failed: $staging -> $target")
  }
}

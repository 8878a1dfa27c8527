package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The repo's single choke-point for "pin this intermediate" — the
  * load-bearing materializations (one shared boundary draw for the
  * two-phase ranks, one evaluation of a multiply-consumed edge set)
  * all route through here, so the STORAGE POSTURE is a runtime dial
  * instead of a hard-coded `localCheckpoint()` at every site.
  *
  * `spark.graft.pin.storage`:
  *  - `"memory_and_disk"` (default) — plain `localCheckpoint()`:
  *    deserialized rows in the JVM heap, spilling to disk. Fastest
  *    re-reads; on a 1000-executor cluster each executor holds only
  *    its slice, so heap pressure is a non-issue.
  *  - `"disk_only"` — `localCheckpoint(eager, DISK_ONLY)`: rows
  *    serialize straight to local disk and the heap retains NOTHING.
  *    This is the local[32]/single-JVM posture for the ×30-scale
  *    runs SCALE.md §30/§31 diagnosed: the checkpointed 18M-row
  *    snapshots were driving GC, not compute — trading re-read
  *    deserialization for a quiet heap. Semantics are identical
  *    (still one eager materialization, one boundary draw).
  *
  * Both modes keep localCheckpoint's contract that makes the rank
  * machinery exact: EAGER materialization, so every downstream
  * consumer reads the same computed partitions (same
  * RangePartitioner draw) instead of re-evaluating lineage.
  */
object Pin {
  val ConfKey = "spark.graft.pin.storage"

  def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).map(_.toLowerCase) match {
      case Some("disk_only") =>
        df.localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
      case _ => df.localCheckpoint()
    }
}

package graft.runtime

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Exactly-once-ish sink for foreachBatch: Spark's checkpoint gives
  * at-least-once, so a retried micro-batch re-runs the write. Guarding on
  * the (deterministically reproduced) batchId makes the write idempotent —
  * the standard upgrade from at-least-once to effectively-once for
  * non-transactional sinks (reference has nothing comparable; its
  * auto-commit loses in-flight records instead, SURVEY.md §2 A27).
  */
object IdempotentSink {

  /** Run `write` once per batchId; replays skip. Completion markers live
    * under `markerDir` (on the same storage as the checkpoint).
    */
  def writeOnce(markerDir: String, batchId: Long)(write: => Unit): Boolean = {
    val dir = Paths.get(markerDir)
    Files.createDirectories(dir)
    val marker = dir.resolve(s"batch-$batchId.done")
    if (Files.exists(marker)) false
    else {
      write
      Files.createFile(marker)
      true
    }
  }

  /** foreachBatch function wrapping a partitioned parquet append with the
    * batch guard.
    */
  def parquetAppend(outPath: String, markerDir: String)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    writeOnce(markerDir, batchId) {
      batch.write.mode("append").parquet(outPath)
    }
  }
}

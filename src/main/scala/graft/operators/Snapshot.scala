package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive for recurring
  * crawls/ingests: classify every document id across two snapshots as
  * added / removed / changed / unchanged by comparing a content
  * fingerprint, never the full text. `/root/reference` has no analytics
  * surface; part of the training-data-pipeline inventory (SURVEY.md §2
  * Part B).
  *
  * Scale shape (two ~100 TB snapshots):
  *   - the fingerprint (md5 / [[Dedup.polyHash]] of the content) is
  *     computed per-row BEFORE the join, so only (id, fingerprint)
  *     pairs cross the wire — the join payload is tens of bytes per
  *     document regardless of document size;
  *   - one hash-partitioned full-outer equi-join on the id (AQE splits
  *     skewed partitions); with both snapshots bucketed by id on disk
  *     (`runtime/TableLayout`) the exchange disappears entirely — the
  *     standing layout for a snapshot store that diffs every ingest;
  *   - no windows and no global order anywhere.
  */
object Snapshot {

  /** Diff two snapshots keyed by `idCol`, comparing `fingerprintCol`.
    * Output: idCol, old_fp, new_fp, status — where status is `added`
    * (id only in `newDf`), `removed` (only in `oldDf`), `changed`
    * (both, fingerprints differ) or `unchanged`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           fingerprintCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), col(fingerprintCol).as("old_fp"))
    val n = newDf.select(col(idCol), col(fingerprintCol).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog compaction — the lakehouse MERGE/upsert-apply primitive: a
  * stream of keyed change records (insert/update/delete, each stamped
  * with an ordering pair) collapses to the latest-wins snapshot. The
  * recurring-crawl complement of [[Snapshot.diff]]: diff DERIVES a
  * changelog from two snapshots, compact APPLIES a changelog to produce
  * one.
  */
object Changelog {

  /** Latest-wins snapshot of a changelog. Per key, the winning record is
    * the struct-max over (tsCol, seqCol) — the caller's contract is that
    * (ts, seq) orders a key's changes (seq disambiguates same-timestamp
    * changes, e.g. a log sequence number; exact (ts, seq) duplicates
    * fall through to op/value lexicographic struct order, still
    * deterministic). Tombstones are KEPT, flagged live=false — dropping
    * them would break incremental re-compaction (a delete-then-reinsert
    * key would forget its pre-delete change count; the q148 lesson:
    * carry state forward, filter at publish time).
    *
    * Scale shape: ONE combinable aggregate (struct-max + count collapse
    * map-side; a hot key never buffers its history anywhere). No
    * windows, no joins.
    *
    * Output: (keyCol, valueCols*, last_ts, last_seq, live, n_changes).
    */
  def compact(df: DataFrame, keyCol: String, tsCol: String, seqCol: String,
              opCol: String, valueCols: Seq[String],
              deleteOp: String = "D"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val shaped = df.select(col(keyCol), col(tsCol).as("__ts"),
      col(seqCol).as("__seq"), col(opCol).as("__op"),
      struct(valueCols.map(col): _*).as("__v"), lit(1L).as("__w"))
    compactShaped(shaped, keyCol, valueCols, deleteOp)
  }

  /** Incremental re-compaction: a previously compacted snapshot (the
    * OUTPUT of [[compact]], tombstones included) absorbs a new raw
    * changelog slice. Equivalent to compacting the concatenated log:
    * winners agree because struct-max is associative; n_changes agrees
    * because the base row re-enters carrying its accumulated count as a
    * weight (ChangelogSpec pins split-vs-whole equality, including the
    * delete-then-reinsert key that motivates keeping tombstones).
    */
  def compactIncremental(base: DataFrame, delta: DataFrame, keyCol: String,
                         tsCol: String, seqCol: String, opCol: String,
                         valueCols: Seq[String],
                         deleteOp: String = "D"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val b = base.select(col(keyCol), col("last_ts").as("__ts"),
      col("last_seq").as("__seq"),
      when(col("live"), lit("U")).otherwise(lit(deleteOp)).as("__op"),
      struct(valueCols.map(col): _*).as("__v"),
      col("n_changes").as("__w"))
    val d = delta.select(col(keyCol), col(tsCol).as("__ts"),
      col(seqCol).as("__seq"), col(opCol).as("__op"),
      struct(valueCols.map(col): _*).as("__v"), lit(1L).as("__w"))
    compactShaped(b.unionByName(d), keyCol, valueCols, deleteOp)
  }

  /** SCD2 validity-interval history from the same changelog: every
    * non-delete change becomes a version row valid [its ts, the next
    * change's ts), the last open version has valid_to null, and a
    * delete CLOSES the prior version without emitting one (its ts is
    * visible as that version's valid_to). `version` numbers ALL of a
    * key's changes in (ts, seq) order — deletes included, so version
    * numbers are stable under later filtering (both engines replay the
    * same rule).
    *
    * Scale shape: one window per key ordered by (ts, seq) — partitioned
    * by the key, so the only assumption is the standard SCD2 one: a
    * single key's change HISTORY fits a task (violating that means
    * millions of changes to one row — a changelog pathology, not a
    * corpus-size function). No global-order step.
    *
    * Output: (keyCol, valueCols*, valid_from, valid_to, version,
    * is_current).
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, seqCol: String,
           opCol: String, valueCols: Seq[String],
           deleteOp: String = "D"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    df.select(col(keyCol) +: col(tsCol) +: col(seqCol) +: col(opCol) +:
        valueCols.map(col): _*)
      .withColumn("__vto", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .filter(col(opCol) =!= lit(deleteOp))
      .select(col(keyCol) +: valueCols.map(col) :+
        col(tsCol).as("valid_from") :+ col("__vto").as("valid_to") :+
        col("version") :+ col("__vto").isNull.as("is_current"): _*)
  }

  private def compactShaped(shaped: DataFrame, keyCol: String,
                            valueCols: Seq[String],
                            deleteOp: String): DataFrame = {
    val agg = shaped.groupBy(col(keyCol))
      .agg(max(struct(col("__ts").as("ts"), col("__seq").as("seq"),
          col("__op").as("op"), col("__v").as("v"))).as("__win"),
        sum(col("__w")).as("n_changes"))
    agg.select(
      col(keyCol) +:
        valueCols.map(c => col(s"__win.v.$c").as(c)) :+
        col("__win.ts").as("last_ts") :+
        col("__win.seq").as("last_seq") :+
        (col("__win.op") =!= lit(deleteOp)).as("live") :+
        col("n_changes"): _*)
  }
}

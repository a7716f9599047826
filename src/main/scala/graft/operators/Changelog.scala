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

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the exact set-similarity join: counts the
  * lossless candidate pairs the classical 1-prefix (PPJoin) and the
  * adaptive 2-token extended prefix (Wang 2012) feed into the verify
  * join, on the q244 corpus at a given scale dir — the measure-first
  * philosophy of the q221 join-size audit applied to this operator's
  * own tuning.
  * Usage: runMain graft.tools.CandidateProbe <sfDir> [tauPpm]
  */
object CandidateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tauPpm = if (args.length > 1) args(1).toLong else 400000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val ids = graft.operators.Dedup.shingleIdsPoly(docs, "doc_id", "text")
      .select(col("doc_id"), col("tid")).localCheckpoint()
    val sizes = ids.groupBy(col("doc_id")).agg(count(lit(1)).as("__sz"))
      .localCheckpoint()
    for (ell <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val n = graft.operators.SetJoin
        .candidatePairs(ids, sizes, "doc_id", "tid", tauPpm, ell).count()
      println(s"CANDIDATES ell=$ell tauPpm=$tauPpm n=$n " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}

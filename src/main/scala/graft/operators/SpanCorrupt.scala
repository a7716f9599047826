package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683 §3.1.4
  * / §3.3.4): mask contiguous token spans, replace each span with a
  * sentinel in the input, and emit `sentinel + original tokens` as the
  * target — the denoising-objective batch prep an LM data pipeline runs
  * after packing-adjacent steps (B21). The reference repo has no
  * analytics surface; this belongs to the additive training-pipeline
  * inventory (SURVEY.md §2 Part B).
  *
  * Determinism: the per-position mask decision is the house portable
  * hash gate (`(id*A + pos*B) % 100 < maskPct` — exact integer
  * arithmetic, no RNG), so the corruption is stable under re-runs,
  * repartitioning, and engines; spans are the maximal runs of masked
  * positions (T5 samples span lengths; the hash gate realizes the same
  * marginal rate with deterministic run lengths).
  *
  * Scale shape: one narrow position-explode, per-DOCUMENT windows for
  * the run ids (partitioned by the document id — bounded by document
  * length, the q81/q132 gaps-and-islands convention, never a global or
  * hot-key window), and ONE final per-doc aggregate that reassembles
  * both sequences from (pos, piece) pairs. No joins, no broadcasts —
  * scan-speed at 100 TB.
  */
object SpanCorrupt {

  /** Corrupt `textCol` into (input_text, target_text) plus span stats.
    * `maskPct` of positions (hash-gated) are masked; sentinel k is
    * `<extra_id_k>`, numbered 0.. per document in position order.
    */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
              maskPct: Int = 15, seedA: Long = 1000003L,
              seedB: Long = 7919L): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, s"maskPct in [0,100], got $maskPct")
    val toks = df
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("pos"), col("tok"))
      .withColumn("m",
        (col(idCol) * seedA + col("pos") * seedB) % 100 < maskPct)
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val runs = toks
      .withColumn("start",
        col("m") && !coalesce(lag(col("m"), 1).over(byPos), lit(false)))
      .withColumn("sid",
        sum(when(col("start"), 1L).otherwise(0L)).over(byPos))
    val sentinel = concat(lit("<extra_id_"), (col("sid") - 1).cast("string"), lit(">"))
    val pieces = runs.select(col(idCol), col("pos"), col("m"), col("sid"),
      // input: the token itself, or the sentinel at a span start, or
      // nothing inside a span
      when(!col("m"), col("tok"))
        .when(col("start"), sentinel)
        .otherwise(lit(null)).as("in_piece"),
      // target: sentinel + first masked token at a span start, bare
      // masked token inside a span, nothing outside
      when(col("start"), concat(sentinel, lit(" "), col("tok")))
        .when(col("m"), col("tok"))
        .otherwise(lit(null)).as("tg_piece"))
    def joined(piece: String) = array_join(transform(
      array_sort(collect_list(when(col(piece).isNotNull,
        struct(col("pos"), col(piece).as("s"))))),
      x => x.getField("s")), " ")
    pieces.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        // sid is the running span count, so its max is the span total
        max(col("sid")).as("n_spans"),
        joined("in_piece").as("input_text"),
        joined("tg_piece").as("target_text"))
      .select(col(idCol), col("n_tokens"), col("n_masked"), col("n_spans"),
        col("input_text"), col("target_text"))
  }
}

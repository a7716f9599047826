package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release gating for quasi-identifiers — k-anonymity (Sweeney 2002,
  * "k-anonymity: a model for protecting privacy"; Samarati 2001) with a
  * SUFFIX-generalization ladder: a record may be released at its full
  * quasi-identifier (level 0), or with trailing QI columns generalized
  * to "*" (level 1..L-1), or fully suppressed — and every RELEASED key
  * is guaranteed to be shared by >= k released records (the anonymity
  * set is the set of records actually published under that key, not a
  * pre-generalization count).
  *
  * That leftover semantics is what makes the guarantee real: level-1
  * groups are formed ONLY from records whose full QI group failed k —
  * counting all records at the coarser key would let a published
  * (lang, *) key cover fewer than k actual (lang, *) rows.
  *
  * Scale shape: ONE corpus aggregate builds the full-QI group table
  * (bounded by distinct QI combinations); the whole generalization
  * cascade — failed mass rolling up the ladder level by level — runs on
  * that bounded table, never re-scanning the corpus; one final
  * corpus-side equi-join on the full QI applies the per-group decision.
  * No windows anywhere, so a hot QI group costs a shuffle key, not a
  * buffered partition.
  *
  * Output: input columns + (anon_level [0..L, L = suppressed],
  * anon_group_size [null when suppressed], released_key — "v1/v2",
  * then "v1" with trailing stars, down to all-stars when suppressed).
  */
object Privacy {

  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 0, s"k must be positive, got $k")
    val L = qiCols.length
    val c0 = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__n0"))
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    parts += c0.filter(col("__n0") >= k)
      .select(qiCols.map(col) :+ lit(0).as("__lvl") :+
        col("__n0").as("__gsz"): _*)
    // cascade on the GROUP table: groups failing level lvl-1 roll their
    // counts up to the next-shorter prefix
    var remaining = c0.filter(col("__n0") < k)
    for (lvl <- 1 until L) {
      val keep = qiCols.dropRight(lvl)
      val cl = remaining.groupBy(keep.map(col): _*)
        .agg(sum(col("__n0")).as("__nl"))
      parts += remaining
        .join(cl.filter(col("__nl") >= k), keep)
        .select(qiCols.map(col) :+ lit(lvl).as("__lvl") :+
          col("__nl").as("__gsz"): _*)
      remaining = remaining
        .join(cl.filter(col("__nl") < k).select(keep.map(col): _*), keep)
    }
    parts += remaining.select(qiCols.map(col) :+ lit(L).as("__lvl") :+
      lit(null).cast("long").as("__gsz"): _*)
    val decision = parts.reduce(_.unionByName(_))
    val releasedKey = concat_ws("/", qiCols.zipWithIndex.map { case (c, i) =>
      // level lvl keeps the first L - lvl columns; the rest print "*"
      when(lit(i) < lit(L) - col("__lvl"), col(c).cast("string"))
        .otherwise(lit("*"))
    }: _*)
    df.join(decision, qiCols)
      .withColumn("anon_level", col("__lvl").cast("long"))
      .withColumn("anon_group_size", col("__gsz"))
      .withColumn("released_key", releasedKey)
      .drop("__lvl", "__gsz")
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2006,
    * "l-diversity: privacy beyond k-anonymity") over a [[kAnonymize]]
    * release: k-anonymity bounds re-identification but not ATTRIBUTE
    * disclosure — a released group whose members all share one
    * sensitive value reveals it for every member. Per released key
    * (suppressed rows excluded — they publish nothing): group size,
    * distinct sensitive values, and the l-diversity flag. One bounded
    * aggregate over the anonymized frame; the report has one row per
    * released key, so it is release-card sized at any corpus scale.
    *
    * Output: (released_key, n_rows, n_sensitive, diverse).
    */
  def lDiversityReport(anonymized: DataFrame, sensitiveCol: String,
                       l: Long): DataFrame = {
    require(l > 0, s"l must be positive, got $l")
    anonymized
      .filter(col("anon_group_size").isNotNull) // suppressed rows publish nothing
      .groupBy(col("released_key"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}

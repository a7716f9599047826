package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MDM-style survivorship: collapse the multiple records of one entity
  * (a near-dup cluster, a master-data key) into a single GOLDEN record
  * plus a conflict ledger. [[Changelog.compact]] answers "which write
  * is newest", [[graft.queries]]' q187 keeps the best whole record;
  * survivorship merges ATTRIBUTE-WISE — each field independently keeps
  * its plurality value, which is the standard merge rule when records
  * are near-copies with scattered field-level noise.
  */
object Survivorship {

  /** Golden record per entity: for every attribute the PLURALITY
    * non-null value (ties break to the smallest value — the q86 house
    * mode rule, a total order both engines replay), plus
    * `<attr>_n_values` (distinct non-null values seen — 1 means clean,
    * >1 is the conflict ledger) and `n_records`. An attribute that is
    * null on every record stays null with a null ledger.
    *
    * Scale shape per attribute: one (entity, value) count aggregate
    * (hot entities combine map-side), one COMBINABLE min(struct(-c, v))
    * winner aggregate — no window, no per-entity buffering — and one
    * entity-keyed join onto the accumulating golden table (all sides
    * hash-partitioned by the entity, so the joins reuse one exchange).
    * Values compare as strings in the winner struct; outputs are
    * strings (the uniform-schema contract of a merge report).
    *
    * Output: (entityCol, n_records, then per attr: <attr>,
    * <attr>_n_values).
    */
  /** OpenRefine-style key-collision clustering (the "fingerprint"
    * method): two records belong together when their NORMALIZATION KEY
    * — lowercased, split on non-alphanumerics, deduplicated, sorted,
    * rejoined — collides. Catches exactly the variant class
    * edit-distance and shingle-Jaccard handle poorly: token
    * permutations, casing, punctuation and whitespace noise collapse
    * to one key, while a single real word change never does. The
    * standard first pass of an entity-cleanup pipeline, ahead of the
    * fuzzier [[graft.operators.EditDistance]] / LSH stages.
    *
    * Scale shape: the key is one narrow per-row expression; one
    * aggregate groups by its md5 (16-byte shuffle keys, not
    * document-length strings — the exact-dedup house rule). Output is
    * bounded by the collision count.
    *
    * Output: (fp_hash, n_records, n_variants — distinct raw texts,
    * canonical_id — smallest id), collisions only (n_records > 1).
    */
  def fingerprintClusters(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val key = array_join(array_sort(array_distinct(
      filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0))), " ")
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), col(textCol), md5(key).as("fp_hash"))
      .groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col(textCol)).as("n_variants"),
        min(col(idCol)).as("canonical_id"))
      .filter(col("n_records") > 1)
  }

  def goldenRecord(df: DataFrame, entityCol: String,
                   attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute")
    require(!attrCols.contains(entityCol),
      s"entity column $entityCol cannot also be an attribute")
    val base = df.filter(col(entityCol).isNotNull)
    val golden = base.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"))
    attrCols.foldLeft(golden) { (acc, a) =>
      val winners = base.filter(col(a).isNotNull)
        .groupBy(col(entityCol), col(a).cast("string").as("__v"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col(entityCol))
        .agg(min(struct((-col("__c")).as("nc"), col("__v").as("v")))
          .as("__w"),
          count(lit(1)).as(s"${a}_n_values"))
        .select(col(entityCol), col("__w.v").as(a),
          col(s"${a}_n_values"))
      acc.join(winners, Seq(entityCol), "left")
    }
  }
}

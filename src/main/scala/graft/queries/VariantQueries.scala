package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT coverage (SURVEY.md §2 A8's schemaless side): build a
  * nested, heterogeneous JSON document from table columns, `parse_json` it
  * once into a VARIANT, then extract typed values by path with
  * `variant_get` / `try_variant_get`. The DuckDB oracle runs the same
  * construction through its JSON type, so path semantics, numeric casts,
  * and missing-path nulls are all cross-checked.
  *
  * Scale note: VARIANT parses once into a binary form; every downstream
  * `variant_get` is a dictionary lookup, not a re-parse. With
  * `get_json_object`, N extractions = N full parses of the text — the
  * difference is a constant factor ~N on wide payloads.
  */
object VariantQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_variant" -> { (s, d) =>
      // One nested JSON doc per event: object + number + array of mixed
      // types; parsed once, extracted four ways.
      val js = concat(
        lit("{\"meta\":{\"type\":\""), col("event_type"),
        lit("\",\"k\":"), get_json_object(col("props"), "$.k"),
        lit("},\"tags\":[\"a\","), (col("event_id") % 5).cast("string"),
        lit("]}"))
      Tables.events(s, d)
        .select(col("event_id"), parse_json(js).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.meta.type", "string").as("vtype"),
          variant_get(col("v"), "$.meta.k", "long").as("k"),
          variant_get(col("v"), "$.tags[1]", "long").as("tag1"),
          try_variant_get(col("v"), "$.missing.path", "long").as("missing"))
        .filter(col("k") % 3 === 0)
        .orderBy(col("event_id"))
    })

  val oracle: Map[String, String] = Map(
    "q64_variant" -> """
      WITH j AS (
        SELECT event_id,
          '{"meta":{"type":"' || event_type || '","k":'
            || json_extract_string(props, '$.k')
            || '},"tags":["a",' || CAST(event_id % 5 AS VARCHAR) || ']}' AS js
        FROM events)
      SELECT event_id,
        json_extract_string(js, '$.meta.type') AS vtype,
        CAST(json_extract_string(js, '$.meta.k') AS BIGINT) AS k,
        CAST(json_extract_string(js, '$.tags[1]') AS BIGINT) AS tag1,
        CAST(NULL AS BIGINT) AS missing
      FROM j
      WHERE CAST(json_extract_string(js, '$.meta.k') AS BIGINT) % 3 = 0
      ORDER BY event_id""")
}

package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column inventory (SURVEY.md §2 B18). The documents' text bytes
  * stand in for media payloads (no codec libs in this container); the
  * binary-column plumbing — cast to binary, metadata extraction, frame
  * sampling — is the real Spark-side surface and is oracle-checked via the
  * expression twin of the stub decoder.
  */
object MultimodalQueries extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_multimodal_meta" -> { (s, d) =>
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          col("text").cast("binary").as("payload"))
      Multimodal.metaColumns(media, "payload")
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("media_id"))
    },

    "q46_frame_sample" -> { (s, d) =>
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      Multimodal.metaColumns(media, "payload")
        .select(col("media_id"), col("n_frames"),
          Multimodal.frameSample(col("n_frames"), 4).as("frames"))
        .select(col("media_id"), col("n_frames"),
          size(col("frames")).cast("long").as("n_sampled"),
          array_join(transform(col("frames"), _.cast("string")), ",").as("frame_list"))
        .orderBy(col("media_id"))
    })

  val oracle: Map[String, String] = Map(
    "q45_multimodal_meta" -> """
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height,
        CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
      FROM documents ORDER BY media_id""",

    "q46_frame_sample" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
        FROM documents),
      s AS (
        SELECT media_id, n_frames,
          range(0, n_frames, greatest(CAST(ceil(CAST(n_frames AS DOUBLE) / 4) AS BIGINT), 1)) AS frames
        FROM m)
      SELECT media_id, n_frames,
        CAST(len(frames) AS BIGINT) AS n_sampled,
        array_to_string(list_transform(frames, x -> CAST(x AS VARCHAR)), ',') AS frame_list
      FROM s ORDER BY media_id""")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions + decode plumbing (SURVEY.md §2 B18).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB training-data lake would use (payload bytes in
  * parquet/object storage, metadata queryable without touching bytes).
  *
  * The decode step itself (image/audio codecs) is STUBBED — the codec
  * libraries are not in this container — behind [[DecodedMeta]]: a
  * deterministic fake that derives plausible dimensions from the byte
  * content. The Spark-side plumbing is real: schema, encoder, partition-wise
  * `mapPartitions` (one codec init per partition, the shape a JNI decoder
  * needs), and frame sampling as an expression.
  */
object Multimodal {

  /** Typed record for a media payload row. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Stub "decoded" metadata: in production this comes from the codec. */
  case class DecodedMeta(media_id: Long, kind: String, byte_len: Long,
                         width: Long, height: Long, n_frames: Long)

  /** Deterministic fake decode — stands in for a real codec call.
    * Pure function of the payload bytes. */
  def fakeDecode(r: MediaRecord): DecodedMeta = {
    val len = r.payload.length.toLong
    DecodedMeta(r.media_id, r.kind, len,
      width = len % 640, height = (len * 7) % 480, n_frames = len % 30 + 1)
  }

  /** Partition-wise decode: the real pattern for heavyweight codecs — any
    * per-codec setup happens once per partition, not per row.
    */
  def decode(records: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // codec init would go here (once per partition / task)
      it.map(fakeDecode)
    }
  }

  /** Expression-only variant of the stub decode, for oracle checking: the
    * same arithmetic as [[fakeDecode]] over `length(payload)`.
    */
  def metaColumns(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("width", col("byte_len") % 640)
      .withColumn("height", (col("byte_len") * 7) % 480)
      .withColumn("n_frames", col("byte_len") % 30 + 1)

  /** Sample up to `maxFrames` frame indices, evenly spaced from 0. */
  def frameSample(nFrames: org.apache.spark.sql.Column, maxFrames: Int) = {
    val step = greatest(ceil(nFrames.cast("double") / maxFrames).cast("long"), lit(1L))
    sequence(lit(0L), nFrames - 1, step)
  }
}

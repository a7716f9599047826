package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column conventions + decode plumbing (SURVEY.md §2 B18).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the layout a 100 TB training-data lake would use (payload bytes in
  * parquet/object storage, metadata queryable without touching bytes).
  *
  * Decode coverage is split honestly: UNCOMPRESSED formats (RIFF/WAV PCM,
  * BMP) are hand-parsed byte layouts, and COMPRESSED images (JPEG/PNG)
  * are really decoded too, via the JDK's own `javax.imageio` codecs
  * ([[graft.functions.MediaCodecs]], dispatched by [[decodeMedia]] on
  * magic bytes). Only A/V codecs the JDK lacks (MP3/H.264) fall back to
  * the deterministic stub [[fakeDecode]]. The Spark-side plumbing is
  * real throughout: schema, encoder, partition-wise `mapPartitions`
  * (one codec init per partition, the shape a JNI decoder needs), and
  * frame sampling as an expression.
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

  /** Fully decoded media record: real fields for the formats the engine
    * genuinely decodes, stub-derived fields otherwise. `decoder` says
    * which path produced the row ("wav_pcm" / "bmp" / "stub").
    */
  case class DecodedMedia(
      media_id: Long, kind: String, byte_len: Long, decoder: String,
      width: Long, height: Long, n_frames: Long,
      sample_rate: Long, duration_ms: Double, rms: Double, peak: Double,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Real decode where the bytes allow it — RIFF/WAV PCM and uncompressed
    * BMP are pure byte layouts, JPEG/PNG go through the JDK's built-in
    * `javax.imageio` codec ([[graft.functions.MediaCodecs]]) — with the
    * deterministic stub as the fallback only for A/V codecs the JDK
    * lacks (MP3/H.264). Partition-wise like [[decode]]; dispatch is on
    * the payload's magic bytes, not the claimed `kind` (data lakes lie).
    */
  def decodeMedia(records: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import records.sparkSession.implicits._
    import graft.functions.MediaCodecs
    records.mapPartitions { it =>
      it.map { r =>
        val len = r.payload.length.toLong
        MediaCodecs.decodeWav(r.payload) match {
          case Some(w) =>
            DecodedMedia(r.media_id, r.kind, len, "wav_pcm",
              0L, 0L, w.nSamples, w.sampleRate.toLong, w.durationMs,
              w.rms, w.peak, 0.0, 0.0, 0.0)
          case None => MediaCodecs.decodeBmp(r.payload) match {
            case Some(b) =>
              DecodedMedia(r.media_id, r.kind, len, "bmp",
                b.width.toLong, b.height.toLong, 1L, 0L, 0.0, 0.0, 0.0,
                b.meanR, b.meanG, b.meanB)
            case None => MediaCodecs.decodeImage(r.payload) match {
              case Some(i) =>
                DecodedMedia(r.media_id, r.kind, len, i.format,
                  i.width.toLong, i.height.toLong, 1L, 0L, 0.0, 0.0, 0.0,
                  i.meanR, i.meanG, i.meanB)
              case None =>
                val f = fakeDecode(r)
                DecodedMedia(r.media_id, r.kind, len, "stub",
                  f.width, f.height, f.n_frames, 0L, 0.0, 0.0, 0.0,
                  0.0, 0.0, 0.0)
            }
          }
        }
      }
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

  /** Column wrapper: gray array<int> -> real 8x8 BMP payload bytes. */
  def encodeBmpGray8(gray: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.EncodeBmpGray8(
      ColumnBridge.expression(gray)))
  }

  /** Column wrapper: BMP payload -> 64-bit average-hash (NULL if undecodable). */
  def bmpAHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.BmpAHash(
      ColumnBridge.expression(payload)))
  }

  /** Perceptual image near-dup pairs: aHash each payload (real BMP
    * decode), then find id pairs within `maxHamming` bits via 4-band
    * 16-bit LSH — band-equality buckets generate candidates (the
    * MinHash-LSH shape of [[Dedup]], so no all-pairs comparison
    * anywhere), XOR popcount scores them inside codegen. Undecodable
    * payloads drop out (hash NULL) instead of poisoning a bucket.
    *
    * Scale shape: 4 bucket-join passes over one hashed projection;
    * candidate volume is bounded by bucket occupancy, exactly like the
    * text-LSH path. A popular near-identical image (a site logo, a
    * tracking pixel) puts its whole cluster in one band bucket, and the
    * self-join then emits |bucket|^2 / 2 pairs — at web scale that is
    * the dominant cost, so the text path's deterministic per-bucket cap
    * applies here too: `maxPerBucket > 0` keeps the `n` smallest ids
    * per (band, key) bucket. The cap costs no extra shuffle (the
    * row_number window partitions by the same key the join shuffles
    * on); capped buckets still link every member to the bucket minimum,
    * so connected components survive — only redundant intra-cluster
    * edges are dropped. `0` = exact banding semantics (the oracle
    * mode, used by q142).
    *
    * Output: (id_a, id_b, hamming), id_a < id_b, each pair once.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 10,
                        maxPerBucket: Int = 0): DataFrame =
    hashNearDupPairs(
      df.select(col(idCol), bmpAHash(col(payloadCol)).as("__h")),
      idCol, maxHamming, maxPerBucket)

  /** Column wrapper: gray array<int> -> real zlib-deflated 8x8 grayscale
    * PNG payload bytes. */
  def encodePngGray8(gray: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.EncodePngGray8(
      ColumnBridge.expression(gray)))
  }

  /** Column wrapper: JPEG/PNG payload -> 64-bit average-hash over the raw
    * raster (NULL if undecodable or smaller than 8x8). */
  def imgAHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.ImgAHash(
      ColumnBridge.expression(payload)))
  }

  /** Perceptual near-dup pairs over COMPRESSED image payloads (JPEG/PNG
    * through the JDK `javax.imageio` codec) — [[imageNearDupPairs]] with
    * the [[graft.functions.MediaCodecs.imgAHash64]] fingerprint instead
    * of the BMP one: real decode of the formats a web crawl actually
    * contains, then the shared 4-band Hamming LSH + XOR-popcount pair
    * join. Same cap contract and scale shape; undecodable payloads drop
    * out (hash NULL).
    */
  def compressedImageNearDupPairs(df: DataFrame, idCol: String,
                                  payloadCol: String, maxHamming: Int = 10,
                                  maxPerBucket: Int = 0): DataFrame =
    hashNearDupPairs(
      df.select(col(idCol), imgAHash(col(payloadCol)).as("__h")),
      idCol, maxHamming, maxPerBucket)

  /** Column wrapper: samples array<int> -> real mono 8-bit PCM WAV bytes. */
  def encodeWavPcm8(samples: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.EncodeWavPcm8(
      ColumnBridge.expression(samples)))
  }

  /** Column wrapper: WAV payload -> 64-bit frame-energy hash (NULL if
    * undecodable or shorter than 64 samples).
    */
  def wavEnergyHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.WavEnergyHash(
      ColumnBridge.expression(payload)))
  }

  /** Perceptual AUDIO near-dup pairs — [[imageNearDupPairs]] for sound:
    * each payload goes through the real PCM WAV decode into a 64-bit
    * frame-energy fingerprint (loudness contour, the signal that
    * survives re-encoding and trims), and the identical 4-band Hamming
    * LSH + XOR-popcount machinery finds pairs within `maxHamming` bits —
    * the jingle/silence/duplicate-clip gate of an audio ingest pipeline.
    * Same cap contract and scale shape as the image path.
    */
  def audioNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 10,
                        maxPerBucket: Int = 0): DataFrame =
    hashNearDupPairs(
      df.select(col(idCol), wavEnergyHash(col(payloadCol)).as("__h")),
      idCol, maxHamming, maxPerBucket)

  /** Shared 4-band 16-bit Hamming-LSH pair join over a (idCol, __h)
    * frame — the banding/cap/verify stage both perceptual-dedup paths
    * (and any future 64-bit fingerprint) share. Null hashes drop out.
    */
  private def hashNearDupPairs(hashedIn: DataFrame, idCol: String,
                               maxHamming: Int, maxPerBucket: Int): DataFrame = {
    val hashed = hashedIn.filter(col("__h").isNotNull)
    val banded0 = hashed.select(col(idCol), col("__h"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("__band"),
        shiftrightunsigned(col("__h"), b * 16).bitwiseAND(lit(0xffffL))
          .as("__key"))): _*)).as("__bk"))
      .select(col(idCol), col("__h"),
        col("__bk.__band").as("__band"), col("__bk.__key").as("__key"))
    val banded = if (maxPerBucket > 0) {
      val w = Window.partitionBy(col("__band"), col("__key"))
        .orderBy(col(idCol))
      banded0.withColumn("__bn", row_number().over(w))
        .filter(col("__bn") <= maxPerBucket).drop("__bn")
    } else banded0
    val a = banded.select(col(idCol).as("id_a"), col("__h").as("__ha"),
      col("__band"), col("__key"))
    val b = banded.select(col(idCol).as("id_b"), col("__h").as("__hb"),
      col("__band"), col("__key"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ha"), col("__hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

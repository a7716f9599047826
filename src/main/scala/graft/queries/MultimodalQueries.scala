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
    },

    "q194_audio_neardup" -> { (s, d) =>
      // Perceptual AUDIO dedup over REAL format bytes — q142's twin for
      // sound: a deterministic 256-sample mono 8-bit PCM WAV is
      // synthesized per document (docs in the same doc_id%97 class share
      // all but their first eight samples), pushed through the
      // production encode -> RIFF/WAVE decode -> 64-frame integer
      // energy fingerprint path (a decoder regression breaks this
      // oracle, not just a unit test), and near-dup pairs come from the
      // shared 4-band 16-bit LSH + XOR popcount. The oracle replays
      // samples, frame energies, and banding arithmetically.
      // class-keyed loud/quiet frame envelope (the signal the energy
      // hash is built to capture): frame j of class c is loud by the
      // square-recombine parity hash (a purely affine chain leaves a
      // quasi-alternating parity sequence — every mask collapses toward
      // 0xAAAA…, the B41 projection lesson — the modular square
      // decorrelates it); samples alternate ±amp around 128, with a
      // per-doc tweak on the first 8 samples that the energy threshold
      // provably absorbs (classmates hash identically, hamming 0). The
      // per-bucket cap is ON here (the q73 capped-LSH contract at the
      // audio level): a viral jingle fills its band buckets once, and
      // the oracle replays the same n-smallest-ids rule.
      def loudBit(i: org.apache.spark.sql.Column) = {
        val x = (((col("doc_id") % 97) * 64L + floor(i / 4).cast("long") + 1L)
          * 2654435761L) % 1000000007L
        (x * x % 1000000007L) % 2L === 0L
      }
      val smp = transform(sequence(lit(0), lit(255)), i =>
        (lit(128L) +
          when(loudBit(i), 96L).otherwise(lit(8L)) *
            when(i % 2 === 0, 1L).otherwise(lit(-1L)) +
          when(i < 8, col("doc_id") % 16).otherwise(lit(0L))).cast("int"))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          Multimodal.encodeWavPcm8(smp).as("payload"))
      Multimodal.audioNearDupPairs(media, "media_id", "payload",
          maxHamming = 10, maxPerBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },

    "q200_png_neardup" -> { (s, d) =>
      // q142's twin for COMPRESSED image bytes: a deterministic 8x8
      // grayscale PNG (real zlib-deflated IDAT, CRC'd chunks) is
      // synthesized per document, pushed through the production JDK
      // `javax.imageio` decode -> raw-raster aHash path (a codec or
      // color-management regression breaks this oracle, not just a unit
      // test — the raster read is what keeps the bits exact, PNG being
      // lossless), and near-dup pairs come from the shared 4-band LSH
      // with the per-bucket cap ON (the q73/q194 contract — a shared
      // class fills its band buckets once, so output is bounded by
      // bucket occupancy at any corpus size; the oracle replays the
      // same n-smallest-ids rule). The pixel recipe mirrors q142's
      // class structure under different mixing constants so the two
      // fixtures stay independent.
      val gray = transform(sequence(lit(0), lit(63)), i =>
        (((col("doc_id") % 97) * 7919L + i * 104729L +
          when(i < 4, col("doc_id")).otherwise(lit(0L))) % 256L).cast("int"))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          Multimodal.encodePngGray8(gray).as("payload"))
      Multimodal.compressedImageNearDupPairs(media, "media_id", "payload",
          maxHamming = 10, maxPerBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },

    "q142_image_neardup" -> { (s, d) =>
      // Perceptual image dedup over REAL format bytes: a deterministic
      // 8x8 grayscale BMP is synthesized per document (docs in the same
      // doc_id%97 class share all but their first four pixels), hashed
      // through the production decode path (encode -> decodeBmp ->
      // thumbnail -> integer aHash — a decoder regression breaks this
      // oracle, not just a unit test), and near-dup pairs come from
      // 4-band 16-bit LSH + XOR popcount. The oracle replays pixels and
      // bits arithmetically and the identical banding rule.
      val gray = transform(sequence(lit(0), lit(63)), i =>
        (((col("doc_id") % 97) * 1000003L + i * 7919L +
          when(i < 4, col("doc_id")).otherwise(lit(0L))) % 256L).cast("int"))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          Multimodal.encodeBmpGray8(gray).as("payload"))
      Multimodal.imageNearDupPairs(media, "media_id", "payload", maxHamming = 10)
        .orderBy(col("id_a"), col("id_b"))
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
      FROM s ORDER BY media_id""",

    "q194_audio_neardup" -> """
      WITH smp AS (
        SELECT doc_id, list_transform(range(0, 256), i ->
          128 + (CASE WHEN
                   (((doc_id % 97) * 64 + (i // 4) + 1) * 2654435761 % 1000000007)
                   * (((doc_id % 97) * 64 + (i // 4) + 1) * 2654435761 % 1000000007)
                   % 1000000007 % 2 = 0
                 THEN 96 ELSE 8 END)
              * (CASE WHEN i % 2 = 0 THEN 1 ELSE -1 END)
            + CASE WHEN i < 8 THEN doc_id % 16 ELSE 0 END) AS v
        FROM documents),
      en AS (
        SELECT doc_id, list_transform(range(0, 64), j ->
          CAST(list_sum(list_transform(range(j*4, j*4 + 4), i ->
            (v[i+1] - 128) * (v[i+1] - 128))) AS BIGINT)) AS e
        FROM smp),
      hb AS (SELECT doc_id, e, CAST(list_sum(e) AS BIGINT) AS se FROM en),
      h AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 32), j ->
            CASE WHEN 64 * e[j+1] > se THEN CAST(1 AS BIGINT) << j
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_lo,
          CAST(list_sum(list_transform(range(0, 32), j ->
            CASE WHEN 64 * e[j+33] > se THEN CAST(1 AS BIGINT) << j
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_hi
        FROM hb),
      bands AS (
        SELECT doc_id, h_lo, h_hi,
          unnest([h_lo % 65536, h_lo // 65536, h_hi % 65536, h_hi // 65536]) AS key,
          unnest([0, 1, 2, 3]) AS band
        FROM h),
      capped AS (
        SELECT doc_id, h_lo, h_hi, key, band FROM (
          SELECT bands.*, row_number() OVER (
            PARTITION BY band, key ORDER BY doc_id) AS rn
          FROM bands) t
        WHERE rn <= 8),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          a.h_lo AS alo, a.h_hi AS ahi, b.h_lo AS blo, b.h_hi AS bhi
        FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
          AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
      FROM pairs
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 10
      ORDER BY id_a, id_b""",

    "q200_png_neardup" -> """
      WITH px AS (
        SELECT doc_id, list_transform(range(0, 64), i ->
          ((doc_id % 97) * 7919 + i * 104729 +
           CASE WHEN i < 4 THEN doc_id ELSE 0 END) % 256) AS g
        FROM documents),
      hb AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS sg FROM px),
      h AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN 64 * g[i+1] > sg THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_lo,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN 64 * g[i+33] > sg THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_hi
        FROM hb),
      bands AS (
        SELECT doc_id, h_lo, h_hi,
          unnest([h_lo % 65536, h_lo // 65536, h_hi % 65536, h_hi // 65536]) AS key,
          unnest([0, 1, 2, 3]) AS band
        FROM h),
      capped AS (
        SELECT doc_id, h_lo, h_hi, key, band FROM (
          SELECT bands.*, row_number() OVER (
            PARTITION BY band, key ORDER BY doc_id) AS rn
          FROM bands) t
        WHERE rn <= 8),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          a.h_lo AS alo, a.h_hi AS ahi, b.h_lo AS blo, b.h_hi AS bhi
        FROM capped a JOIN capped b ON a.band = b.band AND a.key = b.key
          AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
      FROM pairs
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 10
      ORDER BY id_a, id_b""",

    "q142_image_neardup" -> """
      WITH px AS (
        SELECT doc_id, list_transform(range(0, 64), i ->
          ((doc_id % 97) * 1000003 + i * 7919 +
           CASE WHEN i < 4 THEN doc_id ELSE 0 END) % 256) AS g
        FROM documents),
      hb AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS sg FROM px),
      h AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN 64 * g[i+1] > sg THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_lo,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN 64 * g[i+33] > sg THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h_hi
        FROM hb),
      bands AS (
        SELECT doc_id, h_lo, h_hi,
          unnest([h_lo % 65536, h_lo // 65536, h_hi % 65536, h_hi // 65536]) AS key,
          unnest([0, 1, 2, 3]) AS band
        FROM h),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          a.h_lo AS alo, a.h_hi AS ahi, b.h_lo AS blo, b.h_hi AS bhi
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
          AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
      FROM pairs
      WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 10
      ORDER BY id_a, id_b""")
}

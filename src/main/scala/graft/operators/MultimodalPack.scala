package graft.operators

import graft.Tables
import graft.multimodal.BinaryColumns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column operators over binary payloads. `documents.text`
  * stands in for the opaque media bytes; at 100 TB this column is real
  * image/audio content.
  *
  * The decode queries are oracle-gated END TO END: the payload is a real
  * WAV/BMP byte layout assembled in Catalyst from document columns, the
  * engine decodes it by parsing the bytes (BinaryColumns.decodeWav/
  * decodeBmp — little-endian fields at chunk offsets, magic validation),
  * and the DuckDB oracle recomputes every field by arithmetic from the
  * same source columns. What the encoder embeds, the parser must extract.
  */
object MultimodalPack {

  /** Non-overlapping window width of the `mm_audio_rms` energy frames. */
  private[graft] val AudioFrameBytes = 64

  /** Scene-cut detector constants: frame width and the milli-mean jump
    * (|Δ| of the per-frame length-normalized byte mean, ×1000) that
    * counts as a cut — 6 byte-units, ≈8% of the fixture's transitions. */
  private[graft] val SceneFrameBytes = 32
  private[graft] val CutMilli = 6000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binary payload + typed metadata (size, checksum) ----------------
    "mm_binary_meta" -> ((s, d) => {
      BinaryColumns.withPayload(Tables.documents(s, d), "doc_id", "text")
        .select("media_id", "n_bytes", "checksum")
        .orderBy("media_id")
    }),

    // ---- real-header audio decode (RIFF/WAVE, mapPartitions batches) -----
    "mm_decode_wav" -> ((s, d) => {
      BinaryColumns.decodeWav(s,
        BinaryColumns.wavPayload(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .orderBy("media_id")
    }),

    // ---- real-header image decode (BMP, mapPartitions batches) -----------
    "mm_decode_bmp" -> ((s, d) => {
      BinaryColumns.decodeBmp(s,
        BinaryColumns.bmpPayload(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .orderBy("media_id")
    }),

    // ---- frame sampling (video frame-sample / audio window-hop shape):
    //      fixed-size binary chunks, every 4th kept. Pure Catalyst substr
    //      slicing inside the scan's task; frames surface as text here
    //      (ASCII stand-in bytes) so the oracle checks the sampled BYTES,
    //      not just counts — at 100 TB the frame column stays opaque
    //      binary and a checksum takes its place. ---------------------------
    "mm_frame_sample" -> ((s, d) => {
      BinaryColumns.sampleFrames(
        BinaryColumns.withPayload(Tables.documents(s, d), "doc_id", "text"),
        frameBytes = 32, everyK = 4)
        .select(col("media_id"),
          col("sample_pos").cast("long").as("sample_pos"),
          col("frame_bytes"),
          col("frame").cast("string").as("frame_text"))
        .orderBy("media_id", "sample_pos")
    }),

    // ---- content-level audio feature extraction: per-frame RMS energy ----
    // The first FEATURE over media bytes (decode entries read headers;
    // frame-sample slices): non-overlapping [[AudioFrameBytes]]-byte
    // windows over the WAV payload's DATA region (header skipped by the
    // declared 44-byte offset), each scoring Σ(b−128)² — the centered
    // energy every silence/clipping detector thresholds — plus a
    // quantized RMS in exact integers: floor(sqrt(energy·10⁶ div n)).
    // The sqrt is un-mis-floorable (the pipe_temp_sample argument:
    // energy·10⁶ ≤ 1.05e12 < 2^53 is double-exact, IEEE sqrt is
    // correctly rounded, and a non-square's root sits ≥ 1/(2k) from any
    // integer — orders above the ulp), so both engines replay the
    // feature bit-for-bit. Per-byte work is codegen'd array expressions
    // (transform materializes the deviations ONCE — the CollapseProject
    // double-eval trap); frames explode inside the scan's task, state is
    // bounded by the frame width — embarrassingly parallel at any scale.
    // Stand-in bytes are ASCII text, so the oracle's character ord()
    // equals the engine's byte value.
    "mm_audio_rms" -> ((s, d) => {
      val media = BinaryColumns
        .wavPayload(Tables.documents(s, d), "doc_id", "text")
        .select(col("media_id"),
          expr("substring(payload, 45, octet_length(payload) - 44)")
            .as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      BinaryColumns.sampleFrames(media, frameBytes = AudioFrameBytes,
          everyK = 1)
        .withColumn("t", col("frame").cast("string"))
        .select(col("media_id"),
          col("sample_pos").cast("long").as("frame_pos"),
          col("frame_bytes").as("n"),
          expr("aggregate(transform(sequence(1, CAST(length(t) AS INT)), " +
            "i -> ascii(substring(t, i, 1)) - 128), 0L, " +
            "(acc, v) -> acc + CAST(v AS BIGINT) * v)").as("energy"))
        .withColumn("rms_milli",
          expr("CAST(floor(sqrt((energy * 1000000L) div n)) AS BIGINT)"))
        .orderBy("media_id", "frame_pos")
    }),

    // ---- video scene-cut detection over sampled frames --------------------
    // The shot-boundary primitive of every video curation pipeline: a cut
    // is a jump in consecutive frames' signatures. Frames are the
    // [[SceneFrameBytes]]-byte slices of the media payload; the signature
    // is the LENGTH-NORMALIZED integer milli-mean (sig·1000 div n — the
    // short tail frame must not false-cut on size alone), and a
    // transition is a cut when |Δ| ≥ [[CutMilli]]. All integer-exact.
    // Plan: frames explode inside the scan task, the lag is one window
    // over a media_id partitioning (frames per media are bounded by
    // payload size — no skew funnel), cut rows are the output. On real
    // pixel data the same shape runs on perceptual signatures; the
    // milli-mean is the stand-in the ASCII fixture can replay exactly.
    "mm_scene_cuts" -> ((s, d) => {
      val media = BinaryColumns
        .withPayload(Tables.documents(s, d), "doc_id", "text")
        .select(col("media_id"), col("payload"), col("n_bytes"))
      val sigs = BinaryColumns.sampleFrames(media,
          frameBytes = SceneFrameBytes, everyK = 1)
        .withColumn("t", col("frame").cast("string"))
        .select(col("media_id"),
          col("sample_pos").cast("long").as("frame_pos"),
          // normalize by the BYTE count sampleFrames already emits —
          // length(t) is char-based and would diverge from the byte
          // slicing if a fixture ever carried multi-byte text
          expr("aggregate(transform(sequence(1, CAST(length(t) AS INT)), " +
            "i -> ascii(substring(t, i, 1))), 0L, " +
            "(acc, v) -> acc + v) * 1000L div frame_bytes").as("mmean"))
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_pos"))
      sigs.withColumn("prev_mmean", lag(col("mmean"), 1).over(w))
        .filter(col("prev_mmean").isNotNull &&
          abs(col("mmean") - col("prev_mmean")) >= CutMilli)
        .select(col("media_id"), col("frame_pos"), col("prev_mmean"),
          col("mmean"),
          (col("mmean") - col("prev_mmean")).as("delta_milli"))
        .orderBy("media_id", "frame_pos")
    }),

    // ---- decode + feature-extract on real pixels: id-derived raster BMP
    //      (bottom-up rows, 4-byte row stride — the true layout) decoded
    //      and nearest-neighbour downsampled 2× in mapPartitions batches;
    //      the oracle recomputes every thumbnail pixel arithmetically, so
    //      a stride/flip/padding bug in the kernel is a value mismatch. ----
    "mm_resize_bmp" -> ((s, d) => {
      BinaryColumns.resizeBmp(s,
        BinaryColumns.bmpRasterPayload(Tables.documents(s, d), "doc_id"))
        .toDF()
        .orderBy("media_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // the WAV data region IS the text bytes, so the oracle frames the
    // text directly (ASCII ⇒ character ord == byte value) and replays
    // the centered-energy fold and the integer-domain sqrt exactly
    "mm_audio_rms" ->
      s"""WITH ks AS (
         |  SELECT doc_id AS media_id, text,
         |    unnest(generate_series(1,
         |      CAST(ceil(length(text) / $AudioFrameBytes.0) AS BIGINT)))
         |      AS k
         |  FROM documents WHERE length(text) > 0),
         |f AS (
         |  SELECT media_id, CAST(k - 1 AS BIGINT) AS frame_pos,
         |    substr(text, CAST((k - 1) * $AudioFrameBytes + 1 AS INT),
         |      $AudioFrameBytes) AS t
         |  FROM ks),
         |e AS (
         |  SELECT media_id, frame_pos, CAST(length(t) AS BIGINT) AS n,
         |    CAST(list_reduce(list_transform(generate_series(1, length(t)),
         |      i -> CAST((ord(substr(t, i, 1)) - 128) AS BIGINT) *
         |        (ord(substr(t, i, 1)) - 128)), (a, b) -> a + b) AS BIGINT)
         |      AS energy
         |  FROM f)
         |SELECT media_id, frame_pos, n, energy,
         |  CAST(floor(sqrt((energy * 1000000) // n)) AS BIGINT)
         |    AS rms_milli
         |FROM e ORDER BY media_id, frame_pos""".stripMargin,

    // same text-framed replay; the lag + threshold run in SQL verbatim
    "mm_scene_cuts" ->
      s"""WITH ks AS (
         |  SELECT doc_id AS media_id, text,
         |    unnest(generate_series(1,
         |      CAST(ceil(length(text) / $SceneFrameBytes.0) AS BIGINT)))
         |      AS k
         |  FROM documents WHERE length(text) > 0),
         |f AS (
         |  SELECT media_id, CAST(k - 1 AS BIGINT) AS frame_pos,
         |    substr(text, CAST((k - 1) * $SceneFrameBytes + 1 AS INT),
         |      $SceneFrameBytes) AS t
         |  FROM ks),
         |s AS (
         |  SELECT media_id, frame_pos,
         |    CAST(CAST(list_reduce(list_transform(
         |        generate_series(1, length(t)),
         |        i -> CAST(ord(substr(t, i, 1)) AS BIGINT)),
         |        (a, b) -> a + b) AS BIGINT) * 1000 // length(t) AS BIGINT)
         |      AS mmean
         |  FROM f),
         |d AS (
         |  SELECT media_id, frame_pos, mmean,
         |    lag(mmean) OVER (PARTITION BY media_id ORDER BY frame_pos)
         |      AS prev_mmean
         |  FROM s)
         |SELECT media_id, frame_pos, prev_mmean, mmean,
         |  mmean - prev_mmean AS delta_milli
         |FROM d
         |WHERE prev_mmean IS NOT NULL
         |  AND abs(mmean - prev_mmean) >= $CutMilli
         |ORDER BY media_id, frame_pos""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,

    // Every field the WAV decoder parses out of the bytes, recomputed by
    // arithmetic from the columns the encoder embedded them from.
    "mm_decode_wav" ->
      """SELECT doc_id AS media_id,
        | CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS sample_rate,
        | CAST(1 + (doc_id % 2) AS BIGINT) AS channels,
        | CAST(16 AS BIGINT) AS bits,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS data_bytes,
        | CAST(octet_length(CAST(text AS BLOB)) * 1000
        |   // ((8000 + (doc_id % 5) * 4000) * (1 + doc_id % 2) * 2)
        |   AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_decode_bmp" ->
      """SELECT doc_id AS media_id,
        | CAST(1 + (doc_id % 640) AS BIGINT) AS width,
        | CAST(1 + (doc_id % 480) AS BIGINT) AS height,
        | CAST(24 AS BIGINT) AS bpp,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS img_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // The payload is the ASCII text bytes, so VARCHAR slicing reproduces
    // the engine's binary substr exactly (octet_length == length is
    // asserted over the corpus by mm_binary_meta's oracle equality).
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (SELECT media_id, text,
        |  unnest(generate_series(0,
        |    CAST(ceil(n_bytes / 32.0) AS BIGINT) - 1, 4)) AS i
        |  FROM m WHERE n_bytes > 0)
        |SELECT media_id, i // 4 AS sample_pos,
        |  CAST(length(substring(text, i * 32 + 1, 32)) AS BIGINT)
        |    AS frame_bytes,
        |  substring(text, i * 32 + 1, 32) AS frame_text
        |FROM f ORDER BY media_id, sample_pos""".stripMargin,

    // Every thumbnail pixel recomputed from the same arithmetic the
    // encoder embedded: out(x, y) = P(2x, 2y) = (id+2x, id+2y, 2x+2y)
    // mod 256, top-down row order, 6 hex chars per pixel.
    "mm_resize_bmp" ->
      """WITH p AS (SELECT doc_id AS media_id,
        |  2 * (1 + doc_id % 8) AS w, 2 * (1 + doc_id % 6) AS h
        |  FROM documents)
        |SELECT media_id,
        |  CAST(w // 2 AS BIGINT) AS out_w, CAST(h // 2 AS BIGINT) AS out_h,
        |  array_to_string(flatten(list_transform(
        |    generate_series(0, h // 2 - 1), y ->
        |      list_transform(generate_series(0, w // 2 - 1), x ->
        |        printf('%02x%02x%02x', (media_id + 2 * x) % 256,
        |          (media_id + 2 * y) % 256, (2 * x + 2 * y) % 256)))), '')
        |    AS out_hex
        |FROM p ORDER BY media_id""".stripMargin
  )
}

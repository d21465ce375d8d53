package graft.operators

import graft.Tables
import graft.multimodal.BinaryColumns
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    })
  )

  val oracles: Map[String, String] = Map(
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
        |FROM documents ORDER BY media_id""".stripMargin
  )
}

package graft.operators

import graft.Tables
import graft.multimodal.BinaryColumns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: the oracle-checkable byte-level metadata
  * layer over binary payloads (the opaque decode stub itself is covered by
  * ScalaTest — see BinaryColumns). `documents.text` stands in for the
  * opaque media payload; at 100 TB this column is real image/audio bytes.
  */
object MultimodalPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binary payload + typed metadata (size, checksum) ----------------
    "mm_binary_meta" -> ((s, d) => {
      BinaryColumns.withPayload(Tables.documents(s, d), "doc_id", "text")
        .select("media_id", "n_bytes", "checksum")
        .orderBy("media_id")
    }),

    // ---- decode-stub pipeline (mapPartitions batch shape; deterministic
    //      fake decode → rows-only driver check, no SQL oracle) ------------
    "mm_decode_stub" -> ((s, d) => {
      BinaryColumns.decodeStub(s,
        BinaryColumns.withPayload(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .orderBy("media_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin
    // mm_decode_stub: opaque per-partition decode — rows-only check.
  )
}

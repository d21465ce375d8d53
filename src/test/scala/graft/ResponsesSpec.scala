package graft

import graft.api.Responses
import org.apache.spark.sql.functions._

/** Bulk-response nesting (reference §3.1 step 6: rows → {mbid: {offset:
  * doc}} JSON). */
class ResponsesSpec extends SparkSpec {
  import spark.implicits._

  test("rows nest into {gid: {offset: doc}} with sorted keys") {
    val rows = Seq(
      ("b-uuid", 1, 4.5, "mp3"),
      ("a-uuid", 0, 3.0, "flac"),
      ("b-uuid", 0, 2.0, "ogg"))
      .toDF("gid", "offset", "length", "codec")
    val out = Responses.bulkResponse(rows, $"gid", $"offset",
      struct($"length", $"codec")).collect()(0).getString(0)
    assert(out ==
      """{"a-uuid":{"0":{"length":3.0,"codec":"flac"}},""" +
      """"b-uuid":{"0":{"length":2.0,"codec":"ogg"},""" +
      """"1":{"length":4.5,"codec":"mp3"}}}""")
  }

  test("assembly is deterministic regardless of input row order") {
    // doc_id as the offset: unique per gid by construction (duplicate map
    // keys would make map_from_entries throw, not test determinism)
    val base = Tables.documents(spark, sfTiny).limit(30)
      .select(col("source").as("gid"),
        col("doc_id").as("offset"),
        struct(col("doc_id"), col("lang")).as("doc"))
    val a = Responses.bulkResponse(base, col("gid"), col("offset"), col("doc"))
      .collect()(0).getString(0)
    val b = Responses.bulkResponse(base.orderBy(rand(7)), col("gid"),
      col("offset"), col("doc")).collect()(0).getString(0)
    assert(a == b && a.nonEmpty)
  }
}

package graft

import graft.api.HighLevel
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden end-to-end high-level document reassembly (SURVEY §2 S8, the
  * document-contract half): per-model rows + the meta row → one
  * `sort_keys=True` JSON document per recording, byte-for-byte — the
  * high-level counterpart of FeaturesSpec's low-level golden response.
  * Shape mirrors the reference fixture
  * `db/test_data/0dad432b-..._highlevel.json` and `db/dump.py:699-841`
  * (version injection, sorted model map, `{mbid}-{no}.json` naming,
  * two-level mbid fan-out). Probabilities are binary-representable so the
  * JSON bytes are stable (float-repr caveat: Ingest.canonicalJson doc). */
class HighLevelSpec extends SparkSpec {

  private val U1 = "0dad432b-16cc-4bf0-8961-fd31d124b01b"
  private val U2 = "e8afe383-1478-497e-90b1-7885c7f37f6e"

  private val version1 = Row("2.1-beta1", "8e24b98b", "v2.1_beta1-228",
    "music 1.0", "2.4-dev", "857329b", "v2.1_beta1")
  private val version2 = Row("2.1-beta2", "9f35c00c", "v2.1_beta2-001",
    "music 1.0", "2.4-dev", "857329b", "v2.1_beta2")

  private val metaSchema = StructType(Seq(
    StructField("audio_properties", StructType(Seq(
      StructField("length", DoubleType),
      StructField("lossless", BooleanType)))),
    StructField("tags", MapType(StringType, ArrayType(StringType))),
    StructField("version", StructType(Seq(
      StructField("highlevel", HighLevel.versionSchema),
      StructField("lowlevel", StructType(Seq(
        StructField("essentia", StringType)))))))))

  private val modelRowSchema = StructType(Seq(
    StructField("gid", StringType),
    StructField("submission_offset", IntegerType),
    StructField("model", StringType),
    StructField("data", HighLevel.modelData),
    StructField("version", HighLevel.versionSchema)))

  private val metaRowSchema = StructType(Seq(
    StructField("gid", StringType),
    StructField("submission_offset", IntegerType),
    StructField("metadata", metaSchema)))

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  // model rows arrive UNSORTED (gender before danceability) and the `all`
  // maps are insertion-ordered differently from their sorted-key output —
  // the assembler, not the fixture, must produce the ordering
  private lazy val models = df(modelRowSchema,
    Row(U1, 0, "gender",
      Row(Map("male" -> 0.375, "female" -> 0.625), 0.625, "female"),
      version1),
    Row(U1, 0, "danceability",
      Row(Map("not_danceable" -> 0.96875, "danceable" -> 0.03125),
        0.96875, "not_danceable"),
      version1),
    Row(U1, 0, "genre_electronic",
      Row(Map("trance" -> 0.0625, "house" -> 0.125, "ambient" -> 0.8125),
        0.8125, "ambient"),
      version2))

  private lazy val meta = df(metaRowSchema,
    Row(U1, 0, Row(
      Row(195.5, false),
      Map("album" -> Seq("Journey"), "title" -> Seq("Nascence")),
      Row(version1, Row("2.1-beta1")))),
    // U2: meta row, NO model rows — dumps with an empty highlevel object
    Row(U2, 3, Row(
      Row(60.5, true),
      Map.empty[String, Seq[String]],
      Row(version2, Row("2.1-beta2")))))

  private val v1Json =
    """{"essentia":"2.1-beta1","essentia_build_sha":"8e24b98b",""" +
    """"essentia_git_sha":"v2.1_beta1-228","extractor":"music 1.0",""" +
    """"gaia":"2.4-dev","gaia_git_sha":"857329b",""" +
    """"models_essentia_git_sha":"v2.1_beta1"}"""
  private val v2Json =
    """{"essentia":"2.1-beta2","essentia_build_sha":"9f35c00c",""" +
    """"essentia_git_sha":"v2.1_beta2-001","extractor":"music 1.0",""" +
    """"gaia":"2.4-dev","gaia_git_sha":"857329b",""" +
    """"models_essentia_git_sha":"v2.1_beta2"}"""

  test("reassembled documents match the golden bytes") {
    val out = HighLevel.assembleDocs(models, meta, metaSchema)
      .orderBy("gid")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4)))

    // document 1: three models — sorted model keys, sorted `all` keys,
    // version injected per model, "highlevel" before "metadata"
    val expect1 =
      """{"highlevel":{""" +
      """"danceability":{"all":{"danceable":0.03125,""" +
      """"not_danceable":0.96875},"probability":0.96875,""" +
      s""""value":"not_danceable","version":$v1Json},""" +
      """"gender":{"all":{"female":0.625,"male":0.375},""" +
      s""""probability":0.625,"value":"female","version":$v1Json},""" +
      """"genre_electronic":{"all":{"ambient":0.8125,"house":0.125,""" +
      """"trance":0.0625},"probability":0.8125,"value":"ambient",""" +
      s""""version":$v2Json}},""" +
      """"metadata":{"audio_properties":{"length":195.5,""" +
      """"lossless":false},"tags":{"album":["Journey"],""" +
      """"title":["Nascence"]},"version":{"highlevel":""" +
      s"""$v1Json,"lowlevel":{"essentia":"2.1-beta1"}}}}"""
    // document 2: no model rows → empty highlevel object, offset 3 in name
    val expect2 =
      """{"highlevel":{},"metadata":{"audio_properties":{"length":60.5,""" +
      """"lossless":true},"tags":{},"version":{"highlevel":""" +
      s"""$v2Json,"lowlevel":{"essentia":"2.1-beta2"}}}}"""

    assert(out === Array(
      (U1, 0, s"$U1-0.json", s"highlevel/0d/a/$U1-0.json", expect1),
      (U2, 3, s"$U2-3.json", s"highlevel/e8/a/$U2-3.json", expect2)))
  }

  test("per-recording collapse is one aggregation keyed on the recording") {
    val q = HighLevel.assembleDocs(models, meta, metaSchema)
    q.collect()
    val agg = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ObjectHashAggregate")).toSeq
    assert(agg.nonEmpty, "expected the map-collect aggregate in the plan")
    assert(agg.exists(l => l.contains("gid") &&
      l.contains("submission_offset")),
      s"the model collapse must key on (gid, submission_offset):\n$agg")
  }
}

package graft

import graft.api.{BulkParams, Features, Responses}
import graft.api.BulkParams.Parsed
import graft.ingest.EssentiaSchema
import org.apache.spark.sql.functions._

/** Golden end-to-end bulk feature read (SURVEY §7.2 milestone 3 / §3.1):
  * fixture Essentia documents → request parse (P7) → key-set lookup (P2) →
  * 19-feature projection with defaults (P1, core.py:26-51) → response
  * nesting + mbid_mapping (db/data.py:695-752, core.py:335-347). The
  * response JSON is asserted byte-for-byte. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val U1 = "0dad432b-16cc-4bf0-8961-fd31d124b01b"
  private val U2 = "e8afe383-1478-497e-90b1-7885c7f37f6e"

  // golden-shaped fixture documents (FIXTURES.md §1; values chosen exactly
  // binary-representable so JSON rendering is byte-stable)
  private val docA =
    s"""{"metadata":{"version":{"essentia":"2.1-beta2","essentia_build_sha":"b1",
       |"essentia_git_sha":"g1","extractor":"music 1.0"},
       |"audio_properties":{"analysis_sample_rate":44100,"bit_rate":320000,
       |"codec":"mp3","length":195.5,"lossless":false,"md5_encoded":"m1",
       |"replay_gain":-9.5,"sample_rate":44100},
       |"tags":{"album":["Journey"],"file_name":["01.mp3"],
       |"musicbrainz_recordingid":["$U1"]}},
       |"lowlevel":{"average_loudness":0.5,"dynamic_complexity":6.25},
       |"rhythm":{"beats_count":410,"beats_loudness":{"mean":0.25},
       |"bpm":128.5,"bpm_histogram_first_peak_bpm":{"mean":128.0},
       |"bpm_histogram_second_peak_bpm":{"mean":133.0},
       |"danceability":1.25,"onset_rate":3.5},
       |"tonal":{"chords_changes_rate":0.0625,"chords_key":"F#",
       |"chords_scale":"minor","key_key":"F#","key_scale":"minor",
       |"key_strength":0.75,"tuning_equal_tempered_deviation":0.125,
       |"tuning_frequency":440.5}}""".stripMargin.replace("\n", "")

  // doc B exercises the default/falsy paths: tags absent → {},
  // average_loudness 0.0 and chords_changes_rate 0.0 → falsy → null,
  // chords_key "" → null, several features absent → null
  private val docB =
    """{"metadata":{"version":{"essentia":"2.1-beta2","essentia_build_sha":"b2",
      |"essentia_git_sha":"g2","extractor":"music 1.0"},
      |"audio_properties":{"analysis_sample_rate":48000,"bit_rate":1411000,
      |"codec":"flac","length":60.5,"lossless":true,"md5_encoded":"m2",
      |"sample_rate":48000}},
      |"lowlevel":{"average_loudness":0.0,"dynamic_complexity":4.5},
      |"rhythm":{"beats_count":200,"bpm":95.5,"danceability":0.75,
      |"onset_rate":2.5},
      |"tonal":{"chords_changes_rate":0.0,"chords_key":"",
      |"chords_scale":"major","key_key":"C","key_scale":"major",
      |"tuning_frequency":440.0}}""".stripMargin.replace("\n", "")

  private lazy val store = Seq((U1, 0, docA), (U2, 0, docB))
    .toDF("gid", "submission_offset", "raw")
    .select($"gid", $"submission_offset",
      from_json($"raw", EssentiaSchema.document).as("doc"))

  test("bulk read matches the golden response byte-for-byte") {
    // request: one non-normalized mbid (exercises mbid_mapping) + the full
    // feature list plus one unknown alias (silently dropped, core.py:434)
    val Parsed(items) = BulkParams.parse(s"${U1.toUpperCase};$U2")
    val keys = items.map(i => (i.mbid, i.offset))
      .toDF("gid", "submission_offset")
    val features = Features.parseFeatureParam(
      (Features.availableFeatures :+ "lowlevel.not_a_feature").mkString(";")).get
    // a falsy features param means NO projection (full document), not a
    // two-section stub — core.py:430-432 returns None
    assert(Features.parseFeatureParam("").isEmpty)
    val selected = store
      .join(broadcast(keys), Seq("gid", "submission_offset"), "left_semi")
      .select($"gid", $"submission_offset",
        Features.projectDoc($"doc", features).as("fdoc"))
    val out = Responses.bulkResponseWithMapping(selected, $"gid",
      $"submission_offset", $"fdoc", BulkParams.mbidMapping(items))
      .collect()(0).getString(0)

    val expectA =
      """{"lowlevel":{"average_loudness":0.5,"dynamic_complexity":6.25},""" +
      """"metadata":{"audio_properties":{"analysis_sample_rate":44100,""" +
      """"bit_rate":320000,"codec":"mp3","length":195.5,"lossless":false,""" +
      """"md5_encoded":"m1","replay_gain":-9.5,"sample_rate":44100},""" +
      s""""tags":{"album":["Journey"],"file_name":["01.mp3"],""" +
      s""""musicbrainz_recordingid":["$U1"]},""" +
      """"version":{"essentia":"2.1-beta2","essentia_build_sha":"b1",""" +
      """"essentia_git_sha":"g1","extractor":"music 1.0"}},""" +
      """"rhythm":{"beats_count":410,"beats_loudness":{"mean":0.25},""" +
      """"bpm":128.5,"bpm_histogram_first_peak_bpm":{"mean":128.0},""" +
      """"bpm_histogram_second_peak_bpm":{"mean":133.0},""" +
      """"danceability":1.25,"onset_rate":3.5},""" +
      """"tonal":{"chords_changes_rate":0.0625,"chords_key":"F#",""" +
      """"chords_scale":"minor","key_key":"F#","key_scale":"minor",""" +
      """"key_strength":0.75,"tuning_equal_tempered_deviation":0.125,""" +
      """"tuning_frequency":440.5}}"""
    val expectB =
      """{"lowlevel":{"average_loudness":null,"dynamic_complexity":4.5},""" +
      """"metadata":{"audio_properties":{"analysis_sample_rate":48000,""" +
      """"bit_rate":1411000,"codec":"flac","length":60.5,"lossless":true,""" +
      """"md5_encoded":"m2","replay_gain":null,"sample_rate":48000},""" +
      """"tags":{},""" +
      """"version":{"essentia":"2.1-beta2","essentia_build_sha":"b2",""" +
      """"essentia_git_sha":"g2","extractor":"music 1.0"}},""" +
      """"rhythm":{"beats_count":200,"beats_loudness":{"mean":null},""" +
      """"bpm":95.5,"bpm_histogram_first_peak_bpm":{"mean":null},""" +
      """"bpm_histogram_second_peak_bpm":{"mean":null},""" +
      """"danceability":0.75,"onset_rate":2.5},""" +
      """"tonal":{"chords_changes_rate":null,"chords_key":null,""" +
      """"chords_scale":"major","key_key":"C","key_scale":"major",""" +
      """"key_strength":null,"tuning_equal_tempered_deviation":null,""" +
      """"tuning_frequency":440.0}}"""
    val expected =
      s"""{"$U1":{"0":$expectA},"$U2":{"0":$expectB},""" +
      s""""mbid_mapping":{"${U1.toUpperCase}":"$U1"}}"""
    assert(out == expected)
  }

  test("all-canonical request yields an empty mbid_mapping, still present") {
    val Parsed(items) = BulkParams.parse(U1)
    val keys = items.map(i => (i.mbid, i.offset))
      .toDF("gid", "submission_offset")
    val selected = store
      .join(broadcast(keys), Seq("gid", "submission_offset"), "left_semi")
      .select($"gid", $"submission_offset",
        Features.projectDoc($"doc",
          Features.parseFeatureParam("rhythm.bpm").get).as("fdoc"))
    val out = Responses.bulkResponseWithMapping(selected, $"gid",
      $"submission_offset", $"fdoc", BulkParams.mbidMapping(items))
      .collect()(0).getString(0)
    val expectedDoc =
      """{"metadata":{"audio_properties":{"analysis_sample_rate":44100,""" +
      """"bit_rate":320000,"codec":"mp3","length":195.5,"lossless":false,""" +
      """"md5_encoded":"m1","replay_gain":-9.5,"sample_rate":44100},""" +
      """"version":{"essentia":"2.1-beta2","essentia_build_sha":"b1",""" +
      """"essentia_git_sha":"g1","extractor":"music 1.0"}},""" +
      """"rhythm":{"bpm":128.5}}"""
    assert(out == s"""{"$U1":{"0":$expectedDoc},"mbid_mapping":{}}""")
  }

  test("nested projection prunes the scan to the selected feature paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft_features").toString
    store.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(Features.projectDoc(col("doc"),
        Features.parseFeatureParam("rhythm.bpm;tonal.key_key").get)
        .as("fdoc"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("barkbands"),
      s"scan must not read unselected lowlevel sections:\n$plan")
  }
}

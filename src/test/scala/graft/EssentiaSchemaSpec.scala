package graft

import graft.ingest.{EssentiaSchema, Ingest}
import org.apache.spark.sql.functions._

/** The reference's feature-document shape flowing through the typed schema
  * (FIXTURES.md §1): parse, dynamic tags, whitelist filter, canonical
  * hashing, nested projection. */
class EssentiaSchemaSpec extends SparkSpec {
  import spark.implicits._

  // a golden-shaped mini document (values abbreviated, shape faithful —
  // including a tag key WITH SPACES, which must stay a map key)
  private val doc =
    """{"metadata":{"version":{"essentia":"2.1-beta2","essentia_git_sha":"x",
      |"essentia_build_sha":"y","extractor":"music 1.0"},
      |"audio_properties":{"length":195.7,"bit_rate":320000,"codec":"mp3",
      |"lossless":false,"sample_rate":44100,"analysis_sample_rate":44100,
      |"md5_encoded":"abc"},
      |"tags":{"musicbrainz_recordingid":["0dad432b-16cc-4bf0-8961-fd31d124b01b"],
      |"musicbrainz album release country":["GB"],"File_Name":["t.mp3"],
      |"not_whitelisted_junk":["zzz"]}},
      |"lowlevel":{"average_loudness":0.93,"dynamic_complexity":4.2,
      |"mfcc":{"mean":[1,2,3,4,5,6,7,8,9,10,11,12,13]}},
      |"rhythm":{"bpm":128.3,"beats_count":410,"onset_rate":3.2,
      |"danceability":1.1,"beats_position":[0.5,0.97]},
      |"tonal":{"key_key":"F#","key_scale":"minor","key_strength":0.71,
      |"tuning_frequency":440.2,"chords_key":"F#","chords_scale":"minor",
      |"chords_changes_rate":0.05}}""".stripMargin.replace("\n", "")

  private lazy val parsed = Seq(doc).toDF("raw")
    .select(from_json($"raw", EssentiaSchema.document).as("doc"))

  test("golden-shaped document parses into the typed schema") {
    val r = parsed.select(
      $"doc.metadata.audio_properties.lossless",
      $"doc.rhythm.bpm",
      element_at($"doc.lowlevel.mfcc.mean", 13),
      element_at($"doc.metadata.tags"("musicbrainz album release country"), 1))
      .collect()(0)
    assert(!r.getBoolean(0) && r.getDouble(1) == 128.3 &&
      r.getDouble(2) == 13.0 && r.getString(3) == "GB")
  }

  test("tag whitelist filters the dynamic map case-insensitively (P3)") {
    val whitelist = typedLit(Seq("musicbrainz_recordingid", "file_name",
      "musicbrainz album release country"))
    val kept = parsed.select(map_filter($"doc.metadata.tags",
      (k, _) => array_contains(whitelist, lower(k))).as("tags"))
      .select(map_keys($"tags")).collect()(0).getSeq[String](0).toSet
    // File_Name is kept via lower(k) — the case-insensitivity under test
    assert(kept == Set("musicbrainz_recordingid", "File_Name",
      "musicbrainz album release country"))
  }

  test("schema-ordered to_json is canonical: content hash is key-order stable") {
    // required metadata fields present (S1 validation shape)
    val checks = EssentiaSchema.requiredPaths.take(5)
      .map(p => col(s"doc.$p").isNotNull)
    assert(parsed.select(checks.reduce(_ && _)).collect()(0).getBoolean(0))
    // EssentiaSchema sorts fields at every level, so to_json of the struct
    // is already the canonical form — hash must be invariant to the JSON
    // source's key order
    val shuffledSource = doc.replace(
      """"lowlevel":{"average_loudness":0.93,"dynamic_complexity":4.2,""",
      """"lowlevel":{"dynamic_complexity":4.2,"average_loudness":0.93,""")
    assert(shuffledSource != doc)
    val h = (s: String) => Seq(s).toDF("raw")
      .select(Ingest.contentHash(
        to_json(from_json($"raw", EssentiaSchema.document)))).collect()(0)
      .getString(0)
    assert(h(doc) == h(shuffledSource))
  }

  test("all 13 SANITY_CHECK_KEYS are enforced, map keys included") {
    // the spec doc's tags carry "File_Name" (capital) but not "file_name" —
    // the reference's _has_key walk is case-sensitive (db/data.py:114-125),
    // so the first missing key is the tags map key, reported in the
    // reference's SANITY_CHECK_KEYS order (before lowlevel/rhythm/tonal)
    val v = Ingest.validateChecks(parsed, EssentiaSchema.requiredChecks("doc"))
      .select("valid", "reject_reason").collect()(0)
    assert(!v.getBoolean(0) &&
      v.getString(1) == "missing:metadata.tags.file_name")
    // with the key present the document passes all 13 checks
    val fixed = Seq(doc.replace(""""File_Name":["t.mp3"]""",
      """"file_name":["t.mp3"]""")).toDF("raw")
      .select(from_json($"raw", EssentiaSchema.document).as("doc"))
    assert(Ingest.validateChecks(fixed, EssentiaSchema.requiredChecks("doc"))
      .select("valid").collect()(0).getBoolean(0))
  }

  test("nested projection prunes the parquet read schema to selected paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft_essentia").toString
    parsed.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select($"doc.rhythm.bpm", $"doc.tonal.key_key")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("mfcc"), s"scan should not read lowlevel.mfcc:\n$plan")
  }
}

package graft.ingest

import org.apache.spark.sql.types._

/** The typed Spark schema of the reference's low-level Essentia feature
  * document (FIXTURES.md §1; reference golden example
  * db/test_data/0dad432b-16cc-4bf0-8961-fd31d124b01b.json, required keys
  * enforced at db/data.py:20-34).
  *
  * Design decisions (SURVEY §1.4):
  * - The stable skeleton is a typed StructType — Catalyst nested-schema
  *   pruning then gives the reference's hand-rolled JSONB path projection
  *   (P1) for free on Parquet.
  * - `metadata.tags` stays a MapType (dynamic keys, including keys with
  *   spaces like "musicbrainz album release country") — a struct would
  *   freeze the key set the reference explicitly leaves open.
  * - Field names are SORTED at every level so `to_json` on a value of this
  *   schema is already canonical (Ingest.canonicalJson semantics) — hash
  *   parity with the reference's json.dumps(sort_keys=True) falls out of
  *   the schema itself for the skeleton.
  * - Fixed-dimension vectors (mfcc 13, barkbands 27, …) are plain
  *   ArrayType(DoubleType): dimensionality is validated at ingest, not in
  *   the type (parquet has no fixed-size arrays).
  */
object EssentiaSchema {

  /** {mean, median, min, max, var, dmean, dmean2, dvar, dvar2} of T. */
  def stats(of: DataType): StructType = StructType(Seq(
    StructField("dmean", of), StructField("dmean2", of),
    StructField("dvar", of), StructField("dvar2", of),
    StructField("max", of), StructField("mean", of),
    StructField("median", of), StructField("min", of),
    StructField("var", of)))

  val doubleArray: ArrayType = ArrayType(DoubleType, containsNull = false)

  val audioProperties: StructType = StructType(Seq(
    StructField("analysis_sample_rate", IntegerType),
    StructField("bit_rate", IntegerType),
    StructField("codec", StringType),
    StructField("length", DoubleType),
    StructField("lossless", BooleanType),
    StructField("md5_encoded", StringType),
    StructField("replay_gain", DoubleType),
    StructField("sample_rate", IntegerType)))

  val metadata: StructType = StructType(Seq(
    StructField("audio_properties", audioProperties),
    StructField("tags", MapType(StringType, ArrayType(StringType))),
    StructField("version", StructType(Seq(
      StructField("essentia", StringType),
      StructField("essentia_build_sha", StringType),
      StructField("essentia_git_sha", StringType),
      StructField("extractor", StringType))))))

  val lowlevel: StructType = StructType(Seq(
    StructField("average_loudness", DoubleType),
    StructField("barkbands", stats(doubleArray)),          // 27 dims
    StructField("dissonance", stats(DoubleType)),
    StructField("dynamic_complexity", DoubleType),
    StructField("erbbands", stats(doubleArray)),           // 40 dims
    StructField("gfcc", StructType(Seq(
      StructField("mean", doubleArray)))),                 // 13 dims
    StructField("melbands", stats(doubleArray)),           // 40 dims
    StructField("mfcc", StructType(Seq(
      StructField("cov", ArrayType(doubleArray)),          // 13×13
      StructField("icov", ArrayType(doubleArray)),
      StructField("mean", doubleArray)))),                 // 13 dims
    StructField("spectral_centroid", stats(DoubleType)),
    StructField("spectral_contrast_coeffs", stats(doubleArray)), // 6 dims
    StructField("zerocrossingrate", stats(DoubleType))))

  val rhythm: StructType = StructType(Seq(
    StructField("beats_count", IntegerType),
    StructField("beats_loudness", stats(DoubleType)),
    StructField("beats_position", doubleArray),            // variable length
    StructField("bpm", DoubleType),
    StructField("bpm_histogram_first_peak_bpm", stats(DoubleType)),
    StructField("bpm_histogram_second_peak_bpm", stats(DoubleType)),
    StructField("danceability", DoubleType),
    StructField("onset_rate", DoubleType)))

  val tonal: StructType = StructType(Seq(
    StructField("chords_changes_rate", DoubleType),
    StructField("chords_histogram", doubleArray),          // 24 dims
    StructField("chords_key", StringType),
    StructField("chords_scale", StringType),
    StructField("hpcp", stats(doubleArray)),               // 36 dims
    StructField("key_key", StringType),
    StructField("key_scale", StringType),
    StructField("key_strength", DoubleType),
    StructField("thpcp", doubleArray),                     // 36 dims
    StructField("tuning_equal_tempered_deviation", DoubleType),
    StructField("tuning_frequency", DoubleType)))

  /** The full document (top-level sections sorted, like every level). */
  val document: StructType = StructType(Seq(
    StructField("lowlevel", lowlevel),
    StructField("metadata", metadata),
    StructField("rhythm", rhythm),
    StructField("tonal", tonal)))

  /** Struct-field required paths from the reference's 13 SANITY_CHECK_KEYS
    * (db/data.py:20-34), in reference order. The two `metadata.tags.*` keys
    * are MAP keys — dotted col() paths can't address them — and live in
    * [[requiredTagKeys]]; [[requiredChecks]] interleaves both sets back
    * into the reference's check order. */
  val requiredPaths: Seq[String] = Seq(
    "metadata.version.essentia", "metadata.version.essentia_git_sha",
    "metadata.version.extractor", "metadata.version.essentia_build_sha",
    "metadata.audio_properties.length", "metadata.audio_properties.bit_rate",
    "metadata.audio_properties.codec", "metadata.audio_properties.lossless",
    "lowlevel", "rhythm", "tonal")

  /** Required keys of the dynamic `metadata.tags` map (db/data.py:28-29). */
  val requiredTagKeys: Seq[String] = Seq("file_name", "musicbrainz_recordingid")

  /** All 13 sanity checks as (path, column) pairs over a document struct
    * column rooted at `prefix`, in the reference's SANITY_CHECK_KEYS order
    * (tag keys between audio_properties and the lowlevel section) so the
    * first-missing-key reject reason matches db/data.py:114-125. */
  def requiredChecks(prefix: String)
      : Seq[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions.{col, element_at}
    val (front, back) = requiredPaths.splitAt(8)
    front.map(p => p -> col(s"$prefix.$p")) ++
      requiredTagKeys.map(k => s"metadata.tags.$k" ->
        element_at(col(s"$prefix.metadata.tags"), k)) ++
      back.map(p => p -> col(s"$prefix.$p"))
  }

  /** Fixed dimensionalities validated at ingest (not expressible in the
    * parquet type system). */
  val vectorDims: Map[String, Int] = Map(
    "lowlevel.barkbands" -> 27, "lowlevel.erbbands" -> 40,
    "lowlevel.melbands" -> 40, "lowlevel.mfcc.mean" -> 13,
    "lowlevel.gfcc.mean" -> 13, "lowlevel.spectral_contrast_coeffs" -> 6,
    "tonal.chords_histogram" -> 24, "tonal.hpcp" -> 36, "tonal.thpcp" -> 36)
}

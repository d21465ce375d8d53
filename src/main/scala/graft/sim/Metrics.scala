package graft.sim

import graft.functions.VectorFunctions.expWeighted
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 12 similarity metric-vector transforms
  * (similarity/metrics.py:28-259) as Catalyst column expressions over the
  * typed document schema (graft.ingest.EssentiaSchema) and a high-level
  * classifier map column.
  *
  * One wide `select` of these columns is the whole N1 vector ETL
  * (db/similarity.py:301-377): per-row expression work, no shuffle, and
  * nested-schema pruning reads only the few document paths each metric
  * touches. Population means/stddevs for the normalized metrics come from
  * the A6/N2 aggregate (SimilarityPack.dimStats), broadcast back as plain
  * literals.
  */
object Metrics {

  /** Circle of fifths (metrics.py:97-100). */
  val KeysCircle: Seq[String] =
    Seq("C", "G", "D", "A", "E", "B", "F#", "C#", "G#", "D#", "A#", "F")
  val KeysMap: Map[String, Double] =
    KeysCircle.zipWithIndex.map { case (k, i) => k -> i / 12.0 }.toMap
  val ScalesMap: Map[String, Double] =
    Map("major" -> 0.0, "minor" -> -3.0 / 12)

  /** Wrap a [0,1)-ish value around the circle: [cos 2πv, sin 2πv]
    * (CircularMetric, metrics.py:88-95). */
  def circular(value: Column): Column = {
    val angle = value * (2 * math.Pi)
    // NULL input (unknown key/scale, missing bpm) must yield a NULL VECTOR,
    // not array(null, null) — callers' zero-fill guard keys on vector
    // nullness (db/similarity.py:335-338)
    when(value.isNotNull, array(cos(angle), sin(angle)))
  }

  /** log2 then circular (LogCircularMetric, metrics.py:119-124) — bpm and
    * onset rate live on a log-frequency circle so 60 and 120 bpm align. */
  def logCircular(value: Column): Column = circular(log2(value))

  /** Key/scale metric (KeyMetric, metrics.py:103-116): circle-of-fifths
    * position plus a -3/12 offset for minor, circular-encoded. Unknown
    * key/scale → NULL vector (the reference raises; callers zero-fill,
    * db/similarity.py:335-338). */
  def keyMetric(keyKey: Column, keyScale: Column): Column =
    circular(element_at(typedLit(KeysMap), keyKey) +
      element_at(typedLit(ScalesMap), keyScale))

  /** Population-normalize (NormalizedLowLevelMetric, metrics.py:33-45):
    * (x − mean) / std per dimension — UNLESS every stddev is zero, in which
    * case the data passes through untouched (the reference's all-or-nothing
    * guard, metrics.py:41-45). A SINGLE zero stddev among nonzero ones also
    * passes that dimension through raw (the n1 query's per-dim guard):
    * numpy would emit inf there, but Spark's non-ANSI divide yields NULL,
    * which would silently NULL every downstream dot product — the raw value
    * is the engine-stable choice, pinned by the n1 oracle. */
  def normalized(vec: Column, means: Seq[Double], stds: Seq[Double]): Column =
    if (stds.forall(_ == 0.0)) vec
    else zip_with(vec,
      typedLit(means.zip(stds)),
      (x, ms) => when(ms.getField("_2") === 0.0, x)
        .otherwise((x - ms.getField("_1")) / ms.getField("_2")))

  /** Exponential 0.95^i weighting on top of normalization
    * (WeightedNormalizedLowLevelMetric, metrics.py:47-57). */
  def weightedNormalized(vec: Column, means: Seq[Double],
      stds: Seq[Double]): Column =
    expWeighted(normalized(vec, means, stds), 0.95)

  /** moods / instruments (BinaryCollectiveMetric, metrics.py:151-198):
    * per (model, class) pair take P(class); absent model → 0. */
  def binaryCollective(hl: Column, models: Seq[(String, String)]): Column =
    array(models.map { case (model, cls) =>
      coalesce(element_at(element_at(hl, model).getField("all"), cls),
        lit(0.0))
    }: _*)

  /** Single-classifier probability vector (SingleClassifierMetric,
    * metrics.py:200-217): all class probabilities ordered by SORTED class
    * name (the reference's dictionary-order guard); absent model → zero
    * vector of the model's arity. A PRESENT model with the wrong number of
    * classes (partial classifier output) also zero-fills: the reference's
    * per-class indexing raises there and the caller zero-fills
    * (db/similarity.py:335-338); emitting a short vector instead would mix
    * arities in one column and NULL-pad downstream zip_with math. */
  def singleClassifier(hl: Column, model: String, arity: Int): Column = {
    val all = element_at(hl, model).getField("all")
    when(element_at(hl, model).isNotNull && size(map_entries(all)) === arity,
      transform(array_sort(map_entries(all)), e => e.getField("value")))
      .otherwise(array_repeat(lit(0.0), arity))
  }

  val MoodsModels: Seq[(String, String)] = Seq(
    "mood_happy" -> "happy", "mood_sad" -> "sad",
    "mood_aggressive" -> "aggressive", "mood_relaxed" -> "relaxed",
    "mood_party" -> "party")
  val InstrumentsModels: Seq[(String, String)] = Seq(
    "mood_acoustic" -> "acoustic", "mood_electronic" -> "electronic",
    "voice_instrumental" -> "instrumental")

  /** All 12 metric columns (BASE_METRICS, metrics.py:241-259) over a
    * document struct column `doc` and a high-level map column `hl`
    * (map<model, struct<all: map<class, double>>>). `stats` supplies
    * (means, stds) per normalized metric name. */
  def metricVectors(doc: Column, hl: Column,
      stats: Map[String, (Seq[Double], Seq[Double])]): Map[String, Column] = {
    val mfcc = doc.getField("lowlevel").getField("mfcc").getField("mean")
    val gfcc = doc.getField("lowlevel").getField("gfcc").getField("mean")
    def st(name: String) = stats.getOrElse(name,
      (Seq.fill(13)(0.0), Seq.fill(13)(0.0)))
    Map(
      "mfccs" -> normalized(mfcc, st("mfccs")._1, st("mfccs")._2),
      "mfccsw" -> weightedNormalized(mfcc, st("mfccsw")._1, st("mfccsw")._2),
      "gfccs" -> normalized(gfcc, st("gfccs")._1, st("gfccs")._2),
      "gfccsw" -> weightedNormalized(gfcc, st("gfccsw")._1, st("gfccsw")._2),
      "key" -> keyMetric(doc.getField("tonal").getField("key_key"),
        doc.getField("tonal").getField("key_scale")),
      "bpm" -> logCircular(doc.getField("rhythm").getField("bpm")),
      "onsetrate" -> logCircular(doc.getField("rhythm").getField("onset_rate")),
      "moods" -> binaryCollective(hl, MoodsModels),
      "instruments" -> binaryCollective(hl, InstrumentsModels),
      "dortmund" -> singleClassifier(hl, "genre_dortmund", 9),
      "rosamerica" -> singleClassifier(hl, "genre_rosamerica", 8),
      "tzanetakis" -> singleClassifier(hl, "genre_tzanetakis", 10))
  }
}

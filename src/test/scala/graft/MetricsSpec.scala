package graft

import graft.ingest.EssentiaSchema
import graft.sim.Metrics
import org.apache.spark.sql.functions._

/** The 12 metric-vector transforms against hand-computed expectations
  * (reference: similarity/metrics.py; fixture values chosen so every
  * branch — minor-scale offset, log circle, absent model, sorted class
  * order, zero-std passthrough — is exercised). */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """{"metadata":{"tags":{}},
      |"lowlevel":{"mfcc":{"mean":[1,2,3,4,5,6,7,8,9,10,11,12,13]},
      |"gfcc":{"mean":[2,2,2,2,2,2,2,2,2,2,2,2,2]}},
      |"rhythm":{"bpm":128.0,"onset_rate":4.0},
      |"tonal":{"key_key":"F#","key_scale":"minor"}}""".stripMargin
      .replace("\n", "")

  private val hlJson =
    """{"mood_happy":{"all":{"happy":0.8,"not_happy":0.2}},
      |"mood_sad":{"all":{"not_sad":0.9,"sad":0.1}},
      |"genre_rosamerica":{"all":{"roc":0.03,"dan":0.2,"cla":0.5,"jaz":0.05,
      |"pop":0.05,"rhy":0.04,"hip":0.1,"spe":0.03}}}""".stripMargin
      .replace("\n", "")

  private val hlType = "map<string, struct<all: map<string, double>>>"

  private lazy val row = {
    val stats = Map(
      "mfccs" -> (Seq.fill(13)(1.0), Seq.fill(13)(2.0)),
      "mfccsw" -> (Seq.fill(13)(1.0), Seq.fill(13)(2.0)))
    val base = Seq((doc, hlJson)).toDF("raw", "hlraw")
      .select(from_json($"raw", EssentiaSchema.document).as("doc"),
        from_json($"hlraw", org.apache.spark.sql.types.DataType
          .fromDDL(hlType)).as("hl"))
    val cols = Metrics.metricVectors($"doc", $"hl", stats)
    base.select(cols.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
  }

  private def vec(name: String): Seq[Double] = {
    val names = Metrics.metricVectors(lit(null), lit(null), Map.empty)
      .keySet.toSeq.sorted
    row.getSeq[Double](names.indexOf(name))
  }

  test("key: F# minor sits at 0.5 - 0.25 on the circle -> [cos, sin] = [0, 1]") {
    val k = vec("key")
    assert(math.abs(k(0) - math.cos(math.Pi / 2)) < 1e-12)
    assert(math.abs(k(1) - 1.0) < 1e-12)
  }

  test("bpm/onsetrate: log2 circle — 128 bpm = integer point [1, 0]") {
    val b = vec("bpm") // log2(128) = 7 -> angle 14π -> [1, 0]
    assert(math.abs(b(0) - 1.0) < 1e-9 && math.abs(b(1)) < 1e-9)
    val o = vec("onsetrate") // log2(4) = 2 -> [1, 0]
    assert(math.abs(o(0) - 1.0) < 1e-9 && math.abs(o(1)) < 1e-9)
  }

  test("mfccs normalize by population stats; mfccsw adds 0.95^i weights") {
    val m = vec("mfccs") // (i+1 - 1) / 2
    assert(m.zipWithIndex.forall { case (v, i) => math.abs(v - i / 2.0) < 1e-12 })
    val w = vec("mfccsw")
    assert(w.zipWithIndex.forall { case (v, i) =>
      math.abs(v - (i / 2.0) * math.pow(0.95, i)) < 1e-12 })
  }

  test("zero-std stats pass data through untouched (reference guard)") {
    val g = vec("gfccs") // no stats provided -> all-zero stds -> passthrough
    assert(g == Seq.fill(13)(2.0))
  }

  test("moods: P(class) per model, absent model -> 0") {
    assert(vec("moods") == Seq(0.8, 0.1, 0.0, 0.0, 0.0))
    assert(vec("instruments") == Seq(0.0, 0.0, 0.0))
  }

  test("unknown key/scale yields a NULL vector (not array of nulls)") {
    val r = Seq(("H", "dorian")).toDF("k", "s")
      .select(Metrics.keyMetric($"k", $"s").as("v"),
        Metrics.logCircular(lit(null).cast("double")).as("b"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("single classifier: sorted class order; absent model -> zero vector") {
    val r = vec("rosamerica")
    assert(r == Seq(0.5, 0.2, 0.1, 0.05, 0.05, 0.04, 0.03, 0.03))
    assert(vec("dortmund") == Seq.fill(9)(0.0))
    assert(vec("tzanetakis") == Seq.fill(10)(0.0))
  }
}

package graft.api

/** Similarity-query parameter validation (reference `_check_index_params`,
  * webserver/views/api/v1/similarity.py:70-111): unknown metric is the only
  * hard reject; everything else silently defaults or clamps —
  *
  *  - distance type: anything but a known type for the metric → "angular";
  *  - n_trees: the reference compares the request STRING against the
  *    index's integer tree counts, so any user-supplied value falls back
  *    to 10 (similarity.py:84-86 — faithfully mirrored);
  *  - n_neighbours: int() parse, clamp [1, 1000], parse failure → 200
  *    (unbounded Python int, so huge values clamp rather than wrap);
  *  - threshold: float() parse, clamp [0.0, 1.0] (NOT the angular-distance
  *    range [0, 2]); empty or unparseable → None (no filtering);
  *  - remove_dups: lower-cased membership in {all, samescore, none},
  *    default "none" (the W7 dedup modes, `w7_dedup_*`).
  */
object IndexParams {

  /** The 12 metrics with base indices (similarity/index_model.py:254-267 /
    * metrics.py:240-259). */
  val BaseMetrics: Set[String] = Set(
    "mfccs", "mfccsw", "gfccs", "gfccsw", "key", "bpm", "onsetrate",
    "moods", "instruments", "dortmund", "rosamerica", "tzanetakis")

  val DefaultNeighbours = 200
  val MaxNeighbours = 1000

  final case class Params(
    metric: String,
    distanceType: String,
    nTrees: Int,
    nNeighbours: Int,
    threshold: Option[Double],
    removeDups: String)

  /** Reference threshold clamp (similarity.py:96-100). */
  def clampThreshold(t: Double): Double = math.min(1.0, math.max(0.0, t))

  /** Mirrors `_check_index_params`; `Left` only for an unknown metric. */
  def check(
      metric: String,
      distanceType: Option[String] = None,
      nTrees: Option[String] = None,
      nNeighbours: Option[String] = None,
      threshold: Option[String] = None,
      removeDups: Option[String] = None): Either[String, Params] =
    if (!BaseMetrics.contains(metric))
      Left("An index with the specified metric does not exist.")
    else {
      val dt = distanceType.filter(_ == "angular").getOrElse("angular")
      // the reference's string-vs-int membership test can never match, so
      // every request gets the default forest size
      val nt = 10
      val nn = nNeighbours
        .flatMap(n => scala.util.Try(BigInt(n.trim)).toOption)
        .map(n => n.max(BigInt(1)).min(BigInt(MaxNeighbours)).toInt)
        .getOrElse(DefaultNeighbours)
      val th = threshold.filter(_.nonEmpty).flatMap(_.toDoubleOption)
        .map(clampThreshold)
      val rd = removeDups.map(_.toLowerCase)
        .filter(Set("all", "samescore", "none").contains)
        .getOrElse("none")
      Right(Params(metric, dt, nt, nn, th, rd))
    }
}

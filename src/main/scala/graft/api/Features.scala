package graft.api

import graft.ingest.EssentiaSchema
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Selective feature projection of a low-level document (reference P1:
  * `webserver/views/api/v1/core.py:26-51` AVAILABLE_FEATURES +
  * `_parse_individual_features` core.py:405-450 + `parse_features_row`
  * db/data.py:695-752).
  *
  * Semantics mirrored from the reference:
  *  - only the 19 whitelisted aliases are selectable; unknown aliases in the
  *    request are silently dropped;
  *  - `metadata.version` and `metadata.audio_properties` are always
  *    appended, and the list is deduped preserving order;
  *  - a feature that is absent — or FALSY in the Python sense (`row[alias]`
  *    truth test: 0, 0.0, "", {} all fail) — is replaced by its default
  *    (`None` → JSON null; `{}` → empty map for `metadata.tags`; for the
  *    always-on struct sections a missing struct stays null, a documented
  *    deviation from Python's `{}` since an empty struct of a typed schema
  *    is not expressible);
  *  - aliases re-nest into the document shape ({"rhythm": {"bpm": …}}).
  *
  * The projection is one nested `select` over the typed EssentiaSchema
  * struct, so Catalyst's nested-schema pruning pushes exactly the selected
  * leaf paths into the parquet scan — the engine-side equivalent of the
  * reference splicing JSONB paths into SELECT text (db/data.py:641-663). */
object Features {

  /** The selectable aliases (core.py:28-48), in reference declaration
    * order. `metadata.tags` is the only one whose default is `{}`. */
  val availableFeatures: Seq[String] = Seq(
    "lowlevel.average_loudness",
    "lowlevel.dynamic_complexity",
    "metadata.audio_properties.replay_gain",
    "metadata.tags",
    "rhythm.beats_count",
    "rhythm.beats_loudness.mean",
    "rhythm.bpm",
    "rhythm.bpm_histogram_first_peak_bpm.mean",
    "rhythm.bpm_histogram_second_peak_bpm.mean",
    "rhythm.danceability",
    "rhythm.onset_rate",
    "tonal.chords_key",
    "tonal.chords_scale",
    "tonal.chords_changes_rate",
    "tonal.key_key",
    "tonal.key_scale",
    "tonal.key_strength",
    "tonal.tuning_frequency",
    "tonal.tuning_equal_tempered_deviation")

  /** Aliases whose default is the empty map rather than null. */
  private val emptyMapDefaults = Set("metadata.tags")

  /** Parse the `features` request param (`;`-separated aliases): keep known
    * aliases, append the two always-on sections, dedup preserving order
    * (core.py:405-450). A FALSY (null/empty) param yields None — the
    * reference returns None there and the caller serves the FULL document
    * with no projection (core.py:430-432), not a two-section stub. */
  def parseFeatureParam(param: String): Option[Seq[String]] =
    if (param == null || param.isEmpty) None
    else Some((param.split(";").toSeq.filter(availableFeatures.contains) ++
      Seq("metadata.version", "metadata.audio_properties")).distinct)

  /** Resolve an alias to its DataType by walking [[EssentiaSchema.document]]
    * (the segment after `metadata.tags` would be a map key — none of the
    * available aliases goes below a map). */
  private def dataTypeOf(alias: String): DataType =
    alias.split('.').foldLeft(EssentiaSchema.document: DataType) {
      case (st: StructType, seg) => st(seg).dataType
      case (dt, seg) =>
        throw new IllegalArgumentException(s"can't descend into $dt at $seg")
    }

  /** The value column for one alias: the doc's leaf, with Python-truthiness
    * replacement by the alias default (db/data.py:745-749
    * `if alias in row.keys() and row[alias]`). */
  private def leafCol(doc: Column, alias: String): Column = {
    val dt = dataTypeOf(alias)
    val c = alias.split('.').foldLeft(doc)((a, seg) => a.getField(seg))
    val falsy: Column = dt match {
      case _: NumericType => c === lit(0)
      case StringType => c === lit("")
      case BooleanType => c === lit(false)
      case _: MapType | _: ArrayType => size(c) === 0
      case _ => lit(false) // structs: only nullness applies
    }
    val default: Column =
      if (emptyMapDefaults.contains(alias))
        typedLit(Map.empty[String, Seq[String]]).cast(dt) // typed empty map
      else lit(null).cast(dt)
    when(c.isNull || falsy, default).otherwise(c)
  }

  /** Alias paths → one nested struct column in document shape. Sibling
    * fields at every level are emitted in sorted-name order (the engine's
    * canonical-JSON convention, Ingest.canonicalJson), and a later alias
    * overwriting an earlier one at the same key follows the reference's
    * `dict.update` merge. */
  def projectDoc(doc: Column, features: Seq[String]): Column = {
    // insertion-ordered nested tree of the requested aliases
    sealed trait Node
    case class Leaf(alias: String) extends Node
    case class Branch(children: scala.collection.mutable.LinkedHashMap[String, Node])
      extends Node
    def newBranch() = Branch(scala.collection.mutable.LinkedHashMap.empty)
    val root = newBranch()
    features.foreach { alias =>
      val segs = alias.split('.')
      var cur = root
      segs.dropRight(1).foreach { seg =>
        cur = cur.children.getOrElseUpdate(seg, newBranch()) match {
          case b: Branch => b
          case _: Leaf => // leaf shadowed by a deeper path: replace (update)
            val b = newBranch(); cur.children(seg) = b; b
        }
      }
      cur.children(segs.last) = Leaf(alias)
    }
    def render(n: Node): Column = n match {
      case Leaf(alias) => leafCol(doc, alias)
      case Branch(ch) =>
        struct(ch.toSeq.sortBy(_._1).map { case (name, c) =>
          render(c).as(name)
        }: _*)
    }
    render(root)
  }
}

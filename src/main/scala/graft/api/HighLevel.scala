package graft.api

import graft.ingest.Ingest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full high-level document reassembly (reference S8: `db/dump.py:699-841`
  * `dump_highlevel_json`) — the document-contract layer over the map-agg
  * shape that `s8_hl_reassembly` oracle-checks on the synthetic tables.
  *
  * Per recording, the reference joins the `highlevel_meta` row with the
  * per-model `highlevel_model` rows, injects each model's `version` row
  * into its output object (`model_data['version'] = version`,
  * dump.py:805-807), and serializes `{"highlevel": {model: data},
  * "metadata": meta}` with `ujson.dumps(hl_data, sort_keys=True)`
  * (dump.py:813-822) into a member named `{mbid}-{offset}.json` under the
  * fan-out path `highlevel/mbid[0:2]/mbid[2:3]/` (dump.py:824-827).
  *
  * Spark-first: the per-recording collapse is ONE map aggregation
  * (`map_from_entries(collect_list(...))` — a single shuffle on the
  * recording key, the same plan shape as `s8_hl_reassembly`), and the
  * whole document renders through [[Ingest.canonicalJson]], whose
  * recursive key-sort IS `sort_keys=True` — object fields, the model map
  * and every nested tag map all come out in sorted-key order with
  * compact separators, and model names are JSON-escaped for free. */
object HighLevel {

  /** One model's classifier output (`highlevel_model.data`): class
    * probability map + winning class (db/data.py:351-417 write side). */
  val modelData: StructType = StructType(Seq(
    StructField("all", MapType(StringType, DoubleType)),
    StructField("probability", DoubleType),
    StructField("value", StringType)))

  /** A model `version` row's payload (the extractor's version block —
    * hl_calc.py:110-152 builds it; see the reference fixture
    * `db/test_data/0dad432b-..._highlevel.json` metadata.version.highlevel
    * for the field set). */
  val versionSchema: StructType = StructType(Seq(
    StructField("essentia", StringType),
    StructField("essentia_build_sha", StringType),
    StructField("essentia_git_sha", StringType),
    StructField("extractor", StringType),
    StructField("gaia", StringType),
    StructField("gaia_git_sha", StringType),
    StructField("models_essentia_git_sha", StringType)))

  /** The dump object for one model: its data with the version row injected
    * alongside (`model_data['version'] = version`, dump.py:805-807). */
  private def modelObj(data: Column, version: Column): Column = struct(
    data.getField("all").as("all"),
    data.getField("probability").as("probability"),
    data.getField("value").as("value"),
    version.as("version"))

  private val modelObjSchema: StructType =
    StructType(modelData.fields :+ StructField("version", versionSchema))

  /** Reassemble one canonical-bytes JSON document per recording.
    *
    * @param models per-model rows: (gid, submission_offset, model,
    *               data: [[modelData]], version: [[versionSchema]])
    * @param meta   per-recording metadata rows: (gid, submission_offset,
    *               metadata: `metaSchema`)
    * @return (gid, submission_offset, doc_name, archive_path, doc) — `doc`
    *         is the `sort_keys=True` serialization; `doc_name`/
    *         `archive_path` follow the dump's `{mbid}-{offset}.json` and
    *         two-level mbid fan-out naming.
    */
  def assembleDocs(models: DataFrame, meta: DataFrame,
      metaSchema: StructType): DataFrame = {
    val keys = Seq("gid", "submission_offset")
    val hl = models
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(
        collect_list(struct(col("model").as("key"),
          modelObj(col("data"), col("version")).as("value"))))
        .as("highlevel"))
    val docSchema = StructType(Seq(
      StructField("highlevel", MapType(StringType, modelObjSchema)),
      StructField("metadata", metaSchema)))
    val docName = concat(col("gid"), lit("-"),
      col("submission_offset").cast(StringType), lit(".json"))
    // left join DRIVEN FROM meta, mirroring the reference's assembly loop
    // (it iterates `metadata.values()`, dump.py:813-818): a recording with
    // a meta row but no model rows dumps with an empty highlevel object
    // (defaultdict(dict) yields {}). DIVERGENCE NOTE: the reference FEEDS
    // that loop from the highlevel table LEFT JOINed to highlevel_meta
    // (dump.py:764-776), so a recording with model rows but no meta row is
    // dumped there with null metadata — here, if `meta` is sourced from the
    // meta table alone, such recordings are DROPPED. Callers wanting the
    // reference's exact surface must pass `meta` as the highlevel-driven
    // frame (models' keys left-joined to meta, null metadata allowed);
    // callers auditing orphans can anti-join models against meta first.
    meta.join(hl, keys, "left")
      .select(col("gid"), col("submission_offset"),
        docName.as("doc_name"),
        concat_ws("/", lit("highlevel"), substring(col("gid"), 1, 2),
          substring(col("gid"), 3, 1), docName).as("archive_path"),
        Ingest.canonicalJson(
          struct(
            coalesce(col("highlevel"),
              map_from_arrays(array().cast(ArrayType(StringType)),
                array().cast(ArrayType(modelObjSchema)))).as("highlevel"),
            col("metadata").as("metadata")),
          docSchema).as("doc"))
  }
}

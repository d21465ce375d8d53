package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's submission-write pipeline (reference §3.2:
  * db/data.py:138-288 — clean → validate → canonical-hash dedup → per-key
  * submission offset → duplicate cap → append) as one deterministic batch
  * plan over a generic (gid, payload, submitted) frame.
  *
  * The reference assigns offsets transactionally (MAX+1 per gid at insert);
  * in Spark the equivalent is a micro-batch recompute: a window over
  * union(existing, incoming) ordered by (submitted, tiebreak), which yields
  * the same dense per-key sequence without any coordination — each gid's
  * rows land in one shuffle partition, so this scales horizontally.
  */
object Ingest {

  val MaxDuplicateSubmissions = 10 // reference: config.py.example:59

  /** Canonical content hash of the payload column (reference F1/D1:
    * sha256 of canonical JSON, db/data.py:250-257). Callers pass a payload
    * column already in canonical form (e.g. [[canonicalJson]]). */
  def contentHash(payload: Column): Column = sha2(payload.cast(StringType), 256)

  /** Canonical JSON of a TYPED struct column: struct fields and map entries
    * sorted recursively by key, compact separators, Python-repr floats,
    * ensure_ascii escaping — byte-identical to the reference's
    * `json.dumps(data, sort_keys=True, separators=(',',':'))`
    * (db/data.py:250) for payloads the typed schema represents faithfully
    * (pinned by golden-hash tests incl. non-integral doubles; the earlier
    * to_json formulation's float-repr caveat is CLOSED by the native
    * graft.plans.CanonicalJson expression's shortest-round-trip
    * formatter). For RAW submitted documents — where a JSON literal's
    * int-vs-float identity must survive inside double-typed arrays — hash
    * [[canonicalJsonString]] instead.
    *
    * `schema` pins the serialized shape: the payload is realigned to it BY
    * FIELD NAME, recursively (a plain struct cast matches positionally and
    * renames to the target — a caller whose struct field order differs from
    * the schema would get silently wrong bytes, and wrong dedup hashes).
    * A schema narrower than the payload drops the extra payload fields (we
    * select only schema fields); a schema field the payload lacks fails
    * analysis loudly. */
  def canonicalJson(payload: Column, schema: StructType): Column =
    call_function("canonical_json", alignTo(payload, schema))

  /** Rebuild `c` in the field ORDER and types of `dt`, matching struct
    * fields by NAME at every nesting level (inside arrays and map values
    * too). Leaf casts are ordinary scalar casts. */
  private def alignTo(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      // preserve outer nullability: struct(...) of a null struct's fields
      // would otherwise fabricate a non-null all-null-fields row
      when(c.isNull, lit(null).cast(st)).otherwise(
        struct(st.fields.toIndexedSeq.map { f =>
          alignTo(c.getField(f.name), f.dataType).as(f.name) }: _*))
    case ArrayType(et, _) => transform(c, e => alignTo(e, et))
    case MapType(_, vt, _) => transform_values(c, (_, v) => alignTo(v, vt))
    case other => c.cast(other)
  }

  /** Canonical JSON of a RAW document string — byte-identical to Python's
    * `json.dumps(json.load(doc), sort_keys=True, separators=(',',':'))`
    * including per-literal int-vs-float identity (`[0, 0.53]` re-serializes
    * as `0` and `0.53`; a typed array column cannot represent that mix).
    * This is the exact submission-dedup hashing semantics of the reference
    * (db/data.py:250-257), golden-tested byte-for-byte against its real
    * test fixtures. */
  def canonicalJsonString(raw: Column): Column =
    call_function("canonical_json_str", raw)

  /** sha1 hex digest of a binary/string column (reference F2:
    * hl_extractor/hl_calc.py:161-169 — sha1 of the SVM models file used to
    * sanity-check the extractor profile). */
  def binarySha1(payload: Column): Column = sha1(payload)

  /** Validation: required fields present and well-formed. Returns the frame
    * with a `valid` flag plus a `reject_reason` (reference:
    * db/data.py:114-125 sanity_check_data). */
  def validate(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    validateChecks(df, requiredCols.map(c => c -> col(c)))

  /** As [[validate]], but with arbitrary check columns — needed for paths
    * the dotted col() syntax can't address (map keys like the reference's
    * `metadata.tags.file_name`; see EssentiaSchema.requiredChecks). The
    * reject reason is the FIRST failing check, like the reference's ordered
    * SANITY_CHECK_KEYS walk. */
  def validateChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val reason = checks.foldRight(lit(null).cast(StringType)) {
      case ((name, c), acc) => when(c.isNull, lit(s"missing:$name")).otherwise(acc)
    }
    df.withColumn("reject_reason", reason)
      .withColumn("valid", col("reject_reason").isNull)
  }

  /** Ingest a micro-batch: drop exact duplicates (within the batch and
    * against `existing`), assign dense per-gid submission offsets continuing
    * from the existing maximum, and enforce the duplicate cap.
    *
    * `incoming` needs columns (gid, payload, submitted); `existing` is a
    * previous output of this method — (gid, payload, submitted,
    * submission_offset) plus optionally content_hash (reused if present, so
    * an append-only store is NOT re-hashed every micro-batch). Output adds
    * (content_hash, submission_offset). All window orders carry the
    * content_hash tiebreak so equal-timestamp rows rank deterministically
    * across runs and task retries.
    */
  def ingestBatch(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val hashedIn = incoming
      .withColumn("content_hash", contentHash(col("payload")))
    val hashedEx =
      if (existing.columns.contains("content_hash")) existing
      else existing.withColumn("content_hash", contentHash(col("payload")))

    // D1: reject exact duplicates — batch-internal (keep earliest) then
    // against the stored table (left_anti on (gid, hash)).
    val batchW = Window.partitionBy(col("gid"), col("content_hash"))
      .orderBy(col("submitted"))
    val fresh = hashedIn
      .withColumn("rn", row_number().over(batchW))
      .filter(col("rn") === 1).drop("rn")
      .join(hashedEx.select("gid", "content_hash"),
        Seq("gid", "content_hash"), "left_anti")

    // W6: dense offsets continuing from existing MAX(submission_offset)+1.
    val baseOffsets = hashedEx.groupBy(col("gid"))
      .agg((max(col("submission_offset")) + 1).as("base"))
    val offsetW = Window.partitionBy(col("gid"))
      .orderBy(col("submitted"), col("content_hash"))
    fresh
      .join(baseOffsets, Seq("gid"), "left")
      .withColumn("submission_offset",
        coalesce(col("base"), lit(0L)) +
          row_number().over(offsetW).cast(LongType) - 1)
      .drop("base")
      // D2: duplicate-submission cap per gid
      .filter(col("submission_offset") < MaxDuplicateSubmissions)
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bulk dump / export / import operators (reference §2.1 S4–S11:
  * db/dump.py — TSV/CSV table dumps chunked at 500k rows/file, sharded
  * per-recording JSON dumps, dataset CSV import/export).
  *
  * Spark-first translation: the reference's hand-rolled COPY loops with
  * cursor batching (DUMP_CHUNK_SIZE=10k) become single distributed writes;
  * its ROWS_PER_FILE=500,000 chunking is `maxRecordsPerFile`; its
  * `<mbid-prefix>/` directory sharding (db/dump.py:619-628) is
  * `partitionBy` on derived prefix columns, which also gives partition
  * pruning on read-back. All writers are driver-light: no collect, no
  * per-row driver loops.
  */
object Dump {

  /** Reference ROWS_PER_FILE (db/dump.py:38). */
  val RowsPerFile = 500000

  /** S4/S11 — TSV table dump, chunked like the reference's 500k-row files.
    * Optional time-range slice (reference incremental dumps,
    * db/dump.py:321-333) should be applied by the caller as a filter so it
    * pushes down to the scan. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .option("maxRecordsPerFile", RowsPerFile)
      // reference dumps are zstd (db/dump.py:631); hadoop's zstd text codec
      // needs native libs absent here, so gzip locally — swap via config
      // where the cluster ships libzstd.
      .option("compression", "gzip")
      .csv(path)

  /** S5 — TSV import with an explicit schema (the reference checks the
    * schema version before COPY FROM; here the schema IS the contract). */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** S7 — sharded JSON dump: one JSON document per row, sharded into
    * directories by the first two / next one characters of the key, exactly
    * the reference's `<gid[0:2]>/<gid[2:3]>/` layout (db/dump.py:619-628).
    * `partitionBy` turns the shard dirs into partition-pruned paths. */
  def writeJsonSharded(df: DataFrame, keyCol: String, path: String): Unit =
    df.withColumn("shard1", substring(col(keyCol).cast("string"), 1, 2))
      .withColumn("shard2", substring(col(keyCol).cast("string"), 3, 1))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard1", "shard2")
      .option("maxRecordsPerFile", RowsPerFile)
      .json(path)

  /** Read-back of a sharded JSON dump (partition columns restored). The
    * schema is explicit, like [[readTsv]]: schema inference would scan every
    * JSON file once BEFORE the real read (doubling I/O on a dump with
    * millions of shard files) and can silently widen types so the
    * round-trip frame no longer matches what was written. */
  def readJsonSharded(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S9 — dataset CSV import: `<id>,<class>` rows plus optional
    * `description[:<class>],<text>` header rows, mirroring the reference's
    * conditional row parser (webserver/views/datasets.py:457-535). Returns
    * (kind, id, cls): kind = 'description' | 'class_description' | 'member'. */
  def parseDatasetCsv(lines: DataFrame, lineCol: String): DataFrame = {
    // simple unquoted grammar (the reference's rows are plain `<id>,<class>`;
    // quoted fields with embedded commas would need spark.read.csv).
    // Column API throughout — no expr() string splicing, so a column name
    // needing backticks can't break (or change) the parse.
    val line = col(lineCol)
    val c0 = trim(substring_index(line, ",", 1))
    val rest = when(instr(line, ",") === 0, lit(null))
      .otherwise(trim(line.substr(instr(line, ",") + 1, length(line))))
    lines.select(
      when(c0 === "description", lit("description"))
        .when(c0.startsWith("description:"), lit("class_description"))
        .otherwise(lit("member")).as("kind"),
      when(c0.startsWith("description:"),
          trim(c0.substr(lit(13), length(c0))))
        .when(c0 === "description", lit(null))
        .otherwise(c0).as("id"),
      rest.as("cls"))
  }

  /** S10 — dataset export: (class → members) rows flattened to annotation
    * CSV shape (reference webserver/views/datasets.py:132-268). */
  def datasetAnnotations(dataset: DataFrame): DataFrame =
    dataset.select(col("class"), explode(col("recordings")).as("recording_id"))
      .orderBy("class", "recording_id")
}

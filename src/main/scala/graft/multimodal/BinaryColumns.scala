package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed batch-wise inside executors.
  *
  * Real image/audio decoders aren't available in this environment, so
  * `decodeStub` is a clearly-marked deterministic fake — but the Spark-side
  * plumbing is real and what matters at 100 TB: the payload travels as a
  * `binary` column next to its metadata struct, decode runs per-partition
  * (one library init per task, like mapInPandas batches), partitioning is
  * explicit so oversized media rows can be spread (`repartition` before the
  * decode to bound per-task memory), and the output schema is fixed and
  * columnar again immediately after the opaque step.
  */
object BinaryColumns {

  /** Decoded-media metadata produced per payload. */
  case class MediaMeta(
    media_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Int,
    height: Int,
    n_frames: Int)

  /** Attach a binary payload column + basic byte-level metadata. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast(LongType))
      .withColumn("checksum", md5(col("payload")))

  /** Frame sampling over an opaque media payload: split the binary into
    * fixed-size chunks and keep every k-th (video frame-sample / audio
    * window-hop shape). Pure Catalyst — `substr` slices the binary column
    * per frame index, no UDF, no driver involvement; at 100 TB each row
    * explodes into its sampled frames inside the scan's task. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = ceil(col("n_bytes") / lit(frameBytes.toDouble)).cast(IntegerType)
    media.select(col("media_id"), col("payload"), col("n_bytes"))
      .withColumn("idx",
        when(col("n_bytes") > 0,
          sequence(lit(0), nFrames - 1, lit(everyK)))
          .otherwise(typedLit(Seq.empty[Int])))
      .select(col("media_id"),
        posexplode(transform(col("idx"), i =>
          col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("sample_pos", "frame")))
      .withColumn("frame_bytes", octet_length(col("frame")).cast(LongType))
  }

  /** STUB decoder: stands in for an image/audio decode (??? in production —
    * swap for a real codec). Deterministically derives fake dimensions from
    * the payload bytes so tests are stable. Runs per-partition: the
    * `Iterator` shape is where a real decoder would amortize library init
    * across the batch, exactly like a Pandas-UDF `mapInPandas` would. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    // coalesce the derived columns: a NULL payload makes n_bytes NULL too,
    // and the primitive-Long tuple encoder would NPE on it before the
    // null-payload branch below ever ran
    media.select(col("media_id"),
        col("payload"),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"),
        coalesce(col("checksum"), lit("")).as("checksum"))
      .as[(Long, Array[Byte], Long, String)]
      .mapPartitions { rows =>
        // real codec init would happen once per partition, here
        rows.map { case (id, bytesOrNull, n, sum) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val h = if (bytes.isEmpty) 1 else (bytes(0) & 0x7f) + 1
          val w = if (bytes.length < 2) 1 else (bytes(1) & 0x7f) + 1
          MediaMeta(id, n, sum, w, h, (n / 64L).toInt + 1)
        }
      }
  }
}

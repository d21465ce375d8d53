package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed batch-wise inside executors.
  *
  * The decode layer parses REAL header formats (canonical 44-byte RIFF/WAVE
  * and BITMAPINFOHEADER BMP) from the payload bytes — little-endian
  * multi-byte fields at fixed chunk offsets, magic-number validation, and a
  * sentinel row for undecodable payloads. The fixture payloads are built
  * from document columns entirely in Catalyst (hex assembly → `unhex`), so
  * the DuckDB oracle can recompute every decoded field by arithmetic and
  * the decoder is gated end-to-end: what the encoder embeds in bytes, the
  * parser must extract back.
  *
  * The Spark-side shape is what matters at 100 TB: the payload travels as a
  * `binary` column next to its metadata, decode runs per-partition in
  * batches of [[DecodeBatch]] (one codec init per batch, like a Pandas-UDF
  * `mapInPandas` would amortize), partitioning is explicit so oversized
  * media rows can be spread before decode, and the output is fixed-schema
  * columnar again immediately after the opaque step.
  */
object BinaryColumns {

  /** Rows per decode batch inside a partition — mirrors the reference
    * extractor's ≤20-documents-per-call contract (hl_calc.py analogue). */
  val DecodeBatch = 20

  /** Decoded WAV header metadata (sentinel: all 0 and duration_ms = -1 for
    * an undecodable payload). */
  case class WavMeta(
    media_id: Long,
    sample_rate: Long,
    channels: Long,
    bits: Long,
    data_bytes: Long,
    duration_ms: Long)

  /** Decoded BMP header metadata (sentinel: all 0 and img_bytes = -1). */
  case class BmpMeta(
    media_id: Long,
    width: Long,
    height: Long,
    bpp: Long,
    img_bytes: Long)

  /** Attach a binary payload column + basic byte-level metadata. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast(LongType))
      .withColumn("checksum", md5(col("payload")))

  /** Little-endian hex encoding of an integer column in `nBytes` bytes:
    * fixed-width big-endian hex, byte pairs emitted in reverse order. */
  private def leHex(v: Column, nBytes: Int): Column = {
    val be = lpad(lower(hex(v.cast(LongType))), nBytes * 2, "0")
    concat((nBytes - 1 to 0 by -1).map(j => substring(be, j * 2 + 1, 2)): _*)
  }

  /** Build a real RIFF/WAVE payload per document: canonical 44-byte header
    * (PCM fmt chunk) + the text bytes as sample data. Sample rate and
    * channel count derive from the id so every decoded field is
    * independently recomputable by the oracle. Pure Catalyst — the bytes
    * are assembled as hex and `unhex`ed inside the scan's task. */
  def wavPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val data = col(textCol).cast(BinaryType)
    val dataLen = octet_length(data)
    val sampleRate = lit(8000) + (col(idCol) % 5).cast(IntegerType) * 4000
    val channels = lit(1) + (col(idCol) % 2).cast(IntegerType)
    val byteRate = sampleRate * channels * 2
    val header = concat(
      lit("52494646"), leHex(dataLen + 36, 4), // "RIFF", chunk size
      lit("57415645"), lit("666d7420"), // "WAVE", "fmt "
      leHex(lit(16), 4), leHex(lit(1), 2), // fmt size, PCM
      leHex(channels, 2), leHex(sampleRate, 4),
      leHex(byteRate, 4), leHex(channels * 2, 2), // byte rate, block align
      leHex(lit(16), 2), // bits per sample
      lit("64617461"), leHex(dataLen, 4)) // "data", data size
    df.select(col(idCol).cast(LongType).as("media_id"),
      concat(unhex(header), data).as("payload"))
  }

  /** Build a real BMP payload per document: "BM" file header + the FULL
    * 40-byte BITMAPINFOHEADER with id-derived dimensions (resolution /
    * palette fields zeroed, as single-plane 24-bpp writers do), text bytes
    * standing in for the pixel array. The header is genuinely 54 bytes, so
    * the declared pixel offset, the file size and [[decodeBmp]]'s length
    * gate agree for EVERY payload — including one whose stand-in raster is
    * shorter than 16 bytes. */
  def bmpPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val data = col(textCol).cast(BinaryType)
    val dataLen = octet_length(data)
    val width = lit(1) + (col(idCol) % 640).cast(IntegerType)
    val height = lit(1) + (col(idCol) % 480).cast(IntegerType)
    val header = concat(
      lit("424d"), leHex(dataLen + 54, 4), // "BM", file size
      lit("00000000"), leHex(lit(54), 4), // reserved, pixel offset
      leHex(lit(40), 4), // info header size
      leHex(width, 4), leHex(height, 4),
      leHex(lit(1), 2), leHex(lit(24), 2), // planes, bpp
      leHex(lit(0), 4), leHex(dataLen, 4), // compression, image size
      leHex(lit(0), 4), leHex(lit(0), 4), // x/y pixels-per-metre
      leHex(lit(0), 4), leHex(lit(0), 4)) // colors used / important
    df.select(col(idCol).cast(LongType).as("media_id"),
      concat(unhex(header), data).as("payload"))
  }

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

  /** Decoded-and-resized BMP thumbnail (sentinel: 0×0 with empty hex). */
  case class BmpThumb(media_id: Long, out_w: Long, out_h: Long, out_hex: String)

  /** Lowercase fixed-width hex of one byte-ranged value. */
  private def byteHex(v: Column): Column =
    lpad(lower(hex(v.cast(LongType) % 256)), 2, "0")

  /** Build a BMP with a REAL pixel raster: even id-derived dimensions
    * (w ≤ 16, h ≤ 12), pixel P(x, y) = (id+x, id+y, x+y) mod 256 with
    * y = 0 the TOP image row — stored the way actual BMP writers store it:
    * bottom row first, each row zero-padded to a 4-byte boundary. Every output
    * byte is id-derived arithmetic, so a decoder bug (stride, flip,
    * padding) shows up as a value mismatch, not a crash. Pure Catalyst. */
  def bmpRasterPayload(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast(LongType)
    val w = lit(2L) * (lit(1L) + id % 8)
    val h = lit(2L) * (lit(1L) + id % 6)
    val rowSize = ((w * 3 + 3) / 4).cast(LongType) * 4
    val dataLen = (rowSize * h).cast(IntegerType)
    // raster rows j = 0..h-1 hold logical rows y = h-1-j (bottom-up)
    val rasterHex = array_join(
      transform(sequence(lit(0L), h - 1), j => {
        val y = h - 1 - j
        concat(
          array_join(transform(sequence(lit(0L), w - 1), x =>
            concat(byteHex(id + x), byteHex(id + y), byteHex(x + y))), ""),
          lit("000000").substr(lit(1),
            (((lit(4L) - (w * 3) % 4) % 4) * 2).cast(IntegerType)))
      }), "")
    val header = concat(
      lit("424d"), leHex(dataLen + 54, 4),
      lit("00000000"), leHex(lit(54), 4),
      leHex(lit(40), 4),
      leHex(w, 4), leHex(h, 4),
      leHex(lit(1), 2), leHex(lit(24), 2),
      leHex(lit(0), 4), leHex(dataLen, 4),
      leHex(lit(0), 4), leHex(lit(0), 4),
      leHex(lit(0), 4), leHex(lit(0), 4))
    df.select(id.as("media_id"), unhex(concat(header, rasterHex)).as("payload"))
  }

  /** Decode a raster BMP and nearest-neighbour downsample it 2× — the
    * image half of the multimodal feature-extract contract, on real bytes:
    * the kernel walks the raster with the true row stride, un-flips the
    * bottom-up row order, and emits the thumbnail as top-down pixel hex.
    * Same [[DecodeBatch]] per-partition batch contract as [[decodeBmp]];
    * at 100 TB this is where an image library's resize runs, amortized
    * per batch. */
  def resizeBmp(spark: SparkSession, media: DataFrame): Dataset[BmpThumb] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatch).flatMap { batch =>
          batch.iterator.map { case (id, b) =>
            val ok = b != null && b.length >= 54 && bytesAt(b, 0, "BM") &&
              leInt(b, 14, 4) == 40 && leInt(b, 28, 2) == 24
            if (!ok) BmpThumb(id, 0, 0, "")
            else {
              val w = leInt(b, 18, 4).toInt
              val h = leInt(b, 22, 4).toInt
              val off = leInt(b, 10, 4).toInt
              val rowSize = (w * 3 + 3) / 4 * 4
              if (b.length < off + rowSize * h) BmpThumb(id, 0, 0, "")
              else {
                val sb = new StringBuilder
                for (y <- 0 until h / 2; x <- 0 until w / 2) {
                  // logical source pixel (2x, 2y); its raster row is
                  // h-1-2y from the bottom-up storage order
                  val p = off + (h - 1 - 2 * y) * rowSize + 2 * x * 3
                  sb.append(f"${b(p) & 0xff}%02x${b(p + 1) & 0xff}%02x" +
                    f"${b(p + 2) & 0xff}%02x")
                }
                BmpThumb(id, w / 2, h / 2, sb.toString)
              }
            }
          }
        }
      }
  }

  /** Little-endian unsigned integer at `off`, `n` bytes. */
  private def leInt(b: Array[Byte], off: Int, n: Int): Long =
    (0 until n).map(i => (b(off + i) & 0xffL) << (8 * i)).sum

  private def bytesAt(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length &&
      s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => b(off + i) == c }

  /** Decode RIFF/WAVE headers per partition, [[DecodeBatch]] rows per
    * batch (the grouped iterator is where a real codec amortizes library
    * init across the batch). Undecodable payloads (bad magic / truncated)
    * emit the sentinel row instead of failing the partition. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatch).flatMap { batch =>
          // per-batch codec init would happen here
          batch.iterator.map { case (id, b) =>
            val ok = b != null && b.length >= 44 &&
              bytesAt(b, 0, "RIFF") && bytesAt(b, 8, "WAVE") &&
              bytesAt(b, 12, "fmt ") && bytesAt(b, 36, "data")
            if (!ok) WavMeta(id, 0, 0, 0, 0, -1)
            else {
              val channels = leInt(b, 22, 2)
              val sampleRate = leInt(b, 24, 4)
              val byteRate = leInt(b, 28, 4)
              val bits = leInt(b, 34, 2)
              val dataBytes = leInt(b, 40, 4)
              val durMs = if (byteRate > 0) dataBytes * 1000 / byteRate else -1
              WavMeta(id, sampleRate, channels, bits, dataBytes, durMs)
            }
          }
        }
      }
  }

  /** Decode BMP headers per partition — same batch contract as
    * [[decodeWav]]. */
  def decodeBmp(spark: SparkSession, media: DataFrame): Dataset[BmpMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatch).flatMap { batch =>
          batch.iterator.map { case (id, b) =>
            val ok = b != null && b.length >= 54 && bytesAt(b, 0, "BM") &&
              leInt(b, 14, 4) == 40
            if (!ok) BmpMeta(id, 0, 0, 0, -1)
            else BmpMeta(id, leInt(b, 18, 4), leInt(b, 22, 4),
              leInt(b, 28, 2), leInt(b, 34, 4))
          }
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus batch-shaped decode /
  * feature-extract / frame-sample operators.
  *
  * The decode step is a clearly-marked STUB (this container has no
  * image/audio codecs): [[decodeFeatures]] computes deterministic
  * byte-level features where a real implementation would call a codec.
  * Everything around it — the schema, the binary payloads, the batched
  * `mapPartitions` execution shape (iterator → fixed-size batches →
  * per-batch kernel, the Scala analogue of `mapInPandas` arrow batches),
  * partition-preserving output — is real and tested.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true))), nullable = true)))

  /** Build a media table from the documents table: the UTF-8 bytes of
    * `text` stand in for an encoded media payload. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("txt").as("format"),
        octet_length(col("text")).as("n_bytes"),
        lit(1).as("channels")).as("meta"))

  /** Batched feature extraction over the binary payload.
    *
    * STUB: a production decode would hand each batch to an image/audio
    * codec here (???). The deterministic stand-in computes n_bytes,
    * first_byte and a byte checksum so the plumbing is verifiable.
    * Executes as mapPartitions with fixed-size batches — the decode
    * kernel sees `batchSize` payloads at a time, the shape vectorized
    * codecs want. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("first_byte", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val mediaIdx = media.schema.fieldIndex("media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch "decode kernel" (STUB — codec call goes here)
        batch.iterator.map { r =>
          val id = r.getLong(idIdx)
          // media is declared nullable — treat a null payload as empty
          val bytes = Option(r.getAs[Array[Byte]](mediaIdx)).getOrElse(Array.emptyByteArray)
          val checksum = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
          Row(id, bytes.length, if (bytes.isEmpty) -1 else bytes(0) & 0xFF, checksum)
        }
      }
    }(enc)
  }

  /** Audio frame windows: overlapping fixed-size windows with a hop —
    * the STFT framing an audio feature extractor consumes (e.g. 25 ms
    * windows / 10 ms hop at some sample rate, expressed in bytes).
    * FULL windows only: a payload shorter than `winSize` produces no
    * rows, and the last window starts at the largest multiple of `hop`
    * with `start + winSize <= n_bytes` (standard STFT convention).
    *
    * Pure expressions, no UDF and no kernel: window geometry is
    * arithmetic over octet_length, and the boundary content bytes are
    * extracted from the BINARY payload via substring→hex→conv (works on
    * arbitrary bytes, not just text payloads — spec covers 0x00/0xFF).
    * A real pipeline would hand `substring(media, start+1, winSize)`
    * slices to the decode kernel (see [[decodeFeatures]] for the batch
    * shape); the boundary bytes here make the gate verify actual
    * payload content, not just geometry.
    * Output: (media_id, window_idx, start_byte, first_byte, last_byte). */
  def audioWindows(media: DataFrame, winSize: Int = 400, hop: Int = 160): DataFrame = {
    require(winSize > 0 && hop > 0, s"audioWindows: winSize=$winSize hop=$hop")
    val n = octet_length(col("media"))
    // guard BEFORE sequence(): Spark's sequence(0, -1) steps DOWNWARD
    def byteAt(pos: Column): Column =
      conv(hex(substring(col("media"), pos, lit(1))), 16, 10).cast("int")
    media
      .filter(n >= winSize)
      .withColumn("window_idx",
        explode(sequence(lit(0), floor((n - winSize) / hop).cast("int"))))
      .withColumn("start_byte", col("window_idx") * hop)
      .withColumn("first_byte", byteAt(col("start_byte") + 1))
      .withColumn("last_byte", byteAt(col("start_byte") + winSize))
      .select(col("media_id"), col("window_idx"), col("start_byte"),
        col("first_byte"), col("last_byte"))
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `every`-th frame. Output one row per sampled frame with its
    * byte length — pure expressions (no UDF): frame count and sizes are
    * arithmetic over octet_length. */
  def sampleFrames(media: DataFrame, frameSize: Int = 256, every: Int = 2): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / frameSize).cast("int")
    media
      .withColumn("frame_idx", explode(filter(
        sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => i % every === 0)))
      .withColumn("frame_bytes",
        least(lit(frameSize),
          octet_length(col("media")) - col("frame_idx") * frameSize))
      .filter(col("frame_bytes") > 0)
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"))
  }
}

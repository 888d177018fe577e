package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement backing the m5 oracle tolerance: the max
  * |decoded JPEG mean − source byte mean| over real corpora, per SF.
  * JPEG DC (the 8x8 block mean) is quantized with step ~2 at quality
  * 0.95, so the deviation should sit ~1; the gate's tolerance is set
  * with a wide margin above the measured max. Forensics tool, not
  * library surface. */
object JpegTolProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val media = graft.operators.Multimodal.fromDocuments(docs)
      val jpeg = graft.operators.Multimodal.encodeGrayJpeg(media)
      val dec = graft.operators.Multimodal.decodeImageFeatures(jpeg, payloadCol = "jpeg")
      // source mean of the first 64 payload bytes, via the byte-extract
      // expression family the m3 gate uses
      val srcMean = (1 to 64).map(i =>
        conv(hex(substring(col("media"), i, 1)), 16, 10).cast("double"))
        .reduce(_ + _) / 64.0
      val src = media.filter(octet_length(col("media")) >= 64)
        .select(col("media_id"), srcMean.as("src_mean"))
      val j = dec.join(src, "media_id")
        .select(abs(col("mean_px") - col("src_mean")).as("dev"))
        .agg(max(col("dev")).as("max_dev"), avg(col("dev")).as("avg_dev"),
          count(lit(1)).as("n"))
      println(s"sf=$sf " + j.collect().head)
    }
    spark.stop()
  }
}

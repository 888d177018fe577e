package graft.tools

import org.apache.spark.sql.functions._

/** r21: count + size the parquet files the x12 signature store writes,
  * with and without the REBALANCE write hint (guide §6 file sizing). */
object StoreFilesProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    def files(dir: String): String = {
      val fs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      s"${fs.length} files, sizes ${fs.map(_.length()).sorted.reverse.mkString("[", ",", "]")}"
    }
    val plain = java.nio.file.Files.createTempDirectory("sf_plain_").toString
    Dedup.signatureStore(docs, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 8)
      .write.mode("overwrite").parquet(plain)
    println(s"[storefiles] plain:     ${files(plain)}")
    val reb = java.nio.file.Files.createTempDirectory("sf_reb_").toString
    Dedup.signatureStore(docs, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 8)
      .hint("rebalance", col("id"))
      .write.mode("overwrite").parquet(reb)
    println(s"[storefiles] rebalance: ${files(reb)}")
    spark.stop()
  }
}

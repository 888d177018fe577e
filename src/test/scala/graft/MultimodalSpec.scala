package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec specs: the javax.imageio PNG encode→decode round trip must
  * be byte-exact (lossless gray PNG), boundary bytes included, and the
  * raster-size filter must drop short payloads instead of failing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "media")

  test("png round trip recovers the exact source bytes, 0x00 and 0xFF included") {
    // full byte-range coverage: 0,1,...,63 / all-zero / all-0xFF / ramp
    val payloads = Seq(
      1L -> Array.tabulate(64)(_.toByte),
      2L -> Array.fill[Byte](64)(0),
      3L -> Array.fill[Byte](64)(0xFF.toByte),
      4L -> Array.tabulate(70)(i => (255 - i).toByte)) // extra tail ignored
    val got = Multimodal.decodeImageFeatures(
      Multimodal.encodeGrayPng(mediaOf(payloads), w = 8, h = 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4), r.getInt(5)))).toMap
    def stats(bytes: Array[Byte]) = {
      val px = bytes.take(64).map(_ & 0xFF)
      (8, 8, px.map(_.toLong).sum.toDouble / 64, px.head, px.last)
    }
    payloads.foreach { case (id, bytes) =>
      assert(got(id) == stats(bytes), s"media $id: ${got(id)} vs ${stats(bytes)}")
    }
  }

  test("payloads shorter than the raster are dropped, not padded or failed") {
    val got = Multimodal.encodeGrayPng(
      mediaOf(Seq(1L -> Array.fill[Byte](63)(7), 2L -> Array.fill[Byte](64)(7))))
    assert(got.select("media_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("encoded payload is a real PNG (magic bytes), decoded dims honor w x h") {
    val png = Multimodal.encodeGrayPng(
      mediaOf(Seq(1L -> Array.tabulate(12)(_.toByte))), w = 4, h = 3)
      .select("png").collect()(0).getAs[Array[Byte]](0)
    assert(png.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "PNG signature")
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.encodeGrayPng(mediaOf(Seq(1L -> Array.tabulate(12)(_.toByte))),
        w = 4, h = 3)).collect()(0)
    assert(feats.getInt(1) == 4 && feats.getInt(2) == 3)
    // row-major raster: px_first = byte 0, px_last = byte 11
    assert(feats.getInt(4) == 0 && feats.getInt(5) == 11)
  }
}

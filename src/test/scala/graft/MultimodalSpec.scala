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

  test("bmp round trip: real BMP bytes (BM magic), exact byte recovery") {
    val payloads = Seq(
      1L -> Array.tabulate(64)(_.toByte),
      2L -> Array.fill[Byte](64)(0),
      3L -> Array.fill[Byte](64)(0xFF.toByte),
      4L -> Array.tabulate(70)(i => (255 - i).toByte))
    val bmp = Multimodal.encodeGrayBmp(mediaOf(payloads), w = 8, h = 8)
    bmp.select("bmp").collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]](0)
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "BMP magic")
    }
    // 8-bit BMP is lossless: decoded stats must equal the source bytes
    val got = Multimodal.decodeImageFeatures(bmp, payloadCol = "bmp")
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

  test("jpeg round trip: real JPEG bytes, exact dims, lossy-but-close pixels") {
    val payloads = Seq(
      1L -> Array.tabulate(64)(_.toByte),              // ramp 0..63
      2L -> Array.fill[Byte](64)(0),                   // flat black
      3L -> Array.fill[Byte](64)(0xFF.toByte),         // flat white
      4L -> Array.tabulate(70)(i => (37 * i % 256).toByte)) // noisy + tail
    val jpeg = Multimodal.encodeGrayJpeg(mediaOf(payloads), w = 8, h = 8)
    // container check: JPEG SOI marker FF D8, EOI trailer FF D9
    jpeg.select("jpeg").collect().foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8, "JPEG SOI")
      assert((b(b.length - 2) & 0xFF) == 0xFF && (b(b.length - 1) & 0xFF) == 0xD9, "JPEG EOI")
    }
    val got = Multimodal.decodeImageFeatures(jpeg, payloadCol = "jpeg")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4), r.getInt(5)))).toMap
    assert(got.keySet == payloads.map(_._1).toSet)
    payloads.foreach { case (id, bytes) =>
      val (w, h, mean, first, last) = got(id)
      assert(w == 8 && h == 8, s"media $id dims")
      assert(first >= 0 && first <= 255 && last >= 0 && last <= 255)
      // lossy closeness: an 8x8 image is ONE DCT block, whose DC term is
      // the block mean — lightly quantized at quality 0.95, so the
      // decoded mean must track the source-byte mean tightly even though
      // individual pixels ring
      val srcMean = bytes.take(64).map(_ & 0xFF).map(_.toLong).sum.toDouble / 64
      assert(math.abs(mean - srcMean) <= 8.0,
        s"media $id: decoded mean $mean vs source mean $srcMean")
    }
    // flat blocks have no AC energy: lossy or not, they decode flat
    assert(got(2L)._3 == 0.0 && got(2L)._4 == 0 && got(2L)._5 == 0)
    assert(got(3L)._3 == 255.0 && got(3L)._4 == 255 && got(3L)._5 == 255)
  }

  test("jpeg encode is deterministic: pinned quality, identical bytes across runs") {
    val payloads = Seq(1L -> Array.tabulate(64)(i => (211 * i % 256).toByte))
    def bytes() = Multimodal.encodeGrayJpeg(mediaOf(payloads))
      .select("jpeg").collect()(0).getAs[Array[Byte]](0).toSeq
    assert(bytes() == bytes(), "same payload + pinned quality must re-encode identically")
  }

  test("wav round trip recovers the exact source samples, sign bits included") {
    // 0x00/0xFF extremes, a negative-sample pattern (hi byte >= 0x80),
    // and a ramp; extra tail bytes beyond 2*nSamples are ignored
    val payloads = Seq(
      1L -> Array.tabulate(32)(_.toByte),
      2L -> Array.fill[Byte](32)(0),
      3L -> Array.fill[Byte](32)(0xFF.toByte),         // all samples -1
      4L -> Array.tabulate(40)(i => (128 + i).toByte)) // negative samples
    val got = Multimodal.decodeWavFeatures(
      Multimodal.encodeWav(mediaOf(payloads), nSamples = 16, sampleRate = 8000))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    def stats(bytes: Array[Byte]) = {
      val s = Array.tabulate(16)(j =>
        (bytes(2 * j + 1) << 8) | (bytes(2 * j) & 0xFF))
      (16, 8000, s.head, s.last, s.map(_.toLong).sum.toDouble / 16)
    }
    payloads.foreach { case (id, bytes) =>
      assert(got(id) == stats(bytes), s"media $id: ${got(id)} vs ${stats(bytes)}")
    }
  }

  test("encoded payload is a real RIFF/WAVE container; short payloads dropped") {
    val wav = Multimodal.encodeWav(
      mediaOf(Seq(1L -> Array.tabulate(128)(_.toByte),
        2L -> Array.fill[Byte](127)(3))), nSamples = 64)
    val rows = wav.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L), "127-byte payload must drop")
    val bytes = rows(0).getAs[Array[Byte]](1)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", "RIFF/WAVE magic")
    // deterministic encode: same payload -> identical container bytes
    val again = Multimodal.encodeWav(
      mediaOf(Seq(1L -> Array.tabulate(128)(_.toByte))), nSamples = 64)
      .collect()(0).getAs[Array[Byte]](1)
    assert(bytes.toSeq == again.toSeq)
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

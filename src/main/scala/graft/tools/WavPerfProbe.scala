package graft.tools

import javax.sound.sampled._
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** Microbenchmark backing the m6 amortization: is the flat per-row WAV
  * cost the codec work itself or AudioSystem's per-call SPI provider
  * re-scan? Compares AudioSystem.write/getAudioInputStream against
  * partition-cached provider instances on 20k tiny clips. */
object WavPerfProbe {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val raw = Array.tabulate[Byte](128)(i => (i * 7).toByte)
    def mkAis() = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 64L)
    import scala.jdk.CollectionConverters._
    val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE)).get
    val reader = java.util.ServiceLoader.load(classOf[AudioFileReader])
      .iterator().asScala.toSeq
    println(s"writer=${writer.getClass.getName} readers=${reader.map(_.getClass.getSimpleName)}")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e6}%.0f ms / $n rows")
    }
    // warm-up
    (1 to 2000).foreach { _ =>
      val b = new java.io.ByteArrayOutputStream(); AudioSystem.write(mkAis(), AudioFileFormat.Type.WAVE, b)
    }
    var wavBytes: Array[Byte] = null
    time("AudioSystem.write") {
      (1 to n).foreach { _ =>
        val b = new java.io.ByteArrayOutputStream()
        AudioSystem.write(mkAis(), AudioFileFormat.Type.WAVE, b)
        wavBytes = b.toByteArray
      }
    }
    time("cached writer.write") {
      (1 to n).foreach { _ =>
        val b = new java.io.ByteArrayOutputStream()
        writer.write(mkAis(), AudioFileFormat.Type.WAVE, b)
        wavBytes = b.toByteArray
      }
    }
    (1 to 2000).foreach { _ =>
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wavBytes)).readAllBytes()
    }
    time("AudioSystem.getAudioInputStream+read") {
      (1 to n).foreach { _ =>
        AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wavBytes)).readAllBytes()
      }
    }
    val wavReader = reader.find { rd =>
      try { rd.getAudioInputStream(new java.io.ByteArrayInputStream(wavBytes)); true }
      catch { case _: Throwable => false }
    }.get
    println(s"  wav reader=${wavReader.getClass.getSimpleName}")
    time("cached reader.getAudioInputStream+read") {
      (1 to n).foreach { _ =>
        wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(wavBytes)).readAllBytes()
      }
    }
  }
}

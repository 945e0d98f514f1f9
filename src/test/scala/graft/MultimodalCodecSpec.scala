package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the round-16 codec-path optimizations: the cached
  * wave-first SPI reader and the direct RIFF/PCM writer must be
  * BIT-IDENTICAL to the `AudioSystem` entry points they replace — byte
  * equality on the encoded file, value equality on the decoded PCM.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  private def pcm(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 31 + 17L * i) % 65536) - 32768).toInt
      out(i * 2) = (s & 0xff).toByte
      out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def ais(bytes: Array[Byte], rate: Float, n: Int) =
    new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes),
      new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false),
      n.toLong)

  test("writeWav emits the JDK WaveFileWriter's exact bytes for 16-bit " +
      "LE PCM (the direct-RIFF fast path is byte-identical)") {
    for (id <- Seq(0L, 7L, 99L); n <- Seq(65, 200, 299)) {
      val raw = pcm(id, n)
      val viaJdk = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais(raw, 8000f, n),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, viaJdk)
      val viaDirect = new java.io.ByteArrayOutputStream()
      Multimodal.writeWav(ais(raw, 8000f, n), viaDirect)
      assert(java.util.Arrays.equals(viaJdk.toByteArray,
        viaDirect.toByteArray),
        s"direct RIFF bytes diverge from the JDK writer (id=$id n=$n)")
    }
  }

  test("readAudio (cached wave-first SPI readers) decodes the same " +
      "format and PCM bytes as AudioSystem.getAudioInputStream") {
    for (id <- Seq(3L, 42L); n <- Seq(80, 250)) {
      val wav = {
        val bos = new java.io.ByteArrayOutputStream()
        Multimodal.writeWav(ais(pcm(id, n), 8000f, n), bos)
        bos.toByteArray
      }
      val jdk = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val ours = Multimodal.readAudio(wav)
      assert(ours.getFormat.toString == jdk.getFormat.toString)
      assert(java.util.Arrays.equals(jdk.readAllBytes(),
        ours.readAllBytes()),
        s"decoded PCM diverges (id=$id n=$n)")
    }
  }

  test("readAudio still rejects non-audio payloads loudly") {
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      Multimodal.readAudio("not a wav at all".getBytes("UTF-8"))
    }
  }
}

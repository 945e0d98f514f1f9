package graft.tools

/** Throwaway micro-benchmark: WAV encode+decode kernel, serial vs
  * threaded, outside Spark — isolates JVM-level contention in the
  * javax.sound stack from Spark scheduling. */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = 5000
    def makeWav(id: Long): Array[Byte] = {
      val ns = (200 + id % 100).toInt
      val pcm = new Array[Byte](ns * 2)
      var i = 0
      while (i < ns) {
        val s = (((id * 31 + 17L * i) % 65536) - 32768).toInt
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val readers = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toSeq
    }
    println("readers order: " + readers.map(_.getClass.getSimpleName))
    def decodeCached(b: Array[Byte]): Long = {
      val in = new java.io.ByteArrayInputStream(b)
      var ais: javax.sound.sampled.AudioInputStream = null
      val it = readers.iterator
      while (ais == null && it.hasNext) {
        val r = it.next()
        try ais = r.getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            in.reset()
        }
      }
      val bytes = ais.readAllBytes(); ais.close()
      bytes.length.toLong
    }
    val waveFirst = readers.sortBy(r =>
      if (r.getClass.getSimpleName == "WaveFileReader") 0 else 1)
    def decodeWaveFirst(b: Array[Byte]): Long = {
      val in = new java.io.ByteArrayInputStream(b)
      var ais: javax.sound.sampled.AudioInputStream = null
      val it = waveFirst.iterator
      while (ais == null && it.hasNext) {
        val r = it.next()
        try ais = r.getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            in.reset()
        }
      }
      val bytes = ais.readAllBytes(); ais.close()
      bytes.length.toLong
    }
    def run(tag: String, threads: Int, f: Array[Byte] => Long): Unit = {
      val wavs = (0 until n).map(i => makeWav(i.toLong))
      val t0 = System.nanoTime()
      if (threads == 1) wavs.foreach(f)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        wavs.foreach(w => pool.submit(new Runnable {
          def run(): Unit = f(w)
        }))
        pool.shutdown()
        pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
      }
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (rep <- 1 to 2) {
      run(s"decode cached-SPI serial   rep$rep", 1, decodeCached)
      run(s"decode cached-SPI 32thread rep$rep", 32, decodeCached)
      run(s"decode wave-first serial   rep$rep", 1, decodeWaveFirst)
      run(s"decode wave-first 32thread rep$rep", 32, decodeWaveFirst)
    }
  }
}

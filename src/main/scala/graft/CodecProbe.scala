package graft

/** Micro-probe: where do mm_decode_audio's 36 task-seconds go —
  * the javax.sound WAV ENCODE (AudioSystem.write), the DECODE
  * (AudioSystem.getAudioInputStream SPI dispatch), or the PNG pair?
  * Pure JVM, no Spark. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val AudFrames = 256
    val AudRate = 8000
    def pcm(docId: Long, i: Int): Int = ((docId * 17 + i * 11) % 256).toInt

    def time(label: String)(f: () => Unit): Unit = {
      f()
      val t0 = System.nanoTime()
      f()
      println(f"[codec] $label%-34s ${(System.nanoTime() - t0) / 1e6}%8.1f ms for $n docs")
    }

    val fmt = new javax.sound.sampled.AudioFormat(AudRate.toFloat, 8, 1, false, false)
    var wavs: Array[Array[Byte]] = null
    time("wav encode (AudioSystem.write)") { () =>
      wavs = Array.tabulate(n) { id =>
        val raw = Array.tabulate(AudFrames)(i => pcm(id.toLong, i).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, AudFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
    }
    time("wav decode (getAudioInputStream)") { () =>
      var s = 0L
      for (bytes <- wavs) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        s += ais.getFormat.getSampleRate.toLong + ais.getFrameLength
        val data = ais.readAllBytes()
        s += data.length
      }
      if (s == 42) println("")
    }

    // PNG side
    val ImgSide = 32
    def pixel(docId: Long, x: Int, y: Int): Int = ((docId * 31 + x * 7 + y * 13) % 256).toInt
    javax.imageio.ImageIO.setUseCache(false)
    var pngs: Array[Array[Byte]] = null
    time("png encode (ImageIO.write gray8)") { () =>
      pngs = Array.tabulate(n) { id =>
        val img = new java.awt.image.BufferedImage(ImgSide, ImgSide,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var y = 0
        while (y < ImgSide) {
          var x = 0
          while (x < ImgSide) { r.setSample(x, y, 0, pixel(id.toLong, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
    }
    time("png decode (ImageIO.read + grid)") { () =>
      var s = 0L
      for (bytes <- pngs) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val r = img.getRaster
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
      }
      if (s == 42) println("")
    }

    // ---- contention probes: the same work on 32 threads ----
    def timePar(label: String)(f: Int => Unit): Unit = {
      val threads0 = (0 until 4).map(t => new Thread(() => f(t)))
      threads0.foreach(_.start()); threads0.foreach(_.join()) // warm
      val t0 = System.nanoTime()
      val threads = (0 until 32).map(t => new Thread(() => f(t)))
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"[codec] $label%-34s ${(System.nanoTime() - t0) / 1e6}%8.1f ms for 32 threads x ${n / 32} docs")
    }
    val per = n / 32
    timePar("PAR wav decode AudioSystem") { t =>
      var s = 0L
      for (i <- 0 until per) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wavs(t * per + i)))
        s += ais.readAllBytes().length
      }
    }
    // provider resolved once per thread through the public ServiceLoader
    timePar("PAR wav decode cached provider") { t =>
      import javax.sound.sampled.spi.AudioFileReader
      import scala.jdk.CollectionConverters._
      val readers = java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala.toList
      var s = 0L
      for (i <- 0 until per) {
        val in = new java.io.ByteArrayInputStream(wavs(t * per + i))
        val ais = readers.iterator.flatMap { r =>
          try Some(r.getAudioInputStream(in)) catch { case _: Exception => in.reset(); None }
        }.next()
        s += ais.readAllBytes().length
      }
    }
    timePar("PAR wav encode AudioSystem") { t =>
      for (i <- 0 until per) {
        val raw = Array.tabulate(AudFrames)(j => pcm((t * per + i).toLong, j).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, AudFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      }
    }
    timePar("PAR wav encode cached provider") { t =>
      import javax.sound.sampled.spi.AudioFileWriter
      import scala.jdk.CollectionConverters._
      val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter]).asScala
        .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)).get
      for (i <- 0 until per) {
        val raw = Array.tabulate(AudFrames)(j => pcm((t * per + i).toLong, j).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, AudFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      }
    }
    timePar("PAR png decode ImageIO") { t =>
      var s = 0L
      for (i <- 0 until per) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngs(t * per + i)))
        s += img.getWidth
      }
    }
    timePar("PAR png encode ImageIO") { t =>
      for (i <- 0 until per) {
        val img = new java.awt.image.BufferedImage(ImgSide, ImgSide,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var y = 0
        while (y < ImgSide) {
          var x = 0
          while (x < ImgSide) { r.setSample(x, y, 0, pixel((t * per + i).toLong, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
      }
    }
  }
}

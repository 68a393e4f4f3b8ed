package graft.tools

import graft.multimodal.Multimodal.{Gif, Png, Wav}

/** Concurrency micro-benchmark for the media codecs (no Spark): decodes
  * a fixed clip set single-threaded and at N threads through (a) the
  * javax providers and (b) the lock-free fast paths. The javax
  * provider-registry global lock shows up as NEGATIVE thread scaling —
  * the r17 WAV finding; this tool is the committed evidence that the
  * PNG/GIF fast paths (r18) remove the same serialization.
  *
  *   sbt "runMain graft.tools.DecodeBurn [threads] [seconds]"
  */
object DecodeBurn {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt).getOrElse(32)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val pngs = (0 until 64).map(i => Png.encode(Png.pattern(i, 64, 48)))
    val gifs = (0 until 16).map(i =>
      Gif.pattern(i, 32, 24, n = 4 + (i % 8).toInt))
    val wavs = (0 until 32).map(i => Wav.pattern(i, 8000))

    def burn(name: String, nThreads: Int)(work: Int => Unit): Unit = {
      val stop = System.nanoTime() + secs * 1000000000L
      val counts = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until nThreads).map { t =>
        new Thread(() => {
          var i = t
          while (System.nanoTime() < stop) { work(i); i += 1
            counts.incrementAndGet() }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"$name%-28s threads=$nThreads%2d  ${
        counts.get() / secs.toDouble}%9.0f decodes/s")
    }

    def javaxPng(b: Array[Byte]): Unit = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null)
    }
    def javaxGif(b: Array[Byte]): Unit = {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        (0 until n).foreach(reader.read)
      } finally { reader.dispose(); iis.close() }
    }

    for (n <- Seq(1, threads)) {
      burn("png javax ImageIO.read", n)(i => javaxPng(pngs(i % pngs.size)))
      burn("png fast decode", n)(i =>
        require(Png.decode(pngs(i % pngs.size)) != null))
      burn("gif javax reader", n)(i => javaxGif(gifs(i % gifs.size)))
      burn("gif fast frames", n)(i =>
        require(Gif.frames(gifs(i % gifs.size)).nonEmpty))
      burn("wav fast decode", n)(i =>
        require(Wav.decode(wavs(i % wavs.size)).nonEmpty))
    }
  }
}

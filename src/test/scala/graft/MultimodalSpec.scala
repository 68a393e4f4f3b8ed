package graft

import graft.core.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(
    spark, Tables.table(spark, sf, "documents").limit(60), "doc_id")

  test("synthetic media table: schema, mimes, deterministic payloads") {
    val rows = media.collect()
    assert(rows.length == 60)
    assert(rows.map(_.mime).toSet ==
      Set("image/png", "audio/wav", "video/gif"))
    val again = media.collect()
    assert(rows.map(_.bytes.toSeq).toSeq == again.map(_.bytes.toSeq).toSeq)
  }

  test("feature extraction: dim, determinism, distributed shape") {
    val f = Multimodal.extractFeatures(media, dim = 32)
    val rows = f.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.features.length == 32))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(rows.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("png kernel decodes REAL pixels: encode/decode round-trip is exact") {
    val img = Multimodal.Png.pattern(7L, 40, 24)
    val back = Multimodal.Png.decode(Multimodal.Png.encode(img))
    assert(back.getWidth == 40 && back.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 40)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
    // a corrupt payload fails loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.Png.decode(Array[Byte](1, 2, 3))
    }
  }

  test("png resize resamples real pixels (nearest-neighbor, deterministic)") {
    val src = Multimodal.Png.pattern(11L, 64, 64)
    val out = Multimodal.Png.decode(
      Multimodal.Png.resize(Multimodal.Png.encode(src), 32, 32))
    assert(out.getWidth == 32 && out.getHeight == 32)
    // nearest-neighbor at 2:1 picks every other source pixel
    for (y <- 0 until 32 by 7; x <- 0 until 32 by 7)
      assert((out.getRGB(x, y) & 0xFFFFFF) ==
        (src.getRGB(x * 2, y * 2) & 0xFFFFFF), s"pixel ($x,$y)")
  }

  test("png features are a real luminance histogram (sums to 1)") {
    val bytes = Multimodal.Png.encode(Multimodal.Png.pattern(3L, 64, 64))
    val f = Multimodal.Png.features(bytes, 32)
    assert(f.length == 32)
    assert(math.abs(f.sum - 1.0f) < 1e-3)
    // different images → different histograms
    val g = Multimodal.Png.features(
      Multimodal.Png.encode(Multimodal.Png.pattern(4L, 64, 64)), 32)
    assert(f.toSeq != g.toSeq)
    // and the pipeline path uses the real kernel for images
    val viaPipeline = Multimodal.extractFeatures(
      media.filter(_.mime == "image/png"), dim = 32).collect()
    viaPipeline.foreach(r => assert(math.abs(r.features.sum - 1.0f) < 1e-3))
  }

  test("wav kernel decodes REAL samples: encode/decode round-trip is exact") {
    val n = 4000
    val bytes = Multimodal.Wav.pattern(5L, n)
    val samples = Multimodal.Wav.decode(bytes)
    assert(samples.length == n)
    // a 320 Hz-ish sine at amplitude 0.8 must actually oscillate
    assert(samples.max > 20000 && samples.min < -20000)
    assert(Multimodal.Wav.durationMs(bytes) == n * 1000L / 16000)
    // byte-identical re-encode of the decoded PCM (lossless codec)
    val pcm = new Array[Byte](n * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    assert(Multimodal.Wav.decode(Multimodal.Wav.encode(pcm)).toSeq ==
      samples.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.Wav.decode(Array[Byte](9, 9, 9))
    }
  }

  test("wav features are real RMS energy windows") {
    val f = Multimodal.Wav.features(Multimodal.Wav.pattern(7L, 8000), 16)
    assert(f.length == 16)
    // a steady 0.8-amplitude sine has RMS ≈ 0.57 in every window
    f.foreach(v => assert(v > 0.3f && v < 0.9f, v.toString))
    // distinct clips → distinct energy profiles
    val g = Multimodal.Wav.features(Multimodal.Wav.pattern(8L, 8000), 16)
    assert(f.toSeq != g.toSeq)
    // pipeline path uses the real kernel for audio rows
    val viaPipeline = Multimodal.extractFeatures(
      media.filter(_.mime == "audio/wav"), dim = 16).collect()
    assert(viaPipeline.nonEmpty)
    viaPipeline.foreach(r =>
      r.features.foreach(v => assert(v >= 0f && v <= 1f)))
  }

  test("binaryFile dir ingestion: real files through the kernel pipeline") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media")
    for (i <- 1 to 4)
      java.nio.file.Files.write(tmp.resolve(s"img$i.png"),
        Multimodal.Png.encode(Multimodal.Png.pattern(i.toLong, 32, 32)))
    for (i <- 1 to 3)
      java.nio.file.Files.write(tmp.resolve(s"clip$i.wav"),
        Multimodal.Wav.pattern(i.toLong, 2000))
    for (i <- 1 to 2)
      java.nio.file.Files.write(tmp.resolve(s"vid$i.gif"),
        Multimodal.Gif.pattern(i.toLong, 16, 12, n = 5))
    val media = Multimodal.readMediaDir(spark, tmp.toString)
    val rows = media.collect()
    assert(rows.length == 9)
    val gifs = rows.filter(_.mime == "video/gif")
    assert(gifs.length == 2 && gifs.forall(_.duration_ms == 500))
    val imgs = rows.filter(_.mime == "image/png")
    assert(imgs.length == 4 &&
      imgs.forall(r => r.width == 32 && r.height == 32))
    val wavs = rows.filter(_.mime == "audio/wav")
    assert(wavs.length == 3 && wavs.forall(_.duration_ms == 125))
    // features flow from real file bytes
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == 9 && feats.forall(_.features.length == 8))
  }

  test("resize touches only images; frame sampling only videos") {
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    resized.foreach { r =>
      if (r.mime == "image/png") assert(r.width == 32 && r.height == 32)
      else assert(r.width != 32 || r.height == 64)
    }
    val frames = Multimodal.sampleFrames(media, 4).collect()
    val videoCount = media.filter(_.mime == "video/gif").count()
    assert(frames.length == videoCount * 4)
    assert(frames.forall(_.frame_idx < 4))
    // sampled frames are REAL stills: every payload PNG-decodes
    frames.foreach { fr =>
      val img = Multimodal.Png.decode(fr.bytes)
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
  }

  test("frame timestamps span the clip when it has fewer frames than requested") {
    import spark.implicits._
    val bytes = Multimodal.Gif.pattern(9L, 16, 12, n = 4)
    val durationMs = Multimodal.Gif.durationMs(bytes)
    val clip = Seq(Multimodal.MediaRow(77L, "video/gif", bytes,
      16, 12, durationMs)).toDS()
    // request 8 frames from a 4-frame clip: timestamps must divide by the
    // ACTUAL sampled count, covering [0, duration), not compress toward 0
    val frames = Multimodal.sampleFrames(clip, 8).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.ts_ms).toSeq ==
      (0 until 4).map(i => i.toLong * durationMs / 4))
    assert(frames.last.ts_ms == durationMs * 3 / 4)
  }

  test("gif kernel decodes REAL frames: round-trip exact, duration, features") {
    val bytes = Multimodal.Gif.pattern(5L, 16, 12, n = 6)
    assert(Multimodal.Gif.frameCount(bytes) == 6)
    assert(Multimodal.Gif.durationMs(bytes) == 6 * Multimodal.Gif.FrameDelayMs)
    // grayscale-indexed frames survive the palette codec bit-exactly
    val back = Multimodal.Gif.frames(bytes)
    for (f <- 0 until 6; y <- 0 until 12; x <- 0 until 16) {
      val want = scala.util.hashing.MurmurHash3
        .productHash((5L, f, x, y)) & 0xFF
      assert((back(f).getRGB(x, y) & 0xFF) == want, s"frame $f ($x,$y)")
    }
    // evenly spaced sampling: 3 of 6 picks frames 0, 2, 4
    val sampled = Multimodal.Gif.sampleFrames(bytes, 3)
    assert(sampled.size == 3)
    assert(sampled.zip(Seq(0, 2, 4)).forall { case (png, idx) =>
      val img = Multimodal.Png.decode(png)
      (img.getRGB(3, 7) & 0xFF) ==
        (scala.util.hashing.MurmurHash3.productHash((5L, idx, 3, 7)) & 0xFF)
    })
    // temporal luminance features: deterministic, in [0,1], clip-specific
    val f1 = Multimodal.Gif.features(bytes, 4)
    assert(f1.length == 4 && f1.forall(v => v >= 0f && v <= 1f))
    assert(f1.toSeq == Multimodal.Gif.features(bytes, 4).toSeq)
    assert(f1.toSeq !=
      Multimodal.Gif.features(Multimodal.Gif.pattern(6L, 16, 12, 6), 4).toSeq)
    // corrupt payloads fail loudly
    intercept[Exception] {
      Multimodal.Gif.frames(Array[Byte](9, 9, 9))
    }
  }

  test("dHash64: closed form over grouped patterns, nested-variant distances") {
    import Multimodal.Png
    // the hash THROUGH the codec (encode → decode → box-filter → compare)
    // equals the closed form the oracle computes from md5 nibbles
    def md5b(s: String): Int = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))(0) & 0xFF
    def closedForm(g: Long, v: Int): Long = {
      val flips = (0 until v).map(j => md5b(s"$g:flip:$j") % 72).toSet
      def lum(cx: Int, cy: Int): Int = {
        val l0 = md5b(s"$g:$cx:$cy")
        if (flips(cy * 9 + cx)) 255 - l0 else l0
      }
      var bits = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (lum(cx, cy) > lum(cx + 1, cy)) bits |= 1L << (cy * 8 + cx)
      bits
    }
    for (g <- 0L until 6L; v <- 0 until 4) {
      val viaCodec = Png.dHash64(Png.encode(Png.groupedPattern(g, v)))
      assert(viaCodec == closedForm(g, v), s"group $g variant $v")
    }
    // nested flip sets: adjacent variants differ by ≤ 2 bits (one cell
    // touches only its own left/right comparisons); unrelated groups are
    // far apart (~32 expected — assert a conservative > 10)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 6L; v <- 0 until 3)
      assert(ham(closedForm(g, v), closedForm(g, v + 1)) <= 2)
    for (g <- 0L until 5L)
      assert(ham(closedForm(g, 0), closedForm(g + 1, 0)) > 10)
    // dHash is also stable through a lossless resize-free re-encode
    val bytes = Png.encode(Png.groupedPattern(3L, 2))
    assert(Png.dHash64(bytes) ==
      Png.dHash64(Png.encode(Png.decode(bytes))))
  }

  test("imageNearDupPairs == brute-force hamming over the same images") {
    import Multimodal.Png
    import spark.implicits._
    val imgs = (0L until 48L)
      .map(id => (id, Png.encode(Png.groupedPattern(id / 4, (id % 4).toInt))))
    val df = imgs.toDF("doc_id", "png")
    val got = Multimodal.imageNearDupPairs(df, "doc_id", "png",
      maxHamming = 3).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val sigs = imgs.map { case (id, b) => id -> Png.dHash64(b) }
    val want = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)
    assert(got == want.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty, "fixture families produced no near-dup pairs")
  }

  test("eHash64: closed form over grouped blocks, variant distances") {
    import Multimodal.Wav
    // the hash THROUGH the codec (WAV encode → decode → block energy
    // means → compare) equals the closed form from md5 nibbles
    def md5b(s: String): Int = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))(0) & 0xFF
    def closedForm(g: Long, v: Int): Long = {
      val flips = (0 until v).map(k => md5b(s"$g:aflip:$k") % 65).toSet
      def amp(j: Int): Int = {
        val a0 = md5b(s"$g:blk:$j")
        if (flips(j)) 255 - a0 else a0
      }
      var bits = 0L
      for (j <- 0 until 64) if (amp(j) > amp(j + 1)) bits |= 1L << j
      bits
    }
    for (g <- 0L until 6L; v <- 0 until 4) {
      val viaCodec = Wav.eHash64(Wav.groupedBlocks(g, v))
      assert(viaCodec == closedForm(g, v), s"group $g variant $v")
    }
    // one re-levelled block touches only its own two compares; unrelated
    // clips are far apart
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 6L; v <- 0 until 3)
      assert(ham(closedForm(g, v), closedForm(g, v + 1)) <= 2)
    for (g <- 0L until 5L)
      assert(ham(closedForm(g, 0), closedForm(g + 1, 0)) > 10)
    // stable through a lossless decode → re-encode cycle
    val bytes = Wav.groupedBlocks(3L, 2)
    val pcm = Wav.decode(bytes)
    val re = new Array[Byte](pcm.length * 2)
    pcm.indices.foreach { i =>
      re(2 * i) = (pcm(i) & 0xFF).toByte
      re(2 * i + 1) = ((pcm(i) >> 8) & 0xFF).toByte
    }
    assert(Wav.eHash64(bytes) == Wav.eHash64(Wav.encode(re)))
  }

  test("tHash64: closed form over grouped frames, variant distances") {
    import Multimodal.Gif
    def md5b(s: String): Int = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))(0) & 0xFF
    def closedForm(g: Long, v: Int): Long = {
      val flips = (0 until v).map(k => md5b(s"$g:vflip:$k") % 65).toSet
      def lum(j: Int): Int = {
        val l0 = md5b(s"$g:frm:$j")
        if (flips(j)) 255 - l0 else l0
      }
      var bits = 0L
      for (j <- 0 until 64) if (lum(j) > lum(j + 1)) bits |= 1L << j
      bits
    }
    for (g <- 0L until 4L; v <- 0 until 4) {
      val viaCodec = Gif.tHash64(Gif.groupedFrames(g, v))
      assert(viaCodec == closedForm(g, v), s"group $g variant $v")
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 4L; v <- 0 until 3)
      assert(ham(closedForm(g, v), closedForm(g, v + 1)) <= 2)
    for (g <- 0L until 3L)
      assert(ham(closedForm(g, 0), closedForm(g + 1, 0)) > 10)
  }

  test("videoNearDupPairs == brute-force hamming over the same clips") {
    import Multimodal.Gif
    import spark.implicits._
    val clips = (0L until 32L)
      .map(id => (id, Gif.groupedFrames(id / 4, (id % 4).toInt)))
    val df = clips.toDF("doc_id", "gif")
    val got = Multimodal.videoNearDupPairs(df, "doc_id", "gif",
      maxHamming = 3).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val sigs = clips.map { case (id, b) => id -> Gif.tHash64(b) }
    val want = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)
    assert(got == want.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty, "fixture families produced no near-dup pairs")
  }

  test("audioNearDupPairs == brute-force hamming over the same clips") {
    import Multimodal.Wav
    import spark.implicits._
    val clips = (0L until 48L)
      .map(id => (id, Wav.groupedBlocks(id / 4, (id % 4).toInt)))
    val df = clips.toDF("doc_id", "wav")
    val got = Multimodal.audioNearDupPairs(df, "doc_id", "wav",
      maxHamming = 3).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val sigs = clips.map { case (id, b) => id -> Wav.eHash64(b) }
    val want = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)
    assert(got == want.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty, "fixture families produced no near-dup pairs")
  }

  test("fft == naive DFT; Parseval holds") {
    val rnd = new scala.util.Random(7)
    val n = 64
    val xs = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = xs.clone(); val im = new Array[Double](n)
    Multimodal.Wav.fft(re, im)
    // naive O(n^2) DFT reference
    for (k <- 0 until n) {
      var sr = 0.0; var si = 0.0
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        sr += xs(t) * math.cos(a)
        si += xs(t) * math.sin(a)
      }
      assert(math.abs(re(k) - sr) < 1e-9, s"re bin $k: ${re(k)} vs $sr")
      assert(math.abs(im(k) - si) < 1e-9, s"im bin $k: ${im(k)} vs $si")
    }
    // Parseval: sum |x|^2 == (1/n) sum |X|^2
    val lhs = xs.map(x => x * x).sum
    val rhs = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(lhs - rhs) < 1e-9)
  }

  test("spectral: a pure sine concentrates in its band, centroid near its freq") {
    val sr = Multimodal.Wav.SampleRate // samples/sec
    val freq = 3500.0 // mid-band: 3000 would land exactly on a band edge
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freq * i / sr) * 20000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = Multimodal.Wav.encode(pcm)
    val (centroid, fracs) = Multimodal.Wav.spectral(wav, 8)
    assert(math.abs(centroid - freq) < 100.0, s"centroid $centroid")
    // band of 3 kHz at 8 bands over sr/2: band idx = floor(3000/(sr/2/8))
    val bandWidth = sr / 2.0 / 8
    val idx = (freq / bandWidth).toInt
    assert(fracs(idx) > 0.95, fracs.mkString(", "))
    // silence → zero spectrum
    val (c0, f0) = Multimodal.Wav.spectral(
      Multimodal.Wav.encode(new Array[Byte](2000)), 8)
    assert(c0 == 0.0 && f0.forall(_ == 0.0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal.Wav

/** The lock-free RIFF codec must be indistinguishable from the
  * `javax.sound.sampled` path it replaced on the hot path: the
  * multimodal oracles pin md5 digests of the ENCODED BYTES, so encode
  * must be bit-identical to `AudioSystem.write`, and decode must invert
  * both its own output and javax-written files (plus non-canonical but
  * valid containers the fast path may meet in the wild). */
class WavCodecSpec extends AnyFunSuite {

  private def javaxEncode(pcm: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(Wav.SampleRate, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def pcmOf(n: Int, seed: Int): Array[Byte] = {
    val a = new Array[Byte](n * 2)
    var i = 0
    while (i < a.length) {
      a(i) = ((seed * 31 + i * 131) & 0xFF).toByte
      i += 1
    }
    a
  }

  test("encode is bit-identical to AudioSystem.write across clip shapes") {
    for ((n, seed) <- Seq((0, 1), (1, 2), (7, 3), (64, 4), (4160, 5),
        (16000, 6))) {
      val pcm = pcmOf(n, seed)
      assert(java.util.Arrays.equals(Wav.encode(pcm), javaxEncode(pcm)),
        s"n=$n")
    }
  }

  test("decode inverts encode and javax-encoded files") {
    val pcm = pcmOf(4160, 7)
    val viaOwn = Wav.decode(Wav.encode(pcm))
    val viaJavax = Wav.decode(javaxEncode(pcm))
    assert(viaOwn.length == 4160 && viaOwn.sameElements(viaJavax))
    val le = (i: Int) =>
      ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort
    assert((0 until 4160).forall(i => viaOwn(i) == le(i)))
  }

  test("fast path handles extra chunks and word-aligned odd sizes") {
    // hand-build: RIFF [LIST(5, padded)] fmt data — the fast path must
    // skip unknown chunks and honor the odd-size pad byte
    val pcm = pcmOf(16, 9)
    val canonical = Wav.encode(pcm)
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(canonical, 0, 12) // RIFF size WAVE (size now wrong: ok)
    extra.write("LIST".getBytes("US-ASCII"))
    extra.write(Array[Byte](5, 0, 0, 0)) // odd size → 1 pad byte
    extra.write(Array[Byte](1, 2, 3, 4, 5, 0))
    extra.write(canonical, 12, canonical.length - 12)
    val out = extra.toByteArray
    // patch RIFF size so javax (the arbiter) also accepts it
    val riffLen = out.length - 8
    out(4) = (riffLen & 0xFF).toByte
    out(5) = ((riffLen >> 8) & 0xFF).toByte
    out(6) = ((riffLen >> 16) & 0xFF).toByte
    out(7) = ((riffLen >> 24) & 0xFF).toByte
    assert(Wav.decode(out).sameElements(Wav.decode(canonical)))
  }

  test("non-audio still fails loudly") {
    intercept[IllegalArgumentException] {
      Wav.decode("definitely not a wav".getBytes("US-ASCII"))
    }
  }
}

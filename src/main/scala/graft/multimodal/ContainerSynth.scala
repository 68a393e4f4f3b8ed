package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Byte-exact ISO-BMFF / EBML builders (public specs ISO/IEC 14496-12 /
  * Matroska) — synthesize minimal real containers for the probe gate
  * query, the container spec, and the fuzz properties. */
object ContainerSynth {

  // ---- mp4 ----

  def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(typ.getBytes("ISO-8859-1"))
    out.put(payload)
    out.array()
  }

  def cat(bs: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    bs.foreach(o.write)
    o.toByteArray
  }

  def mvhd(timescale: Int, duration: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(100) // version0 mvhd payload
    b.putInt(0)          // version+flags
    b.putInt(0).putInt(0) // ctime mtime
    b.putInt(timescale).putInt(duration)
    box("mvhd", b.array())
  }

  def tkhd(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(84)
    b.position(84 - 8)
    b.putInt(w << 16).putInt(h << 16) // 16.16 fixed, last 8 bytes
    box("tkhd", b.array())
  }

  def hdlr(handler: String): Array[Byte] = {
    val b = ByteBuffer.allocate(16)
    b.putInt(0).putInt(0)
    b.put(handler.getBytes("ISO-8859-1"))
    box("hdlr", b.array())
  }

  def stts(entries: Seq[(Int, Int)]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + entries.size * 8)
    b.putInt(0).putInt(entries.size)
    entries.foreach { case (n, d) => b.putInt(n).putInt(d) }
    box("stts", b.array())
  }

  /** One complete track: tkhd dims + mdia(hdlr + stbl/stts). */
  def trak(handler: String, w: Int, h: Int,
      sttsEntries: Seq[(Int, Int)]): Array[Byte] =
    box("trak", cat(
      tkhd(w, h),
      box("mdia", cat(
        hdlr(handler),
        box("minf", box("stbl", stts(sttsEntries)))))))

  def mp4File(traks: Array[Byte]*): Array[Byte] =
    mp4FileTimed(600, 1800, traks: _*)

  def mp4FileTimed(timescale: Int, duration: Int,
      traks: Array[Byte]*): Array[Byte] = {
    val ftyp = box("ftyp", "isom   isomiso2".getBytes("ISO-8859-1"))
    val moov = box("moov", cat(
      (mvhd(timescale, duration) +: traks): _*))
    cat(ftyp, moov, box("mdat", Array[Byte](1, 2, 3)))
  }

  // ---- webm / EBML ----

  def ebmlId(id: Long): Array[Byte] = {
    // ids are stored marker-inclusive: emit the minimal big-endian bytes
    val w = math.max(1,
      (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
    val b = new Array[Byte](w)
    var i = w - 1; var v = id
    while (i >= 0) { b(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
    b
  }

  def ebmlSize(n: Int): Array[Byte] = {
    require(n < 0x7f, "one-byte sizes only in fixtures")
    Array((0x80 | n).toByte)
  }

  def el(id: Long, payload: Array[Byte]): Array[Byte] =
    cat(ebmlId(id), ebmlSize(payload.length), payload)

  /** Element with the one-byte UNKNOWN-size marker (0xFF): standard for
    * the Segment of streamed/live WebM — payload runs to EOF. */
  def elUnknownSize(id: Long, payload: Array[Byte]): Array[Byte] =
    cat(ebmlId(id), Array(0xff.toByte), payload)

  def uintBytes(v: Long): Array[Byte] = {
    var w = 1
    while ((v >> (8 * w)) != 0) w += 1
    val b = new Array[Byte](w)
    var i = w - 1; var x = v
    while (i >= 0) { b(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    b
  }

  def webmSegmentPayload(durationTicks: Double = 2500.0,
      w: Int = 1280, h: Int = 720): Array[Byte] = {
    val info = el(0x1549a966L, cat(
      el(0x2ad7b1L, uintBytes(1000000L)), // 1 ms ticks
      el(0x4489L, { // float duration in ticks
        val b = ByteBuffer.allocate(8); b.putDouble(durationTicks); b.array()
      })))
    val video = el(0xe0L, cat(
      el(0xb0L, uintBytes(w)), el(0xbaL, uintBytes(h))))
    val track = el(0xaeL, cat(el(0x83L, uintBytes(1)), video))
    cat(info, el(0x1654ae6bL, track))
  }

  def webmFile(unknownSegmentSize: Boolean = false,
      durationTicks: Double = 2500.0,
      w: Int = 1280, h: Int = 720): Array[Byte] = {
    val header = el(0x1a45dfa3L, el(0x4282L, "webm".getBytes("ISO-8859-1")))
    val payload = webmSegmentPayload(durationTicks, w, h)
    val seg =
      if (unknownSegmentSize) elUnknownSize(0x18538067L, payload)
      else el(0x18538067L, payload)
    cat(header, seg)
  }

  /** The gate fixture: one real container per documents row, every
    * metadata field a CLOSED FORM of doc_id the DuckDB oracle replicates
    * with integer arithmetic — even ids an mp4 (video+audio traks; the
    * audio stts must NOT count toward n_samples), odd ids a webm.
    * mp4 duration stays exact under the probe's `duration*1000/600`
    * because every duration is a multiple of 600/gcd(1000,600)=3·… —
    * entries are multiples of 30 ticks, 30·1000/600 = 50 ms exactly. */
  def forDoc(id: Long): Array[Byte] =
    if (id % 2 == 0)
      mp4FileTimed(600, (600 + (id % 100) * 30).toInt,
        trak("vide", (320 + (id % 8) * 16).toInt, (180 + (id % 8) * 9).toInt,
          Seq(((24 + (id % 10)).toInt, 1000), (6, 500))),
        trak("soun", 0, 0, Seq(48000 -> 1)))
    else
      webmFile(unknownSegmentSize = id % 4 == 3,
        durationTicks = (2000 + (id % 50) * 20).toDouble,
        w = (640 + (id % 16) * 8).toInt, h = (360 + (id % 16) * 4).toInt)
}

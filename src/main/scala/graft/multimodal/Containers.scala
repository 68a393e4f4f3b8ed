package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL container-metadata probes for the two video formats whose frame
  * decode is stubbed (mp4/webm sample data needs codecs this container
  * does not ship — but the CONTAINERS are plain structured bytes):
  *
  *   - **MP4 / ISO BMFF** (public spec ISO/IEC 14496-12): a tree of
  *     size+fourcc boxes. The walker reads `ftyp` (major brand),
  *     `moov/mvhd` (timescale + duration), each `trak`'s `tkhd`
  *     (presentation width/height, 16.16 fixed point), `mdia/hdlr`
  *     (handler type — `vide`/`soun`), and the `stbl/stts` decoding
  *     time-to-sample table (total sample/frame count).
  *   - **WebM / EBML** (public Matroska spec): length-prefixed elements
  *     with varint ids/sizes. The prober reads the EBML header DocType,
  *     `Segment → Info` (TimestampScale, Duration) and
  *     `Tracks → TrackEntry` (track type, Video PixelWidth/PixelHeight).
  *
  * Metadata is what the pipeline's schema/partitioning layer needs
  * (duration for frame timestamps, dimensions for resize planning,
  * sample counts for cost estimates); pixel decode itself remains the
  * clearly-marked stub until codecs exist.
  */
object Containers {

  final case class VideoMeta(container: String, brandOrDocType: String,
      durationMs: Long, width: Int, height: Int, nSamples: Long,
      trackTypes: Seq[String])

  // ---- MP4 (ISO base media file format) --------------------------------

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && fourcc(bytes, 4) == "ftyp"

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  private def u32(b: ByteBuffer): Long = b.getInt().toLong & 0xffffffffL

  /** Walk the top-level (or a container box's) children, invoking `f`
    * with (fourcc, payloadStart, payloadEnd). 64-bit largesize boxes
    * are honored; malformed sizes stop the walk. */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val buf = ByteBuffer.wrap(b, off, end - off).order(ByteOrder.BIG_ENDIAN)
      var size = u32(buf)
      val typ = fourcc(b, off + 4)
      var payload = off + 8
      if (size == 1 && off + 16 <= end) { // largesize
        size = ByteBuffer.wrap(b, off + 8, 8).getLong()
        payload = off + 16
      } else if (size == 0) size = (end - off).toLong // box runs to EOF
      val boxEnd = off + size
      if (size < 8 || boxEnd > end) return // malformed: stop
      f(typ, payload, boxEnd.toInt)
      off = boxEnd.toInt
    }
  }

  /** Probe an MP4 payload's container metadata. Returns None when the
    * bytes are not ISO BMFF. */
  def probeMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isMp4(bytes)) return None
    var brand = ""
    var durationMs = 0L
    var width = 0
    var height = 0
    var nSamples = 0L
    val tracks = scala.collection.mutable.ListBuffer.empty[String]
    walkBoxes(bytes, 0, bytes.length) { (typ, s, e) =>
      typ match {
        case "ftyp" if e - s >= 4 => brand = fourcc(bytes, s)
        case "moov" =>
          walkBoxes(bytes, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" if e2 - s2 >= 20 =>
                val v = bytes(s2) & 0xff // version byte
                // v0 needs 16 payload bytes after version+flags, v1 needs
                // 28 — guard per version (a crafted v1 byte on a short
                // box must not underflow the buffer)
                if (v != 1 || e2 - s2 >= 32) {
                  val bb = ByteBuffer.wrap(bytes, s2 + 4, e2 - s2 - 4)
                    .order(ByteOrder.BIG_ENDIAN)
                  val (timescale, duration) =
                    if (v == 1) { bb.getLong(); bb.getLong(); (u32(bb), bb.getLong()) }
                    else { bb.getInt(); bb.getInt(); (u32(bb), u32(bb)) }
                  if (timescale > 0 && duration >= 0)
                    durationMs = duration * 1000L / timescale
                }
              case "trak" =>
                walkBoxes(bytes, s2, e2) { (t3, s3, e3) =>
                  t3 match {
                    case "tkhd" if e3 - s3 >= 84 =>
                      // width/height are the LAST two 16.16 fields
                      val bw = ByteBuffer.wrap(bytes, e3 - 8, 8)
                        .order(ByteOrder.BIG_ENDIAN)
                      val w = (u32(bw) >> 16).toInt
                      val h = (u32(bw) >> 16).toInt
                      if (w > 0 && h > 0) { width = w; height = h }
                    case "mdia" =>
                      // two passes: hdlr first (box order inside mdia is
                      // not guaranteed), then count stts samples ONLY for
                      // the video track — an audio trak's stts entries
                      // would otherwise inflate nSamples far beyond the
                      // frame count the doc promises for cost estimation
                      var handler = ""
                      walkBoxes(bytes, s3, e3) { (t4, s4, e4) =>
                        if (t4 == "hdlr" && e4 - s4 >= 12)
                          handler = fourcc(bytes, s4 + 8)
                      }
                      if (handler.nonEmpty) tracks += handler
                      if (handler == "vide")
                        walkBoxes(bytes, s3, e3) { (t4, s4, e4) =>
                          if (t4 == "minf")
                            walkBoxes(bytes, s4, e4) { (t5, s5, e5) =>
                              if (t5 == "stbl")
                                walkBoxes(bytes, s5, e5) { (t6, s6, e6) =>
                                  if (t6 == "stts" && e6 - s6 >= 8) {
                                    val bb = ByteBuffer.wrap(bytes, s6 + 4,
                                      e6 - s6 - 4).order(ByteOrder.BIG_ENDIAN)
                                    val n = u32(bb)
                                    var i = 0L
                                    while (i < n && bb.remaining() >= 8) {
                                      nSamples += u32(bb) // sample_count
                                      bb.getInt()         // sample_delta
                                      i += 1
                                    }
                                  }
                                }
                            }
                        }
                    case _ => ()
                  }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    Some(VideoMeta("mp4", brand, durationMs, width, height, nSamples,
      tracks.toList))
  }

  // ---- WebM (EBML / Matroska) ------------------------------------------

  def isEbml(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a &&
      (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
      (bytes(3) & 0xff) == 0xa3

  /** EBML varint: leading zero bits of the first byte give the width;
    * returns (value, bytesRead). `keepMarker` keeps the length-marker
    * bit (element IDs are compared marker-inclusive). */
  private def varint(b: Array[Byte], off: Int, keepMarker: Boolean)
      : (Long, Int) = {
    if (off >= b.length) return (-1L, 0)
    val first = b(off) & 0xff
    if (first == 0) return (-1L, 0)
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (off + width > b.length) return (-1L, 0)
    var v: Long = if (keepMarker) first.toLong
      else first & ((1 << (8 - width)) - 1)
    var i = 1
    while (i < width) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, width)
  }

  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt)
      .toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
    else 0.0

  private def walkEbml(b: Array[Byte], start: Int, end: Int)
      (f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      val (id, idW) = varint(b, off, keepMarker = true)
      if (idW == 0) return
      val (size, szW) = varint(b, off + idW, keepMarker = false)
      if (szW == 0) return
      val payload = off + idW + szW
      if (size < 0 || payload > end) return
      // the all-VINT_DATA-ones size is the EBML "unknown size" marker —
      // standard for the Segment element of streamed/live WebM; such an
      // element runs to the enclosing end rather than aborting the walk
      val unknownSize = size == (1L << (7 * szW)) - 1
      // Long arithmetic: a 56-bit crafted size must not wrap an Int
      val pEnd: Long = if (unknownSize) end.toLong else payload.toLong + size
      if (pEnd > end) return
      f(id, payload, pEnd.toInt)
      off = pEnd.toInt
    }
  }

  // element ids (marker-inclusive), public Matroska registry
  private val EbmlHeader = 0x1a45dfa3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549a966L
  private val TimestampScale = 0x2ad7b1L
  private val DurationEl = 0x4489L
  private val Tracks = 0x1654ae6bL
  private val TrackEntry = 0xaeL
  private val TrackType = 0x83L
  private val Video = 0xe0L
  private val PixelWidth = 0xb0L
  private val PixelHeight = 0xbaL

  /** Probe a WebM/Matroska payload's container metadata. */
  def probeWebm(bytes: Array[Byte]): Option[VideoMeta] = {
    if (!isEbml(bytes)) return None
    var docType = ""
    var tsScale = 1000000L // EBML default: 1 ms
    var durationTicks = 0.0
    var width = 0
    var height = 0
    val tracks = scala.collection.mutable.ListBuffer.empty[String]
    walkEbml(bytes, 0, bytes.length) { (id, s, e) =>
      id match {
        case EbmlHeader =>
          walkEbml(bytes, s, e) { (id2, s2, e2) =>
            if (id2 == DocType)
              docType = new String(bytes, s2, e2 - s2, "ISO-8859-1")
                .takeWhile(_ != ' ')
          }
        case Segment =>
          walkEbml(bytes, s, e) { (id2, s2, e2) =>
            id2 match {
              case Info =>
                walkEbml(bytes, s2, e2) { (id3, s3, e3) =>
                  if (id3 == TimestampScale) tsScale = uintAt(bytes, s3, e3 - s3)
                  else if (id3 == DurationEl)
                    durationTicks = floatAt(bytes, s3, e3 - s3)
                }
              case Tracks =>
                walkEbml(bytes, s2, e2) { (id3, s3, e3) =>
                  if (id3 == TrackEntry)
                    walkEbml(bytes, s3, e3) { (id4, s4, e4) =>
                      id4 match {
                        case TrackType =>
                          tracks += (uintAt(bytes, s4, e4 - s4) match {
                            case 1 => "vide"; case 2 => "soun"
                            case t => t.toString
                          })
                        case Video =>
                          walkEbml(bytes, s4, e4) { (id5, s5, e5) =>
                            if (id5 == PixelWidth)
                              width = uintAt(bytes, s5, e5 - s5).toInt
                            else if (id5 == PixelHeight)
                              height = uintAt(bytes, s5, e5 - s5).toInt
                          }
                        case _ => ()
                      }
                    }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    val durMs = (durationTicks * tsScale / 1e6).toLong
    Some(VideoMeta("webm", docType, durMs, width, height, 0L,
      tracks.toList))
  }

  /** Dispatch on magic bytes. */
  def probe(bytes: Array[Byte]): Option[VideoMeta] =
    if (isMp4(bytes)) probeMp4(bytes)
    else if (isEbml(bytes)) probeWebm(bytes)
    else None
}

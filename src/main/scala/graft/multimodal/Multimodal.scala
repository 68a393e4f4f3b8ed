package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed by partition-parallel decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The DECODE KERNELS ARE STUBS (clearly marked): no image/audio codecs
  * ship in this container, so each kernel is a deterministic fake keyed on
  * the payload bytes. Everything AROUND the kernel — schema, batch shape,
  * partitioning, the mapPartitions plumbing, null/empty handling — is real
  * and tested; swapping in a JNI/OpenCV decoder changes only the function
  * body.
  *
  * Scale notes: media bytes never pass through a shuffle — stages are
  * narrow (mapPartitions) and run where the scan runs; only extracted
  * features (small) flow onward into joins/ANN. `binaryFile` reads +
  * `spark.sql.files.maxPartitionBytes` control split sizing for large blobs.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the envelope's `data` for a
    * media namespace). */
  final case class MediaRow(media_id: Long, mime: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(media_id: Long, mime: String, dim: Int,
      features: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
      bytes: Array[Byte])

  /** Deterministic synthetic media table derived from an id column —
    * the test fixture generator (payload = seeded pseudo-random bytes). */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String,
      payloadBytes: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val rnd = new scala.util.Random(id * 2654435761L)
      val bytes = Array.fill(payloadBytes)(rnd.nextInt(256).toByte)
      val mime = (id % 3) match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case _ => "video/mp4"
      }
      MediaRow(id, mime, bytes, 64 + (id % 64).toInt, 64, 1000 + (id % 9000))
    }
  }

  // ---- STUB KERNELS ----------------------------------------------------
  // Replace these bodies with real codecs (OpenCV/ffmpeg/soundfile) when
  // available. Signatures and determinism contracts stay identical.

  /** STUB: "decode" media bytes to a feature vector. Real impl: decode +
    * model forward pass. Fake: xxhash-style rolling over the payload. */
  private[multimodal] def stubDecodeFeatures(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (h & 0xFFFF).toFloat / 65535.0f - 0.5f
      i += 1
    }
    out
  }

  /** STUB: resize an image payload. Real impl: decode, resample, encode.
    * Fake: deterministic truncate/pad to a size-derived length. */
  private[multimodal] def stubResize(bytes: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val n = math.max(16, (w * h) / 64)
    java.util.Arrays.copyOf(bytes, n)
  }

  /** STUB: sample n frames from a video payload. Real impl: ffmpeg seek.
    * Fake: n deterministic slices. */
  private[multimodal] def stubFrames(bytes: Array[Byte],
      n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val start = if (bytes.isEmpty) 0 else (i * bytes.length / math.max(n, 1))
      java.util.Arrays.copyOfRange(bytes, start,
        math.min(bytes.length, start + 32))
    }

  // ---- real plumbing ---------------------------------------------------

  /** Feature extraction: mapPartitions so a real decoder amortizes
    * per-partition init (model load, codec context) across rows — the
    * standard batch-inference shape. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (load model / codec once)
      rows.map { r =>
        MediaFeatures(r.media_id, r.mime, dim,
          stubDecodeFeatures(r.bytes, dim))
      }
    }
  }

  /** Image resize stage — narrow, media stays partition-local. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int)
      : Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r =>
      if (r.mime.startsWith("image/"))
        r.copy(bytes = stubResize(r.bytes, w, h), width = w, height = h)
      else r)
  }

  /** Frame sampling: one media row → n frame rows (flatMap — the only
    * stage that grows row count; still narrow). */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.mime.startsWith("video/")).flatMap { r =>
      stubFrames(r.bytes, n).zipWithIndex.map { case (b, i) =>
        Frame(r.media_id, i, i.toLong * r.duration_ms / math.max(n, 1), b)
      }
    }
  }
}

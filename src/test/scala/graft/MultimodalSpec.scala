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
      Set("image/png", "audio/wav", "video/mp4"))
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

  test("resize touches only images; frame sampling only videos") {
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    resized.foreach { r =>
      if (r.mime == "image/png") assert(r.width == 32 && r.height == 32)
      else assert(r.width != 32 || r.height == 64)
    }
    val frames = Multimodal.sampleFrames(media, 4).collect()
    val videoCount = media.filter(_.mime == "video/mp4").count()
    assert(frames.length == videoCount * 4)
    assert(frames.forall(_.frame_idx < 4))
  }
}

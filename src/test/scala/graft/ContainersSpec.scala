package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Containers
import graft.multimodal.ContainerSynth._

/** Container-metadata probes (Containers.scala): hand-assembled minimal
  * ISO-BMFF and EBML payloads, byte-exact per the public specs — the
  * same build-the-bytes pattern the WKB spec uses. */
class ContainersSpec extends AnyFunSuite {

  test("mp4: ftyp brand, mvhd duration, tkhd dims, hdlr type, stts samples") {
    val mp4 = mp4File(trak("vide", 640, 360, Seq(24 -> 1000, 6 -> 500)))

    assert(Containers.isMp4(mp4))
    val m = Containers.probeMp4(mp4).get
    assert(m.container == "mp4" && m.brandOrDocType == "isom")
    assert(m.durationMs == 3000L) // 1800 ticks at 600/s
    assert(m.width == 640 && m.height == 360)
    assert(m.nSamples == 30L) // 24 + 6
    assert(m.trackTypes == Seq("vide"))
    // magic dispatch
    assert(Containers.probe(mp4).get.container == "mp4")
    assert(Containers.probe("not a video".getBytes).isEmpty)
  }

  test("mp4: audio trak's stts does NOT inflate nSamples (hdlr-gated)") {
    // audio stts entries typically dwarf video ones; nSamples documents
    // the VIDEO frame count for cost estimation, so only `vide` counts
    val mp4 = mp4File(
      trak("vide", 640, 360, Seq(24 -> 1000, 6 -> 500)),
      trak("soun", 0, 0, Seq(48000 -> 1)))
    val m = Containers.probeMp4(mp4).get
    assert(m.nSamples == 30L) // not 48030
    assert(m.trackTypes == Seq("vide", "soun"))
    assert(m.width == 640 && m.height == 360)
  }

  test("webm: doctype, duration via timestamp scale, track dims") {
    val webm = webmFile()
    assert(Containers.isEbml(webm))
    val m = Containers.probeWebm(webm).get
    assert(m.container == "webm" && m.brandOrDocType == "webm")
    assert(m.durationMs == 2500L)
    assert(m.width == 1280 && m.height == 720)
    assert(m.trackTypes == Seq("vide"))
    assert(Containers.probe(webm).get.container == "webm")
  }

  test("webm: unknown-size Segment (streamed/live form) still probes") {
    // the all-VINT_DATA-ones size marker is standard for the Segment of
    // a live-streamed WebM; it must clamp to EOF, not abort the walk
    val webm = webmFile(unknownSegmentSize = true)
    val m = Containers.probeWebm(webm).get
    assert(m.durationMs == 2500L)
    assert(m.width == 1280 && m.height == 720)
    assert(m.trackTypes == Seq("vide"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLinkIndex
import graft.queries.CurationOps

/** The single-maintainer claim protocol (r15 verdict #4, hardened r17)
  * and the in-flight-fold gc hazard (r15 ADVICE, closed structurally in
  * r17 by tmp-named fold sides + the claim-existence shield):
  *
  *   - a second compact racing the same index fails LOUDLY on the held
  *     claim (instead of folding the same sources into a twin
  *     generation, which would double-count every covered epoch);
  *   - the gc orphan sweep honors an EXISTING claim at any age — an
  *     in-flight fold's dirs survive even when aged — and crashed-fold
  *     recovery takes two gc passes: the first retires the aged claim,
  *     the second sweeps its orphan dirs, after which compaction
  *     proceeds normally (re-claiming the id, clearing leftovers);
  *   - a gc(0) landing MID-FOLD (between sides) never tears the fold —
  *     the tmp-named side dirs are shielded by the claim present at
  *     sweep time, and the fold commits intact (r16 verdict #4; the
  *     old graceMs-must-exceed-fold-duration constraint is gone);
  *   - a maintenance-only pass (no new epochs) still merges same-tier
  *     generations (the delta==0 tier-seed fix).
  */
class MaintenanceClaimSpec extends SparkSpec {

  private lazy val docs = graft.core.Tables.table(spark, sf, "documents")
    .select("doc_id", "text")

  private lazy val pages =
    CurationOps.crawlPages(docs, docs.count(), withText = true)

  private def ingestMod(cfg: IncrementalLinkIndex.Config, m: Int,
      e: Int): Unit =
    IncrementalLinkIndex.ingestBatch(cfg,
      pages.filter(pmod(col("doc_id"), lit(m)) === e),
      "doc_id", "url", "html", e.toLong)

  private def setAge(p: java.nio.file.Path, ageMs: Long): Unit =
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - ageMs))

  test("concurrent compact fails loudly on a held claim; gc reclaims a crashed one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-claim").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    (0 until 2).foreach(e => ingestMod(cfg, 3, e))

    // another maintainer holds the next gen id's claim (or a fold
    // crashed before its marker): compact must NOT proceed
    val claim = new java.io.File(s"${cfg.dir}/stats-compact/_claim_gen=0")
    claim.getParentFile.mkdirs()
    assert(claim.createNewFile())
    val e = intercept[IllegalStateException] {
      IncrementalLinkIndex.compact(spark, cfg)
    }
    assert(e.getMessage.contains("claim"), e.getMessage)

    // a young claim survives a graced gc; an aged one is reclaimed
    IncrementalLinkIndex.gc(spark, cfg) // default 1h grace
    assert(claim.exists(), "gc swept a young claim")
    IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)
    assert(!claim.exists(), "gc must reclaim an aged crashed claim")

    // ... after which compaction proceeds and cleans up its own claim
    assert(IncrementalLinkIndex.compact(spark, cfg).isDefined)
    assert(!claim.exists(),
      "a successful compact must remove its claim at the marker commit")
  }

  test("gc orphan sweep keeps an in-flight fold's dirs while its claim exists; crashed-fold recovery is two passes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-claim2").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    (0 until 2).foreach(e => ingestMod(cfg, 3, e))
    IncrementalLinkIndex.compact(spark, cfg) // gen 0 committed
    IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)

    // simulate an in-flight fold at gen 1: tmp-named side dir written
    // (and aged — a long fold), claim present (any age shields — the
    // r16 per-side mtime refresh is gone)
    val hour = 3600000L
    val links1 = java.nio.file.Paths.get(
      s"${cfg.dir}/links-compact/gen=1._tmp")
    java.nio.file.Files.createDirectories(links1)
    java.nio.file.Files.write(links1.resolve("part-0.parquet"),
      Array[Byte](1))
    setAge(links1, 2 * hour)
    val claim1 = java.nio.file.Paths.get(
      s"${cfg.dir}/stats-compact/_claim_gen=1")
    java.nio.file.Files.createFile(claim1)
    setAge(claim1, 2 * hour) // even an AGED claim shields the dirs

    // pass 1: dirs survive (claim existed at sweep time); the aged
    // claim itself is retired at the end of the pass
    IncrementalLinkIndex.gc(spark, cfg, graceMs = hour)
    assert(java.nio.file.Files.exists(links1),
      "gc swept an in-flight fold's side dir despite its claim")
    assert(!java.nio.file.Files.exists(claim1),
      "gc must retire an aged crashed claim")

    // pass 2: the now-unshielded orphan dirs are reclaimed
    IncrementalLinkIndex.gc(spark, cfg, graceMs = hour)
    assert(!java.nio.file.Files.exists(links1),
      "the second graced gc must reclaim the crashed fold's orphan dirs")

    // ... and compaction proceeds normally afterwards
    ingestMod(cfg, 3, 2)
    assert(IncrementalLinkIndex.compact(spark, cfg).isDefined)
  }

  test("gc(0) mid-fold (between sides) never tears the fold") {
    import graft.streaming.GenStore
    val tmp = java.nio.file.Files.createTempDirectory("graft-midgc").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    (0 until 3).foreach(e => ingestMod(cfg, 3, e))
    val sides = Seq(
      GenStore.Side("links", "b_mod", 4, Seq("src", "abs", "text")),
      GenStore.Side("urls", "b_mod", 4, Seq("url_norm", "dst")))
    val eps = GenStore.markedEpochs(spark, s"${cfg.dir}/stats")
    // inject ONE full immediate gc between the two sides' tmp writes —
    // the exact window the r16 protocol could only protect by keeping
    // graceMs above the fold duration (a single gc(0) is safe anywhere
    // inside a fold; only a gc LOOP at grace 0 is documented-unsafe,
    // since the first pass retires the claim)
    val swept = scala.collection.mutable.ArrayBuffer.empty[String]
    val st = GenStore.compact(spark, cfg.dir, sides, eps,
      afterSide = s => {
        if (swept.isEmpty)
          GenStore.gc(spark, cfg.dir, Seq("links", "urls"), graceMs = 0L)
        swept += s
      })
    assert(swept == Seq("links", "urls"), s"seam did not fire: $swept")
    assert(st.isDefined, "fold must commit despite the mid-fold gc(0)")
    // the committed generation is intact and serves the exact batch
    // answer (sidePresence would throw on a half-deleted index)
    IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)
    val ranked = IncrementalLinkIndex.rank(spark, cfg)
    assert(ranked.count() > 0)
    // and no tmp dirs or claims linger after the commit
    Seq("links-compact", "urls-compact").foreach { d =>
      val base = new java.io.File(s"${cfg.dir}/$d")
      assert(!base.listFiles().exists(_.getName.endsWith("._tmp")),
        s"tmp dir left behind under $d")
    }
    assert(!new java.io.File(s"${cfg.dir}/stats-compact")
      .listFiles().exists(_.getName.startsWith("_claim_gen=")),
      "claim left behind after the marker commit")
  }

  test("racing first builds of a materialized prior never tear a reader") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-prace").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    (0 until 2).foreach(e => ingestMod(cfg, 3, e))
    // two threads race the FIRST build (no maintenance pass has run):
    // both must return the full deterministic table, and the losing
    // writer's temp must be discarded — a reader can never list a
    // mid-overwrite dir because the promote is a rename
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence((1 to 2).map(_ => Future(
        IncrementalLinkIndex.rankPrior(spark, cfg).count()))),
      5.minutes)
    assert(counts.distinct.size == 1 && counts.head > 0, s"$counts")
    val expect = IncrementalLinkIndex.rank(spark, cfg).count()
    assert(counts.head == expect)
    // no temp dirs linger under rank-mat
    val mats = new java.io.File(s"${cfg.dir}/rank-mat").listFiles()
    assert(mats.nonEmpty &&
      !mats.exists(_.getName.contains("._tmp-")),
      s"rank-mat leftovers: ${mats.map(_.getName).mkString(",")}")
  }

  test("maintenance-only pass merges same-tier generations (delta==0 seed)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-claim3").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 2)
    // big gen 0 (most of the corpus), then two single-page generations
    IncrementalLinkIndex.ingestBatch(cfg,
      pages.filter(pmod(col("doc_id"), lit(6)) < 4), "doc_id", "url",
      "html", 0L)
    assert(IncrementalLinkIndex.compact(spark, cfg).get.gen == 0L)
    IncrementalLinkIndex.ingestBatch(cfg,
      pages.filter(col("doc_id") === 4), "doc_id", "url", "html", 1L)
    assert(IncrementalLinkIndex.compact(spark, cfg, sizeRatio = 2.0)
      .get.gen == 1L)
    IncrementalLinkIndex.ingestBatch(cfg,
      pages.filter(col("doc_id") === 10), "doc_id", "url", "html", 2L)
    // ratio low enough that the similar-sized gen 1 is NOT admitted
    val s2 = IncrementalLinkIndex.compact(spark, cfg, sizeRatio = 0.2).get
    assert(s2.gen == 2L && s2.foldedGens.isEmpty, s"$s2")

    // maintenance-only pass (no new epochs): the two small generations
    // merge, the big one stays — the old max(delta,1)-byte seed
    // returned None here forever
    val s3 = IncrementalLinkIndex.compact(spark, cfg, sizeRatio = 2.0).get
    assert(s3.gen == 3L && s3.foldedGens == Seq(1L, 2L) &&
      s3.foldedEpochs == Seq(1L, 2L),
      s"maintenance-only fold should merge the small generations: $s3")
    IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)

    // the merged view still equals a plain uncompacted twin
    val plain = IncrementalLinkIndex.Config(s"$tmp/plain", hashBuckets = 2)
    IncrementalLinkIndex.ingestBatch(plain,
      pages.filter(pmod(col("doc_id"), lit(6)) < 4), "doc_id", "url",
      "html", 0L)
    IncrementalLinkIndex.ingestBatch(plain,
      pages.filter(col("doc_id") === 4), "doc_id", "url", "html", 1L)
    IncrementalLinkIndex.ingestBatch(plain,
      pages.filter(col("doc_id") === 10), "doc_id", "url", "html", 2L)
    def snap(c: IncrementalLinkIndex.Config) =
      IncrementalLinkIndex.rank(spark, c).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(snap(cfg) == snap(plain),
      "post-merge view != plain epoch view")
  }
}

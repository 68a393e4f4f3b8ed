package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLinkIndex
import graft.queries.CurationOps

/** The r16 single-maintainer claim protocol (r15 verdict #4) and the
  * in-flight-fold gc hazard (r15 ADVICE):
  *
  *   - a second compact racing the same index fails LOUDLY on the held
  *     claim (instead of folding the same sources into a twin
  *     generation, which would double-count every covered epoch);
  *   - the gc orphan sweep honors a LIVE claim — an in-flight fold's
  *     side dirs survive even when the dirs themselves are aged — and
  *     reclaims a crashed (aged) claim together with its orphan dirs,
  *     after which compaction proceeds normally;
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

  test("gc orphan sweep keeps an in-flight fold's dirs while its claim is live") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-claim2").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    (0 until 2).foreach(e => ingestMod(cfg, 3, e))
    IncrementalLinkIndex.compact(spark, cfg) // gen 0 committed
    IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)

    // simulate an in-flight fold at gen 1: side dirs written (and aged
    // — a long fold), claim FRESH (compact refreshes it per side)
    val hour = 3600000L
    val links1 = java.nio.file.Paths.get(s"${cfg.dir}/links-compact/gen=1")
    java.nio.file.Files.createDirectories(links1)
    java.nio.file.Files.write(links1.resolve("part-0.parquet"),
      Array[Byte](1))
    setAge(links1, 2 * hour)
    val claim1 = java.nio.file.Paths.get(
      s"${cfg.dir}/stats-compact/_claim_gen=1")
    java.nio.file.Files.createFile(claim1)

    IncrementalLinkIndex.gc(spark, cfg, graceMs = hour)
    assert(java.nio.file.Files.exists(links1),
      "gc swept an in-flight fold's side dir despite its live claim")

    // the fold crashes (claim goes stale): the next graced gc reclaims
    // dirs AND claim
    setAge(claim1, 2 * hour)
    IncrementalLinkIndex.gc(spark, cfg, graceMs = hour)
    assert(!java.nio.file.Files.exists(links1) &&
      !java.nio.file.Files.exists(claim1),
      "gc must reclaim an aged crashed fold (dirs + claim)")
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

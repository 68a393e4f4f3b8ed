package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

/** Fixed-point PageRank: exact-integer contract against a local replica,
  * layout independence, mass conservation, personalization semantics. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Local exact-integer replica of the recurrence — independent code
    * path (plain Scala maps), same arithmetic contract. */
  private def replica(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val outd = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val r0 = Scale / seeds.size
    val base = (15L * r0) / 100L
    var r = nodes.map(i => i -> (if (seeds(i)) r0 else 0L)).toMap
    for (_ <- 1 to iters) {
      val sm = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outd(s) }.sum }
      r = nodes.map(i =>
        i -> ((if (seeds(i)) base else 0L) + 85L * sm.getOrElse(i, 0L) / 100L))
        .toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  teleport: Option[org.apache.spark.sql.Column],
                  iters: Int, parts: Int = 1): Map[Long, Long] = {
    val e = edges.toDF("src", "dst").repartition(parts)
    val nd = nodes.toDF("id").repartition(parts)
    Graphs.pageRank(e, "src", "dst", nd, "id", iters = iters,
        teleport = teleport)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // a small asymmetric graph: a hub (everyone links to 0), a chain, a
  // self-loop, a dangling node (4 has no out-edges), a multi-edge
  private val nodes = (0L to 5L).toSeq
  private val edges = Seq[(Long, Long)](
    (1, 0), (2, 0), (3, 0), (5, 0), // hub in-links
    (1, 2), (2, 3), (3, 4),         // chain
    (5, 5),                         // self-loop
    (1, 0))                         // multi-edge: 1 -> 0 twice

  test("matches the exact-integer local replica (uniform teleport)") {
    for (iters <- Seq(0, 1, 3, 7)) {
      val got = run(edges, nodes, None, iters)
      val exp = replica(edges, nodes, nodes.toSet, iters)
      assert(got === exp, s"iters=$iters")
    }
  }

  test("bit-identical under any partition layout") {
    val one = run(edges, nodes, None, 5, parts = 1)
    val many = run(edges, nodes, None, 5, parts = 7)
    assert(one === many)
  }

  test("mass is conserved up to floor leak, never created") {
    // dangling nodes (0 and 4 have no out-edges) leak their whole share
    // each round by design — mass still never exceeds scale
    val dangling = run(edges, nodes, None, 5)
    assert(dangling.values.sum <= Scale)
    // on a dangling-free graph the only loss is the floor leak:
    // ≤ |E| + |V| units per round — negligible against scale
    val closed = edges ++ Seq[(Long, Long)]((0L, 1L), (4L, 0L))
    val got = run(closed, nodes, None, 5)
    val total = got.values.sum
    assert(total <= Scale)
    assert(total > Scale - 5L * (closed.size + nodes.size) - nodes.size,
      s"leak beyond the floor bound: $total")
    // every rank at least the damped teleport base
    val base = (15L * (Scale / nodes.size)) / 100L
    assert(got.values.forall(_ >= base))
    assert(got === replica(closed, nodes, nodes.toSet, 5))
  }

  test("the hub outranks every chain node") {
    val got = run(edges, nodes, None, 5)
    assert(nodes.filter(_ != 0L).forall(i => got(0L) > got(i)))
  }

  test("personalized: mass flows only from the seed set") {
    // seed only node 1: node 5 (its own island) must score exactly 0,
    // reachable nodes strictly positive
    val got = run(edges, nodes, Some(col("id") === 1L), 5)
    val exp = replica(edges, nodes, Set(1L), 5)
    assert(got === exp)
    assert(got(5L) === 0L)
    assert(got(0L) > 0L && got(2L) > 0L)
  }

  test("deep iteration counts cross the lineage fence unchanged") {
    // fenceEvery=2 re-roots mid-run; values must equal the replica
    val e = edges.toDF("src", "dst")
    val nd = nodes.toDF("id")
    val got = Graphs.pageRank(e, "src", "dst", nd, "id", iters = 6,
        fenceEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === replica(edges, nodes, nodes.toSet, 6))
  }

  test("null endpoints are inert but count toward out-degree") {
    val e = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(0L)), // the one live edge
      (Some(1L), None),     // null dst: leaks, but splits 1's mass
      (None, Some(0L)))     // null src: contributes nothing
      .toDF("src", "dst")
    val nd = Seq(0L, 1L).toDF("id")
    val got = Graphs.pageRank(e, "src", "dst", nd, "id", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-rolled recurrence: outdeg(1) = 2 (null-dst edge included),
    // node 0 receives r1/2 each round, node 1 receives nothing
    val r0 = Scale / 2
    val base = 15L * r0 / 100L
    val after1 = Map(0L -> (base + 85L * (r0 / 2) / 100L), 1L -> base)
    val after2 = Map(0L -> (base + 85L * (after1(1L) / 2) / 100L),
      1L -> base)
    assert(got === after2)
  }

  test("link_rank transform: recovers the graph from markup and annotates") {
    // three crawl records; page 1 and 2 both link to page 0 (absolute
    // cross-site + root-relative same-site), page 0 links only off-corpus
    val rows = Seq(
      (0L, "https://a.example.com/p/0",
        "<p>x</p><a href=\"https://elsewhere.org/\">out</a>"),
      (1L, "https://b.example.org/p/1",
        "<a href=\"https://a.example.com/p/0\">zero</a>" +
          "<a href=\"/nope\">same-site miss</a>"),
      (2L, "https://a.example.com/p/2",
        "<a href=\"/p/0\">zero by root-relative</a>")
    ).toDF("doc_id", "url", "html")
    val out = graft.pipeline.Registry.transforms("link_rank")(Map.empty)(rows)
    val got = out.select("doc_id", "rank_fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replica over the recovered graph: 1->0 and 2->0 survive the
    // canonical join (each page's ONLY intra-corpus link, so outdeg 1
    // each... except page 1 also emits /nope which misses the corpus —
    // but outdeg counts only RECOVERED edges, so both contribute r/1)
    val exp = replica(Seq((1L, 0L), (2L, 0L)), Seq(0L, 1L, 2L),
      Set(0L, 1L, 2L), 5)
    assert(got === exp)
    assert(got(0L) > got(1L) && got(1L) === got(2L))
    assert(out.columns.toSeq ===
      Seq("doc_id", "url", "html", "rank_fp"))
  }

  private val HitsScale = 1000000000L

  /** Local exact-integer HITS replica (alternating update, floor-quotient
    * rescale) — independent of the Spark path. */
  private def hitsReplica(edges: Seq[(Long, Long)], nodes: Seq[Long],
                          iters: Int): Map[Long, (Long, Long)] = {
    var h = nodes.map(_ -> HitsScale).toMap
    var a = h
    for (_ <- 1 to iters) {
      val ar = nodes.map(i => i -> edges.collect {
        case (s, d) if d == i => h(s) }.sum).toMap
      val qa = math.max(ar.values.max / HitsScale, 1L)
      a = ar.map { case (k, v) => k -> v / qa }
      val hr = nodes.map(i => i -> edges.collect {
        case (s, d) if s == i => a(d) }.sum).toMap
      val qh = math.max(hr.values.max / HitsScale, 1L)
      h = hr.map { case (k, v) => k -> v / qh }
    }
    nodes.map(i => i -> (a(i), h(i))).toMap
  }

  test("hits matches the exact-integer replica and separates hub from authority") {
    // a directory page (node 5) links to everything; everything links to
    // the reference page (node 0); 0 links nowhere
    val nodes = (0L to 5L).toSeq
    val edges = (1L to 5L).map(i => (i, 0L)) ++
      (1L to 4L).map(d => (5L, d))
    for (parts <- Seq(1, 7); iters <- Seq(1, 3)) {
      val got = Graphs.hits(edges.toDF("src", "dst").repartition(parts),
          "src", "dst", nodes.toDF("id").repartition(parts), "id",
          iters = iters)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got === hitsReplica(edges, nodes, iters),
        s"parts=$parts iters=$iters")
    }
    val g = Graphs.hits(edges.toDF("src", "dst"), "src", "dst",
        nodes.toDF("id"), "id", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // node 0: best authority, zero hub (no out-edges); node 5: best hub
    assert(nodes.filter(_ != 0L).forall(i => g(0L)._1 > g(i)._1))
    assert(g(0L)._2 === 0L)
    assert(nodes.filter(_ != 5L).forall(i => g(5L)._2 > g(i)._2))
  }

  test("rejects an empty teleport set and overflow-risking scales") {
    val e = edges.toDF("src", "dst")
    val nd = nodes.toDF("id")
    intercept[IllegalArgumentException] {
      Graphs.pageRank(e, "src", "dst", nd, "id",
        teleport = Some(col("id") < 0L))
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRank(e, "src", "dst", nd, "id", scale = Long.MaxValue / 10)
    }
  }
}

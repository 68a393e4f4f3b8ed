package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import graft.operators.{Clustering, Dedup}

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Reference components via union-find (driver-side, test scale only). */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  test("chain transitivity: a-b, b-c, c-d collapse to one component") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Clustering.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("self-loops and nulls are dropped; empty edges yield empty output") {
    val edges = Seq((Some(5L), Some(5L)), (Some(6L), None))
      .toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(edges, "id_a", "id_b").isEmpty)
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(none, "id_a", "id_b").isEmpty)
  }

  test("string node ids cluster with lexicographic min as label") {
    val edges = Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("id_a", "id_b")
    val out = Clustering.connectedComponents(edges, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("property: star CC == union-find on random graphs") {
    val genGraph = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield (n, edges)

    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val clean = edges.filter { case (a, b) => a != b }.distinct
      val expected = unionFind(n, clean)
      val got =
        if (clean.isEmpty) Map.empty[Long, Long]
        else Clustering.connectedComponents(
          clean.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("clusterAssign labels every doc; kept = one representative per cluster") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assign = Dedup.clusterAssign(docs, "doc_id", "text",
      jaccardThreshold = 0.8)
    assert(assign.count() == docs.count())
    // representative of every cluster is a member with the min id
    val bad = assign.groupBy("cluster_id")
      .agg(min("doc_id").as("mn"))
      .filter(col("mn") =!= col("cluster_id"))
    assert(bad.isEmpty)
    val kept = Dedup.clusterKept(docs, "doc_id", "text",
      jaccardThreshold = 0.8)
    assert(kept.count() ==
      assign.select("cluster_id").distinct().count())
    // clusterKept never keeps more docs than the one-hop minhashKept drops:
    // transitive closure can only merge clusters, never split them
    val oneHop = Dedup.minhashKept(docs, "doc_id", "text",
      jaccardThreshold = 0.8)
    assert(kept.count() >= oneHop.count())
  }
}

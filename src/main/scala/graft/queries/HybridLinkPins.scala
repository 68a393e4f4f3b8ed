package graft.queries

/** Pinned oracles for the link-prior hybrid retrieval rows (r15) —
  * regenerated with `scripts/pin_layouts.sh hybrid_link_rrf
  * hybrid_link_incr_rrf` (dumps at 4 AND 32 cores, refuses to print
  * unless bit-identical). Pinnable because every stage is
  * layout-independent: BM25/tf-idf contributions on exact integer
  * grids, PageRank an integer fixed point, the prior arm a
  * deterministic bounded-heap top-k (ties score desc, id asc), and RRF
  * integer arithmetic over arm ranks. HybridRrfSpec holds the
  * independent local replica of the three-arm fusion. */
private[queries] object HybridLinkPins {

  /** BM25 + hashed-tf-idf + PageRank prior, perArm 20, k 5. */
  val batch: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(13 AS BIGINT), CAST(32002047 AS BIGINT)),
      |  (0, 2, 202, 30092072),
      |  (0, 3, 251, 30017920),
      |  (0, 4, 269, 29850746),
      |  (0, 5, 58, 29469122),
      |  (1, 1, 352, 32002047),
      |  (1, 2, 46, 31778057),
      |  (1, 3, 216, 29910714),
      |  (1, 4, 102, 28949544),
      |  (1, 5, 417, 28860027))
      |AS t(query_id, rank, doc_id, rrf_e9)
      |ORDER BY query_id, rank""".stripMargin

  /** Incremental BM25 probe + link-index rank prior, perArm 20, k 5. */
  val incr: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(104 AS BIGINT), CAST(16393442 AS BIGINT)),
      |  (0, 2, 471, 16393442),
      |  (0, 3, 13, 16129032),
      |  (0, 4, 210, 16129032),
      |  (0, 5, 174, 15873015),
      |  (1, 1, 64, 28484848),
      |  (1, 2, 181, 27212143),
      |  (1, 3, 80, 26742734),
      |  (1, 4, 46, 16393442),
      |  (1, 5, 471, 16393442))
      |AS t(query_id, rank, doc_id, rrf_e9)
      |ORDER BY query_id, rank""".stripMargin
}

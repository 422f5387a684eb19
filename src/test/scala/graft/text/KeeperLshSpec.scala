package graft.text

import graft.GraftSuite

/** q272 — the q268 keeper rule over the LSH-tier clusters, pinned in the
  * q148/q90_lsh precision-recall posture against the exact tier on the
  * mid fixture:
  *
  *  - PRECISION 1.0 structurally: LSH edges are exact-verified at the
  *    same Jaccard gate, so LSH clusters refine exact clusters; a doc
  *    dropped on the LSH tier lost its sub-cluster's (score DESC,
  *    doc_id) argmax, and that winner is still present in the enclosing
  *    exact cluster — so the doc loses there too. Any LSH drop outside
  *    the exact drop set is a bug, not recall noise.
  *  - RECALL on the DROP set (the dedup-relevant decision — "this copy
  *    is removed"): >= the pinned bound. Measured r18: 1.0 at BOTH
  *    sf0.01 (24/24 drops) and sf0.1 (244/244, zero leaked) — on these
  *    fixtures the 8-band/8-row signature recovers every exact-tier
  *    near-dup pair, so no cluster splits where the argmax decision
  *    differs. Pinned at 0.85 — half the margin between the old 0.7
  *    floor and observed (the RollupPctlSpec discipline), so a banding
  *    regression can't hide under the floor while fixture-regeneration
  *    noise still has room.
  *  - Internal consistency: exactly one keeper per LSH cluster, scores
  *    identical to the exact tier's (same q234 fold).
  */
class KeeperLshSpec extends GraftSuite {

  test("q272: LSH-tier drops ⊆ exact-tier drops; recall >= 0.85; one keeper per cluster") {
    def rowsOf(name: String): Array[(Long, Long, Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf01).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exact = rowsOf("q268_quality_keeper")
    val lsh = rowsOf("q272_quality_keeper_lsh")

    // same doc set, same scores (the q234 fold is tier-independent)
    val exScore = exact.map(r => r._1 -> r._3).toMap
    assert(lsh.length == exact.length, "tiers cover different doc sets")
    for ((id, _, score, _) <- lsh)
      assert(score == exScore(id), s"doc $id: score diverges across tiers")

    // one keeper per cluster, keeper = (score DESC, doc_id) argmax
    for ((c, ms) <- lsh.groupBy(_._2)) {
      val keepers = ms.filter(_._4 == 1L)
      assert(keepers.length == 1, s"LSH cluster $c has ${keepers.length} keepers")
      assert(keepers.head._1 == ms.minBy(m => (-m._3, m._1))._1,
        s"LSH cluster $c: keeper is not the argmax")
    }

    // the parity contract on the drop decision
    val exDrops = exact.filter(_._4 == 0L).map(_._1).toSet
    val lshDrops = lsh.filter(_._4 == 0L).map(_._1).toSet
    assert(exDrops.nonEmpty, "fixture produced no exact-tier drops — vacuous")
    val leaked = lshDrops -- exDrops
    assert(leaked.isEmpty,
      s"${leaked.size} LSH-tier drops absent from the exact tier: " +
        leaked.take(5).mkString(", "))
    val recall = (exDrops & lshDrops).size.toDouble / exDrops.size
    assert(recall >= 0.85, s"drop recall $recall < 0.85 over ${exDrops.size} drops " +
      "(measured 1.0 at sf0.01 and sf0.1 when pinned — see scaladoc)")
    spark.catalog.clearCache()
  }

  // q277 — the same decision served ENTIRELY from write-path artifacts
  // (stream-maintained signatures + shingle index, staged posteriors):
  // must equal q272 (batch-built artifacts) row-for-row. This closes
  // maintained == at-rest at the DECISION level — MinhashMaintenanceSpec
  // pins the signature rows, q158 pins the shingle index, q274's staging
  // pins the model; a drift any of those misses would surface here as a
  // flipped keeper.
  test("q277: keeper served from maintained artifacts == q272 row-for-row") {
    def rowsOf(name: String): Seq[(Long, Long, Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batchBuilt = rowsOf("q272_quality_keeper_lsh")
    val served = rowsOf("q277_keeper_from_maintained")
    assert(batchBuilt.exists(_._4 == 0L), "no drops at this scale — vacuous")
    assert(served == batchBuilt,
      s"served keeper diverges from batch-built artifacts:\n  batch  $batchBuilt\n  served $served")
    spark.catalog.clearCache()
  }
}

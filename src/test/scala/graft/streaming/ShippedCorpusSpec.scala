package graft.streaming

import graft.GraftSuite

/** q279 — the shipped-corpus card, cross-checked against the two
  * independent entries whose decisions it composes:
  *
  *  - Σ n_funnel over languages == q252's stage-8 survivor count (the
  *    funnel tier is the SAME eight-level derivation, here read off the
  *    maintained verdict store);
  *  - per language n_shipped <= n_funnel, and the keeper tier is
  *    NON-VACUOUS at this scale (strictly fewer shipped than funnel
  *    survivors somewhere — measured 4 drops at sf0.001 before pinning);
  *  - every shipped count is consistent with q268's keeper verdicts:
  *    the number of funnel survivors that are also exact-tier keepers.
  */
@graft.tags.Slow
class ShippedCorpusSpec extends GraftSuite {

  test("q279: funnel tier == q252 stage 8; keeper tier non-vacuous and == q268's verdicts") {
    val card = graft.SparkEntry.queries("q279_shipped_corpus")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val funnel = graft.SparkEntry.queries("q252_curation_funnel_v2")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(card.map(_._3).sum == funnel(8),
      s"Σ n_funnel ${card.map(_._3).sum} != q252 stage-8 ${funnel(8)}")

    for ((lang, nDocs, nFunnel, nShipped, nTok) <- card) {
      assert(nShipped <= nFunnel, s"[$lang] shipped $nShipped > funnel $nFunnel")
      assert(nShipped == 0 || nTok > 0, s"[$lang] shipped docs with zero tokens")
      assert(nDocs >= nFunnel, s"[$lang] funnel count exceeds doc count")
    }
    assert(card.map(_._4).sum < card.map(_._3).sum,
      "keeper tier vacuous: every funnel survivor shipped (expected strict drops at sf0.001)")

    // doc-level consistency with q268 (exact-tier keeper verdicts): the
    // shipped total equals the number of stage-8 survivors whose q268
    // keeper flag is 1. Survivor set derived from the maintained verdict
    // store through the SAME reach resolution q274 hashes against.
    val keepers = graft.SparkEntry.queries("q268_quality_keeper")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val reach = graft.text.Funnel.gateReach(
        spark.read.parquet(Streams.drainedVerdictStore(spark, sf)))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // every stage-8 survivor must be PRESENT in q268's keeper map — a
    // default here would let a q268 coverage gap silently count a doc as
    // shipped and pass the recomposition check vacuously (ADVICE r17)
    reach.foreach { case (id, lvl) =>
      if (lvl >= 8) assert(keepers.contains(id),
        s"stage-8 survivor $id missing from q268's keeper output") }
    val expectShipped = reach.count { case (id, lvl) =>
      lvl >= 8 && keepers(id) == 1L }
    assert(card.map(_._4).sum == expectShipped,
      s"shipped total ${card.map(_._4).sum} != doc-level recomposition $expectShipped")
    spark.catalog.clearCache()
  }
}

package graft.streaming

import graft.GraftSuite

/** q274 — the curation funnel as an ingest-time gate, pinned the
  * StreamDecontamSpec way: the report assembled from per-batch gate
  * verdicts (three genuinely incremental arrival waves, models as
  * staged artifacts) must equal q252's batch funnel FRAME-FOR-FRAME —
  * batching cannot change any per-doc verdict (a doc's text is complete
  * in its batch; every model is static), and the read-side keeper
  * resolution sees exactly the rows the batch ladder sees. The two
  * entries additionally share one oracle text, so the sf0.01 hash gate
  * pins the same equality cross-engine.
  */
class StreamFunnelSpec extends GraftSuite {

  test("q274: drained gate verdicts reproduce q252's batch funnel exactly") {
    def rows(name: String): Seq[(Int, String, Long)] =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val batch = rows("q252_curation_funnel_v2")
    val drained = rows("q274_stream_funnel_gate")
    assert(batch.length == 8 && batch.head._3 > 0, s"degenerate batch funnel: $batch")
    assert(drained == batch,
      s"ingest-gate funnel diverges from the batch funnel:\n  batch   $batch\n  drained $drained")
    // the gate ladder is non-vacuous end-to-end: the stage-8 survivors
    // are a real, strictly-smaller subset of the fetched corpus
    assert(drained.last._3 > 0 && drained.last._3 < drained.head._3,
      s"stage-8 gate is vacuous: $drained")
    spark.catalog.clearCache()
  }
}

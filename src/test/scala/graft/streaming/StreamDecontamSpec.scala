package graft.streaming

import graft.GraftSuite

/** q261 — the ingest-time decontamination gate pinned against the
  * at-rest audit: both entries hash against ONE oracle text
  * (Text.decontamOracleSql), and this spec pins the stronger frame-level
  * claim directly — the quarantine the stream produced IS q254's flagged
  * table, row for row, despite the corpus arriving in three waves. The
  * invariance is structural (a doc's shingles are complete in its batch;
  * the benchmark set is static), so any divergence is a bug in the
  * batching, not a tolerance question.
  */
class StreamDecontamSpec extends GraftSuite {

  test("q261: the ingest-time gate flags exactly q254's set across three waves") {
    val gate = graft.SparkEntry.queries("q261_stream_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val audit = graft.SparkEntry.queries("q254_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gate.toSeq == audit.toSeq,
      s"gate (${gate.length}) != audit (${audit.length}):\n${gate.toSeq}\n${audit.toSeq}")
    // degeneracy guards: flags exist at spec scale, and the flagged docs
    // span MORE than one arrival wave (doc_id % 3), so the equality above
    // actually exercises cross-batch assembly
    assert(gate.nonEmpty, "nothing flagged at spec scale — vacuous pin")
    assert(gate.map(_._1 % 3).distinct.length > 1,
      "all flagged docs arrived in one wave — the batching is untested")
  }
}

package graft.streaming

import graft.GraftSuite

/** q275 — the incremental-dedup serving path: clusters read off the
  * stream-maintained pair store must equal q90's at-rest clustering
  * frame-for-frame (the two entries also share one oracle text, so the
  * sf0.01 hash gate pins the same equality cross-engine). The store's
  * write path is q142's drain, whose pair law is itself hash-pinned to
  * the q61 derivation — this spec closes the chain at the cluster
  * level, where the composition could still diverge (a lost pair
  * partial would split a component silently).
  */
class StreamClusterSpec extends GraftSuite {

  test("q275: clusters off the maintained pair store == q90's at-rest clusters") {
    def rows(name: String): Seq[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val atRest = rows("q90_dedup_clusters")
    val served = rows("q275_stream_dedup_clusters")
    assert(atRest.nonEmpty, "fixture produced no clusters — vacuous")
    assert(served == atRest,
      s"served clusters diverge from the at-rest clustering:\n  atRest $atRest\n  served $served")
    spark.catalog.clearCache()
  }
}

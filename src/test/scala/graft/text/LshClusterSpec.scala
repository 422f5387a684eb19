package graft.text

import graft.GraftSuite

/** q90_lsh_clusters — the scale-path composition (LSH candidates feeding
  * the min-label clustering) judged against the exact q90 clustering on
  * the mid fixture:
  *
  *  - PRECISION 1.0 structurally: every LSH edge passes the same exact
  *    Jaccard >= 0.2 verification as the quadratic pair derivation, so
  *    the LSH edge set is a SUBSET of the exact edge set and each LSH
  *    cluster must sit inside one exact cluster (no cross-cluster merge).
  *  - RECALL: co-cluster pairs (the dedup-relevant relation — "these two
  *    docs collapse to one representative") recovered at >= the pinned
  *    bound; headroom below observed, same style as the ANN recalls.
  */
class LshClusterSpec extends GraftSuite {

  private def coClusterPairs(rows: Array[(Long, Long)]): Set[(Long, Long)] =
    rows.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet

  test("LSH clustering refines exact clusters (precision 1.0), recall >= 0.8") {
    def clustersOf(name: String): Array[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf01)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = coClusterPairs(clustersOf("q90_dedup_clusters"))
    val lsh = coClusterPairs(clustersOf("q90_lsh_clusters"))
    assert(exact.nonEmpty, "fixture produced no exact co-cluster pairs")

    val leaked = lsh -- exact
    assert(leaked.isEmpty,
      s"${leaked.size} LSH co-cluster pairs absent from the exact clustering: " +
        leaked.take(5).mkString(", "))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"co-cluster recall $recall < 0.8 over ${exact.size} pairs")
    spark.catalog.clearCache()
  }
}

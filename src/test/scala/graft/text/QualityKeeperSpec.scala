package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** q268 — quality-aware canonical selection, pinned against its two
  * green components and the rule's own invariants: cluster assignments
  * equal q90's (same closure, singletons self-labeled), scores equal an
  * independent q234 posterior fold, exactly ONE keeper per cluster, the
  * keeper is the (score DESC, doc_id) argmax of its cluster, and the
  * rule genuinely diverges from q90's min-id keeper on this fixture
  * (the non-vacuity that makes the hash pin quality selection rather
  * than re-spell q90).
  */
class QualityKeeperSpec extends GraftSuite {

  test("q268: keeper = per-cluster quality argmax; components agree; non-vacuous") {
    val rows = graft.SparkEntry.queries("q268_quality_keeper")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // component 1: clusters equal q90's output on its doc set;
    // everything else is a singleton labeled by itself
    val q90 = graft.SparkEntry.queries("q90_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, cluster, _, _) <- rows)
      assert(cluster == q90.getOrElse(id, id), s"doc $id: cluster diverges from q90")

    // component 2: scores equal an independent posterior fold
    val g = QualityModel.bucketFrame(graft.core.Tables(spark, sf, "documents")).persist()
    val m1 = QualityModel.trainPosteriors(g, "label")
    val scores = g.select(col("doc_id"), QualityModel.scoreCol(m1).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    g.unpersist()
    for ((id, _, score, _) <- rows)
      assert(score == scores(id), s"doc $id: score diverges from the q234 fold")

    // the keeper rule
    val byCluster = rows.groupBy(_._2)
    for ((c, ms) <- byCluster) {
      val keepers = ms.filter(_._4 == 1L)
      assert(keepers.length == 1, s"cluster $c has ${keepers.length} keepers")
      val best = ms.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == best._1,
        s"cluster $c: keeper ${keepers.head._1} is not the argmax ${best._1}")
    }

    // non-vacuity: quality must beat min-id somewhere, on real clusters
    val multi = byCluster.filter(_._2.length > 1)
    assert(multi.nonEmpty, "no multi-doc clusters — vacuous fixture")
    assert(multi.exists { case (_, ms) =>
      ms.filter(_._4 == 1L).head._1 != ms.map(_._1).min },
      "quality keeper always equals min-id — the rule is untested")
  }
}

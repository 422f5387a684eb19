package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** The clustering loop must be CONVERGENCE-driven, not iteration-capped:
  * a path graph needs diameter rounds of min-label propagation, far past
  * what near-dup cliques need (and past the SQL twin's unrolled depth,
  * which is only contracted for the fixture's shallow components). */
class PipelineSpec extends GraftSuite {

  test("clusterPairs converges on a 12-node path (diameter 11)") {
    import spark.implicits._
    val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Pipeline.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 12)
    assert(got.values.toSet === Set(1L), s"all nodes must reach label 1: $got")
  }

  test("q92 packing invariant: a bin overflows 2048 only by its boundary-spanning doc") {
    val bins = graft.SparkEntry.queries("q92_pack_sequences")(spark, sf).collect()
    val maxTok = graft.text.TokenIndex.toks(spark, sf)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.size(col("ws")))).collect()(0).getInt(0)
    bins.foreach { r =>
      val n = r.getLong(3)
      assert(n < 2048 + maxTok,
        s"bin (${r.getInt(0)}, ${r.getInt(1)}) holds $n tokens (> 2048 + $maxTok)")
    }
    spark.catalog.clearCache()
  }

  test("clusterPairs keeps disjoint components apart") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Pipeline.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
                       20L -> 20L, 21L -> 20L))
  }

  // q156's declared query pins only shard heads; the PROPERTIES of the
  // shuffle — it is a permutation (every doc exactly once), dense ranks
  // per shard, replayable from the seed, and a different seed actually
  // re-orders — are what a training job depends on.
  test("q156 epoch order is a seeded permutation: total, dense, replayable") {
    def epoch(seed: String) =
      Pipeline.epochOrder(graft.core.Tables(spark, sf, "documents"), seed, 8)
        .select(col("shard"), col("rk"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nDocs = graft.core.Tables(spark, sf, "documents").count()
    val e1 = epoch("epoch1")
    // permutation: every doc exactly once
    assert(e1.map(_._3).distinct.length.toLong == nDocs && e1.length.toLong == nDocs)
    // dense ranks within each shard
    e1.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"shard $shard ranks not dense")
    }
    // replayable: the same seed is bit-identical
    assert(epoch("epoch1").sortBy(r => (r._1, r._2)).toSeq ==
           e1.sortBy(r => (r._1, r._2)).toSeq)
    // a new epoch seed actually re-orders (some doc changes position)
    val e2 = epoch("epoch2").sortBy(r => (r._1, r._2))
    assert(e2.map(_._3).toSeq != e1.sortBy(r => (r._1, r._2)).map(_._3).toSeq)
  }
}

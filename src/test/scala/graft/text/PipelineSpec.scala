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
}

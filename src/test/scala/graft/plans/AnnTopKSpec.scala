package graft.plans

import graft.GraftSuite
import graft.core.Tables
import graft.vector.Vectors

/** The planner seam's contract: [[AnnTopK]] is one logical operator whose
  * physical route is a session decision. `exact` must be result-identical
  * to the direct API (the rule adds nothing but dispatch); the approximate
  * routes are plan-time swaps of the same operator (their recall bounds
  * live in AnnRecallSpec — here we pin only that the swap happens and
  * keeps the output contract). */
class AnnTopKSpec extends GraftSuite {

  private val MODE = "spark.graft.ann.mode"

  private def withMode[A](m: String)(body: => A): A = {
    spark.conf.set(MODE, m)
    try body finally { spark.conf.unset(MODE); spark.catalog.clearCache() }
  }

  test("default mode is exact: node result == Vectors.topK row-for-row") {
    val emb = Tables(spark, sf01, "embeddings")
    val viaNode = AnnTopK(emb, Seq(1, 2, 3), 5).collect().toSeq
    val direct = Vectors.topK(emb, Seq(1, 2, 3), 5).collect().toSeq
    assert(viaNode == direct)
  }

  test("ivf mode swaps the physical route but keeps the output contract") {
    val emb = Tables(spark, sf01, "embeddings")
    val exactPlan = AnnTopK(emb, Seq(1, 2, 3), 5)
    withMode("ivf") {
      val df = AnnTopK(emb, Seq(1, 2, 3), 5)
      // contract = names + types; nullability legitimately narrows per
      // route (the exact route's typed flatMap is nullable-wide, the
      // probe route's column projection is not)
      assert(df.schema.map(f => (f.name, f.dataType)) ==
             exactPlan.schema.map(f => (f.name, f.dataType)))
      // the probe route reads the centroid-cell join; the exact route
      // broadcasts the query rows against the full corpus — the plans
      // must actually differ or the conf did nothing
      val p = df.queryExecution.optimizedPlan.toString
      val pExact = exactPlan.queryExecution.optimizedPlan.toString
      assert(p != pExact, "ivf mode produced the exact plan")
      // every query id answers with a full page of ranked neighbours
      val rows = df.collect()
      assert(rows.length == 15)
      assert(rows.map(r => (r.getLong(0), r.getInt(3))).toSet ==
        (for (q <- 1 to 3; r <- 1 to 5) yield (q.toLong, r)).toSet)
    }
  }

  test("ivf mode with spark.graft.ann.dir probes the staged index (no training)") {
    val emb = Tables(spark, sf01, "embeddings")
    spark.conf.set("spark.graft.ann.dir", sf01)
    try withMode("ivf") {
      val rows = AnnTopK(emb, Seq(1, 2, 3), 5).collect()
      assert(rows.length == 15)
      assert(rows.map(r => (r.getLong(0), r.getInt(3))).toSet ==
        (for (q <- 1 to 3; r <- 1 to 5) yield (q.toLong, r)).toSet)
    } finally spark.conf.unset("spark.graft.ann.dir")
  }

  test("lsh mode plans and runs under the same declaration") {
    val emb = Tables(spark, sf01, "embeddings")
    withMode("lsh") {
      val rows = AnnTopK(emb, Seq(1, 2, 3), 5).collect()
      // LSH's Hamming gate may return < k candidates per query (its
      // near-dup design regime; see AnnRecallSpec) — the contract here is
      // the schema and rank monotonicity, not the page size
      assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 5))
    }
  }

  test("unknown mode fails the declaration loudly") {
    val emb = Tables(spark, sf01, "embeddings")
    withMode("hnsw") {
      val ex = intercept[Exception](AnnTopK(emb, Seq(1), 3).collect())
      assert(ex.getMessage != null &&
        ex.getMessage.contains("spark.graft.ann.mode"),
        s"unexpected error: ${ex.getMessage}")
    }
  }
}

package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.core.Tables

/** q148 semantic dedup (SemDeDup shape) is bench-only — cell labels come
  * from k-means, so no DuckDB oracle exists. The contract asserted here
  * instead:
  *  - PRECISION 1.0: every reported pair really sits at exact cosine >=
  *    tau (the within-cell score IS the exact cosine, so any reported
  *    pair must appear in the exact all-pairs twin).
  *  - RECALL floor vs the exact all-pairs twin: cluster blocking misses
  *    only cross-cell pairs; on this fixture the near-dup structure is
  *    label-aligned and k-means cells track it. Floor pinned from
  *    measurement (headroom below observed).
  *  - The summary's accounting is internally consistent with the pairs.
  */
class SemDedupSpec extends GraftSuite {

  private val tau = 0.4

  private def exactPairs = {
    val e = Tables(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.vec.dot(col("v"), col("v"))))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
              (graft.functions.vec.dot(col("a.v"), col("b.v"))
                / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("semantic pairs: precision 1.0 and recall >= 0.7 vs exact all-pairs") {
    val exact = exactPairs
    assert(exact.nonEmpty, "fixture must contain at least one near-dup pair")
    val got = Vectors.semanticPairs(Tables(spark, sf01, "embeddings"), tau = tau)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val falsePos = got -- exact
    assert(falsePos.isEmpty, s"pairs not in the exact twin: $falsePos")
    // measured 0.83 at nlist=8/probes=2 (0.49 single-probe); floor with
    // headroom below observed, same pinning style as the ANN recalls
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.7, s"cluster-blocked recall was $recall over ${exact.size} pairs")
    spark.catalog.clearCache()
  }

  test("summary accounting matches the pair report") {
    val emb = Tables(spark, sf01, "embeddings")
    val pairs = Vectors.semanticPairs(emb, tau = tau).collect()
    val summary = Vectors.semanticDedup(emb, tau = tau).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val n = emb.count()
    assert(summary.values.map(_._1).sum === n, "cell sizes must partition the corpus")
    assert(summary.values.map(_._2).sum === pairs.length.toLong,
           "per-cell pair counts must sum to the pair report")
    assert(summary.values.map(_._3).sum ===
             pairs.map(_.getLong(2)).distinct.length.toLong,
           "per-cell drops must sum to the distinct dropped vectors")
    summary.foreach { case (cell, (nVecs, _, nDropped)) =>
      assert(nDropped <= nVecs, s"cell $cell drops more vectors than it holds")
    }
    spark.catalog.clearCache()
  }

  test("staged cell index reproduces the live-trained result exactly") {
    val emb = Tables(spark, sf01, "embeddings")
    val live = Vectors.semanticDedup(emb, tau = tau).collect().toSeq
    val staged = Vectors.semanticDedup(emb, tau = tau,
      index = Some(VectorIndex.cells(spark, sf01))).collect().toSeq
    assert(live === staged)
    spark.catalog.clearCache()
  }

  test("hot-cell guard keeps a planted dense cell sub-quadratic") {
    import spark.implicits._
    // plant 300 near-identical vectors: all land in one cell, whose
    // unbounded pair join would emit C(300,2) = 44850 pairs
    val dim = Tables(spark, sf01, "embeddings")
      .select(org.apache.spark.sql.functions.size(col("embedding"))).first().getInt(0)
    val base = Array.tabulate(dim)(i => 1.0f / (i + 1))
    val planted = (0 until 300).map { i =>
      (100000L + i, base.map(x => x * (1.0f + i * 1e-6f)).toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = Tables(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding")).unionByName(planted)

    val capped = Vectors.semanticPairs(corpus, tau = tau, maxCell = 100)
      .filter(col("id_a") >= 100000L).count()
    // split factor s = ceil(m/maxCell) bounds in-cell pairs by
    // s * C(ceil(m/s), 2); for m >= 300, cell also holds fixture vectors,
    // so allow the loose but sub-quadratic budget of half the unbounded count
    assert(capped > 0, "planted near-identical pairs must still be found")
    assert(capped < 44850 / 2,
           s"hot cell not capped: $capped pairs from the planted clique")
    spark.catalog.clearCache()
  }
}

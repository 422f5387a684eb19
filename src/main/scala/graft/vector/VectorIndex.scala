package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Staging, Tables}

/** Ingest-time materialized PQ index over the embeddings corpus — the
  * vector-side analog of graft.text.TokenIndex: a deployment encodes each
  * vector to its m sub-codes when the vector is WRITTEN (exactly like the
  * MinHash signatures stored beside each document), so ANN queries read
  * codes + codebook, never re-train or re-encode.
  *
  * Two artifacts per corpus dir, keyed on the embeddings table's
  * fingerprint:
  *  - `pqcents` (sub, code, cv): the trained codebook — m x ks rows, tiny.
  *  - `pqcodes` (vec_id, nrm, sub, code): the encoded corpus, m rows per
  *    vector. At 100 TB this is the 64x-smaller scan the ADC pass reads
  *    instead of the vectors.
  */
object VectorIndex {

  /** The staged (codebook, codes) pair for a corpus dir (built on first
    * use; training is driver-side over a bounded sample, encoding is the
    * single distributed corpus pass). */
  def pq(s: SparkSession, dir: String): (Array[Array[Array[Double]]], DataFrame) = {
    val centDf = Staging.staged(s, dir, "embeddings", "pqcents") {
      import s.implicits._
      val cents = Vectors.pqTrain(Tables(s, dir, "embeddings"))
      (for (sub <- cents.indices; c <- cents(sub).indices)
        yield (sub, c, cents(sub)(c).toSeq)).toDF("sub", "code", "cv")
    }
    // codebook is m x ks rows — rebuild the driver-side array from parquet
    val cents: Array[Array[Array[Double]]] = {
      val rows = centDf.collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val m = rows.map(_._1).max + 1
      val ks = rows.map(_._2).max + 1
      val a = Array.ofDim[Array[Double]](m, ks)
      rows.foreach { case (s0, c, cv) => a(s0)(c) = cv }
      a
    }
    val codes = Staging.staged(s, dir, "embeddings", "pqcodes") {
      Vectors.pqEncode(Tables(s, dir, "embeddings"), cents)
    }
    (cents, codes)
  }

  /** The staged coarse-quantizer centroids (`ivfcents` — nlist rows,
    * tiny): the query-side probe geometry. Without this artifact an
    * IVF query would have to re-train to know where to probe. */
  def ivfCents(s: SparkSession, dir: String): Array[Array[Double]] = {
    val df = Staging.staged(s, dir, "embeddings", "ivfcents") {
      import s.implicits._
      Vectors.trainCoarseQuantizer(Tables(s, dir, "embeddings"))
        .zipWithIndex.map { case (cv, i) => (i, cv.toSeq) }.toSeq
        .toDF("cell", "cv")
    }
    df.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
  }

  /** The staged multi-probe cell-assignment table `(vec_id, rk, cell)`
    * for the semantic-dedup blocking (Vectors.semanticDedup) and the
    * IVF-PQ probe cut: cells are assigned when the vector is written —
    * queries join labels, never train. Built against the staged
    * centroids with the live path's defaults (nlist 8, top-2 probes), so
    * staged and live results agree (pinned by SemDedupSpec). */
  def cells(s: SparkSession, dir: String): DataFrame =
    Staging.staged(s, dir, "embeddings", "ivfcells") {
      Vectors.cellAssignmentsWith(Tables(s, dir, "embeddings"), ivfCents(s, dir))
    }

  /** The staged (centroids, cell-assignments) pair — the coarse half of
    * IVF-PQ. */
  def ivf(s: SparkSession, dir: String): (Array[Array[Double]], DataFrame) =
    (ivfCents(s, dir), cells(s, dir))

  /** Build all artifacts eagerly (Bench calls this in its untimed ingest
    * phase — index maintenance is write-path work, like TokenIndex). */
  def ensure(s: SparkSession, dir: String): Unit = { pq(s, dir); ivf(s, dir); () }
}

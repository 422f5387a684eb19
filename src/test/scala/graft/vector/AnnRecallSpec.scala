package graft.vector

import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.core.Tables

/** The approximate paths never get hash-checked (engine-specific buckets);
  * what IS contracted (SURVEY.md §7.3) is recall, asserted in each
  * algorithm's design regime:
  *  - IVF: general top-k at moderate similarity (this fixture's top-5 sit
  *    at cosine ~0.37 over a ~0.07 background) — recall rises with nprobe.
  *  - sign-LSH: near-duplicate retrieval (cosine >~ 0.85), tested on
  *    planted duplicates because the raw fixture has no pair above 0.61.
  *  - MinHash-LSH: near-dup pairs vs the exact-Jaccard twin. */
@graft.tags.Slow
class AnnRecallSpec extends GraftSuite {

  test("IVF top-k recall >= 0.75 at nprobe=6/16, and higher nprobe never hurts") {
    val emb = Tables(spark, sf01, "embeddings")
    val qids = Seq(1, 2, 3)
    val exact = Vectors.topK(emb, qids, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallAt(nprobe: Int): Double = {
      val approx = Vectors.annIvf(emb, qids, 5, nlist = 16, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r6 = recallAt(6)
    assert(r6 >= 0.75, s"IVF recall@nprobe=6 was $r6")
    val r16 = recallAt(16)   // probing every cell == exact search
    assert(r16 === 1.0, s"IVF with nprobe=nlist must equal exact, got $r16")
    spark.catalog.clearCache()
  }

  test("assignCells fast path == assignCellsTop rank-0, including tie-breaks") {
    // the single-cell max_by aggregate and the multi-probe sort both pick
    // the lexicographic max of (s, cell); a drift here silently breaks
    // Lloyd training and the staged-vs-live cell equality
    val rows = Vectors.withNorm(Tables(spark, sf01, "embeddings"))
    val cents = Vectors.trainCoarseQuantizer(Tables(spark, sf01, "embeddings"), nlist = 8)
    val fast = Vectors.assignCells(rows, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val rk0 = Vectors.assignCellsTop(rows, cents, probes = 2)
      .filter(col("rk") === 0).select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(fast == rk0)
    spark.catalog.clearCache()
  }

  test("IVF-PQ: probing every cell with unbounded re-rank IS exact; nprobe=2 keeps recall") {
    val emb = Tables(spark, sf01, "embeddings")
    val qids = Seq(1, 2, 3)
    val coarse = VectorIndex.ivf(spark, sf01)
    val pq = VectorIndex.pq(spark, sf01)
    val exact = Vectors.topK(emb, qids, 5).collect().toSeq

    // identity: all 8 cells probed + re-rank wider than the corpus means
    // the composition degenerates to exact search — row-for-row equal
    val full = Vectors.annIvfPq(emb, qids, 5, nprobe = 8, rerank = 1000000,
                                coarse = coarse, pq = pq).collect().toSeq
    assert(full == exact, "IVF-PQ with every cell probed must equal exact top-k")

    // the real operating point: 2 of 8 cells scanned per query
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Vectors.annIvfPq(emb, qids, 5, nprobe = 2, rerank = 50,
                                  coarse = coarse, pq = pq).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & approx).size.toDouble / exactSet.size
    assert(recall >= 0.6, s"IVF-PQ recall@nprobe=2/8 was $recall")   // measured 0.8
    spark.catalog.clearCache()
  }

  test("media-embedding staged IVF: all-cells probe == exact; nprobe=3/8 keeps recall") {
    // the q269/q270 multimodal->ANN bridge: the staged media IVF must be
    // (a) exactly the top-k when every cell is probed and (b) within the
    // contracted recall at its operating point (3 of 8 cells scanned)
    import graft.multimodal.MmEmbed
    val emb = MmEmbed.stagedMediaEmbeddings(spark, sf01)
    val qids = Seq(1, 2, 4)
    val coarse = MmEmbed.mmIvf(spark, sf01)
    val exact = Vectors.topK(emb, qids, 5).collect().toSeq
    val full = Vectors.annIvfStaged(emb, qids, 5, nprobe = 8, coarse = coarse)
      .collect().toSeq
    assert(full == exact, "media IVF with every cell probed must equal exact top-k")
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Vectors.annIvfStaged(emb, qids, 5, nprobe = 3, coarse = coarse)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & approx).size.toDouble / exactSet.size
    assert(recall >= 0.6, s"media IVF recall@nprobe=3/8 was $recall")
    spark.catalog.clearCache()
  }

  test("sign-LSH recovers planted near-duplicates (its design regime)") {
    import spark.implicits._
    val emb = Tables(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // plant: for vec_ids 1..20, a copy with ~1% noise at vec_id+10000
    val rnd = new scala.util.Random(1)
    val planted = emb.filter(col("vec_id") <= 20).collect().map { r =>
      val v = r.getSeq[Double](1).map(x => x + rnd.nextGaussian() * 0.01 * math.abs(x).max(0.01))
      (r.getLong(0) + 10000, v)
    }.toSeq
    val corpus = emb.unionByName(planted.toDF("vec_id", "v"))
      .select(col("vec_id"), col("v").cast("array<float>").as("embedding"))

    val queryIds = (1 to 20).map(_ + 10000)
    val got = Vectors.annLsh(corpus, queryIds.map(_.toInt), 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = queryIds.count(q => got.get(q.toLong).contains(q.toLong - 10000))
    assert(hits >= 18, s"LSH found only $hits/20 planted near-duplicates")
  }

  test("MinHash-LSH near-dup pairs recover >= 0.9 of exact Jaccard >= 0.2 pairs") {
    import graft.text.Text
    val exactPairs = graft.SparkEntry.queries("q61_neardup_jaccard")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Text.minhashNearDups(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture produced no exact near-dup pairs")
    val recall = (exactPairs & lshPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"MinHash recall $recall < 0.9")
    spark.catalog.clearCache()
  }

  test("PQ/ADC top-5 recalls >= 0.8 of exact cosine top-5 (after re-rank)") {
    val emb = Tables(spark, sf01, "embeddings")
    val queryIds = Seq(1, 2, 3)
    val exact = Vectors.topK(emb, queryIds, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Vectors.annPq(emb, queryIds, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall < 0.8 (hits ${(exact & got).size}/${exact.size})")
    // the staged ingest index (what the bench entry consumes) must produce
    // the identical result to inline train+encode — same deterministic
    // sample, same Lloyd rule, just parked as parquet
    val viaIndex = Vectors
      .annPq(emb, queryIds, 5, index = Some(VectorIndex.pq(spark, sf01)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === got, "staged PQ index diverged from inline train+encode")
    spark.catalog.clearCache()
  }

  test("LSH hot-bucket cap keeps the candidate join sub-quadratic") {
    import spark.implicits._
    import graft.text.Text
    // planted hot bucket: 40 docs with IDENTICAL shingle sets (identical
    // signatures -> same bucket in every band) + 20 distinct singleton docs
    val clique = for (d <- 1L to 40L; h <- Seq(1L, 2L, 3L, 4L, 5L)) yield (d, h)
    val normal = for (d <- 101L to 120L; h <- Seq(d * 100, d * 100 + 1)) yield (d, h)
    val sh = (clique ++ normal).toDF("doc_id", "h")
    val uncapped = Text.lshCandidates(sh, 64, 8, maxBucket = 1000).count()
    assert(uncapped >= 40L * 39 / 2, s"clique pairs missing uncapped: $uncapped")
    val capped = Text.lshCandidates(sh, 64, 8, maxBucket = 10).count()
    assert(capped == 0, s"hot bucket leaked $capped candidate pairs past the cap")
  }
}

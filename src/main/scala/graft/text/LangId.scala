package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** Model-based language identification (SURVEY.md Q219) — the
  * Cavnar–Trenkle rank-profile n-gram classifier ("N-Gram-Based Text
  * Categorization", SDAIR 1994), the standard-practice LID tier above
  * q68's stopword heuristic. Per language, the model is the TOP-K char
  * bigrams ranked by corpus frequency; a document is classified to the
  * language whose profile minimizes the OUT-OF-PLACE distance: for each
  * bigram in the document's own top-K profile, |doc rank − lang rank|,
  * with a fixed K penalty for bigrams absent from the language profile.
  *
  * Chosen over naive-Bayes log-likelihoods deliberately: ranks and
  * distances are INTEGERS, so classification is bit-exact across engines
  * (a float log-prob sum is summation-order-dependent and can flip
  * argmax near ties — unverifiable by hash against an independent
  * engine). The statistical behavior is the published C-T result.
  *
  * Plan shape (round 14 — this was the heaviest non-streaming single-pass
  * entry, and the cost was pure shuffle machinery, not arithmetic):
  * TRAINING reduces the corpus to the language profiles in ONE map-side-
  * combinable agg — per-doc bigram counts from a compiled kernel,
  * exploded and summed by (lang, g) — plus a window over the already-tiny
  * (langs × distinct-bigrams) frame, and the O(langs × K) result is
  * collected as a driver artifact (q234's broadcast-model posture; q235's
  * O(V)-row bound). SCORING is then map-ONLY: each document is classified
  * from its own row (count → top-K rank profile → out-of-place distance
  * against the dense model riding the closure), so the former
  * doc_id-window shuffle and the docProf × languages cross-join are gone
  * entirely. The corpus is never hash-partitioned: the only exchange in
  * the scoring plan is the final O(langs²) confusion-matrix agg
  * (PlanShapeSpec pins map-only + single exchange). At 100 TB the
  * profiles are trained on a sample at ingest and only the map-only
  * scoring scan remains — identical shape.
  *
  * Training is resubstitution over the fixture corpus (deterministic,
  * oracle-replayable — the DuckDB oracle retrains the identical model in
  * SQL). Output is the confusion matrix vs the labeled `lang` column;
  * LangIdModelSpec pins perfect separation on a synthetic corpus with
  * disjoint character distributions and above-chance diagonal mass on
  * the fixture.
  */
object LangId {

  val K = 64

  /** Distinct char bigrams of `text` with their counts, iteration order
    * unspecified (consumers aggregate or sort). A compiled Scala kernel:
    * the same counting expressed as interpreted higher-order array
    * functions measured ~0.66 ms/doc (3.3 s over the sf0.1 corpus) —
    * per-element lambda interpretation, not arithmetic, was the entire
    * cost, so this is the documented UDF exception, not the default.
    * Char-unit bigrams == codepoint bigrams for the BMP-only fixtures
    * (and the reference's ES analyzers are UTF-16-unit-based too).
    */
  /** The ONE counting loop both UDFs share — training and scoring must
    * count identically or the model/scorer pair silently desynchronizes
    * (e.g. a future surrogate-pair revision applied to one copy only). */
  private def bigramCounts(text: String): scala.collection.mutable.HashMap[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < text.length - 1) {
      val g = text.substring(i, i + 2)
      m.update(g, m.getOrElse(g, 0) + 1)
      i += 1
    }
    m
  }

  private val countsOf = udf { (text: String) => bigramCounts(text).toSeq }

  /** Classify one document given the dense model: count bigrams, rank the
    * top-K by (count desc, bigram asc) — the oracle's ROW_NUMBER order —
    * then per language the MATCHED adjustment A = sum over profile hits
    * of (K - |dr - lr|); distance = K x |topk| - A, so argmin(distance) =
    * argmax(A) with the oracle's (dist, lang) tie order (strict `<` keeps
    * the first = lexicographically smallest language on ties).
    */
  private def predOf(model: Map[String, Array[Int]], langs: Seq[String]) =
    udf { (text: String) =>
      val top = bigramCounts(text).toSeq.sortBy { case (g, c) => (-c, g) }.take(K)
      val n = langs.length
      val a = new Array[Long](n)
      var dr = 0
      top.foreach { case (g, _) =>
        dr += 1
        model.get(g).foreach { vec =>
          var j = 0
          while (j < n) {
            val lr = vec(j)
            if (lr != 0) a(j) += K - math.abs(dr - lr)
            j += 1
          }
        }
      }
      var best = 0
      var bestDist = Long.MaxValue
      var j = 0
      while (j < n) {
        val d = K.toLong * top.size - a(j)
        if (d < bestDist) { bestDist = d; best = j }
        j += 1
      }
      langs(best)
    }

  /** Confusion matrix (lang, pred_lang, n) for the corpus in `docs`. */
  def confusion(docs: DataFrame): DataFrame = {
    // ---- training: ONE map-side-combined agg -> O(langs x K) artifact
    // (the oracle's `langs` CTE is a DISTINCT over documents, so a lang
    // whose docs are all sub-bigram-length still competes at distance
    // K x |doc profile| — collect the language list independently)
    val langs: Seq[String] = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val profRows = docs.filter(length(col("text")) >= 2)
      .select(col("lang"), explode(countsOf(col("text"))).as("gc"))
      .groupBy(col("lang"), col("gc._1").as("g")).agg(sum(col("gc._2")).as("c"))
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))))
      .filter(col("lr") <= K)
      .select(col("lang"), col("g"), col("lr"))
      .collect()
    val langIdx = langs.zipWithIndex.toMap
    val nLangs = langs.length
    // g -> DENSE per-language rank vector (0 = not in that profile): one
    // hash lookup + one flat pass over the language slots per scored
    // top-K element
    val model: Map[String, Array[Int]] = profRows
      .map(r => (r.getString(1), (langIdx(r.getString(0)), r.getInt(2))))
      .groupBy(_._1).map { case (g, xs) =>
        val v = Array.fill(nLangs)(0)
        xs.foreach { case (_, (j, lr)) => v(j) = lr }
        g -> v
      }

    // ---- scoring: map-only — the model rides the closure, the corpus
    // is never hash-partitioned (re-counting bigrams in the compiled
    // kernel is microseconds/doc; cheaper than caching a counts table)
    docs.filter(length(col("text")) >= 2)
      .select(col("lang"), predOf(model, langs)(col("text")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private val oracleBody =
    """bgc AS (SELECT doc_id, lang, g, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
      |langprof AS (
      |  SELECT * FROM (
      |    SELECT lang, g, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY SUM(c) DESC, g) AS lr
      |    FROM bgc GROUP BY lang, g) WHERE lr <= 64
      |),
      |docprof AS (
      |  SELECT * FROM (
      |    SELECT doc_id, g, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS dr
      |    FROM bgc) WHERE dr <= 64
      |),
      |langs AS (SELECT DISTINCT lang AS plang FROM documents),
      |dist AS (
      |  SELECT d.doc_id, l.plang,
      |         SUM(CASE WHEN p.lr IS NULL THEN 64 ELSE ABS(d.dr - p.lr) END) AS dist
      |  FROM docprof d CROSS JOIN langs l
      |  LEFT JOIN langprof p ON p.lang = l.plang AND p.g = d.g
      |  GROUP BY d.doc_id, l.plang
      |),
      |pred AS (
      |  SELECT doc_id, plang AS pred_lang,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, plang) AS rn
      |  FROM dist
      |)
      |SELECT t.lang, p.pred_lang, COUNT(*) AS n
      |FROM documents t JOIN pred p ON p.doc_id = t.doc_id AND p.rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q219_langid_model",
      s"""WITH bg AS (
        |  SELECT doc_id, lang, substr(text, CAST(u.i AS INT), 2) AS g
        |  FROM documents, LATERAL unnest(range(1, length(text))) AS u(i)
        |  WHERE length(text) >= 2
        |),
        |$oracleBody""".stripMargin) { (s, d) =>
      confusion(T(s, d, "documents"))
    }.sqlTwin(
      s"""WITH bg AS (
        |  SELECT doc_id, lang, substring(text, CAST(i AS INT), 2) AS g
        |  FROM documents LATERAL VIEW explode(sequence(1, length(text) - 1)) u AS i
        |  WHERE length(text) >= 2
        |),
        |$oracleBody""".stripMargin)
  )
}

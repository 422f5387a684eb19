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
  * Plan shape: ONE pass over the corpus builds (doc_id, g, c) bigram
  * counts (map-side combinable hash agg); the language profiles re-
  * aggregate that table (docs carry their lang, so no second text scan),
  * and scoring joins the per-doc top-K against the BROADCAST lang
  * profiles (languages × K rows — tiny by construction). Per-doc top-K
  * is a rank-filtered window, which Spark executes with WindowGroupLimit
  * pushdown. At 100 TB the profiles are trained on a sample at ingest
  * and only the scoring scan remains — identical shape.
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

  /** Per-doc char-bigram counts — the shared base for both profiles. */
  private def bigramCounts(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), length(col("text")) - 1),
          i => col("text").substr(i, lit(2)))).as("g"))
      .groupBy(col("doc_id"), col("lang"), col("g"))
      .agg(count(lit(1)).as("c"))

  /** Confusion matrix (lang, pred_lang, n) for the corpus in `docs`. */
  def confusion(docs: DataFrame): DataFrame = {
    // ONE corpus pass: the (doc, bigram, count) table feeds BOTH the
    // language profiles and the per-doc profiles — persist so the
    // explode+agg never runs twice (bench clears the cache per entry)
    val bgc = bigramCounts(docs).persist()
    val langProf = bgc.groupBy(col("lang"), col("g")).agg(sum(col("c")).as("c"))
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))))
      .filter(col("lr") <= K)
      .select(col("lang").as("plang"), col("g"), col("lr").cast("long").as("lr"))
    val docProf = bgc
      .withColumn("dr", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g"))))
      .filter(col("dr") <= K)
      .select(col("doc_id"), col("g"), col("dr").cast("long").as("dr"))
    val langs = docs.select(col("lang")).distinct().select(col("lang").as("plang"))
    val dist = docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("plang", "g"), "left")
      .groupBy(col("doc_id"), col("plang"))
      .agg(sum(when(col("lr").isNull, K.toLong)
        .otherwise(abs(col("dr") - col("lr")))).as("dist"))
    // argmin by (dist, lang) as ONE map-side-combinable agg — a
    // row_number window here would add a sort exchange for a top-1
    val pred = dist.groupBy(col("doc_id"))
      .agg(min_by(col("plang"), struct(col("dist"), col("plang"))).as("pred_lang"))
    docs.select(col("doc_id"), col("lang")).join(pred, "doc_id")
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

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** Model-based document quality scoring (SURVEY.md Q234) — the trained
  * classifier tier above q96's threshold rules, the FineWeb/CCNet-class
  * progression: rule labels bootstrap a statistical model, and the model
  * (not the rules) scores the corpus, generalizing past the exact
  * thresholds. The reference has no quality layer at all; this is the
  * pipeline stage between per-doc signals (q69) and the keep/drop report
  * (q154).
  *
  * The model is naive-Bayes-shaped over QUANTIZED signals: five integer
  * per-doc signals (token count, stopword per-mille, punctuation
  * per-mille, distinct-token per-mille, mean token length) are each
  * bucketed into deciles; training estimates, per (signal, bucket), the
  * Laplace-smoothed posterior P(good | bucket) in parts-per-million —
  * `(1e6 * (n_good + 1)) // (n + 2)` — and a document's score is the SUM
  * of its five bucket posteriors, thresholded at the 0.5-equivalent
  * 2,500,000. Everything is INTEGER (q219's discipline): counts,
  * truncating divisions, and sums are bit-exact across engines, so the
  * DuckDB oracle retrains the identical model in SQL and the driver hash
  * pins training AND inference end-to-end. (A float log-likelihood NB
  * would be summation-order-dependent and unhashable — same argument as
  * q219 vs naive-Bayes log-probs.)
  *
  * Labels come from the deterministic q96 keep rule (len >= 25 tokens AND
  * stopword ratio >= 3%), trained by resubstitution — the oracle-replayable
  * stand-in for a hand-labeled set. The classifier sees only BUCKETED
  * signals whose decile boundaries do not align with the rule thresholds,
  * so it cannot replay the rule exactly: the confusion matrix has real
  * off-diagonal mass and QualityModelSpec pins above-chance separation
  * (and perfect separation on a synthetic corpus with disjoint signal
  * distributions).
  *
  * Output: the confusion matrix (label, pred, n) plus per-cell score
  * extrema — min/max pin the score arithmetic itself, not just the
  * threshold comparisons.
  *
  * Scale posture: ONE corpus pass computes the five signals (map-only
  * over the scan); the signal->bucket unpivot is a per-row `stack` (no
  * shuffle); training is one map-side-combinable agg to O(signals x 10)
  * rows; scoring joins that TINY model back BROADCAST (at any corpus
  * scale the model is 50 rows) and re-aggregates per doc. Deployment
  * shape at 100 TB: train once on a sample, broadcast the posterior
  * table, score as a map-only join — exactly this plan minus the
  * training agg.
  */
object QualityModel {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Shared signal/bucket/label derivation. `idiv` is the engine's
    * integer-division spelling; `lenFn`/`tokens`/`distinctFn`/`regexFlag`
    * differ between DuckDB and Spark SQL. */
  private def chain(idiv: String, duck: Boolean): String = {
    val ws = if (duck) Text.tokensSql else graft.queries.Dialect.tokensSparkSql
    val len = if (duck) "len" else "size"
    val dis = if (duck) "list_distinct" else "array_distinct"
    val stop = if (duck)
      "len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'is', 'in')))"
    else
      "size(filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'is', 'in')))"
    val re = if (duck) "regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')"
             else "regexp_replace(text, '[a-zA-Z0-9 ]', '')"
    s"""t AS (SELECT doc_id, $ws AS ws, text FROM documents),
       |f AS (SELECT doc_id,
       |    CAST($len(ws) AS BIGINT) AS n_tok,
       |    CAST($stop AS BIGINT) AS n_stop,
       |    CAST(length(text) AS BIGINT) AS n_char,
       |    CAST(length($re) AS BIGINT) AS n_punct,
       |    CAST($len($dis(ws)) AS BIGINT) AS n_uniq
       |  FROM t WHERE $len(ws) > 0),
       |g AS (SELECT doc_id,
       |    CASE WHEN n_tok >= 25 AND 1000 * n_stop >= 30 * n_tok
       |         THEN 1 ELSE 0 END AS label,
       |    LEAST((n_tok) $idiv 16, 9) AS b0,
       |    LEAST(((1000 * n_stop) $idiv n_tok) $idiv 20, 9) AS b1,
       |    LEAST(((1000 * n_punct) $idiv n_char) $idiv 10, 9) AS b2,
       |    LEAST(((1000 * n_uniq) $idiv n_tok) $idiv 100, 9) AS b3,
       |    LEAST((((n_char - n_punct) * 10) $idiv n_tok) $idiv 5, 9) AS b4
       |  FROM f),
       |u AS (SELECT doc_id, label, 0 AS sig, b0 AS b FROM g
       |  UNION ALL SELECT doc_id, label, 1, b1 FROM g
       |  UNION ALL SELECT doc_id, label, 2, b2 FROM g
       |  UNION ALL SELECT doc_id, label, 3, b3 FROM g
       |  UNION ALL SELECT doc_id, label, 4, b4 FROM g),
       |m AS (SELECT sig, b,
       |    CAST((1000000 * (SUM(label) + 1)) $idiv (COUNT(*) + 2) AS BIGINT) AS ppm
       |  FROM u GROUP BY 1, 2),
       |sc AS (SELECT u.doc_id, u.label, CAST(SUM(m.ppm) AS BIGINT) AS score
       |  FROM u JOIN m ON m.sig = u.sig AND m.b = u.b
       |  GROUP BY 1, 2)""".stripMargin
  }

  private def finalSelect: String =
    """SELECT label, CASE WHEN score >= 2500000 THEN 1 ELSE 0 END AS pred,
      |  COUNT(*) AS n,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score
      |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Confusion matrix of the bucket-posterior model over `docs` (must
    * have doc_id + text). Exposed for QualityModelSpec's synthetic
    * separation pin. */
  def confusion(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    val f = docs
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, w => w.isin("the", "a", "of", "and", "to", "is", "in")))
          .cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_char"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("long")
          .as("n_punct"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .filter(col("n_tok") > 0)
    val u = f.select(col("doc_id"),
        when(col("n_tok") >= 25 && lit(1000) * col("n_stop") >= lit(30) * col("n_tok"), 1)
          .otherwise(0).as("label"),
        expr("LEAST(n_tok div 16, 9)").as("b0"),
        expr("LEAST(((1000 * n_stop) div n_tok) div 20, 9)").as("b1"),
        expr("LEAST(((1000 * n_punct) div n_char) div 10, 9)").as("b2"),
        expr("LEAST(((1000 * n_uniq) div n_tok) div 100, 9)").as("b3"),
        expr("LEAST((((n_char - n_punct) * 10) div n_tok) div 5, 9)").as("b4"))
      // per-row unpivot — generates 5 (sig, bucket) rows with NO shuffle
      .selectExpr("doc_id", "label",
        "stack(5, 0, b0, 1, b1, 2, b2, 3, b3, 4, b4) AS (sig, b)")
      // ONE signal pass feeds both training and scoring (bench clears
      // caches per entry; without this the stack+tokenize runs twice)
      .persist()
    // training: O(signals x 10) rows — map-side-combinable agg
    val m = u.groupBy(col("sig"), col("b"))
      .agg(expr("CAST((1000000 * (SUM(label) + 1)) div (COUNT(*) + 2) AS BIGINT)")
        .as("ppm"))
    // scoring: the model is ~50 rows at ANY corpus scale — broadcast
    val sc = u.join(broadcast(m), Seq("sig", "b"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("ppm")).as("score"))
    sc.groupBy(col("label"),
        when(col("score") >= 2500000L, 1).otherwise(0).as("pred"))
      .agg(count(lit(1)).as("n"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy(col("label"), col("pred"))
  }

  val entries: Seq[Entry] = Seq(
    Entry("q234_quality_model",
      s"WITH ${chain("//", duck = true)}\n$finalSelect") { (s, d) =>
      confusion(T(s, d, "documents"))
    }.sqlTwin(s"WITH ${chain("div", duck = false)}\n$finalSelect")
  )
}

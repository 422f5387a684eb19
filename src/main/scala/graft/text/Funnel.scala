package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{Dialect, Entry}

/** Curation funnel (SURVEY.md Q224) — the per-stage survivor report every
  * production corpus build publishes: how many documents enter, and how
  * many survive each gate, with the gates NESTED in pipeline order
  * (robots permission → URL-level dedup among permitted docs → quality
  * screen → exact text dedup among quality survivors). A funnel whose
  * stages are computed independently instead of nested over-counts
  * downstream stages; the report here derives one `reached` level per
  * document, so a document counts at stage k only if it survived k-1.
  *
  * Plan shape: ONE pass over the corpus computes per-doc gate flags —
  * the robots verdict via the REAL q222 engine (per-partition rule-set
  * memo), the URL group key via the REAL q218 canonicalizer, quality
  * via the ingest-staged token index — then two windowed group-min
  * resolutions (URL keeper among permitted, text keeper among quality
  * survivors) and a 5-level count fold joined to the stage list by a
  * 5x5 broadcast theta join. The DuckDB oracle replays every gate
  * arithmetically (the q218/q222 entries prove kernel == formula), so
  * the hash pins the NESTING, not just the individual decisions.
  *
  * At 100 TB the shape is unchanged: map-only flags, two shuffles on
  * (url-group, text) — both already paid by the dedup tiers themselves
  * — and an O(stages) report.
  */
object Funnel {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private val stageNames = Seq(
    1 -> "fetched", 2 -> "robots_allowed", 3 -> "url_unique",
    4 -> "quality_pass", 5 -> "text_unique")

  def report(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "is", "in")

    // per-doc robots verdict + canonical group key, via the real kernels
    val decisions = T(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val memo = scala.collection.mutable.Map.empty[Long, Seq[Robots.Rule]]
        ids.map { id =>
          val host = (id / 4) % 5
          val rules = memo.getOrElseUpdate(host,
            Robots.rulesFor(Robots.parse(Robots.fabricate(host)), Robots.crawlerUa))
          val canon = Urls.canonicalize(Urls.fabricate(id))
          (id, Robots.decide(rules, Robots.pathOf(canon))._1, canon)
        }
      }.toDF("doc_id", "allowed", "canon_url")

    val toks = TokenIndex.toks(s, d)
      .select(col("doc_id"), size(col("ws")).as("n_tok"),
              size(filter(col("ws"), w => w.isin(stop: _*))).as("n_stop"))

    val flags = T(s, d, "documents").select(col("doc_id"), col("text"))
      .join(decisions, "doc_id")
      .join(toks, "doc_id")
      .withColumn("url_keeper",
        min(when(col("allowed"), col("doc_id")))
          .over(Window.partitionBy(col("canon_url"))))
      .withColumn("reach3", col("allowed") && col("doc_id") === col("url_keeper"))
      .withColumn("reach4", col("reach3") && col("n_tok") >= 25 &&
        col("n_stop").cast("double") / col("n_tok") >= 0.03)
      .withColumn("text_keeper",
        min(when(col("reach4"), col("doc_id")))
          .over(Window.partitionBy(col("text"))))
      .withColumn("reached",
        when(col("reach4") && col("doc_id") === col("text_keeper"), 5)
          .when(col("reach4"), 4)
          .when(col("reach3"), 3)
          .when(col("allowed"), 2)
          .otherwise(1))

    val counts = flags.groupBy(col("reached")).agg(count(lit(1)).as("c"))
    val stages = stageNames.toDF("stage_idx", "stage")
    broadcast(stages).join(counts, col("reached") >= col("stage_idx"), "left")
      .groupBy(col("stage_idx"), col("stage"))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("bigint").as("n_docs"))
      .orderBy(col("stage_idx"))
  }

  private val oracleBody: String =
    s"""perdoc AS (
      |  SELECT doc_id,
      |    CASE WHEN reach4 AND doc_id = MIN(CASE WHEN reach4 THEN doc_id END)
      |                            OVER (PARTITION BY text) THEN 5
      |         WHEN reach4 THEN 4
      |         WHEN reach3 THEN 3
      |         WHEN allowed THEN 2
      |         ELSE 1 END AS reached
      |  FROM (
      |    SELECT doc_id, text, allowed, reach3,
      |      reach3 AND n_tok >= 25
      |        AND CAST(n_stop AS DOUBLE) / n_tok >= 0.03 AS reach4
      |    FROM (
      |      SELECT doc_id, text, allowed, n_tok, n_stop,
      |        allowed AND doc_id = MIN(CASE WHEN allowed THEN doc_id END)
      |                        OVER (PARTITION BY grp) AS reach3
      |      FROM base))
      |),
      |counts AS (SELECT reached, COUNT(*) AS c FROM perdoc GROUP BY 1),
      |stages AS (
      |  SELECT 1 AS stage_idx, 'fetched' AS stage
      |  UNION ALL SELECT 2, 'robots_allowed'
      |  UNION ALL SELECT 3, 'url_unique'
      |  UNION ALL SELECT 4, 'quality_pass'
      |  UNION ALL SELECT 5, 'text_unique')
      |SELECT stage_idx, stage,
      |  CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_docs
      |FROM stages LEFT JOIN counts ON reached >= stage_idx
      |GROUP BY 1, 2 ORDER BY stage_idx""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("q224_curation_funnel",
      s"""WITH t AS (SELECT doc_id, text, ${Text.tokensSql} AS ws FROM documents),
        |base AS (
        |  SELECT doc_id, text,
        |    NOT ((((doc_id // 4) % 5) % 2 = 1) AND ((doc_id // 4) % 10 IN (1, 3))) AS allowed,
        |    doc_id // 4 AS grp,
        |    len(ws) AS n_tok,
        |    len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'is', 'in'))) AS n_stop
        |  FROM t),
        |$oracleBody""".stripMargin) { (s, d) =>
      report(s, d)
    }.sqlTwin(
      s"""WITH t AS (SELECT doc_id, text, ${Dialect.tokensSparkSql} AS ws FROM documents),
        |base AS (
        |  SELECT doc_id, text,
        |    NOT ((((doc_id div 4) % 5) % 2 = 1) AND ((doc_id div 4) % 10 IN (1, 3))) AS allowed,
        |    doc_id div 4 AS grp,
        |    size(ws) AS n_tok,
        |    size(filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'is', 'in'))) AS n_stop
        |  FROM t),
        |$oracleBody""".stripMargin)
  )
}

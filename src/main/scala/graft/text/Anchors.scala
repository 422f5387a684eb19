package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** Anchor-text aggregation (SURVEY.md Q232) — the classic web-corpus
  * relevance/quality signal: what OTHER pages say about a target URL.
  * Search engines have indexed anchor text since Brin & Page (WWW 1998
  * §2.2 — anchors "often provide more accurate descriptions of web pages
  * than the pages themselves"); corpus pipelines use the aggregate as a
  * per-target quality prior and as labeling signal. The reference has no
  * crawl layer; this is north-star pipeline machinery like q218/q225.
  *
  * The unit of work is [[Html.Anchor]] — the q217 tokenizer now captures
  * each anchor's ENCLOSED TEXT alongside its href (entity decoding and
  * nesting handled by the same parser pass), so this entry pins that
  * capture end-to-end: pages are fabricated over the q225 link graph
  * ([[LinkGraph.edgeTargets]]), each in-corpus anchor carrying the text
  * `"<parity> doc <t> from <src>"` with doc_id-dependent entity
  * obfuscation (odd sources spell "odd" as `&#111;dd`, sources %4==0
  * spell "even" as `&#101;ven`), plus off-corpus chrome anchors the
  * target filter must exclude. The aggregation then recovers, PER TARGET,
  * facts the engine can only know by reading the anchor text itself:
  * how many in-links, how many from even-id sources (the parity WORD,
  * decoded through the entity layer), and the sum of source ids (the
  * numeric token). The DuckDB oracle replays all three arithmetically
  * from the edge formula, so every parsing layer is load-bearing.
  *
  * Scale posture: fabrication + parse + anchor tokenization are map-only
  * (production: anchor extraction rides the same ingest scan as q217/q221
  * — zero extra passes); the only shuffles are the (target, src) distinct
  * and ONE map-side-combinable aggregation keyed on target — q60's dedup
  * shape. Output is O(targets). At 100 TB the per-target row is exactly
  * the anchor-signal table a ranking/curation stage joins against the
  * corpus (a broadcast or shuffle equi-join on the canonical URL key,
  * q218's key arithmetic).
  */
object Anchors {

  /** Fixture page: q225's outlinks, each anchor carrying parity + source
    * attribution in its text; chrome anchors are off-corpus decoys. */
  def anchorPage(id: Long, n: Long): String = {
    val pw =
      if (id % 2 == 1) "&#111;dd"
      else if (id % 4 == 0) "&#101;ven"
      else "even"
    val as = LinkGraph.edgeTargets(id, n).map { t =>
      s"""<a href="/doc/$t">$pw doc $t from $id</a>"""
    }.mkString("\n")
    s"""<html><head><title>Doc $id</title></head><body>
       |<nav><a href="/home">Home</a> <a href="/about">About</a></nav>
       |<main>
       |$as
       |</main>
       |<footer><a href="/terms">Terms</a> (c) graft</footer>
       |</body></html>""".stripMargin
  }

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val entries: Seq[Entry] = Seq(
    Entry("q232_anchor_text",
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |${LinkGraph.edgesSql}
        |SELECT dst AS target_id,
        |  COUNT(*) AS n_anchors,
        |  CAST(SUM(CASE WHEN src % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
        |  CAST(SUM(src) AS BIGINT) AS sum_src
        |FROM edges GROUP BY 1 ORDER BY target_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = T(s, d, "documents")
      // one-row driver scalar, mirrored by the oracle's COUNT(*) subquery
      val n = docs.count()
      docs.select(col("doc_id")).as[Long]
        .flatMap { id =>
          Html.parse(anchorPage(id, n)).anchors
            .filter(_.href.startsWith("/doc/"))      // drop chrome decoys
            .map { a =>
              // anchor text IS the data: [parity, "doc", t, "from", src]
              val toks = a.text.split(' ')
              (a.href.stripPrefix("/doc/").toLong, toks(4).toLong,
                toks(0) == "even")
            }
        }
        .toDF("target_id", "src", "even")
        .distinct()   // mirror the oracle's UNION dedup of (src, dst)
        .groupBy(col("target_id"))
        .agg(count(lit(1)).as("n_anchors"),
          sum(when(col("even"), 1L).otherwise(0L)).as("n_even"),
          sum(col("src")).as("sum_src"))
        .orderBy(col("target_id"))
    }
  )
}

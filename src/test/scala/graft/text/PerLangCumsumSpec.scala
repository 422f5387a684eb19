package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSuite

/** [[Pipeline.perLangCumsum]] — the two-phase per-language prefix sum that
  * replaced the single `SUM OVER (PARTITION BY lang ORDER BY ord)` window
  * in q119/q259/q266 (guide §2.5: the dominant-language straggler). The
  * optimization contract is BIT-IDENTITY with the one-window form for any
  * bucket count, including on a heavily skewed language mix — that is
  * what lets the DuckDB oracle keep replaying the one-window spelling. */
class PerLangCumsumSpec extends GraftSuite {

  test("two-phase prefix sum == single window on a skewed language mix") {
    import spark.implicits._
    // ~80% of rows in one language (the skew case the rewrite exists
    // for), ord by the engine's draw hash, a few exact ord-boundary
    // values, and ties in ord resolved by doc_id
    val rows = (0L until 3000L).map { id =>
      val lang = if (id % 10 < 8) "en" else if (id % 10 == 8) "de" else "fr"
      val ord =
        if (id % 97 == 0) 0L                      // bucket-boundary pile-up (ties)
        else id % 1000003L * 2654435761L % 1000000007L
      (id, lang, 1L + id % 37, ord)
    }
    val df = rows.toDF("doc_id", "lang", "n_tok", "ord")

    val got = Pipeline.perLangCumsum(df)
      .select(col("doc_id"), col("cum")).as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum", sum(col("n_tok")).over(
        Window.partitionBy(col("lang")).orderBy(col("ord"), col("doc_id"))))
      .select(col("doc_id"), col("cum")).as[(Long, Long)].collect().toMap

    assert(got.size === rows.size)
    assert(got === want)
    spark.catalog.clearCache()
  }

  test("the big window partitions by (lang, bucket), never bare lang") {
    import spark.implicits._
    val df = (0L until 100L)
      .map(id => (id, "en", 1L, id % 1000003L * 2654435761L % 1000000007L))
      .toDF("doc_id", "lang", "n_tok", "ord")
    val p = Pipeline.perLangCumsum(df).queryExecution.executedPlan.toString
    // the corpus-sized phase-1 window must key on (lang, bkt) — a
    // planner/refactor change collapsing it back to bare lang reintroduces
    // the dominant-language serialization this helper removes
    assert(p.contains("windowspecdefinition(lang#") && p.contains("bkt#"),
      s"expected the (lang, bucket)-keyed partial window:\n$p")
  }
}

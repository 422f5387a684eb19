package graft.queries

import org.apache.spark.sql.DataFrame

import graft.GraftSuite
import graft.SparkEntry
import graft.core.Tables

/** SURVEY.md §3.4 entry C: the SQL entry point must reach the same plans
  * and results as the DataFrame combinators — including the custom kernels,
  * which GraftExtensions registers into the session FunctionRegistry so
  * `spark.sql` sees them with no imports. Representative queries from each
  * family run both ways and must match row-for-row. */
class SqlEntrySpec extends GraftSuite {

  private def registerViews(): Unit =
    Tables.all.foreach(t => Tables(spark, sf, t).createOrReplaceTempView(t))

  private def assertSame(name: String, sql: String): Unit = {
    registerViews()
    val viaDf: DataFrame = SparkEntry.queries(name)(spark, sf)
    val viaSql = spark.sql(sql)
    assert(viaDf.columns.toSeq === viaSql.columns.toSeq, s"$name column mismatch")
    assert(viaDf.collect().toSeq === viaSql.collect().toSeq, s"$name row mismatch")
  }

  test("q06_term via SQL == DataFrame") {
    assertSame("q06_term",
      "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'")
  }

  test("q12_inner_join via SQL == DataFrame") {
    assertSame("q12_inner_join",
      """SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)
  }

  test("q21_terms_agg via SQL == DataFrame") {
    assertSame("q21_terms_agg",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 4) AS sum_qty,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("q30_rollup via SQL == DataFrame") {
    assertSame("q30_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g1,
        |  CAST(grouping(l_linestatus) AS INT) AS g2,
        |  COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  test("q33_rank via SQL == DataFrame") {
    assertSame("q33_rank",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin)
  }

  test("q25_histogram via SQL == DataFrame") {
    assertSame("q25_histogram",
      """SELECT CAST(FLOOR(l_quantity / 10) * 10 AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  test("q43_except via SQL == DataFrame") {
    assertSame("q43_except",
      """SELECT c_custkey AS id FROM customer EXCEPT SELECT user_id FROM events
        |ORDER BY id""".stripMargin)
  }

  test("q47_conditional via SQL == DataFrame") {
    assertSame("q47_conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 1000 THEN 'S' WHEN o_totalprice < 100000 THEN 'M' ELSE 'L' END AS sz,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
        |  nvl2(o_orderpriority, 'Y', 'N') AS has_prio,
        |  nvl(NULL, o_orderstatus) AS nv
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  test("q60_dedup_exact via SQL == DataFrame") {
    assertSame("q60_dedup_exact",
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM documents
        |GROUP BY text ORDER BY doc_id""".stripMargin)
  }

  test("q62_cosine_topk via SQL (vec_dot/vec_cosine from GraftExtensions) == DataFrame") {
    assertSame("q62_cosine_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v,
        |                  sqrt(vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                               CAST(embedding AS ARRAY<DOUBLE>))) AS nrm
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM e WHERE vec_id IN (1, 2, 3)),
        |c AS (SELECT q_id, vec_id, ROUND(vec_dot(v, qv) / (nrm * qnrm), 6) AS cos_r
        |      FROM e JOIN q ON vec_id <> q_id),
        |r AS (SELECT q_id, vec_id, cos_r,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |             ORDER BY cos_r DESC, vec_id) AS INT) AS rn FROM c)
        |SELECT q_id, vec_id, cos_r, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin)
  }
}

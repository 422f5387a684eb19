package graft.queries

import graft.GraftSuite
import graft.SparkEntry

/** The sketch variants are never hash-checked (engine-specific output by
  * design); their contract is BOUNDED RELATIVE ERROR vs the exact twins
  * (SURVEY.md §2.2 contract note). */
class ApproxSpec extends GraftSuite {

  test("approx_count_distinct within 5% of exact per group (q23)") {
    val exact = SparkEntry.queries("q23_cardinality")(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q23_cardinality_approx")(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      val rel = math.abs(a - e).toDouble / e
      assert(rel <= 0.05, s"group $k: exact=$e approx=$a rel-err=$rel")
    }
  }

  test("percentile_approx p50 within 2% of exact per group (q24)") {
    val exact = SparkEntry.queries("q24_percentile")(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap   // (priority, p50)
    val approx = SparkEntry.queries("q24_percentile_approx")(spark, sf01).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      val rel = math.abs(a - e) / math.max(math.abs(e), 1e-9)
      assert(rel <= 0.02, s"group $k: exact=$e approx=$a rel-err=$rel")
    }
  }

  test("plan check: q23 approx uses a sketch aggregate, not a distinct expansion") {
    val p = SparkEntry.queries("q23_cardinality_approx")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("approx_count_distinct") || p.contains("HyperLogLog"),
      s"no sketch aggregate in plan:\n$p")
    assert(!p.contains("Expand"), s"approx path should not expand distinct:\n$p")
  }
}

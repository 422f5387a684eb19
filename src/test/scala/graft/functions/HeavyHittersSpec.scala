package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** q149's Misra-Gries summary is bench-only (counter values depend on
  * arrival/merge order — engine-specific like the HLL/TDigest twins).
  * The structural guarantee asserted instead, against exact corpus
  * counts: with k counters over n items,
  *    true(w) - n/(k+1) <= est(w) <= true(w)
  * and every token with true frequency > n/(k+1) appears in the summary.
  */
class HeavyHittersSpec extends GraftSuite {

  private val k = 16

  test("Misra-Gries bound holds against exact counts on the sf0.01 corpus") {
    val words = graft.text.TokenIndex.words(spark, sf01).select(col("w"))
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val err = n.toDouble / (k + 1)

    val est = graft.SparkEntry.queries("q149_heavy_hitters")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.size <= k, s"summary holds ${est.size} counters, cap is $k")
    est.foreach { case (w, e) =>
      val t = exact.getOrElse(w, 0L)
      assert(e <= t, s"'$w' overestimated: est $e > true $t")
      assert(e >= t - err, s"'$w' underestimated past the bound: est $e < $t - $err")
    }
    val mustAppear = exact.collect { case (w, t) if t > err => w }
    val missing = mustAppear.filterNot(est.contains)
    assert(missing.isEmpty, s"heavy tokens missing from the summary: $missing")
  }

  test("deterministic under replay (same partitioning => same summary)") {
    val run1 = graft.SparkEntry.queries("q149_heavy_hitters")(spark, sf01).collect().toSeq
    val run2 = graft.SparkEntry.queries("q149_heavy_hitters")(spark, sf01).collect().toSeq
    assert(run1 === run2)
  }

  // Property: the MG bound must survive ANY stream content and ANY
  // partition/merge tree, not just the fixture corpus — random skewed
  // streams chopped into random partitions, reduced per-partition and
  // merged pairwise (the Aggregator execution shape).
  test("Misra-Gries bound holds for random streams and merge trees") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val mg = MisraGries(8)
    val genStream = Gen.listOfN(400,
      Gen.frequency(6 -> Gen.oneOf("a", "b"), 3 -> Gen.oneOf("c", "d", "e"),
                    1 -> Gen.choose(0, 200).map("t" + _)))
    val genCuts = Gen.listOfN(3, Gen.choose(0, 400))
    val prop = Prop.forAll(genStream, genCuts) { (ws, cuts) =>
      val parts = (0 :: 400 :: cuts).distinct.sorted.sliding(2).toList
        .map { case List(a, b) => ws.slice(a, b) }
      val merged = parts.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
      val est = mg.finish(merged).toMap
      val exact = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val err = ws.size.toDouble / 9   // n/(k+1)
      est.size <= 8 &&
        est.forall { case (w, e) =>
          e <= exact.getOrElse(w, 0L) && e >= exact.getOrElse(w, 0L) - err } &&
        exact.forall { case (w, t) => t <= err || est.contains(w) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

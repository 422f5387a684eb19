package graft.queries

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** q164's oracle executes the SAME generated recursion as the Spark
  * plan, so a bug in the shared generator would pass the hash check —
  * the GeoSpec situation. Pin every model against an independent
  * imperative fold over the same daily series. */
class MovingModelsSpec extends GraftSuite {

  private def holt(w: Seq[Double], a: Double = 0.3, bt: Double = 0.1): Double = {
    var l = w.head
    var b = if (w.length >= 2) w(1) - w(0) else 0.0
    for (t <- 1 until w.length) {
      val ln = a * w(t) + (1 - a) * (l + b)
      val bn = bt * (ln - l) + (1 - bt) * b
      l = ln; b = bn
    }
    l + b
  }

  private def ewma(w: Seq[Double], a: Double = 0.3): Double =
    w.tail.foldLeft(w.head)((s, x) => a * x + (1 - a) * s)

  test("q164 models match an independent imperative fold") {
    val days = graft.core.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n")).orderBy(col("day"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble)
    val got = graft.SparkEntry.queries("q164_moving_models")(spark, sf).collect()
    assert(got.length == days.length)
    got.zipWithIndex.foreach { case (r, i) =>
      val w = days.slice(math.max(0, i - 6), i + 1).map(_._2)
      assert(r.getDate(0).toString == days(i)._1)
      def ok(gotV: Double, want: Double, name: String): Unit =
        assert(math.abs(gotV - want) < 1e-6, s"day ${days(i)._1} $name: $gotV != $want")
      ok(r.getDouble(2), w.sum / w.length, "mavg7")
      ok(r.getDouble(3),
         w.zipWithIndex.map { case (x, j) => x * (j + 1) }.sum / (w.length * (w.length + 1) / 2.0),
         "lwma7")
      ok(r.getDouble(4), ewma(w), "ewma7")
      ok(r.getDouble(5), holt(w), "holt7")
    }
  }

  // the textbook sanity case: a perfectly linear series forecasts the
  // next point exactly (l picks up the level, b the constant slope)
  test("holt on a linear series forecasts the next point") {
    assert(math.abs(holt(Seq(10.0, 20.0, 30.0)) - 40.0) < 1e-12)
    assert(math.abs(ewma(Seq(10.0, 20.0, 30.0)) - 18.1) < 1e-12)
  }
}

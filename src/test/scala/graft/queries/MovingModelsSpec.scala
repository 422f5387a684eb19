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

  /** Independent additive Holt-Winters over a full 14-point window:
    * period-7 seeding (level = season-one mean, trend = mean cross-season
    * slope, s_i = x_i - level), seven (l, b, s) updates, one-step
    * forecast l + b + s_next — mirrors q190's declared semantics with a
    * seasonal ARRAY instead of generated column threading. */
  private def holtWinters(w: Seq[Double], a: Double = 0.3, bt: Double = 0.1,
                          g: Double = 0.3): Double = {
    require(w.length == 14)
    var l = w.take(7).sum / 7.0
    var b = (0 until 7).map(i => w(i + 7) - w(i)).sum / 49.0
    val s = Array.tabulate(7)(i => w(i) - l)
    for (t <- 7 until 14) {
      val idx = t % 7
      val ln = a * (w(t) - s(idx)) + (1 - a) * (l + b)
      val bn = bt * (ln - l) + (1 - bt) * b
      s(idx) = g * (w(t) - ln) + (1 - g) * s(idx)
      l = ln; b = bn
    }
    l + b + s(0)
  }

  test("q190 holt_winters matches an independent fold; warm-up rows are NULL") {
    val days = graft.core.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n")).orderBy(col("day"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble)
    assert(days.length >= 14, s"need a fortnight of fixture days, got ${days.length}")
    val got = graft.SparkEntry.queries("q190_holt_winters")(spark, sf).collect()
    assert(got.length == days.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDate(0).toString == days(i)._1)
      if (i < 13) assert(r.isNullAt(2), s"day ${days(i)._1}: expected NULL warm-up")
      else {
        val want = holtWinters(days.slice(i - 13, i + 1).map(_._2))
        assert(math.abs(r.getDouble(2) - want) < 1e-6,
          s"day ${days(i)._1}: ${r.getDouble(2)} != $want")
      }
    }
  }

  test("holt_winters on a pure period-7 seasonal series forecasts it exactly") {
    val season = Seq(3.0, 9.0, 1.0, 7.0, 5.0, 11.0, 2.0)
    val w = season ++ season
    // level = season mean, trend = 0, s_i = deviations; every update is a
    // fixed point, so the forecast reproduces the next seasonal value.
    assert(math.abs(holtWinters(w) - season.head) < 1e-12)
  }
}

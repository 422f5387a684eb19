package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.GraftSuite

/** The q164/q190 holt recursions now run as single `aggregate()` folds.
  * MovingModelsSpec pins them against imperative folds over the one fixture
  * series; this spec drives the SAME fold expressions over randomized
  * series (lengths, magnitudes, negatives, warm-up frames) so a fold bug
  * that happens to cancel on the fixture cannot hide. All samples evaluate
  * in ONE DataFrame pass — generation is ScalaCheck, execution is batched.
  */
class HoltFoldPropertySpec extends GraftSuite {

  // Literal 0.7/0.9 multipliers (not 1 - 0.3) so the reference does the
  // same double ops as the SQL fold's literals.
  private def holt(w: Seq[Double]): Double = {
    var l = w.head
    var b = if (w.length >= 2) w(1) - w(0) else 0.0
    for (t <- 1 until w.length) {
      val ln = 0.3 * w(t) + 0.7 * (l + b)
      val bn = 0.1 * (ln - l) + 0.9 * b
      l = ln; b = bn
    }
    l + b
  }

  private def holtWinters(w: Seq[Double]): Option[Double] = {
    if (w.length != 14) return None
    var l = (0 until 7).map(w).sum / 7.0
    var b = (0 until 7).map(i => w(i + 7) - w(i)).sum / 49.0
    val s = Array.tabulate(7)(i => w(i) - l)
    for (t <- 8 to 14) {
      val idx = (t - 1) % 7
      val x = w(t - 1)
      val ln = 0.3 * (x - s(idx)) + 0.7 * (l + b)
      val bn = 0.1 * (ln - l) + 0.9 * b
      s(idx) = 0.3 * (x - ln) + 0.7 * s(idx)
      l = ln; b = bn
    }
    Some(l + b + s(0))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** n samples of `gen`, deterministic via per-index seeds. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, rng.Seed(i.toLong)))

  private val value: Gen[Double] =
    Gen.chooseNum(-1000, 1000).map(v => v / 3.0) // non-terminating decimals

  test("q164 holt fold equals the imperative fold on 300 random series") {
    import spark.implicits._
    val series = samples(
      Gen.chooseNum(1, 7).flatMap(n => Gen.listOfN(n, value)), 300)
    val got = series.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("idx", "arr")
      .withColumn("m", size(col("arr")))
      .withColumn("holt7", expr(Metrics.holtFoldSql))
      .orderBy("idx")
      .select("holt7")
      .collect().map(_.getDouble(0))
    series.zip(got).zipWithIndex.foreach { case ((w, g), i) =>
      assert(math.abs(g - round6(holt(w))) < 1e-6,
        s"series $i $w: fold=$g imperative=${holt(w)}")
    }
  }

  test("q190 hw fold equals the imperative fold; non-14 frames are NULL") {
    import spark.implicits._
    val series = samples(
      Gen.frequency(
        3 -> Gen.listOfN(14, value),
        1 -> Gen.chooseNum(1, 13).flatMap(n => Gen.listOfN(n, value))), 300)
    val rows = Metrics.hwForecast(
        series.zipWithIndex.map { case (w, i) => (i, w) }.toDF("idx", "arr"))
      .orderBy("idx")
      .select("hw_forecast")
      .collect()
    series.zip(rows).zipWithIndex.foreach { case ((w, r), i) =>
      holtWinters(w) match {
        case None =>
          assert(r.isNullAt(0), s"series $i len ${w.length}: expected NULL")
        case Some(want) =>
          assert(math.abs(r.getDouble(0) - round6(want)) < 1e-6,
            s"series $i: fold=${r.getDouble(0)} imperative=$want")
      }
    }
  }
}

package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSuite

/** The q235 bucket-posterior quality classifier: perfect separation when
  * the classes have disjoint signal distributions, above-chance (and
  * imperfect — it must NOT be a rule replay) accuracy on the fixture. */
class QualityModelSpec extends GraftSuite {

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("synthetic disjoint corpus: the trained model separates perfectly") {
    import spark.implicits._
    // good: 40 stopword-rich tokens; bad: 8 tokens, punctuation-heavy —
    // every signal's buckets are disjoint between the classes
    val good = (0L until 40L).map(i =>
      (i, Seq.fill(8)("the quick brown fox and a dog of it is in").mkString(" ")))
    val bad = (100L until 140L).map(i => (i, s"x$i!!! ??? ###. zz!! qq??"))
    val got = cells(QualityModel.confusion((good ++ bad).toDF("doc_id", "text")))
    assert(got.keySet == Set((0, 0), (1, 1)), s"off-diagonal cells: $got")
    assert(got((0, 0)) == 40L && got((1, 1)) == 40L)
  }

  test("fixture corpus: above-chance accuracy, but NOT a rule replay") {
    val got = cells(QualityModel.confusion(
      graft.core.Tables(spark, sf, "documents").select(col("doc_id"), col("text"))))
    val total = got.values.sum.toDouble
    val correct = (got.getOrElse((0, 0), 0L) + got.getOrElse((1, 1), 0L)).toDouble
    val majority = math.max(
      got.getOrElse((0, 0), 0L) + got.getOrElse((0, 1), 0L),
      got.getOrElse((1, 0), 0L) + got.getOrElse((1, 1), 0L)).toDouble
    assert(correct / total > majority / total,
      s"model no better than majority class: $got")
    assert(correct / total > 0.8, s"separation too weak to be a model: $got")
    // decile boundaries deliberately misalign with the rule thresholds:
    // a perfect diagonal would mean the model just replayed the rule
    assert(correct < total, s"suspiciously perfect — rule replay? $got")
  }

  test("q242 self-training round: complete, non-degenerate, threshold straddled") {
    val rows = graft.SparkEntry.queries("q242_quality_selftrain")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = graft.core.Tables(spark, sf, "documents").count()
    // every document is re-scored and lands in exactly one cell
    assert(rows.map(_._4).sum == docs, s"lost documents: ${rows.toSeq}")
    // the confidence gate must prevent the majority-class collapse the
    // ungated round exhibited (pred2 all-1): both round-2 classes occur
    assert(rows.map(_._3).distinct.length == 2,
      s"round-2 predictions degenerate: ${rows.toSeq}")
    // the round-2 threshold is real: scores on both sides of 2.5e6
    assert(rows.map(_._5).min < 2500000L && rows.map(_._6).max >= 2500000L)
    // self-training moved SOMETHING: at least one pred1/pred2 flip cell
    assert(rows.exists(r => r._2 != r._3),
      s"round 2 is a no-op relabel: ${rows.toSeq}")
  }
}

package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSuite

/** The Cavnar–Trenkle rank-profile classifier (q219): perfect separation
  * on a synthetic corpus whose "languages" have disjoint character
  * distributions, above-chance diagonal mass on the driver fixture, and
  * determinism of the confusion matrix across runs.
  */
class LangIdModelSpec extends GraftSuite {

  private def confusionMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("disjoint-alphabet languages separate perfectly") {
    import spark.implicits._
    val rnd = new scala.util.Random(219)
    // three fake languages over disjoint alphabets
    val alphabets = Map(
      "aa" -> "abcde", "bb" -> "fghij", "cc" -> "klmno")
    val docs = (0 until 120).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val al = alphabets(lang)
      val words = Seq.fill(20)(Seq.fill(3 + rnd.nextInt(4))(al(rnd.nextInt(al.length))).mkString)
      (i.toLong, words.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val cm = confusionMap(LangId.confusion(docs))
    val total = cm.values.sum
    val diag = cm.collect { case ((a, b), n) if a == b => n }.sum
    assert(total == 120 && diag == 120, s"misclassified: ${cm.filter(p => p._1._1 != p._1._2)}")
  }

  test("fixture confusion matrix: complete, deterministic, above chance") {
    val docs = graft.core.Tables(spark, sf01, "documents")
    val cm1 = confusionMap(LangId.confusion(docs))
    val cm2 = confusionMap(LangId.confusion(docs))
    assert(cm1 == cm2, "confusion matrix not deterministic")
    val total = cm1.values.sum
    assert(total == docs.count(), "every document must be classified exactly once")
    val diag = cm1.collect { case ((a, b), n) if a == b => n }.sum
    val langs = cm1.keys.map(_._1).toSet.size
    // chance diagonal for the majority-class-free rank model ~ total/langs;
    // the fixture's per-lang word-frequency drift must beat it clearly
    assert(diag.toDouble / total > 1.2 / langs,
      s"diagonal $diag/$total not above chance for $langs langs")
  }

  test("distance semantics: absent bigram costs K, present costs rank gap") {
    import spark.implicits._
    // lang "xx" profile is built from one doc; the probe doc shares its
    // bigrams exactly => distance 0 to xx; "yy" disjoint => maximal
    val docs = Seq(
      (0L, "ababab", "xx"), (1L, "cdcdcd", "yy"), (2L, "ababab", "xx"))
      .toDF("doc_id", "text", "lang")
    val cm = confusionMap(LangId.confusion(docs))
    assert(cm(("xx", "xx")) == 2 && cm(("yy", "yy")) == 1)
  }
}

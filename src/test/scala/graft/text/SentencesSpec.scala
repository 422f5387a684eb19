package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The q237 rule segmenter pinned Spark-free: boundary cases by hand,
  * then fabricate→segment under fuzz against an independent arithmetic
  * replay of the fabrication schedule (the oracle's derivation). */
class SentencesSpec extends AnyFunSuite {

  test("boundaries: terminator + capitalized next; end of text; all three terminators") {
    val seg = Sentences.segment("Alpha beta gamma. Delta epsilon! Zeta eta theta?")
    assert(seg.sentences.map(_.mkString(" ")) ==
      Vector("Alpha beta gamma", "Delta epsilon", "Zeta eta theta"))
    assert(seg.suppressed == 0)
  }

  test("abbreviations suppress the split even before a capitalized word") {
    val seg = Sentences.segment("Alpha vs. Beta gamma. Dr. Delta epsilon!")
    assert(seg.sentences.map(_.mkString(" ")) ==
      Vector("Alpha vs. Beta gamma", "Dr. Delta epsilon"))
    assert(seg.suppressed == 2)
  }

  test("terminator before a lowercase token does not split (decimal-style run-on)") {
    val seg = Sentences.segment("Alpha beta. gamma delta Epsilon zeta.")
    // ".  gamma" (lowercase follow) is not a boundary; only end-of-text ends it
    assert(seg.sentences.size == 1)
    assert(seg.suppressed == 0)
  }

  /** Independent replay of the oracle's arithmetic (full 26-word cycles +
    * remainder CASE) — duplicated here ON PURPOSE so a bug in the SQL
    * derivation and a bug in the segmenter cannot cancel out. */
  private def expected(nw: Int): (Long, Long, Long) = {
    val fc = nw / 26
    val r = nw % 26
    val ne = if (r == 0) 0 else if (r <= 5) 1 else if (r <= 11) 2 else if (r <= 18) 3 else 4
    val rs = if (r == 0) 8 else if (r <= 5) r else if (r <= 11) r - 5 else if (r <= 18) r - 11 else r - 18
    val nSent = 4 * fc + ne
    val nAbbrev = (nSent + 2) / 3 - (if ((nSent - 1) % 3 == 0 && rs == 1) 1 else 0)
    (nSent.toLong, nAbbrev.toLong, (nw + nAbbrev).toLong)
  }

  test("fabricate -> segment matches the arithmetic schedule for any word count") {
    val wordGen = Gen.choose(1, 120).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("key", "agg", "row", "scan", "the", "a", "value"))
        .map(_.mkString(" ")))
    val prop = Prop.forAll(wordGen) { text =>
      val nw = text.split(' ').length
      val seg = Sentences.segment(Sentences.fabricate(text))
      val (es, ea, et) = expected(nw)
      seg.sentences.size.toLong == es &&
        seg.suppressed.toLong == ea &&
        seg.sentences.map(_.size.toLong).sum == et
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("fixture drift fails loudly, not by hash mismatch") {
    intercept[IllegalArgumentException](Sentences.fabricate("Upper case words"))
    intercept[IllegalArgumentException](Sentences.fabricate("has a period. here"))
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Resample

/** The 2x upsample (q212) pinned Spark-free: structure (evens carry the
  * originals, odds the truncated midpoints), boundary cases, negative
  * truncation semantics, and a fuzz against a zip-based derivation. */
class ResampleSpec extends AnyFunSuite {

  test("structure and boundaries") {
    assert(Resample.upsample2x(Array.empty[Int]).isEmpty)
    assert(Resample.upsample2x(Array(7)).toSeq == Seq(7))
    assert(Resample.upsample2x(Array(0, 10)).toSeq == Seq(0, 5, 10))
    assert(Resample.upsample2x(Array(1, 2, 4)).toSeq == Seq(1, 1, 2, 3, 4))
    // negative midpoints truncate toward zero: (-5 + 2)/2 = -1 (not -2)
    assert(Resample.upsample2x(Array(-5, 2)).toSeq == Seq(-5, -1, 2))
    assert(Resample.upsample2x(Array(-3, -4)).toSeq == Seq(-3, -3, -4))
  }

  test("fuzz: equals a zip-based derivation; originals survive in place") {
    val rnd = new scala.util.Random(0x2e5a)
    (0 until 400).foreach { trial =>
      val xs = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(5001) - 2500)
      val up = Resample.upsample2x(xs)
      assert(up.length == 2 * xs.length - 1)
      val mids = xs.zip(xs.tail).map { case (a, b) => (a + b) / 2 }
      val want = xs.zip(mids :+ 0).flatMap { case (s, m) => Seq(s, m) }.dropRight(1)
      assert(up.toSeq == want.toSeq, s"trial $trial")
      (0 until xs.length).foreach(i => assert(up(2 * i) == xs(i)))
    }
  }
}

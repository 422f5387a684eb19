package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Vad

/** The VAD run-length scan (q211) pinned Spark-free: hand-checked
  * boundary cases and a fuzz against an independent split-based
  * derivation. (The cross-engine structural check is the q211 oracle's
  * gaps-and-islands derivation.) */
class VadSpec extends AnyFunSuite {

  private val T = Vad.threshold

  test("boundary cases") {
    assert(Vad.segment(Array.empty[Int]) == (0, 0, 0))
    assert(Vad.segment(Array(0, 5, -999)) == (0, 0, 0))            // all silent
    assert(Vad.segment(Array(T, T, T)) == (3, 1, 3))               // all active
    assert(Vad.segment(Array(T, 0, T)) == (2, 2, 1))               // split runs
    assert(Vad.segment(Array(-T, -T - 1)) == (2, 1, 2))            // negative active
    assert(Vad.segment(Array(T - 1)) == (0, 0, 0))                 // just below gate
    assert(Vad.segment(Array(0, T, T, 0, T, 0, T, T, T)) == (6, 3, 3))
  }

  test("fuzz: matches an independent split-based derivation") {
    val rnd = new scala.util.Random(0xfad)
    (0 until 500).foreach { trial =>
      val xs = Array.fill(rnd.nextInt(80))(rnd.nextInt(5000) - 2500)
      val runs = {
        // independent shape: mark, join to string, split on silence
        val marks = xs.map(s => if (math.abs(s) >= T) 'a' else '.')
        new String(marks).split('.').filter(_.nonEmpty).map(_.length)
      }
      val want = (runs.sum, runs.length, if (runs.isEmpty) 0 else runs.max)
      assert(Vad.segment(xs) == want, s"trial $trial: ${xs.take(12).mkString(",")}")
    }
  }
}

package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The q236/q237 integer Viterbi kernel pinned Spark-free: the DP equals
  * exhaustive segmentation search under fuzz, and the arithmetic
  * (score, n_pieces) decomposition recovers the optimum's true
  * components — the invariant that lets the oracle skip back-pointers. */
class UnigramSpec extends AnyFunSuite {

  /** Exhaustive search: best (value, score, pieces) over ALL segmentations
    * of `w` into single chars (-1) and known pieces. */
  private def brute(w: String, pv: Map[String, Long]): (Long, Long, Long) = {
    if (w.isEmpty) return (0L, 0L, 0L)
    val opts = Seq((1, -1L, 0L)) ++
      (Unigram.PieceMin to Unigram.PieceMax)
        .filter(_ <= w.length)
        .flatMap(l => pv.get(w.take(l)).map(v => (l, v, (v + 1) / 1024)))
    opts.map { case (l, v, s) =>
      val (rv, rs, rn) = brute(w.drop(l), pv)
      (v + rv, s + rs, 1 + rn)
    }.maxBy(t => (t._1, -t._3))
  }

  private val pieceGen = Gen.chooseNum(1L, 50L).map(c => c * 1024L * 2L - 1L)

  test("dpValue == exhaustive search; decomposition recovers score and piece count") {
    val alpha = Gen.choose(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // piece values must have the v = m*1024 - 1 shape the arithmetic
    // decomposition assumes (pieceGen guarantees it); keys of length 2-4
    val pieces = Gen.mapOfN(6, Gen.zip(
      Gen.choose(Unigram.PieceMin, Unigram.PieceMax).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
      pieceGen))
    val prop = Prop.forAll(alpha, pieces) { (w: String, pv: Map[String, Long]) =>
      val got = Unigram.dpValue(w, pv)
      val (bv, bs, bn) = brute(w, pv)
      val (s, n) = Unigram.decompose(w, got)
      got == bv && s == bs && n == bn
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("3- and 4-char pieces compete with chains of shorter pieces") {
    // "abcd": piece abcd (v=3*1024*c-1) vs ab+cd (2*(1024*c-1)): with equal
    // per-occurrence counts the single 4-gram wins (3c*1024-1 > 2c*1024-2)
    val pv = Map("abcd" -> (3L * 1024 * 5 - 1), "ab" -> (1024L * 5 - 1),
      "cd" -> (1024L * 5 - 1))
    val v = Unigram.dpValue("abcd", pv)
    assert(v == 3L * 1024 * 5 - 1)
    assert(Unigram.decompose("abcd", v) == (15L, 1L))
  }

  test("unknown text falls back to chars; overlong words fall back arithmetically") {
    assert(Unigram.dpValue("zzz", Map.empty) == -3L)
    assert(Unigram.decompose("zzz", -3L) == (0L, 3L))
    val long = "a" * (Unigram.MaxLen + 3)
    assert(Unigram.dpValue(long, Map("aa" -> 1023L)) == -long.length.toLong)
    assert(Unigram.decompose(long, -long.length.toLong) == (0L, long.length.toLong))
  }
}

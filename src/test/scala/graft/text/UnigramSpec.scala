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

  test("backtrack path reproduces the DP value exactly (q241 E-step, fuzzed)") {
    // the emitted pieces plus single-char fallback for uncovered chars
    // must re-sum to dpValue — the invariant that makes usage counting
    // lossless; also pins that every emitted piece is in the inventory
    val alpha = Gen.choose(1, Unigram.MaxLen).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val pieces = Gen.mapOfN(6, Gen.zip(
      Gen.choose(Unigram.PieceMin, Unigram.PieceMax).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
      pieceGen))
    val prop = Prop.forAll(alpha, pieces) { (w: String, pv: Map[String, Long]) =>
      val used = Unigram.piecesUsed(w, pv)
      val covered = used.map(_.length).sum
      val pathValue = used.map(pv).sum - (w.length - covered)
      used.forall(pv.contains) && pathValue == Unigram.dpValue(w, pv)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("backtrack tie-break: smallest length first, single char before pieces") {
    // a three-way tie at the last position: "aaaa" with v(aa)=v2 and
    // v(aaa)=2*v2+1 gives dp(4) = dp(3)-1 = dp(2)+v2 = dp(1)+v3 = 2*v2
    // (char after "aaa", "aa"+"aa", and char-then-"aaa" all tie). The
    // backtrack checks the single-char move FIRST, so the walked path is
    // char at 4 then the "aaa" piece — NOT "aa"+"aa" — and the oracle's
    // unrolled chain must walk the same one.
    val v2 = 2L * 1024 - 1                       // aa
    val v3 = 2 * v2 + 1                          // aaa
    val pv = Map("aa" -> v2, "aaa" -> v3)
    assert(Unigram.dpValue("aaaa", pv) == 2 * v2)
    assert(Unigram.piecesUsed("aaaa", pv) == Seq("aaa"))
  }

  test("unknown text falls back to chars; overlong words fall back arithmetically") {
    assert(Unigram.dpValue("zzz", Map.empty) == -3L)
    assert(Unigram.decompose("zzz", -3L) == (0L, 3L))
    val long = "a" * (Unigram.MaxLen + 3)
    assert(Unigram.dpValue(long, Map("aa" -> 1023L)) == -long.length.toLong)
    assert(Unigram.decompose(long, -long.length.toLong) == (0L, long.length.toLong))
  }
}

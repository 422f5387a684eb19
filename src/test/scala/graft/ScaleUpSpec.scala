package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stride permutation SCALE.md's 10× fixture methodology leans on:
  * if it silently stopped being a bijection (token loss) or stopped
  * scrambling adjacency (shingle overlap), the sf1 scale point's
  * dedup-tier numbers would measure a different workload than the page
  * claims. */
class ScaleUpSpec extends AnyFunSuite {

  private def perm(text: String, i: Int): String =
    ScaleUp.permuteTokens(text, i)

  test("bijection: token multiset is preserved exactly") {
    val texts = Seq(
      "a b c d e f g",
      "the quick brown fox jumps over the lazy dog and the cat",
      "x " * 30 + "y",           // heavy duplication
      "one two three four five six seven eight nine ten eleven twelve")
    for (t <- texts; i <- 1 to 9) {
      val before = t.split("\\s+").filter(_.nonEmpty).toSeq.sorted
      val after = perm(t, i).split("\\s+").filter(_.nonEmpty).toSeq.sorted
      assert(after === before, s"copy $i lost/gained tokens")
    }
  }

  test("determinism + same-permutation-per-copy (near-dup structure survives)") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "alpha beta gamma delta epsilon zeta eta iota" // 1 substitution
    for (i <- 1 to 5) {
      assert(perm(a, i) === perm(a, i), "not deterministic")
      // same-length near-dups diverge in exactly the substituted slot
      val pa = perm(a, i).split(' '); val pb = perm(b, i).split(' ')
      assert(pa.zip(pb).count { case (x, y) => x != y } === 1,
        s"copy $i: same-length near-dups no longer align")
    }
  }

  test("adjacency scrambles: cross-copy 3-shingle overlap collapses") {
    val t = (1 to 40).map(k => s"w$k").mkString(" ")
    def shingles(s: String): Set[Seq[String]] =
      s.split(' ').toSeq.sliding(3).map(_.toSeq).toSet
    val base = shingles(t)
    for (i <- 1 to 9) {
      val inter = (base & shingles(perm(t, i))).size
      assert(inter <= 2, s"copy $i shares $inter 3-shingles with copy 0")
    }
    // copies are also mutually decorrelated, not just vs copy 0
    val inter12 = (shingles(perm(t, 1)) & shingles(perm(t, 2))).size
    assert(inter12 <= 2, s"copies 1 and 2 share $inter12 3-shingles")
  }

  test("degenerate inputs pass through") {
    assert(perm("", 3) === "")
    assert(perm("solo", 3) === "solo")
    // stride adjusts when the candidate divides the length (gcd != 1)
    val t3 = "a b c"  // n=3, candidate stride for i=1 is 3 -> bumps to 4
    assert(perm(t3, 1).split(' ').sorted.toSeq === Seq("a", "b", "c"))
  }
}

package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized pin for the q222 rule matcher: [[Robots.matches]] must
  * agree with an INDEPENDENT `java.util.regex` translation of RFC 9309
  * pattern semantics — `*` → `.*`, trailing `$` → full match, otherwise
  * prefix match (`lookingAt`), literal segments quoted. The hand-rolled
  * matcher exists because the hot path must not pay regex compilation
  * per rule; this property keeps it semantically identical to the
  * obviously-correct translation on inputs the fixture pins don't
  * enumerate (consecutive stars, empty segments, star-at-ends,
  * pattern==path boundaries). */
class RobotsPropertySpec extends AnyFunSuite {

  private def regexMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val rx = p.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
    val m = java.util.regex.Pattern.compile(rx).matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  // Small alphabet so collisions (and thus positive matches) are common.
  // BOUNDED sizes: the reference translation is a backtracking regex, and
  // an unbounded pattern (dozens of `*`-separated ambiguous segments)
  // against a long non-matching path is exponential in the star count —
  // one unlucky ScalaCheck draw ran the suite into a multi-hour regex
  // spin (round-16 close). <= 6 stars and <= 32-char paths keep every
  // boundary case (consecutive stars, empty segments, star-at-ends,
  // pattern==path) while capping the reference's worst case far below
  // the product matcher's O(n·m).
  private val pathGen: Gen[String] =
    Gen.choose(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', '/', '1')).map("/" + _.mkString))

  private val patternGen: Gen[String] = for {
    nSegs <- Gen.choose(0, 6)
    segs <- Gen.listOfN(nSegs,
      Gen.choose(0, 6).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf('a', 'b', '/', '1')).map(_.mkString)))
    anchor <- Gen.oneOf("", "$")
  } yield "/" + segs.mkString("*") + anchor

  test("Robots.matches agrees with the regex translation on random pattern/path pairs") {
    val prop = Prop.forAll(patternGen, pathGen) { (pattern, path) =>
      Robots.matches(pattern, path) == regexMatch(pattern, path)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("matcher agrees with regex on near-miss pairs derived from the pattern itself") {
    // paths built FROM the pattern (stars replaced by fragments, suffixes
    // appended/truncated) hit the boundary cases uniform sampling misses
    val prop = Prop.forAll(patternGen, Gen.oneOf("", "a", "/", "1b"),
                           Gen.choose(0, 3)) { (pattern, fill, drop) =>
      val body = (if (pattern.endsWith("$")) pattern.dropRight(1) else pattern)
        .replace("*", fill)
      val path = body.substring(0, (body.length - drop).max(0)) + fill
      Robots.matches(pattern, path) == regexMatch(pattern, path)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }
}

package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** q255 — the PII scrubber pinned Spark-free: schedule arithmetic,
  * span-exact regex behavior, fixture-drift guards, and the residual
  * sweep on hand-built cases the fixture may never exercise. */
class PiiSpec extends AnyFunSuite {

  test("scrub removes exactly the injected tokens, span-exactly") {
    val id = 17L
    val soup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fab = Pii.fabricate(id, soup)
    val (clean, ne, np, redacted) = Pii.scrub(fab)
    assert(ne == Pii.nEmails(id) && np == Pii.nPhones(id))
    val expected =
      (0 until Pii.nEmails(id)).map(Pii.emailTok(id, _).length).sum +
      (0 until Pii.nPhones(id)).map(Pii.phoneTok(id, _).length).sum
    assert(redacted == expected, s"span drift: $redacted vs $expected")
    assert(!clean.contains("@") && !clean.matches(".*555-[0-9]{4}.*"))
    // every original soup word survives the round trip
    soup.split(' ').foreach(w => assert(clean.contains(w)))
  }

  test("token lengths match the oracle's closed forms") {
    for (id <- Seq(0L, 7L, 42L, 123L, 4999L); i <- 0 until 3) {
      assert(Pii.emailTok(id, i).length == 16 + id.toString.length,
        s"email length drifted for id=$id i=$i: ${Pii.emailTok(id, i)}")
      assert(Pii.phoneTok(id, i).length == 8)
    }
  }

  test("scrubber does not over-match neighbors or under-match adjacent PII") {
    val (clean, ne, np, red) = Pii.scrub("word user3.0@mail3.com 555-0123 tail")
    assert(ne == 1 && np == 1)
    assert(red == "user3.0@mail3.com".length + 8)
    assert(clean == "word <email> <phone> tail")
  }

  test("fabricate rejects PII-shaped fixture drift loudly") {
    intercept[IllegalArgumentException](Pii.fabricate(1L, "has digit4 word"))
    intercept[IllegalArgumentException](Pii.fabricate(1L, "mail@already here"))
  }
}

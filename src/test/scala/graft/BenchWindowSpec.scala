package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's consecutive-window inflation gate (VERDICT r21 #6): >= k
  * ADJACENT entries above their inflation threshold mark a contention
  * window and every member — including sub-threshold riders — joins the
  * retry set. Pinned on synthetic inflation patterns shaped like the two
  * r21 driver windows (a 6-entry block and a scattered-rider block): the
  * gate must fire on contiguous runs, fire on nothing shorter, and never
  * swallow isolated outliers into a window they are not adjacent to.
  */
class BenchWindowSpec extends AnyFunSuite {

  private def windows(hot: Seq[Boolean]) = Bench.contentionWindows(hot, 3)

  test("fires on a contiguous >= 3 run (the r21 q21-q26 signature)") {
    // entries 2..7 inflated — the whole block retries, neighbours do not
    val hot = Seq(false, false, true, true, true, true, true, true, false)
    assert(windows(hot) == Set(2, 3, 4, 5, 6, 7))
  }

  test("does not fire on isolated or paired outliers") {
    assert(windows(Seq(true, false, true, true, false, true)).isEmpty)
  }

  test("separate runs each gate independently; short runs between them do not") {
    val hot = Seq(true, true, true, false, true, true, false, true, true, true, true)
    assert(windows(hot) == Set(0, 1, 2, 7, 8, 9, 10))
  }

  test("clean sweep retries nothing; fully-hot sweep retries everything") {
    assert(windows(Seq.fill(10)(false)).isEmpty)
    assert(windows(Seq.fill(4)(true)) == Set(0, 1, 2, 3))
  }

  test("boundary: run length exactly k fires, k-1 does not") {
    assert(windows(Seq(true, true, true)) == Set(0, 1, 2))
    assert(windows(Seq(true, true)).isEmpty)
  }
}

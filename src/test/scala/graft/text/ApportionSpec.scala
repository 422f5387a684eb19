package graft.text

import graft.GraftSuite

/** q258 — Hamilton largest-remainder apportionment, pinned against an
  * exact integer replay and the method's defining properties: the
  * allocations sum to the budget EXACTLY (the failure mode of q179's
  * independent rounding), every language gets floor(quota) or
  * floor(quota)+1, and exactly (B - Σ base) bonus units go to the largest
  * remainders with the documented lang-ascending tie rule.
  */
class ApportionSpec extends GraftSuite {

  private val B = 1000000L

  test("q258: allocations sum to the budget; quota bounds; exact integer replay") {
    val rows = graft.SparkEntry.queries("q258_budget_apportion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted, "not lang-ordered")
    val t = rows.map(_._2).sum
    assert(rows.map(_._5).sum == B, s"allocations do not sum to the budget: ${rows.toSeq}")

    // independent replay of the method
    val base = rows.map { case (l, n, _, _, _) => l -> (B * n / t, B * n % t) }.toMap
    val leftover = B - base.values.map(_._1).sum
    val bonus = rows.map(_._1).sortBy(l => (-base(l)._2, l)).take(leftover.toInt).toSet
    for ((l, n, b, rem, alloc) <- rows) {
      assert((b, rem) == base(l), s"$l: base/rem mismatch")
      assert(alloc == b + (if (bonus(l)) 1 else 0), s"$l: bonus assignment diverges")
      // Hamilton stays within 1 of the exact quota: base = floor(B*n/T)
      assert(alloc == b || alloc == b + 1)
      assert(b * t <= B * n && B * n < (b + 1) * t, s"$l: base is not floor(quota)")
    }
    // the fixture must actually exercise the bonus branch both ways
    assert(leftover > 0 && leftover < rows.length,
      s"degenerate leftover $leftover of ${rows.length} langs — quota ties hide the rank rule")
  }
}

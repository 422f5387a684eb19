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

  test("q259: each language's draw is the maximal q119-order prefix under its allocation") {
    val kept = graft.SparkEntry.queries("q259_apportioned_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // independent replay: corpus -> Hamilton(T/4) -> per-lang ordered walk
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val n = r.getString(2).toLowerCase.replaceAll("[^a-z0-9]+", " ")
          .trim.split(" ").count(_.nonEmpty)
        (r.getLong(0), r.getString(1), n.toLong)
      }.filter(_._3 > 0)
    val perLang = docs.groupBy(_._2).map { case (l, ds) => l -> ds.map(_._3).sum }
    val t = perLang.values.sum
    val bud = t / 4
    val base = perLang.map { case (l, n) => l -> (bud * n / t, bud * n % t) }
    val leftover = bud - base.values.map(_._1).sum
    val bonus = base.keys.toSeq.sortBy(l => (-base(l)._2, l)).take(leftover.toInt).toSet
    val alloc = base.map { case (l, (b, _)) => l -> (b + (if (bonus(l)) 1L else 0L)) }
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (l, ds) =>
      val ordered = ds.toSeq.sortBy(d => (d._1 % 1000003L * 2654435761L % 1000000007L, d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= alloc(l))
        .map { case ((id, _, n), c) => id -> ((l, n, c)) }
    }.toMap
    assert(kept.map(_._1).toSet == expect.keySet,
      s"kept set diverges from the replay (${kept.length} vs ${expect.size})")
    for ((id, l, n, c) <- kept) {
      val (el, en, ec) = expect(id)
      assert((l, n, c) == (el, en, ec), s"doc $id: row mismatch")
    }
    // the quarter budget must CUT at this scale (vacuity is the failure
    // mode the scale-proportional budget exists to prevent) and every
    // language must still be represented
    assert(kept.length < docs.length, "sampler kept everything — vacuous budget")
    assert(kept.map(_._2).toSet == docs.map(_._2).toSet,
      "a language got no docs — apportionment starved it")
  }
}

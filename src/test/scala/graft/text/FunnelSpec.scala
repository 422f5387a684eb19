package graft.text

import graft.GraftSuite

/** q224 — the nested curation funnel pinned against an independent
  * driver-side replay of the gate chain (kernels reused, plumbing
  * reimplemented): monotone counts, correct entry total, and exact
  * per-stage values.
  */
class FunnelSpec extends GraftSuite {

  test("funnel counts match a brute-force nested replay; monotone") {
    val rows = Funnel.report(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    val ns = rows.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"not monotone: ${ns.toSeq}")

    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = Set("the", "a", "of", "and", "to", "is", "in")
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
    val allowed = docs.filter { case (id, _) =>
      val rules = Robots.rulesFor(Robots.parse(Robots.fabricate((id / 4) % 5)), Robots.crawlerUa)
      Robots.decide(rules, Robots.pathOf(Urls.canonicalize(Urls.fabricate(id))))._1
    }
    val urlKeep = allowed.groupBy { case (id, _) => Urls.canonicalize(Urls.fabricate(id)) }
      .values.map(_.minBy(_._1)).toSeq
    val qual = urlKeep.filter { case (_, t) =>
      val ws = toks(t)
      ws.size >= 25 && ws.count(stop).toDouble / ws.size >= 0.03
    }
    val textUniq = qual.groupBy(_._2).values.map(_.minBy(_._1)).toSeq
    assert(ns.toSeq == Seq(docs.length.toLong, allowed.length.toLong,
      urlKeep.length.toLong, qual.length.toLong, textUniq.length.toLong))
  }

  test("q252: v2 extends v1 — common stages identical, 8 levels monotone, gates nested") {
    val v1 = Funnel.report(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val v2 = Funnel.reportV2(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(v2.map(_._1).toSeq == Seq(1, 2, 3, 4, 5, 6, 7, 8))
    // the shared gate ladder must produce byte-identical counts: one
    // derivation (reachFlags) feeds both reports, and this pins that the
    // composition did not perturb the upstream stages
    assert(v2.take(5).toSeq == v1.toSeq,
      s"v2's common stages diverge from v1: ${v1.toSeq} vs ${v2.take(5).toSeq}")
    val ns = v2.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, s"not monotone: ${ns.toSeq}")
    // every model gate must have real selectivity on the fixture (the
    // q225 degenerate-fixture lesson: a gate that drops nothing is not
    // pinned by the hash — the 2.5M keep threshold was measured vacuous
    // here, which is why the funnel gates at the confident-positive bar;
    // likewise stage 8 gates at FunnelGateMargin, not 0)
    assert(ns(5) < ns(4), s"model gate dropped nothing: ${ns.toSeq}")
    assert(ns(6) < ns(5), s"LM gate dropped nothing: ${ns.toSeq}")
    assert(ns(7) < ns(6), s"linear-model gate dropped nothing: ${ns.toSeq}")
    assert(ns(7) > 0, s"linear-model gate dropped everything: ${ns.toSeq}")
  }
}

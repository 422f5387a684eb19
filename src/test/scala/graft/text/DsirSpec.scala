package graft.text

import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSuite

/** q262 — DSIR-style importance resampling (Xie et al., NeurIPS 2023),
  * pinned three ways: an exact integer replay of the whole pipeline
  * (hashed-bigram features → Laplace-smoothed micro-nat log-ratios →
  * top-quarter selection in q91's tie order), the method's DEFINING
  * property — the selected set's hashed-n-gram distribution is closer
  * (in KL) to the target distribution than a same-size uniform draw's —
  * and composition with the q258 apportioner (the selected set is a
  * legal allocator input). The fixture must exercise the selection
  * non-vacuously: a non-empty target slice strictly smaller than the
  * corpus, and a selected set that actually differs from the uniform
  * draw.
  */
class DsirSpec extends GraftSuite {

  private val B = 64
  private val stop = Set("the", "a", "of", "and", "to", "is", "in")

  private def tok(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq

  private def bucket(w1: String, w2: String): Long =
    graft.functions.TokenHash.hash(UTF8String.fromString(s"$w1 $w2")) % B

  private def ord(id: Long): Long = id % 1000003L * 2654435761L % 1000000007L

  // bucket-count distribution of a doc set over its bigram features
  private def dist(featByDoc: Map[Long, Map[Long, Long]], ids: Set[Long]): Map[Long, Long] =
    featByDoc.view.filterKeys(ids).values
      .flatten.groupMapReduce(_._1)(_._2)(_ + _).withDefaultValue(0L)

  test("q262: exact integer replay; KL(target || selected) beats uniform; feeds the apportioner") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), tok(r.getString(2))))

    // ---- driver replay of the entry ----
    val featByDoc: Map[Long, Map[Long, Long]] = docs.flatMap { case (id, _, ws) =>
      if (ws.size < 2) None
      else Some(id -> ws.zip(ws.tail).map { case (a, b) => bucket(a, b) }
        .groupMapReduce(identity)(_ => 1L)(_ + _))
    }.toMap
    val target: Set[Long] = docs.collect { case (id, lang, ws)
      if lang == "en" && ws.size >= 25 && 100 * ws.count(stop) >= 3 * ws.size => id
    }.toSet
    // non-vacuous slice: the importance ratio must have something to aim at
    assert(target.nonEmpty && target.size < docs.length,
      s"degenerate target slice: ${target.size} of ${docs.length}")

    val qc = dist(featByDoc, featByDoc.keySet)
    val pc = dist(featByDoc, target)
    val qt = qc.values.sum
    val pt = pc.values.sum
    val lam: Map[Long, Long] = qc.keys.map { b =>
      b -> math.floor(1000000 * math.log(
        ((pc(b) + 1.0) * (qt + 64.0)) / ((qc(b) + 1.0) * (pt + 64.0)))).toLong
    }.toMap
    val scores: Map[Long, Long] = featByDoc.map { case (id, f) =>
      id -> f.map { case (b, c) => c * lam(b) }.sum
    }
    val k = featByDoc.size / 4
    val selected = featByDoc.keySet.toSeq
      .sortBy(id => (-scores(id), ord(id), id)).take(k)
    val selectedSet = selected.toSet

    val got = graft.SparkEntry.queries("q262_dsir_select")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == k, s"selected ${got.length}, expected n//4 = $k")
    assert(got.map(_._1).toSet == selectedSet, "selected set diverges from the replay")
    val langOf = docs.map(d => d._1 -> d._2).toMap
    for ((id, lang, nbg, logw) <- got) {
      assert(lang == langOf(id) && nbg == featByDoc(id).values.sum && logw == scores(id),
        s"doc $id: row mismatch")
    }

    // ---- the method's defining property: target-KL improvement ----
    // smoothed KL(p-hat || s-hat) over the B buckets, against a same-size
    // UNIFORM deterministic draw (first k docs in q91's hash order — the
    // selection rule with the importance weight removed, so the delta
    // isolates exactly what DSIR adds)
    val uniform = featByDoc.keySet.toSeq.sortBy(id => (ord(id), id)).take(k).toSet
    assert(selectedSet != uniform, "selection degenerated to the uniform draw")
    def kl(p: Map[Long, Long], s: Map[Long, Long]): Double = {
      val ptot = p.values.sum + B.toDouble
      val stot = s.values.sum + B.toDouble
      (0L until B).map { b =>
        val pb = (p(b) + 1.0) / ptot
        pb * math.log(pb / ((s(b) + 1.0) / stot))
      }.sum
    }
    val klSel = kl(pc, dist(featByDoc, selectedSet))
    val klUni = kl(pc, dist(featByDoc, uniform))
    assert(klSel < klUni,
      s"selected set is NOT closer to the target: KL sel=$klSel vs uniform=$klUni")

    // ---- composition: the selected set is a legal apportioner input ----
    // Hamilton over the selected set's per-lang token mass must split a
    // budget exactly (the q258 contract on the DSIR output, the next
    // stage of the pipeline: select -> apportion -> draw)
    val perLang = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val t = perLang.values.sum
    val bud = 10000L
    val base = perLang.map { case (l, n) => l -> (bud * n / t) }
    val leftover = bud - base.values.sum
    val bonus = perLang.keys.toSeq
      .sortBy(l => (-(bud * perLang(l) % t), l)).take(leftover.toInt).toSet
    val alloc = base.map { case (l, b) => l -> (b + (if (bonus(l)) 1L else 0L)) }
    assert(alloc.values.sum == bud, "apportioning the DSIR output drifted off-budget")
  }

  test("q266: the curated draw is the maximal per-lang prefix of the q262 selection") {
    val sel = graft.SparkEntry.queries("q262_dsir_select")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = graft.SparkEntry.queries("q266_dsir_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // the draw must cut WITHIN the selection (subset + strictly smaller —
    // the scale-proportional half budget is non-vacuous by construction)
    val selIds = sel.map(_._1).toSet
    assert(kept.forall(k => selIds(k._1)), "draw kept a document DSIR rejected")
    assert(kept.length < sel.length, "draw kept the whole selection — vacuous budget")
    assert(kept.map(_._2).toSet == sel.map(_._2).toSet,
      "a language got no docs — apportionment starved it")

    // independent replay: selected totals -> Hamilton(T/2) -> per-lang
    // ordered walk (q259's replay law applied to the q262 output)
    val ws = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1)).size.toLong).toMap
    val docs = sel.map { case (id, lang) => (id, lang, ws(id)) }
    val perLang = docs.groupBy(_._2).map { case (l, ds) => l -> ds.map(_._3).sum }
    val t = perLang.values.sum
    val bud = t / 2
    val base = perLang.map { case (l, n) => l -> (bud * n / t, bud * n % t) }
    val leftover = bud - base.values.map(_._1).sum
    val bonus = base.keys.toSeq.sortBy(l => (-base(l)._2, l)).take(leftover.toInt).toSet
    val alloc = base.map { case (l, (b, _)) => l -> (b + (if (bonus(l)) 1L else 0L)) }
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (l, ds) =>
      val ordered = ds.sortBy(x => (ord(x._1), x._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= alloc(l))
        .map { case ((id, _, n), c) => id -> ((l, n, c)) }
    }.toMap
    assert(kept.map(_._1).toSet == expect.keySet,
      s"kept set diverges from the replay (${kept.length} vs ${expect.size})")
    for ((id, l, n, c) <- kept)
      assert((l, n, c) == expect(id), s"doc $id: row mismatch")
  }
}

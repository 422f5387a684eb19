package graft.text

import graft.GraftSuite

/** q256/q257 — the duplicated-window DECISION entries, pinned against an
  * independent driver-side replay (string windows, Scala collections — no
  * fingerprints, no Spark) plus the cross-entry relations their hashes
  * cannot see: q256's marked set is a strict subset of q146's coverage
  * (the canonical occurrence survives), every cut span is at least one
  * full window long, and q257's leak verdicts agree with brute-force
  * shared-window sets across the split.
  */
class DupSpanScrubSpec extends GraftSuite {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def toks(t: String): Array[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty)

  /** Every (doc_id, start, window-string) occurrence on the fixture. */
  private lazy val occurrences: Seq[(Long, Int, String)] = {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.toSeq.flatMap { case (id, text) =>
      val ws = toks(text)
      (0 to ws.length - 16).map(i => (id, i, ws.slice(i, i + 16).mkString(" ")))
    }
  }

  test("q256: ledger matches a brute-force replay; spans >= 16; subset of q146 coverage") {
    val byWin = occurrences.groupBy(_._3)
    // canonical occurrence = globally smallest (doc_id, start) per window
    val marked = byWin.values.filter(_.size > 1).flatMap { occ =>
      occ.sortBy(o => (o._1, o._2)).drop(1)
        .flatMap(o => (o._2 until o._2 + 16).map(p => (o._1, p)))
    }.toSet
    val expect = marked.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      val spans = 1 + sorted.zip(sorted.tail).count { case (a, b) => b != a + 1 }
      id -> (sorted.size.toLong, spans.toLong)
    }

    val rows = run("q256_dup_span_scrub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((id, nTok, nRm, nSpans, nKept) <- rows) {
      val (eRm, eSpans) = expect.getOrElse(id, (0L, 0L))
      assert(nRm == eRm && nSpans == eSpans,
        s"doc $id: got removed=$nRm spans=$nSpans, replay says $eRm/$eSpans")
      assert(nKept == nTok - nRm, s"doc $id: kept != tok - removed")
      assert(16L * nSpans <= nRm, s"doc $id: a span shorter than one window")
    }
    // the fixture must exercise BOTH branches (the q225 degenerate-fixture
    // lesson: an all-zero or all-covered column is not pinned by the hash)
    assert(rows.exists(_._3 > 0), "no doc was scrubbed — degenerate fixture")
    assert(rows.exists(_._3 == 0), "every doc was scrubbed — degenerate fixture")

    // q146 coverage counts ALL occurrences of a duplicated window; q256
    // marks only non-canonical ones — per doc the scrub is <= the coverage
    val cov = run("q146_window_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    for ((id, _, nRm, _, _) <- rows)
      assert(nRm <= cov(id), s"doc $id: scrub $nRm exceeds q146 coverage ${cov(id)}")
  }

  test("q257: leak verdicts match brute-force shared-window sets across the split") {
    val vw = occurrences.filter(_._1 % 10 == 7).groupBy(_._1)
      .map { case (id, os) => id -> os.map(_._3).toSet }
    val trainWins = occurrences.filter(_._1 % 10 != 7)
    val winToTrainDocs = trainWins.groupBy(_._3).map { case (w, os) => w -> os.map(_._1).toSet }

    val rows = run("q257_split_leakage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // one row per val doc (empty docs excluded; the fixture has none)
    val valDocs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 10 == 7).sorted
    assert(rows.map(_._1).toSeq == valDocs.toSeq, "output is not exactly the val split")

    for ((id, _, nWin, nLeak, nPart, leaked) <- rows) {
      val wins = vw.getOrElse(id, Set.empty)
      val leakWins = wins.filter(winToTrainDocs.contains)
      val partners = leakWins.flatMap(winToTrainDocs)
      assert(nWin == wins.size.toLong, s"doc $id: n_windows $nWin != ${wins.size}")
      assert(nLeak == leakWins.size.toLong, s"doc $id: n_leaked $nLeak != ${leakWins.size}")
      assert(nPart == partners.size.toLong, s"doc $id: partners $nPart != ${partners.size}")
      assert(leaked == (if (leakWins.nonEmpty) 1L else 0L), s"doc $id: verdict flipped")
      assert(nLeak <= nWin)
    }
    assert(rows.exists(_._6 == 1L), "no leaked val doc — degenerate fixture")
    assert(rows.exists(_._6 == 0L), "every val doc leaked — degenerate fixture")
  }

  test("q260: the repair drops exactly q257's leaked docs; train side untouched") {
    val audit = run("q257_split_leakage").collect()
      .map(r => (r.getLong(0), r.getLong(5))) // (doc_id, leaked)
    val repair = run("q260_split_repair").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))

    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2)).length.toLong))
      .filter(_._3 > 0)
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val leakedByLang = audit.filter(_._2 == 1L).groupBy(d => langOf(d._1))
      .map { case (l, ds) => l -> ds.length.toLong }

    for ((lang, trD, trT, vb, vd, vt, drop) <- repair) {
      val train = docs.filter(d => d._2 == lang && d._1 % 10 != 7)
      val valAll = docs.filter(d => d._2 == lang && d._1 % 10 == 7)
      assert((trD, trT) == (train.length.toLong, train.map(_._3).sum),
        s"$lang: train side perturbed by the repair")
      assert(vb == valAll.length.toLong, s"$lang: val-before count wrong")
      assert(drop == leakedByLang.getOrElse(lang, 0L),
        s"$lang: dropped $drop != audited leaks ${leakedByLang.getOrElse(lang, 0L)}")
      assert(vd == vb - drop, s"$lang: val-after != before - dropped")
      val leakedIds = audit.filter(_._2 == 1L).map(_._1).toSet
      assert(vt == valAll.filter(d => !leakedIds(d._1)).map(_._3).sum,
        s"$lang: surviving val token count wrong")
    }
    assert(repair.map(_._7).sum > 0, "repair dropped nothing — degenerate fixture")
  }
}

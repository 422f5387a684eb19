package graft.text

import graft.GraftSuite

/** q267 — decontamination by excision, pinned against a brute-force
  * string replay (fabricate → window → mark-vs-benchmark → union →
  * islands) plus the fabrication's ground-truth invariants: every
  * planted doc loses AT LEAST its 16-token span (>= because natural
  * overlap can add more), unplanted docs without natural overlap lose
  * nothing (the gate is selective, not a shredder), and the ledger
  * balances (n_kept = n_tok − n_removed, islands >= 1 wherever tokens
  * were removed).
  */
class DecontamScrubSpec extends GraftSuite {

  private def tok(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq

  test("q267: brute-force replay; planted spans always excised; gate selective") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tok(r.getString(1))))

    // fabrication replay
    val span = docs.filter { case (id, ws) => id % 97 == 0 && ws.size >= 16 }
      .minBy(_._1)._2.take(16)
    val fab = docs.map { case (id, ws) =>
      id -> (if (id % 7 == 3 && id % 97 != 0) ws ++ span else ws)
    }.toMap
    def windows(ws: Seq[String]): Seq[(Int, String)] =
      if (ws.size < 16) Seq.empty
      else (0 to ws.size - 16).map(i => i -> ws.slice(i, i + 16).mkString(" "))

    val bench = fab.collect { case (id, ws) if id % 97 == 0 => windows(ws).map(_._2) }
      .flatten.toSet
    val expect = fab.collect { case (id, ws) if id % 97 != 0 && ws.nonEmpty =>
      val marked = windows(ws).collect { case (st, w) if bench(w) =>
        st until st + 16 }.flatten.toSet
      val spans =
        if (marked.isEmpty) 0L
        else marked.toSeq.sorted.foldLeft((0L, -2)) { case ((n, prev), p) =>
          (if (p == prev + 1) n else n + 1, p)
        }._1
      id -> ((ws.size.toLong, marked.size.toLong, spans, ws.size.toLong - marked.size))
    }

    val got = graft.SparkEntry.queries("q267_decontam_scrub")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == expect.keySet, "doc spine diverges from the replay")
    for ((id, e) <- expect)
      assert(got(id) == e, s"doc $id: ${got(id)} vs replay $e")

    // ground-truth invariants of the planted schedule
    val planted = got.filter { case (id, _) => id % 7 == 3 }
    assert(planted.nonEmpty, "no planted docs — vacuous fixture")
    for ((id, (nTok, nRm, nSp, nKeep)) <- planted) {
      assert(nRm >= 16 && nSp >= 1, s"planted doc $id not excised: rm=$nRm spans=$nSp")
      assert(nKeep == nTok - nRm, s"ledger imbalance on $id")
    }
    // selectivity: the scrub must not shred clean docs
    val clean = got.filter { case (id, (_, nRm, _, _)) => id % 7 != 3 && nRm == 0 }
    assert(clean.size > got.size / 2,
      s"scrub removed tokens from most unplanted docs (${clean.size} clean of ${got.size})")
  }
}

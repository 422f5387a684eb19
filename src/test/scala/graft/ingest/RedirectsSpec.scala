package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The q234 redirect layer pinned Spark-free: status/Location fabrication
  * round-trips through the WARC+HTTP parsers, obfuscated Locations
  * canonicalize onto corpus URIs, and the hop rule's chain/loop/identity
  * cases land where RFC 9110 semantics say they should. */
class RedirectsSpec extends AnyFunSuite {

  test("status rule: loops shadow chains; chain ids 301; terminals 200") {
    assert(Redirects.targetOf(109) == Some(110))     // loop half
    assert(Redirects.targetOf(110) == Some(109))     // loop half (not 200)
    assert(Redirects.targetOf(13) == Some(12))       // chain
    assert(Redirects.targetOf(12) == Some(11))
    assert(Redirects.targetOf(10) == Some(9))        // 10%100==10 -> loop rule
    assert(Redirects.targetOf(20) == None)           // terminal
    assert(Redirects.targetOf(4) == None)
  }

  test("shard round-trip: statuses, ids, and canonical Locations recovered") {
    val ids = Seq(9L, 10L, 11L, 12L, 13L, 14L, 20L, 21L)
    val parsed = Redirects.parseShard(Redirects.buildShard(1L, ids))
    assert(parsed.map(_._2) == ids)                   // sorted in-shard order
    val byId = parsed.map(p => p._2 -> p).toMap
    // 3xx flags match the rule
    assert(byId(13)._3 && byId(9)._3 && byId(10)._3 && !byId(14)._3 && !byId(20)._3)
    // odd sources wrote UPPERCASE Locations; the parse canonicalizes them
    // onto the exact corpus URI of the target (the resolution join key)
    assert(byId(9)._4 == Some(Redirects.urlOf(10)))   // odd src, obfuscated
    assert(byId(13)._4 == Some(Redirects.urlOf(12)))
    assert(byId(12)._4 == Some(Redirects.urlOf(11)))  // even src, plain
    assert(byId(20)._4 == None)
  }

  test("driver replay of the hop rule: chains resolve in <=3, loops cap at 4") {
    // pure-Scala replay of the oracle recurrence over a 30-id corpus
    val n = 30L
    def resolve(start: Long): (Long, Int, Boolean) = {
      var cur = start; var hops = 0
      for (_ <- 1 to Redirects.MaxHops)
        Redirects.targetOf(cur).filter(t => t >= 0 && t < n).foreach { t =>
          cur = t; hops += 1
        }
      (cur, hops, Redirects.targetOf(cur).isEmpty)
    }
    assert(resolve(13) == (9L, 4, false))   // 13->12->11->10->9: drains into the loop
    assert(resolve(23) == (20L, 3, true))   // clean 3-chain
    assert(resolve(22) == (20L, 2, true))
    assert(resolve(9)  == (9L, 4, false))   // 9<->10 2-cycle, cap honored
    assert(resolve(24) == (24L, 0, true))   // terminal stays put
  }

  test("q240 replay: resolved-key dedup groups aliases; loop starts excluded") {
    // same pure-Scala recurrence, then q218's posture on the resolved key
    val n = 30L
    def resolve(start: Long): (Long, Int, Boolean) = {
      var cur = start; var hops = 0
      for (_ <- 1 to Redirects.MaxHops)
        Redirects.targetOf(cur).filter(t => t >= 0 && t < n).foreach { t =>
          cur = t; hops += 1
        }
      (cur, hops, Redirects.targetOf(cur).isEmpty)
    }
    val rows = (0L until n).map(id => (id, resolve(id)))
    val groups = rows.filter(_._2._3)
      .groupBy(_._2._1)
      .map { case (fin, rs) =>
        fin -> (rs.map(_._1).min, rs.size, rs.count(_._2._2 > 0))
      }
    // the x20 decade is the clean alias cluster: 20 fetched direct,
    // 21/22/23 arrived via 301 chains — one keeper, three chained aliases
    assert(groups(20L) == (20L, 4, 3))
    assert(groups(0L) == (0L, 4, 3))
    // mid-decade terminals are singleton clusters with zero chained
    assert(groups(24L) == (24L, 1, 0))
    // loop members (9, 10) and the chains draining into them (11, 12, 13)
    // never resolve — no resolved key exists for them
    assert(!groups.contains(9L) && !groups.contains(10L))
    assert(Seq(9L, 10L, 11L, 12L, 13L).forall(id => !resolve(id)._3))
    // alias accounting is lossless over the resolved population
    assert(groups.values.map(_._2).sum == rows.count(_._2._3))
  }
}

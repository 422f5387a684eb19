package graft.text

import graft.GraftSuite

/** Cross-entry invariants of the Kneser-Ney decision tier (q249-q251):
  * the tercile split partitions exactly the scored docs with balanced
  * sizes and ordered boundaries, per-language scoring covers exactly the
  * global scorer's bigram stream, and the held-out gap report's doc
  * accounting and arithmetic tie back to the per-doc scorer. These are
  * the relationships the per-entry oracles cannot see (each hash-pins
  * one result in isolation).
  */
class KnLmSpec extends GraftSuite {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q249: terciles partition the scored docs; sizes balanced; boundaries ordered") {
    val rows = run("q249_ccnet_terciles").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("head", "middle", "tail"))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"tercile sizes unbalanced: ${sizes.toSeq}")
    val nScored = run("q244_kn_bigram_nll").count()
    assert(sizes.sum == nScored, s"terciles do not partition the scored docs")
    val byT = rows.map(r => r.getString(0) -> r).toMap
    // hi(head) <= lo(middle) <= hi(middle) <= lo(tail): rank boundaries
    // respect the mean ordering (ties may make them EQUAL, never inverted)
    assert(byT("head").getLong(3) <= byT("middle").getLong(2))
    assert(byT("middle").getLong(3) <= byT("tail").getLong(2))
  }

  test("q250: per-language scoring covers exactly the global scorer's stream") {
    val perLang = run("q250_kn_perlang").collect()
    val global = run("q244_kn_bigram_nll").collect()
    assert(perLang.length == global.length, "doc sets differ")
    assert(perLang.map(_.getLong(2)).sum == global.map(_.getLong(1)).sum,
      "bigram totals differ — the lang attach changed the scored stream")
    // conditioning must actually move the measure somewhere (a per-lang
    // model identical to the global one would mean the lang column never
    // reached the count aggs)
    assert(perLang.map(_.getLong(3)).sum != global.map(_.getLong(2)).sum,
      "per-lang NLL identical to global — conditioning had no effect")
  }

  test("q251: host accounting partitions the corpus; gap arithmetic holds") {
    val rows = run("q251_heldout_gap_by_host").collect()
    assert(rows.length == 5, s"expected 5 fixture hosts, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(7) == r.getLong(6) - r.getLong(5),
        s"gap != held - train on ${r.getString(0)}")
    }
    val nDocs = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(nDocs == run("q244_kn_bigram_nll").count(),
      "host doc accounting does not partition the scored docs")
  }

  // Round-21 optimization pin: knModelTables derives cw1/cw2/tt from the
  // persisted (w1,w2) count table instead of re-aggregating the bigram
  // stream three times. The derivation identities (c1 = SUM(cab),
  // n1p/np2/t = COUNT(*) over cb rows) must be EXACT — the oracles keep
  // the direct COUNT(DISTINCT ...) spelling, so any drift here is a
  // silent wrong answer in every KN entry.
  test("kn model tables: cb-derived cw1/cw2/tt equal the direct aggregation spellings") {
    import org.apache.spark.sql.functions._
    val bg = Text.bigramPairs(spark, sf)
    val (cb, cw1, cw2, tt) = Text.knModelTables(bg)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.mkString(",")).toSet
    val dw1 = bg.groupBy(col("w1"))
      .agg(count(lit(1)).as("c1"), countDistinct(col("w2")).as("n1p"))
    val dw2 = bg.groupBy(col("w2")).agg(countDistinct(col("w1")).as("np2"))
    assert(rows(cw1) == rows(dw1), "cw1 derivation drifted from COUNT/COUNT-DISTINCT")
    assert(rows(cw2) == rows(dw2), "cw2 derivation drifted from COUNT DISTINCT")
    assert(tt.collect().head.getLong(0) ==
      bg.select(col("w1"), col("w2")).distinct().count(),
      "tt derivation drifted from the distinct-pair count")
    cb.unpersist()
    ()
  }
}

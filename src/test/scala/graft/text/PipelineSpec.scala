package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** The clustering loop must be CONVERGENCE-driven, not iteration-capped:
  * a path graph needs diameter rounds of min-label propagation, far past
  * what near-dup cliques need (and past the SQL twin's unrolled depth,
  * which is only contracted for the fixture's shallow components). */
class PipelineSpec extends GraftSuite {

  test("clusterPairs converges on a 12-node path (diameter 11)") {
    import spark.implicits._
    val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Pipeline.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 12)
    assert(got.values.toSet === Set(1L), s"all nodes must reach label 1: $got")
  }

  test("q92 packing invariant: a bin overflows 2048 only by its boundary-spanning doc") {
    val bins = graft.SparkEntry.queries("q92_pack_sequences")(spark, sf).collect()
    val maxTok = graft.text.TokenIndex.toks(spark, sf)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.size(col("ws")))).collect()(0).getInt(0)
    bins.foreach { r =>
      val n = r.getLong(3)
      assert(n < 2048 + maxTok,
        s"bin (${r.getInt(0)}, ${r.getInt(1)}) holds $n tokens (> 2048 + $maxTok)")
    }
    spark.catalog.clearCache()
  }

  test("clusterPairs keeps disjoint components apart") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Pipeline.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
                       20L -> 20L, 21L -> 20L))
  }

  // q156's declared query pins only shard heads; the PROPERTIES of the
  // shuffle — it is a permutation (every doc exactly once), dense ranks
  // per shard, replayable from the seed, and a different seed actually
  // re-orders — are what a training job depends on.
  test("q156 epoch order is a seeded permutation: total, dense, replayable") {
    def epoch(seed: String) =
      Pipeline.epochOrder(graft.core.Tables(spark, sf, "documents"), seed, 8)
        .select(col("shard"), col("rk"), col("doc_id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nDocs = graft.core.Tables(spark, sf, "documents").count()
    val e1 = epoch("epoch1")
    // permutation: every doc exactly once
    assert(e1.map(_._3).distinct.length.toLong == nDocs && e1.length.toLong == nDocs)
    // dense ranks within each shard
    e1.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"shard $shard ranks not dense")
    }
    // replayable: the same seed is bit-identical
    assert(epoch("epoch1").sortBy(r => (r._1, r._2)).toSeq ==
           e1.sortBy(r => (r._1, r._2)).toSeq)
    // a new epoch seed actually re-orders (some doc changes position)
    val e2 = epoch("epoch2").sortBy(r => (r._1, r._2))
    assert(e2.map(_._3).toSeq != e1.sortBy(r => (r._1, r._2)).map(_._3).toSeq)
  }

  // q161/q162's merge fold is the semantic core of BPE: greedy LEFTMOST,
  // NON-overlapping, matching whole symbols only. Each property has a
  // known failure mode (overlap double-merges 'aaa'; a suffix-substring
  // match merges 'xa b' under rule (a, b)).
  test("bpeFold: greedy leftmost, non-overlapping, whole-symbol match") {
    import spark.implicits._
    def fold(in: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(in)).toDF("s")
        .select(expr(Pipeline.bpeFold("s", a, b, 0)).as("r"))
        .collect()(0).getSeq[String](0)
    assert(fold(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(fold(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(fold(Seq("xa", "b"), "a", "b") == Seq("xa", "b"))
    assert(fold(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    assert(fold(Seq("ab", "c"), "ab", "c") == Seq("abc"))
    assert(fold(Seq.empty[String], "a", "b") == Seq.empty[String])
  }

  // q162's per-doc counts must be bounded by construction: every word is
  // at least 1 token (merges only shrink), and at most its character
  // count (the unmerged segmentation).
  test("q162 BPE token counts sit between word count and character count") {
    val got = graft.SparkEntry.queries("q162_bpe_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chars = graft.text.TokenIndex.words(spark, sf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === chars.keySet)
    got.foreach { case (id, (nw, nb)) =>
      val (nw2, nc) = chars(id)
      assert(nw == nw2, s"doc $id word count $nw != $nw2")
      assert(nb >= nw && nb <= nc, s"doc $id: n_bpe $nb outside [$nw, $nc]")
    }
    spark.catalog.clearCache()
  }

  // q163's redaction must catch ADJACENT blocklist words — the case that
  // rules out space-delimiter patterns (whose match consumes the
  // separator the next match needs) in favor of \b anchors.
  test("q163 redaction pattern handles adjacent blocklist hits") {
    import spark.implicits._
    val out = Seq("slow merge x", "merge slow", "slowly merged")
      .toDF("text")
      .select(regexp_replace(col("text"), lit("\\b(slow|merge|spark)\\b"),
                             lit("[#]")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("[#] [#] x", "[#] [#]", "slowly merged"))
  }
}

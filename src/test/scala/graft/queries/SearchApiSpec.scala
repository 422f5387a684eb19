package graft.queries

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Independent semantic pins for the round-7 search-API / mixing entries.
  * Each declared query already hash-matches its DuckDB oracle, but where
  * oracle and plan share derivation text a common bug could pass both
  * (the MovingModelsSpec rationale) — so these recompute the CONTRACT
  * from raw fixture data with plain Scala folds, not SQL.
  */
class SearchApiSpec extends GraftSuite {

  test("q173 rank_eval metrics match an imperative fold over raw postings") {
    // independent candidate derivation: tokenize raw text in Scala
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = graft.SparkEntry.queries("q173_rank_eval")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (term <- Seq("data", "stream", "spark")) {
      val ranked = docs.flatMap { case (id, lang, text) =>
        val tf = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split(" ").count(_ == term)
        if (tf > 0) Some((id, lang == "en", tf)) else None
      }.sortBy { case (id, _, tf) => (-tf, id) }
      val (p5, rr, dcg) = got(term)
      val top5 = ranked.take(5)
      assert(math.abs(p5 - top5.count(_._2) / 5.0) < 1e-6, s"$term p@5")
      val firstRel = ranked.indexWhere(_._2) + 1
      assert(math.abs(rr - 1.0 / firstRel) < 1e-6, s"$term rr")
      val wantDcg = top5.zipWithIndex.collect {
        case ((_, true, _), i) => 1.0 / (math.log(i + 2) / math.log(2))
      }.sum
      assert(math.abs(dcg - wantDcg) < 1e-5, s"$term dcg")
    }
  }

  test("q174 explain decomposition multiplies back to q64's scorer") {
    val rows = graft.SparkEntry.queries("q174_explain")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (idf, tfNorm, weight) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.abs(weight - idf * tfNorm) < 2e-6, s"${r.getString(0)} weight")
      assert(idf > 0 && tfNorm > 0 && tfNorm < 2.2) // k1+1 bound
    }
  }

  test("q175 sibling stats are the fold over ALL buckets, selector keeps above-average only") {
    val all = graft.core.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(round(avg(col("value")), 6).as("a")).collect().map(_.getDouble(1))
    val got = graft.SparkEntry.queries("q175_sibling_buckets")(spark, sf).collect()
    val avgB = BigDecimal(all.sum / all.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == all.count(_ > avgB), "selector count")
    got.foreach { r =>
      assert(r.getDouble(2) > r.getDouble(5), "surviving bucket beats avg_bucket")
      assert(math.abs(r.getDouble(3) - all.min) < 1e-6, "min_bucket")
      assert(math.abs(r.getDouble(4) - all.max) < 1e-6, "max_bucket")
      assert(r.getLong(7) == all.length, "n_buckets")
    }
  }

  test("q179 mixture weights normalize; allocations re-derive from weights") {
    val rows = graft.SparkEntry.queries("q179_mix_weights")(spark, sf).collect()
    val wSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    rows.foreach { r =>
      assert(math.abs(r.getLong(4) - r.getDouble(3) * 1e6) < 1e6 * 1e-3, "alloc ~ weight*budget")
      assert(math.abs(r.getDouble(5) - r.getLong(4).toDouble / r.getLong(1)) < 1e-2, "epochs")
    }
    // temperature flattening: weight/share is strictly decreasing in
    // share (∝ share^(alpha-1), alpha < 1) — the threshold-free form of
    // "tail boosted, head flattened" (the share-vs-weight crossover sits
    // at (Σ√share)^-2, NOT at 1/n, so per-row threshold checks are
    // fixture-fragile)
    val byShare = rows.sortBy(_.getDouble(2)).toSeq
    byShare.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.getDouble(3) / lo.getDouble(2) >= hi.getDouble(3) / hi.getDouble(2) - 1e-9,
        "weight/share must not increase with share")
    }
  }

  test("q180 matrix pair totals equal q61's pair report") {
    val pairs = graft.SparkEntry.queries("q61_neardup_jaccard")(spark, sf).count()
    val matrix = graft.SparkEntry.queries("q180_dup_source_matrix")(spark, sf)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(matrix == pairs, s"matrix $matrix != pairs $pairs")
  }

  test("wildcardToLike escapes literal SQL wildcards and honors ES escapes") {
    assert(Search.wildcardToLike("*s?ow*") == "%s_ow%")
    assert(Search.wildcardToLike("50%_off*") == "50\\%\\_off%")
    assert(Search.wildcardToLike("2\\*3") == "2*3")     // \* = literal asterisk
    assert(Search.wildcardToLike("a\\?b?") == "a?b_")   // \? literal, bare ? wildcard
    assert(Search.wildcardToLike("a\\\\b") == "a\\\\b") // \\ = one literal backslash
    assert(Search.wildcardToLike("a\\") == "a\\\\")     // dangling escape: literal
  }

  test("q168 slices partition the table") {
    val n = graft.core.Tables(spark, sf, "lineitem").count()
    val rows = graft.SparkEntry.queries("q168_sliced_scan")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == n, "slice counts cover the table")
    assert(rows.map(_.getInt(0)).toSet.size == rows.length, "slices disjoint")
  }
}

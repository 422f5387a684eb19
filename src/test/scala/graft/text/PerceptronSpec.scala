package graft.text

import org.apache.spark.unsafe.types.UTF8String

import graft.GraftSuite

/** q264/q265 — the averaged hashed-feature perceptron, pinned three ways:
  * an exact integer replay of all 16 training steps (features, labels,
  * shard schedule, worst-violator selection, weight/average trajectories),
  * above-majority separation with real mass in all four confusion cells
  * (the q225 degenerate-gate lesson: an all-positive classifier would
  * pass a hash check and gate nothing), and a REAL disagreement set with
  * the q234 bucket-posterior model — the two classifiers see different
  * feature spaces (hashed lexical profile vs quantized signals), so a
  * perceptron that merely re-spelled the NB decision would mean the
  * hashed features carry no information of their own.
  */
class PerceptronSpec extends GraftSuite {

  private val F = Perceptron.NumBuckets
  private val stop = Set("the", "a", "of", "and", "to", "is", "in")

  private def tok(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq

  private def th(w: String): Long =
    graft.functions.TokenHash.hash(UTF8String.fromString(w))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q264/q265: exact 16-step replay; beats majority; disagrees with q234's NB") {
    val docs = graft.core.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tok(r.getString(1))))

    // ---- driver replay of the training chain ----
    val feat = scala.collection.mutable.Map.empty[Long, Map[Int, Long]]
    val lab = scala.collection.mutable.Map.empty[Long, (Long, Int)]
    for ((id, ws) <- docs if ws.nonEmpty) {
      val n = ws.size.toLong
      val nStop = ws.count(stop).toLong
      val y = if (n >= 25 && 1000 * nStop >= 30 * n) 1L else -1L
      val shard = (java.lang.Integer.parseInt(
        md5hex(s"${Perceptron.Seed}:$id").take(4), 16) % Perceptron.Shards)
      val cnt = ws.groupMapReduce(w => (th(w) % F).toInt)(_ => 1L)(_ + _)
      feat(id) = cnt.map { case (f, c) => f -> 1000 * c / n } ++
        Map(F -> n, (F + 1) -> 1L)
      lab(id) = (y, shard)
    }
    val w = Array.fill(Perceptron.NumFeatures)(0L)
    val wsum = Array.fill(Perceptron.NumFeatures)(0L)
    for (k <- 0 until Perceptron.Steps) {
      val sh = k % Perceptron.Shards
      val viol = lab.toSeq.collect { case (id, (y, s)) if s == sh =>
        val score = feat(id).map { case (f, x) => w(f) * x }.sum
        (y * score, id, y)
      }.filter(_._1 <= 0).sortBy(v => (v._1, v._2)).take(Perceptron.TopViolators)
      for ((_, id, y) <- viol; (f, x) <- feat(id)) w(f) += y * x
      for (i <- w.indices) wsum(i) += w(i)
    }

    val got = graft.SparkEntry.queries("q264_perceptron_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (0 until Perceptron.NumFeatures).map(f => (f, w(f), wsum(f))),
      "trained weights diverge from the step-by-step replay")

    // ---- separation quality of the averaged classifier ----
    val preds = lab.map { case (id, (y, _)) =>
      val m = feat(id).map { case (f, x) => wsum(f) * x }.sum
      id -> (y, if (m > 0) 1L else -1L)
    }
    val conf = preds.values.groupMapReduce(identity)(_ => 1L)(_ + _)
    val tot = conf.values.sum
    val ok = conf.getOrElse((1L, 1L), 0L) + conf.getOrElse((-1L, -1L), 0L)
    val pos = preds.values.count(_._1 == 1L).toLong
    val majority = math.max(pos, tot - pos)
    assert(ok > majority,
      s"classifier does not beat the majority baseline: $ok vs $majority of $tot ($conf)")
    assert(conf.keySet == Set((1L, 1L), (1L, -1L), (-1L, 1L), (-1L, -1L)),
      s"degenerate confusion matrix (an empty cell means a vacuous gate): $conf")

    // q265's published confusion must be this exact matrix
    val applied = graft.SparkEntry.queries("q265_perceptron_apply")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(applied == conf.map { case ((y, p), n) =>
      ((if (y == 1L) 1 else 0, if (p == 1L) 1 else 0)) -> n },
      "q265 confusion diverges from the replay")

    // ---- real disagreement with the q234 bucket-posterior model ----
    val nbPred = {
      import org.apache.spark.sql.functions._
      // the q234 posture: train the posteriors, fold back as literals
      val post = QualityModel.bucketFrame(graft.core.Tables(spark, sf, "documents"))
      post.persist()
      val posteriors = QualityModel.trainPosteriors(post, "label")
      val rows = post.select(col("doc_id"), QualityModel.scoreCol(posteriors).as("score"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1) >= 2500000L)).toMap
      post.unpersist()
      rows
    }
    val disagree = preds.collect {
      case (id, (_, p)) if nbPred.contains(id) && (p == 1L) != nbPred(id) => id
    }
    val agree = preds.count { case (id, (_, p)) =>
      nbPred.contains(id) && (p == 1L) == nbPred(id) }
    assert(disagree.nonEmpty,
      "perceptron never disagrees with the NB model — it adds no decision surface")
    assert(agree > disagree.size,
      s"models mostly disagree (${disagree.size} vs $agree) — one of them is noise")
  }

  // q273 — the operating-point sweep (VERDICT r16 #6): the funnel's
  // stage-8 margin must be a MEASURED point, not a hand pick. Pinned at
  // both fixture scales: exactly one chosen row, and it is the stage-8
  // constant; the thr=0 row is q265's confusion matrix restated; kept
  // mass (tp+fp) is monotone non-increasing in the threshold.
  test("q273: chosen operating point == the stage-8 constant at both scales") {
    for (dir <- Seq(sf, sf01)) {
      val rows = graft.SparkEntry.queries("q273_perceptron_sweep")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(7)))
      assert(rows.map(_._1).toSeq == Perceptron.SweepGrid, s"grid drifted: ${rows.toSeq}")
      val chosen = rows.filter(_._6 == 1L)
      assert(chosen.length == 1, s"[$dir] expected one chosen row: ${rows.toSeq}")
      assert(chosen.head._1 == Perceptron.FunnelGateMargin,
        s"[$dir] chosen threshold ${chosen.head._1} != stage-8 constant " +
          s"${Perceptron.FunnelGateMargin} — re-measure the operating point")
      val kept = rows.map(r => r._2 + r._3)
      assert(kept.zip(kept.tail).forall { case (a, b) => a >= b },
        s"[$dir] kept mass not monotone in the threshold: ${kept.toSeq}")
      // total mass is constant across thresholds (every doc lands in a cell)
      val totals = rows.map(r => r._2 + r._3 + r._4 + r._5).distinct
      assert(totals.length == 1, s"[$dir] cell totals drift: ${rows.toSeq}")
    }
    spark.catalog.clearCache()
  }

  // q278 — the per-language conditioning of the sweep: per-lang cells
  // must SUM to q273's global cells threshold-for-threshold (same model,
  // same docs — the partition is a reclassification, not a re-score), at
  // most one chosen row per language, and every chosen row is that
  // language's own largest recall-clearing threshold.
  test("q278: per-lang sweep partitions q273's cells; chosen rows obey the rule per lang") {
    val global = graft.SparkEntry.queries("q273_perceptron_sweep")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = graft.SparkEntry.queries("q278_perceptron_sweep_by_lang")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7), r.getLong(8)))
    // cells partition the global sweep
    for ((thr, byThr) <- rows.groupBy(_._2)) {
      val sums = (byThr.map(_._3).sum, byThr.map(_._4).sum,
        byThr.map(_._5).sum, byThr.map(_._6).sum)
      assert(sums == global(thr),
        s"thr=$thr: per-lang cells ${sums} != global ${global(thr)}")
    }
    // chosen discipline per language
    val byLang = rows.groupBy(_._1)
    assert(byLang.size >= 2, "fixture has one language — conditioning untested")
    for ((lang, ms) <- byLang) {
      val chosen = ms.filter(_._8 == 1L)
      assert(chosen.length <= 1, s"[$lang] multiple chosen rows")
      val clearing = ms.filter(_._7 >= Perceptron.SweepRecallFloor).map(_._2)
      if (clearing.nonEmpty) {
        assert(chosen.length == 1 && chosen.head._2 == clearing.max,
          s"[$lang] chosen ${chosen.map(_._2).toSeq} != largest clearing ${clearing.max}")
      } else assert(chosen.isEmpty, s"[$lang] chosen row without a clearing threshold")
    }
    assert(rows.exists(_._8 == 1L), "no language has a chosen row — vacuous")
    spark.catalog.clearCache()
  }
}

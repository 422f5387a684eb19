package graft.multimodal

import graft.GraftSuite
import graft.multimodal.Video.Avi

/** q291 (video perceptual dedup — q209 ∘ q202), bench-only, so this
  * spec IS its correctness bound: every clip fingerprint is recomputed
  * ARITHMETICALLY from the generative channel formulas (no codec, no
  * decode — the independent-formulation discipline the q202/q209
  * oracles use), and the duplicate grouping is pinned against the
  * clipKey structure the fixture plants.
  */
class VideoDHashSpec extends GraftSuite {

  /** Expected fingerprint of the clip payload keyed by `p`, straight
    * from the [[Avi.r]]/[[Avi.g]]/[[Avi.b]] formulas: dims/frame count
    * from the generative laws, the q202 sampling rule, the 9x8
    * luminance resample and threshold-bit fold per sampled frame —
    * written against the FORMULAS, never the encoder or decoder. */
  private def expectedFp(p: Long): Seq[Long] = {
    val w = Avi.width(p); val h = Avi.height(p); val nf = Avi.nFrames(p)
    Avi.sampledFrames(nf).flatMap { f =>
      def lum(x: Int, y: Int): Int =
        Avi.r(p, f, x, y) + Avi.g(p, f, x, y) + Avi.b(p, f, x, y)
      val l = Array.tabulate(8, 9)((y, x) => lum(x * w / 9, y * h / 8))
      var hi = 0L; var lo = 0L
      for (y <- 0 until 8; x <- 0 until 8) if (l(y)(x + 1) > l(y)(x)) {
        if (y < 4) lo |= 1L << (y * 8 + x)
        else hi |= 1L << ((y - 4) * 8 + x)
      }
      Seq(hi, lo)
    }
  }

  test("q291: fingerprints match the formula recompute; buckets match the planted groups") {
    // the declared fp is the injective comma-joined decimal encoding of
    // the ordered frame-hash vector (driver-readable scalar); parse it
    // back so every vector-level assertion below still runs on Seq[Long]
    def parseFp(s: String): Seq[Long] =
      if (s.isEmpty) Seq.empty else s.split(',').toSeq.map(_.toLong)
    val rows = graft.SparkEntry.queries("q291_video_dhash_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), parseFp(r.getString(1)), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty, "no video docs in the fixture — vacuous")

    val videoIds = rows.map(_._1)

    // Bucket law: sizes follow the INDEPENDENTLY-recomputed fingerprint
    // groups (not the planted key groups — see the separation arm below:
    // degenerate 1-pixel-wide clips legitimately share the all-zero
    // hash, exactly as the entry's grouping reports).
    val fpGroupSize = videoIds.groupBy(id => expectedFp(Video.clipKey(id)))
      .map { case (k, ids) => k -> ids.length }

    rows.foreach { case (id, fp, nFrames, bucketN) =>
      val p = Video.clipKey(id)
      assert(nFrames === Avi.nFrames(p), s"doc $id: frame count")
      assert(fp.length === 2 * Avi.sampledFrames(Avi.nFrames(p)).length,
        s"doc $id: fingerprint arity (2 longs per sampled frame)")
      assert(fp === expectedFp(p), s"doc $id: fingerprint != formula recompute")
      assert(bucketN === fpGroupSize(expectedFp(p)).toLong,
        s"doc $id: bucket size != independent fingerprint-group size")
    }

    // the fixture genuinely contains duplicate clips for the op to find
    assert(rows.exists(_._4 > 1), "no planted duplicate group — vacuous dedup")
    // planted duplicates always stay together...
    val fpsByKey = rows.groupBy(r => Video.clipKey(r._1)).view.mapValues(_.map(_._2).distinct)
    fpsByKey.foreach { case (k, fps) =>
      assert(fps.length === 1, s"clip group $k: duplicates disagree on fingerprint")
    }
    // ...and NON-DEGENERATE distinct clips never collapse. Clips one
    // pixel wide are the documented exception: the 9-wide resample of a
    // 1-wide frame is constant per row, so every threshold bit is 0 and
    // such clips share the all-zero hash (with equal sample counts) —
    // an inherent dHash property, identical for the q209 image tier.
    val nonDegenerate = fpsByKey.collect {
      case (k, fps) if Avi.width(k) >= 2 => (k, fps.head)
    }.toSeq
    assert(nonDegenerate.nonEmpty, "no non-degenerate clips — vacuous separation arm")
    assert(nonDegenerate.map(_._2).distinct.length === nonDegenerate.length,
      "distinct non-degenerate clips collapsed — perceptual separation lost")
    spark.catalog.clearCache()
  }
}

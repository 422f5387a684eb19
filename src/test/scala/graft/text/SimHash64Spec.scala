package graft.text

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** q284's bound (the entry is bench-only — the 64-bit mixed-hash
  * fingerprint has no reasonable DuckDB replay): the Manku 4x16-block
  * probe plan must be RADIUS-EXACT against brute force at hamming <= 3,
  * the mixer must keep every block a real partition key (no constant-key
  * block — the collapse the avalanche mix exists to prevent: the raw
  * modular token hash is < 2^30, so unmixed votes would zero bits 30-63
  * and make blocks 2-3 all-pairs joins), and the keeper/count law must
  * match the q231 shape. VERDICT r18 #4: this executes the
  * width-independence claim SURVEY Q231 documents, instead of arguing it. */
class SimHash64Spec extends GraftSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("q284: block-probe survivors == brute-force hamming<=3 pairs; keeper law holds") {
    import spark.implicits._
    val fps = Text.simhash64Of(spark, sf01)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fps.nonEmpty)
    // brute-force truth: all pairs within radius 3 (sf0.01 is small
    // enough for the O(n^2) reference)
    val truth: Map[Long, Seq[Long]] = (for {
      (da, sa) <- fps; (db, sb) <- fps
      if da != db && hamming(sa, sb) <= 3
    } yield (da, db)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = graft.SparkEntry.queries("q284_simhash64_neardup")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === fps.map(_._1))   // one row per doc, ordered
    got.foreach { case (doc, keeper, nNear) =>
      val nb = truth.getOrElse(doc, Seq.empty)
      assert(nNear === nb.distinct.size.toLong,
        s"doc $doc: n_near $nNear != brute-force ${nb.distinct.size}")
      assert(keeper === (nb :+ doc).min,
        s"doc $doc: keeper $keeper != ${(nb :+ doc).min}")
    }
  }

  test("q284: the mixer spreads all four blocks — no constant-key block, high bits live") {
    import spark.implicits._
    val fps = Text.simhash64Of(spark, sf01).as[(Long, Long)].collect().toSeq
    val n = fps.size
    // high 32 bits must carry signal (the unmixed base hash would leave
    // them permanently zero)
    assert(fps.count { case (_, sh) => (sh >>> 32) != 0L } > n / 2)
    for (blk <- 0 until 4) {
      val keys = fps.map { case (_, sh) => (sh >>> (16 * blk)) & 0xFFFFL }
      val occ = keys.groupBy(identity).view.mapValues(_.size).toMap
      // a constant-key block would put ~all docs in one bucket and turn
      // its probe join quadratic; true near-dup clusters are far smaller
      assert(occ.values.max <= math.max(8, n / 10),
        s"block $blk: top bucket ${occ.values.max} of $n docs — key collapsed")
      assert(occ.size > n / 4, s"block $blk: only ${occ.size} distinct keys for $n docs")
    }
  }

  test("q284: radius is exact at the boundary — hamming 3 joins, hamming 4 never") {
    // fabricated fingerprints: the block-split LAW (not the corpus): any
    // 3 flipped bits leave >= 1 of 4 blocks intact; 4 flips spread one
    // per block can evade every probe — the verify filter is what bounds
    // the radius, and 4-flip pairs must be absent from the survivor set
    val base = 0x5a5a_c3c3_0f0f_9696L
    val h3 = base ^ (1L << 2) ^ (1L << 21) ^ (1L << 63)   // 3 flips, 3 blocks
    val h4 = base ^ (1L << 2) ^ (1L << 21) ^ (1L << 40) ^ (1L << 63) // 1 per block
    assert(hamming(base, h3) == 3 && hamming(base, h4) == 4)
    def blocksShared(a: Long, b: Long): Int =
      (0 until 4).count(blk => ((a >>> (16 * blk)) & 0xFFFFL) == ((b >>> (16 * blk)) & 0xFFFFL))
    assert(blocksShared(base, h3) >= 1)   // candidate via the intact block
    assert(blocksShared(base, h4) == 0)   // evades every probe — correctly out of radius
  }
}

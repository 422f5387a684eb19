package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AspectBuckets

/** The aspect-bucket assignment (q210) pinned Spark-free against an
  * independent EXACT-RATIONAL reference (BigInt cross-multiplication —
  * decimal arithmetic would itself be lossy on ratios like 7/6), plus
  * the tie rule and hand-checked anchors. */
class AspectBucketSpec extends AnyFunSuite {

  /** |w/h - bn/bd| as an exact fraction (num, den), den > 0. */
  private def err(w: Int, h: Int, bn: Int, bd: Int): (BigInt, BigInt) =
    (BigInt((w.toLong * bd - bn.toLong * h).abs), BigInt(h.toLong * bd))

  private def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)): Boolean =
    a._1 * b._2 < b._1 * a._2

  test("assignment equals the exact rational argmin over every fixture dim class") {
    for (w <- 1 to 16; h <- 1 to 11) {
      // first bucket not strictly beaten by any other = first minimal
      val want = AspectBuckets.buckets.foldLeft(Option.empty[(String, (BigInt, BigInt))]) {
        case (best, (label, bn, bd)) =>
          val e = err(w, h, bn, bd)
          best match {
            case Some((_, be)) if !lt(e, be) => best
            case _                           => Some((label, e))
          }
      }.get._1
      assert(AspectBuckets.assign(w, h) == want, s"($w x $h)")
    }
  }

  test("anchors and ties") {
    assert(AspectBuckets.assign(1, 1) == "1:1")
    assert(AspectBuckets.assign(8, 6) == "4:3")
    assert(AspectBuckets.assign(6, 8) == "3:4")
    assert(AspectBuckets.assign(16, 9) == "16:9")
    assert(AspectBuckets.assign(9, 16) == "9:16")
    // extreme panoramas snap to the widest bucket
    assert(AspectBuckets.assign(13, 1) == "16:9")
    assert(AspectBuckets.assign(1, 9) == "9:16")
    // 7x6 = 1.1667: |7/6 - 1| == |7/6 - 4/3| EXACT tie -> '1:1' (list order)
    assert(AspectBuckets.scaledErr(7, 6, 1, 1) == AspectBuckets.scaledErr(7, 6, 4, 3))
    assert(AspectBuckets.assign(7, 6) == "1:1")
  }

  test("scaledErr orders pairs exactly like the rational distances") {
    for (w <- 1 to 13; h <- 1 to 9;
         a <- AspectBuckets.buckets; b <- AspectBuckets.buckets) {
      val (sa, sb) = (AspectBuckets.scaledErr(w, h, a._2, a._3),
                      AspectBuckets.scaledErr(w, h, b._2, b._3))
      val (ra, rb) = (err(w, h, a._2, a._3), err(w, h, b._2, b._3))
      assert((sa < sb) == lt(ra, rb) && (sa == sb) == (!lt(ra, rb) && !lt(rb, ra)),
        s"($w,$h) ${a._1} vs ${b._1}")
    }
  }
}

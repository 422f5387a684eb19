package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.Bmp
import graft.multimodal.PerceptualHash

/** The dHash layer (q209) pinned Spark-free: determinism, the duplicate
  * property (identical pixels => identical hash regardless of the doc
  * that carries them), the PERCEPTUAL property the oracle can't see
  * (small pixel perturbations move few bits; distinct images differ),
  * and agreement with a direct bit-by-bit reference. */
class DHashSpec extends AnyFunSuite {

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("hash matches a direct bit-by-bit reference on every image class") {
    (1L to 120L).foreach { id =>
      val img = Bmp.decode(Bmp.encode(id))
      val (hi, lo) = PerceptualHash.dhash(img)
      var wantHi = 0L; var wantLo = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        def l(xx: Int) = {
          val (r, g, b) = img.rgb(xx * img.w / 9, y * img.h / 8); r + g + b
        }
        if (l(x + 1) > l(x)) {
          if (y < 4) wantLo |= 1L << (y * 8 + x) else wantHi |= 1L << ((y - 4) * 8 + x)
        }
      }
      assert((hi, lo) == (wantHi, wantLo), s"id=$id")
      assert(hi == (hi & 0xffffffffL) && lo == (lo & 0xffffffffL), "halves stay 32-bit")
    }
  }

  test("identical pixels hash identically; the corpus group key creates real buckets") {
    // docs 1, 4, 7, 10 share sourceKey 1 — same payload, same hash
    val ids = Seq(1L, 4L, 7L, 10L)
    val hashes = ids.map(id =>
      PerceptualHash.dhash(Bmp.decode(Bmp.encode(PerceptualHash.sourceKey(id)))))
    assert(hashes.distinct.size == 1)
    assert(ids.map(PerceptualHash.sourceKey).distinct == Seq(1L))
    assert(PerceptualHash.sourceKey(13L) == 13L && PerceptualHash.sourceKey(22L) == 13L)
  }

  test("perceptual: a single-pixel nudge moves at most a few bits; distinct images differ") {
    val base = Bmp.encode(25L)
    val h0 = PerceptualHash.dhash(Bmp.decode(base))
    // nudge one pixel's blue channel by +1 (offset 54 = first pixel byte
    // of a width-13 image — no row padding at the start)
    val nudged = base.clone()
    nudged(54) = ((nudged(54) + 1) & 0xff).toByte
    val h1 = PerceptualHash.dhash(Bmp.decode(nudged))
    assert(hamming(h0, h1) <= 4, s"one-pixel nudge moved ${hamming(h0, h1)} bits")

    // distinct generative images are far apart on average
    val pairs = (1L to 40L).map(i =>
      hamming(PerceptualHash.dhash(Bmp.decode(Bmp.encode(i))),
              PerceptualHash.dhash(Bmp.decode(Bmp.encode(i + 1)))))
    assert(pairs.count(_ >= 8) > pairs.size / 2,
      s"distinct images should usually differ by many bits: $pairs")
  }
}

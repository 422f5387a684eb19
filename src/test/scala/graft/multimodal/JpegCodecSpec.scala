package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.Jpeg

/** The JPEG path (q199) pinned Spark-free. The container layer (our
  * from-scratch JFIF segment walk) is exact and checked against both the
  * generative formula and `ImageIO.read`'s view of the same bytes; the
  * pixel layer is LOSSY by format, so it is bounded, not hash-pinned:
  * mean-luminance drift through encode→decode must stay inside a measured
  * envelope far tighter than the entry's `lum_ok` bound. */
class JpegCodecSpec extends AnyFunSuite {

  // The codec layer is corpus-agnostic, so the spec drives ALL ids — the
  // production corpus's id ≡ 1 mod 3 restriction shares a factor with
  // the dimension periods (15, 10) and would reach only a third of the
  // width/height classes (w ∈ {2,5,8,11,14} only). 1..300 covers every
  // 15x10 combination twice.
  private val ids: Seq[Long] = 1L to 300L

  test("segment walk recovers exact dimensions from real JDK-written bytes") {
    ids.foreach { id =>
      val bytes = Jpeg.encode(id)
      assert(Jpeg.headerDims(bytes) == ((Jpeg.width(id), Jpeg.height(id))), s"id=$id")
    }
  }

  test("segment walk agrees with ImageIO's independent parse") {
    ids.take(60).foreach { id =>
      val bytes = Jpeg.encode(id)
      val (w, h) = Jpeg.headerDims(bytes)
      val img = Jpeg.decodePixels(bytes)
      assert(img.getWidth == w && img.getHeight == h, s"id=$id")
    }
  }

  test("lossy round-trip mean-luminance drift stays inside the envelope") {
    // The entry's lum_ok bound is 60; the spec pins half that, so the
    // oracle-asserted TRUE carries real margin. Drift sources: DC
    // quantization + 4:2:0 chroma subsampling on noise-like pixels.
    val errs = ids.map { id =>
      math.abs(Jpeg.meanLum(Jpeg.decodePixels(Jpeg.encode(id))) - Jpeg.formulaMeanLum(id))
    }
    val worst = errs.max
    info(f"mean-lum drift: max $worst%.2f, mean ${errs.sum / errs.size}%.2f " +
      f"(entry bound ${Jpeg.lumTolerance}%.0f)")
    assert(worst <= Jpeg.lumTolerance / 2,
      f"worst drift $worst%.2f exceeds half the entry bound — re-measure the envelope")
  }

  test("malformed bytes fail loudly, never garbage-out") {
    val good = Jpeg.encode(4L)
    intercept[IllegalArgumentException](Jpeg.headerDims(good.take(3)))          // truncated
    intercept[IllegalArgumentException](Jpeg.headerDims("XX".getBytes ++ good.drop(2))) // no SOI
    // truncate right before any SOF can appear: walk must refuse, not guess
    intercept[IllegalArgumentException](Jpeg.headerDims(good.take(6)))
    // corrupt a segment length so the walk runs off the end
    val bad = good.clone()
    bad(4) = 0x7f.toByte; bad(5) = 0xff.toByte
    intercept[IllegalArgumentException](Jpeg.headerDims(bad))
    // a 0xFF fill-byte run reaching the end of the buffer: the skip loop
    // must fail the require contract, not read past the array
    intercept[IllegalArgumentException](
      Jpeg.headerDims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)))
  }
}

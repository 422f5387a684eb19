package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Video.Avi

/** The real AVI codec (q202) pinned Spark-free: spec-compliant RIFF
  * layout, exact per-frame pixel round-trip through the padded bottom-up
  * DIB rows, the JUNK/idx1 chunk walk, the uniform frame-sampling rule
  * against a direct reference, and loud failure on malformed bytes. (The
  * cross-engine feature equality is the q202 oracle; this spec pins the
  * byte-level layer the oracle can't see.) */
class VideoCodecSpec extends AnyFunSuite {

  test("encode emits spec-compliant RIFF; decode round-trips every frame pixel") {
    // ids 0..230 cover all (w, h, nf) classes (periods 11, 7, 9), every
    // row-padding residue, and all four decoy layouts (JUNK x idx1)
    (0L to 230L).foreach { id =>
      val bytes = Avi.encode(id)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
      val v = Avi.decode(bytes)
      assert(v.w == Avi.width(id) && v.h == Avi.height(id), s"id=$id dims")
      assert(v.frames.size == Avi.nFrames(id), s"id=$id frame count")
      for (f <- v.frames.indices; y <- 0 until v.h; x <- 0 until v.w) {
        val (r, g, b) = v.frames(f).rgb(x, y)
        assert((r, g, b) == (Avi.r(id, f, x, y), Avi.g(id, f, x, y), Avi.b(id, f, x, y)),
          s"id=$id frame $f pixel ($x,$y)")
      }
    }
  }

  test("uniform frame sampling matches the stated j*n/k rule for every n") {
    (1 to 16).foreach { n =>
      val got = Avi.sampledFrames(n)
      val k = math.min(4, n)
      assert(got == (0 until k).map(j => j * n / k), s"n=$n")
      assert(got.distinct == got && got.forall(f => f >= 0 && f < n), s"n=$n bounds")
    }
    assert(Avi.sampledFrames(2) == Seq(0, 1))      // below the cap: all frames
    assert(Avi.sampledFrames(10) == Seq(0, 2, 5, 7)) // above: uniform spread
  }

  test("malformed bytes fail loudly, never garbage-out") {
    val good = Avi.encode(13L)
    intercept[IllegalArgumentException](Avi.decode(good.take(40)))            // truncated
    intercept[IllegalArgumentException](Avi.decode("XXXX".getBytes ++ good.drop(4))) // magic
    val wrongRiffSize = good.clone()
    wrongRiffSize(4) = (wrongRiffSize(4) + 1).toByte
    intercept[IllegalArgumentException](Avi.decode(wrongRiffSize))            // RIFF size
    // frame-count lie: avih dwTotalFrames is at offset 12 + 12 + 8 + 16
    val wrongCount = good.clone()
    wrongCount(12 + 12 + 8 + 16) = (wrongCount(12 + 12 + 8 + 16) + 1).toByte
    intercept[IllegalArgumentException](Avi.decode(wrongCount))
    // non-DIB stream handler: strh fccHandler inside LIST(strl)
    val strhHandler = 12 + 12 + (8 + 56) + 12 + 8 + 4
    val wrongHandler = good.clone()
    wrongHandler(strhHandler) = 'X'.toByte
    intercept[IllegalArgumentException](Avi.decode(wrongHandler))
  }

  test("the chunk walk skips JUNK and idx1 rather than reading them as frames") {
    // id 12: JUNK, no idx1; id 13: neither; id 17: JUNK + idx1 (12%4=0 has
    // JUNK only; 13%4=1 is odd so idx1 only; 16%4=0 even JUNK; 17%4=1 odd idx1)
    Seq(12L, 13L, 16L, 17L).foreach { id =>
      val v = Avi.decode(Avi.encode(id))
      assert(v.frames.size == Avi.nFrames(id), s"id=$id")
    }
  }
}

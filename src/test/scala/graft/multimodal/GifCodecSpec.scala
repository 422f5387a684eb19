package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.Gif

/** The GIF path (q201) pinned Spark-free. Unlike PNG (whose compression
  * layer is the JDK's zlib), the LZW layer here is implemented in BOTH
  * directions, so the pins carry the compression algorithm itself:
  * pixel-exact round-trip over every dimension/palette combination, an
  * INDEPENDENT decode of our encoder's bytes by `javax.imageio`'s GIF
  * reader (a cancelling encoder/decoder bug pair cannot hide), LZW
  * stream-level properties (width bumps, KwKwK, sub-block reassembly),
  * and loud failure on malformed bytes. */
class GifCodecSpec extends AnyFunSuite {

  // The codec layer is corpus-agnostic, so the spec drives ALL ids — the
  // production corpus's id ≡ 1 mod 3 restriction shares a factor with
  // the height period 12 and would reach only heights {2,5,8,11}. 1..420
  // covers every 14x12 combination (lcm 84) five times, plus both decoy
  // branches, the 32-byte sub-block branch and the quantized-palette
  // branch (id % 5 == 0).
  private val ids: Seq[Long] = 1L to 420L

  test("round-trip is pixel-exact over every dimension and palette branch") {
    ids.foreach { id =>
      val img = Gif.decode(Gif.encode(id))
      assert(img.w == Gif.width(id) && img.h == Gif.height(id), s"id=$id dims")
      for (y <- 0 until img.h; x <- 0 until img.w)
        assert(img.rgb(x, y) == Gif.rgbAt(id, x, y), s"id=$id pixel ($x,$y)")
    }
  }

  test("imageio independently decodes our encoder's bytes to the same pixels") {
    ids.take(120).foreach { id =>
      val bytes = Gif.encode(id)
      val ours = Gif.decode(bytes)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"id=$id: JDK GIF reader rejected our bytes")
      assert(ref.getWidth == ours.w && ref.getHeight == ours.h, s"id=$id dims")
      for (y <- 0 until ours.h; x <- 0 until ours.w) {
        val p = ref.getRGB(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ours.rgb(x, y),
          s"id=$id pixel ($x,$y)")
      }
    }
  }

  test("quantized ids produce narrow-palette streams that exercise LZW width growth") {
    // id=10 (quantized, 11x11): <=8 colors -> codeSize 2-3, >100 dict
    // entries, multiple width crossings. The LZW layer is driven directly
    // so the property is pinned at the stream level, not just end-to-end.
    val wide = (0 until 121).map(i => i % 3)                // 3-symbol stream
    val enc = Gif.lzwEncode(wide.toArray, 2)
    assert(Gif.lzwDecode(enc, 2, wide.length).toSeq == wide, "3-symbol LZW round-trip")
    // KwKwK: the classic cScSc pattern emits a code equal to the next
    // free slot on the decoder side
    val kwk = Array(0, 1, 0, 1, 0, 1, 0)
    assert(Gif.lzwDecode(Gif.lzwEncode(kwk, 2), 2, kwk.length).toSeq == kwk.toSeq)
    // single-pixel stream: first code is also the last
    assert(Gif.lzwDecode(Gif.lzwEncode(Array(3), 2), 2, 1).toSeq == Seq(3))
  }

  test("LZW round-trips 800 random streams across code sizes (width crossings included)") {
    val rnd = new scala.util.Random(7)
    (0 until 800).foreach { t =>
      val cs = Seq(2, 3, 4, 5, 8)(rnd.nextInt(5))
      val n = 1 + rnd.nextInt(700)
      val alpha = 1 + rnd.nextInt(1 << cs)
      val s = Array.fill(n)(rnd.nextInt(alpha))
      val d = Gif.lzwDecode(Gif.lzwEncode(s, cs), cs, n)
      assert(d.toSeq == s.toSeq, s"trial $t cs=$cs n=$n alpha=$alpha")
    }
  }

  test("LZW survives dictionary freeze at 4096 entries (deferred clear)") {
    // An incompressible 30k-symbol byte stream forces >3838 additions,
    // freezing the table at 4096; both sides must keep coding from the
    // frozen dictionary at a pinned 12-bit width (an unguarded encoder
    // would emit code 4096+, an invalid stream no decoder accepts).
    val rnd = new scala.util.Random(11)
    val s = Array.fill(30000)(rnd.nextInt(256))
    assert(Gif.lzwDecode(Gif.lzwEncode(s, 8), 8, s.length).toSeq == s.toSeq)
    // compressible variant: freeze happens while long dict strings exist
    val s2 = Array.tabulate(30000)(i => (i / 7) % 23)
    assert(Gif.lzwDecode(Gif.lzwEncode(s2, 8), 8, s2.length).toSeq == s2.toSeq)
  }

  test("malformed bytes fail loudly, never garbage-out") {
    val good = Gif.encode(4L)
    intercept[IllegalArgumentException](Gif.decode(good.take(5)))                   // truncated header
    intercept[IllegalArgumentException](Gif.decode("BMP".getBytes ++ good.drop(3))) // bad signature
    intercept[IllegalArgumentException](Gif.decode(good.dropRight(1)))              // missing trailer
    // corrupt the image-descriptor dims: screen/image mismatch must be loud
    val bad = good.clone()
    val idOff = bad.indexOf(0x2c.toByte)
    bad(idOff + 5) = ((bad(idOff + 5) ^ 1).toByte)
    intercept[IllegalArgumentException](Gif.decode(bad))
    // truncate inside the LZW data: the pixel count must not be reached
    val cut = good.dropRight(8)
    intercept[IllegalArgumentException](Gif.decode(cut))
  }
}

package graft.multimodal

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Ulaw
import graft.multimodal.Ulaw.Au

/** The G.711 µ-law codec (q208) pinned Spark-free: expansion against the
  * JDK's OWN ULAW→PCM converter (an independent G.711 implementation in
  * javax.sound.sampled) over every codeword, compression as the exact
  * inverse on canonical codes, the AU container walk (offset honesty,
  * loud malformed failure), and the companding error envelope. */
class UlawCodecSpec extends AnyFunSuite {

  /** Decode µ-law bytes through javax.sound.sampled — the independent
    * reference implementation. */
  private def jdkDecode(codes: Array[Byte]): Array[Int] = {
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes),
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
      codes.length.toLong)
    val dst = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false),
      src)
    val bytes = dst.readAllBytes()
    Array.tabulate(bytes.length / 2) { i =>
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1)
      (hi << 8) | lo
    }
  }

  test("expansion matches the JDK's independent G.711 converter on all 256 codes") {
    val codes = Array.tabulate(256)(_.toByte)
    val jdk = jdkDecode(codes)
    assert(jdk.length == 256)
    (0 until 256).foreach { c =>
      assert(Ulaw.decode(c) == jdk(c), f"code 0x$c%02x: ours=${Ulaw.decode(c)} jdk=${jdk(c)}")
    }
  }

  test("encode is the exact inverse of decode on canonical codes") {
    // 0x7F is the non-canonical negative zero (decodes to 0, re-encodes
    // to 0xFF — the same value's canonical code); all else round-trips
    (0 until 256).filter(_ != 0x7f).foreach { c =>
      assert(Ulaw.encode(Ulaw.decode(c)) == c, f"code 0x$c%02x")
    }
    assert(Ulaw.decode(0x7f) == 0 && Ulaw.encode(Ulaw.decode(0x7f)) == 0xff)
    // and every generated codeword is canonical by construction
    (0L to 100L).foreach { id =>
      (0 until Ulaw.nSamples(id)).foreach { i =>
        val c = Ulaw.codeword(id, i)
        assert(Ulaw.encode(Ulaw.decode(c)) == c, s"id=$id i=$i")
      }
    }
  }

  test("companding error is within the segment's quantization step") {
    // G.711: within segment e the step is 8 << e, so the worst-case
    // round-trip error is bounded by the top segment's step (8 << 7)
    Seq(0, 1, 7, 95, 132, 1000, 7000, 32000, -33, -8191, 32767, -32768).foreach { s =>
      val back = Ulaw.decode(Ulaw.encode(s))
      val clipped = math.max(-Ulaw.clip, math.min(Ulaw.clip, s))
      assert(math.abs(back - clipped) < (8 << 7), s"sample $s -> $back")
      if (math.abs(s) <= Ulaw.clip)
        assert(math.signum(back) == math.signum(s) || back == 0, s"sign of $s")
    }
  }

  test("AU container round-trips; the annotation field keeps the offset honest") {
    (0L to 100L).foreach { id =>
      val au = Au.decodeAu(Au.encodeAu(id))
      assert(au.sampleRate == 8000)
      assert(au.samples.length == Ulaw.nSamples(id), s"id=$id")
      au.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == Ulaw.decode(Ulaw.codeword(id, i)), s"id=$id sample $i")
      }
    }
  }

  test("A-law expansion matches the JDK's independent converter on all 256 codes") {
    val codes = Array.tabulate(256)(_.toByte)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes),
      new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false),
      codes.length.toLong)
    val dst = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false),
      src)
    val bytes = dst.readAllBytes()
    val jdk = Array.tabulate(bytes.length / 2) { i =>
      ((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)
    }
    assert(jdk.length == 256)
    (0 until 256).foreach { c =>
      assert(Ulaw.alawDecode(c) == jdk(c),
        f"code 0x$c%02x: ours=${Ulaw.alawDecode(c)} jdk=${jdk(c)}")
    }
  }

  test("A-law encode is the exact inverse of decode on ALL 256 codes") {
    (0 until 256).foreach { c =>
      assert(Ulaw.alawEncode(Ulaw.alawDecode(c)) == c, f"code 0x$c%02x")
    }
  }

  test("A-law AU container round-trips with the header-dispatched law") {
    (0L to 60L).foreach { id =>
      val au = Au.decodeAu(Au.encodeAu(id, Au.EncAlaw))
      assert(au.samples.length == Ulaw.nSamples(id), s"id=$id")
      au.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == Ulaw.alawDecode(((id * 37 + i * 101) % 256).toInt), s"id=$id i=$i")
      }
    }
    // an unsupported encoding field fails loudly, never mis-expands
    val bad = Au.encodeAu(3L, Au.EncAlaw)
    bad(15) = 3   // 16-bit linear PCM
    intercept[IllegalArgumentException](Au.decodeAu(bad))
  }

  test("malformed AU bytes fail loudly") {
    val good = Au.encodeAu(6L)   // even id: annotation present
    intercept[IllegalArgumentException](Au.decodeAu(good.take(16)))
    intercept[IllegalArgumentException](Au.decodeAu("XXXX".getBytes ++ good.drop(4)))
    val badEnc = good.clone(); badEnc(15) = 3   // encoding: 16-bit PCM
    intercept[IllegalArgumentException](Au.decodeAu(badEnc))
    val badSize = good.clone(); badSize(11) = (badSize(11) + 100).toByte
    intercept[IllegalArgumentException](Au.decodeAu(badSize))
  }
}

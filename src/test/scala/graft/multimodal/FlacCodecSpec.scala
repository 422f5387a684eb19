package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flac._

/** The FLAC fixed-predictor subset, beyond q282's corpus round-trip:
  * bit-exact layout against a HAND-DERIVED spec vector (no JDK FLAC
  * exists to cross-check, unlike µ-law — the layout pin and the
  * independent table-driven CRC twins below are the independence
  * argument), lossless round-trips across all five predictor orders and
  * adversarial signals, and the detection guarantees: every corrupted or
  * truncated stream must THROW, never silently mis-decode. */
class FlacCodecSpec extends AnyFunSuite {

  // ---- independent CRC twins (table-driven; Flac's are bitwise) ---------

  private val crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var crc = b
    (0 until 8).foreach { _ =>
      crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
    }
    crc
  }
  private def crc8Ref(bs: Seq[Byte]): Int =
    bs.foldLeft(0)((c, b) => crc8Table(c ^ (b & 0xff)))

  private val crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var crc = b << 8
    (0 until 8).foreach { _ =>
      crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
    }
    crc
  }
  private def crc16Ref(bs: Seq[Byte]): Int =
    bs.foldLeft(0)((c, b) => crc16Table(((c >> 8) ^ (b & 0xff)) & 0xff) ^ ((c << 8) & 0xffff))

  test("spec vector: the tiny stream's layout, hand-derived from the format") {
    // signal [1, 2, 3], FIXED order 1, no padding block:
    //   warmup [1]; residuals [1, 1]; zigzag -> u = [2, 2]; mean 2 ->
    //   rice k = 2; each residual = unary(0) "1" + remainder "10".
    val bytes = encodeFlacSignal(Array(1, 2, 3), 1, padBlock = false)
    assert(bytes.take(4).map(_.toChar).mkString === "fLaC")
    assert((bytes(4) & 0xff) === 0x80)                  // last block, STREAMINFO
    assert(Seq(bytes(5), bytes(6), bytes(7)) === Seq(0, 0, 34))
    val f = 8 + 34                                      // frame start
    // header: sync 11111111 111110 | res 0 | strat 0 -> FF F8; bs code
    // 0111 + sr code 0000 -> 70; chan 0000 + size 100 + res 0 -> 08;
    // frame number 00; blocksize-1 = 2 -> 00 02
    assert(bytes.slice(f, f + 7).map(_ & 0xff).toSeq ===
      Seq(0xff, 0xf8, 0x70, 0x08, 0x00, 0x00, 0x02))
    assert((bytes(f + 7) & 0xff) === crc8Ref(bytes.slice(f, f + 7).toSeq))
    // subframe: 0 | 001001 | 0 -> 12; warmup 0x0001; then
    // method 00 + partorder 0000 + k 0010 + "110" "110" -> 00 B6
    assert(bytes.slice(f + 8, f + 13).map(_ & 0xff).toSeq ===
      Seq(0x12, 0x00, 0x01, 0x00, 0xb6))
    val crc = ((bytes(f + 13) & 0xff) << 8) | (bytes(f + 14) & 0xff)
    assert(crc === crc16Ref(bytes.slice(f, f + 13).toSeq))
    assert(bytes.length === f + 15)
    val dec = decodeFlac(bytes)
    assert(dec.samples.toSeq === Seq(1, 2, 3) && dec.order === 1)
    assert(dec.sampleRate === SampleRate && dec.bps === BitsPerSample)
  }

  test("crc twins: bitwise == table-driven over random byte runs") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val bs = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      assert(crc8(bs, 0, bs.length) === crc8Ref(bs.toSeq))
      assert(crc16(bs, 0, bs.length) === crc16Ref(bs.toSeq))
    }
  }

  test("lossless round-trip: all five orders x adversarial signals") {
    val rnd = new scala.util.Random(7)
    val signals = Seq(
      Array.fill(40)(0),                                 // silence
      Array.tabulate(40)(i => if (i % 2 == 0) 32767 else -32768), // extremes
      Array.tabulate(40)(i => i * 13 - 260),             // ramp (order-2 zeros)
      Array.fill(40)(rnd.nextInt(65536) - 32768),        // noise
      Array.tabulate(5)(i => i - 2)                      // minimal blocksize
    )
    for (s <- signals; k <- 0 to 4 if s.length > k; pad <- Seq(true, false)) {
      val dec = decodeFlac(encodeFlacSignal(s, k, pad))
      assert(dec.samples.toSeq === s.toSeq, s"order $k pad $pad")
      assert(dec.order === k)
    }
  }

  test("corpus fabrication: every doc round-trips and reports its id-derived order") {
    (0L until 25L).foreach { id =>
      val dec = decodeFlac(encodeFlac(id))
      assert(dec.samples.toSeq === (0 until nSamples(id)).map(i => sample(id, i)))
      assert(dec.order === order(id))
    }
  }

  test("detection: corruption and truncation throw, never mis-decode") {
    val good = encodeFlac(6L)                            // even id: padding walk
    // flip one bit in every byte position — header, metadata, payload,
    // CRCs: each must either throw or (for the PADDING block's dead
    // bytes) decode identically; silent WRONG samples are the failure
    val want = decodeFlac(good).samples.toSeq
    good.indices.foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x40).toByte
      val got = scala.util.Try(decodeFlac(bad))
      assert(got.isFailure || got.get.samples.toSeq === want,
        s"byte $i: corrupted stream decoded to different samples undetected")
    }
    // a flipped payload bit specifically must be caught by CRC-16
    val payload = good.clone(); payload(good.length - 4) = (payload(good.length - 4) ^ 0x01).toByte
    assert(scala.util.Try(decodeFlac(payload)).isFailure)
    // truncations at every length
    (0 until good.length).foreach { len =>
      assert(scala.util.Try(decodeFlac(good.take(len))).isFailure, s"len $len")
    }
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Spectral.{Fft, Tone}
import graft.multimodal.Multimodal.Wav

/** The radix-2 FFT (q204) pinned Spark-free: equality with a naive DFT
  * on deterministic pseudo-random signals across sizes, Parseval's
  * identity, closed forms (impulse, constant, pure tone), the
  * dominant-bin rule, and the tone corpus' end-to-end margin. */
class FftSpec extends AnyFunSuite {

  private def prng(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .map(x => ((x >>> 33).toDouble / (1L << 31).toDouble) - 0.5).drop(1)

  test("FFT equals the naive DFT across sizes 2..256") {
    for (n <- Seq(2, 4, 8, 16, 64, 256); trial <- 0 until 3) {
      val x = prng(n * 1000 + trial).take(n).toArray
      val re = x.clone(); val im = new Array[Double](n)
      Fft.transform(re, im)
      val (dr, di) = Fft.naiveDft(x)
      val scale = math.max(1.0, x.map(math.abs).sum)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - dr(k)) / scale < 1e-9, s"n=$n k=$k re")
        assert(math.abs(im(k) - di(k)) / scale < 1e-9, s"n=$n k=$k im")
      }
    }
  }

  test("Parseval: sum |x|^2 == (1/n) sum |X|^2") {
    val n = 128
    val x = prng(42).take(n).toArray
    val re = x.clone(); val im = new Array[Double](n)
    Fft.transform(re, im)
    val t = x.map(v => v * v).sum
    val f = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(t - f) / t < 1e-12)
  }

  test("closed forms: impulse is flat, constant is pure DC, tone is one spike") {
    val n = 64
    val re1 = new Array[Double](n); re1(0) = 1.0
    val im1 = new Array[Double](n)
    Fft.transform(re1, im1)
    (0 until n).foreach { k => assert(math.abs(re1(k) - 1.0) < 1e-12 && math.abs(im1(k)) < 1e-12) }

    val re2 = Array.fill(n)(3.0); val im2 = new Array[Double](n)
    Fft.transform(re2, im2)
    assert(math.abs(re2(0) - 3.0 * n) < 1e-9)
    (1 until n).foreach(k => assert(math.abs(re2(k)) < 1e-9 && math.abs(im2(k)) < 1e-9))

    val k0 = 5
    val re3 = Array.tabulate(n)(i => math.cos(2 * math.Pi * k0 * i / n))
    val im3 = new Array[Double](n)
    Fft.transform(re3, im3)
    assert(math.abs(re3(k0) - n / 2.0) < 1e-9)          // spike at k0 (and n-k0)
    (0 until n).filterNot(k => k == k0 || k == n - k0)
      .foreach(k => assert(math.abs(re3(k)) < 1e-8 && math.abs(im3(k)) < 1e-8))
  }

  test("non-power-of-two lengths are rejected") {
    intercept[IllegalArgumentException](
      Fft.transform(new Array[Double](48), new Array[Double](48)))
  }

  test("dominantBin recovers every tone bin through the real WAV round-trip") {
    (0L until 62L).foreach { id =>       // two full periods of id % 31
      val wav = Wav.decode(Wav.encodePcm(Tone.samples(id), withDecoy = id % 2 == 0))
      assert(wav.samples.length == Tone.n, s"id=$id")
      assert(Fft.dominantBin(wav.samples) == Tone.bin(id), s"id=$id")
    }
  }

  test("the tone spike margin is orders of magnitude above rounding noise") {
    val s = Tone.samples(17L)
    val re = s.map(_.toDouble); val im = new Array[Double](Tone.n)
    Fft.transform(re, im)
    val mags = (1 to Tone.n / 2).map(k => math.sqrt(re(k) * re(k) + im(k) * im(k)))
    val sorted = mags.sorted.reverse
    assert(sorted.head > 1000 * sorted(1),
      s"spike ${sorted.head} vs runner-up ${sorted(1)}")
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** REAL transform-free lossless-audio decode (SURVEY.md Q282) — the FLAC
  * fixed-predictor subset (public spec: xiph.org FLAC format): the one
  * remaining compressed-audio family expressible with no external
  * library, retiring FakeCodec's "lossless audio" category the way Q201
  * retired palette rasters with from-scratch LZW. The subset is pure
  * integer arithmetic end-to-end: fixed polynomial predictors of order
  * 0-4 (the spec's hardwired coefficients — no LPC coefficient
  * quantization), Rice/Golomb residual coding (zigzag fold, unary
  * quotient, k-bit remainder), MSB-first bit packing, and the two spec
  * CRCs (CRC-8 poly 0x07 over the frame header, CRC-16 poly 0x8005 over
  * the whole frame). MP3/AAC-class TRANSFORM codecs (MDCT + Huffman +
  * psychoacoustics) remain FakeCodec's scope — final disposition: they
  * genuinely need external bindings, and a from-scratch MDCT stack would
  * be a codec project, not a data-pipeline operator.
  *
  * Proof shape (the Q196/Q208 contract): per audio doc a deterministic
  * PCM signal is fabricated from doc_id, FLAC-encoded with the
  * predictor ORDER VARYING BY doc (id % 5 — the corpus exercises all
  * five fixed predictors), then decoded by a real bit-level parser that
  * validates magic, walks the metadata chain (a PADDING block on even
  * ids keeps the walk honest — a fixed-offset reader breaks), reads
  * rate/width from STREAMINFO (the frame header defers to it: code 0),
  * checks both CRCs, and reconstructs samples through the predictor
  * recurrence. FLAC is LOSSLESS, so the DuckDB oracle replays the
  * original signal formula directly — hash equality proves
  * encode∘decode == identity AND container + Rice + predictor all at
  * once. The decoded predictor order is projected per doc, so a decoder
  * that ignored the subframe type could not pass. FlacCodecSpec pins the
  * bit-exact layout against a hand-assembled spec vector (no JDK FLAC
  * exists to cross-check, unlike µ-law), round-trips all orders over
  * adversarial signals, and proves CRC/truncation corruption is
  * DETECTED, never silently mis-decoded.
  *
  * Scale posture: map-only per-row byte work (the q196-q207 contract: at
  * 100 TB the bytes arrive in the binary column and the fabrication seam
  * disappears); no shuffle before the output sort.
  */
object Flac {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  // ---- deterministic fixture -------------------------------------------

  val SampleRate = 16000
  val BitsPerSample = 16

  def nSamples(id: Long): Int = (32 + id % 48).toInt
  def order(id: Long): Int = (id % 5).toInt

  /** The Q197 noise congruence widened to 12 bits, centered — full
    * 16-bit-signed range is exercised by FlacCodecSpec's extremes. */
  def sample(id: Long, i: Int): Int = (((id * 37 + i * 101) % 4096) - 2048).toInt

  // ---- bit-level plumbing (MSB-first, the FLAC byte order) --------------

  private[multimodal] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** FLAC unary: `q` 0-bits then a 1-bit (libFLAC write_unary_unsigned). */
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def align(): Unit = while (n != 0) bit(0)
    def byteArray: Array[Byte] = { require(n == 0, "unaligned"); buf.toArray }
    def size: Int = { require(n == 0, "unaligned"); buf.length }
  }

  private[multimodal] final class BitReader(bytes: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def aligned: Boolean = bitPos == 0
    def bit(): Int = {
      require(bytePos < bytes.length, "FLAC stream ran out of bits")
      val b = (bytes(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(width: Int): Long = {
      var v = 0L; var i = 0
      while (i < width) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def unary(): Int = { var q = 0; while (bit() == 0) q += 1; q }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** CRC-8, poly 0x07, init 0, MSB-first — the FLAC frame-header CRC. */
  private[multimodal] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; b += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0, MSB-first — the FLAC whole-frame CRC. */
  private[multimodal] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- fixed predictors --------------------------------------------------

  /** The spec's hardwired fixed-predictor coefficients by order: residual
    * r_i = s_i - sum(c_j * s_{i-1-j}) — order-k is the k-th difference. */
  private val coef: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def residuals(s: Array[Int], k: Int): Array[Int] =
    Array.tabulate(s.length - k) { j =>
      val i = j + k
      var r = s(i)
      var c = 0
      while (c < k) { r -= coef(k)(c) * s(i - 1 - c); c += 1 }
      r
    }

  private def reconstruct(warm: Array[Int], res: Array[Int], k: Int): Array[Int] = {
    val out = new Array[Int](warm.length + res.length)
    System.arraycopy(warm, 0, out, 0, k)
    var j = 0
    while (j < res.length) {
      val i = j + k
      var s = res(j)
      var c = 0
      while (c < k) { s += coef(k)(c) * out(i - 1 - c); c += 1 }
      out(i) = s
      j += 1
    }
    out
  }

  // ---- rice coding ---------------------------------------------------------

  private def zigzag(r: Int): Int = (r << 1) ^ (r >> 31)
  private def unzigzag(u: Int): Int = (u >>> 1) ^ -(u & 1)

  /** Rice parameter estimate: smallest k with mean(u) < 2^k (the standard
    * Golomb fit), clamped below the 4-bit escape code. */
  private[multimodal] def riceParam(res: Array[Int]): Int = {
    if (res.isEmpty) return 0
    val mean = res.map(r => zigzag(r).toLong).sum / res.length
    var k = 0
    while (k < 14 && (1L << k) <= mean) k += 1
    k
  }

  // ---- encoder (fixture fabrication — the write half of the round-trip) ----

  private val Magic = Array[Byte]('f', 'L', 'a', 'C')

  private def streamInfo(n: Int): Array[Byte] = {
    val w = new BitWriter
    w.bits(n, 16); w.bits(n, 16)          // min/max blocksize
    w.bits(0, 24); w.bits(0, 24)          // min/max framesize (unknown)
    w.bits(SampleRate, 20)
    w.bits(0, 3)                          // channels - 1 (mono)
    w.bits(BitsPerSample - 1, 5)
    w.bits(n, 36)                         // total samples
    (0 until 4).foreach(_ => w.bits(0, 32)) // md5 unset
    w.byteArray
  }

  /** Spec-compliant single-frame FLAC encode of the doc's signal, FIXED
    * subframe of `order(id)`, rice partition order 0. A PADDING metadata
    * block precedes STREAMINFO's is-last sibling on even ids (the AU
    * annotation decoy: the data offset must be walked, not assumed). */
  def encodeFlac(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val s = Array.tabulate(n)(i => sample(id, i))
    encodeFlacSignal(s, order(id), padBlock = id % 2 == 0)
  }

  private[multimodal] def encodeFlacSignal(s: Array[Int], k: Int,
                                           padBlock: Boolean): Array[Byte] = {
    val n = s.length
    require(n > k, s"blocksize $n too small for order $k")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= Magic
    // STREAMINFO (type 0), last unless a PADDING block follows
    val si = streamInfo(n)
    out += (if (padBlock) 0x00 else 0x80).toByte
    out += 0; out += 0; out += si.length.toByte
    out ++= si
    if (padBlock) {
      out += (0x80 | 0x01).toByte        // last, type 1 = PADDING
      out += 0; out += 0; out += 8
      out ++= new Array[Byte](8)
    }
    // ---- the one frame ----
    val w = new BitWriter
    w.bits(0x3ffe, 14)                   // sync
    w.bits(0, 1)                         // reserved
    w.bits(0, 1)                         // fixed-blocksize strategy
    w.bits(0x7, 4)                       // blocksize code: 16-bit at end of header
    w.bits(0x0, 4)                       // sample rate: get from STREAMINFO
    w.bits(0x0, 4)                       // channel assignment: mono
    w.bits(0x4, 3)                       // sample size: 16 bits
    w.bits(0, 1)                         // reserved
    w.bits(0, 8)                         // frame number 0 (single-byte UTF-8)
    w.bits(n - 1, 16)                    // blocksize - 1
    val hdr = { w.align(); w.byteArray } // header is byte-aligned by construction
    w.bits(crc8(hdr, 0, hdr.length), 8)
    // subframe header: pad 0, type FIXED|order, wasted-bits 0
    w.bits(0, 1); w.bits(0x08 | k, 6); w.bits(0, 1)
    s.take(k).foreach(v => w.bits(v.toLong & 0xffff, 16)) // verbatim warmup
    val res = residuals(s, k)
    val rp = riceParam(res)
    w.bits(0, 2)                         // residual method: rice, 4-bit params
    w.bits(0, 4)                         // partition order 0
    w.bits(rp, 4)
    res.foreach { r =>
      val u = zigzag(r)
      w.unary(u >>> rp)
      if (rp > 0) w.bits(u & ((1 << rp) - 1), rp)
    }
    w.align()
    val frame = w.byteArray
    val full = new BitWriter
    full.bits(crc16(frame, 0, frame.length), 16)
    out ++= frame
    out ++= full.byteArray
    out.toArray
  }

  // ---- decoder --------------------------------------------------------------

  final case class DecodedFlac(sampleRate: Int, bps: Int, order: Int,
                               samples: Array[Int])

  /** Parse + reconstruct: magic, metadata walk to STREAMINFO (skipping
    * unknown blocks by their declared length), frame header with both
    * CRCs verified, FIXED subframe of any order 0-4, rice partition
    * order 0. Every `require` is a detection guarantee FlacCodecSpec
    * exercises — corruption must throw, never mis-decode. */
  def decodeFlac(bytes: Array[Byte]): DecodedFlac = {
    require(bytes.length >= 8 && (0 until 4).forall(i => bytes(i) == Magic(i)),
      "not a FLAC file")
    var pos = 4
    var last = false
    var sr = -1; var bps = -1; var total = -1L
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "truncated metadata block")
      if (btype == 0) {
        val r = new BitReader(bytes, pos)
        r.bits(16); r.bits(16); r.bits(24); r.bits(24)
        sr = r.bits(20).toInt
        require(r.bits(3) == 0, "not mono")
        bps = r.bits(5).toInt + 1
        total = r.bits(36)
      }
      pos += len
    }
    require(sr > 0 && bps > 0, "no STREAMINFO block")
    val frameStart = pos
    val r = new BitReader(bytes, pos)
    require(r.bits(14) == 0x3ffe, "bad frame sync")
    require(r.bits(1) == 0, "reserved bit set")
    r.bits(1)                                          // blocking strategy
    val bsCode = r.bits(4)
    require(bsCode == 0x7, s"unsupported blocksize code $bsCode")
    require(r.bits(4) == 0x0, "frame must defer sample rate to STREAMINFO")
    require(r.bits(4) == 0x0, "not mono")
    require(r.bits(3) == 0x4, "not 16-bit")
    require(r.bits(1) == 0, "reserved bit set")
    val fn = r.bits(8)
    require(fn < 0x80, "multi-byte frame numbers not in subset")
    val n = r.bits(16).toInt + 1
    require(r.aligned, "frame header misaligned")
    val hdrCrc = r.bits(8).toInt
    require(hdrCrc == crc8(bytes, frameStart, frameStart + 7),
      "frame header CRC-8 mismatch")
    // subframe
    require(r.bits(1) == 0, "subframe padding bit set")
    val stype = r.bits(6).toInt
    require((stype >> 3) == 1 && (stype & 7) <= 4, s"not a FIXED subframe: $stype")
    val k = stype & 7
    require(r.bits(1) == 0, "wasted bits not in subset")
    val warm = Array.tabulate(k) { _ =>
      val v = r.bits(16).toInt
      (v << 16) >> 16                                  // sign-extend
    }
    require(r.bits(2) == 0, "only 4-bit rice partitions in subset")
    require(r.bits(4) == 0, "only partition order 0 in subset")
    val rp = r.bits(4).toInt
    require(rp != 15, "rice escape code not in subset")
    val res = Array.tabulate(n - k) { _ =>
      val q = r.unary()
      val u = (q << rp) | (if (rp > 0) r.bits(rp).toInt else 0)
      unzigzag(u)
    }
    r.align()
    val frameCrc = r.bits(16).toInt
    require(frameCrc == crc16(bytes, frameStart, r.bytePos - 2),
      "frame CRC-16 mismatch")
    require(total < 0 || total == n, "STREAMINFO/frame sample count mismatch")
    DecodedFlac(sr, bps, k, reconstruct(warm, res, k))
  }

  case class FlacFeature(doc_id: Long, n_samples: Int, sr: Int, bps: Int,
                         pred_order: Int, sum_s: Long, abs_sum: Long)

  object FlacCodec {
    final class Handle private[FlacCodec] () {
      def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[FlacFeature] =
        batch.map { case (id, bytes) =>
          val f = decodeFlac(bytes)
          FlacFeature(id, f.samples.length, f.sampleRate, f.bps, f.order,
            f.samples.map(_.toLong).sum,
            f.samples.map(s => math.abs(s).toLong).sum)
        }
    }
    def open(): Handle = new Handle()
  }

  /** q282's oracle: FLAC is lossless, so the oracle replays the ORIGINAL
    * signal formula — hash equality proves the whole encode∘decode chain
    * (container walk, CRCs, rice, predictor) reproduced it exactly. The
    * projected pred_order pins that the decoder read the subframe type. */
  private def flacSql(series: (Int, String) => String): String =
    s"""WITH au AS (SELECT doc_id, CAST(32 + doc_id % 48 AS INT) AS n
      |            FROM documents WHERE doc_id % 3 = 2),
      |iser AS (${series(80, "i")}),
      |sm AS (SELECT doc_id, n, (doc_id*37 + i*101) % 4096 - 2048 AS s
      |       FROM au, iser WHERE i < n)
      |SELECT doc_id, CAST(n AS INT) AS n_samples, CAST($SampleRate AS INT) AS sr,
      |  CAST($BitsPerSample AS INT) AS bps, CAST(doc_id % 5 AS INT) AS pred_order,
      |  CAST(SUM(s) AS BIGINT) AS sum_s, CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum
      |FROM sm GROUP BY doc_id, n ORDER BY doc_id""".stripMargin

  val entries: Seq[Entry] = Seq(
    // REAL lossless-audio decode (see scaladoc): FLAC fixed-predictor
    // files fabricated per audio doc with the predictor order varying by
    // id, round-tripped through the bit-level parser (metadata walk, both
    // CRCs, rice, predictor reconstruction). Map-only, no shuffle before
    // the output sort.
    Entry("q282_flac_decode",
      flacSql((n, c) => s"SELECT UNNEST(range($n)) AS $c")) { (s, d) =>
      import s.implicits._
      val payloads = T(s, d, "documents")
        .filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
        .map(id => (id, encodeFlac(id)))
      payloads.mapPartitions { rows =>
        val codec = FlacCodec.open()
        rows.grouped(64).flatMap(codec.decodeBatch)
      }.toDF()
        .select(col("doc_id"), col("n_samples"), col("sr"), col("bps"),
                col("pred_order"), col("sum_s"), col("abs_sum"))
        .orderBy(col("doc_id"))
    }.sqlTwin(flacSql((n, c) => s"SELECT explode(sequence(0, ${n - 1})) AS $c"))
  )
}

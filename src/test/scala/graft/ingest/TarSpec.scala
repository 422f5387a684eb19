package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Shards.Tar

/** The ustar layer (q203) pinned Spark-free: byte-exact member
  * round-trip across block-padding residues, header checksum
  * verification (a flipped payload-adjacent header byte must fail, not
  * skew), WebDataset sample grouping, and loud failure on malformed
  * archives. (Cross-engine payload integrity is the q203 oracle's md5
  * check; this spec pins the byte-level grammar the oracle can't see.) */
class TarSpec extends AnyFunSuite {

  private def member(n: Int): (String, Array[Byte]) =
    s"doc$n.bin" -> Array.tabulate(n)(i => ((i * 31 + n * 7) % 256).toByte)

  test("members round-trip byte-exact across every padding residue") {
    // sizes 0, 1, 511, 512, 513, 1024 hit all block-boundary cases
    val ms = Seq(0, 1, 7, 511, 512, 513, 1024).map(member)
    val back = Tar.read(Tar.write(ms))
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((bn, bd), (n, d)) =>
      assert(bd.sameElements(d), s"member $bn ($n)")
    }
  }

  test("an empty archive is just the terminator and reads back empty") {
    val bytes = Tar.write(Seq.empty)
    assert(bytes.length == 1024 && bytes.forall(_ == 0))
    assert(Tar.read(bytes).isEmpty)
  }

  test("header checksum is verified: any header byte flip fails loudly") {
    val bytes = Tar.write(Seq(member(100)))
    // flip a name byte (offset 1), a mode byte (101), an mtime byte (137)
    Seq(1, 101, 137).foreach { off =>
      val bad = bytes.clone(); bad(off) = (bad(off) ^ 0x01).toByte
      intercept[IllegalArgumentException](Tar.read(bad))
    }
  }

  test("malformed archives fail loudly") {
    val good = Tar.write(Seq(member(600)))
    intercept[IllegalArgumentException](Tar.read(good.take(600)))       // unaligned
    intercept[IllegalArgumentException](Tar.read(good.take(1024)))      // member truncated mid-data
    val noMagic = good.clone(); noMagic(257) = 'X'
    intercept[IllegalArgumentException](Tar.read(noMagic))
    // drop the terminator: walk must not run off the end silently
    intercept[IllegalArgumentException](Tar.read(good.dropRight(1024)))
    // directory member (typeflag '5') is not a sample field
    val dir = good.clone(); dir(156) = '5'
    intercept[IllegalArgumentException](Tar.read(dir))
  }

  test("fuzz: 300 random archives round-trip byte-exact") {
    val rnd = new scala.util.Random(0xba5e)
    (0 until 300).foreach { trial =>
      val ms = (0 until 1 + rnd.nextInt(6)).map { i =>
        val name = s"m${trial}_$i." + Seq("txt", "cls", "json", "bin")(rnd.nextInt(4))
        val size = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(8)                    // tiny (incl. empty)
          case 1 => 500 + rnd.nextInt(30)             // block boundary region
          case 2 => rnd.nextInt(3000)                 // multi-block
          case _ => 512 * (1 + rnd.nextInt(3))        // exact multiples
        }
        val data = new Array[Byte](size); rnd.nextBytes(data)
        name -> data
      }
      val back = Tar.read(Tar.write(ms))
      assert(back.map(_._1) == ms.map(_._1), s"trial $trial names")
      back.zip(ms).foreach { case ((_, bd), (n, d)) =>
        assert(bd.sameElements(d), s"trial $trial member $n")
      }
    }
  }

  test("WebDataset grouping keys by basename and fields by extension") {
    val ms = Seq(
      "7.txt" -> "hello".getBytes, "7.cls" -> "3".getBytes,
      "12.txt" -> "world".getBytes, "12.cls" -> "5".getBytes,
      "12.meta.json" -> "{}".getBytes)      // multi-dot ext: rest after first '.'
    val samples = Tar.samples(Tar.read(Tar.write(ms)))
    assert(samples.keySet == Set("7", "12"))
    assert(new String(samples("7")("txt")) == "hello")
    assert(samples("12").keySet == Set("txt", "cls", "meta.json"))
    assert(new String(samples("12")("meta.json")) == "{}")
  }
}

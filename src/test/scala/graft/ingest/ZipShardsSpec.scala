package graft.ingest

import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ZipShards.Zip

/** The ZIP layer (q215) pinned Spark-free — both directions against the
  * JDK: `ZipInputStream` reads our encoder's bytes member-for-member,
  * and our back-to-front parser reads `ZipOutputStream`'s bytes. Plus:
  * comment back-scan, extra-field skip, CRC/double-entry validation,
  * and loud malformed failure. */
class ZipShardsSpec extends AnyFunSuite {

  private def member(n: Int): (String, Array[Byte]) =
    s"doc$n.bin" -> Array.tabulate(n)(i => ((i * 31 + n * 7) % 256).toByte)

  test("round-trips byte-exact, with and without comment/extra decoys") {
    for (comment <- Seq(Array.empty[Byte], "trailing comment".getBytes);
         extra <- Seq(Array.empty[Byte], Array[Byte](1, 2, 3, 4))) {
      val ms = Seq(0, 1, 100, 517, 2048).map(member)
      val back = Zip.read(Zip.write(ms, comment, extra))
      assert(back.map(_._1) == ms.map(_._1))
      back.zip(ms).foreach { case ((n, bd), (_, d)) =>
        assert(bd.sameElements(d), s"member $n comment=${comment.length} extra=${extra.length}")
      }
    }
  }

  test("the JDK's ZipInputStream reads our encoder's bytes member-for-member") {
    val ms = Seq(3, 700, 64).map(member)
    val zin = new ZipInputStream(
      new java.io.ByteArrayInputStream(Zip.write(ms, "c".getBytes, Array[Byte](9, 9))))
    ms.foreach { case (name, data) =>
      val e = zin.getNextEntry
      assert(e != null && e.getName == name)
      val got = zin.readAllBytes()
      assert(got.sameElements(data), s"member $name")
    }
    assert(zin.getNextEntry == null)
  }

  test("our parser reads the JDK ZipOutputStream's bytes") {
    val ms = Seq(5, 900).map(member)
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    zout.setMethod(ZipOutputStream.STORED)
    ms.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(data.length.toLong)
      e.setCrc(Zip.crc32(data).toLong & 0xffffffffL)
      zout.putNextEntry(e); zout.write(data); zout.closeEntry()
    }
    zout.close()
    val back = Zip.read(bos.toByteArray)
    assert(back.map(_._1) == ms.map(_._1))
    back.zip(ms).foreach { case ((n, bd), (_, d)) =>
      assert(bd.sameElements(d), s"member $n")
    }
  }

  test("malformed archives fail loudly") {
    val good = Zip.write(Seq(member(300)), "cm".getBytes, Array.empty)
    intercept[IllegalArgumentException](Zip.read(good.take(10)))          // no EOCD
    intercept[IllegalArgumentException](Zip.read(good.dropRight(1)))      // comment-length lies
    // flip a payload byte: stored CRC must catch it
    val corrupt = good.clone()
    corrupt(40) = (corrupt(40) ^ 0x5a).toByte
    intercept[IllegalArgumentException](Zip.read(corrupt))
    // central-directory offset lies
    val badCd = good.clone()
    val eocd = good.length - 22 - 2   // 2-byte comment
    badCd(eocd + 16) = (badCd(eocd + 16) + 4).toByte
    intercept[IllegalArgumentException](Zip.read(badCd))
  }

  test("fuzz: 200 random archives round-trip byte-exact") {
    val rnd = new scala.util.Random(0x21b)
    (0 until 200).foreach { trial =>
      val ms = (0 until 1 + rnd.nextInt(5)).map { i =>
        val data = new Array[Byte](rnd.nextInt(1500)); rnd.nextBytes(data)
        s"t${trial}_$i.bin" -> data
      }
      val comment = if (trial % 2 == 0) Array.tabulate(rnd.nextInt(40))(_.toByte) else Array.empty[Byte]
      val back = Zip.read(Zip.write(ms, comment))
      assert(back.map(_._1) == ms.map(_._1), s"trial $trial")
      back.zip(ms).foreach { case ((_, bd), (_, d)) => assert(bd.sameElements(d)) }
    }
  }
}

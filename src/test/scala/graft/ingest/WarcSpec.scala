package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WarcShards.Warc

/** The WARC/1.0 framing + HTTP layer (q221) pinned Spark-free: length-
  * framed records survive payloads containing the WARC magic, truncation
  * and terminator drift fail loudly, header names are case-insensitive,
  * and the full shard round-trip recovers every document byte-exactly
  * through WARC -> HTTP -> HTML.
  */
class WarcSpec extends AnyFunSuite {

  private def rec(typ: String, block: Array[Byte], id: Long = 7L): Array[Byte] =
    Warc.record(typ, Seq("WARC-Target-URI" -> "https://x/"), block, id)

  test("round-trip: payloads containing 'WARC/1.0' lines do not resync framing") {
    val hostile = ("evil body\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999\r\n\r\n").getBytes("ISO-8859-1")
    val rnd = new scala.util.Random(221)
    val blocks = hostile +: Seq.fill(20) {
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b)
      // CR/LF bytes allowed anywhere in the block — framing is by length
      b
    }
    val file = Warc.write(blocks.zipWithIndex.map { case (b, i) => rec("response", b, i.toLong) })
    val back = Warc.read(file)
    assert(back.size == blocks.size)
    back.zip(blocks).foreach { case (r, b) =>
      assert(java.util.Arrays.equals(r.block, b))
      assert(r.headers("warc-type") == "response")
    }
  }

  test("truncated block and missing terminator fail loudly") {
    val good = rec("response", "hello".getBytes)
    intercept[IllegalArgumentException](Warc.read(good.dropRight(3)))
    // corrupt the terminator (flip final LF)
    val bad = good.clone(); bad(bad.length - 1) = 'X'.toByte
    intercept[IllegalArgumentException](Warc.read(bad))
    // declared length larger than the file
    val lie = new String(good, "ISO-8859-1").replace("Content-Length: 5", "Content-Length: 50")
    intercept[IllegalArgumentException](Warc.read(lie.getBytes("ISO-8859-1")))
  }

  test("header names are case-insensitive on read") {
    val raw = ("WARC/1.0\r\nwarc-TYPE: response\r\ncontent-length: 2\r\n\r\nok\r\n\r\n")
      .getBytes("ISO-8859-1")
    val r = Warc.read(raw).head
    assert(r.headers("warc-type") == "response" && new String(r.block) == "ok")
  }

  test("HTTP response parse: status, headers, exact body; length lie rejected") {
    val (status, hdrs, body) = Warc.httpResponse(Warc.httpOk("abc".getBytes))
    assert(status == 200 && new String(body) == "abc")
    assert(hdrs("content-type").startsWith("text/html"))
    val lie = new String(Warc.httpOk("abc".getBytes), "ISO-8859-1")
      .replace("Content-Length: 3", "Content-Length: 4")
    intercept[IllegalArgumentException](Warc.httpResponse(lie.getBytes("ISO-8859-1")))
  }

  test("CDX offsets: every record (any type) is standalone-readable from its slice") {
    val docs = (0L until 8L).map(i => i -> s"cdx doc $i with some words in it number ${i * 17}")
    val bytes = WarcShards.buildShard(3L, docs)
    val withOff = Warc.readWithOffsets(bytes)
    // warcinfo + 4 requests (even ids) + 8 responses
    assert(withOff.size == 13)
    // offsets tile the file exactly: contiguous, gap-free, covering
    withOff.foldLeft(0L) { case (expected, (_, off, len)) =>
      assert(off == expected, s"gap before offset $off"); off + len
    } match { case end => assert(end == bytes.length) }
    withOff.foreach { case (rec, off, len) =>
      val again = Warc.read(bytes.slice(off.toInt, (off + len).toInt))
      assert(again.size == 1 && java.util.Arrays.equals(again.head.block, rec.block))
      assert(again.head.headers == rec.headers)
    }
  }

  test("shard round-trip: warcinfo + request records skipped, docs byte-exact") {
    val docs = (0L until 8L).map(i => i -> s"doc $i words with enough characters to keep ${i * 31}")
    val samples = WarcShards.parseShard(0L, WarcShards.buildShard(0L, docs))
    assert(samples.map(_._1) == (0L until 8L))
    samples.foreach { case (id, shard, canon, status, content) =>
      assert(shard == 0L && status == 200)
      assert(content == docs(id.toInt)._2, s"doc $id content drift")
      assert(canon == graft.text.Urls.canonicalize(graft.text.Urls.fabricate(id)))
    }
  }
}

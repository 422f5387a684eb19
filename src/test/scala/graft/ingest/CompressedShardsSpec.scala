package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CompressedShards.{Codec, Jsonl}

/** The compressed-shard byte layer (q205) pinned Spark-free: codec
  * sniffing by magic, both codecs round-tripping, strict JSON escaping
  * of every control character, and loud failure on unknown or corrupt
  * streams. (Cross-engine payload integrity is the q205 oracle's md5
  * check; this spec pins the layer the oracle can't see.) */
class CompressedShardsSpec extends AnyFunSuite {

  private val nasty =
    "line1\nline2\r\ttab \"quoted\" back\\slash \u0000nul \u001fus café 中文"

  test("gzip and zstd round-trip bytes exactly and sniff by magic") {
    val data = nasty.getBytes("UTF-8")
    val (cg, dg) = Codec.sniffDecompress(Codec.gzip(data))
    assert(cg == "gzip" && dg.sameElements(data))
    val (cz, dz) = Codec.sniffDecompress(Codec.zstd(data))
    assert(cz == "zstd" && dz.sameElements(data))
  }

  test("unknown magic fails loudly, never passes garbage through") {
    intercept[IllegalArgumentException](
      Codec.sniffDecompress("not compressed at all".getBytes))
    intercept[IllegalArgumentException](Codec.sniffDecompress(Array[Byte](0x1f)))
  }

  test("corrupt compressed payload fails, not silent truncation") {
    val blob = Codec.gzip(("x" * 10000).getBytes)
    val cut = blob.take(blob.length / 2)
    intercept[Exception](Codec.sniffDecompress(cut))
  }

  test("JSON escaping covers every control char and survives a JSON parser") {
    val line = Jsonl.line(42L, "en", nasty)
    assert(line.forall(_ >= ' '), "raw control char would break line framing")
    assert(line.contains("\\u0000") && line.contains("\\u001f"))
    assert(line.contains("\\n") && line.contains("\\r") && line.contains("\\t"))
    assert(line.contains("\\\"quoted\\\"") && line.contains("back\\\\slash"))
    // non-ASCII passes through raw (JSON permits it; UTF-8 carries it)
    assert(line.contains("café") && line.contains("中文"))
  }

  test("escape is invertible under the standard JSON unescape rules") {
    def unescape(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\') {
          s(i + 1) match {
            case '"'  => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case 'n'  => b.append('\n'); i += 2
            case 'r'  => b.append('\r'); i += 2
            case 't'  => b.append('\t'); i += 2
            case 'u'  => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c    => fail(s"unexpected escape \\$c")
          }
        } else { b.append(s(i)); i += 1 }
      }
      b.toString
    }
    Seq(nasty, "", "plain", "\\", "\"", "").foreach { s =>
      assert(unescape(Jsonl.escape(s)) == s, s"round-trip of ${s.take(20)}")
    }
  }
}

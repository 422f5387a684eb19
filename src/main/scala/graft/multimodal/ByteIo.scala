package graft.multimodal

/** Shared little-endian byte IO + the 4-byte-aligned 24bpp row stride —
  * one definition for the BMP pixel walk (q196), the RIFF containers
  * (q197 WAV, q202 AVI) and anything else that speaks LE bytes, so the
  * layouts that claim to share a format actually share the code. */
private[multimodal] object ByteIo {
  def putLE(a: Array[Byte], off: Int, v: Int, n: Int): Unit =
    (0 until n).foreach(k => a(off + k) = ((v >>> (8 * k)) & 0xff).toByte)

  def getLE(a: Array[Byte], off: Int, n: Int): Int =
    (0 until n).foldRight(0)((k, acc) => (acc << 8) | (a(off + k) & 0xff))

  def putTag(a: Array[Byte], off: Int, tag: String): Unit =
    tag.getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) => a(off + k) = b }

  def tag(a: Array[Byte], off: Int): String = {
    require(off + 4 <= a.length, "truncated chunk tag")
    new String(a.slice(off, off + 4), "US-ASCII")
  }

  /** BI_RGB 24bpp row stride: 3 bytes/pixel padded to 4-byte alignment. */
  def rowSize24(w: Int): Int = ((3 * w + 3) / 4) * 4
}

package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** The nfc_normalize kernel (q216) pinned on both execution paths plus
  * the composition semantics the entry relies on. */
class NormalizeSpec extends GraftSuite {

  private val decomposed = "éåç"   // é å ç, decomposed
  private val composed = "éåç"

  test("kernel composes on both execution paths and is registered in SQL") {
    import spark.implicits._
    val df = Seq(decomposed, composed, "plain", "").toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
    assert(df.as[String].collect().toSeq == Seq(composed, composed, "plain", ""))
    // interpreted path (no codegen) must agree
    val interpreted = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
      .eval(null).toString
    assert(interpreted == composed)
    // SQL name resolves (the oracle runs this exact call verbatim)
    assert(spark.sql(s"SELECT nfc_normalize('plain') = 'plain'").head().getBoolean(0))
  }

  test("already-NFC input short-circuits to the same reference") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("already normal")
    assert(graft.functions.NfcNormalize.nfc(u) eq u)
  }

  test("length contract the q216 oracle relies on: composition shrinks by the mark count") {
    assert(decomposed.codePointCount(0, decomposed.length) == 6)
    assert(Normalize.entries.head.oracle.get.contains("chr(769)"))
    val n = java.text.Normalizer.normalize(decomposed, java.text.Normalizer.Form.NFC)
    assert(n.codePointCount(0, n.length) == 3)
  }
}

package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** The ingest-staged dedup artifacts (TokenIndex.shingles3 /
  * minhashSigs) must equal their from-scratch derivations row-for-row —
  * staging moves WHEN the work happens, never WHAT is computed. A drift
  * here would silently change every dedup consumer (q61, q90, q102). */
class StagingSpec extends GraftSuite {

  test("staged shingles3 == hashedShingles(toks, 3) derived from scratch") {
    val staged = TokenIndex.shingles3(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val derived = Text.hashedShingles(TokenIndex.toks(spark, sf), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged === derived)
    assert(staged.nonEmpty)
  }

  test("staged minhashSigs == minhashSignatures(shingles3, 64) derived from scratch") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val staged = rows(TokenIndex.minhashSigs(spark, sf))
    val derived = rows(Text.minhashSignatures(TokenIndex.shingles3(spark, sf), 64))
    assert(staged === derived)
    assert(staged.nonEmpty)
    assert(staged.head.size === 65) // doc_id + 64 permutation minima
  }
}

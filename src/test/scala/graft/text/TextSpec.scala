package graft.text

import org.apache.spark.sql.functions._

import graft.GraftSuite

/** Analyzer / shingle edge pins: the tokenizer is shared by seven declared
  * queries and both near-dup paths, so its edge behavior (empty text,
  * punctuation-only, case folding, token order) is contract. */
class TextSpec extends GraftSuite {

  private def tok(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("text").select(Text.tokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
  }

  test("tokenizer: lowercase, strip punctuation, split, drop empties") {
    assert(tok("Hello, World! 42") === Seq("hello", "world", "42"))
    assert(tok("  a  b ") === Seq("a", "b"))
    assert(tok("...") === Seq.empty)
    assert(tok("") === Seq.empty)
    assert(tok("Don't stop-me now") === Seq("don", "t", "stop", "me", "now"))
  }

  test("shingles: k-grams in order, distinct per doc, short docs dropped") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r p q r")).toDF("doc_id", "text")
    val sh = Text.shingles(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh === Set(
      (1L, "a b c"), (1L, "b c d"),
      // doc 2 has < 3 tokens -> no shingles
      (3L, "p q r"), (3L, "q r p"), (3L, "r p q")))
  }

  test("tokenHash column == oracle SQL fold (cross-engine contract)") {
    // replicate the DuckDB-side fold in Scala and compare on real tokens
    def duckFold(w: String): Long =
      w.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    import spark.implicits._
    val words = Seq("data", "stream", "graft", "q", "123abc")
    val got = words.toDF("w").select(Text.tokenHash(col("w"))).as[Long].collect().toSeq
    assert(got === words.map(duckFold))
  }
}

package graft.queries

import graft.GraftSuite
import graft.queries.SimpleQueryString._
import org.apache.spark.sql.functions._

/** The simple_query_string parser and its compiled predicate, beyond the
  * one pinned query string q121 declares: clause parsing across every
  * supported form, and predicate evaluation over hand-built token rows
  * where the expected match set is enumerable by eye. */
class SqsParserSpec extends GraftSuite {

  test("parse: occur prefixes, phrases, prefix-wildcards, analysis") {
    assert(parse("data") === Seq(Clause(Should, Term("data"))))
    assert(parse("+data -slow") ===
      Seq(Clause(Must, Term("data")), Clause(MustNot, Term("slow"))))
    assert(parse("\"data stream\"") ===
      Seq(Clause(Should, Phrase(Seq("data", "stream")))))
    assert(parse("+\"big data stream\"") ===
      Seq(Clause(Must, Phrase(Seq("big", "data", "stream")))))
    assert(parse("vec*") === Seq(Clause(Should, Prefix("vec"))))
    assert(parse("-vec*") === Seq(Clause(MustNot, Prefix("vec"))))
    // a starred token that analyzes to several index tokens keeps the
    // leading tokens as a positional run (ES match_phrase_prefix) — the
    // MUST constraint on "data" must not silently vanish
    assert(parse("+data-vec*") ===
      Seq(Clause(Must, PhrasePrefix(Seq("data"), "vec"))))
    // analyzer parity: uppercase + punctuation normalize like the corpus;
    // a token that analyzes to several index tokens becomes a phrase run
    assert(parse("Data") === Seq(Clause(Should, Term("data"))))
    assert(parse("DATA-Stream") === Seq(Clause(Should, Phrase(Seq("data", "stream")))))
    // empty / whitespace-only clauses vanish
    assert(parse("  \"\"  ") === Seq.empty)
  }

  test("predicate: must / must_not / should-at-least-one over token rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("data", "stream", "fast")),          // phrase hit
      (2L, Seq("data", "batch")),                    // should-term hit
      (3L, Seq("data", "vector")),                   // prefix hit
      (4L, Seq("data", "fast")),                     // no should hit
      (5L, Seq("data", "slow", "stream", "batch")),  // prohibited
      (6L, Seq("stream", "data")),                   // reversed: NOT the phrase
      (7L, Seq("batch", "stream"))                   // missing required term
    ).toDF("doc_id", "ws")
    val q = parse("""+data -slow "data stream" batch vec*""")
    val got = rows.filter(predicate(q, col("ws")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("predicate: only must/must_not (no should) matches without optionals") {
    import spark.implicits._
    val rows = Seq((1L, Seq("data")), (2L, Seq("data", "slow")), (3L, Seq("x")))
      .toDF("doc_id", "ws")
    val got = rows.filter(predicate(parse("+data -slow"), col("ws")))
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("phrase-prefix predicate: leading run adjacent to the prefix token") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("data", "vector", "x")),   // run + prefix adjacent: match
      (2L, Seq("data", "x", "vector")),   // not adjacent: no match
      (3L, Seq("vector", "data")),        // prefix before run: no match
      (4L, Seq("data"))                   // shorter than the clause: no match
    ).toDF("doc_id", "ws")
    val got = rows.filter(clausePred(col("ws"), PhrasePrefix(Seq("data"), "vec")))
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("phrase predicate: guarded when the doc is shorter than the phrase") {
    import spark.implicits._
    val rows = Seq((1L, Seq("data")), (2L, Seq.empty[String]),
                   (3L, Seq("big", "data", "stream", "x"))).toDF("doc_id", "ws")
    val got = rows.filter(clausePred(col("ws"), Phrase(Seq("big", "data", "stream"))))
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }
}

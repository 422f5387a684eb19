package graft.queries

import graft.GraftSuite
import graft.queries.QueryString._
import org.apache.spark.sql.functions._

/** The query_string parser and compiler beyond q280's pinned string
  * (the SqsParserSpec posture): grammar across every supported form —
  * precedence, grouping, juxtaposition-as-default-OR, fielded atoms,
  * ranges, boosts, wildcards — plus predicate/score evaluation over
  * hand-built rows where the expected sets are enumerable by eye, and
  * the error surface (bad syntax must throw, never silently match). */
class QsParserSpec extends GraftSuite {

  // ---- grammar ---------------------------------------------------------

  test("parse: precedence NOT > AND > OR, parens regroup") {
    assert(parse("a OR b AND c") ===
      Or(Seq(TermQ(None, Seq("a")), And(Seq(TermQ(None, Seq("b")), TermQ(None, Seq("c")))))))
    assert(parse("(a OR b) AND c") ===
      And(Seq(Or(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))), TermQ(None, Seq("c")))))
    assert(parse("NOT a AND b") ===
      And(Seq(Not(TermQ(None, Seq("a"))), TermQ(None, Seq("b")))))
    assert(parse("NOT (a AND b)") ===
      Not(And(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b"))))))
  }

  test("parse: juxtaposition is the default operator (OR)") {
    assert(parse("a b") === Or(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))))
    // the explicit chain binds first, then the bare clause ORs in
    assert(parse("a AND b c") ===
      Or(Seq(And(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))), TermQ(None, Seq("c")))))
  }

  test("parse: operators are uppercase-only — lowercase words are terms") {
    assert(parse("a and b") === Or(Seq(
      TermQ(None, Seq("a")), TermQ(None, Seq("and")), TermQ(None, Seq("b")))))
    // ANDx is a term, not the operator dangling into a word
    assert(parse("ANDx") === TermQ(None, Seq("andx")))
  }

  test("parse: fielded atoms, analysis, phrases, wildcards") {
    assert(parse("type:economy") === TermQ(Some("type"), Seq("economy")))
    // analyzer parity: a multi-token source term becomes a positional run
    assert(parse("name:DATA-Stream") === TermQ(Some("name"), Seq("data", "stream")))
    assert(parse("brand:\"brand 17\"") === PhraseQ(Some("brand"), Seq("brand", "17")))
    assert(parse("re*") === PrefixQ(None, Seq(), "re"))
    assert(parse("name:data-vec*") === PrefixQ(Some("name"), Seq("data"), "vec"))
  }

  test("parse: phrase slop, general wildcards, /regex/, _exists_, field:*, bare *") {
    assert(parse("\"a b\"~2") === PhraseQ(None, Seq("a", "b"), 2))
    assert(parse("name:\"a b c\"~1") === PhraseQ(Some("name"), Seq("a", "b", "c"), 1))
    assert(parse("\"a b\"~0") === PhraseQ(None, Seq("a", "b"), 0))
    assert(parse("\"a b\"~2^3") === Boost(PhraseQ(None, Seq("a", "b"), 2), 3.0))
    // general wildcards: mid-term ?, leading *, mid *; trailing-only *
    // stays the analyzed PrefixQ (q280's plan unchanged)
    assert(parse("te?t") === WildcardQ(None, "te?t"))
    assert(parse("*est") === WildcardQ(None, "*est"))
    assert(parse("t*e") === WildcardQ(None, "t*e"))
    assert(parse("name:TE?T*") === WildcardQ(Some("name"), "te?t*"))
    assert(parse("re*") === PrefixQ(None, Seq(), "re"))          // unchanged
    assert(parse("name:data-vec*") === PrefixQ(Some("name"), Seq("data"), "vec"))
    // regex terms: raw body, \/ escape, fielded
    assert(parse("/st(a|b)m/") === RegexQ(None, "st(a|b)m"))
    assert(parse("name:/a\\/b/") === RegexQ(Some("name"), "a/b"))
    // exists: pseudo-field, field:*, bare * = match-all
    assert(parse("_exists_:name") === ExistsQ(Some("name")))
    assert(parse("_exists_:SIZE") === ExistsQ(Some("size")))
    assert(parse("name:*") === ExistsQ(Some("name")))
    assert(parse("*") === ExistsQ(None))
    for (bad <- Seq("\"a b\"~", "\"a b\"~x", "/ab", "//", "da-t?a", "_exists_:",
                    "_exists_:\"x\""))
      intercept[IllegalArgumentException] { parse(bad) }
  }

  test("parse: numeric terms accept .5 / 3. / +5 raw forms") {
    assert(parse("size:.5") === NumTermQ(Some("size"), 0.5, ".5"))
    assert(parse("size:3.") === NumTermQ(Some("size"), 3.0, "3."))
    assert(parse("size:+5") === NumTermQ(Some("size"), 5.0, "+5"))
    assert(parse("size:-1.25") === NumTermQ(Some("size"), -1.25, "-1.25"))
  }

  test("compile: phrase slop — two-term ES law (gap + reversal), 3+ in-order") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("data", "stream")),             // adjacent, in order
      (2L, Seq("data", "x", "stream")),        // gap 1
      (3L, Seq("data", "x", "y", "stream")),   // gap 2
      (4L, Seq("stream", "data")),             // reversed adjacent: cost 2
      (5L, Seq("stream", "x", "data")),        // reversed with gap: cost 3
      (6L, Seq("data", "x")),                  // missing term
      (7L, Seq("a", "b", "c")),                // exact 3-run
      (8L, Seq("a", "x", "b", "c")),           // 3-term total gap 1
      (9L, Seq("b", "a", "c"))                 // out of order (3-term: no match)
    ).toDF("doc_id", "ws")
    def ids(q: String): Seq[Long] = {
      val (p, _) = compile(parse(q), Map("name" -> TokenField(col("ws"))), "name")
      rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(ids("\"data stream\"~0") === Seq(1L))
    assert(ids("\"data stream\"~1") === Seq(1L, 2L))
    assert(ids("\"data stream\"~2") === Seq(1L, 2L, 3L, 4L))    // reversal at cost 2
    assert(ids("\"data stream\"~3") === Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids("\"a b c\"~0") === Seq(7L))
    assert(ids("\"a b c\"~1") === Seq(7L, 8L))                  // in-order only for 3+
  }

  test("compile: general wildcards and regex match whole tokens") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("test")), (2L, Seq("text")), (3L, Seq("tempest")),
      (4L, Seq("rest")), (5L, Seq("attest")), (6L, Seq("te"))
    ).toDF("doc_id", "ws")
    def ids(q: String): Seq[Long] = {
      val (p, _) = compile(parse(q), Map("name" -> TokenField(col("ws"))), "name")
      rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(ids("te?t") === Seq(1L, 2L))          // exactly one char
    assert(ids("*est") === Seq(1L, 3L, 4L, 5L))  // leading wildcard: any ...est token
    assert(ids("t*t") === Seq(1L, 2L, 3L))       // mid wildcard
    assert(ids("/te(st|xt)/") === Seq(1L, 2L))   // regex, anchored
    assert(ids("/t.*t/") === Seq(1L, 2L, 3L))    // regex is full-token: 'attest' excluded
  }

  test("compile: _exists_ — token fields need >= 1 analyzed token, numeric non-null") {
    import spark.implicits._
    val rows = Seq[(Long, Option[Seq[String]], Option[Int])](
      (1L, Some(Seq("red", "bolt")), Some(3)),
      (2L, Some(Seq()), None),          // analyzes to nothing + null numeric
      (3L, None, Some(0))               // null token field
    ).toDF("doc_id", "ws", "size")
    def ids(q: String): Seq[Long] = {
      val (p, _) = compile(parse(q), fields, "name")
      rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(ids("_exists_:name") === Seq(1L))
    assert(ids("name:*") === Seq(1L))
    assert(ids("_exists_:size") === Seq(1L, 3L))
    assert(ids("NOT _exists_:name") === Seq(2L, 3L))   // null must NOT null-filter
    assert(ids("*") === Seq(1L, 2L, 3L))               // bare * = match-all
    // EVERY leaf is null-safe (the compile-level coalesce): NOT over a
    // null token/numeric field matches the row, never null-filters it
    assert(ids("NOT bo?t") === Seq(2L, 3L))
    assert(ids("NOT /bolt/") === Seq(2L, 3L))
    assert(ids("NOT \"red bolt\"~1") === Seq(2L, 3L))
    assert(ids("NOT name:*xyz") === Seq(1L, 2L, 3L))
    assert(ids("NOT size:[1 TO 2]") === Seq(1L, 2L, 3L))  // null size: not in range
    intercept[IllegalArgumentException] { compile(parse("_exists_:nosuch"), fields, "name") }
    // malformed slop values raise ParseError, never NumberFormatException
    for (bad <- Seq("\"a b\"~99999999999", "\"a b\"~٣"))
      intercept[IllegalArgumentException] { parse(bad) }
  }

  test("parse: fuzzy terms — explicit distance, bare-tilde default, bounds") {
    assert(parse("bolt~1") === FuzzyQ(None, "bolt", 1))
    assert(parse("name:bolt~2") === FuzzyQ(Some("name"), "bolt", 2))
    assert(parse("bolt~") === FuzzyQ(None, "bolt", 2))      // Lucene default
    assert(parse("bolt~0") === FuzzyQ(None, "bolt", 0))     // exact
    assert(parse("BOLT~1") === FuzzyQ(None, "bolt", 1))     // analyzed
    for (bad <- Seq("~1", "bolt~3", "bolt~x", "\"a b\"~1 extra~~", "data-stream~1"))
      intercept[IllegalArgumentException] { parse(bad) }
  }

  test("compile: fuzzy matches within edit distance; dist 0 is exact") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("bolt")), (2L, Seq("bolts")), (3L, Seq("colt")),
      (4L, Seq("bole")), (5L, Seq("gear")), (6L, Seq("bot"))
    ).toDF("doc_id", "ws")
    def ids(q: String): Seq[Long] = {
      val (p, _) = compile(parse(q), Map("name" -> TokenField(col("ws"))), "name")
      rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(ids("bolt~0") === Seq(1L))
    assert(ids("bolt~1") === Seq(1L, 2L, 3L, 4L, 6L))
    assert(ids("bolt~2") === Seq(1L, 2L, 3L, 4L, 6L))
  }

  test("parse: juxtaposed NOT is a DISJUNCT under default OR — pinned deviation") {
    // Lucene hoists NOT to MUST_NOT on the enclosing boolean (`a NOT b`
    // = a AND NOT b there); this grammar keeps NOT compositional, so the
    // juxtaposed form is a true disjunct that also matches documents
    // containing neither term (scaladoc "Semantics note"; r18 ADVICE).
    // The Lucene reading is one explicit keyword away.
    assert(parse("a NOT b") ===
      Or(Seq(TermQ(None, Seq("a")), Not(TermQ(None, Seq("b"))))))
    assert(parse("a AND NOT b") ===
      And(Seq(TermQ(None, Seq("a")), Not(TermQ(None, Seq("b"))))))
    assert(matchIds("red NOT bolt") === Seq(1L, 2L, 4L, 5L)) // 5 matches neither leaf positively
    assert(matchIds("red AND NOT bolt") === Seq(2L))
  }

  test("parse: numeric terms carry the RAW value — decimals and signs survive analysis") {
    // r18 ADVICE: the analyzer used to split `3.5` into [3, 5] and the
    // compiler concatenated to 35.0; `-5` lost its sign. The raw text now
    // rides a dedicated node.
    assert(parse("size:3.5") === NumTermQ(Some("size"), 3.5, "3.5"))
    assert(parse("size:-5") === NumTermQ(Some("size"), -5.0, "-5"))
    assert(parse("size:15") === NumTermQ(Some("size"), 15.0, "15"))
    assert(parse("17") === NumTermQ(None, 17.0, "17"))
    assert(parse("size:3.5^2") === Boost(NumTermQ(Some("size"), 3.5, "3.5"), 2.0))
  }

  test("compile: numeric equality uses the raw value; non-round-tripping terms throw") {
    assert(matchIds("size:15") === Seq(1L, 2L))
    assert(matchIds("size:15.0") === Seq(1L, 2L))
    assert(matchIds("size:3.5") === Seq())   // pre-fix: matched size 35
    assert(matchIds("size:-5") === Seq())    // pre-fix: matched size 5
    // a term that does not round-trip as ONE number on a numeric field is
    // an error, never a silently-concatenated analyzed form
    intercept[IllegalArgumentException] { matchIds("size:3,5") }
    intercept[IllegalArgumentException] { matchIds("size:abc") }
  }

  test("compile: a numeric bare term on a TOKEN field matches its analyzed tokens") {
    import spark.implicits._
    val rows = Seq((1L, Seq("brand", "17")), (2L, Seq("brand", "9"))).toDF("doc_id", "ws")
    def ids(q: String): Seq[Long] = {
      val (p, _) = compile(parse(q), Map("name" -> TokenField(col("ws"))), "name")
      rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
    }
    assert(ids("17") === Seq(1L))
    assert(ids("name:9") === Seq(2L))
    assert(ids("-9") === Seq(2L))  // analyzer strips the sign on token fields
  }

  test("parse: ranges — inclusive, exclusive, mixed, open-ended") {
    assert(parse("size:[10 TO 40]") === RangeQ(Some("size"), Some(10), Some(40), true, true))
    assert(parse("size:{10 TO 40}") === RangeQ(Some("size"), Some(10), Some(40), false, false))
    assert(parse("size:[10 TO 40}") === RangeQ(Some("size"), Some(10), Some(40), true, false))
    assert(parse("size:[10 TO *]") === RangeQ(Some("size"), Some(10), None, true, true))
    assert(parse("size:[* TO 40]") === RangeQ(Some("size"), None, Some(40), true, true))
  }

  test("parse: boosts attach to terms, phrases, ranges, and groups") {
    assert(parse("a^2") === Boost(TermQ(None, Seq("a")), 2.0))
    assert(parse("\"a b\"^1.5") === Boost(PhraseQ(None, Seq("a", "b")), 1.5))
    assert(parse("size:[1 TO 2]^0.5") ===
      Boost(RangeQ(Some("size"), Some(1), Some(2), true, true), 0.5))
    assert(parse("(a OR b)^3") ===
      Boost(Or(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))), 3.0))
  }

  test("parse: default_operator=AND binds juxtaposition at the AND level") {
    // `a b OR c` = (a AND b) OR c — the precedence reading of default AND
    assert(parse("a b OR c", defaultAnd = true) ===
      Or(Seq(And(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))), TermQ(None, Seq("c")))))
    assert(parse("a b c", defaultAnd = true) ===
      And(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")), TermQ(None, Seq("c")))))
    // explicit operators and NOT are unchanged under default AND
    assert(parse("a NOT b", defaultAnd = true) ===
      And(Seq(TermQ(None, Seq("a")), Not(TermQ(None, Seq("b"))))))
    assert(parse("(a OR b) c", defaultAnd = true) ===
      And(Seq(Or(Seq(TermQ(None, Seq("a")), TermQ(None, Seq("b")))), TermQ(None, Seq("c")))))
  }

  test("expandDefaults: bare atoms expand over weighted fields; fielded atoms don't") {
    val n = parse("""bolt brand:x re* size:[1 TO 2] [3 TO 4]""")
    val e = expandDefaults(n, Seq("name" -> 2.0, "type" -> 1.0))
    assert(e === Or(Seq(
      Or(Seq(Boost(TermQ(Some("name"), Seq("bolt")), 2.0), TermQ(Some("type"), Seq("bolt")))),
      TermQ(Some("brand"), Seq("x")),
      Or(Seq(Boost(PrefixQ(Some("name"), Seq(), "re"), 2.0), PrefixQ(Some("type"), Seq(), "re"))),
      RangeQ(Some("size"), Some(1), Some(2), true, true),   // fielded: untouched
      Or(Seq(Boost(RangeQ(Some("name"), Some(3), Some(4), true, true), 2.0),
             RangeQ(Some("type"), Some(3), Some(4), true, true))))))
    // single unweighted default is the identity modulo field attachment
    assert(expandDefaults(parse("bolt"), Seq("name" -> 1.0)) ===
      TermQ(Some("name"), Seq("bolt")))
  }

  test("compileFields: multi-field predicate matches any field; score sums weighted arms") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("bolt"), Seq("economy")),   // name hit only
      (2L, Seq("gear"), Seq("bolt")),      // type hit only
      (3L, Seq("bolt"), Seq("bolt")),      // both
      (4L, Seq("gear"), Seq("promo"))      // neither
    ).toDF("doc_id", "name_ws", "type_ws")
    val fields = Map[String, FieldRef](
      "name" -> TokenField(col("name_ws")), "type" -> TokenField(col("type_ws")))
    val (p, s) = compileFields(parse("bolt"), fields, Seq("name" -> 2.0, "type" -> 1.0))
    val got = rows.filter(p).select(col("doc_id"), round(s, 4).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 2.0, 2L -> 1.0, 3L -> 3.0))
  }

  test("parse: malformed queries throw, never silently match") {
    for (bad <- Seq("", "   ", "(a OR b", "\"unclosed", "size:[1 TO 2",
                    "size:[x TO 2]", "size:[1 2]", "a^", "NOT", "a AND", ")a",
                    "a^1.2.3", "a^."))  // malformed boosts: ParseError, not NumberFormatException
      intercept[IllegalArgumentException] { parse(bad) }
  }

  // ---- compile + evaluate ----------------------------------------------

  private def fields = Map[String, FieldRef](
    "name" -> TokenField(col("ws")),
    "size" -> NumField(col("size")))

  private def rows = {
    import spark.implicits._
    Seq(
      (1L, Seq("red", "bolt"), 15),
      (2L, Seq("red", "widget"), 15),
      (3L, Seq("blue", "bolt"), 45),
      (4L, Seq("bolt", "red"), 5),
      (5L, Seq("redder", "gear"), 20)
    ).toDF("doc_id", "ws", "size")
  }

  private def matchIds(q: String): Seq[Long] = {
    import spark.implicits._
    val (p, _) = compile(parse(q), fields, "name")
    rows.filter(p).select("doc_id").as[Long].collect().sorted.toSeq
  }

  test("compile: booleans, ranges, wildcards, phrases over rows") {
    assert(matchIds("bolt") === Seq(1L, 3L, 4L))
    assert(matchIds("bolt AND red") === Seq(1L, 4L))
    assert(matchIds("bolt AND NOT red") === Seq(3L))
    assert(matchIds("\"red bolt\"") === Seq(1L))           // positional, not bag
    assert(matchIds("red*") === Seq(1L, 2L, 4L, 5L))       // prefix: red, redder
    assert(matchIds("size:[15 TO 45]") === Seq(1L, 2L, 3L, 5L))
    assert(matchIds("size:{15 TO 45}") === Seq(5L))        // exclusive both ends
    assert(matchIds("size:[* TO 15]") === Seq(1L, 2L, 4L))
    assert(matchIds("size:15") === Seq(1L, 2L))            // numeric equality term
    assert(matchIds("widget gear") === Seq(2L, 5L))        // juxtaposition = OR
    assert(matchIds("bolt AND (widget OR size:[40 TO *])") === Seq(3L))
  }

  test("compile: constant-score model — matched leaves sum, boosts multiply, NOT scores 0") {
    import spark.implicits._
    val (p, s) = compile(
      parse("bolt^2 (red^3 OR widget) AND NOT gear"), fields, "name")
    val got = rows.filter(p)
      .select(col("doc_id"), round(s, 4).as("score"))
      .as[(Long, Double)].collect().toMap
    // doc 1: bolt(2) + red(3) = 5; doc 2: widget(1) + red(3) = 4;
    // doc 3: bolt(2) = 2; doc 4: bolt(2) + red(3) = 5
    assert(got === Map(1L -> 5.0, 2L -> 4.0, 3L -> 2.0, 4L -> 5.0))
  }

  test("compile: field misuse is an error, not an empty result") {
    intercept[IllegalArgumentException] {
      compile(parse("nosuch:bolt"), fields, "name")
    }
    intercept[IllegalArgumentException] {
      compile(parse("name:[1 TO 2]"), fields, "name")  // range on a token field
    }
    intercept[IllegalArgumentException] {
      compile(parse("size:bo*"), fields, "name")       // wildcard on a numeric field
    }
    intercept[IllegalArgumentException] {
      compile(parse("name:\"x y\""), Map("name" -> NumField(col("size"))), "name")
    }
  }
}

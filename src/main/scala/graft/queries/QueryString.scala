package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES `query_string` — the full-Lucene search-box language of the delivered
  * ES 6.3 surface (the default `q=` syntax a user types into every search
  * box; `simple_query_string` q121 is its deliberately-reduced sibling).
  *
  * Supported syntax (ES 6.3 `query_string` docs):
  *   - `field:term` fielded terms; bare terms hit the default field;
  *   - `AND` / `OR` / `NOT` (uppercase — lowercase words are terms, the
  *     Lucene rule) with `NOT` > `AND` > `OR` precedence and `(...)`
  *     grouping; adjacent clauses with no operator combine under the
  *     default operator (OR — ES `default_operator`'s default);
  *   - `"quoted terms"` phrases (consecutive positions, in order — the
  *     q121 positional-run semantics, one shared kernel) and
  *     `"a b"~N` phrase PROXIMITY (see [[PhraseQ]]: full two-term ES
  *     slop law incl. reversal; in-order reduction for 3+ terms);
  *   - `term*` trailing-wildcard (prefix) terms, plus GENERAL `*`/`?`
  *     wildcards (`te?t`, `*est`, `t*e` — unanalyzed, per-token LIKE via
  *     the Q184 kernel, see [[WildcardQ]]) and `/regex/` terms
  *     (full-token anchored, the Q134 rlike kernel, see [[RegexQ]]);
  *   - `_exists_:field` / `field:*` exists queries and the bare `*`
  *     match-all (see [[ExistsQ]]);
  *   - `term~N` fuzzy terms (Levenshtein distance N in 0..2; bare `~`
  *     = 2, the classic Lucene default) — single-token terms only, a
  *     fuzzy phrase is a parse error as in Lucene;
  *   - numeric terms in every Lucene-accepted raw form (`3.5`, `-5`,
  *     `.5`, `3.`, `+5` — the [[NumTermQ]] raw-value discipline);
  *   - `[a TO b]` / `{a TO b}` ranges on numeric fields, inclusive /
  *     exclusive per bracket (mixed `[a TO b}` allowed), `*` for an open
  *     end — numeric-only: the fixtures' keyword fields are analyzed
  *     token arrays where a lexicographic term range has no ES-mapping
  *     analog, so a range on a token field is a parse-time error, not a
  *     silent empty result;
  *   - `^boost` on any term, phrase, range, or group.
  *
  * Semantics note (documented choice): Lucene's own `query_string` parser
  * resolves mixed operators with a left-to-right occur-flag mutation
  * whose corner cases even the Lucene docs warn against relying on; this
  * parser implements the precedence reading above — the behavior every
  * published "mind your query_string operators" guide tells users to
  * assume, and identical to Lucene wherever the query doesn't mix bare
  * juxtaposition INTO an explicit chain. One user-visible consequence
  * (r18 ADVICE, pinned in QsParserSpec): under `default_operator=OR` a
  * juxtaposed NOT clause is a DISJUNCT — `a NOT b` = `a OR (NOT b)`,
  * which also matches documents containing neither term. Lucene instead
  * hoists NOT to a MUST_NOT on the enclosing boolean (`a AND NOT b`
  * there); this parser keeps NOT compositional because the grammar is
  * otherwise purely precedence-driven (the same reading the fuzz
  * differential evaluates independently), and the Lucene behavior is one
  * explicit keyword away: write `a AND NOT b` (or run under
  * `default_operator=AND`, where juxtaposition already conjoins).
  * `+`/`-` occur prefixes are q121's (`simple_query_string`) surface and
  * are not part of this grammar.
  *
  * Compilation: [[compile]] produces ONE boolean predicate Column and ONE
  * score Column over analyzed token-array / numeric field columns — a
  * pushable scan filter plus per-row arithmetic, no joins, no UDFs (the
  * q121 posture; every leaf is array_contains / exists / element_at /
  * range-compare, all codegen'd). Scoring is the constant-score model: a
  * matched leaf contributes its boost (default 1.0), AND/OR nodes sum
  * their matched children, `NOT` contributes nothing, group boosts
  * multiply the subtree — deterministic and engine-independent (the
  * fixtures carry no corpus statistics for BM25; ES's own
  * `constant_score`/filter-context scoring works exactly like this).
  *
  * Scale posture: scan + filter + projection — the predicate and score
  * fold into the scan stage like q120-q122; at 100 TB this is a map-only
  * pass with the filter pushed below the projection.
  */
object QueryString {

  // ---- AST ----------------------------------------------------------

  sealed trait Node
  final case class Or(children: Seq[Node]) extends Node
  final case class And(children: Seq[Node]) extends Node
  final case class Not(child: Node) extends Node
  final case class Boost(child: Node, boost: Double) extends Node
  /** Analyzed positional run on `field` — 1 token = a term, 2+ = the
    * phrase expansion of a multi-token source term ("DATA-Stream"). */
  final case class TermQ(field: Option[String], terms: Seq[String]) extends Node
  /** A term whose RAW source text is a number (`size:3.5`, `size:-5`) —
    * the analyzer strips signs and splits on '.', so numeric equality
    * must carry the pre-analysis value (r18 ADVICE: `3.5` analyzed to
    * [3,5] and silently concatenated to 35.0). On a numeric field the
    * match is `col === value`; on a token field it degrades to the
    * analyzed positional run (`raw`'s tokens), same as TermQ. */
  final case class NumTermQ(field: Option[String], value: Double, raw: String)
      extends Node
  /** `"quoted terms"` — and `"a b"~N` phrase PROXIMITY (Lucene slop).
    * slop = 0 is the exact consecutive-run phrase. slop > 0 on a TWO-term
    * phrase implements the full ES/Lucene law (the q97 kernel): in-order
    * with gap <= slop, or REVERSED when the transposition cost
    * (pos_a - pos_b + 1) <= slop. For 3+ terms the documented reduction is
    * the in-order reading only — positions strictly increasing with total
    * inserted-gap (last - first - (n-1)) <= slop; Lucene's out-of-order
    * multi-term edit-distance matching is deliberately omitted (its own
    * docs warn the semantics are subtle; the in-order reading is what
    * every published proximity-search guide describes). */
  final case class PhraseQ(field: Option[String], terms: Seq[String],
                           slop: Int = 0) extends Node
  /** A general `*`/`?` wildcard term (`te?t`, `*est`, `t*e`) — like
    * Lucene, wildcard terms are NOT analyzed (only lowercased), so the
    * pattern must be one analyzer-clean token (letters/digits + wildcard
    * metachars); compiled per token via [[Search.wildcardToLike]] (the
    * Q184 kernel). A pure trailing-`*` pattern stays the analyzed
    * [[PrefixQ]] (positional-run prefix — the q280 shape, unchanged). */
  final case class WildcardQ(field: Option[String], pattern: String) extends Node
  /** `/regex/` — matches a token the pattern FULLY matches (Lucene regex
    * terms are implicitly anchored; like Lucene, never analyzed). */
  final case class RegexQ(field: Option[String], pattern: String) extends Node
  /** `_exists_:field` (also spelled `field:*`): the field carries an
    * indexed value — non-null for a numeric field, >= 1 analyzed token
    * for a text field (a value whose analysis yields no tokens indexes
    * nothing, so it does not "exist" — the ES exists-query reading).
    * `field = None` is the bare `*` term: Lucene rewrites it to
    * match-all, and so does this compiler (never expanded over default
    * fields). */
  final case class ExistsQ(field: Option[String]) extends Node
  /** `run` tokens at consecutive positions then a token starting with
    * `prefix` — empty `run` is a plain prefix query. */
  final case class PrefixQ(field: Option[String], run: Seq[String], prefix: String)
      extends Node
  final case class RangeQ(field: Option[String], lo: Option[Double], hi: Option[Double],
                          loInc: Boolean, hiInc: Boolean) extends Node
  /** `term~N` — matches a token within `dist` Levenshtein edits of the
    * term (Lucene fuzzy; bare `~` = 2, the classic Lucene default).
    * Single-analyzed-token terms only — a fuzzy phrase is a parse error,
    * as in Lucene. */
  final case class FuzzyQ(field: Option[String], term: String, dist: Int) extends Node

  // ---- fields -------------------------------------------------------

  /** A queryable field: an analyzed token array or a numeric column. */
  sealed trait FieldRef
  final case class TokenField(ws: Column) extends FieldRef
  final case class NumField(c: Column) extends FieldRef

  /** Query-term analyzer — must mirror the corpus analyzer
    * ([[graft.text.Text.tokensSql]]: lowercase, split non-alphanumerics);
    * Locale.ROOT pins the casing (the q121 tr/az dotted-I note). */
  private def analyze(raw: String): Seq[String] =
    raw.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", " ")
      .trim.split(' ').filter(_.nonEmpty).toSeq

  // ---- parser (recursive descent over the raw string) ----------------

  final class ParseError(msg: String, pos: Int)
      extends IllegalArgumentException(s"query_string parse error at $pos: $msg")

  private final class P(val q: String, defaultAnd: Boolean) {
    var i = 0
    def eof: Boolean = i >= q.length
    def peek: Char = q(i)
    def ws(): Unit = while (!eof && q(i).isWhitespace) i += 1
    def fail(msg: String): Nothing = throw new ParseError(msg, i)

    /** Lookahead: does a keyword (AND/OR/NOT) start at the cursor, as a
      * standalone word? Uppercase only — `and` is a term. */
    def keyword(k: String): Boolean =
      q.startsWith(k, i) && {
        val j = i + k.length
        j >= q.length || q(j).isWhitespace || q(j) == '(' || q(j) == ')'
      }

    def expr(): Node = {
      val first = andExpr()
      var cs = List(first)
      var more = true
      while (more) {
        ws()
        if (eof || peek == ')') more = false
        else if (keyword("OR")) { i += 2; ws(); cs = andExpr() :: cs }
        // no operator: juxtaposition = the default operator; under
        // default AND the andExpr loop below already consumed it, so
        // reaching here with a clause ahead means default OR
        else if (!defaultAnd) cs = andExpr() :: cs
        else more = false
      }
      if (cs.lengthCompare(1) == 0) cs.head else Or(cs.reverse)
    }

    private def andExpr(): Node = {
      var cs = List(unary())
      var more = true
      while (more) {
        ws()
        if (!eof && keyword("AND")) { i += 3; cs = unary() :: cs }
        // default_operator=AND: juxtaposition binds at THIS level (the
        // precedence reading: `a b OR c` = (a AND b) OR c), so consume
        // any clause start that is not an explicit operator or a close
        else if (defaultAnd && !eof && peek != ')' && !keyword("OR"))
          cs = unary() :: cs
        else more = false
      }
      if (cs.lengthCompare(1) == 0) cs.head else And(cs.reverse)
    }

    private def unary(): Node = {
      ws()
      if (eof) fail("expected a clause")
      if (keyword("NOT")) { i += 3; Not(unary()) }
      else primary()
    }

    private def primary(): Node = {
      ws()
      if (eof) fail("expected a clause")
      val node =
        if (peek == '(') {
          i += 1
          val inner = expr()
          ws()
          if (eof || peek != ')') fail("unclosed group")
          i += 1
          inner
        } else {
          val field = fieldPrefix()
          atom(field)
        }
      boostSuffix(node)
    }

    /** `name:` ahead of an atom — a bare word followed by ':' (quoted
      * phrases keep their colons; a ':' inside a term is an analyzer
      * split, so only the FIRST word-colon pair is a field). */
    private def fieldPrefix(): Option[String] = {
      val start = i
      var j = i
      while (j < q.length && (q(j).isLetterOrDigit || q(j) == '_')) j += 1
      if (j > start && j < q.length && q(j) == ':') { i = j + 1; Some(q.substring(start, j).toLowerCase(java.util.Locale.ROOT)) }
      else None
    }

    private def atom(field: Option[String]): Node = {
      ws()
      if (eof) fail("expected a term after field")
      // `_exists_:<name>` — the pseudo-field form of the exists query
      if (field.contains("_exists_")) {
        val start = i
        while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
        if (i == start) fail("expected a field name after _exists_:")
        return ExistsQ(Some(
          q.substring(start, i).toLowerCase(java.util.Locale.ROOT)))
      }
      peek match {
        case '"' =>
          i += 1
          val end = q.indexOf('"', i)
          if (end < 0) fail("unclosed phrase")
          val terms = analyze(q.substring(i, end))
          i = end + 1
          if (terms.isEmpty) fail("empty phrase")
          // `"a b"~N` phrase proximity — ASCII digits required (a bare `~`
          // after a phrase is a parse error here; Lucene's bare-tilde
          // default is a FUZZY-term convention, not a slop), overflow is a
          // ParseError like every other malformed number in this grammar
          if (!eof && peek == '~') {
            i += 1
            val ds = i
            while (!eof && peek >= '0' && peek <= '9') i += 1
            if (i == ds) fail("expected a slop value after \"...\"~")
            val raw = q.substring(ds, i)
            PhraseQ(field, terms, scala.util.Try(raw.toInt)
              .getOrElse(fail(s"bad slop '$raw'")))
          } else PhraseQ(field, terms)
        case '/' =>
          // `/regex/` — read to the closing unescaped '/' (body may hold
          // any char; `\/` is a literal slash, other escapes pass through
          // to the regex engine untouched)
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (!closed && !eof) {
            if (peek == '\\' && i + 1 < q.length && q(i + 1) == '/') { sb.append('/'); i += 2 }
            else if (peek == '/') { closed = true; i += 1 }
            else { sb.append(peek); i += 1 }
          }
          if (!closed) fail("unclosed /regex/")
          if (sb.isEmpty) fail("empty /regex/")
          RegexQ(field, sb.toString)
        case '[' | '{' =>
          val loInc = peek == '['
          val close = q.indexWhere(c => c == ']' || c == '}', i)
          if (close < 0) fail("unclosed range")
          val hiInc = q(close) == ']'
          val body = q.substring(i + 1, close).trim
          i = close + 1
          body.split("\\s+TO\\s+") match {
            case Array(lo, hi) =>
              def bound(s: String): Option[Double] =
                if (s == "*") None
                else Some(scala.util.Try(s.toDouble)
                  .getOrElse(fail(s"non-numeric range bound '$s'")))
              RangeQ(field, bound(lo), bound(hi), loInc, hiInc)
            case _ => fail("range must be '<lo> TO <hi>'")
          }
        case _ =>
          val start = i
          while (!eof && !peek.isWhitespace && peek != '(' && peek != ')' && peek != '^')
            i += 1
          val raw = q.substring(start, i)
          if (raw.isEmpty) fail("expected a term")
          val tilde = raw.indexOf('~')
          if (tilde >= 0) {
            // the analyzer strips '~', so fuzziness must split first
            if (tilde == 0) fail("expected a term before ~")
            val dist =
              if (tilde == raw.length - 1) 2
              else scala.util.Try(raw.substring(tilde + 1).toInt)
                .getOrElse(fail(s"non-integer fuzziness '${raw.substring(tilde + 1)}'"))
            if (dist < 0 || dist > 2) fail(s"fuzziness $dist outside 0..2")
            analyze(raw.substring(0, tilde)) match {
              case Seq(t) => FuzzyQ(field, t, dist)
              case Seq()  => fail("empty fuzzy term")
              case _      => fail("fuzzy on a multi-token term")
            }
          } else if (raw == "*") {
            // Lucene: a bare `*` is match-all; `field:*` is the exists query
            ExistsQ(field)
          } else if (raw.endsWith("*") && raw.count(_ == '*') == 1 && !raw.contains('?')) {
            // pure trailing-star: the analyzed positional-prefix form
            // (q280's `re*` shape — kept distinct from the general
            // wildcard so multi-token sources like `data-vec*` still
            // compile to the positional run + prefix)
            analyze(raw.dropRight(1)) match {
              case Seq() => fail("empty wildcard term")
              case ts    => PrefixQ(field, ts.init, ts.last)
            }
          } else if (raw.exists(c => c == '*' || c == '?')) {
            // general wildcard (mid-term `t*e`, leading `*est`, `te?t`):
            // like Lucene, NOT analyzed — lowercased only, and the
            // pattern must be one analyzer-clean token (a '-' or '.' in
            // it would have split the indexed token it's matched against)
            val low = raw.toLowerCase(java.util.Locale.ROOT)
            if (!low.forall(c => c.isLetterOrDigit && c < 128 || c == '*' || c == '?'))
              fail(s"wildcard pattern '$raw' mixes analyzer-split characters")
            WildcardQ(field, low)
          } else if (raw.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)")) {
            NumTermQ(field, raw.toDouble, raw)
          } else analyze(raw) match {
            case Seq() => fail(s"term '$raw' analyzes to nothing")
            case ts    => TermQ(field, ts)
          }
      }
    }

    private def boostSuffix(n: Node): Node =
      if (!eof && peek == '^') {
        i += 1
        val start = i
        while (!eof && (peek.isDigit || peek == '.')) i += 1
        if (i == start) fail("expected a boost value after ^")
        val raw = q.substring(start, i)
        Boost(n, scala.util.Try(raw.toDouble)
          .getOrElse(fail(s"bad boost '$raw'")))
      } else n
  }

  /** Parse under ES `default_operator` semantics: OR (the ES default —
    * adjacent clauses without an operator combine as SHOULD) or AND
    * (`defaultAnd = true` — juxtaposition binds at the AND level, the
    * precedence reading of `default_operator: AND`). */
  def parse(q: String, defaultAnd: Boolean = false): Node = {
    val p = new P(q, defaultAnd)
    p.ws()
    if (p.eof) p.fail("empty query")
    val n = p.expr()
    p.ws()
    if (!p.eof) p.fail(s"unexpected '${p.peek}'")
    n
  }

  /** Rewrite field-less leaves to the ES multi-field expansion: each
    * bare atom becomes an OR over `defaults`, each arm boosted by its
    * field weight (the `fields: ["name^2", "type"]` request surface).
    * Under the constant-score model a bare term's contribution is the
    * SUM of its matched fields' weights — documented deviation from
    * ES's dis_max-with-tie-breaker combination, consistent with how
    * this compiler scores every other OR. Single unweighted default ==
    * identity (q280's plan is unchanged). */
  private[queries] def expandDefaults(n: Node, defaults: Seq[(String, Double)]): Node = {
    def orOf(mk: String => Node): Node = {
      val arms = defaults.map { case (f, w) =>
        if (w == 1.0) mk(f) else Boost(mk(f), w) }
      if (arms.lengthCompare(1) == 0) arms.head else Or(arms)
    }
    n match {
      case Or(cs)        => Or(cs.map(expandDefaults(_, defaults)))
      case And(cs)       => And(cs.map(expandDefaults(_, defaults)))
      case Not(c)        => Not(expandDefaults(c, defaults))
      case Boost(c, b)   => Boost(expandDefaults(c, defaults), b)
      case l @ TermQ(None, _)      => orOf(f => l.copy(field = Some(f)))
      case l @ NumTermQ(None, _, _) => orOf(f => l.copy(field = Some(f)))
      case l @ PhraseQ(None, _, _) => orOf(f => l.copy(field = Some(f)))
      case l @ PrefixQ(None, _, _) => orOf(f => l.copy(field = Some(f)))
      case l @ RangeQ(None, _, _, _, _) => orOf(f => l.copy(field = Some(f)))
      case l @ FuzzyQ(None, _, _) => orOf(f => l.copy(field = Some(f)))
      case l @ WildcardQ(None, _) => orOf(f => l.copy(field = Some(f)))
      case l @ RegexQ(None, _)    => orOf(f => l.copy(field = Some(f)))
      // ExistsQ(None) is the bare `*` = match-all — never field-expanded
      // (Lucene's own rewrite); ExistsQ(Some(_)) is already fielded
      case leaf => leaf
    }
  }

  /** Multi-field compile: bare atoms search every listed default field
    * with its weight (see [[expandDefaults]]). */
  def compileFields(n: Node, fields: Map[String, FieldRef],
                    defaults: Seq[(String, Double)]): (Column, Column) =
    compile(expandDefaults(n, defaults), fields,
      defaultField = defaults.head._1)

  // ---- compiler -------------------------------------------------------

  /** Compile to `(predicate, score)` Columns over `fields`. The predicate
    * is the filter; the score is meaningful on matching rows (ES computes
    * scores on hits — on non-matching rows it is whatever the partial
    * sums yield and must not be read). */
  def compile(n: Node, fields: Map[String, FieldRef], defaultField: String)
      : (Column, Column) = {
    def ref(f: Option[String]): FieldRef = {
      val name = f.getOrElse(defaultField)
      fields.getOrElse(name,
        throw new IllegalArgumentException(s"query_string: unknown field '$name'"))
    }
    def tokensOf(f: Option[String], what: String): Column = ref(f) match {
      case TokenField(ws) => ws
      case NumField(_) => throw new IllegalArgumentException(
        s"query_string: $what needs an analyzed field, '${f.getOrElse(defaultField)}' is numeric")
    }
    def run(ws: Column, terms: Seq[String]): Column =
      if (terms.lengthCompare(1) == 0) array_contains(ws, terms.head)
      else SimpleQueryString.positionalRun(ws, terms.map(t => (c: Column) => c === t))
    // 0-based positions of `t` in the token array — one in-row pass, the
    // building block of the sloppy-phrase predicates (all arithmetic stays
    // inside the row; no posting join, the q280 scan-filter posture)
    def positionsOf(ws: Column, t: String): Column =
      filter(transform(ws, (w, i) => when(w === t, i).otherwise(-1)), p => p >= 0)
    def sloppy(ws: Column, terms: Seq[String], slop: Int): Column =
      if (terms.lengthCompare(2) == 0) {
        // full two-term ES law (the q97 kernel): in-order gap <= slop, or
        // reversed with transposition cost (pos_a - pos_b + 1) <= slop
        exists(positionsOf(ws, terms(0)), a =>
          exists(positionsOf(ws, terms(1)), b =>
            (b > a && b - a - 1 <= slop) || (b < a && a - b + 1 <= slop)))
      } else {
        // 3+ terms: the documented in-order reduction — strictly
        // increasing positions, total inserted gap <= slop
        val n = terms.length
        def nest(k: Int, prev: Column, first: Column): Column =
          exists(positionsOf(ws, terms(k)), p =>
            p > prev && (if (k == n - 1) p - first - (n - 1) <= slop
                         else nest(k + 1, p, first)))
        exists(positionsOf(ws, terms.head), p1 => nest(1, p1, p1))
      }

    def go(n: Node): (Column, Column) = n match {
      case TermQ(f, ts) => ref(f) match {
        case TokenField(ws) => leaf(run(ws, ts))
        case NumField(_) =>
          // numeric-looking raw terms arrive as NumTermQ with the true
          // pre-analysis value; a TermQ here means the raw text did NOT
          // round-trip as a number (`size:abc`, `size:3,5`) — error, never
          // a silently-concatenated analyzed form (r18 ADVICE)
          throw new IllegalArgumentException(
            s"query_string: non-numeric term '${ts.mkString(" ")}' on numeric field")
      }
      case NumTermQ(f, v, raw) => ref(f) match {
        case NumField(c)    => leaf(c === v)
        case TokenField(ws) => leaf(run(ws, analyze(raw)))
      }
      case PhraseQ(f, ts, slop) =>
        val ws = tokensOf(f, "a phrase")
        leaf(if (slop == 0 || ts.lengthCompare(1) == 0) run(ws, ts)
             else sloppy(ws, ts, slop))
      case WildcardQ(f, pat) =>
        leaf(exists(tokensOf(f, "a wildcard"),
          w => w.like(Search.wildcardToLike(pat))))
      case RegexQ(f, pat) =>
        // Lucene regex terms are implicitly anchored — full-token match
        leaf(exists(tokensOf(f, "a regex"),
          w => w.rlike("^(?:" + pat + ")$")))
      case ExistsQ(None) => leaf(lit(true))   // bare `*` = match-all
      case ExistsQ(Some(f)) => ref(Some(f)) match {
        case NumField(c)    => leaf(c.isNotNull)
        case TokenField(ws) =>
          // a null/analyzes-to-nothing value indexes no tokens => the
          // field does not exist (leaf() null-safety makes NOT _exists_
          // TRUE on a null field instead of null-filtering it)
          leaf(size(ws) > 0)
      }
      case FuzzyQ(f, t, dist) =>
        // dist 0 is exact; otherwise a per-token edit-distance scan —
        // levenshtein is codegen'd, the exists stays a scan-side filter
        leaf(if (dist == 0) array_contains(tokensOf(f, "a fuzzy term"), t)
             else exists(tokensOf(f, "a fuzzy term"),
               w => levenshtein(w, lit(t)) <= dist))
      case PrefixQ(f, r, p) =>
        val ws = tokensOf(f, "a wildcard")
        leaf(if (r.isEmpty) exists(ws, _.startsWith(p))
             else SimpleQueryString.positionalRun(ws,
               r.map(t => (c: Column) => c === t) :+ ((c: Column) => c.startsWith(p))))
      case RangeQ(f, lo, hi, loInc, hiInc) => ref(f) match {
        case NumField(c) =>
          val bounds =
            lo.map(v => if (loInc) c >= v else c > v).toSeq ++
            hi.map(v => if (hiInc) c <= v else c < v).toSeq
          leaf(bounds.reduceOption(_ && _).getOrElse(lit(true)))
        case TokenField(_) => throw new IllegalArgumentException(
          "query_string: ranges are numeric-only (see scaladoc)")
      }
      case Not(c)      => val (p, _) = go(c); (!p, lit(0.0))
      case Boost(c, b) => val (p, s) = go(c); (p, s * b)
      case And(cs) =>
        val gs = cs.map(go)
        (gs.map(_._1).reduce(_ && _), gs.map(_._2).reduce(_ + _))
      case Or(cs) =>
        val gs = cs.map(go)
        (gs.map(_._1).reduce(_ || _), gs.map(_._2).reduce(_ + _))
    }
    // Every leaf is null-safe: a null field (or a predicate over it)
    // yields FALSE, not null — so `NOT <leaf>` matches rows whose field
    // is missing (the ES must_not-over-missing-field semantics) instead
    // of null-filtering them. One wrapper here covers all leaf types
    // uniformly (the r20 review found ExistsQ null-safe but the new
    // wildcard/regex/slop leaves — and the older term/prefix/fuzzy ones —
    // null-hostile under NOT).
    def leaf(p: Column): (Column, Column) = {
      val safe = coalesce(p, lit(false))
      (safe, when(safe, 1.0).otherwise(0.0))
    }
    go(n)
  }
}

package graft.queries

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** Differential fuzz for the query_string parser + compiler: a seeded
  * generator emits random query STRINGS together with an INDEPENDENT
  * evaluation (predicate + score per row, computed directly over Scala
  * token sequences while generating — no parser, no AST, no Catalyst),
  * and every query must agree with the compiled Columns row-for-row.
  * A divergence means the parser, the compiler, or the generator's
  * reading of the grammar drifted — any of which is a real bug, since
  * the two sides implement the documented semantics independently. */
@graft.tags.Slow
class QsFuzzSpec extends GraftSuite {

  private val vocab = Vector("data", "stream", "fast", "bolt", "red", "gear",
    "widget", "blue", "spark", "row")

  private case class Doc(id: Long, ws: Vector[String], size: Int)

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(1234)
    Vector.tabulate(24) { i =>
      // every 11th doc analyzes to NOTHING — the _exists_ leaves must see
      // both verdicts (and NOT _exists_ must not null-filter)
      val ws = if (i % 11 == 10) Vector.empty[String]
               else Vector.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      Doc(i.toLong, ws, rnd.nextInt(60))
    }
  }

  /** Independent wildcard evaluation: translate to an anchored regex
    * (`*` -> `.*`, `?` -> `.`; vocab chars are alnum, no escaping needed)
    * — must agree with the compiled per-token LIKE. */
  private def wildcardHit(ws: Vector[String], pat: String): Boolean = {
    val rx = pat.flatMap { case '*' => ".*"; case '?' => "."; case c => c.toString }
    ws.exists(_.matches(rx))
  }

  /** Independent two-term slop evaluation (the q97 ES law). */
  private def slop2(ws: Vector[String], a: String, b: String, s: Int): Boolean = {
    val pa = ws.indices.filter(ws(_) == a); val pb = ws.indices.filter(ws(_) == b)
    pa.exists(x => pb.exists(y =>
      (y > x && y - x - 1 <= s) || (y < x && x - y + 1 <= s)))
  }

  /** Independent 3-term in-order slop evaluation (the documented N>=3
    * reduction: strictly increasing positions, total gap <= slop). */
  private def slop3(ws: Vector[String], ts: Seq[String], s: Int): Boolean = {
    val ps = ts.map(t => ws.indices.filter(ws(_) == t))
    ps(0).exists(p1 => ps(1).exists(p2 => p2 > p1 && ps(2).exists(p3 =>
      p3 > p2 && p3 - p1 - 2 <= s)))
  }

  /** A generated node: its rendered query text plus its own evaluation. */
  private case class G(text: String, pred: Doc => Boolean, score: Doc => Double)

  /** Independent Levenshtein (classic DP) — must agree with Spark's. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def leaf(rnd: scala.util.Random): G = rnd.nextInt(12) match {
    case 7 => // general wildcard: ? substitution / leading or mid *
      val w = vocab(rnd.nextInt(vocab.size))
      val pat = rnd.nextInt(3) match {
        case 0 => val j = rnd.nextInt(w.length); w.updated(j, '?')   // te?t
        case 1 => "*" + w.drop(1 + rnd.nextInt(w.length - 1))        // *est
        case _ => val j = 1 + rnd.nextInt(w.length - 1)              // t*t
          w.take(j) + "*" + w.drop(math.min(w.length, j + 1 + rnd.nextInt(2)))
      }
      G(pat, d => wildcardHit(d.ws, pat),
        d => if (wildcardHit(d.ws, pat)) 1.0 else 0.0)
    case 8 => // regex: alternation of two vocab words, or dot/star mutants
      val w = vocab(rnd.nextInt(vocab.size))
      val pat = rnd.nextInt(3) match {
        case 0 => s"($w|${vocab(rnd.nextInt(vocab.size))})"
        case 1 => w.updated(rnd.nextInt(w.length), '.')
        case _ => w.take(1 + rnd.nextInt(w.length)) + ".*"
      }
      def hit(d: Doc) = d.ws.exists(_.matches(pat))
      G(s"/$pat/", hit, d => if (hit(d)) 1.0 else 0.0)
    case 9 => // phrase slop: two- or three-term, slop 0..3
      val s = rnd.nextInt(4)
      if (rnd.nextBoolean()) {
        val a = vocab(rnd.nextInt(vocab.size)); val b = vocab(rnd.nextInt(vocab.size))
        G(s""""$a $b"~$s""", d => slop2(d.ws, a, b, s),
          d => if (slop2(d.ws, a, b, s)) 1.0 else 0.0)
      } else {
        val ts = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
        G(s""""${ts.mkString(" ")}"~$s""", d => slop3(d.ws, ts, s),
          d => if (slop3(d.ws, ts, s)) 1.0 else 0.0)
      }
    case 10 => // exists: pseudo-field, field:*, bare * (match-all)
      rnd.nextInt(3) match {
        case 0 => G("_exists_:name", d => d.ws.nonEmpty,
                    d => if (d.ws.nonEmpty) 1.0 else 0.0)
        case 1 => G("name:*", d => d.ws.nonEmpty,
                    d => if (d.ws.nonEmpty) 1.0 else 0.0)
        case _ => G("*", _ => true, _ => 1.0)
      }
    case 11 => // numeric raw forms the r19 grammar accepts: .5 / 3. / +5
      val base = rnd.nextInt(60)
      val (txt, v) = rnd.nextInt(3) match {
        case 0 => (s".${base % 10}", (base % 10) / 10.0)
        case 1 => (s"$base.", base.toDouble)
        case _ => (s"+$base", base.toDouble)
      }
      G(s"size:$txt", d => d.size.toDouble == v,
        d => if (d.size.toDouble == v) 1.0 else 0.0)
    case other => leafCore(rnd, other)
  }

  private def leafCore(rnd: scala.util.Random, pick: Int): G = pick match {
    case 0 => // bare term (default field = ws)
      val t = vocab(rnd.nextInt(vocab.size))
      G(t, d => d.ws.contains(t), d => if (d.ws.contains(t)) 1.0 else 0.0)
    case 1 => // fielded term
      val t = vocab(rnd.nextInt(vocab.size))
      G(s"name:$t", d => d.ws.contains(t), d => if (d.ws.contains(t)) 1.0 else 0.0)
    case 2 => // phrase of 2 (positional)
      val a = vocab(rnd.nextInt(vocab.size)); val b = vocab(rnd.nextInt(vocab.size))
      def hit(d: Doc) = d.ws.indices.dropRight(1).exists(i => d.ws(i) == a && d.ws(i + 1) == b)
      G(s""""$a $b"""", hit, d => if (hit(d)) 1.0 else 0.0)
    case 3 => // prefix wildcard
      val p = vocab(rnd.nextInt(vocab.size)).take(1 + rnd.nextInt(3))
      def hit(d: Doc) = d.ws.exists(_.startsWith(p))
      G(s"$p*", hit, d => if (hit(d)) 1.0 else 0.0)
    case 4 => // numeric range, any bracket mix, maybe open
      val lo = rnd.nextInt(50); val hi = lo + rnd.nextInt(20)
      val loInc = rnd.nextBoolean(); val hiInc = rnd.nextBoolean()
      val loS = if (rnd.nextInt(5) == 0) "*" else lo.toString
      val hiS = if (rnd.nextInt(5) == 0) "*" else hi.toString
      def hit(d: Doc) = {
        val okLo = loS == "*" || (if (loInc) d.size >= lo else d.size > lo)
        val okHi = hiS == "*" || (if (hiInc) d.size <= hi else d.size < hi)
        okLo && okHi
      }
      G(s"size:${if (loInc) "[" else "{"}$loS TO $hiS${if (hiInc) "]" else "}"}",
        hit, d => if (hit(d)) 1.0 else 0.0)
    case 5 => // numeric equality — integer, decimal, and negative raw forms
      // (r18 ADVICE: the generator only emitted integers, which is what
      // let the analyzed-concat mangle of `3.5`/`-5` survive the fuzz)
      val base = rnd.nextInt(60)
      val (txt, v) = rnd.nextInt(3) match {
        case 0 => (base.toString, base.toDouble)
        case 1 => (s"$base.5", base + 0.5)          // never equals an Int size
        case _ => (s"-${base + 1}", -(base + 1.0))  // base+1 avoids the -0.0 corner
      }
      G(s"size:$txt", d => d.size.toDouble == v,
        d => if (d.size.toDouble == v) 1.0 else 0.0)
    case _ => // fuzzy term, distance 1 or 2 (independent DP on this side)
      val t = vocab(rnd.nextInt(vocab.size))
      val n = 1 + rnd.nextInt(2)
      def hit(d: Doc) = d.ws.exists(w => lev(w, t) <= n)
      G(s"$t~$n", hit, d => if (hit(d)) 1.0 else 0.0)
  }

  /** Random expression of bounded depth; renders with explicit parens
    * around every composite EXCEPT the top-level chain forms below, so
    * the precedence test cases stay in [[precedenceChains]]. */
  private def gen(rnd: scala.util.Random, depth: Int): G = {
    if (depth == 0 || rnd.nextInt(3) == 0) {
      val g = leaf(rnd)
      if (rnd.nextInt(4) == 0) {
        val b = (1 + rnd.nextInt(8)) / 2.0 // .5 steps — exact doubles
        G(s"${g.text}^$b", g.pred, d => g.score(d) * b)
      } else g
    } else rnd.nextInt(4) match {
      case 0 =>
        val a = gen(rnd, depth - 1); val b = gen(rnd, depth - 1)
        G(s"(${a.text} AND ${b.text})",
          d => a.pred(d) && b.pred(d), d => a.score(d) + b.score(d))
      case 1 =>
        val a = gen(rnd, depth - 1); val b = gen(rnd, depth - 1)
        G(s"(${a.text} OR ${b.text})",
          d => a.pred(d) || b.pred(d), d => a.score(d) + b.score(d))
      case 2 =>
        val a = gen(rnd, depth - 1); val b = gen(rnd, depth - 1)
        // juxtaposition = default OR
        G(s"(${a.text} ${b.text})",
          d => a.pred(d) || b.pred(d), d => a.score(d) + b.score(d))
      case _ =>
        val a = gen(rnd, depth - 1)
        G(s"(NOT ${a.text})", d => !a.pred(d), _ => 0.0)
    }
  }

  /** Unparenthesized operator chains — the precedence surface the
    * parenthesizing generator above deliberately avoids. */
  private def precedenceChains(rnd: scala.util.Random): G = {
    val a = leaf(rnd); val b = leaf(rnd); val c = leaf(rnd)
    rnd.nextInt(4) match {
      case 0 => // a OR b AND c = a OR (b AND c)
        G(s"${a.text} OR ${b.text} AND ${c.text}",
          d => a.pred(d) || (b.pred(d) && c.pred(d)),
          d => a.score(d) + b.score(d) + c.score(d))
      case 1 => // NOT binds tighter than AND
        G(s"NOT ${a.text} AND ${b.text}",
          d => !a.pred(d) && b.pred(d), d => b.score(d))
      case 2 => // juxtaposition = OR at the outer level
        G(s"${a.text} ${b.text} AND ${c.text}",
          d => a.pred(d) || (b.pred(d) && c.pred(d)),
          d => a.score(d) + b.score(d) + c.score(d))
      case _ => // chain of three ANDs
        G(s"${a.text} AND ${b.text} AND ${c.text}",
          d => a.pred(d) && b.pred(d) && c.pred(d),
          d => a.score(d) + b.score(d) + c.score(d))
    }
  }

  test("default_operator=AND: 100 random queries against the independent evaluator") {
    import spark.implicits._
    val df = docs.map(d => (d.id, d.ws, d.size)).toDF("doc_id", "ws", "size").cache()
    val fields = Map[String, QueryString.FieldRef](
      "name" -> QueryString.TokenField(col("ws")),
      "size" -> QueryString.NumField(col("size")))
    val rnd = new scala.util.Random(4242)
    // under default AND, juxtaposition inside the parenthesizing
    // generator's `(a b)` form is conjunctive; the chain cases cover the
    // unparenthesized precedence (`a b OR c` = (a AND b) OR c)
    def genAnd(depth: Int): G =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf(rnd)
      else rnd.nextInt(3) match {
        case 0 =>
          val a = genAnd(depth - 1); val b = genAnd(depth - 1)
          G(s"(${a.text} ${b.text})", d => a.pred(d) && b.pred(d),
            d => a.score(d) + b.score(d))
        case 1 =>
          val a = genAnd(depth - 1); val b = genAnd(depth - 1)
          G(s"(${a.text} OR ${b.text})", d => a.pred(d) || b.pred(d),
            d => a.score(d) + b.score(d))
        case _ =>
          val a = genAnd(depth - 1)
          G(s"(NOT ${a.text})", d => !a.pred(d), _ => 0.0)
      }
    def chainAnd(): G = {
      val a = leaf(rnd); val b = leaf(rnd); val c = leaf(rnd)
      if (rnd.nextBoolean())
        G(s"${a.text} ${b.text} OR ${c.text}",
          d => (a.pred(d) && b.pred(d)) || c.pred(d),
          d => a.score(d) + b.score(d) + c.score(d))
      else
        G(s"${a.text} NOT ${b.text} ${c.text}",
          d => a.pred(d) && !b.pred(d) && c.pred(d),
          d => a.score(d) + c.score(d))
    }
    (1 to 100).foreach { i =>
      val g = if (i % 4 == 0) chainAnd() else genAnd(3)
      val (p, s) = QueryString.compile(
        QueryString.parse(g.text, defaultAnd = true), fields, "name")
      val got = df.select(col("doc_id"), p.as("p"), round(s, 6).as("s"))
        .as[(Long, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      docs.foreach { d =>
        val (gp, gs) = got(d.id)
        assert(gp === g.pred(d), s"AND-mode query <${g.text}> doc ${d.id}: predicate")
        if (gp) assert(gs === g.score(d), s"AND-mode query <${g.text}> doc ${d.id}: score")
      }
    }
    df.unpersist()
    ()
  }

  test("compileFields: 100 random queries against a two-field independent evaluator") {
    import spark.implicits._
    // two analyzed fields with weights name^2 / type^1 (q283's request
    // shape): a bare atom matches EITHER field and scores the SUM of its
    // matched fields' weights (the documented sum-combination); fielded
    // numeric atoms stay fielded. The independent side evaluates the
    // expansion law directly — no parser, no AST.
    case class Doc2(id: Long, name: Vector[String], tpe: Vector[String], size: Int)
    val rnd0 = new scala.util.Random(283)
    val docs2 = Vector.tabulate(24) { i =>
      Doc2(i.toLong,
        Vector.fill(1 + rnd0.nextInt(4))(vocab(rnd0.nextInt(vocab.size))),
        Vector.fill(1 + rnd0.nextInt(3))(vocab(rnd0.nextInt(vocab.size))),
        rnd0.nextInt(60))
    }
    val df = docs2.map(d => (d.id, d.name, d.tpe, d.size))
      .toDF("doc_id", "name_ws", "type_ws", "size").cache()
    val fields = Map[String, QueryString.FieldRef](
      "name" -> QueryString.TokenField(col("name_ws")),
      "type" -> QueryString.TokenField(col("type_ws")),
      "size" -> QueryString.NumField(col("size")))
    val weights = Seq("name" -> 2.0, "type" -> 1.0)
    case class G2(text: String, pred: Doc2 => Boolean, score: Doc2 => Double)
    val rnd = new scala.util.Random(8317)
    def bareLeaf(): G2 = rnd.nextInt(7) match {
      case 4 => // bare general wildcard -> OR over both fields, weighted
        val w = vocab(rnd.nextInt(vocab.size))
        val pat = if (rnd.nextBoolean()) w.updated(rnd.nextInt(w.length), '?')
                  else "*" + w.drop(1 + rnd.nextInt(w.length - 1))
        def s(d: Doc2) = (if (wildcardHit(d.name, pat)) 2.0 else 0.0) +
                         (if (wildcardHit(d.tpe, pat)) 1.0 else 0.0)
        G2(pat, d => s(d) > 0, s)
      case 5 => // bare regex -> OR over both fields, weighted
        val a = vocab(rnd.nextInt(vocab.size)); val b = vocab(rnd.nextInt(vocab.size))
        val pat = s"($a|$b)"
        def s(d: Doc2) = (if (d.name.exists(_.matches(pat))) 2.0 else 0.0) +
                         (if (d.tpe.exists(_.matches(pat))) 1.0 else 0.0)
        G2(s"/$pat/", d => s(d) > 0, s)
      case 6 => // fielded exists / slop phrase — never expanded / expanded resp.
        if (rnd.nextBoolean())
          G2("_exists_:type", d => d.tpe.nonEmpty,
             d => if (d.tpe.nonEmpty) 1.0 else 0.0)
        else {
          val a = vocab(rnd.nextInt(vocab.size)); val b = vocab(rnd.nextInt(vocab.size))
          val sl = rnd.nextInt(3)
          def s(d: Doc2) = (if (slop2(d.name, a, b, sl)) 2.0 else 0.0) +
                           (if (slop2(d.tpe, a, b, sl)) 1.0 else 0.0)
          G2(s""""$a $b"~$sl""", d => s(d) > 0, s)
        }
      case pick => bareLeafCore(pick)
    }
    def bareLeafCore(pick: Int): G2 = pick match {
      case 0 => // bare term -> OR over both fields, weighted sum score
        val t = vocab(rnd.nextInt(vocab.size))
        def s(d: Doc2) = (if (d.name.contains(t)) 2.0 else 0.0) +
                         (if (d.tpe.contains(t)) 1.0 else 0.0)
        G2(t, d => s(d) > 0, s)
      case 1 => // bare phrase of 2 (positional in either field)
        val a = vocab(rnd.nextInt(vocab.size)); val b = vocab(rnd.nextInt(vocab.size))
        def run(ws: Vector[String]) =
          ws.indices.dropRight(1).exists(i => ws(i) == a && ws(i + 1) == b)
        def s(d: Doc2) = (if (run(d.name)) 2.0 else 0.0) + (if (run(d.tpe)) 1.0 else 0.0)
        G2(s""""$a $b"""", d => s(d) > 0, s)
      case 2 => // bare prefix
        val p = vocab(rnd.nextInt(vocab.size)).take(1 + rnd.nextInt(3))
        def s(d: Doc2) = (if (d.name.exists(_.startsWith(p))) 2.0 else 0.0) +
                         (if (d.tpe.exists(_.startsWith(p))) 1.0 else 0.0)
        G2(s"$p*", d => s(d) > 0, s)
      case _ => // fielded numeric equality or range — never expanded
        if (rnd.nextBoolean()) {
          val v = rnd.nextInt(60)
          G2(s"size:$v", d => d.size == v, d => if (d.size == v) 1.0 else 0.0)
        } else {
          val lo = rnd.nextInt(50); val hi = lo + rnd.nextInt(20)
          def hit(d: Doc2) = d.size >= lo && d.size <= hi
          G2(s"size:[$lo TO $hi]", hit, d => if (hit(d)) 1.0 else 0.0)
        }
    }
    def gen2(depth: Int): G2 =
      if (depth == 0 || rnd.nextInt(3) == 0) {
        val g = bareLeaf()
        if (rnd.nextInt(4) == 0) {
          val b = (1 + rnd.nextInt(8)) / 2.0
          G2(s"${g.text}^$b", g.pred, d => g.score(d) * b)
        } else g
      } else rnd.nextInt(3) match {
        case 0 =>
          val a = gen2(depth - 1); val b = gen2(depth - 1)
          G2(s"(${a.text} AND ${b.text})", d => a.pred(d) && b.pred(d),
            d => a.score(d) + b.score(d))
        case 1 =>
          val a = gen2(depth - 1); val b = gen2(depth - 1)
          G2(s"(${a.text} OR ${b.text})", d => a.pred(d) || b.pred(d),
            d => a.score(d) + b.score(d))
        case _ =>
          val a = gen2(depth - 1)
          G2(s"(NOT ${a.text})", d => !a.pred(d), _ => 0.0)
      }
    (1 to 100).foreach { _ =>
      val g = gen2(3)
      val (p, s) = QueryString.compileFields(
        QueryString.parse(g.text), fields, weights)
      val got = df.select(col("doc_id"), p.as("p"), round(s, 6).as("s"))
        .as[(Long, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      docs2.foreach { d =>
        val (gp, gs) = got(d.id)
        assert(gp === g.pred(d), s"fields query <${g.text}> doc ${d.id}: predicate")
        if (gp) assert(gs === g.score(d), s"fields query <${g.text}> doc ${d.id}: score")
      }
    }
    df.unpersist()
    ()
  }

  test("200 random queries: compiled predicate + score == independent evaluator") {
    import spark.implicits._
    val df = docs.map(d => (d.id, d.ws, d.size)).toDF("doc_id", "ws", "size").cache()
    val fields = Map[String, QueryString.FieldRef](
      "name" -> QueryString.TokenField(col("ws")),
      "size" -> QueryString.NumField(col("size")))
    val rnd = new scala.util.Random(99)
    (1 to 200).foreach { i =>
      val g = if (i % 4 == 0) precedenceChains(rnd) else gen(rnd, 3)
      val (p, s) = QueryString.compile(QueryString.parse(g.text), fields, "name")
      val got = df.select(col("doc_id"), p.as("p"), round(s, 6).as("s"))
        .as[(Long, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      docs.foreach { d =>
        val (gp, gs) = got(d.id)
        assert(gp === g.pred(d), s"query <${g.text}> doc ${d.id} (${d.ws}, ${d.size}): predicate")
        if (gp) // scores are defined on matching rows (ES computes scores on hits)
          assert(gs === g.score(d), s"query <${g.text}> doc ${d.id}: score $gs != ${g.score(d)}")
      }
    }
    df.unpersist()
    ()
  }
}

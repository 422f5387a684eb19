package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The RFC 9309 robots.txt engine (q222) pinned Spark-free: parser/group
  * selection, the wildcard matcher cross-checked against an independent
  * regex-built reference under fuzz, longest-match arbitration with
  * Allow tie-breaks, and the fabricated-host decisions replayed brute
  * force.
  */
class RobotsSpec extends AnyFunSuite {

  test("parsing: comments, mixed-case fields, unknown fields keep the group open") {
    val groups = Robots.parse(Robots.fabricate(1))
    assert(groups.size == 2)
    assert(groups.head.agents == Seq("*") && groups.head.rules == Seq(Robots.Rule(false, "/")))
    val bot = groups(1)
    assert(bot.agents == Seq("graftbot"))
    // Crawl-delay between rules must not split the group; DisAllow casing folds
    assert(bot.rules == Seq(
      Robots.Rule(true, "/docs/*/page$"),
      Robots.Rule(false, "/docs/*1/page$"),
      Robots.Rule(false, "/docs/*3/page$"),
      Robots.Rule(false, "/docs/")))
  }

  test("group selection: specific agent beats *, absent bot falls back to *") {
    val txt = "User-agent: a\nUser-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nDisallow: /"
    assert(Robots.rulesFor(Robots.parse(txt), "graftbot/1.0") == Seq(Robots.Rule(false, "/x")))
    assert(Robots.rulesFor(Robots.parse(txt), "otherbot") == Seq(Robots.Rule(false, "/")))
  }

  test("matcher agrees with an independent regex reference (fuzz)") {
    def ref(pattern: String, path: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val p = if (anchored) pattern.dropRight(1) else pattern
      val rx = "^" + p.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString("(?s).*") + (if (anchored) "$" else "(?s).*")
      path.matches(rx)
    }
    val rnd = new scala.util.Random(222)
    val alphabet = "ab/*1"
    for (trial <- 0 until 4000) {
      val pat = "/" + Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.length))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + Seq.fill(rnd.nextInt(10))("ab/1".charAt(rnd.nextInt(4))).mkString
      assert(Robots.matches(pat, path) == ref(pat, path),
        s"trial $trial: pattern '$pat' vs path '$path'")
    }
    // anchored first-segment must not float: '/a$' matches only '/a'
    assert(Robots.matches("/a$", "/a") && !Robots.matches("/a$", "/x/a"))
  }

  test("arbitration: longest pattern wins, Allow wins length ties, no match allows") {
    val rules = Seq(
      Robots.Rule(false, "/p"), Robots.Rule(true, "/p/q"), Robots.Rule(false, "/p/x"))
    assert(Robots.decide(rules, "/p/q/r") == ((true, "/p/q")))
    assert(Robots.decide(rules, "/p/x/r") == ((false, "/p/x")))
    assert(Robots.decide(rules, "/other") == ((true, "-")))
    // equal length: allow beats disallow
    val tie = Seq(Robots.Rule(false, "/ab"), Robots.Rule(true, "/ab"))
    assert(Robots.decide(tie, "/abc")._1)
  }

  test("sitemap discovery: footer + mid-group lines, case-insensitive field, canonical") {
    // even host: the mid-group mixed-case obfuscated line AND the footer line
    val even = Robots.sitemaps(Robots.fabricate(2)).map(Urls.canonicalize)
    assert(even.sorted == Seq(
      "https://www.site2.com/sitemap-extra.xml", "https://www.site2.com/sitemap.xml"))
    // odd host: footer line only; the extra Disallows must not leak in
    val odd = Robots.sitemaps(Robots.fabricate(1))
    assert(odd == Seq("https://www.site1.com/sitemap.xml"))
    // the mid-group line must not have ended the graftbot group (q222's
    // skipped-field hazard): the group still carries its Disallow tail
    val rules = Robots.rulesFor(Robots.parse(Robots.fabricate(2)), Robots.crawlerUa)
    assert(rules.exists(r => !r.allow && r.pattern == "/docs/"),
      s"mid-group Sitemap line ended the group: $rules")
  }

  test("fabricated hosts: decisions match the oracle formula brute force") {
    for (id <- 0L until 400L) {
      val g = id / 4
      val host = g % 5
      val rules = Robots.rulesFor(Robots.parse(Robots.fabricate(host)), Robots.crawlerUa)
      val path = Robots.pathOf(Urls.canonicalize(Urls.fabricate(id)))
      assert(path == s"/docs/$g/page")
      val (allowed, rule) = Robots.decide(rules, path)
      val expectBlocked = host % 2 == 1 && (g % 10 == 1 || g % 10 == 3)
      assert(allowed == !expectBlocked, s"id=$id g=$g host=$host")
      val expectRule =
        if (expectBlocked) s"/docs/*${g % 10}/page$$" else "/docs/*/page$"
      assert(rule == expectRule, s"id=$id rule=$rule")
    }
  }
}

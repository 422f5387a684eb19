package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Sitemap.XmlMini

/** Randomized hardening for the q228 XML kernel beyond SitemapSpec's
  * fixture pins: entity round-trips over arbitrary BMP text, protocol
  * round-trips over arbitrary group sets, and agreement with the JDK DOM
  * parser on randomized text content — a decode bug that happens to
  * cancel on the deterministic fabrication cannot hide from the
  * generators. */
class SitemapPropertySpec extends AnyFunSuite {

  private def run(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  // printable BMP text without surrogates (toChar decode is BMP-scoped by
  // design — sitemap locs are ASCII URLs in practice); markup chars appear
  // often enough that every escape path is exercised
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '/', '?', '=', ':', '.', '-', '_', '~', '%'),
      1 -> Gen.oneOf('&', '<', '>', '"', '\''),
      1 -> Gen.choose(0xA0.toChar, 0x2FF.toChar)
    )).map(_.mkString)

  private def encode(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c if c >= 0x7f => s"&#${c.toInt};"
      case c => c.toString
    }

  test("decodeEntities inverts the escape encoder on arbitrary BMP text") {
    run(Prop.forAll(textGen)(s => XmlMini.decodeEntities(encode(s)) == s))
  }

  test("parsed text content agrees with the JDK DOM parser on random text") {
    import javax.xml.parsers.DocumentBuilderFactory
    val db = DocumentBuilderFactory.newInstance().newDocumentBuilder()
    run(Prop.forAll(textGen) { s =>
      val xml = s"<r><v>${encode(s)}</v></r>"
      val ours = XmlMini.parse(xml).children.head.text
      val dom = db.parse(new java.io.ByteArrayInputStream(
        xml.getBytes("UTF-8"))).getDocumentElement
        .getElementsByTagName("v").item(0).getTextContent
      ours == dom && ours == s
    })
  }

  test("fabricate/read round-trips arbitrary group sets through the index layer") {
    val groupsGen = Gen.listOf(Gen.choose(0L, 5000L)).map(_.distinct)
    run(Prop.forAll(groupsGen, Gen.choose(0L, 4L)) { (gs, h) =>
      val (index, parts) = Sitemap.fabricateHost(h, gs)
      val got = Sitemap.readSitemap(index, parts)
      got.map(u => Urls.canonicalize(u.loc)).sorted ==
        gs.map(Sitemap.canonicalOf).sorted &&
        got.forall(u => u.priority.startsWith("0.") && u.lastmod.length == 10)
    }, n = 50)
  }
}

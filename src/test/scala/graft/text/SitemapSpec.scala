package graft.text

import org.scalatest.funsuite.AnyFunSuite

import Sitemap.{XmlMini, canonicalOf, fabricateHost, parseUrlset, readSitemap}

/** Spark-free pins for the q228/q229 sitemap kernel: the XML-subset
  * parser (entities, CDATA, comments, quoted-attribute terminators,
  * loud malformed failure), the index→part protocol walk, and an
  * INDEPENDENT cross-check of every fabricated document against the
  * JDK's own XML parser (`javax.xml.parsers` DOM) — a cancelling
  * fabricator/parser bug pair cannot hide behind the oracle replay.
  */
class SitemapSpec extends AnyFunSuite {

  private val allGroups = (0L until 60L)

  test("entity decode: named, decimal, hex; unknown and unterminated are loud") {
    assert(XmlMini.decodeEntities("a&amp;b&lt;c&gt;d&quot;e&apos;f") == "a&b<c>d\"e'f")
    assert(XmlMini.decodeEntities("x&#47;y&#x3F;z&#38;") == "x/y?z&")
    assert(XmlMini.decodeEntities("no entities") == "no entities")
    intercept[IllegalArgumentException](XmlMini.decodeEntities("bad &nbsp; ent"))
    intercept[IllegalArgumentException](XmlMini.decodeEntities("trail &amp"))
  }

  test("quoted attribute values may hold '>' without ending the tag") {
    val e = XmlMini.parse("""<a decoy="x > y"><b>t</b></a>""")
    assert(e.name == "a" && e.children.map(_.name) == Seq("b"))
    assert(e.children.head.text == "t")
  }

  test("CDATA is captured raw; comments inside elements are skipped") {
    val e = XmlMini.parse("<l><![CDATA[a&b<c]]><!-- decoy --></l>")
    assert(e.text == "a&b<c")
  }

  test("malformed documents fail loudly with the offending construct") {
    val bad = Seq(
      "<a><b></a>",                       // mismatched close
      "<a><!-- unterminated </a>",        // unterminated comment
      "<a><![CDATA[ unterminated </a>",   // unterminated CDATA
      "<a><b>text",                       // unclosed element
      "<a></a><b></b>",                   // trailing content after root
      "<a foo=\"unterminated></a>")       // unterminated attribute value
    bad.foreach(x => intercept[IllegalArgumentException](XmlMini.parse(x)))
    intercept[IllegalArgumentException](
      parseUrlset(Sitemap.urlsetXml(Seq("<url><lastmod>2024-01-01</lastmod></url>"))))
  }

  test("round-trip: every obfuscation flavor decodes to the canonical record") {
    (0L until 5L).foreach { h =>
      val gs = allGroups.filter(_ % 5 == h)
      val (index, parts) = fabricateHost(h, gs)
      val got = readSitemap(index, parts)
      assert(got.size == gs.size)
      val byCanon = got.map(u => Urls.canonicalize(u.loc) -> u).toMap
      gs.foreach { g =>
        val u = byCanon(canonicalOf(g))
        assert(u.lastmod == Sitemap.lastmodOf(g))
        assert(u.changefreq == Sitemap.changefreqs((g % 3).toInt))
        assert(u.priority == s"0.${g % 10}")
      }
    }
  }

  test("a direct urlset document is accepted without the index layer") {
    val (_, parts) = fabricateHost(0, Seq(0L, 10L))
    val direct = parts("part0.xml")
    assert(readSitemap(direct, _ => fail("no parts expected")).nonEmpty)
  }

  test("XmlMini agrees with the JDK DOM parser on every fabricated document") {
    import javax.xml.parsers.DocumentBuilderFactory
    import org.w3c.dom.{Element, Node}
    val db = DocumentBuilderFactory.newInstance().newDocumentBuilder()
    def domRecords(xml: String): Seq[(String, String, String, String)] = {
      val doc = db.parse(new java.io.ByteArrayInputStream(
        xml.getBytes("UTF-8")))
      val urls = doc.getElementsByTagName("url")
      (0 until urls.getLength).map { i =>
        val u = urls.item(i).asInstanceOf[Element]
        def t(n: String): String = {
          val l = u.getElementsByTagName(n)
          if (l.getLength == 0) "" else l.item(0).getTextContent.trim
        }
        (t("loc"), t("lastmod"), t("changefreq"), t("priority"))
      }
    }
    (0L until 5L).foreach { h =>
      val (_, parts) = fabricateHost(h, allGroups.filter(_ % 5 == h))
      parts.values.foreach { xml =>
        val ours = parseUrlset(xml)
          .map(u => (u.loc, u.lastmod, u.changefreq, u.priority))
        assert(ours == domRecords(xml), s"JDK DOM disagreement on host $h")
      }
    }
  }
}

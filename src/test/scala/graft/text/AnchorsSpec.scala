package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-text capture in the q217 tokenizer (the q233 unit of work),
  * pinned Spark-free, plus the raw-text close-tag scan regression. */
class AnchorsSpec extends AnyFunSuite {

  test("anchor text: entities decoded, whitespace normalized, quotes both styles") {
    val doc = Html.parse(
      """<body><a href="/doc/3">&#111;dd  doc 3
        |  from 7</a> <a href='/doc/5'>&#101;ven doc 5 from 4</a></body>""".stripMargin)
    assert(doc.anchors == Seq(
      Html.Anchor("/doc/3", "odd doc 3 from 7"),
      Html.Anchor("/doc/5", "even doc 5 from 4")))
  }

  test("anchor without href emits no Anchor but still counts as a link") {
    val doc = Html.parse("""<body><a name="x">label</a><a href="/y">kept</a></body>""")
    assert(doc.anchors == Seq(Html.Anchor("/y", "kept")))
    assert(doc.totalLinks == 2)
  }

  test("nested <a> folds inner text into the outer anchor") {
    val doc = Html.parse(
      """<body><a href="/outer">out <a href="/inner">in</a> side</a></body>""")
    assert(doc.anchors.head == Html.Anchor("/outer", "out in side"))
    // the inner href is still visible to the href stream (q225's consumer)
    assert(doc.hrefs == Seq("/outer", "/inner"))
  }

  test("anchor text spans an inline tag; empty anchor text is empty string") {
    val doc = Html.parse(
      """<body><a href="/b"><b>bold</b> tail</a><a href="/e"></a></body>""")
    assert(doc.anchors == Seq(Html.Anchor("/b", "bold tail"), Html.Anchor("/e", "")))
  }

  test("raw-text close scan: </scripty> does not end <script>; case-insensitive close does") {
    val doc = Html.parse(
      """<body><script>var a = "</scripty>"; var p = "<p>decoy</p>";</SCRIPT>
        |<p>alpha beta gamma delta epsilon zeta</p></body>""".stripMargin)
    assert(doc.blocks.map(_.text) == Seq("alpha beta gamma delta epsilon zeta"))
  }

  test("fixture page: chrome decoys excluded by the /doc/ filter, parity words decode") {
    val page = Anchors.anchorPage(9L, 100L)   // odd source: &#111;dd obfuscation
    val inCorpus = Html.parse(page).anchors.filter(_.href.startsWith("/doc/"))
    // id=9: edges (9+1)%100=10, (3*9+7)%100=34, and 9%3==0 adds (7*9+3)%100=66
    assert(inCorpus.map(_.href).sorted == Seq("/doc/10", "/doc/34", "/doc/66"))
    assert(inCorpus.forall(_.text.startsWith("odd doc ")))
    assert(inCorpus.forall(_.text.endsWith(" from 9")))
  }
}

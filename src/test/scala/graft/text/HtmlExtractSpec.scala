package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch HTML tokenizer + boilerplate heuristic (q217), pinned
  * Spark-free: every parse-mode hazard the fabricator embeds, entity
  * round-trips under fuzz, the density rule's keep/drop boundary, and the
  * end-to-end fabricate→parse→extract identity over randomized word-soup
  * documents (the exact invariant the DuckDB oracle hash-checks).
  */
class HtmlExtractSpec extends AnyFunSuite {

  test("tag soup hazards: comments, raw text, quoted '>', voids, misnesting") {
    val doc = Html.parse(
      """<!DOCTYPE html><html><head><meta charset="utf-8">
        |<script>var p = "<p>decoy</p>"; if (1 < 2) p = "&lt;";</script>
        |<style>/* <p>decoy</p> */ p { color: red; }</style>
        |</head><body>
        |<!-- <p>comment decoy</p> -->
        |<p title="a > b">alpha beta gamma delta epsilon</p>
        |<p>unclosed block starts here with enough characters
        |<p>second block implicitly closes the first one here</p>
        |</body></html>""".stripMargin)
    // decoys fabricate no blocks; the quoted '>' does not truncate the tag
    assert(doc.blocks.forall(b => !b.text.contains("decoy")))
    assert(doc.blocks.exists(_.text == "alpha beta gamma delta epsilon"))
    // misnested/unclosed <p> still yields both texts
    assert(doc.blocks.exists(_.text.startsWith("unclosed block")))
    assert(doc.blocks.exists(_.text.startsWith("second block")))
    assert(doc.totalLinks == 0)
  }

  test("entities: named, decimal, hex, malformed ampersand passthrough") {
    val doc = Html.parse("<p>&amp;&lt;&gt;&quot;&apos; &#65;&#x42; fish & chips &bogus; x</p>")
    assert(doc.blocks.head.text == "&<>\"' AB fish & chips &bogus; x")
  }

  test("link mass: anchor text counts, nested text outside anchors does not") {
    val doc = Html.parse("""<p>aa <a href="/x">link text</a> bb <a>z</a></p>""")
    val b = doc.blocks.head
    assert(b.text == "aa link text bb z")
    assert(b.links == 2 && doc.totalLinks == 2)
    assert(b.linkChars == "linktext".length + 1)   // whitespace never counts
  }

  test("density rule: nav dropped, short heading dropped, cited paragraph kept") {
    val page =
      """<body><h1>Doc 7</h1>
        |<nav><li><a href="/">Home</a></li><li><a href="/d">Docs</a></li></nav>
        |<p>real content sentence with an inline <a href="/c">citation</a> link kept</p>
        |<footer><a>Terms</a> <a>Privacy</a> (c) corp</footer></body>""".stripMargin
    val kept = Html.parse(page).blocks.filter(Html.isContent)
    assert(kept.map(_.text) ==
      Seq("real content sentence with an inline citation link kept"))
  }

  test("title extraction and whitespace normalization") {
    val doc = Html.parse("<head><title>  My   Page </title></head><body><p> a  b\n c </p></body>")
    assert(doc.title == "My Page")
    assert(doc.blocks.head.text == "a b c")
  }

  test("chunking: tail merge keeps every block >= one full chunk") {
    for (n <- 1 to 40) {
      val ws = (0 until n).map(i => s"w$i")
      val chunks = Html.chunkWords(ws)
      assert(chunks.flatten == ws, s"n=$n order/content drift")
      if (n >= Html.wordsPerBlock)
        assert(chunks.forall(_.size >= Html.wordsPerBlock), s"n=$n short block")
      assert(chunks.size == math.max(1, n / Html.wordsPerBlock), s"n=$n count")
    }
  }

  test("fabricate -> parse -> extract is the identity on the text (fuzz)") {
    val rnd = new scala.util.Random(217)
    val vocab = Vector("a", "the", "scan", "query", "customer", "window",
      "merge", "x1", "zz", "partition")
    for (trial <- 0 until 300) {
      val id = rnd.nextInt(5000).toLong
      val nWords = 10 + rnd.nextInt(80)
      val text = Seq.fill(nWords)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val doc = Html.parse(Html.fabricate(id, text))
      val kept = doc.blocks.filter(Html.isContent)
      assert(kept.map(_.text).mkString(" ") == text, s"trial=$trial id=$id")
      assert(doc.title == s"Doc $id")
      assert(kept.size == math.max(1, nWords / Html.wordsPerBlock))
      assert(doc.totalLinks == 9 + (if (id % 3 == 0) 1 else 0))
    }
  }

  test("fabricate round-trips hostile characters through the entity layer") {
    // documents are word-soup, but the escape layer must survive markup
    // metacharacters appearing IN the text (real crawls have them)
    val hostile = "5 < 6 && fish&chips >> <script> \"quoted\" text here okay"
    val doc = Html.parse(Html.fabricate(4L, hostile))
    val kept = doc.blocks.filter(Html.isContent)
    assert(kept.map(_.text).mkString(" ") == hostile)
  }
}

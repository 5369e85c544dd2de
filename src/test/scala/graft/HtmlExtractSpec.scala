package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** [[graft.ext.Corpus.htmlExtract]] on handcrafted markup — the
  * cases the planted-wrapper gate can't isolate: nav dropped by link
  * density, short blocks dropped by minChars, empty blocks never
  * counted, attribute-carrying and self-closing tags split correctly,
  * document order preserved across kept blocks. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String) =
    Corpus.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"),
        $"doc_id", $"html")
      .as[(Long, Long, Long, Long, String)].collect().head

  test("link-dense nav drops, content keeps, order preserved") {
    val (_, nBlocks, nKept, nLink, extracted) = run(
      "<html><body><p>alpha beta gamma</p>" +
        "<div class=\"nav\"><a href=\"/x\">home</a> <a href=\"/y\">about us</a></div>" +
        "<p>delta epsilon</p></body></html>")
    assert(nBlocks == 3)
    assert(nKept == 2)
    assert(nLink == "home".length + "about us".length)
    assert(extracted == "alpha beta gamma delta epsilon")
  }

  test("empty and whitespace-only blocks never count; short blocks drop") {
    val (_, nBlocks, nKept, _, extracted) = run(
      "<p>  </p><p>x</p><p>real content here</p><br><div></div>")
    // "  " and "" blocks vanish; "x" survives the nonempty filter but
    // fails minChars=2
    assert(nBlocks == 2)
    assert(nKept == 1)
    assert(extracted == "real content here")
  }

  test("inline tags strip without splitting; anchor text stays visible") {
    val (_, nBlocks, nKept, nLink, extracted) = run(
      "<p>read <b>the</b> <a href=\"/d\">docs</a> now</p>")
    assert(nBlocks == 1)
    assert(nKept == 1) // "docs" is 4 of 17 visible chars — kept
    assert(nLink == 4)
    assert(extracted == "read the docs now")
  }

  test("script/style bodies and comments strip whole; entities decode") {
    val (_, nBlocks, nKept, _, extracted) = run(
      "<p>alpha beta</p>" +
        "<script type=\"text/javascript\">var n = 1; if (n < 2) { track(); }</script>" +
        "<STYLE>.nav a { color: #fff; }</STYLE>" +
        "<!-- wrapper <p>comment para</p> -->" +
        "<p>Tom &amp; Jerry &lt;3 &quot;ads&quot; &#39;n&#8217; more</p>" +
        "<p>&amp;lt; stays literal</p>")
    // script/style/comment bodies vanish entirely — including the raw
    // `< 2` comparison and the <p> inside the comment; nothing of them
    // survives as a block
    assert(nBlocks == 3)
    assert(nKept == 3)
    assert(extracted ==
      "alpha beta Tom & Jerry <3 \"ads\" 'n more &lt; stays literal")
  }

  test("numeric entities: 7-digit decimal and uppercase-X hex decode; " +
      "letters-only pseudo-entity stays literal") {
    val (_, _, _, _, extracted) = run(
      "<p>a&#1114111;b &#X27;c &#abc; end</p>")
    // &#1114111; (max code point, 7 digits) and &#X27; (uppercase X)
    // both decode to a space; &#abc; is NOT a numeric entity and must
    // survive verbatim instead of being eaten
    assert(extracted == "a b c &#abc; end")
  }

  test("attribute-carrying block tags split; whitespace normalizes") {
    val (_, nBlocks, nKept, _, extracted) = run(
      "<div id=\"a\" class=\"main\">one\n\n  two</div>" +
        "<h2 data-x=\"1\">three</h2>")
    assert(nBlocks == 2 && nKept == 2)
    assert(extracted == "one two three")
  }
}

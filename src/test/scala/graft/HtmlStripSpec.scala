package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlStrip.strip

/** Golden cases for the parser-exact HTML strip — each one a documented
  * failure mode of the `<[^>]+>` regex approximation (VERDICT r4
  * missing #2), plus malformed-input behavior. The q_t1b oracle covers
  * the corpus-scale path; these pin the grammar corner cases. */
class HtmlStripSpec extends AnyFunSuite {

  test("plain tags drop, text survives, whitespace collapses") {
    assert(strip("<p>hello   <b>world</b></p>") == "hello world")
    assert(strip("  <div>  a  </div>  ") == "a")
    assert(strip("no markup at all") == "no markup at all")
  }

  test("attribute values containing '>' do not end the tag") {
    assert(strip("""<div title="a>b">x</div>""") == "x")
    assert(strip("""<a href='q?p=1>2'>link</a>""") == "link")
    // regex would emit 'b">x' for the first case
  }

  test("script and style bodies are dropped wholesale") {
    assert(strip("""<script>if (1 < 2 && x > 0) { y("<p>no</p>"); }</script>ok""") == "ok")
    assert(strip("""<style>.a > .b { color: red; }</style>ok""") == "ok")
    assert(strip("""<SCRIPT>x</SCRIPT>after""") == "after") // case-insensitive
    assert(strip("""<script src="x.js"/>inline</p>""") == "inline") // self-closed: no body
    assert(strip("""<script>never closed""") == "") // unterminated raw text: dropped
    // close-tag name must END at the match (ADVICE r5): '</scripty>' and
    // '</scripts>' are raw text, not the close tag
    assert(strip("""<script>a</scripty>b</script>ok""") == "ok")
    assert(strip("""<script>a</scripts >b</script>ok""") == "ok")
    assert(strip("""<script>x</script >ok""") == "ok") // ws after name closes
    assert(strip("""<script>x</script/>ok""") == "ok") // '/' after name closes
  }

  test("comments may contain '>' and tags") {
    assert(strip("""a<!-- <b>x</b> 1 > 0 -->b""") == "a b")
    assert(strip("""a<!-- unterminated""") == "a")
  }

  test("CDATA content is text") {
    assert(strip("""<p><![CDATA[1 < 2 & x]]></p>""") == "1 < 2 & x")
  }

  test("character references decode; invalid ones stay literal") {
    assert(strip("a &amp; b") == "a & b")
    assert(strip("&lt;p&gt; is not a tag") == "<p> is not a tag")
    assert(strip("x&#33;") == "x!")
    assert(strip("x&#x21;") == "x!")
    assert(strip("a&nbsp;b") == "a b")
    assert(strip("AT&T rocks & rolls") == "AT&T rocks & rolls")
    assert(strip("bad &#; ref") == "bad &#; ref")
  }

  test("stray '<' is text; declarations and PIs drop") {
    assert(strip("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
    assert(strip("<!DOCTYPE html><p>x</p>") == "x")
    assert(strip("<?xml version=\"1.0\"?>y") == "y")
    assert(strip("tail cut <div unterminated") == "tail cut")
  }

  test("the SQL surface sees the same function") {
    val spark = GraftSession.get(4)
    val r = spark.sql(
      """SELECT graft_html_strip('<div title="a>b"><script>1<2</script>ok &amp; done</div>') AS c""")
      .collect().head.getString(0)
    assert(r == "ok & done")
  }
}

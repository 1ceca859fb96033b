package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.HtmlStrip.strip

/** Property tests for the parser-exact HTML strip (native ScalaCheck —
  * pure JVM state machine, no Spark session, hundreds of cases in ms).
  * Complements HtmlStripSpec's grammar goldens with generated inputs.
  */
object HtmlStripPropertySpec extends Properties("html_strip") {

  /** Markup-free ASCII text (no `<`, `&`; the testdata corpus guarantee). */
  private val plainText: Gen[String] =
    Gen.listOf(Gen.frequency(
      9 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '?', '-', ':')))
      .map(_.mkString)

  private def collapse(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  property("markup-free text passes through modulo whitespace collapse") =
    Prop.forAll(plainText) { t => strip(t) == collapse(t) }

  property("wrapping in arbitrary well-formed tags never changes the text") =
    Prop.forAll(plainText, Gen.oneOf("p", "div", "span", "B", "td")) { (t, tag) =>
      strip(s"""<$tag class="x>y" data-a='1>2'>$t</$tag>""") == collapse(t)
    }

  property("script/style bodies never leak, whatever they contain") =
    Prop.forAll(plainText, plainText, Gen.oneOf("script", "style", "SCRIPT")) {
      (body, after, raw) =>
        strip(s"<$raw>$body 1 < 2 </$raw>$after") == collapse(after)
    }

  property("comments never leak, whatever they contain") =
    Prop.forAll(plainText, plainText) { (inside, after) =>
      strip(s"a<!-- $inside > <b>${inside.take(5)}</b> -->$after") ==
        collapse("a " + after)
    }

  property("numeric character references decode to their code point") =
    Prop.forAll(Gen.choose(33, 126)) { cp =>
      strip(s"x&#$cp;y") == collapse(s"x${cp.toChar}y") &&
      strip(f"x&#x$cp%x;y") == collapse(s"x${cp.toChar}y")
    }

  property("the strip never throws and never emits tag delimiters from markup") =
    Prop.forAll(plainText, plainText) { (a, b) =>
      val out = strip(s"<div>$a</div><script>$b</script><p>$b</p>")
      !out.contains('<') && !out.contains('>')
    }
}

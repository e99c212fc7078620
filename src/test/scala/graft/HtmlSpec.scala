package graft

import java.nio.charset.StandardCharsets

import graft.functions.Html
import graft.sources.PageSynth

/** Extraction goldens (FIXTURES.md §3): byte-identity invariant, BASELINE.json:15. */
class HtmlSpec extends SparkSpec {

  val goldenHtml: Array[Byte] =
    ("<html><head><title>Tést &amp; more</title><script>var x = \"<p>\";</script>" +
      "<style>p{color:red}</style></head>" +
      "<body><!-- a comment --><p>Hello &lt;world&gt;&nbsp;&#65;&#x42; café</p>" +
      "<a  href=\"https://A.example/One#frag\">x</a>" +
      "<a href='https://b.example/two?q=1&amp;r=2'>y</a>" +
      "<a href=/rel/path>z</a><a href=\"mailto:a@b.c\">m</a></body></html>")
      .getBytes(StandardCharsets.UTF_8)

  test("extractText golden — entities, comments, script/style, whitespace") {
    val got = Html.extractText(goldenHtml)
    // anchor texts (x y z m) are page text and must be kept
    assert(got == "Tést & more Hello <world> AB café x y z m")
    // byte-identity: same input bytes → same output bytes, always
    assert(got.getBytes(StandardCharsets.UTF_8)
      .sameElements(Html.extractText(goldenHtml.clone).getBytes(StandardCharsets.UTF_8)))
  }

  test("extractOutlinks golden — document order, quote styles, entity decode") {
    val links = Html.extractOutlinks(goldenHtml)
    assert(links == Seq(
      "https://A.example/One#frag",
      "https://b.example/two?q=1&r=2",
      "/rel/path",
      "mailto:a@b.c"))
  }

  test("normalizeUrl pinned rules") {
    val base = "https://host.example/p/1"
    assert(Html.normalizeUrl("HTTPS://Host.EXample/Path#frag", base) == "https://host.example/Path")
    assert(Html.normalizeUrl("https://h.example", base) == "https://h.example")
    assert(Html.normalizeUrl("https://h.example/", base) == "https://h.example")
    assert(Html.normalizeUrl("/rel/path", base) == "https://host.example/rel/path")
    assert(Html.normalizeUrl("mailto:a@b.c", base) == null)
    assert(Html.normalizeUrl("javascript:void(0)", base) == null)
    assert(Html.normalizeUrl("relative/x", base) == null)
    assert(Html.normalizeUrl("ftp://h/x", base) == null)
  }

  test("malformed UTF-8 never throws; replacement is deterministic") {
    val bad = Array[Byte](0x3c, 0x70, 0x3e, 0xff.toByte, 0xfe.toByte, 0x3c, 0x2f, 0x70, 0x3e)
    val a = Html.extractText(bad); val b = Html.extractText(bad)
    assert(a == b && a.contains("�"))
  }

  test("PageSynth text column IS the extractor output (per-row invariant by construction)") {
    import spark.implicits._
    val bad = PageSynth.pages(spark, 200)
      .map(p => (p.text, Html.extractText(p.html)))
      .filter(t => t._1 != t._2)
      .count()
    assert(bad == 0L)
  }

  test("PageSynth is deterministic across invocations and partitionings") {
    import spark.implicits._
    val a = PageSynth.pages(spark, 100, numPartitions = 2).map(p => (p.url, p.text)).collect().sortBy(_._1)
    val b = PageSynth.pages(spark, 100, numPartitions = 7).map(p => (p.url, p.text)).collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}

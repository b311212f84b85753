package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def rec(id: Long, typ: String, uri: String, ct: String, payload: Array[Byte]) =
    Warc.WarcRecord(typ, s"<urn:uuid:rec-$id>", uri,
      "2026-01-01T00:00:00Z", ct, payload.length.toLong, payload)

  private def sample = Seq(
    rec(0, "warcinfo", "", "application/warc-fields",
      "software: graft\r\n".getBytes("US-ASCII")),
    rec(1, "resource", "http://example.com/doc/1", "text/html; charset=utf-8",
      "<html><body><p>hello world</p></body></html>".getBytes("UTF-8")),
    rec(2, "resource", "http://example.com/doc/2", "text/plain",
      Array.tabulate[Byte](256)(i => i.toByte))) // binary payload incl CRLFs

  test("write/parse round-trip: plain and per-record-gzip, byte-exact payloads") {
    for (gz <- Seq(false, true)) {
      val bytes = Warc.writeWarc(sample, gzipPerRecord = gz)
      val parsed = Warc.parseWarc(bytes)
      assert(parsed.length == 3, s"gz=$gz")
      parsed.zip(sample).foreach { case (p, s) =>
        assert(p.warc_type == s.warc_type && p.record_id == s.record_id &&
          p.target_uri == s.target_uri && p.warc_date == s.warc_date &&
          p.content_type == s.content_type && p.content_length == s.content_length)
        assert(java.util.Arrays.equals(p.payload, s.payload), s"payload gz=$gz")
      }
    }
  }

  test("gzip layout really is one member per record (Common Crawl shape)") {
    val bytes = Warc.writeWarc(sample, gzipPerRecord = true)
    // count gzip magics at member boundaries: 3 members
    var members = 0
    var i = 0
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B) members += 1
      i += 1
    }
    assert(members >= 3) // magic can also occur inside compressed data
    // and a single member alone still parses
    val one = Warc.writeWarc(sample.take(1), gzipPerRecord = true)
    assert(Warc.parseWarc(one).length == 1)
  }

  test("malformed input truncates, never throws") {
    val bytes = Warc.writeWarc(sample, gzipPerRecord = false)
    // cut mid-payload of record 3: first two records survive
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 150)
    val parsed = Warc.parseWarc(cut)
    assert(parsed.length >= 1 && parsed.length <= 2)
    assert(parsed.head.warc_type == "warcinfo")
    // garbage, null-ish, and corrupt gzip yield empty
    assert(Warc.parseWarc("not a warc at all".getBytes).isEmpty)
    assert(Warc.parseWarc(Array.emptyByteArray).isEmpty)
    assert(Warc.parseWarc(Array[Byte](0x1F.toByte, 0x8B.toByte, 1, 2, 3)).isEmpty)
    // content-length lies beyond EOF
    val lying = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 9999\r\n\r\nshort")
      .getBytes("US-ASCII")
    assert(Warc.parseWarc(lying).isEmpty)
  }

  test("htmlToText: tags, entities, script/style, block breaks, trimming") {
    assert(Warc.htmlToText(
      "<html><head><title>T</title><script>var x = '<p>no</p>';</script>" +
        "<style>p { color: red }</style></head>" +
        "<body><p>  a &amp; b &lt;c&gt; </p><p>&#65;&#x42;!</p></body></html>")
      == "T\na & b <c>\nAB!")
    assert(Warc.htmlToText("no tags at all") == "no tags at all")
    assert(Warc.htmlToText("a<br>b<hr/>c") == "a\nb\nc")
    assert(Warc.htmlToText("<p></p><p>  </p>x") == "x") // blank lines dropped
    assert(Warc.htmlToText("dangling <unclosed") == "dangling")
    assert(Warc.htmlToText("&bogus; &#xZZ; &toolongtobeanentity;ok")
      == "&bogus; &#xZZ; &toolongtobeanentity;ok")
    assert(Warc.htmlToText(null) == null)
    // inline tags do NOT break lines
    assert(Warc.htmlToText("<b>a</b><i>b</i>") == "ab")
  }

  test("Spark surface: records() explodes files map-only; wetConversion round-trips") {
    val docs = sf("sf0.001", "documents").filter(F.col("doc_id") < 50)
      .select("doc_id", "text").as[(Long, String)].collect()
    val files = docs.toSeq.map { case (id, text) =>
      val esc = Option(text).getOrElse("")
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val html = s"<html><head><title>doc $id</title></head><body><p>$esc</p></body></html>"
      val ws = Seq(
        rec(id * 2, "warcinfo", "", "application/warc-fields",
          "software: graft\r\n".getBytes("US-ASCII")),
        rec(id * 2 + 1, "resource", s"http://example.com/doc/$id",
          "text/html; charset=utf-8", html.getBytes("UTF-8")))
      (id, Warc.writeWarc(ws))
    }.toDF("file_id", "warc")

    val recs = Warc.records(files, "file_id", "warc")
    val plan = recs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"records() must be map-only:\n$plan")
    assert(recs.count() == docs.length * 2L)

    val wet = Warc.wetConversion(recs).collect()
    assert(wet.length == docs.length)
    val byId = wet.map(r => r.getAs[Long]("file_id") -> r.getAs[String]("text")).toMap
    docs.foreach { case (id, text) =>
      val expected = (s"doc $id" + "\n" + Option(text).getOrElse("").trim)
        .split('\n').map(_.trim).filter(_.nonEmpty).mkString("\n")
      assert(byId(id) == expected, s"doc $id text mismatch")
    }
  }

  test("extractLinks: quote styles, entities, inner markup, href-less and broken tags") {
    val html =
      """<html><body>
        |<a href="/a/b.html">First <b>bold</b> link</a>
        |<A HREF='http://x.com/y?a=1&amp;b=2'>Caps &amp; quotes</A>
        |<a class="nav" href=bare.html>bare</a>
        |<a name="anchor-only">no href</a>
        |<abbr>not a link</abbr>
        |<a href="">empty</a>
        |<a href="/z">unterminated""".stripMargin
    val links = Warc.extractLinks(html)
    assert(links == Seq(
      Warc.Link("/a/b.html", "First bold link"),
      Warc.Link("http://x.com/y?a=1&b=2", "Caps & quotes"),
      Warc.Link("bare.html", "bare"),
      Warc.Link("", "empty"),
      Warc.Link("/z", "unterminated")))
    assert(Warc.extractLinks(null).isEmpty)
    assert(Warc.extractLinks("plain text, no tags").isEmpty)
  }

  test("outlinks: resolved edges, non-navigable links dropped, map-only plan") {
    val pages = Seq(
      ("http://ex.com/dir/page.html",
        """<a href="rel.html">r</a> <a href="/abs.html">a</a>
          |<a href="mailto:x@y.z">m</a> <a href="#top">t</a>
          |<a href="//cdn.net/l.js">c</a>""".stripMargin),
      ("http://two.com/", """<a href="../up//x.html">u</a>"""),
      ("http://three.com/p", null.asInstanceOf[String])
    ).toDF("url", "html")
    val out = Warc.outlinks(pages, "url", "html")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val edges = out.as[(String, String, String)].collect().toSet
    assert(edges == Set(
      ("http://ex.com/dir/page.html", "http://ex.com/dir/rel.html", "r"),
      ("http://ex.com/dir/page.html", "http://ex.com/abs.html", "a"),
      ("http://ex.com/dir/page.html", "http://cdn.net/l.js", "c"),
      ("http://two.com/", "http://two.com/up/x.html", "u")))
  }

  test("pageMetadata: title/description/canonical/lang, first wins") {
    val html =
      """<!doctype html><HTML Lang="en-GB"><head>
        |<title>  Fast &amp;
        |   furious  docs </title>
        |<meta charset="utf-8"><meta name="Description" content="A &quot;doc&quot; page">
        |<link rel="stylesheet" href="/s.css">
        |<link rel="canonical" href="http://ex.com/canon">
        |<title>second ignored</title>
        |</head><body><meta name="description" content="late"></body></html>""".stripMargin
    val m = Warc.pageMetadata(html)
    assert(m.title == "Fast & furious docs")
    assert(m.description == "A \"doc\" page")
    assert(m.canonical == "http://ex.com/canon")
    assert(m.lang == "en-GB")
  }

  test("pageMetadata: missing pieces are null, garbage safe") {
    assert(Warc.pageMetadata(null) == Warc.PageMeta(null, null, null, null))
    assert(Warc.pageMetadata("no tags at all") ==
      Warc.PageMeta(null, null, null, null))
    val partial = Warc.pageMetadata(
      "<html><title></title><meta name=description content=bare></html>")
    assert(partial.title == null) // empty title folds to null
    assert(partial.description == "bare")
    assert(partial.canonical == null && partial.lang == null)
    // unterminated title truncates at end of input
    assert(Warc.pageMetadata("<title>tail").title == "tail")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}

/**
 * WARC (Web ARChive, ISO 28500 / WARC 1.0) ingestion — the Common
 * Crawl container format — plus WET-style text extraction from HTML.
 *
 * Everything is pure JVM against the PUBLIC format specs:
 *   - [[parseWarc]] reads plain or gzip files (including the Common
 *     Crawl layout of one gzip MEMBER per record — JDK
 *     `GZIPInputStream` handles concatenated members natively),
 *     splitting records on the `WARC/1.x` version line, header block,
 *     and `Content-Length` payload slice.
 *   - [[htmlToText]] is a small state machine over the HTML: tags
 *     dropped, `script`/`style` element CONTENT dropped, block-level
 *     boundaries become line breaks, character entities decoded,
 *     lines trimmed and blank lines removed — the WET conversion.
 *   - [[writeWarc]] emits spec-conformant files (used by tests and the
 *     oracle queries to synthesize corpora whose parse results are
 *     independently derivable).
 *
 * Scale shape: parsing is a map-only `mapPartitions` over the file
 * rows — no shuffle, no driver state; a 100 TB crawl parses at input
 * parallelism. Malformed input follows the repo NULL discipline:
 * a corrupt record truncates that FILE's parse to the records before
 * it (never an error), and undecodable gzip yields zero records.
 */
object Warc {

  /** One parsed WARC record. `payload` is the raw (uncompressed)
    * content block of exactly `content_length` bytes. */
  case class WarcRecord(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  private val Crlf = "\r\n"

  // ---------------------------------------------------------------- //
  // Writer                                                            //
  // ---------------------------------------------------------------- //

  /**
   * Serialize records to WARC 1.0 bytes. `gzipPerRecord = true`
   * produces the Common Crawl layout (each record its own gzip
   * member); `false` a plain concatenation.
   */
  def writeWarc(records: Seq[WarcRecord], gzipPerRecord: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val header = new StringBuilder()
        .append("WARC/1.0").append(Crlf)
        .append("WARC-Type: ").append(r.warc_type).append(Crlf)
        .append("WARC-Record-ID: ").append(r.record_id).append(Crlf)
        .append("WARC-Date: ").append(r.warc_date).append(Crlf)
      if (r.target_uri != null && r.target_uri.nonEmpty)
        header.append("WARC-Target-URI: ").append(r.target_uri).append(Crlf)
      header
        .append("Content-Type: ").append(r.content_type).append(Crlf)
        .append("Content-Length: ").append(r.payload.length).append(Crlf)
        .append(Crlf)
      val rec = new java.io.ByteArrayOutputStream()
      rec.write(header.toString.getBytes("US-ASCII"))
      rec.write(r.payload)
      rec.write(s"$Crlf$Crlf".getBytes("US-ASCII"))
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec.toByteArray)
        gz.finish()
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- //
  // Parser                                                            //
  // ---------------------------------------------------------------- //

  private def gunzipAll(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 64 * 1024)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** Parse a WARC file (plain or gzipped). Malformed content truncates
    * the result at the last well-formed record — never throws. */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Seq.empty
    val raw =
      if ((bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
        gunzipAll(bytes).getOrElse(return Seq.empty)
      else bytes
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < raw.length) {
      // skip inter-record CRLFs
      while (pos < raw.length && (raw(pos) == '\r' || raw(pos) == '\n')) pos += 1
      if (pos >= raw.length) ok = false
      else parseRecord(raw, pos) match {
        case Some((rec, next)) => recs += rec; pos = next
        case None => ok = false
      }
    }
    recs.result()
  }

  /** One record at `start`: version line, headers to the blank line,
    * `Content-Length` payload bytes. Returns the record and the offset
    * just past its terminating block. */
  private def parseRecord(b: Array[Byte], start: Int): Option[(WarcRecord, Int)] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val cut = if (e > from && b(e - 1) == '\r') e - 1 else e
      (new String(b, from, cut - from, "US-ASCII"), e + 1)
    }
    val (version, afterVersion) = lineAt(start)
    if (!version.startsWith("WARC/")) return None
    var pos = afterVersion
    val headers = scala.collection.mutable.Map.empty[String, String]
    var done = false
    while (!done && pos < b.length) {
      val (line, next) = lineAt(pos)
      pos = next
      if (line.isEmpty) done = true
      else {
        val i = line.indexOf(':')
        if (i > 0) headers.put(
          line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
          line.substring(i + 1).trim)
      }
    }
    if (!done) return None
    val len =
      try headers.getOrElse("content-length", return None).toLong
      catch { case _: NumberFormatException => return None }
    if (len < 0 || pos + len > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
    Some((WarcRecord(
      warc_type = headers.getOrElse("warc-type", ""),
      record_id = headers.getOrElse("warc-record-id", ""),
      target_uri = headers.getOrElse("warc-target-uri", ""),
      warc_date = headers.getOrElse("warc-date", ""),
      content_type = headers.getOrElse("content-type", ""),
      content_length = len,
      payload = payload), pos + len.toInt))
  }

  // ---------------------------------------------------------------- //
  // WET text extraction                                               //
  // ---------------------------------------------------------------- //

  private val BlockTags = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "tr", "table", "h1", "h2",
    "h3", "h4", "h5", "h6", "title", "head", "body", "html", "section",
    "article", "header", "footer", "blockquote", "pre", "td", "th")

  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode `&name;`, `&#NNN;`, `&#xHH;` at `i` (which points at '&');
    * returns (decoded, next index) or None if not an entity. */
  private def entityAt(s: String, i: Int): Option[(String, Int)] = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return None
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#x") || body.startsWith("#X"))
      try Some((Character.toString(Integer.parseInt(body.substring(2), 16)), semi + 1))
      catch { case _: RuntimeException => None }
    else if (body.startsWith("#"))
      try Some((Character.toString(Integer.parseInt(body.substring(1))), semi + 1))
      catch { case _: RuntimeException => None }
    else Entities.get(body.toLowerCase(java.util.Locale.ROOT)).map((_, semi + 1))
  }

  /**
   * WET conversion: visible text of an HTML document. Tags are
   * dropped; `script`/`style` contents are dropped; a block-level tag
   * boundary breaks the line; entities are decoded; every line is
   * trimmed and blank lines are removed; lines join with `\n`.
   * Null-safe (null → null, repo NULL discipline).
   */
  def htmlToText(html: String): String = {
    if (html == null) return null
    val out = new StringBuilder(html.length)
    var i = 0
    var skipUntil: String = null // closing tag name whose content we drop
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) i = html.length // dangling tag: drop the rest
        else {
          val inner = html.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val name = inner.stripPrefix("/").takeWhile(ch =>
            Character.isLetterOrDigit(ch)).toLowerCase(java.util.Locale.ROOT)
          if (skipUntil != null) {
            if (isEnd && name == skipUntil) skipUntil = null
          } else if (!isEnd && (name == "script" || name == "style")) {
            skipUntil = name
          } else if (BlockTags.contains(name)) {
            out.append('\n')
          }
          i = close + 1
        }
      } else if (skipUntil != null) {
        i += 1
      } else if (c == '&') {
        entityAt(html, i) match {
          case Some((s, next)) => out.append(s); i = next
          case None => out.append(c); i += 1
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString.split('\n').iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  // ---------------------------------------------------------------- //
  // Spark surface                                                     //
  // ---------------------------------------------------------------- //

  /** A parsed record tagged with the id of the file row it came from. */
  case class FileRecord(
      file_id: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  /**
   * Explode WARC files into records: input rows (`idCol` long,
   * `binCol` binary) → one row per parsed record. Map-only — parse
   * runs where the bytes already are.
   */
  def records(files: DataFrame, idCol: String, binCol: String): Dataset[FileRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(F.col(idCol).cast("long").as("id"), F.col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bin) =>
        parseWarc(bin).iterator.map(r => FileRecord(
          id, r.warc_type, r.record_id, r.target_uri, r.warc_date,
          r.content_type, r.content_length, r.payload))
      })
  }

  /** One extracted hyperlink: raw href attribute + visible anchor
    * text (entities decoded, inner tags stripped). */
  final case class Link(href: String, anchor: String)

  /**
   * Extract `<a href=...>` links from HTML — the edge list of the
   * crawl graph (outlink counts, frontier discovery, anchor-text
   * retrieval signals). Same single-pass state-machine family as
   * [[htmlToText]]: quoted or bare href values, entity decoding in
   * BOTH href and anchor, inner markup stripped from the anchor,
   * unterminated anchors truncate at end of input. Href-less `<a>`
   * tags are skipped. Null/empty input → empty list, never an error.
   */
  def extractLinks(html: String): Seq[Link] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Link]
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < html.length) {
      val open = lower.indexOf("<a", i)
      if (open < 0 || open + 2 >= html.length) i = html.length
      else if (!Character.isWhitespace(html.charAt(open + 2)) &&
               html.charAt(open + 2) != '>') i = open + 2 // <abbr> etc
      else {
        val tagEnd = html.indexOf('>', open)
        if (tagEnd < 0) i = html.length
        else {
          val attrs = html.substring(open + 2, tagEnd)
          val href = hrefAttr(attrs)
          val close = lower.indexOf("</a", tagEnd + 1)
          val rawAnchor =
            if (close < 0) html.substring(tagEnd + 1)
            else html.substring(tagEnd + 1, close)
          href.foreach { h =>
            val anchor = htmlToText(rawAnchor)
              .split('\n').mkString(" ").trim
            out += Link(decodeEntities(h.trim), anchor)
          }
          i = if (close < 0) html.length else close + 1
        }
      }
    }
    out.toSeq
  }

  /** The href attribute value out of an `<a>` tag's attribute text:
    * `href="v"`, `href='v'`, or bare `href=v` (to whitespace). */
  private def hrefAttr(attrs: String): Option[String] = attrValue(attrs, "href")

  /** An attribute's value out of a tag's attribute text: quoted
    * (either quote), or bare (to whitespace); name match is
    * case-insensitive and must be a standalone token. */
  private def attrValue(attrs: String, name: String): Option[String] = {
    val lower = attrs.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from >= 0) {
      val at = lower.indexOf(name, from)
      if (at < 0) return None
      // must be a standalone attribute name
      val beforeOk = at == 0 || !Character.isLetterOrDigit(lower.charAt(at - 1))
      var j = at + name.length
      while (j < attrs.length && Character.isWhitespace(attrs.charAt(j))) j += 1
      if (beforeOk && j < attrs.length && attrs.charAt(j) == '=') {
        j += 1
        while (j < attrs.length && Character.isWhitespace(attrs.charAt(j))) j += 1
        if (j >= attrs.length) return Some("")
        val c = attrs.charAt(j)
        if (c == '"' || c == '\'') {
          val end = attrs.indexOf(c, j + 1)
          return Some(if (end < 0) attrs.substring(j + 1)
            else attrs.substring(j + 1, end))
        }
        var end = j
        while (end < attrs.length && !Character.isWhitespace(attrs.charAt(end))) end += 1
        return Some(attrs.substring(j, end))
      }
      from = at + name.length
    }
    None
  }

  /** Head metadata of one HTML page; any field may be null. */
  final case class PageMeta(
      title: String, description: String, canonical: String, lang: String)

  /**
   * Extract page metadata — `<title>`, `<meta name="description">`,
   * `<link rel="canonical">`, `<html lang=...>` — in one pass over
   * the tag stream (the [[extractLinks]] family). First occurrence of
   * each wins; titles get entity decoding and whitespace collapse;
   * missing pieces are null, never an error.
   */
  def pageMetadata(html: String): PageMeta = {
    if (html == null) return PageMeta(null, null, null, null)
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    var title: String = null; var desc: String = null
    var canon: String = null; var lang: String = null
    var i = 0
    while (i < html.length &&
      (title == null || desc == null || canon == null || lang == null)) {
      val open = lower.indexOf('<', i)
      if (open < 0) i = html.length
      else {
        val tagEnd = lower.indexOf('>', open)
        if (tagEnd < 0) i = html.length
        else {
          var ne = open + 1
          while (ne < tagEnd && (Character.isLetterOrDigit(lower.charAt(ne)) ||
            (ne == open + 1 && lower.charAt(ne) == '/'))) ne += 1
          val tag = lower.substring(open + 1, ne)
          val attrs = html.substring(ne, tagEnd)
          tag match {
            case "title" if title == null =>
              val close = lower.indexOf("</title", tagEnd + 1)
              val raw = if (close < 0) html.substring(tagEnd + 1)
                else html.substring(tagEnd + 1, close)
              title = decodeEntities(raw).split("\\s+")
                .filter(_.nonEmpty).mkString(" ")
              if (title.isEmpty) title = null
              i = if (close < 0) html.length else close + 1
            case "meta" if desc == null =>
              if (attrValue(attrs, "name").exists(
                  _.equalsIgnoreCase("description")))
                desc = attrValue(attrs, "content")
                  .map(c => decodeEntities(c.trim)).filter(_.nonEmpty).orNull
              i = tagEnd + 1
            case "link" if canon == null =>
              if (attrValue(attrs, "rel").exists(
                  _.trim.equalsIgnoreCase("canonical")))
                canon = attrValue(attrs, "href")
                  .map(h => decodeEntities(h.trim)).filter(_.nonEmpty).orNull
              i = tagEnd + 1
            case "html" if lang == null =>
              lang = attrValue(attrs, "lang")
                .map(_.trim).filter(_.nonEmpty).orNull
              i = tagEnd + 1
            case _ => i = tagEnd + 1
          }
        }
      }
    }
    PageMeta(title, desc, canon, lang)
  }

  /** [[pageMetadata]] as a map-only Column:
    * struct<title,description,canonical,lang>. */
  def pageMetaColumn(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.udf((h: String) => pageMetadata(h)).apply(html)

  /** Decode HTML entities anywhere in `s` (the [[htmlToText]] set). */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') entityAt(s, i) match {
        case Some((d, next)) => out.append(d); i = next
        case None => out.append('&'); i += 1
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** [[extractLinks]] as a map-only Column: array<struct<href,anchor>>. */
  def linksColumn(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.udf((h: String) => extractLinks(h)).apply(html)

  /**
   * Outlink edge list of an HTML-bearing corpus: (src column, resolved
   * absolute target, anchor) — hrefs resolved against the page URL via
   * [[graft.pipeline.Urls.resolveUrl]]; unresolvable (mailto:,
   * javascript:, fragment-only) links drop. Map-only.
   */
  def outlinks(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val l = F.explode(linksColumn(F.col(htmlCol))).as("__l")
    pages.select(F.col(urlCol).as("src"), l)
      .select(F.col("src"),
        graft.pipeline.Urls.resolveUrl(F.col("src"), F.col("__l.href")).as("dst"),
        F.col("__l.anchor").as("anchor"))
      .filter(F.col("dst").isNotNull)
  }

  /**
   * WET-style conversion: HTML-bearing records → (file_id, target_uri,
   * content_length, text). Non-HTML records and records whose payload
   * fails UTF-8-decode-and-extract are dropped (not errors).
   */
  def wetConversion(recs: Dataset[FileRecord]): DataFrame = {
    val spark = recs.sparkSession
    import spark.implicits._
    recs
      .filter((r: FileRecord) => r.content_type != null &&
        r.content_type.toLowerCase(java.util.Locale.ROOT).startsWith("text/html"))
      .map { r =>
        val text = htmlToText(new String(r.payload, java.nio.charset.StandardCharsets.UTF_8))
        (r.file_id, r.target_uri, r.content_length, text)
      }
      .toDF("file_id", "target_uri", "content_length", "text")
  }
}

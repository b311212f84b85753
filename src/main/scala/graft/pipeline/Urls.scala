package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/**
 * URL normalization for web-crawl corpora: canonical form for
 * URL-level dedup/grouping and registrable-domain extraction for
 * per-site statistics, rate caps, and blocklists.
 *
 * Canonicalization rules (the common crawl-dedup set):
 *   - scheme and host lowercased; userinfo dropped
 *   - default ports stripped (`:80` for http, `:443` for https)
 *   - fragment dropped
 *   - tracking query params dropped (`utm_*`, `gclid`, `fbclid`,
 *     `mc_cid`, `mc_eid`, `igshid`, `ref_src`)
 *   - remaining query params sorted bytewise (param ORDER carries no
 *     content; sorting makes `?a=1&b=2` ≡ `?b=2&a=1`)
 *   - repeated `/` in the path collapsed, `.` segments removed, `..`
 *     segments resolved; trailing slash dropped (root stays `/`)
 *
 * Kernels are plain JVM string code on executors (the text-kernel
 * precedent — per-row structural parsing has no Column composition),
 * exposed as UDF Columns; map-only, no shuffle, stream-safe. NULL or
 * unparseable input → NULL (repo discipline).
 */
object Urls {

  private val TrackingParams = Set("gclid", "fbclid", "mc_cid", "mc_eid",
    "igshid", "ref_src")

  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || TrackingParams.contains(n)
  }

  /** Multi-label public suffixes (the common subset — a full public
    * suffix list is a data file, not logic; callers with one can pass
    * their own via [[registrableDomainWith]]). */
  val DefaultMultiPartTlds: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "co.in", "net.in", "org.in", "co.nz", "net.nz", "org.nz",
    "com.br", "com.cn", "com.mx", "com.tr", "co.za", "com.sg",
    "com.hk", "co.kr", "com.ar", "com.co")

  /** One parsed URL. `port` = -1 when absent. */
  final case class ParsedUrl(
      scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  /** Structural parse without java.net.URI's exception zoo: returns
    * None unless the input has a `scheme://host` prefix. */
  private[pipeline] def parse(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val s = url.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = s.substring(0, schemeEnd)
    if (!scheme.forall(c => Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
      return None
    var rest = s.substring(schemeEnd + 3)
    // fragment first (everything after # regardless of ?)
    val hashAt = rest.indexOf('#')
    val fragment = if (hashAt >= 0) rest.substring(hashAt + 1) else ""
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    val qAt = rest.indexOf('?')
    val query = if (qAt >= 0) rest.substring(qAt + 1) else ""
    if (qAt >= 0) rest = rest.substring(0, qAt)
    val slashAt = rest.indexOf('/')
    var authority = if (slashAt >= 0) rest.substring(0, slashAt) else rest
    val path = if (slashAt >= 0) rest.substring(slashAt) else ""
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1) // drop userinfo
    if (authority.isEmpty) return None
    val colonAt = authority.lastIndexOf(':')
    val (host, port) =
      if (colonAt >= 0 && authority.substring(colonAt + 1).forall(_.isDigit)
          && colonAt + 1 < authority.length)
        (authority.substring(0, colonAt),
          try authority.substring(colonAt + 1).toInt catch { case _: NumberFormatException => -1 })
      else (authority, -1)
    if (host.isEmpty) return None
    Some(ParsedUrl(scheme, host, port, path, query, fragment))
  }

  /** Resolve `.`/`..`, collapse `//`, drop the trailing slash (root
    * stays `/`); empty path becomes `/`. */
  private def normalizePath(path: String): String = {
    val segs = path.split("/").filter(s => s.nonEmpty && s != ".")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    segs.foreach {
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    if (out.isEmpty) "/" else "/" + out.mkString("/")
  }

  /** The canonical string, or null when unparseable. */
  private[pipeline] def canonicalizeKernel(url: String): String =
    parse(url).map { p =>
      val scheme = p.scheme.toLowerCase(java.util.Locale.ROOT)
      val host = p.host.toLowerCase(java.util.Locale.ROOT)
      val keepPort = p.port match {
        case -1 => ""
        case 80 if scheme == "http" => ""
        case 443 if scheme == "https" => ""
        case n => s":$n"
      }
      val params = p.query.split("&").filter(_.nonEmpty)
        .filterNot(kv => isTracking(kv.takeWhile(_ != '=')))
        .sorted
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme://$host$keepPort${normalizePath(p.path)}$q"
    }.orNull

  /** Registrable domain of a host under the given multi-part-suffix
    * set: suffix labels + one, e.g. `news.bbc.co.uk` → `bbc.co.uk`,
    * `a.b.example.com` → `example.com`. IPs and single-label hosts
    * return as-is. */
  private[pipeline] def registrableDomainKernel(
      host: String, multiTlds: Set[String]): String = {
    if (host == null) return null
    val h = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    val labels = h.split("\\.")
    if (labels.length <= 1) return h
    if (labels.forall(_.forall(_.isDigit))) return h // IPv4
    val lastTwo = labels.takeRight(2).mkString(".")
    val n = if (labels.length >= 3 && multiTlds.contains(lastTwo)) 3 else 2
    labels.takeRight(n).mkString(".")
  }

  // ---------------------------------------------------------------- //
  // Column surface                                                    //
  // ---------------------------------------------------------------- //

  /** Canonical URL Column (null when unparseable). Map-only. */
  def canonicalizeUrl(url: Column): Column =
    F.udf((u: String) => Option(canonicalizeKernel(u))).apply(url)

  /** Registrable domain of a URL Column, via the default suffix set. */
  def urlDomain(url: Column): Column = registrableDomainWith(url, DefaultMultiPartTlds)

  /** Registrable domain with a caller-supplied multi-part-suffix set
    * (e.g. a full public suffix list loaded from a file). */
  def registrableDomainWith(url: Column, multiTlds: Set[String]): Column = {
    val udf = F.udf((u: String) =>
      parse(u).map(p => registrableDomainKernel(p.host, multiTlds)))
    udf(url)
  }

  /** Per-domain page counts of a URL column — the crawl-profile
    * rollup (one exchange on the domain key). */
  def domainCounts(df: org.apache.spark.sql.DataFrame, urlCol: String): org.apache.spark.sql.DataFrame =
    df.select(urlDomain(F.col(urlCol)).as("domain"))
      .filter(F.col("domain").isNotNull)
      .groupBy("domain").agg(F.count(F.lit(1)).as("pages"))

  /**
   * RFC 3986-style reference resolution for the link-graph pass:
   * absolute hrefs pass through, protocol-relative take the base
   * scheme, root-relative take the base origin, relative paths join
   * the base directory with `.`/`..` resolved. Non-hierarchical
   * schemes (`mailto:`, `javascript:`, `tel:`) and unparseable bases
   * → null — a link graph wants navigable http(s) targets only.
   */
  private[pipeline] def resolveUrlKernel(base: String, href: String): String = {
    if (base == null || href == null) return null
    val h = href.trim
    if (h.isEmpty) return null
    val p = parse(base).getOrElse(return null)
    val origin = {
      val portPart = if (p.port >= 0) s":${p.port}" else ""
      s"${p.scheme}://${p.host}$portPart"
    }
    // scheme-prefixed href: hierarchical passes through, other → null
    val colon = h.indexOf(':')
    val slash = h.indexOf('/')
    if (colon > 0 && (slash < 0 || colon < slash)) {
      return if (h.substring(colon).startsWith("://")) h else null
    }
    if (h.startsWith("//")) return p.scheme + ":" + h
    val (pathPart, queryPart) = {
      val q = h.indexOf('?')
      val noFrag = (s: String) => {
        val f = s.indexOf('#'); if (f >= 0) s.substring(0, f) else s
      }
      if (q >= 0) (h.substring(0, q), noFrag(h.substring(q))) else (noFrag(h), "")
    }
    if (pathPart.isEmpty && queryPart.isEmpty) return null // pure fragment
    if (pathPart.isEmpty) {
      // query-only reference: RFC 3986 keeps the base path verbatim
      return origin + (if (p.path.isEmpty) "/" else p.path) + queryPart
    }
    if (pathPart.startsWith("/")) return origin + normalizePath(pathPart) + queryPart
    val baseDir = {
      val bp = if (p.path.isEmpty) "/" else p.path
      bp.substring(0, bp.lastIndexOf('/') + 1)
    }
    origin + normalizePath(baseDir + pathPart) + queryPart
  }

  /** [[resolveUrlKernel]] as a map-only Column; null-safe. */
  def resolveUrl(base: Column, href: Column): Column =
    F.udf((b: String, h: String) => Option(resolveUrlKernel(b, h)))
      .apply(base, href)

  // ---------------------------------------------------------------- //
  // Blocklist filtering (RefinedWeb/UT1-style URL screening)          //
  // ---------------------------------------------------------------- //

  /** True when `host` equals a blocked domain or sits under one.
    * Suffix-label walk — at most label-count set probes per host, so
    * the cost is independent of blocklist size. Substring matching
    * would be wrong twice over: `badsite.com.safe.org` must NOT block
    * (the walk only probes whole label suffixes), and probing every
    * blocklist entry per row would be O(list). */
  private[pipeline] def hostBlockedKernel(host: String, blocked: Set[String]): Boolean = {
    if (host == null || blocked.isEmpty) return false
    var s = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    var found = false
    var done = false
    while (!done) {
      if (blocked.contains(s)) { found = true; done = true }
      else {
        val dot = s.indexOf('.')
        if (dot < 0) done = true else s = s.substring(dot + 1)
      }
    }
    found
  }

  /** Keyword screen over the full URL string: `strict` patterns are
    * counted by substring containment anywhere in the lowercased URL;
    * `soft` words must appear as whole alphanumeric-delimited tokens
    * (so `bet` does not fire inside `alphabet`). Counts are DISTINCT
    * patterns hit, not occurrences. */
  private[pipeline] def keywordHitsKernel(
      url: String, strict: Seq[String], soft: Set[String]): (Int, Int) = {
    if (url == null) return (0, 0)
    val u = url.toLowerCase(java.util.Locale.ROOT)
    val strictHits = strict.count(u.contains(_))
    val toks = u.split("[^a-z0-9]+")
    var softHits = 0
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && soft.contains(t) && seen.add(t)) softHits += 1
      i += 1
    }
    (strictHits, softHits)
  }

  /** Blocklist predicate Column: parses the URL and suffix-matches the
    * host against `blockedDomains`. The set is broadcast ONCE — UT1
    * blocklists run to millions of domains, and a closure capture
    * would reship the set inside every task binary. Map-only;
    * NULL/unparseable URLs → false (they are filtered on their own
    * terms by canonicalization, not the blocklist). */
  def urlBlocked(
      spark: org.apache.spark.sql.SparkSession,
      url: Column,
      blockedDomains: Set[String]): Column = {
    val norm = blockedDomains.map(d =>
      d.toLowerCase(java.util.Locale.ROOT).stripPrefix(".").stripSuffix("."))
    val bc = spark.sparkContext.broadcast(norm)
    F.udf((u: String) => parse(u).exists(p => hostBlockedKernel(p.host, bc.value)))
      .apply(url)
  }

  /** `struct(strict_hits, soft_hits)` for the keyword screen — the
    * audit columns behind [[urlAllowed]]. */
  def urlKeywordHits(
      url: Column, strictSubstrings: Seq[String], softWords: Seq[String]): Column = {
    val strict = strictSubstrings.map(_.toLowerCase(java.util.Locale.ROOT))
    val soft = softWords.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val u = F.udf((s: String) => keywordHitsKernel(s, strict, soft))
    val hits = u(url)
    F.struct(hits.getField("_1").as("strict_hits"),
      hits.getField("_2").as("soft_hits"))
  }

  /** The composed RefinedWeb-style URL admission predicate: not
    * domain-blocked, zero strict keyword hits, and fewer than
    * `minSoftBlock` distinct soft-word hits. */
  def urlAllowed(
      spark: org.apache.spark.sql.SparkSession,
      url: Column,
      blockedDomains: Set[String],
      strictSubstrings: Seq[String],
      softWords: Seq[String],
      minSoftBlock: Int = 2): Column = {
    val hits = urlKeywordHits(url, strictSubstrings, softWords)
    !urlBlocked(spark, url, blockedDomains) &&
      hits.getField("strict_hits") === 0 &&
      hits.getField("soft_hits") < minSoftBlock
  }

  /** Filter a corpus by URL admissibility — the pre-fetch screen of a
    * crawl pipeline (map-only; the blocklist rides one broadcast). */
  def filterByUrl(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      blockedDomains: Set[String],
      strictSubstrings: Seq[String],
      softWords: Seq[String],
      minSoftBlock: Int = 2): org.apache.spark.sql.DataFrame =
    df.filter(urlAllowed(df.sparkSession, F.col(urlCol), blockedDomains,
      strictSubstrings, softWords, minSoftBlock))

  /** Lowercased host of a URL; NULL when unparseable. */
  def urlHost(url: Column): Column = {
    val u = F.udf { (s: String) =>
      parse(s).map(_.host.toLowerCase(java.util.Locale.ROOT)).orNull
    }
    u(url)
  }

  /**
   * Politeness scheduling for a fetch frontier: per HOST, fetch slots
   * serialize at `delayMs` apart (the crawl-delay contract) while
   * hosts proceed in parallel — slot i of a host fetches at
   * `startMs + i·delayMs`. Slot order is deterministic: highest
   * `priorityCol` first (when given), then URL ascending. Rows with
   * NULL/unparseable URLs are dropped. One hash exchange on the host;
   * a pathologically hot host is a REAL serialization (that is the
   * politeness contract), not a skew accident — cap a host's frontier
   * upstream (`Dedup.keepTopK`) if its tail must not stretch the
   * crawl. Emits the input columns plus (host, slot, fetch_at_ms).
   */
  def crawlSchedule(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      delayMs: Long,
      startMs: Long,
      priorityCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
    require(delayMs > 0, s"delayMs must be positive: $delayMs")
    val order = priorityCol
      .map(p => Seq(F.col(p).desc, F.col(urlCol).asc))
      .getOrElse(Seq(F.col(urlCol).asc))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("host")).orderBy(order: _*)
    df.withColumn("host", urlHost(F.col(urlCol)))
      .filter(F.col("host").isNotNull)
      .withColumn("slot", F.row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at_ms", F.lit(startMs) + F.col("slot") * F.lit(delayMs))
  }

  /** [[crawlSchedule]] with PER-HOST delays (robots.txt
    * `Crawl-delay`, via [[graft.sources.Robots.delayTable]]): each
    * host's slots space by its own delay; hosts absent from `delays`
    * use `defaultDelayMs`. The delay table is host-cardinality —
    * broadcast onto the frontier; everything else is the
    * [[crawlSchedule]] shape (the per-host window IS the politeness
    * contract). */
  def crawlScheduleWithDelays(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      delays: org.apache.spark.sql.DataFrame,
      defaultDelayMs: Long,
      startMs: Long,
      priorityCol: Option[String] = None): org.apache.spark.sql.DataFrame = {
    require(defaultDelayMs > 0, s"defaultDelayMs must be positive: $defaultDelayMs")
    val order = priorityCol
      .map(p => Seq(F.col(p).desc, F.col(urlCol).asc))
      .getOrElse(Seq(F.col(urlCol).asc))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("host")).orderBy(order: _*)
    df.withColumn("host", urlHost(F.col(urlCol)))
      .filter(F.col("host").isNotNull)
      .join(F.broadcast(delays.select(F.col("host"),
        F.col("delay_ms").as("__dm"))), Seq("host"), "left")
      .withColumn("delay_ms", F.coalesce(F.col("__dm"), F.lit(defaultDelayMs)))
      .withColumn("slot", F.row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at_ms",
        F.lit(startMs) + F.col("slot") * F.col("delay_ms"))
      .drop("__dm")
  }

  // ------------------------------------------------------------ sitemaps

  /** The five predefined XML entities plus numeric references — the
    * only escaping sitemap locs legally carry. */
  private def decodeXmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val decoded: String = ent match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          // toChars stays INSIDE the Try: an out-of-range code point
          // (&#x110000;, &#-1;) in crawled XML must fall through to the
          // append-'&'-verbatim path, never throw from the UDF
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            scala.util.Try(
              new String(Character.toChars(Integer.parseInt(e.substring(2), 16))))
              .toOption.orNull
          case e if e.startsWith("#") =>
            scala.util.Try(
              new String(Character.toChars(Integer.parseInt(e.substring(1)))))
              .toOption.orNull
          case _ => null
        }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Text content of the FIRST `<tag …>…</tag>` inside `block`,
    * entity-decoded and trimmed; null when absent/malformed. A prefix
    * collision (`<location` when scanning for `<loc`) is skipped, not
    * a dead end — the scan continues to the next candidate. */
  private def tagText(block: String, tag: String): String = {
    var from = 0
    while (from < block.length) {
      val open = block.indexOf("<" + tag, from)
      if (open < 0) return null
      val after = open + 1 + tag.length
      val boundary = after >= block.length || block.charAt(after) == '>' ||
        block.charAt(after) == ' ' || block.charAt(after) == '\t' ||
        block.charAt(after) == '\n' || block.charAt(after) == '/'
      if (!boundary) from = open + 1
      else {
        val gt = block.indexOf('>', open)
        if (gt < 0) return null
        val close = block.indexOf("</" + tag, gt)
        if (close < 0) return null
        return decodeXmlEntities(block.substring(gt + 1, close).trim)
      }
    }
    null
  }

  /** All `<wrap>…</wrap>` blocks of `xml`, lazily scanned. */
  private def blocks(xml: String, wrap: String): Iterator[String] =
    new Iterator[String] {
      private var at = 0
      private var nextBlock: String = advance()
      private def advance(): String = {
        while (true) {
          val open = xml.indexOf("<" + wrap, at)
          if (open < 0) return null
          val after = open + 1 + wrap.length
          val boundary = after >= xml.length || xml.charAt(after) == '>' ||
            Character.isWhitespace(xml.charAt(after))
          val gt = xml.indexOf('>', open)
          if (!boundary || gt < 0) { at = open + 1 }
          else {
            val close = xml.indexOf("</" + wrap, gt)
            if (close < 0) { at = xml.length; return null }
            at = close + 1
            return xml.substring(gt + 1, close)
          }
        }
        null
      }
      def hasNext: Boolean = nextBlock != null
      def next(): String = { val b = nextBlock; nextBlock = advance(); b }
    }

  private[pipeline] def parseSitemapKernel(xml: String)
      : Seq[(String, String, String, java.lang.Double)] =
    if (xml == null) Seq.empty
    else blocks(xml, "url").flatMap { b =>
      Option(tagText(b, "loc")).map { loc =>
        val pr = Option(tagText(b, "priority"))
          .flatMap(p => scala.util.Try(p.toDouble).toOption)
          .map(java.lang.Double.valueOf).orNull
        (loc, tagText(b, "lastmod"), tagText(b, "changefreq"), pr)
      }
    }.toSeq

  private[pipeline] def parseSitemapIndexKernel(xml: String): Seq[String] =
    if (xml == null) Seq.empty
    else blocks(xml, "sitemap").flatMap(b => Option(tagText(b, "loc"))).toSeq

  /**
   * Parse a sitemap document (sitemaps.org urlset XML) to its URL
   * entries: `array<struct<loc, lastmod, changefreq, priority>>` —
   * the crawl-frontier feed that pairs with [[crawlSchedule]]'s
   * priority column. Pure-JVM tag scan (the Warc/Pdf subset-parser
   * discipline: no XML library, one pass, bounded by the document),
   * XML entities in locs decoded, entries without a `<loc>` skipped,
   * malformed/NULL input → empty array, never an error.
   */
  def sitemapUrls(xml: Column): Column =
    F.udf((s: String) => parseSitemapKernel(s)).apply(xml)
      .cast("array<struct<loc:string,lastmod:string," +
        "changefreq:string,priority:double>>")

  /** Child sitemap locs of a `<sitemapindex>` document (the recursion
    * feed: fetch these, parse each with [[sitemapUrls]]). */
  def sitemapChildren(xml: Column): Column =
    F.udf((s: String) => parseSitemapIndexKernel(s)).apply(xml)

  /**
   * Resolve redirect CHAINS to their final destination by pointer
   * doubling: each round joins the map with itself (cur -> cur's
   * target), so a chain of length L resolves in ceil(log2 L) rounds —
   * never one join per hop, which is the difference between 5 and 32
   * shuffles on real crawl redirect data. Multiple outgoing edges per
   * source dedupe deterministically to the lexicographic min target.
   *
   * Returns one row per distinct source: (src, final_url, hops,
   * cycled). `cycled = true` means the walk exceeded `maxHops` —
   * true for every actual cycle (its hop count doubles past any
   * bound within the round budget) and for over-long chains, both of
   * which a crawl quarantines (final_url = wherever the walk stood).
   * Terminals are URLs with no outgoing edge. Each round
   * localCheckpoints lazily (library rule) to keep the self-join
   * lineage linear.
   */
  def resolveRedirectChains(
      edges: org.apache.spark.sql.DataFrame,
      srcCol: String,
      dstCol: String,
      maxHops: Int = 32): org.apache.spark.sql.DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    var f = edges
      .filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .groupBy(F.col(srcCol).as("src"))
      .agg(F.min(F.col(dstCol)).as("cur"))
      .withColumn("hops", F.lit(1L))
    val rounds = math.max(1,
      math.ceil(math.log(maxHops.toDouble) / math.log(2.0)).toInt + 1)
    var r = 0
    while (r < rounds) {
      val g = f.select(F.col("src").as("__s2"), F.col("cur").as("__c2"),
        F.col("hops").as("__h2"))
      f = f.join(g, f("cur") === g("__s2"), "left")
        .select(F.col("src"),
          F.coalesce(F.col("__c2"), F.col("cur")).as("cur"),
          (F.col("hops") + F.coalesce(F.col("__h2"), F.lit(0L))).as("hops"))
        .localCheckpoint(false)
      r += 1
    }
    f.select(F.col("src"), F.col("cur").as("final_url"), F.col("hops"),
      (F.col("hops") > maxHops).as("cycled"))
  }
}

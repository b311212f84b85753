package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * robots.txt parsing and URL screening (Robots Exclusion Protocol,
 * RFC 9309) — crawl politeness for the ingestion edge of the
 * pipeline.
 *
 * Semantics implemented from the public spec:
 *  - groups of `User-agent` lines followed by `Allow` / `Disallow`
 *    rules; keys case-insensitive; `#` comments stripped;
 *  - group selection: all groups naming the crawler's product token
 *    (case-insensitive exact match) merge; if none match, the `*`
 *    groups merge; no group → everything allowed;
 *  - rule matching: `*` matches any octet sequence, `$` anchors the
 *    pattern end; the MOST SPECIFIC (longest pattern) match decides,
 *    an allow/disallow tie at equal length resolves to allow; no
 *    matching rule → allowed;
 *  - an empty `Disallow:` value is a no-op (allows everything).
 *
 * Scale shape: robots bodies parse ONCE per host into a rule-row
 * table ([[ruleTable]]); screening a 100 TB URL list is then a plain
 * host-keyed join + per-(url, rule) wildcard probe + one windowed
 * longest-match pick — the robots text itself never rides the big
 * join, and nothing reparses per URL.
 */
object Robots {

  /** One parsed rule: allow/disallow + its path pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One `User-agent` group. `crawlDelay` is the group's
    * `Crawl-delay:` seconds when present (the de-facto extension —
    * not in RFC 9309, but honored by major crawlers; last one in the
    * group wins). */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  /** Parse a robots.txt body into groups. Null/garbage → no groups
    * (which screens as allow-everything), never an error. */
  def parse(txt: String): Seq[Group] = {
    if (txt == null) return Seq.empty
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = false // consecutive user-agent lines share one group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
      delay = None
    }
    txt.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            inAgents = true
            if (value.nonEmpty)
              agents += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules += Rule(key == "allow", value)
          case "crawl-delay" =>
            inAgents = false
            delay = scala.util.Try(value.toDouble).toOption
              .filter(d => d >= 0 && d.isFinite).orElse(delay)
          case _ => inAgents = false // sitemap, unknown
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The merged rule set RFC 9309 group selection yields for
    * `agent`: matching-token groups, else the `*` groups. */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val named = groups.filter(_.agents.contains(a))
    val chosen = if (named.nonEmpty) named
      else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** The crawl delay (seconds) group selection yields for `agent`:
    * the max over the selected groups' delays (conservative when the
    * merged groups disagree); None when unspecified. */
  def crawlDelayFor(groups: Seq[Group], agent: String): Option[Double] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val named = groups.filter(_.agents.contains(a))
    val chosen = if (named.nonEmpty) named
      else groups.filter(_.agents.contains("*"))
    val ds = chosen.flatMap(_.crawlDelay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** `Sitemap:` URLs of a robots body — host-wide per the de-facto
    * standard (group position is irrelevant), in file order. */
  def sitemapsIn(txt: String): Seq[String] = {
    if (txt == null) return Seq.empty
    txt.split("\n").toSeq.flatMap { raw =>
      val noComment = {
        val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }
  }

  /** `*`/`$` wildcard match of `pattern` against the start of
    * `path` (RFC 9309 matching). Iterative greedy-with-backtrack. */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern == null || path == null) return false
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starP = -1; var starS = -1
    while (si < path.length) {
      if (pi >= p.length && !anchored) return true // prefix consumed
      if (pi < p.length && p.charAt(pi) == '*') { starP = pi; pi += 1; starS = si }
      else if (pi < p.length && p.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starP >= 0) { starS += 1; si = starS; pi = starP + 1 }
      else return false
      if (pi >= p.length && !anchored) return true
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi >= p.length && (!anchored || si >= path.length)
  }

  /** Longest-match decision over a merged rule set; tie → allow; no
    * match → allowed. Driver-side form (tests, tiny crawls). */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val hit = rules.filter(r => matches(r.pattern, path))
    if (hit.isEmpty) true
    else {
      val best = hit.map(_.pattern.length).max
      hit.exists(r => r.allow && r.pattern.length == best)
    }
  }

  // ---------------------------------------------------------------- //
  // Spark surface                                                     //
  // ---------------------------------------------------------------- //

  /**
   * Parse a (host, robots body) table into rule rows for `agent`:
   * (host, allow BOOLEAN, pattern STRING, spec INT = pattern length).
   * One parse per host — this is the small side of the screen join.
   */
  def ruleTable(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val rulesU = F.udf((txt: String) =>
      rulesFor(parse(txt), agent).map(r => (r.allow, r.pattern)))
    robots
      .select(F.col(hostCol).as("host"),
        F.explode(rulesU(F.col(txtCol))).as("__r"))
      .select(F.col("host"), F.col("__r._1").as("allow"),
        F.col("__r._2").as("pattern"),
        F.length(F.col("__r._2")).as("spec"))
  }

  /**
   * Screen URLs against a [[ruleTable]]: adds `allowed`. `urls` keeps
   * all its columns; hosts with no rules (or no robots row) screen as
   * allowed. The rule side is broadcast when small; pass
   * `broadcastRules = false` for planet-scale rule tables.
   */
  def screen(urls: DataFrame, rules: DataFrame, hostCol: String,
      pathCol: String, broadcastRules: Boolean = true): DataFrame = {
    val matchU = F.udf((pattern: String, path: String) => matches(pattern, path))
    val r0 = if (broadcastRules) F.broadcast(rules) else rules
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__h", "__p")
      .orderBy(F.col("spec").desc, F.col("allow").desc)
    val decisions = urls
      .select(F.col(hostCol).as("__h"), F.col(pathCol).as("__p")).distinct()
      .join(r0, F.col("__h") === r0("host"))
      .filter(matchU(F.col("pattern"), F.col("__p")))
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
      .select(F.col("__h"), F.col("__p"), F.col("allow").as("__decision"))
    urls
      .join(decisions, F.col(hostCol) === F.col("__h") &&
        F.col(pathCol) === F.col("__p"), "left")
      .withColumn("allowed", F.coalesce(F.col("__decision"), F.lit(true)))
      .drop("__h", "__p", "__decision")
  }

  /** Per-host politeness table from robots bodies:
    * (host, delay_ms BIGINT, n_sitemaps) — the [[ruleTable]] sibling
    * feeding [[graft.pipeline.Urls.crawlScheduleWithDelays]]. Hosts
    * without a crawl-delay get `defaultDelayMs`. */
  def delayTable(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String, defaultDelayMs: Long): DataFrame = {
    val dU = F.udf((txt: String) => {
      val g = parse(txt)
      val d = crawlDelayFor(g, agent)
        .map(sec => math.round(sec * 1000.0)).getOrElse(defaultDelayMs)
      (d, sitemapsIn(txt).length)
    })
    robots.select(F.col(hostCol).as("host"), dU(F.col(txtCol)).as("__d"))
      .select(F.col("host"), F.col("__d._1").as("delay_ms"),
        F.col("__d._2").as("n_sitemaps"))
  }
}

package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val txt =
    """# politeness
      |User-agent: GraftBot
      |User-agent: OtherBot
      |Disallow: /private
      |Allow: /private/pub
      |Disallow: /cgi*.cgi$
      |Disallow:
      |
      |User-agent: *
      |Disallow: /
      |Crawl-delay: 10
      |""".stripMargin

  test("parse groups, comments, shared agent lines, empty disallow no-op") {
    val gs = Robots.parse(txt)
    assert(gs.size == 2)
    assert(gs.head.agents == Seq("graftbot", "otherbot"))
    assert(gs.head.rules == Seq(
      Robots.Rule(false, "/private"), Robots.Rule(true, "/private/pub"),
      Robots.Rule(false, "/cgi*.cgi$")))
    assert(gs(1).agents == Seq("*") && gs(1).rules == Seq(Robots.Rule(false, "/")))
    assert(Robots.parse(null).isEmpty)
    assert(Robots.parse("random garbage\nno colons here").isEmpty)
  }

  test("group selection: named token beats *, unknown agent falls to *") {
    val gs = Robots.parse(txt)
    assert(Robots.rulesFor(gs, "graftbot").size == 3)
    assert(Robots.rulesFor(gs, "GRAFTBOT").size == 3)
    assert(Robots.rulesFor(gs, "nobody") == Seq(Robots.Rule(false, "/")))
    assert(Robots.rulesFor(Seq.empty, "x").isEmpty)
  }

  test("wildcard and anchor matching") {
    assert(Robots.matches("/private", "/private/a"))
    assert(!Robots.matches("/private", "/priv"))
    assert(Robots.matches("/cgi*.cgi$", "/cgi-bin/run.cgi"))
    assert(!Robots.matches("/cgi*.cgi$", "/cgi-bin/run.cgi?x"))
    assert(Robots.matches("/a*b*c", "/aXXbYYc-and-more"))
    assert(Robots.matches("*.pdf$", "/docs/file.pdf"))
    assert(!Robots.matches("*.pdf$", "/docs/file.pdfx"))
    assert(Robots.matches("/", "/anything"))
    assert(Robots.matches("", "/anything")) // empty pattern = match-all
  }

  test("longest match decides; equal-length tie resolves to allow") {
    val rules = Robots.rulesFor(Robots.parse(txt), "graftbot")
    assert(Robots.isAllowed(rules, "/index.html"))        // no rule
    assert(!Robots.isAllowed(rules, "/private/a"))        // disallow 8
    assert(Robots.isAllowed(rules, "/private/pub/x"))     // allow 12 wins
    assert(!Robots.isAllowed(rules, "/cgi-bin/run.cgi"))  // wildcard+$
    assert(Robots.isAllowed(rules, "/cgi-bin/run.cgi?x")) // $ blocks
    val tie = Seq(Robots.Rule(false, "/a/b"), Robots.Rule(true, "/a/c"))
    assert(Robots.isAllowed(tie, "/a"))
    val sameLen = Seq(Robots.Rule(false, "/page"), Robots.Rule(true, "/page"))
    assert(Robots.isAllowed(sameLen, "/page/x")) // tie -> allow
  }

  test("Spark screen: rule table join matches the driver-side decisions") {
    val robots = Seq(("h1.com", txt), ("h2.com", "User-agent: *\nDisallow: /x"))
      .toDF("host", "robots")
    val rules = Robots.ruleTable(robots, "host", "robots", "GraftBot")
    // h1 rules come from the named group (3 rules), h2 from *
    assert(rules.filter(F.col("host") === "h1.com").count() == 3)
    val urls = Seq(
      ("h1.com", "/private/a"), ("h1.com", "/private/pub/ok"),
      ("h1.com", "/cgi-bin/run.cgi"), ("h1.com", "/free"),
      ("h2.com", "/x/y"), ("h2.com", "/ok"),
      ("h3.com", "/no-robots-here")).toDF("host", "path")
    val got = Robots.screen(urls, rules, "host", "path")
      .as[(String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("h1.com", "/private/a", false), ("h1.com", "/private/pub/ok", true),
      ("h1.com", "/cgi-bin/run.cgi", false), ("h1.com", "/free", true),
      ("h2.com", "/x/y", false), ("h2.com", "/ok", true),
      ("h3.com", "/no-robots-here", true)))
  }

  test("crawl-delay and sitemap extraction: group scoping, agent precedence") {
    val txt =
      """User-agent: fastbot
        |Crawl-delay: 0.5
        |Disallow: /x
        |
        |User-agent: *
        |Disallow: /private
        |Crawl-delay: 3
        |Sitemap: https://h/a.xml
        |
        |User-agent: otherbot
        |Sitemap: https://h/b.xml
        |""".stripMargin
    val g = Robots.parse(txt)
    assert(Robots.crawlDelayFor(g, "fastbot") === Some(0.5))
    assert(Robots.crawlDelayFor(g, "unknown") === Some(3.0)) // * fallback
    assert(Robots.crawlDelayFor(g, "otherbot") === None)     // named, no delay
    // sitemaps are host-wide regardless of group position
    assert(Robots.sitemapsIn(txt) === Seq("https://h/a.xml", "https://h/b.xml"))
    assert(Robots.sitemapsIn(null).isEmpty)
    // malformed delays are ignored, keeping any earlier valid one
    val g2 = Robots.parse("User-agent: *\nCrawl-delay: 2\nCrawl-delay: nope")
    assert(Robots.crawlDelayFor(g2, "any") === Some(2.0))
  }
}

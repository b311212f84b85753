package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Keywords: broadcast Aho-Corasick multi-pattern scanning. */
class KeywordsSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force reference: total occurrences at every position. */
  private def ref(text: String, patterns: Seq[String]): (Long, Int) = {
    if (text == null) return (0L, 0)
    val per = patterns.distinct.map { p =>
      var c = 0L
      var from = 0
      var i = text.indexOf(p, from)
      while (i >= 0) { c += 1; from = i + 1; i = text.indexOf(p, from) }
      c
    }
    (per.sum, per.count(_ > 0))
  }

  test("scan matches the brute-force reference, including overlaps and nesting") {
    val patterns = Seq("he", "she", "his", "hers", "aba", "bad", "badword")
    val texts = Seq(
      "ushers", "she said hers is his", "ababab", "badword bad",
      "no match at all xyz", "", "hehehehe", "abababa", null)
    val auto = Keywords.buildAutomaton(patterns)
    texts.foreach { t =>
      assert(auto.scan(t) === ref(t, patterns), s"text='$t'")
    }
    // seeded random fuzz over a tiny alphabet (dense match structure)
    val r = new scala.util.Random(99)
    val fuzzPats = Seq("ab", "ba", "aab", "bb", "aba")
    val fa = Keywords.buildAutomaton(fuzzPats)
    for (_ <- 1 to 200) {
      val t = (0 until r.nextInt(30)).map(_ => if (r.nextBoolean()) 'a' else 'b').mkString
      assert(fa.scan(t) === ref(t, fuzzPats), s"fuzz text='$t'")
    }
  }

  test("keywordHits and filterByKeywords over a corpus, map-only") {
    val df = Seq(
      (1L, "clean text here"), (2L, "contains badword twice badword"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val hits = Keywords.keywordHits(df, F.col("text"), Seq("badword", "clean"))
      .select(F.col("id"), F.col("kw.hits"), F.col("kw.patterns"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(hits(1L) === ((1L, 1)))
    assert(hits(2L) === ((2L, 1)))
    assert(hits(3L) === ((0L, 0)))
    val kept = Keywords.filterByKeywords(df, F.col("text"), Seq("badword"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
    val plan = Keywords.keywordHits(
        sf("sf0.001", "documents"), F.col("text"), Seq("foo", "bar"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("scrub stars out the union of matched spans, length-preserving") {
    val auto = Keywords.buildAutomaton(Seq("he", "she", "hers"))
    // "ushers": she@1-3, he@2-3, hers@2-5 -> union masks 1..5
    assert(auto.scrub("ushers", '*') === "u*****")
    assert(auto.scrub("nothing here", '*') === "nothing **re")
    assert(auto.scrub("clean", '*') === "clean")
    assert(auto.scrub(null, '*') === null)
    assert(auto.scrub("", '*') === "")
    // reference: scrubbed == original everywhere outside spans, and
    // every occurrence is fully masked (seeded fuzz)
    val r = new scala.util.Random(17)
    val pats = Seq("ab", "bba", "aab")
    val fa = Keywords.buildAutomaton(pats)
    for (_ <- 1 to 200) {
      val t = (0 until r.nextInt(25)).map(_ => if (r.nextBoolean()) 'a' else 'b').mkString
      val out = fa.scrub(t, '*')
      assert(out.length === t.length)
      pats.foreach { p =>
        var i = t.indexOf(p)
        while (i >= 0) {
          assert(out.substring(i, i + p.length).forall(_ == '*'),
            s"t='$t' p='$p' at $i -> '$out'")
          i = t.indexOf(p, i + 1)
        }
      }
      // unmasked chars are untouched
      t.indices.foreach { i =>
        if (out(i) != '*') assert(out(i) === t(i))
      }
    }
    val df = Seq((1L, "say she said")).toDF("id", "text")
    val got = Keywords.scrubKeywords(df, F.col("text"), Seq("she"), "clean")
      .select("clean").as[String].collect().head
    assert(got === "say *** said")
  }

  test("folded scan matches case/fullwidth/ligature variants; case-insensitive scrub preserves positions") {
    // unicode-fold + lowercase: fullwidth caps, ligature, accents all hit
    val df = Seq(
      (0L, "plain SpamWord here"),            // mixed case
      (1L, "ＳＰＡＭＷＯＲＤ fullwidth"),      // fullwidth caps → NFKC → SPAMWORD
      (2L, "ligature ﬁlter stop"),            // ﬁ → fi
      (3L, "café naïve nothing")              // accents fold, no pattern
    ).toDF("id", "text")
    val hits = Keywords.keywordHits(df, F.col("text"),
        Seq("spamword", "filter"), folded = true)
      .select(F.col("id"), F.col("kw.hits")).as[(Long, Long)].collect().toMap
    assert(hits === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
    // unfolded scan sees none of the variants
    val plain = Keywords.keywordHits(df, F.col("text"), Seq("spamword", "filter"))
      .select(F.col("id"), F.col("kw.hits")).as[(Long, Long)].collect().toMap
    assert(plain === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    // folded filter admits only the clean row
    assert(Keywords.filterByKeywords(df, F.col("text"),
      Seq("spamword", "filter"), folded = true)
      .select("id").as[Long].collect().toSeq === Seq(3L))
    // case-insensitive scrub: ORIGINAL text positions masked,
    // length preserved
    val sc = Keywords.scrubKeywords(
        Seq((1L, "say SHE Said she")).toDF("id", "text"),
        F.col("text"), Seq("she"), "clean", caseInsensitive = true)
      .select("clean").as[String].collect().head
    assert(sc === "say *** Said ***")
  }

  test("automaton scales: 100k patterns build and scan in bounded time") {
    val r = new scala.util.Random(5)
    val pats = (1 to 100000).map(i =>
      s"kw${i}_" + Array.fill(4)(('a' + r.nextInt(26)).toChar).mkString)
    val t0 = System.nanoTime()
    val auto = Keywords.buildAutomaton(pats)
    val built = (System.nanoTime() - t0) / 1e9
    assert(built < 30.0, s"build took ${built}s")
    val text = ("filler words " * 200) + pats(12345) + " tail " + pats(999)
    assert(auto.scan(text)._1 === 2L)
    assert(auto.scan(text)._2 === 2)
  }
}

package graft.pipeline

import org.apache.spark.sql.{functions => F}
import graft.SparkTestBase

class GopherRulesSpec extends SparkTestBase {
  import GopherRules.repStats

  test("duplicate line and paragraph fractions count occurrences beyond the first") {
    val r = repStats("a\nb\na", topN = 2, dupN = 5)
    assert(r.lines == 3L)
    assert(r.dup_line_frac == 1.0 / 3.0)   // one extra 'a'
    assert(r.dup_line_char_frac == 1.0 / 3.0) // 1 dup char of 3
    assert(r.paras == 1L) // no blank-line separator

    val p = repStats("x y\n\nx y\n\nz", topN = 2, dupN = 5)
    assert(p.paras == 3L)
    assert(p.dup_para_frac == 1.0 / 3.0)
    assert(p.dup_para_char_frac == 3.0 / 7.0) // "x y" twice (3+3) + "z"
    // the same text seen line-wise: split on \n drops the empties
    assert(p.lines == 3L && p.dup_line_frac == 1.0 / 3.0)
  }

  test("top-2-gram char fraction breaks count ties lexicographically") {
    // 2-grams of [a b a b a]: "a b" x2, "b a" x2 → tie → "a b" wins
    val r = repStats("a b a b a", topN = 2, dupN = 5)
    assert(r.top_gram_char_frac == 6.0 / 9.0) // 2 * len("a b") / len("a b a b a")
  }

  test("dup-5-gram char fraction counts all occurrences of repeated grams") {
    // tokens: the 5-gram "a b c d e" occurs twice (positions 0 and 5),
    // total chars = len("a b c d e a b c d e f") = 21
    val r = repStats("a b c d e a b c d e f", topN = 2, dupN = 5)
    assert(r.dup_gram_char_frac == 18.0 / 21.0)
    // no repeated 5-gram → 0
    assert(repStats("a b c d e f", topN = 2, dupN = 5).dup_gram_char_frac == 0.0)
  }

  test("empty and sub-n inputs are zeros, NULL is NULL, case-insensitive grams") {
    val z = repStats("   ", topN = 2, dupN = 5)
    assert(z.lines == 0L && z.dup_line_frac == 0.0 && z.top_gram_char_frac == 0.0)
    assert(repStats("word", topN = 2, dupN = 5).top_gram_char_frac == 0.0)
    assert(repStats("A b a B", topN = 2, dupN = 5).top_gram_char_frac == 6.0 / 7.0)
    val df = spark.range(1).select(
      GopherRules.repetitionStats(F.lit(null).cast("string")).as("r"))
    assert(df.select("r").collect().head.isNullAt(0))
  }

  test("structural quality stats match hand counts") {
    val session = spark
    import session.implicits._
    val text = "- The quick brown fox of doom ...\n* bullet two\nplain line ends…"
    val row = Seq(text).toDF("text")
      .select(GopherRules.qualityStats(F.col("text")).as("q"))
      .select("q.*").collect().head
    assert(row.getAs[Long]("words") == 14L)
    assert(row.getAs[Double]("bullet_line_frac") == 2.0 / 3.0)
    assert(row.getAs[Double]("ellipsis_line_frac") == 2.0 / 3.0) // "..." and "…"
    // symbols: one "..." + one "…" = 2
    assert(row.getAs[Double]("symbol_word_ratio") == 2.0 / 14.0)
    assert(row.getAs[Long]("stopword_hits") == 2L) // the, of
    // alpha words: all except "-", "..." and "*" → 11/14
    assert(row.getAs[Double]("alpha_word_frac") == 11.0 / 14.0)
  }

  test("verdict: fluent doc keeps, spam fails the named rules") {
    val session = spark
    import session.implicits._
    // 62 distinct words (no repeated n-gram anywhere), two stopwords
    val good = "the of " + (0 until 60).map(i => s"alpha$i").mkString(" ")
    val spam = Array.fill(60)("buy buy buy").mkString("\n")
    val out = GopherRules.annotate(
      Seq((1L, good), (2L, spam), (3L, null)).toDF("id", "text"), "text")
    val keep = out.select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep(1L) && !keep(2L) && !keep(3L))
    val spamRow = out.filter(F.col("id") === 2).select("rep.*").collect().head
    assert(spamRow.getAs[Double]("dup_line_frac") == 59.0 / 60.0)
  }
}

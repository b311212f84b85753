package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class DataCardSpec extends SparkTestBase {
  import spark.implicits._

  test("sourceCards: exact stats, dup counting, deterministic lang-mode tie-break") {
    val docs = Seq(
      // source A: 4 docs, one exact dup pair, lang tie en(2) vs de(2)
      ("A", "en", "hello world"),
      ("A", "en", "hello world"),          // exact dup
      ("A", "de", "hallo"),
      ("A", "de", "welt"),
      // source B: NULL text excluded; all-NULL langs keep NULL top_lang
      ("B", null, "solo"),
      ("B", null, null))
      .toDF("source", "lang", "text")
    val card = DataCard.sourceCards(docs, "source", "lang", "text")
      .orderBy("source")
      .select("source", "n_docs", "bytes", "n_langs", "dup_docs",
        "top_lang", "top_lang_docs")
      .collect()
    val a = card(0)
    assert(a.getString(0) === "A")
    assert(a.getLong(1) === 4L)
    assert(a.getLong(2) === ("hello world".length * 2 + 5 + 4).toLong)
    assert(a.getLong(3) === 2L)
    assert(a.getLong(4) === 1L)            // one duplicated text
    assert(a.getString(5) === "en")        // tie en/de → larger tag? no:
    // (2,"en") vs (2,"de"): struct max compares count then tag → "en"
    assert(a.getLong(6) === 2L)
    val b = card(1)
    assert(b.getString(0) === "B")
    assert(b.getLong(1) === 1L)            // NULL text dropped
    assert(b.isNullAt(5))                  // no non-NULL lang → NULL mode
  }

  test("sourceCards length sketch carries the per-source distribution") {
    val docs = Seq(("S", "en", "x" * 10), ("S", "en", "x" * 20), ("S", "en", "x" * 30))
      .toDF("source", "lang", "text")
    val p50 = DataCard.sourceCards(docs, "source", "lang", "text")
      .select(graft.sketch.functions.ddsketch_quantile(F.col("len_sketch"), 0.5))
      .as[Double].head()
    assert(math.abs(p50 - 20.0) <= 20.0 * 0.02, s"p50 $p50")
  }
}

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

  test("cardsFromViews over incremental views equals the one-shot sourceCards") {
    val docs = sf("sf0.001", "documents")
      .withColumn("ts",
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val base = java.nio.file.Files
      .createTempDirectory("graft_card_views").toString
    DataCard.materializeCardViews(docs.filter(F.col("doc_id") % 2 === 0),
      "source", "lang", "text", "ts", base)
    DataCard.appendCardViews(docs.filter(F.col("doc_id") % 2 =!= 0),
      "source", "lang", "text", "ts", base)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(F.col("source"), F.col("n_docs"), F.col("bytes"),
        F.col("n_langs"), F.col("dup_docs"),
        F.col("top_lang"), F.col("top_lang_docs"),
        graft.sketch.functions.ddsketch_quantile(F.col("len_sketch"), 0.5)
          .as("p50"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1).toString).toMap
    val fromViews = shape(DataCard.cardsFromViews(spark, base))
    val oneShot = shape(DataCard.sourceCards(docs, "source", "lang", "text"))
    assert(fromViews === oneShot)  // len sketch bins are exact adds -> same p50
    assert(fromViews.nonEmpty)
  }

  test("compactCardViews rewrites every view without changing the card") {
    val docs = sf("sf0.001", "documents")
      .withColumn("ts",
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val base = java.nio.file.Files
      .createTempDirectory("graft_card_compact").toString
    DataCard.materializeCardViews(docs.filter(F.col("doc_id") % 2 === 0),
      "source", "lang", "text", "ts", base)
    DataCard.appendCardViews(docs.filter(F.col("doc_id") % 2 =!= 0),
      "source", "lang", "text", "ts", base)
    def shape() = DataCard.cardsFromViews(spark, base)
      .select("source", "n_docs", "bytes", "n_langs", "dup_docs",
        "top_lang", "top_lang_docs")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1).toString).toMap
    val before = shape()
    DataCard.compactCardViews(spark, base)
    assert(shape() === before)
    // physically one row per (bucket, keys) in each view now
    Seq("len", "bytes", "texts", "langs").foreach { sub =>
      val raw = spark.read.parquet(s"$base/$sub")
      val dups = raw.groupBy("bucket_ms",
          raw.columns.filter(c => c != "bucket_ms" && c != "sketch" &&
            !c.startsWith("__")): _*)
        .count().filter(F.col("count") > 1).count()
      assert(dups === 0L, s"view $sub not compacted")
    }
  }

  test("expireCardViews drops an ingest day; the card reflects the kept window") {
    val day = 86400000L
    val base0 = 472224L * 3600000L
    val docs = sf("sf0.001", "documents").limit(200)
    val d1 = docs.withColumn("ts",
      F.lit(new java.sql.Timestamp(base0)))
    val d2 = docs.withColumn("ts",
      F.lit(new java.sql.Timestamp(base0 + day)))
    val base = java.nio.file.Files
      .createTempDirectory("graft_card_exp").toString
    DataCard.materializeCardViews(d1, "source", "lang", "text", "ts", base)
    DataCard.appendCardViews(d2, "source", "lang", "text", "ts", base)
    def nDocs() = DataCard.cardsFromViews(spark, base)
      .agg(F.sum("n_docs")).collect()(0).getLong(0)
    val both = nDocs()
    val dropped = DataCard.expireCardViews(spark, base, keepFromMs = base0 + day)
    assert(dropped === 4) // one day partition per view
    assert(nDocs() === both / 2) // only day 2 remains
  }
}

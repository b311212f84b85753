package graft.pipeline

import graft.SparkTestBase
// (splitLeakageMatrix spec lives at the end of this suite)
import org.apache.spark.sql.{functions => F}

class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: one long page, one unrelated page, one page sharing SOME grams
  private def corpus = Seq(
    (10L, (1 to 60).map(i => s"w$i").mkString(" ")),            // the source page
    (20L, (200 to 260).map(i => s"w$i").mkString(" ")),         // unrelated
    (30L, ((1 to 10) ++ (500 to 550)).map(i => s"w$i").mkString(" "))
  ).toDF("id", "text")

  test("quote of a page is contained; Jaccard would miss it") {
    // probe: tokens 5..34 of page 10 — a 30-token quote
    val probe = Seq((99L, (5 to 34).map(i => s"w$i").mkString(" ")))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(probe, corpus, "id", "text",
        gramSize = 5, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 26 grams, all inside page 10 -> containment exactly 1.0
    assert(out == Set((99L, 10L, 26L, 26L)))
    // sanity: Jaccard of the same pair is far below any dedup threshold
    // (26 shared grams vs 56 grams in the page) — the asymmetric measure
    // is the point of the operator
    assert(26.0 / 56.0 < 0.5)
  }

  test("below-threshold overlap and disjoint docs emit nothing") {
    val probe = Seq(
      (98L, (1 to 14).map(i => s"w$i").mkString(" ")),   // 10 grams, all in 10; but
      (97L, (300 to 320).map(i => s"w$i").mkString(" ")) // disjoint from corpus
    ).toDF("id", "text")
    val out = Dedup.containmentPairs(probe, corpus, "id", "text",
        gramSize = 5, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 98's grams w1..w14: grams 1..10 all inside page 10 (containment 1.0);
    // page 30 holds only grams over w1..w10 -> 6 of 10 grams -> 0.6 < 0.9
    assert(out == Set((98L, 10L, 10L, 10L)))
  }

  test("self-pairs are excluded when probe ids exist in the corpus") {
    val probe = corpus.filter(F.col("id") === 10L)
    val out = Dedup.containmentPairs(probe, corpus, "id", "text",
        gramSize = 5, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.isEmpty)
  }

  test("stop grams leave numerator AND denominator: containment survives boilerplate") {
    // every corpus doc shares the same 6-token boilerplate header, so its
    // grams have df = all docs; with maxDf = 2 they become stop grams
    val header = "terms of service apply here now"
    val c = Seq(
      (1L, header + " " + (1 to 40).map(i => s"a$i").mkString(" ")),
      (2L, header + " " + (100 to 140).map(i => s"a$i").mkString(" ")),
      (3L, header + " " + (200 to 240).map(i => s"a$i").mkString(" "))
    ).toDF("id", "text")
    // probe 9 is PURE boilerplate; probe 8 adds a few words of page 1
    val probe = Seq((9L, header), (8L, header + " a1 a2 a3")).toDF("id", "text")
    val strict = Dedup.containmentPairs(probe, c, "id", "text",
        gramSize = 5, threshold = 0.9, maxDf = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // grams fully inside the shared header are df=3 -> stop. Probe 9 has
    // no surviving grams -> no pairs at all; probe 8's surviving grams
    // (those crossing into a1..a3) exist only in page 1 -> exactly one
    // pair with containment 1.0 over the 3 distinctive grams
    assert(strict == Set((8L, 1L, 3L, 3L)))
    val noCap = Dedup.containmentPairs(probe, c, "id", "text",
        gramSize = 5, threshold = 0.9, maxDf = Int.MaxValue)
      .as[(Long, Long, Long, Long)].collect()
    // without the cap the pure-boilerplate probe "matches" all three
    // pages — exactly the false-positive mode the stop-gram rule removes
    assert(noCap.filter(_._1 == 9L).map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("persisted index probe equals the direct path; stop markers survive parquet") {
    val header = "terms of service apply here now"
    val c = Seq(
      (1L, header + " " + (1 to 40).map(i => s"a$i").mkString(" ")),
      (2L, header + " " + (100 to 140).map(i => s"a$i").mkString(" ")),
      (3L, header + " " + (200 to 240).map(i => s"a$i").mkString(" "))
    ).toDF("id", "text")
    val probe = Seq((9L, header), (8L, header + " a1 a2 a3")).toDF("id", "text")
    val direct = Dedup.containmentPairs(probe, c, "id", "text",
      gramSize = 5, threshold = 0.9, maxDf = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_cidx").toString
    Dedup.saveSignatureIndex(
      Dedup.buildContainmentIndex(c, "id", "text", gramSize = 5, maxDf = 2), dir)
    val loaded = Dedup.loadSignatureIndex(spark, dir)
    // the stop markers persisted (id NULL rows)
    assert(loaded.filter(F.col("id").isNull).count() > 0)
    val indexed = Dedup.probeContainment(probe, loaded, "id", "text",
      gramSize = 5, threshold = 0.9)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(indexed == direct && direct == Set((8L, 1L, 3L, 3L)))
  }

  test("short/null texts produce no grams and no pairs") {
    val probe = Seq((1L, "just four words here"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(probe, corpus, "id", "text",
      gramSize = 5, threshold = 0.9)
    assert(out.collect().isEmpty)
  }

  test("splitLeakageMatrix: planted cross-split leak counted exactly, clean splits empty") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"  // one 8-gram
    val docs = Seq(
      (1L, "train", s"$shared plus trailing words here"),
      (2L, "train", "completely unrelated training text body one two three"),
      (3L, "val", s"prefix words then $shared"),
      (4L, "val", "another unrelated validation document body four five six"),
      (5L, "test", "the third split shares nothing with anyone at all ever"))
      .toDF("id", "sp", "text")
    val m = Decontaminate.splitLeakageMatrix(docs, "id", "text", "sp", n = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly one leaking pair: train<->val over the planted 8-gram
    assert(m.length === 1)
    val (a, b, g, la, lb) = m.head
    assert(a === "train" && b === "val")
    assert(g === 1L && la === 1L && lb === 1L)
    // widening the shared region raises the gram count, not the doc counts
    val docs2 = docs.withColumn("text",
      F.when(F.col("id") === 1L,
        F.lit(s"$shared iota kappa plus trailing words here"))
       .when(F.col("id") === 3L,
        F.lit(s"prefix words then $shared iota kappa")).otherwise(F.col("text")))
    val m2 = Decontaminate.splitLeakageMatrix(docs2, "id", "text", "sp", n = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m2.head._3 === 3L) // 8-grams of a 10-token shared run
  }

  test("incrementalSplitLeakage equals the full recompute on the grown corpus") {
    val docs = sf("sf0.001", "documents").filter(F.col("text").isNotNull)
      .withColumn("sp",
        F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
          < "cccd", "train").otherwise("val"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("split_a", "split_b", "shared_grams",
          "leaked_docs_a", "leaked_docs_b")
        .collect().map(_.toSeq).toSet
    val path = java.nio.file.Files
      .createTempDirectory("graft_leak_idx").toString + "/idx"
    // night 0: index the even half; nights 1 and 2 deliver the rest in
    // two deltas — only the delta is ever tokenized
    Dedup.saveSignatureIndex(
      Decontaminate.buildLeakageIndex(
        docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", "sp"),
      path)
    Decontaminate.incrementalSplitLeakage(spark, path,
      docs.filter(F.col("doc_id") % 4 === 1), "doc_id", "text", "sp")
    val inc = Decontaminate.incrementalSplitLeakage(spark, path,
      docs.filter(F.col("doc_id") % 4 === 3), "doc_id", "text", "sp")
    val full = Decontaminate.splitLeakageMatrix(docs, "doc_id", "text", "sp")
    assert(rows(inc) === rows(full) && rows(inc).nonEmpty)
    // the index form alone equals the text form too
    assert(rows(Decontaminate.leakageMatrixFromIndex(
      Dedup.loadSignatureIndex(spark, path))) === rows(full))
  }

  test("stateful leakage audit: delta-bounded updates equal the full recompute") {
    val docs = sf("sf0.001", "documents").filter(F.col("text").isNotNull)
      .withColumn("sp",
        F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
          < "cccd", "train").otherwise("val"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("split_a", "split_b", "shared_grams",
          "leaked_docs_a", "leaked_docs_b")
        .collect().map(_.toSeq).toSet
    val path = java.nio.file.Files
      .createTempDirectory("graft_leak_state").toString + "/st"
    Decontaminate.initLeakageState(spark, path,
      docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", "sp")
    Decontaminate.updateLeakageState(spark, path,
      docs.filter(F.col("doc_id") % 4 === 1), "doc_id", "text", "sp",
      batchId = 0L)
    val m = Decontaminate.updateLeakageState(spark, path,
      docs.filter(F.col("doc_id") % 4 === 3), "doc_id", "text", "sp",
      batchId = 1L)
    val full = Decontaminate.splitLeakageMatrix(docs, "doc_id", "text", "sp")
    assert(rows(m) === rows(full) && rows(m).nonEmpty)
    // re-running a failed night with the SAME id converges (own-batch
    // rows excluded from reads, overwritten by writes)
    val replay = Decontaminate.updateLeakageState(spark, path,
      docs.filter(F.col("doc_id") % 4 === 3), "doc_id", "text", "sp",
      batchId = 1L)
    assert(rows(replay) === rows(full))
    // an empty delta is a no-op
    val noop = Decontaminate.updateLeakageState(spark, path,
      docs.filter(F.col("doc_id") < 0), "doc_id", "text", "sp", batchId = 2L)
    assert(rows(noop) === rows(full))
    // a brand-new split arriving purely as a delta
    val third = docs.filter(F.col("doc_id") % 4 === 3)
      .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text"),
        F.lit("test").as("sp"))
    val m3 = Decontaminate.updateLeakageState(spark, path,
      third, "doc_id", "text", "sp", batchId = 3L)
    val full3 = Decontaminate.splitLeakageMatrix(
      docs.select("doc_id", "text", "sp").unionByName(third),
      "doc_id", "text", "sp")
    assert(rows(m3) === rows(full3))
    assert(rows(m3).exists(_.head == "test") ||
      rows(m3).exists(r => r(1) == "test"))

    // folding retired nightly partitions is matrix-invariant, and a
    // post-fold night (fresh id) still equals the full recompute
    val maxFolded = Decontaminate.compactLeakageState(spark, path)
    assert(maxFolded === 3L)
    Seq("grams", "memb", "docleaks", "shared").foreach { t =>
      val ids = spark.read.parquet(s"$path/$t")
        .select(F.col("__batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(-1L), s"$t not folded: $ids")
    }
    assert(rows(Decontaminate.leakageMatrixFromState(spark, path)) === rows(full3))
    val fourth = docs.filter(F.col("doc_id") % 4 === 1)
      .select((F.col("doc_id") + 2000000L).as("doc_id"), F.col("text"),
        F.lit("test").as("sp"))
    val m4 = Decontaminate.updateLeakageState(spark, path,
      fourth, "doc_id", "text", "sp", batchId = maxFolded + 1L)
    val full4 = Decontaminate.splitLeakageMatrix(
      docs.select("doc_id", "text", "sp").unionByName(third)
        .unionByName(fourth), "doc_id", "text", "sp")
    assert(rows(m4) === rows(full4))
  }

  test("noveltyScores: exact fraction on a mixed doc; copies 0, rewrites 1") {
    import spark.implicits._
    val ref = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val probes = Seq(
      (10L, "a b c d e zz f g h"),   // 7 grams, 3 contain zz -> 3/7
      (11L, "a b c d e f g h i j"),  // exact copy -> 0
      (12L, "qq ww ee rr tt yy")     // fully novel -> 1
    ).toDF("id", "text")
    val got = Decontaminate.noveltyScores(probes, ref, "id", "text", n = 3)
      .select("id", "total_grams", "unseen_grams", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) == ((7L, 3L, 3.0 / 7.0)))
    assert(got(11L) == ((8L, 0L, 0.0)))
    assert(got(12L) == ((4L, 4L, 1.0)))
    // sub-n docs have no gram signal and drop
    val tiny = Decontaminate.noveltyScores(
      Seq((20L, "a b")).toDF("id", "text"), ref, "id", "text", n = 3)
    assert(tiny.isEmpty)
  }
}

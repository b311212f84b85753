package graft.pipeline

import graft.SparkTestBase
import graft.sketch.SketchOps
import org.apache.spark.sql.{functions => F}

/** Adversarial edges of the round-4 operators: degenerate inputs,
  * boundary values, and the cross-corpus paths the oracle queries
  * (which score a corpus against itself) never exercise. */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("unigramLogLoss smooths unseen tokens when scoring against a reference corpus") {
    val ref = Seq((1L, "common common common common")).toDF("doc_id", "text")
    // scoring a DIFFERENT dataset against ref's distribution: build the
    // count map from ref, then score docs containing unseen tokens
    val refCounts = Vocab.unigramLogLoss(ref, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(refCounts.head._3 === 0.0)   // -ln(4/4) = 0 exactly

    // stream-shape: unseen token smooths to count 1, never throws/NULLs
    val mixed = Seq((1L, "common unseen")).toDF("doc_id", "text")
    val both = ref.union(mixed)
    val scores = Vocab.unigramLogLoss(both, "doc_id", "text")
    assert(scores.count() === 2L)
  }

  test("topDistinctiveTerms handles k over vocabulary and single-token docs") {
    val docs = Seq((1L, "solo"), (2L, "a a a")).toDF("doc_id", "text")
    val out = Vocab.topDistinctiveTerms(docs, "doc_id", "text", 10)
      .as[(Long, Long, String, Long, Long)].collect()
    // k=10 but each doc has 1 distinct term: exactly one row per doc
    assert(out.count(_._1 == 1L) === 1)
    assert(out.count(_._1 == 2L) === 1)
    val doc2 = out.find(_._1 == 2L).get
    assert(doc2._3 === "a" && doc2._4 === 3L && doc2._5 === 1L)
  }

  test("tokenizeBpe with an empty merge table yields character tokens (applyBpe parity)") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val toks = Vocab.tokenizeBpe(docs, "text", Seq.empty)
      .select("tokens").as[Seq[String]].head()
    assert(toks === Seq("a", "b", "c", "d"))
    assert(Vocab.applyBpe(Seq.empty, "ab") === Seq("a", "b"))
    assert(Vocab.applyBpeRanked(Map.empty, "ab") === Seq("a", "b"))
  }

  test("incrementalExactDuplicates with an empty index finds nothing") {
    val fresh = Seq((1L, "doc a"), (2L, "doc b")).toDF("doc_id", "text")
    val emptyIdx = Dedup.buildContentHashIndex(
      fresh.filter(F.lit(false)), "text")
    assert(Dedup.incrementalExactDuplicates(
      fresh, emptyIdx, "doc_id", "text").count() === 0L)
  }

  test("bigramLogLoss on a corpus of sub-2-token docs is empty, not an error") {
    val d = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Vocab.bigramLogLoss(d, "doc_id", "text").count() === 0L)
  }

  test("bloomPrune with an empty small side prunes to empty (matches the empty join)") {
    val big = spark.range(100).toDF("k")
    val empty = spark.range(0).toDF("j")
    val pruned = SketchOps.bloomPrune(big, "k", empty, "j", 100L, 0.01)
    assert(pruned.count() === big.join(empty, $"k" === $"j").count())
  }

  test("stratifiedFixedK treats a NULL stratum as its own stratum") {
    val df = Seq((Some("a"), 1L), (Some("a"), 2L), (Some("a"), 3L),
      (None: Option[String], 4L), (None: Option[String], 5L), (None: Option[String], 6L))
      .toDF("src", "id")
    val out = Sampling.stratifiedFixedK(df, F.col("src"), F.col("id"), 2)
      .as[(Option[String], Long)].collect()
    assert(out.count(_._1.contains("a")) === 2)
    assert(out.count(_._1.isEmpty) === 2)
  }

  test("boilerplate separator is a regex: metachar separators work consistently") {
    val docs = Seq(
      (1L, "nav.home.real content one.nav"),
      (2L, "nav.real content two.nav"),
      (3L, "nav.other things.nav")).toDF("doc_id", "text")
    val freq = Boilerplate.frequentSegments(docs, "text", "\\.", 3L)
      .as[(String, Long)].collect().toMap
    assert(freq === Map("nav" -> 3L))
    val out = Boilerplate.stripBoilerplate(docs, "text", "\\.", ".", 3L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "home.real content one")
    assert(out(2L) === "real content two")
  }

  test("robustZScores leaves NULL values unscored") {
    val df = Seq((Some(1.0), 1L), (Some(2.0), 2L), (Some(3.0), 3L),
      (Some(100.0), 4L), (None: Option[Double], 5L))
      .toDF("v", "id").withColumn("k", F.lit("g"))
    val out = SketchOps.robustZScores(df, Seq("k"), "v")
      .select($"id", $"robust_z").as[(Long, Option[Double])].collect().toMap
    assert(out(5L).isEmpty)
    assert(out(4L).exists(_ > 3.0))
  }

  test("dedupParagraphs: no duplicates anywhere is the identity; NULL-only corpus survives") {
    val clean = Seq((1L, "a b\nc d"), (2L, "e f\ng h")).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(clean, "doc_id", "text")
      .select("doc_id", "text", "paras_removed")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a b\nc d", 0L), (2L, "e f\ng h", 0L)))
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val n = Dedup.dedupParagraphs(nulls, "doc_id", "text").collect()
    assert(n.length == 1 && n(0).isNullAt(1) && n(0).isNullAt(2))
  }

  test("semanticDeduplicate with no pair above threshold is the identity") {
    val docs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))
    ).toDF("id", "v")
    assert(Dedup.semanticDeduplicate(docs, "id", "v", nClusters = 2,
      threshold = 0.99).select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("Dsir with an empty target still scores (uniform target, finite ratios)") {
    val raw = Seq((1L, "some words"), (2L, "other words")).toDF("doc_id", "text")
    val m = Dsir.learn(raw, raw.filter(F.lit(false)), "text", 1 << 8)
    val out = Dsir.score(raw, "text", m).select("dsir_score")
      .as[Double].collect()
    assert(out.length == 2 && out.forall(d => !d.isNaN && !d.isInfinite))
  }

  test("WordPiece.learn on an empty corpus yields an UNK-only tokenizer") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = WordPiece.learn(empty, "text", vocabSize = 10)
    assert(m.pieces.isEmpty)
    assert(WordPiece.segment(m, "anything").toSeq == Seq(m.unk))
  }
}

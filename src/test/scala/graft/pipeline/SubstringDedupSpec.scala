package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Exact duplicated-substring detection/removal (Lee et al. 2021 style):
  * hand-computed span cases, adjacency merging, keep-first semantics,
  * and a brute-force cross-check on a planted-repeat corpus. */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeIntervals fuses overlap and adjacency, keeps gaps") {
    assert(Dedup.mergeIntervals(Nil) == Nil)
    assert(Dedup.mergeIntervals(Seq((1L, 8L))) == Seq((1L, 8L)))
    // overlap
    assert(Dedup.mergeIntervals(Seq((1L, 8L), (2L, 9L))) == Seq((1L, 9L)))
    // adjacency (tokens 1-8 and 9-16 = one contiguous duplicated run)
    assert(Dedup.mergeIntervals(Seq((9L, 16L), (1L, 8L))) == Seq((1L, 16L)))
    // gap of one token stays split
    assert(Dedup.mergeIntervals(Seq((1L, 4L), (6L, 9L))) == Seq((1L, 4L), (6L, 9L)))
    // containment
    assert(Dedup.mergeIntervals(Seq((1L, 10L), (3L, 5L))) == Seq((1L, 10L)))
  }

  test("duplicateSpans: cross-doc shared gram, exact positions") {
    val df = Seq(
      (1L, "a b c d e f g h X Y Z"),          // shared 8-gram at 1-8
      (2L, "p q a b c d e f g h r"),          // same gram at 3-10
      (3L, "totally unrelated words only once here nothing repeats at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 1L, 8L), (2L, 3L, 10L)))
  }

  test("duplicateSpans: within-doc repetition merges adjacent grams") {
    // one doc repeating the same 8 tokens twice: grams at 1 and 9 are
    // identical (the 7 straddling grams are unique) -> spans (1,8) and
    // (9,16) merge into (1,16)
    val rep = (1 to 8).map(i => s"m$i").mkString(" ")
    val df = Seq((1L, s"$rep $rep"), (2L, "filler words that appear nowhere else"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", k = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 1L, 16L)))
  }

  test("duplicateSpans keepFirst leaves the lowest (id, pos) occurrence unmarked") {
    val df = Seq(
      (1L, "a b c d e f g h X Y Z"),
      (2L, "p q a b c d e f g h r"),
      (5L, "a b c d e f g h later copy too")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", k = 8, keepFirst = true)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1 pos 1 is the global first occurrence -> only docs 2 and 5 marked
    assert(spans == Seq((2L, 3L, 10L), (5L, 1L, 8L)))
  }

  test("stripDuplicateSpans keeps first copy, rewrites others, passes clean docs through") {
    val df = Seq(
      (1L, "a b c d e f g h X Y Z"),
      (2L, "p q a b c d e f g h r"),
      (3L, "u  v\tw unique tail stays byte identical"),   // odd whitespace preserved
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out(0) == ((1L, "a b c d e f g h X Y Z")))   // first copy survives intact
    assert(out(1) == ((2L, "p q r")))                   // span removed, normalized join
    assert(out(2) == ((3L, "u  v\tw unique tail stays byte identical")))
    assert(out(3)._2 == null)
  }

  test("incrementalDuplicateSpans: history grams + within-batch repeats, no history re-read") {
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different historical content nothing shared here at all")
    ).toDF("doc_id", "text")
    val index = Dedup.buildGramIndex(hist, "text", k = 5)
    val rep = (1 to 5).map(i => s"z$i").mkString(" ")
    val fresh = Seq(
      // tokens 3-10 replay hist doc 1's tokens 1-8 -> grams at 3..6 hit
      (10L, s"xx yy the quick brown fox jumps over the lazy qq"),
      // within-batch repeat: same 5 tokens twice (grams at 1 and 6)
      (11L, s"$rep $rep"),
      (12L, "fresh only words appearing once never repeated anywhere")
    ).toDF("doc_id", "text")
    val spans = Dedup.incrementalDuplicateSpans(fresh, index, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((10L, 3L, 10L), (11L, 1L, 10L)))
    // empty index: only the within-batch repeat remains
    val emptyIdx = Dedup.buildGramIndex(hist.limit(0), "text", k = 5)
    val only = Dedup.incrementalDuplicateSpans(fresh, emptyIdx, "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(only == Seq((11L, 1L, 10L)))
  }

  test("incrementalDuplicateSpans survives a gram-index parquet round-trip") {
    val hist = Seq((1L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("gramidx").toString + "/idx"
    Dedup.buildGramIndex(hist, "text", k = 5).write.mode("overwrite").parquet(path)
    val fresh = Seq((7L, "pre alpha beta gamma delta epsilon zeta eta post"))
      .toDF("doc_id", "text")
    val spans = Dedup.incrementalDuplicateSpans(
        fresh, spark.read.parquet(path), "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((7L, 2L, 8L)))
  }

  test("duplicateSpans matches an in-memory brute force on a planted-repeat corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "gold", "iron", "wolf", "moon", "star")
    val boiler = "subscribe to our newsletter today"
    val docs = (0L until 40L).map { i =>
      val body = Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // every 4th doc carries the boilerplate sentence somewhere inside
      val text = if (i % 4 == 0) s"$body $boiler ${vocab(rnd.nextInt(vocab.size))}" else body
      (i, text)
    }
    val k = 5
    // brute force: positions of every k-gram occurring >= 2 times
    val grams = docs.flatMap { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      toks.sliding(k).zipWithIndex.collect {
        case (g, i0) if g.length == k => (g.mkString(" "), id, i0 + 1L, i0 + k.toLong)
      }
    }
    val dupGrams = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten
    val expected = dupGrams.groupBy(_._2).flatMap { case (id, occ) =>
      Dedup.mergeIntervals(occ.map(o => (o._3, o._4)).toSeq).map(sp => (id, sp._1, sp._2))
    }.toSeq.sorted
    val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == expected)
    assert(got.nonEmpty)   // the planted boilerplate must actually fire

    // escalated form is output-identical, including a non-doubling
    // final step (seedK 3 -> 6 -> 7... wait k=5: ladder 3 -> 5)
    val esc = Dedup.duplicateSpansEscalated(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = k, seedK = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(esc == expected)
  }

  test("duplicateSpansEscalated == direct at a large floor on real docs + planted long spans") {
    val docs = sf("sf0.001", "documents")
      .filter(F.col("text").isNotNull).select("doc_id", "text")
    // full-copy plants: shared spans run whole-document length, far
    // across any single gram window
    val planted = docs.filter(F.col("doc_id") % 13 === 0)
      .select((F.col("doc_id") + 200000L).as("doc_id"), F.col("text"))
    val corpus = docs.unionAll(planted)
    for ((k, seed) <- Seq((24, 6), (24, 5), (50, 8))) {
      val direct = Dedup.duplicateSpans(corpus, "doc_id", "text", k = k)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val esc = Dedup.duplicateSpansEscalated(
          corpus, "doc_id", "text", k = k, seedK = seed)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(esc == direct, s"k=$k seedK=$seed")
      assert(direct.nonEmpty, s"k=$k: plants must fire")
    }
    // keepFirst parity: the surviving copy is the same occurrence
    val df = Dedup.duplicateSpans(
        corpus, "doc_id", "text", k = 24, keepFirst = true)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val ef = Dedup.duplicateSpansEscalated(
        corpus, "doc_id", "text", k = 24, keepFirst = true, seedK = 6)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(ef == df)
  }
}

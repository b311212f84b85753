package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class SentenceSpec extends SparkTestBase {
  import TextFunctions.sentenceSegments

  test("plain boundaries: punctuation runs + whitespace, count = matches + 1") {
    assert(sentenceSegments("Hello world. Bye now!", false).toSeq ===
      Seq("Hello world.", "Bye now!"))
    assert(sentenceSegments("One!! Two?! Three", false).toSeq ===
      Seq("One!!", "Two?!", "Three"))
    // no space after punctuation: no boundary
    assert(sentenceSegments("v1.2 is out. Yes", false).toSeq ===
      Seq("v1.2 is out.", "Yes"))
    // trimming: trailing punctuation+space never yields an empty segment
    assert(sentenceSegments("  Hi there.  ", false).toSeq === Seq("Hi there."))
    assert(sentenceSegments("", false).toSeq === Seq.empty)
    assert(sentenceSegments("   ", false).toSeq === Seq.empty)
    assert(sentenceSegments(null, false) === null)
    // degenerate lone-punctuation segments stay consistent
    assert(sentenceSegments("a. . b", false).toSeq === Seq("a.", ".", "b"))
  }

  test("abbreviation guard merges known false boundaries") {
    assert(sentenceSegments("Dr. Smith arrived. He sat.", true).toSeq ===
      Seq("Dr. Smith arrived.", "He sat."))
    assert(sentenceSegments("Dr. Smith arrived. He sat.", false).toSeq ===
      Seq("Dr.", "Smith arrived.", "He sat."))
    // single uppercase initial
    assert(sentenceSegments("J. R. Tolkien wrote. Done.", true).toSeq ===
      Seq("J. R. Tolkien wrote.", "Done."))
    // guard only applies to a bare "." run
    assert(sentenceSegments("Call Dr.! Now", true).toSeq ===
      Seq("Call Dr.!", "Now"))
    assert(sentenceSegments("e.g. this works", true).toSeq ===
      Seq("e.g. this works"))
  }

  test("packSentenceChunks: greedy whole-sentence packing with overlap") {
    import Scrub.packSentenceChunks
    val s = Array("a b c.", "d e.", "f g h i.", "j.")
    // budget 5: [a b c. d e.] (5), [f g h i. j.] (5)
    assert(packSentenceChunks(s, 5, 0).toSeq ===
      Seq("a b c. d e.", "f g h i. j."))
    // budget 3: oversize sentence alone, never split
    assert(packSentenceChunks(Array("w x y z."), 3, 0).toSeq ===
      Seq("w x y z."))
    // overlap 1: second chunk repeats the previous trailing sentence
    assert(packSentenceChunks(s, 6, 1).toSeq ===
      Seq("a b c. d e.", "d e. f g h i.", "f g h i. j."))
    assert(packSentenceChunks(Array.empty, 5, 0).toSeq === Seq.empty)
  }

  test("chunkSentences: one row per chunk, empty docs kept") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, "One two. Three four. Five six."),
      (2L, "   "),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Scrub.chunkSentences(df, F.col("text"), 4)
      .select("id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      (1L, 0, "One two. Three four."),
      (1L, 1, "Five six."),
      (2L, 0, ""),
      (3L, 0, "")))
  }

  test("encodingDamage counts mojibake, replacement and control chars") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, "clean text"),
      (2L, "caf\u00C3\u00A9 broke"),        // mojibake digraph
      (3L, "bad\uFFFDchar and bell\u0007"), // replacement + control
      (4L, "tabs\tand\nnewlines are fine"),
      (5L, "\u00E2\u20AC\u2122s quote"))    // 'a-circ euro' prefix form
      .toDF("id", "text")
      .select(F.col("id"), TextFunctions.encodingDamage(F.col("text")).as("d"))
      .selectExpr("id", "d.replacement_chars", "d.control_chars",
        "d.mojibake", "d.is_clean")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(rows(1L) === ((0, 0, 0, true)))
    assert(rows(2L) === ((0, 0, 1, false)))
    assert(rows(3L) === ((1, 1, 0, false)))
    assert(rows(4L) === ((0, 0, 0, true)))
    assert(rows(5L) === ((0, 0, 1, false)))
  }

  test("readability: hand-computed counts and Flesch scores") {
    val spark0 = spark
    import spark0.implicits._
    // "The cat sat. It ran away." -> 6 words, 2 sentences,
    // vowel groups: e,a,a,I,a,a,ay -> 7 syllable proxies
    val df = Seq((1L, "The cat sat. It ran away."), (2L, ""), (3L, "x"))
      .toDF("id", "text")
      .select(F.col("id"),
        TextFunctions.readabilityCounts(F.col("text")).as("c"),
        TextFunctions.fleschReadingEase(F.col("text")).as("f"))
    val rows = df.selectExpr("id", "c.words", "c.sentences", "c.syllables", "f")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(rows(1L)._1 === 6)
    assert(rows(1L)._2 === 2)
    assert(rows(1L)._3 === 7)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(math.abs(rows(1L)._4.get - expected) < 1e-9)
    assert(rows(2L)._4 === None)    // no words -> NULL, no ANSI error
    assert(rows(3L) === ((1, 1, 0, Some(206.835 - 1.015))))
  }

  test("dedupLines keeps first occurrences in order; NULL passes through") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(F.col("id"), TextFunctions.dedupLines(F.col("text")).as("d"))
    val got = df.as[(Long, String)].collect().toMap
    assert(got(1L) === "a\nb\nc")
    assert(got(2L) === "x")
    assert(got(3L) === null)
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class PreferencesSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs = Seq(
    (1L, "explain gravity", "mass curves spacetime around it", "things fall"),
    (2L, "explain gravity", "same answer twice", "same answer twice"),
    (3L, "explain gravity", "Mixed  Case answer", "mixed case ANSWER"),
    (4L, "explain gravity", "a very long detailed answer about it", "ok"),
    (5L, "explain gravity", "fine", "   "),
    (6L, null.asInstanceOf[String], "a", "b")
  ).toDF("id", "prompt", "chosen", "rejected")

  test("validatePairs flags exact dupes, norm dupes, whitespace, degenerate lengths") {
    val got = Preferences.validatePairs(pairs, "prompt", "chosen", "rejected")
      .select($"id", $"nonempty", $"distinct_exact", $"distinct_norm",
        $"length_ok", $"valid")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(got(2L) == ((true, false, false, true, false)))
    // case-only diff: exact-distinct but NOT norm-distinct
    assert(got(3L)._2 && !got(3L)._3 && !got(3L)._5)
    // 36 chars vs 2: ratio 18 > 8
    assert(got(4L)._1 && got(4L)._2 && !got(4L)._4 && !got(4L)._5)
    // whitespace-only rejected
    assert(!got(5L)._1 && !got(5L)._5)
    // null prompt
    assert(!got(6L)._1 && !got(6L)._5)
  }

  test("conflictingPairs finds reversed annotations under normalization, nothing else") {
    val df = Seq(
      (1L, "p one", "answer a", "answer b"),
      (2L, "P  ONE", "Answer B", "answer  A"), // reversed + denormalized
      (3L, "p one", "answer a", "answer c"),   // same prompt, not reversed
      (4L, "p two", "answer b", "answer a")    // different prompt
    ).toDF("id", "prompt", "chosen", "rejected")
    val got = Preferences.conflictingPairs(df, "id", "prompt", "chosen", "rejected")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("dedupePairs keeps the lowest id per normalized triple") {
    val df = Seq(
      (5L, "p", "c", "r"),
      (2L, "P ", " c", "r  "), // normalized-equal
      (7L, "p", "c", "different")
    ).toDF("id", "prompt", "chosen", "rejected")
    val kept = Preferences.dedupePairs(df, "id", "prompt", "chosen", "rejected")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L))
  }

  test("incrementalConflicts: delta vs persisted digest index equals the batch self-join direction") {
    val hist = Seq(
      (1L, "p one", "answer a", "answer b"),
      (4L, "p two", "answer b", "answer a")
    ).toDF("id", "prompt", "chosen", "rejected")
    val dir = java.nio.file.Files.createTempDirectory("graft_pref_idx").toString
    Dedup.saveSignatureIndex(
      Preferences.buildPreferenceIndex(hist, "id", "prompt", "chosen", "rejected"),
      dir)
    val fresh = Seq(
      (10L, "P  ONE", "Answer B", "answer  A"), // reverses id 1
      (11L, "p one", "answer a", "answer c"),   // same prompt, not reversed
      (12L, "p three", "x", "y")                // unseen prompt
    ).toDF("id", "prompt", "chosen", "rejected")
    val got = Preferences.incrementalConflicts(fresh,
        Dedup.loadSignatureIndex(spark, dir),
        "id", "prompt", "chosen", "rejected")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L)))
  }
}

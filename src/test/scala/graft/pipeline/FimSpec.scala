package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Fim: sentinel-delimited prefix/suffix/middle rewrites with exact
  * code-point arithmetic. */
class FimSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String, p1: Int, p2: Int, spm: Boolean = false): String =
    Seq(Tuple1(text)).toDF("t")
      .select(Fim.fimTransform(F.col("t"), F.lit(p1), F.lit(p2), spm).as("f"))
      .as[String].collect().head

  test("PSM and SPM assemble the expected blocks") {
    assert(one("abcdefgh", 2, 5) ===
      "<|fim_pre|>ab<|fim_suf|>fgh<|fim_mid|>cde")
    assert(one("abcdefgh", 2, 5, spm = true) ===
      "<|fim_suf|>fgh<|fim_pre|>ab<|fim_mid|>cde")
  }

  test("positions clamp; parts always reassemble the original") {
    val df = Seq(
      ("hello world", 3, 7), ("x", 0, 1), ("x", 5, 9), ("", 2, 4),
      ("edge", -3, 99), ("swap", 3, 1), ("字符串测试", 1, 3))
      .toDF("t", "p1", "p2")
    val parts = df.select(F.col("t"),
        Fim.fimParts(F.col("t"), F.col("p1"), F.col("p2")).as("p"))
      .select(F.col("t"), F.col("p.pre"), F.col("p.mid"), F.col("p.suf"))
      .as[(String, String, String, String)].collect()
    parts.foreach { case (t, pre, mid, suf) =>
      assert(pre + mid + suf === t, s"reassembly of '$t'")
    }
    // swap: p2 < p1 -> empty middle at p1
    assert(one("swap", 3, 1) === "<|fim_pre|>swa<|fim_suf|>p<|fim_mid|>")
  }

  test("NULL positions yield NULL, not a silent whole-text prefix") {
    // least/greatest SKIP nulls: without the explicit guard a NULL p1
    // clamps to length and emits pre=whole text / mid='' / suf=''
    val df = Seq(
      (1L, "abcdef", Option(2), Option(4)),
      (2L, "abcdef", Option.empty[Int], Option(4)),
      (3L, "abcdef", Option(2), Option.empty[Int]))
      .toDF("id", "t", "p1", "p2")
    val parts = df.select(F.col("id"),
        Fim.fimParts(F.col("t"), F.col("p1"), F.col("p2")).as("p"),
        Fim.fimTransform(F.col("t"), F.col("p1"), F.col("p2")).as("f"))
      .select(F.col("id"), F.col("p").isNull.as("pn"), F.col("f").isNull.as("fn"))
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (k, pn, fn) => k -> ((pn, fn)) }.toMap
    assert(parts(1L) === ((false, false)))
    assert(parts(2L) === ((true, true)))
    assert(parts(3L) === ((true, true)))
  }

  test("NULL text yields NULL; the chain is map-only") {
    val df = Seq((1L, Option("ab")), (2L, Option.empty[String])).toDF("id", "t")
    val out = df.select(F.col("id"),
        Fim.fimTransform(F.col("t"), F.lit(1), F.lit(2)).as("f"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
    val plan = sf("sf0.001", "documents")
      .select(Fim.fimTransform(F.col("text"),
        F.col("doc_id") % 10, F.col("doc_id") % 20).as("f"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{Column, Row, functions => F}

/**
 * Sft: conversation synthesis, validation, template render, and
 * assistant loss-mask spans — hand-checked character arithmetic plus
 * the no-shuffle plan shape.
 */
class SftSpec extends SparkTestBase {
  import spark.implicits._

  private def conv(text: String, tpt: Int = 2) =
    Seq(Tuple1(text)).toDF("text")
      .select(Sft.conversationsFromText(F.col("text"), tpt).as("turns"))

  test("conversationsFromText chunks tokens and alternates roles") {
    val turns = conv("a b c d e").select(F.explode(F.col("turns")).as("t"))
      .select("t.role", "t.content").collect().map(r => (r.getString(0), r.getString(1)))
    assert(turns.toSeq === Seq(
      ("user", "a b"), ("assistant", "c d"), ("user", "e")))
  }

  test("conversationsFromText: blank, NULL, and whitespace-runs edge cases") {
    val df = Seq(Tuple1(""), Tuple1(null: String), Tuple1("  x   y  "))
      .toDF("text")
      .select(Sft.conversationsFromText(F.col("text"), 2).as("turns"))
      .select(F.size(F.col("turns")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 0, 1))
  }

  test("validateTurns flags each structural invariant") {
    def mk(rs: (String, String)*) = rs.map { case (r, c) => Row(r, c) }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "turns array<struct<role:string,content:string>>")
    val rows = Seq(
      mk(("user", "hi"), ("assistant", "yo")),            // valid
      mk(("assistant", "yo")),                            // starts wrong
      mk(("user", "hi"), ("user", "again"), ("assistant", "yo")), // no alternation
      mk(("user", "hi"), ("assistant", "")),              // empty content
      mk(("user", "hi"), ("system", "x"), ("assistant", "yo")),   // unknown role + no-alt ok
      Seq.empty[Row])                                     // empty conversation
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r)), 1), schema)
    val v = df.select(Sft.validateTurns(F.col("turns")).as("v")).select("v.*")
      .collect()
    assert(v(0).getBoolean(6))
    assert(!v(1).getBoolean(1) && !v(1).getBoolean(6))
    assert(!v(2).getBoolean(3) && !v(2).getBoolean(6))
    assert(!v(3).getBoolean(5) && !v(3).getBoolean(6))
    assert(!v(4).getBoolean(4) && !v(4).getBoolean(6))
    assert(v(5).getInt(0) === 0 && !v(5).getBoolean(6))
  }

  test("renderTemplate and assistantSpans agree character-for-character") {
    val df = conv("a b c d e")   // user "a b", assistant "c d", user "e"
    val out = df.select(
      Sft.renderTemplate(F.col("turns")).as("r"),
      Sft.assistantSpans(F.col("turns")).as("spans")).collect().head
    val rendered = out.getString(0)
    assert(rendered ===
      "<|user|>\na b<|end|>\n<|assistant|>\nc d<|end|>\n<|user|>\ne<|end|>\n")
    val spans = out.getSeq[Row](1).map(r => (r.getLong(0), r.getLong(1)))
    // turn 1 is 9+3+8=20 chars, "<|assistant|>\n" is 14 more
    assert(spans.toSeq === Seq((34L, 37L)))
    // the span really selects the assistant content
    assert(rendered.substring(34, 37) === "c d")
  }

  test("maskStats sums spans exactly") {
    val df = conv("a b c d e f g h", 2)  // u:"a b" a:"c d" u:"e f" a:"g h"
    val st = df.select(Sft.maskStats(F.col("turns")).as("m")).select("m.*")
      .collect().head
    val rendered = conv("a b c d e f g h", 2)
      .select(F.length(Sft.renderTemplate(F.col("turns")))).collect().head.getInt(0)
    assert(st.getLong(0) === rendered.toLong)
    assert(st.getLong(1) === 6L)   // "c d" + "g h"
    assert(st.getInt(2) === 2)
  }

  test("turnTokenCounts aligns with turns") {
    val df = conv("a b c d e", 2)
    val counts = df.select(Sft.turnTokenCounts(F.col("turns")).as("c"))
      .collect().head.getSeq[Int](0)
    assert(counts.toSeq === Seq(2, 2, 1))
  }

  test("sftTextProfile fused kernel equals the Column-expression chain") {
    // the hot-path JVM kernel must reproduce the composable path
    // field-for-field: synthesize -> validate -> render -> mask ->
    // span checksum. Edge cases plus the whole real corpus.
    val session = spark
    import session.implicits._
    val edge = Seq(
      (1L, "a b c d e f g"), (2L, "one"), (3L, ""), (4L, "   "),
      (5L, null.asInstanceOf[String]), (6L, "a b c d e f"),
      (7L, "x\ty  z\n w"), (8L, (1 to 50).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = sf("sf0.001", "documents").select(F.col("doc_id"), F.col("text"))
    for (df <- Seq(edge, corpus); k <- Seq(1, 3)) {
      val expr = df
        .select(F.col("doc_id"), Sft.conversationsFromText(F.col("text"), k).as("turns"))
        .select(F.col("doc_id"),
          Sft.validateTurns(F.col("turns")).as("v"),
          Sft.maskStats(F.col("turns")).as("m"),
          F.aggregate(Sft.assistantSpans(F.col("turns")), F.lit(0L),
            (a: Column, sp: Column) =>
              a + sp.getField("s") + sp.getField("e")).as("span_sum"))
        .select(F.col("doc_id"), F.col("v.n_turns"), F.col("v.starts_with_user"),
          F.col("v.ends_with_assistant"), F.col("v.alternates"),
          F.col("v.roles_known"), F.col("v.no_empty_content"), F.col("v.valid"),
          F.col("m.rendered_chars"), F.col("m.masked_chars"), F.col("m.n_spans"),
          F.col("span_sum"))
      val fused = df
        .select(F.col("doc_id"), Sft.sftTextProfile(F.col("text"), k).as("p"))
        .select(F.col("doc_id"), F.col("p.n_turns"), F.col("p.starts_with_user"),
          F.col("p.ends_with_assistant"), F.col("p.alternates"),
          F.col("p.roles_known"), F.col("p.no_empty_content"), F.col("p.valid"),
          F.col("p.rendered_chars"), F.col("p.masked_chars"), F.col("p.n_spans"),
          F.col("p.span_sum"))
      assert(expr.exceptAll(fused).isEmpty && fused.exceptAll(expr).isEmpty,
        s"k=$k mismatch")
    }
  }

  test("the whole chain is map-only (zero exchanges) over documents") {
    val docs = sf("sf0.001", "documents")
    val plan = docs
      .select(F.col("doc_id"),
        Sft.conversationsFromText(F.col("text"), 3).as("turns"))
      .select(F.col("doc_id"),
        Sft.validateTurns(F.col("turns")).as("v"),
        Sft.maskStats(F.col("turns")).as("m"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

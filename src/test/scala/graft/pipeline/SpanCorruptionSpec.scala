package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class SpanCorruptionSpec extends SparkTestBase {
  import spark.implicits._

  test("plan: exact integer counts, disjoint ordered spans inside segments") {
    // n=40, 15/100 → corrupted 6; meanSpan 3 → 2 spans of 3
    val p = SpanCorruption.plan(40, 15, 100, 3, seed = 1L, id = 9L)
    assert(p.length === 2)
    assert(p.map(_._2).sum === 6)
    assert(p(0)._2 === 3 && p(1)._2 === 3)
    // spans inside their segments, disjoint, ordered
    assert(p(0)._1 >= 0 && p(0)._1 + p(0)._2 <= 20)
    assert(p(1)._1 >= 20 && p(1)._1 + p(1)._2 <= 40)
    // remainder distribution: corrupted 7, spans 2 → lengths 4, 3
    val p2 = SpanCorruption.plan(47, 15, 100, 3, seed = 1L, id = 9L)
    assert(p2.map(_._2).toSeq === Seq(4, 3))
    // too short to corrupt → empty plan
    assert(SpanCorruption.plan(6, 15, 100, 3, 1L, 9L).isEmpty)
    // deterministic; different ids differ somewhere
    assert(SpanCorruption.plan(40, 15, 100, 3, 1L, 9L).toSeq === p.toSeq)
    val other = (1L to 50L).map(i => SpanCorruption.plan(40, 15, 100, 3, 1L, i).toSeq)
    assert(other.distinct.length > 1)
  }

  test("rates above meanSpan/(meanSpan+1) are rejected; at the bound every span fits") {
    // above the bound a remainder span can exceed its segment (the
    // advisor's n=11, 95/100, meanSpan=3 counterexample: segLen 3,
    // len 4, start -1) — corrupt() must refuse, never misplace
    val d = Seq((1L, (1 to 11).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SpanCorruption.corrupt(d, "doc_id", "text", 95, 100, 3, seed = 1L)
    }
    intercept[IllegalArgumentException] {
      SpanCorruption.corrupt(d, "doc_id", "text", 4, 5, 3, seed = 1L) // 4/5 > 3/4
    }
    // AT the exact bound (3/4 for meanSpan 3): sweep sizes and ids —
    // spans stay inside their segments, disjoint, ordered, no clamping
    for (n <- 1 to 120; id <- 1L to 3L) {
      val p = SpanCorruption.plan(n, 3, 4, 3, seed = 5L, id = id)
      val spans = p.length
      p.zipWithIndex.foreach { case ((s0, len), k) =>
        val segStart = (k.toLong * n / spans).toInt
        val segEnd = ((k + 1).toLong * n / spans).toInt
        assert(s0 >= segStart && s0 + len <= segEnd,
          s"n=$n id=$id span $k [$s0, ${s0 + len}) outside [$segStart, $segEnd)")
      }
      assert(p.map(_._2).sum === n * 3 / 4)
    }
    // meanSpan=1 → bound is 1/2
    val q = SpanCorruption.plan(10, 1, 2, 1, seed = 5L, id = 1L)
    assert(q.map(_._2).sum === 5)
  }

  test("corrupt: reconstruct inverse, sentinel structure, passthrough, NULLs") {
    val d = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "tiny doc"),                                 // corrupted = 0
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(d, "doc_id", "text", 15, 100, 3, seed = 7L)
      .select("doc_id", "input_tokens", "target_tokens",
        "n_tokens", "n_corrupted", "n_spans")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(3) === 40L && r1.getLong(4) === 6L && r1.getLong(5) === 2L)
    val in1 = r1.getSeq[String](1)
    val tg1 = r1.getSeq[String](2)
    // input carries sentinels 0..spans-1; target ends with the closing one
    assert(in1.count(_.startsWith("<extra_id_")) === 2)
    assert(tg1.last === SpanCorruption.sentinel(2))
    assert(SpanCorruption.reconstruct(in1, tg1) ===
      (1 to 40).map(i => s"w$i"))
    // corrupted = 0: input is the tokens, empty target
    val r2 = out(2L)
    assert(r2.getSeq[String](1) === Seq("tiny", "doc"))
    assert(r2.getSeq[String](2).isEmpty && r2.getLong(5) === 0L)
    // NULL text → NULL outputs
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
  }

  test("corrupt on the real corpus: reconstructs everywhere, deterministic, exact counts") {
    val docs = sf("sf0.001", "documents").filter(F.col("text").isNotNull)
      .select("doc_id", "text")
    def run() = SpanCorruption.corrupt(docs, "doc_id", "text", 15, 100, 3, seed = 3L)
      .select("doc_id", "input_tokens", "target_tokens", "n_tokens",
        "n_corrupted", "n_spans")
      .collect()
    val rows = run()
    rows.foreach { r =>
      val n = r.getLong(3)
      assert(r.getLong(4) === n * 15L / 100L, s"doc ${r.getLong(0)} corrupted")
      val expSpans = if (r.getLong(4) == 0L) 0L else math.max(1L, r.getLong(4) / 3L)
      assert(r.getLong(5) === expSpans, s"doc ${r.getLong(0)} spans")
      val rec = SpanCorruption.reconstruct(r.getSeq[String](1), r.getSeq[String](2))
      assert(rec.length === n.toInt, s"doc ${r.getLong(0)} reconstruct")
    }
    // bit-identical replay
    val again = run()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}

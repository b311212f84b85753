package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** DSIR importance scoring: target-domain documents must outscore
  * out-of-domain ones, bigrams must matter, and the scorer must obey
  * NULL discipline. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("target-domain documents outscore the rest; selection recovers the domain") {
    val legal = (0 until 30).map(i =>
      (i.toLong, "whereas the party hereto agrees pursuant to clause " + (i % 5)))
    val chat = (30 until 60).map(i =>
      (i.toLong, "lol that movie was great see you at the game tonight " + (i % 7)))
    val raw = (legal ++ chat).toDF("doc_id", "text")
    val target = legal.take(10).map(_._2).toDF("text") // small in-domain sample
    val m = Dsir.learn(raw, target, "text", dim = 1 << 12)
    val scored = Dsir.score(raw, "text", m)
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    val worstLegal = legal.map(d => scored(d._1)).min
    val bestChat = chat.map(d => scored(d._1)).max
    assert(worstLegal > bestChat,
      s"legal min $worstLegal must beat chat max $bestChat")
  }

  test("bigram features separate same-unigram word salad from fluent order") {
    // identical unigram bags, different order: only bigrams differ
    val fluent = (0 until 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val salad = (20 until 40).map(i => (i.toLong, "fox the jumps quick brown"))
    val raw = (fluent ++ salad).toDF("doc_id", "text")
    val target = Seq("the quick brown fox jumps").toDF("text")
    val m = Dsir.learn(raw, target, "text", dim = 1 << 12)
    val scored = Dsir.score(raw, "text", m)
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    assert(fluent.map(d => scored(d._1)).min > salad.map(d => scored(d._1)).max)
  }

  test("NULL and empty text score NULL; scoring is deterministic") {
    val raw = Seq((1L, "some words here"), (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val m = Dsir.learn(raw, raw.filter(F.col("text").isNotNull), "text", 1 << 10)
    val out = Dsir.score(raw, "text", m).select("doc_id", "dsir_score")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L).isEmpty && out(3L).isEmpty && out(1L).nonEmpty)
    val again = Dsir.score(raw, "text", m).select("doc_id", "dsir_score")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(again == out)
  }
}

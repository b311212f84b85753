package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat", "the dog sat", "the cat ran").toDF("text")

  test("buildVocabulary ranks by count desc then token asc") {
    val v = Vocab.buildVocabulary(docs, F.col("text"), 3)
      .as[(String, Long)].collect().toSeq
    // the:3, cat:2, sat:2 — cat beats sat on the tie alphabetically
    assert(v === Seq(("the", 3L), ("cat", 2L), ("sat", 2L)))
  }

  test("oovStats counts the mass outside the vocabulary") {
    val v = Vocab.buildVocabulary(docs, F.col("text"), 3)
    val (total, oov, size) = Vocab.oovStats(docs, F.col("text"), v)
      .as[(Long, Long, Long)].head()
    assert(total === 9L)
    assert(oov === 2L)     // dog, ran
    assert(size === 3L)
  }

  test("topDistinctiveTerms ranks by tf/df with term tiebreak, map-only scoring") {
    val d = Seq(
      (1L, "cat cat cat shared shared unique1"),
      (2L, "dog dog shared unique2 unique2 unique2"),
      (3L, "shared other"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Vocab.topDistinctiveTerms(d, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: cat tf=3 df=1 → 3.0; unique1 1/1=1.0; shared 2/3≈0.67
    assert(out(1L) === Seq((1L, 1L, "cat", 3L, 1L), (1L, 2L, "unique1", 1L, 1L)))
    // doc 2: unique2 3/1=3.0; dog 2/1=2.0
    assert(out(2L) === Seq((2L, 1L, "unique2", 3L, 1L), (2L, 2L, "dog", 2L, 1L)))
    // doc 3: other 1/1=1.0 beats shared 1/3; ties impossible here
    assert(out(3L).head._3 === "other")
    assert(!out.contains(4L))                       // NULL text → no rows

    // tf/df tie breaks by term ASC: both terms 1/1
    val tie = Vocab.topDistinctiveTerms(
      Seq((9L, "zebra apple")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._2)
    assert(tie.map(_._3).toSeq === Seq("apple", "zebra"))

    // scoring pass is map-only: one exchange total (the df aggregate
    // runs at collect time, not in the scoring plan)
    val plan = Vocab.topDistinctiveTerms(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("unigramLogLoss scores documents by corpus-unigram cross-entropy") {
    val d = Seq((1L, "a a b"), (2L, "b"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Vocab.unigramLogLoss(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // counts: a=2, b=2, total=4 → every token -ln(1/2) = ln 2 ≈ 0.6931
    assert(out(1L) === ((3L, 0.6931)))
    assert(out(2L) === ((1L, 0.6931)))
    assert(!out.contains(3L) && !out.contains(4L))   // token-less docs omitted

    // rarer tokens score strictly higher
    val d2 = Seq((1L, "common common common common rare"), (2L, "common common"))
      .toDF("doc_id", "text")
    val s2 = Vocab.unigramLogLoss(d2, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s2(1L) > s2(2L))
  }

  test("top-V is a TakeOrdered, OOV joins by broadcast") {
    val v = Vocab.buildVocabulary(sf("sf0.001", "documents"), F.col("text"), 100)
    assert(v.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val o = Vocab.oovStats(sf("sf0.001", "documents"), F.col("text"), v)
    assert(o.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}

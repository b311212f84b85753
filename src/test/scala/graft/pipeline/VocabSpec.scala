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

  test("top-V is a TakeOrdered, OOV joins by broadcast") {
    val v = Vocab.buildVocabulary(sf("sf0.001", "documents"), F.col("text"), 100)
    assert(v.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val o = Vocab.oovStats(sf("sf0.001", "documents"), F.col("text"), v)
    assert(o.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Tokenizer artifacts must round-trip parquet exactly: same merges in
  * the same order, same pieces/scores, and identical downstream
  * tokenization. */
class TokenizersSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/m"

  test("BPE merge table round-trips in learned order") {
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest widest")
      .toDF("text")
    val merges = Vocab.learnBpeMergesBatched(docs, "text", 12, 32)._1
    val path = tmp("bpe")
    Tokenizers.saveBpeMerges(spark, merges, path)
    val back = Tokenizers.loadBpeMerges(spark, path)
    assert(back == merges)
    // downstream tokenization identical
    val ranks = back.zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap
    assert(Vocab.applyBpeRanked(ranks, "lowest") ==
      Vocab.applyBpe(merges.map(m => (m._1, m._2)), "lowest"))
  }

  test("unigram-LM model round-trips and tokenizes identically") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(50)
    val m = UnigramLm.learn(docs, "text", vocabSize = 64, iters = 2)
    val path = tmp("uni")
    Tokenizers.saveUnigramModel(spark, m, path)
    val back = Tokenizers.loadUnigramModel(spark, path)
    assert(back == m)
    val a = UnigramLm.tokenize(docs, "text", m).select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toMap
    val b = UnigramLm.tokenize(docs, "text", back).select("doc_id", "tokens")
      .as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("WordPiece model round-trips and tokenizes identically") {
    val docs = Seq("unhappy unhappier unhappiest happy happier").toDF("text")
    val m = WordPiece.learn(docs, "text", vocabSize = 48)
    val path = tmp("wp")
    Tokenizers.saveWordPieceModel(spark, m, path)
    val back = Tokenizers.loadWordPieceModel(spark, path)
    assert(back == m)
    val a = WordPiece.tokenize(docs, "text", m)
      .select(F.col("tokens")).as[Seq[String]].collect().head
    val b = WordPiece.tokenize(docs, "text", back)
      .select(F.col("tokens")).as[Seq[String]].collect().head
    assert(a == b)
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Vocabulary induction for tokenizer prep: the top-V corpus tokens by
 * frequency, and the out-of-vocabulary rate that vocabulary leaves
 * behind — the two numbers that size a word-level tokenizer before
 * training one.
 *
 * Shape at 100 TB: token counting is one hash exchange with map-side
 * combine (the shuffle carries (token, partial-count), never text);
 * top-V is TakeOrderedAndProject (per-partition heaps, no global
 * sort); the OOV pass re-attaches the V-row vocabulary by BROADCAST
 * anti-join, so the corpus token stream is never shuffled for it.
 * Ordering ties break by (count DESC, token ASC) so the boundary of
 * the vocabulary is engine-deterministic.
 */
object Vocab {

  /** Whitespace tokens, exactly as q_topk_words / DuckDB
    * string_split_regex tokenize (empties included — both engines
    * yield them identically). */
  private def tokens(df: DataFrame, textCol: Column): DataFrame =
    df.select(F.explode(F.split(textCol, "\\s+")).as("token"))

  /** Top-`vocabSize` tokens as (token, cnt), deterministic order. */
  def buildVocabulary(df: DataFrame, textCol: Column, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    tokens(df, textCol)
      .groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("token"))
      .limit(vocabSize)
  }

  /** One row: (total_tokens, oov_tokens, vocab_size) of the corpus
    * against a (token, ...) vocabulary. */
  def oovStats(df: DataFrame, textCol: Column, vocabulary: DataFrame): DataFrame = {
    val toks = tokens(df, textCol)
    val vocab = vocabulary.select(F.col("token"))
    val oov = toks.join(F.broadcast(vocab), Seq("token"), "left_anti")
      .agg(F.count(F.lit(1)).as("oov_tokens"))
    toks.agg(F.count(F.lit(1)).as("total_tokens"))
      .crossJoin(oov)
      .crossJoin(vocab.agg(F.count(F.lit(1)).as("vocab_size")))
  }
}

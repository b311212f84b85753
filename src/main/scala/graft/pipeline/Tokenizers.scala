package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Tokenizer-artifact persistence: every trained tokenizer (BPE merge
 * table, unigram-LM piece table, WordPiece vocabulary) round-trips
 * through plain parquet, the same discipline as the dedup signature
 * indexes — a corpus pipeline trains ONCE, persists, and every later
 * batch/stream loads the artifact instead of re-learning. Artifacts
 * are rows (KB-to-MB scale), so save is a single tiny write and load
 * is a driver-side collect.
 */
object Tokenizers {

  /** Persist a learned BPE merge table; order is the learned order. */
  def saveBpeMerges(
      spark: SparkSession,
      merges: Seq[(String, String, Long)],
      path: String,
      mode: String = "overwrite"): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, f), i) => (i, l, r, f) }
      .toDF("rank", "lft", "rgt", "freq")
      .repartition(1).write.mode(mode).parquet(path)
  }

  /** Load a BPE merge table in learned order. */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[(String, String, Long)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .orderBy(F.col("rank"))
      .select("lft", "rgt", "freq")
      .as[(String, String, Long)].collect().toSeq
  }

  /** Persist a unigram-LM model (pieces + the two scalars as a
    * sidecar row with a NULL piece). */
  def saveUnigramModel(
      spark: SparkSession,
      model: UnigramLm.Model,
      path: String,
      mode: String = "overwrite"): Unit = {
    import spark.implicits._
    val rows = model.pieces.toSeq.map { case (p, lp) =>
      (Option(p), lp, model.maxPieceLen, model.unkScore)
    }
    rows.toDF("piece", "logp", "max_piece_len", "unk_score")
      .repartition(1).write.mode(mode).parquet(path)
  }

  /** Load a unigram-LM model. */
  def loadUnigramModel(spark: SparkSession, path: String): UnigramLm.Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("piece", "logp", "max_piece_len", "unk_score")
      .as[(Option[String], Double, Int, Double)].collect()
    require(rows.nonEmpty, s"empty unigram model at $path")
    UnigramLm.Model(
      rows.iterator.map { case (p, lp, _, _) => p.get -> lp }.toMap,
      rows.head._3, rows.head._4)
  }

  /** Persist a WordPiece model (pieces + unk/max sidecar columns). */
  def saveWordPieceModel(
      spark: SparkSession,
      model: WordPiece.Model,
      path: String,
      mode: String = "overwrite"): Unit = {
    import spark.implicits._
    model.pieces.toSeq.map(p => (p, model.unk, model.maxInputChars))
      .toDF("piece", "unk", "max_input_chars")
      .repartition(1).write.mode(mode).parquet(path)
  }

  /** Load a WordPiece model. */
  def loadWordPieceModel(spark: SparkSession, path: String): WordPiece.Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("piece", "unk", "max_input_chars")
      .as[(String, String, Int)].collect()
    require(rows.nonEmpty, s"empty wordpiece model at $path")
    WordPiece.Model(rows.iterator.map(_._1).toSet, rows.head._2, rows.head._3)
  }
}

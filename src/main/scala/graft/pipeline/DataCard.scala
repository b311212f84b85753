package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}
import graft.sketch.SketchView

/**
 * Dataset cards: the per-source composition table a released corpus
 * ships with (docs, bytes, language mix, exact duplicate rate, length
 * distribution). One grouped pass over the corpus for the scalar
 * stats plus one (source, lang) aggregate for the language mode —
 * both shuffles key on bounded-cardinality columns, so the report
 * costs one corpus scan at any size.
 */
object DataCard {

  /**
   * One row per source: `n_docs`, `bytes` (UTF-8), `n_langs`,
   * `dup_docs` (docs minus distinct texts — exact content-equality
   * duplicates), `len_sketch` (DDSketch of character lengths, for
   * quantile columns downstream), `top_lang` + `top_lang_docs` (the
   * language mode; ties break to the lexicographically larger tag,
   * deterministically). NULL-text rows are excluded; a source whose
   * rows all have NULL language keeps NULL `top_lang`.
   */
  def sourceCards(
      docs: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String): DataFrame = {
    // one up-front hash exchange on source satisfies EVERY downstream
    // distribution — the gapFill partitioning lesson. Distinct counts
    // come from pre-aggregated (source, text) / (source, lang) groups
    // rather than countDistinct: two distinct aggregates on different
    // columns trigger Catalyst's expand+gid rewrite, whose internal
    // exchange no upstream partitioning can satisfy. The length
    // sketch folds each distinct text WEIGHTED by its multiplicity —
    // identical bins (counts are additive), one row per distinct
    // text instead of per document. Exactly one exchange end to end
    // (pinned in PlanShapeSpec).
    val d = docs.filter(F.col(textCol).isNotNull)
      .repartition(F.col(sourceCol))
    val byText = d.groupBy(F.col(sourceCol), F.col(textCol))
      .agg(F.count(F.lit(1)).as("__c"))
    val base = byText.groupBy(F.col(sourceCol))
      .agg(
        F.sum(F.col("__c")).as("n_docs"),
        F.sum(F.octet_length(F.col(textCol)) * F.col("__c")).cast("long")
          .as("bytes"),
        (F.sum(F.col("__c")) - F.count(F.lit(1))).as("dup_docs"),
        G.ddsketch_agg_weighted(
          F.length(F.col(textCol)).cast("double"),
          F.col("__c").cast("double"))
          .as("len_sketch"))
    val byLang = d.filter(F.col(langCol).isNotNull)
      .groupBy(F.col(sourceCol), F.col(langCol)).agg(F.count(F.lit(1)).as("__c"))
    val top = byLang.groupBy(F.col(sourceCol))
      // struct max compares count first, then the tag — a total,
      // deterministic order even under count ties
      .agg(F.count(F.lit(1)).as("n_langs"),
        F.max(F.struct(F.col("__c"), F.col(langCol).as("__l"))).as("__m"))
      .select(F.col(sourceCol), F.col("n_langs"),
        F.col("__m.__l").as("top_lang"), F.col("__m.__c").as("top_lang_docs"))
    base.join(top, Seq(sourceCol), "left")
      .select(F.col(sourceCol), F.col("n_docs"), F.col("bytes"),
        F.coalesce(F.col("n_langs"), F.lit(0L)).as("n_langs"),
        F.col("dup_docs"), F.col("len_sketch"),
        F.col("top_lang"), F.col("top_lang_docs"))
  }

  /** KMV size for the distinct-text view: the dup count is EXACT while
    * per-source distinct texts stay below k (the KMV exactness rule) —
    * size it above the largest source you ingest per card. */
  val DefaultTextsK: Int = 1 << 16

  /**
   * The nightly-ops form of [[sourceCards]]: persist four incremental
   * [[SketchView]]s at `basePath` once per ingest batch, and compute
   * the card from VIEW ROWS alone — no corpus rescan at read time.
   *
   *   - `len`    ddsketch over CHAR length, key = source  (n_docs, p50)
   *   - `bytes`  ddsketch over UTF-8 byte length          (exact bytes:
   *              lengths are integers, so the carried double sum is
   *              exact below 2^53 through every merge)
   *   - `texts`  KMV over the text, key = source          (dup_docs =
   *              n_docs − distinct, exact below k)
   *   - `langs`  ddsketch count view, key = (source, lang) (language
   *              mode + n_langs from one bounded row set)
   *
   * `tsCol` is the ingest-batch timestamp (documents carry no event
   * time — stamp the batch). [[appendCardViews]] is the per-batch
   * incremental maintenance; counts, sums and KMV unions are exact
   * bin/set addition, so the card equals the one-shot [[sourceCards]]
   * at any append granularity.
   */
  def materializeCardViews(
      docs: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String,
      tsCol: String,
      basePath: String,
      textsK: Int = DefaultTextsK): Unit =
    cardViewOps(docs, sourceCol, langCol, textCol, tsCol, basePath, textsK)
      .foreach { case (df, value, path, keys, fam) =>
        SketchView.materialize(df, tsCol, keys, value, path, "day", fam) }

  /** CONTINUOUS maintenance of the card views: each micro-batch lands
    * under its own `__batch` partition in all four views via
    * [[SketchView.appendBatch]], so an at-least-once replay overwrites
    * exactly its own files in each view (the streamAppend contract,
    * fanned out). One streaming writer per basePath; read cards any
    * time with [[cardsFromViews]]. Returns the writer — set
    * trigger/checkpoint and `.start()`. */
  def streamCardViews(
      stream: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String,
      tsCol: String,
      basePath: String,
      textsK: Int = DefaultTextsK)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        cardViewOps(batch, sourceCol, langCol, textCol, tsCol, basePath, textsK)
          .foreach { case (df, value, path, keys, fam) =>
            Maintenance.heartbeat(batch.sparkSession, path)
            Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
            SketchView.appendBatch(df, tsCol, keys, value, path, "day", fam,
              SketchView.DefaultPartSpanMs, batchId)
          }
    }

  /** Incremental maintenance of [[materializeCardViews]]'s views. */
  def appendCardViews(
      docs: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String,
      tsCol: String,
      basePath: String,
      textsK: Int = DefaultTextsK): Unit =
    cardViewOps(docs, sourceCol, langCol, textCol, tsCol, basePath, textsK)
      .foreach { case (df, value, path, keys, fam) =>
        SketchView.append(df, tsCol, keys, value, path, "day", fam) }

  private def cardViewOps(
      docs: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String,
      tsCol: String,
      basePath: String,
      textsK: Int) = {
    val d = docs.filter(F.col(textCol).isNotNull)
    val VF = SketchView.ViewFamily
    Seq(
      (d.withColumn("__v", F.length(F.col(textCol)).cast("double")),
        "__v", s"$basePath/len", Seq(sourceCol), VF.ddsketch()),
      (d.withColumn("__v", F.octet_length(F.col(textCol)).cast("double")),
        "__v", s"$basePath/bytes", Seq(sourceCol), VF.weightedCount()),
      (d.withColumn("__v", F.col(textCol)),
        "__v", s"$basePath/texts", Seq(sourceCol), VF.kmvDistinct(textsK)),
      (d.withColumn("__v", F.lit(1.0)),
        "__v", s"$basePath/langs", Seq(sourceCol, langCol), VF.ddsketch()))
  }

  /** Retention across all four card views: drop every partition
    * directory older than `keepFromMs` (directory-level deletes, the
    * [[SketchView.expire]] contract) — cards then describe only the
    * kept ingest window. Returns partitions dropped. */
  def expireCardViews(
      spark: SparkSession, basePath: String, keepFromMs: Long): Int =
    Seq("len", "bytes", "texts", "langs")
      .map(sub => SketchView.expire(spark, s"$basePath/$sub", keepFromMs))
      .sum

  /** Per-view compaction (one row per (bucket, keys) in each of the
    * four views) — nightly maintenance; families resolve from each
    * view's own manifest. Single-maintainer, like every compact. */
  def compactCardViews(spark: SparkSession, basePath: String): Unit =
    Seq("len", "bytes", "texts", "langs").foreach { sub =>
      val path = s"$basePath/$sub"
      val m = SketchView.readManifest(spark, path).getOrElse(
        throw new IllegalArgumentException(s"card view $path has no manifest"))
      SketchView.compact(spark, path, m.keyCols,
        SketchView.ViewFamily.fromManifest(m.family, m.geometry))
    }

  /** The card computed from the persisted views alone — same output
    * contract as [[sourceCards]]; the plan reads only sketch rows. */
  def cardsFromViews(spark: SparkSession, basePath: String): DataFrame = {
    // collapse a view across its time buckets to one row per key set
    def total(sub: String): (DataFrame, Seq[String]) = {
      val path = s"$basePath/$sub"
      val m = SketchView.readManifest(spark, path).getOrElse(
        throw new IllegalArgumentException(s"card view $path has no manifest"))
      val fam = SketchView.ViewFamily.fromManifest(m.family, m.geometry)
      val view = SketchView.read(spark, path, m.keyCols, fam)
      (view.groupBy(m.keyCols.map(F.col): _*)
        .agg(fam.merge(F.col("sketch")).as("sketch")), m.keyCols)
    }
    val (len, lenKeys) = total("len")
    val sourceCol = lenKeys.head
    val (bytes, _) = total("bytes")
    val (texts, _) = total("texts")
    val (langs, langKeys) = total("langs")
    val langCol = langKeys(1)
    val base = len
      .select(F.col(sourceCol),
        G.ddsketch_count(F.col("sketch")).as("n_docs"),
        F.col("sketch").as("len_sketch"))
      .join(bytes.select(F.col(sourceCol),
        // exact: byte lengths ride the COUNT field (ViewFamily.weightedCount)
        G.ddsketch_count(F.col("sketch")).as("bytes")), Seq(sourceCol))
      .join(texts.select(F.col(sourceCol),
        graft.sketch.kmv.kmv_distinct(F.col("sketch")).cast("long")
          .as("__distinct")), Seq(sourceCol))
      .withColumn("dup_docs", F.col("n_docs") - F.col("__distinct"))
    val top = langs
      .filter(F.col(langCol).isNotNull)
      .select(F.col(sourceCol), F.col(langCol),
        G.ddsketch_count(F.col("sketch")).as("__c"))
      .groupBy(F.col(sourceCol))
      .agg(F.count(F.lit(1)).as("n_langs"),
        F.max(F.struct(F.col("__c"), F.col(langCol).as("__l"))).as("__m"))
      .select(F.col(sourceCol), F.col("n_langs"),
        F.col("__m.__l").as("top_lang"), F.col("__m.__c").as("top_lang_docs"))
    base.join(top, Seq(sourceCol), "left")
      .select(F.col(sourceCol), F.col("n_docs"), F.col("bytes"),
        F.coalesce(F.col("n_langs"), F.lit(0L)).as("n_langs"),
        F.col("dup_docs"), F.col("len_sketch"),
        F.col("top_lang"), F.col("top_lang_docs"))
  }
}

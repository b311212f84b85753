package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}

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
}

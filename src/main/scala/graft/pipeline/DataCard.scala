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
    val d = docs.filter(F.col(textCol).isNotNull)
    val base = d.groupBy(F.col(sourceCol))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(F.octet_length(F.col(textCol))).cast("long").as("bytes"),
        F.countDistinct(F.col(langCol)).as("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(textCol))).as("dup_docs"),
        G.ddsketch_agg_values(F.length(F.col(textCol)).cast("double"))
          .as("len_sketch"))
    val top = d.filter(F.col(langCol).isNotNull)
      .groupBy(F.col(sourceCol), F.col(langCol)).agg(F.count(F.lit(1)).as("__c"))
      .groupBy(F.col(sourceCol))
      // struct max compares count first, then the tag — a total,
      // deterministic order even under count ties
      .agg(F.max(F.struct(F.col("__c"), F.col(langCol).as("__l"))).as("__m"))
      .select(F.col(sourceCol),
        F.col("__m.__l").as("top_lang"), F.col("__m.__c").as("top_lang_docs"))
    base.join(top, Seq(sourceCol), "left")
  }
}

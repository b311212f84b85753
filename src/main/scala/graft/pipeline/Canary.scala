package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Dataset canaries — unique provenance strings planted into a
 * released corpus so downstream LEAKAGE is detectable: if a model (or
 * a rehosted dataset) reproduces a canary token, the token identifies
 * the release it came from (the practice behind eval canary GUIDs and
 * copyright-trap strings).
 *
 *   - [[plant]] appends a per-document canary token to a
 *     deterministic md5-rule fraction of documents (the
 *     [[Sampling.sampledBy]] rule, so the planted SET is reproducible
 *     from `releaseId` + the ids alone — no stored state);
 *   - the token is `canary` + md5(releaseId:docId): 32 hex chars,
 *     collision-free in practice and unguessable without the id pair;
 *   - [[scan]] extracts every canary-shaped token from any corpus —
 *     map-only, codegen'd regex;
 *   - [[verify]] marks which scanned tokens belong to `releaseId`
 *     given candidate document ids (a broadcast of the expected
 *     token set — release-sized, not corpus-sized).
 *
 * Everything is deterministic arithmetic over ids, so plant → scan →
 * verify round-trips replay exactly in any engine with md5.
 */
object Canary {

  /** The canary token of (releaseId, docId). */
  def token(releaseId: String, id: Column): Column =
    F.concat(F.lit("canary"),
      F.md5(F.concat(F.lit(releaseId), F.lit(":"), id.cast("string"))))

  /** Append a canary to the md5-rule `fraction` of documents (NULL
    * text passes through unplanted). Deterministic in (releaseId,
    * id): re-planting the same release marks the same documents. */
  def plant(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      releaseId: String,
      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    docs.withColumn(textCol,
      F.when(F.col(textCol).isNotNull &&
          Sampling.sampledBy(F.col(idCol), fraction),
        F.concat(F.col(textCol), F.lit(" "),
          token(releaseId, F.col(idCol))))
        .otherwise(F.col(textCol)))
  }

  /** Every canary-shaped token in `textCol`: (idCol, canary STRING),
    * one row per occurrence. Map-only regex extraction. */
  def scan(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(F.col(idCol),
        F.explode(F.regexp_extract_all(F.col(textCol),
          F.lit("canary[0-9a-f]{32}"), F.lit(0))).as("canary"))

  /** Which scanned tokens belong to `releaseId`: joins the scan
    * output against the expected token set of `candidateIds`
    * (release-sized — broadcast), adding `source_id` (the planted
    * document) or NULL for foreign/corrupt canaries. */
  def verify(
      scanned: DataFrame,
      releaseId: String,
      candidateIds: DataFrame,
      candidateIdCol: String): DataFrame = {
    val expected = candidateIds.select(
      F.col(candidateIdCol).as("source_id"),
      token(releaseId, F.col(candidateIdCol)).as("canary"))
    scanned.join(F.broadcast(expected), Seq("canary"), "left")
  }
}

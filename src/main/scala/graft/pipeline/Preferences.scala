package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Preference-pair (DPO/RLHF reward-model) data hygiene: the checks a
 * post-training pipeline runs over (prompt, chosen, rejected) triples
 * before optimization. Everything here is exact Column math (lengths,
 * normalized string equality, hash joins) — engine-replayable, no
 * models, no floats beyond one ratio of exact integers.
 */
object Preferences {

  /** Whitespace-collapsed, trimmed, lowercased form — the
    * trivial-duplicate equivalence preference sets are deduped under. */
  def normalized(c: Column): Column =
    F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), "\\s+", " "))

  /**
   * Per-pair validation booleans appended to the input:
   *
   *   - `nonempty`: prompt, chosen and rejected all non-null with
   *     non-whitespace content;
   *   - `distinct_exact`: chosen != rejected byte-for-byte;
   *   - `distinct_norm`: still distinct after [[normalized]] — flags
   *     the whitespace/case near-dupes that silently zero a DPO
   *     gradient;
   *   - `length_ok`: code-point length ratio between the responses is
   *     at most `maxLenRatio` (degenerate pairs where one side is a
   *     fragment teach length, not preference);
   *   - `valid`: conjunction.
   *
   * Map-only; one ratio of exact integer lengths (single IEEE
   * division — deterministic cross-engine).
   */
  def validatePairs(
      df: DataFrame,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String,
      maxLenRatio: Double = 8.0): DataFrame = {
    require(maxLenRatio >= 1.0, s"maxLenRatio must be >= 1, got $maxLenRatio")
    val p = F.col(promptCol)
    val c = F.col(chosenCol)
    val r = F.col(rejectedCol)
    val nonempty = p.isNotNull && c.isNotNull && r.isNotNull &&
      F.length(F.trim(p)) > 0 && F.length(F.trim(c)) > 0 &&
      F.length(F.trim(r)) > 0
    val lc = F.length(c).cast("double")
    val lr = F.length(r).cast("double")
    val lengthOk = c.isNotNull && r.isNotNull &&
      F.length(c) > 0 && F.length(r) > 0 &&
      F.greatest(lc, lr) <= F.least(lc, lr) * maxLenRatio
    df.withColumn("nonempty", nonempty)
      .withColumn("distinct_exact",
        c.isNotNull && r.isNotNull && c =!= r)
      .withColumn("distinct_norm", normalized(c) =!= normalized(r))
      .withColumn("length_ok", lengthOk)
      .withColumn("valid",
        F.col("nonempty") && F.col("distinct_exact") &&
        F.col("distinct_norm") && F.col("length_ok"))
  }

  /**
   * Label-noise detection: pairs of rows over the SAME normalized
   * prompt whose preferences point in OPPOSITE directions (one row's
   * chosen is the other's rejected and vice versa) — contradictory
   * annotations that cancel in training and usually mean a rater or
   * join bug upstream. Returns (id_a, id_b) with id_a < id_b.
   *
   * Scale shape: the self-join runs on sha2 digests of the normalized
   * (prompt, chosen, rejected) fields — a 3 x 32-byte join key, never
   * the texts — and hash-partitions on the prompt digest, so the
   * match is one shuffle of digests.
   */
  def conflictingPairs(
      df: DataFrame,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame = {
    val keyed = df.select(
      F.col(idCol).cast("long").as("__id"),
      F.sha2(normalized(F.col(promptCol)), 256).as("__p"),
      F.sha2(normalized(F.col(chosenCol)), 256).as("__c"),
      F.sha2(normalized(F.col(rejectedCol)), 256).as("__r"))
    val a = keyed.select(F.col("__id").as("id_a"), F.col("__p"),
      F.col("__c").as("__ca"), F.col("__r").as("__ra"))
    val b = keyed.select(F.col("__id").as("id_b"), F.col("__p"),
      F.col("__c").as("__cb"), F.col("__r").as("__rb"))
    a.join(b, Seq("__p"))
      .filter(F.col("id_a") < F.col("id_b") &&
        F.col("__ca") === F.col("__rb") && F.col("__ra") === F.col("__cb"))
      .select("id_a", "id_b")
  }

  /** Exact preference dedupe: keep the lowest-id row per normalized
    * (prompt, chosen, rejected) triple — the
    * [[Dedup.dropExactDuplicates]] shape with a 3-field digest key,
    * so the shuffle carries 96 bytes per row, not the texts. */
  def dedupePairs(
      df: DataFrame,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame = {
    // per-field digests concatenated (fixed width -> collision-free
    // tuple encoding; raw-text concat would alias across field splits)
    val keyed = df.withColumn("__k", F.concat(
      F.sha2(normalized(F.col(promptCol)), 256),
      F.sha2(normalized(F.col(chosenCol)), 256),
      F.sha2(normalized(F.col(rejectedCol)), 256)))
    val keep = keyed.groupBy(F.col("__k")).agg(F.min(F.col(idCol)).as(idCol))
    keep.join(keyed, Seq("__k", idCol)).drop("__k")
  }

  /** Persistable preference digest table: (id, p, c, r) sha2 digests
    * of the normalized fields — the probe side for nightly
    * [[incrementalConflicts]]; id-bearing flat parquet
    * ([[Dedup.saveSignatureIndex]] family, takedowns unchanged). */
  def buildPreferenceIndex(
      df: DataFrame,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame =
    df.select(
      F.col(idCol).cast("long").as("id"),
      F.sha2(normalized(F.col(promptCol)), 256).as("p"),
      F.sha2(normalized(F.col(chosenCol)), 256).as("c"),
      F.sha2(normalized(F.col(rejectedCol)), 256).as("r"))

  /** Nightly-delta conflict detection: fresh annotations probed
    * against a persisted [[buildPreferenceIndex]] — only the delta is
    * normalized and hashed (the incrementalChunkOverlap discipline).
    * Returns (id_new, id_old) for every fresh row whose preference
    * REVERSES a history row over the same normalized prompt. */
  def incrementalConflicts(
      fresh: DataFrame,
      index: DataFrame,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame = {
    val f = buildPreferenceIndex(fresh, idCol, promptCol, chosenCol, rejectedCol)
      .select(F.col("id").as("id_new"), F.col("p"),
        F.col("c").as("__cn"), F.col("r").as("__rn"))
    val h = index.select(F.col("id").as("id_old"), F.col("p"),
      F.col("c").as("__co"), F.col("r").as("__ro"))
    f.join(h, Seq("p"))
      .filter(F.col("__cn") === F.col("__ro") && F.col("__rn") === F.col("__co"))
      .select("id_new", "id_old")
  }

  /** Streaming conflict detection: each micro-batch of fresh
    * annotations probes the persisted [[buildPreferenceIndex]] and
    * dynamic-overwrites its own `__batch` partition of the conflict
    * table — stateless, replay-idempotent (the streamChunkOverlap
    * protocol). */
  def conflictStream(
      stream: DataFrame,
      indexPath: String,
      outPath: String,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pairs = incrementalConflicts(batch,
          spark.read.parquet(indexPath), idCol, promptCol, chosenCol,
          rejectedCol)
        if (!pairs.isEmpty)
          pairs.withColumn("__batch", F.lit(batchId))
            .repartition(1)
            .write.partitionBy("__batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        ()
    }
}

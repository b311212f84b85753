package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Corpus-frequency boilerplate removal — the C4/RefinedWeb line-dedup
 * step: split every document into segments (lines in real corpora; the
 * separator is a regex knob), count each distinct segment's DOCUMENT
 * frequency across the corpus, and rewrite documents with the
 * high-frequency segments ("©2024 …", nav menus, cookie banners)
 * removed while preserving segment order.
 *
 * Scale shape (mirrors [[Decontaminate]]): the frequent-segment set is
 * by construction a heavy-hitter set — tiny relative to the corpus —
 * so pass 1 is a map-side-combined groupBy on segments (shuffle rows
 * are (segment, partial count), never documents), the survivors are
 * collected and BROADCAST, and pass 2 rewrites every document in a
 * single map-only scan. Nothing corpus-sized is ever joined or
 * shuffled. For corpora where even the distinct-segment aggregation is
 * too hot, the TopK/CMS sketch families bound the same candidate set
 * approximately; the exact form here is the oracle-checkable contract.
 *
 * Segment semantics: `split(text, sepRegex)`, empty segments dropped
 * (blank lines are never content), document frequency counted on
 * DISTINCT segments per document. NULL text stays NULL.
 */
object Boilerplate {

  /** Non-empty segments of `text` as an array column. */
  def segments(text: Column, sepRegex: String): Column =
    F.filter(F.split(text, sepRegex), s => F.length(s) > 0)

  /**
   * Exact (segment, doc_freq) table of segments appearing in at least
   * `minDocFreq` distinct documents. One shuffle of (segment, count)
   * partials; output is heavy-hitters only.
   */
  def frequentSegments(
      docs: DataFrame,
      textCol: String,
      sepRegex: String,
      minDocFreq: Long): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    docs
      .select(F.explode(F.array_distinct(
        segments(F.col(textCol), sepRegex))).as("segment"))
      .groupBy(F.col("segment"))
      .agg(F.count(F.lit(1)).as("doc_freq"))
      .filter(F.col("doc_freq") >= minDocFreq)
  }

  /**
   * Rewrite `textCol` with frequent segments removed: returns `docs`
   * with the text column replaced by the cleaned text (non-boilerplate
   * segments re-joined with `joinSep`, a document that was all
   * boilerplate becomes the empty string, NULL stays NULL).
   *
   * Triggers one Spark job at call time to collect the frequent-segment
   * set (heavy hitters — driver-sized by construction); the rewrite
   * itself is map-only over the corpus.
   */
  def stripBoilerplate(
      docs: DataFrame,
      textCol: String,
      sepRegex: String,
      joinSep: String,
      minDocFreq: Long): DataFrame =
    stripBoilerplateWith(docs,
      frequentSegmentSet(docs, textCol, sepRegex, minDocFreq),
      textCol, sepRegex, joinSep)

  /** Collect the frequent-segment set of a (static) reference corpus —
    * the input to [[stripBoilerplateWith]] when the rewrite target is a
    * different DataFrame, e.g. a STREAM cleaned against yesterday's
    * batch-computed set. */
  def frequentSegmentSet(
      refDocs: DataFrame,
      textCol: String,
      sepRegex: String,
      minDocFreq: Long): Set[String] =
    frequentSegments(refDocs, textCol, sepRegex, minDocFreq)
      .select("segment")
      .collect()
      .map(_.getString(0))
      .toSet

  /** [[frequentSegmentSet]] with an explicit top-`maxSegments` cap —
    * the bounded-broadcast dial for corpora whose heavy-hitter set
    * itself outgrows a driver collect. Keeps the `maxSegments` most
    * frequent segments (ties by segment ASC, so the boundary is
    * engine-deterministic) and returns the number of qualifying
    * segments that were TRUNCATED away — callers must surface a
    * nonzero drop count rather than silently under-strip. */
  def frequentSegmentSetCapped(
      refDocs: DataFrame,
      textCol: String,
      sepRegex: String,
      minDocFreq: Long,
      maxSegments: Int): (Set[String], Long) = {
    require(maxSegments > 0, s"maxSegments must be positive, got $maxSegments")
    val heavy = frequentSegments(refDocs, textCol, sepRegex, minDocFreq)
      .localCheckpoint(eager = false)
    val total = heavy.count()
    val kept = heavy
      .orderBy(F.col("doc_freq").desc, F.col("segment"))
      .limit(maxSegments)
      .select("segment")
      .collect()
      .map(_.getString(0))
      .toSet
    (kept, total - kept.size)
  }

  /**
   * Join-based [[stripBoilerplate]] — identical output, NO driver-side
   * segment set. The broadcast form's heavy-hitter argument holds for
   * sane thresholds, but a low `minDocFreq` over a 100 TB corpus can
   * still qualify a driver-breaking segment count; this form never
   * collects anything. Requires a unique `idCol` to reassemble
   * documents.
   *
   * Scale shape: posexplode the segments (one corpus-sized narrow
   * pass), LEFT ANTI join against the frequent-segment table on the
   * segment key (both sides shuffle on segment — the frequent table is
   * heavy-hitters-only and usually broadcasts under AQE anyway), then
   * regroup by document and rebuild the text with array_sort over
   * (position, segment) structs — order is preserved exactly. A NULL
   * text stays NULL; a document whose every segment was boilerplate
   * (or that had no segments) rebuilds as the empty string — the same
   * contract as [[stripBoilerplate]], row-for-row EQUAL.
   */
  def stripBoilerplateJoined(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String,
      joinSep: String,
      minDocFreq: Long): DataFrame = {
    val segs = docs
      .select(F.col(idCol), F.posexplode(segments(F.col(textCol), sepRegex))
        .as(Seq("__pos", "__seg")))
    val freq = frequentSegments(docs, textCol, sepRegex, minDocFreq)
      .select(F.col("segment").as("__seg"))
    val rebuilt = segs
      .join(freq, Seq("__seg"), "left_anti")
      .groupBy(F.col(idCol))
      .agg(F.array_join(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("__seg")))),
        s => s.getField("__seg")), joinSep).as("__clean"))
    docs
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol,
        F.when(F.col(textCol).isNull, F.lit(null).cast("string"))
          .otherwise(F.coalesce(F.col("__clean"), F.lit(""))))
      .drop("__clean")
  }

  /** Map-only rewrite against an explicit boilerplate set. Works on
    * batch and streaming DataFrames alike (no shuffle, no state). */
  def stripBoilerplateWith(
      docs: DataFrame,
      boilerplate: Set[String],
      textCol: String,
      sepRegex: String,
      joinSep: String): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(boilerplate)
    // precompiled once per closure: String.split recompiles any
    // multi-char regex on every call — measurable on a corpus scan
    val sep = java.util.regex.Pattern.compile(sepRegex)
    val rewriteU = F.udf((t: String) =>
      if (t == null) null
      else sep.split(t).iterator
        .filter(s => s.nonEmpty && !bc.value.contains(s))
        .mkString(joinSep))
    docs.withColumn(textCol, rewriteU(F.col(textCol)))
  }
}

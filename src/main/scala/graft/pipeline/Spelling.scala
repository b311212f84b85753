package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/**
 * Query spelling correction over the corpus TERM DICTIONARY — the
 * SymSpell deletion-neighborhood scheme applied to search serving: a
 * typo'd query term suggests the dictionary terms within edit
 * distance <= maxEdit, ranked by how common they are in the corpus.
 *
 * The SymSpell identity makes the candidate join hash-equality
 * instead of all-pairs: lev(a, b) <= k implies the <= k-deletion
 * neighborhoods of a and b intersect (a substitution deletes one char
 * on each side; an insertion deletes on one side) — so indexing every
 * dictionary term under its deletion variants and probing with the
 * query term's variants yields a candidate SUPERSET, verified by an
 * exact banded DP ([[levenshteinAt]]). The same scheme as
 * [[Dedup.editOnePairs]] / [[Dedup.editKPairs]], aimed at a
 * dictionary instead of a corpus.
 *
 * Scale shape: the spell index is dictionary-sized x O(len^maxEdit)
 * variant rows (terms are short — bounded blowup), built once per
 * index build; a query probe touches only the rows whose key is in
 * the query term's bounded variant set (an `isin` filter — map-side,
 * partition-prunable if the caller persists the index partitioned by
 * a key hash). Everything downstream of the probe is
 * candidates-sized. All ranking quantities are INTEGERS (distance,
 * df) — suggestions replay exactly cross-engine with no float
 * anywhere.
 */
object Spelling {

  /** Term dictionary of a built positional index: one row per term
    * with document frequency `df` and collection frequency `cf`. */
  def termDictionary(index: DataFrame): DataFrame =
    index.groupBy("term")
      .agg(F.count(F.lit(1)).as("df"), F.sum(F.col("tf")).as("cf"))

  /** All strings reachable from `s` by deleting at most `maxEdit`
    * characters (including s itself — the distance-0 key). Bounded:
    * |s| choose <= maxEdit variants. */
  private[pipeline] def deletions(s: String, maxEdit: Int): Set[String] = {
    var frontier = Set(s)
    val out = scala.collection.mutable.HashSet[String](s)
    var d = 0
    while (d < maxEdit) {
      frontier = frontier.flatMap { w =>
        (0 until w.length).map(i => w.substring(0, i) + w.substring(i + 1))
      }
      out ++= frontier
      d += 1
    }
    out.toSet
  }

  /** Exact Levenshtein distance of (a, b), or -1 when it exceeds
    * `k` (rolling two-row DP with an early exit once a full row's
    * minimum passes k — row minima only grow). Plain
    * insert/delete/substitute (no transposition), matching
    * [[Dedup.editDistanceAtMost]] and SQL `levenshtein`. */
  private[pipeline] def levenshteinAt(a: String, b: String, k: Int): Int = {
    if (a == b) return 0
    val (n, m) = (a.length, b.length)
    if (math.abs(n - m) > k) return -1
    var prev = Array.tabulate(m + 1)(j => j)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var best = cur(0)
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        if (cur(j) < best) best = cur(j)
        j += 1
      }
      if (best > k) return -1 // the whole band exceeded k: no path back
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  private def deletionsUdf(maxEdit: Int) =
    F.udf((t: String) =>
      if (t == null) null
      else graft.pipeline.Spelling.deletions(t, maxEdit).toArray)

  /**
   * Deletion-neighborhood spell index over a term dictionary: one row
   * per (key = deletion variant, term, df, cf). Build once per
   * dictionary; persist with plain parquet if reused across sessions.
   */
  def buildSpellIndex(dict: DataFrame, maxEdit: Int): DataFrame = {
    require(maxEdit >= 1, s"maxEdit must be >= 1, got $maxEdit")
    dict.select(F.col("term"), F.col("df"), F.col("cf"),
      F.explode(deletionsUdf(maxEdit)(F.col("term"))).as("key"))
  }

  /**
   * Suggestions for a batch of (possibly misspelled) query terms:
   * (query_term, rank, term, distance, df), the `k` best per query
   * term by (distance ASC, df DESC, term ASC) — exact-integer
   * ranking, no floats. The probe's candidate set is the hash-join of
   * the query terms' bounded deletion variants against the index
   * keys, verified by the exact DP; a dictionary term within
   * `maxEdit` is never missed (the SymSpell superset identity).
   */
  def suggestBatch(
      spellIndex: DataFrame,
      queryTerms: Seq[String],
      maxEdit: Int,
      k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "suggestBatch: no query terms")
    val spark = spellIndex.sparkSession
    import spark.implicits._
    val qs = queryTerms.map(_.toLowerCase).distinct
    val pairs = qs.flatMap(q => deletions(q, maxEdit).map(key => (q, key)))
    val allKeys = pairs.map(_._2).distinct
    val probe = pairs.toDF("query_term", "key")
    val distU = F.udf((q: String, t: String) =>
      graft.pipeline.Spelling.levenshteinAt(q, t, maxEdit))
    val cand = spellIndex
      .filter(F.col("key").isin(allKeys: _*))
      .join(F.broadcast(probe), "key")
      .select("query_term", "term", "df")
      .distinct()
      .withColumn("distance", distU(F.col("query_term"), F.col("term")))
      .filter(F.col("distance") >= 0)
    val w = Window.partitionBy(F.col("query_term"))
      .orderBy(F.col("distance").asc, F.col("df").desc, F.col("term").asc)
    cand.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_term", "rank", "term", "distance", "df")
  }

  /** Single-term convenience form of [[suggestBatch]]. */
  def suggest(
      spellIndex: DataFrame,
      queryTerm: String,
      maxEdit: Int,
      k: Int): DataFrame =
    suggestBatch(spellIndex, Seq(queryTerm), maxEdit, k)
      .drop("query_term")
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Multi-pattern literal scanning via a broadcast Aho-Corasick
 * automaton — the blocklist/safety-term/brand-scrub scan at the scale
 * where a regex alternation stops compiling: matching a MILLION
 * literal patterns costs the same single pass over each document as
 * matching ten (O(text + matches), pattern count only affects the
 * automaton build). The automaton builds ONCE driver-side from the
 * bounded pattern list and broadcasts; scanning is map-only.
 *
 * Matches are counted at every end position (the standard AC output
 * walk): every occurrence of every pattern counts, including a
 * pattern occurring inside another pattern's match. Patterns match
 * literally and case-sensitively by default; two folding dials relax
 * that without exploding the pattern set:
 *
 *  - `caseInsensitive` (build-time): the automaton folds every
 *    character through `Character.toLowerCase` on both sides — char-
 *    for-char, so POSITIONS are preserved and [[scrubKeywords]] can
 *    redact the original text's spans.
 *  - `folded` (scan/filter only): text and patterns pass through the
 *    [[TextFunctions.foldUnicode]] kernel + lowercase first, so
 *    fullwidth/ligature/accent variants match too. Folding changes
 *    string length ("…" → "..."), so this form has no
 *    position-preserving scrub — counts refer to the folded text.
 */
object Keywords {

  /** Trie + failure links + output counts, laid out in parallel
    * arrays. Serializable: ships once per executor as a broadcast. */
  final class Automaton private[Keywords] (
      private[Keywords] val next: Array[java.util.HashMap[Character, Integer]],
      private[Keywords] val fail: Array[Int],
      private[Keywords] val outCount: Array[Int],
      private[Keywords] val outDistinct: Array[Array[Int]],
      private[Keywords] val lengths: Array[Int],
      val nPatterns: Int,
      private[Keywords] val lowerCased: Boolean) extends Serializable {

    private def step(state: Int, c0: Char): Int = {
      val c = if (lowerCased) Character.toLowerCase(c0) else c0
      var s = state
      while (s != 0 && !next(s).containsKey(c)) s = fail(s)
      val t = next(s).get(c)
      if (t == null) 0 else t.intValue()
    }

    /** Star-out every matched span (all patterns, all positions,
      * overlaps unioned): the redaction form. Length-preserving —
      * each matched character becomes `mask` — so downstream span
      * arithmetic survives. */
    def scrub(text: String, mask: Char): String = {
      if (text == null) return null
      var s = 0
      var masked: java.util.BitSet = null
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val ds = outDistinct(s)
        if (ds.nonEmpty) {
          if (masked == null) masked = new java.util.BitSet(text.length)
          var j = 0
          while (j < ds.length) {
            masked.set(i - lengths(ds(j)) + 1, i + 1)
            j += 1
          }
        }
        i += 1
      }
      if (masked == null) text
      else {
        val out = text.toCharArray
        var b = masked.nextSetBit(0)
        while (b >= 0) { out(b) = mask; b = masked.nextSetBit(b + 1) }
        new String(out)
      }
    }

    /** (total occurrence count, number of DISTINCT patterns seen). */
    def scan(text: String): (Long, Int) = {
      if (text == null) return (0L, 0)
      var s = 0
      var hits = 0L
      var seen: java.util.BitSet = null
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outCount(s) > 0) {
          hits += outCount(s)
          val ds = outDistinct(s)
          if (ds.nonEmpty) {
            if (seen == null) seen = new java.util.BitSet(nPatterns)
            var j = 0
            while (j < ds.length) { seen.set(ds(j)); j += 1 }
          }
        }
        i += 1
      }
      (hits, if (seen == null) 0 else seen.cardinality())
    }
  }

  /** Per-char lowercase — length-preserving, unlike String.toLowerCase
    * (which expands e.g. 'İ' to two chars under locale rules). */
  private def lowerChars(s: String): String = {
    val out = new Array[Char](s.length)
    var i = 0
    while (i < s.length) { out(i) = Character.toLowerCase(s.charAt(i)); i += 1 }
    new String(out)
  }

  /** The scan-side fold: Unicode canonicalization then lowercase. */
  private[pipeline] def foldKeyword(s: String): String =
    if (s == null) null else lowerChars(TextFunctions.foldUnicodeKernel(s))

  /** Build the automaton from literal patterns (duplicates collapse;
    * empty patterns rejected). Driver-side, O(total pattern chars).
    * `caseInsensitive` folds pattern and input characters through
    * `Character.toLowerCase` — position-preserving, so scrubbing
    * still works. */
  def buildAutomaton(
      patterns: Seq[String], caseInsensitive: Boolean = false): Automaton = {
    val ps = (if (caseInsensitive) patterns.map(lowerChars)
              else patterns).distinct.toArray
    require(ps.nonEmpty, "at least one pattern required")
    require(ps.forall(p => p != null && p.nonEmpty), "patterns must be non-empty")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(-1) // pattern idx ending here
    ps.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val t = next(s).get(c)
        s = if (t != null) t.intValue()
        else {
          next += new java.util.HashMap[Character, Integer]()
          ends += -1
          next(s).put(c, next.length - 1)
          next.length - 1
        }
      }
      ends(s) = pi
    }
    val n = next.length
    val fail = new Array[Int](n)
    val outCount = new Array[Int](n)
    val outDistinct = new Array[Array[Int]](n)
    // BFS over the trie: fail(child) = step(fail(parent), c); output
    // sets accumulate along failure links (flattened to counts + the
    // distinct-pattern id lists, so scans never walk fail chains)
    val ownOut = Array.tabulate(n)(s => if (ends(s) >= 0) Array(ends(s)) else Array.empty[Int])
    val queue = scala.collection.mutable.Queue.empty[Int]
    val it0 = next(0).entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      fail(e.getValue) = 0
      queue += e.getValue.intValue()
    }
    outDistinct(0) = ownOut(0)
    outCount(0) = ownOut(0).length
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outDistinct(s) = ownOut(s) ++ outDistinct(fail(s))
      outCount(s) = outDistinct(s).length
      val it = next(s).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey.charValue()
        val child = e.getValue.intValue()
        var f = fail(s)
        while (f != 0 && !next(f).containsKey(c)) f = fail(f)
        val t = next(f).get(c)
        fail(child) =
          if (t != null && t.intValue() != child) t.intValue() else 0
        queue += child
      }
    }
    new Automaton(next.toArray, fail, outCount, outDistinct,
      ps.map(_.length), ps.length, caseInsensitive)
  }

  /**
   * Adds `<outCol>` = struct(hits BIGINT, patterns INT): total
   * occurrence count and distinct patterns matched in `textCol`.
   * NULL text → struct(0, 0) (scan of nothing finds nothing — not an
   * error). One broadcast, map-only. `folded` matches through the
   * Unicode fold + lowercase (patterns and text both) so mixed-case
   * and fullwidth/ligature/accent variants hit.
   */
  def keywordHits(
      df: DataFrame,
      textCol: Column,
      patterns: Seq[String],
      outCol: String = "kw",
      folded: Boolean = false): DataFrame = {
    val ps = if (folded) patterns.map(foldKeyword) else patterns
    val bc = df.sparkSession.sparkContext.broadcast(buildAutomaton(ps))
    val scanU =
      if (folded) F.udf((t: String) => bc.value.scan(graft.pipeline.Keywords.foldKeyword(t)))
      else F.udf((t: String) => bc.value.scan(t))
    // one UDF invocation per row, fields renamed from the tuple struct
    df.withColumn("__kw_raw", scanU(textCol))
      .withColumn(outCol, F.struct(
        F.col("__kw_raw._1").as("hits"),
        F.col("__kw_raw._2").as("patterns")))
      .drop("__kw_raw")
  }

  /** Keep only rows whose text contains NO pattern occurrence — the
    * blocklist admission filter. `folded` as in [[keywordHits]]. */
  def filterByKeywords(
      df: DataFrame, textCol: Column, patterns: Seq[String],
      folded: Boolean = false): DataFrame = {
    val ps = if (folded) patterns.map(foldKeyword) else patterns
    val bc = df.sparkSession.sparkContext.broadcast(buildAutomaton(ps))
    val cleanU =
      if (folded) F.udf((t: String) => bc.value.scan(graft.pipeline.Keywords.foldKeyword(t))._1 == 0L)
      else F.udf((t: String) => bc.value.scan(t)._1 == 0L)
    df.filter(cleanU(textCol))
  }

  /** Redact every matched span to `mask` characters (union of all
    * pattern occurrences, length-preserving) — blocklist scrubbing at
    * automaton scale. NULL text stays NULL. `caseInsensitive` matches
    * char-for-char lowercase (position-preserving, so the ORIGINAL
    * text's spans are masked); the full Unicode fold is scan-only
    * because it changes lengths. */
  def scrubKeywords(
      df: DataFrame,
      textCol: Column,
      patterns: Seq[String],
      outCol: String,
      mask: Char = '*',
      caseInsensitive: Boolean = false): DataFrame = {
    val bc = df.sparkSession.sparkContext
      .broadcast(buildAutomaton(patterns, caseInsensitive))
    val scrubU = F.udf((t: String) => bc.value.scrub(t, mask))
    df.withColumn(outCol, scrubU(textCol))
  }
}

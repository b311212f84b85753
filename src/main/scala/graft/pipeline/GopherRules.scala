package graft.pipeline

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Gopher/MassiveText-style document quality rules — the canonical
 * web-corpus filtering bundle (repetition signals + structural
 * heuristics + a configurable keep-verdict). This is beyond-reference
 * pipeline surface; the rule set follows the published MassiveText
 * filters (Rae et al. 2021 §A1.1, as re-implemented by Dolma/NeMo
 * Curator), with every definition pinned EXACTLY below so the DuckDB
 * oracle can recompute the same integers.
 *
 * Definitions (all integer counting, one double division per stat —
 * cross-engine bit-exact):
 *  - lines: `text` split on '\n', keeping segments whose trim is
 *    non-empty; segment length is the RAW (untrimmed) length.
 *  - paragraphs: split on /\n{2,}/, same non-empty rule.
 *  - duplicate fraction over segments with per-segment count c:
 *    sum(c-1 for c>1) / sum(c) — occurrences beyond the first are
 *    "duplicates" (Dolma counting).
 *  - duplicate char fraction: sum((c-1)*len for c>1) / sum(c*len).
 *  - tokens for n-gram stats: lowercase, split /\s+/, non-empty.
 *  - totalChars = len(join(tokens, " ")) = sum(len)+ntok-1.
 *  - top-n-gram char fraction: top gram by (count DESC, gram ASC);
 *    frac = count*len(gram)/totalChars. Occurrence-weighted and
 *    overlap-unaware (can exceed 1 on degenerate input) — documented
 *    approximation, same as the common re-implementations.
 *  - dup-n-gram char fraction: sum over grams with c>1 of
 *    c*len(gram)/totalChars (ALL occurrences count, per Gopher).
 *
 * Scale shape: everything here is map-only — one pass per document,
 * no shuffle, no state. The repetition kernel is a single JVM pass
 * with open hashmaps (lines + paragraphs + two gram sizes in one
 * tokenization); the structural stats are pure Column expressions
 * (whole-stage codegen). NULL text → NULL struct, never an error.
 */
object GopherRules {

  /** Per-document repetition signals; field semantics in the object doc. */
  case class RepStats(
      lines: Long,
      dup_line_frac: Double,
      dup_line_char_frac: Double,
      paras: Long,
      dup_para_frac: Double,
      dup_para_char_frac: Double,
      top_gram_char_frac: Double,
      dup_gram_char_frac: Double)

  private val paraSep = java.util.regex.Pattern.compile("\n{2,}")
  private val tokSep = java.util.regex.Pattern.compile("\\s+")

  /** (#segments, dupFrac, dupCharFrac) over raw-length segments. */
  private def dupStats(segs: Array[String]): (Long, Double, Double) = {
    if (segs.isEmpty) return (0L, 0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    segs.foreach(s => counts.merge(s, 1, (a: Int, b: Int) => a + b))
    var occ = 0L; var dupOcc = 0L; var chars = 0L; var dupChars = 0L
    counts.forEach { (s, c) =>
      occ += c; chars += c.toLong * s.length
      if (c > 1) { dupOcc += c - 1; dupChars += (c - 1).toLong * s.length }
    }
    (occ, dupOcc.toDouble / occ, if (chars == 0) 0.0 else dupChars.toDouble / chars)
  }

  private def gramCounts(toks: Array[String], n: Int): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + n) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
      m.merge(sb.toString, 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    m
  }

  private[pipeline] def repStats(text: String, topN: Int, dupN: Int): RepStats = {
    val lines = text.split('\n').filter(_.trim.nonEmpty)
    val paras = paraSep.split(text).filter(_.trim.nonEmpty)
    val (nl, dlf, dlcf) = dupStats(lines)
    val (np, dpf, dpcf) = dupStats(paras)
    val toks = tokSep.split(text.toLowerCase).filter(_.nonEmpty)
    val totalChars =
      if (toks.isEmpty) 0L else toks.map(_.length.toLong).sum + (toks.length - 1)
    var topFrac = 0.0
    var dupFrac = 0.0
    if (totalChars > 0) {
      val tc = gramCounts(toks, topN)
      var bestG: String = null; var bestC = 0
      tc.forEach { (g, c) =>
        if (c > bestC || (c == bestC && (bestG == null || g.compareTo(bestG) < 0))) {
          bestG = g; bestC = c
        }
      }
      if (bestG != null) topFrac = (bestC.toLong * bestG.length).toDouble / totalChars
      val dc = gramCounts(toks, dupN)
      var dupChars = 0L
      dc.forEach { (g, c) => if (c > 1) dupChars += c.toLong * g.length }
      dupFrac = dupChars.toDouble / totalChars
    }
    RepStats(nl, dlf, dlcf, np, dpf, dpcf, topFrac, dupFrac)
  }

  /** One-pass repetition kernel as a map-only UDF; NULL text → NULL. */
  def repetitionStatsUdf(topN: Int = 2, dupN: Int = 5): UserDefinedFunction =
    F.udf((text: String) => Option(text).map(t => repStats(t, topN, dupN)))

  def repetitionStats(text: Column, topN: Int = 2, dupN: Int = 5): Column =
    repetitionStatsUdf(topN, dupN)(text)

  /** The eight "required" stopwords from the MassiveText rule. */
  val Stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Structural quality stats as pure Column expressions (codegen'd):
   * struct(words, mean_word_len, alpha_word_frac, symbol_word_ratio,
   * bullet_line_frac, ellipsis_line_frac, stopword_hits).
   * Words = non-empty /\s+/ tokens of the RAW text; alpha words
   * contain at least one [A-Za-z]; symbols counted are '#', '...'
   * (3 chars = 1 symbol) and '…'; bullet lines start with '-', '*'
   * or '•' after trim; ellipsis lines end with "..." or "…" after
   * trim; stopword_hits = distinct [[Stopwords]] present among
   * lowercased tokens. Zero-denominator fractions are 0.0.
   */
  def qualityStats(text: Column): Column = {
    val t = F.coalesce(text, F.lit(""))
    // bind the split/trim arrays once per row: every nWords/nLines
    // reference below would otherwise re-run the full split+filter
    // (higher-order exprs are interpreted, no CSE — see Let.bind)
    Let.bind(F.filter(F.split(t, "\\s+"), (w: Column) => F.length(w) > 0)) { words =>
    Let.bind(F.filter(
        F.transform(F.split(t, "\n"), (l: Column) => F.trim(l)),
        (l: Column) => F.length(l) > 0)) { lines =>
    val nWords = F.size(words).cast("long")
    val wordChars =
      F.aggregate(words, F.lit(0L), (acc: Column, w: Column) => acc + F.length(w).cast("long"))
    val meanLen = F.when(nWords > 0, wordChars.cast("double") / nWords.cast("double"))
      .otherwise(F.lit(0.0))
    val alphaWords = F.size(F.filter(words, (w: Column) => w.rlike("[A-Za-z]"))).cast("long")
    val alphaFrac = F.when(nWords > 0, alphaWords.cast("double") / nWords.cast("double"))
      .otherwise(F.lit(0.0))
    val hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    val ell3 = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    val ellU = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    val symbols = (hashes + ell3 + ellU).cast("long")
    val symbolRatio = F.when(nWords > 0, symbols.cast("double") / nWords.cast("double"))
      .otherwise(F.lit(0.0))
    val nLines = F.size(lines).cast("long")
    val bulletLines = F.size(F.filter(lines, (l: Column) =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("long")
    val ellipsisLines = F.size(F.filter(lines, (l: Column) =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val bulletFrac = F.when(nLines > 0, bulletLines.cast("double") / nLines.cast("double"))
      .otherwise(F.lit(0.0))
    val ellipsisFrac = F.when(nLines > 0, ellipsisLines.cast("double") / nLines.cast("double"))
      .otherwise(F.lit(0.0))
    val stopHits = F.size(F.array_intersect(
      F.array_distinct(F.transform(words, (w: Column) => F.lower(w))),
      F.typedlit(Stopwords))).cast("long")
    F.struct(
      nWords.as("words"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      symbolRatio.as("symbol_word_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      stopHits.as("stopword_hits"))
    }}
  }

  /** Canonical MassiveText thresholds (Rae et al. 2021 §A1.1). */
  case class Thresholds(
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2,
      maxDupLineFrac: Double = 0.3,
      maxDupParaFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.2,
      maxDupParaCharFrac: Double = 0.2,
      maxTopGramCharFrac: Double = 0.2,
      maxDupGramCharFrac: Double = 0.15)

  /**
   * Annotate `df` with `rep` (repetition struct), `quality`
   * (structural struct) and a `keep` verdict = AND of every rule
   * under `th`. Map-only; NULL text → NULL structs and keep=false.
   */
  def annotate(
      df: DataFrame,
      textCol: String,
      topN: Int = 2,
      dupN: Int = 5,
      th: Thresholds = Thresholds()): DataFrame = {
    val t = F.col(textCol)
    val out = df
      .withColumn("rep", repetitionStats(t, topN, dupN))
      .withColumn("quality", qualityStats(t))
    val q = F.col("quality"); val r = F.col("rep")
    out.withColumn("keep",
      t.isNotNull &&
        q("words").between(th.minWords, th.maxWords) &&
        q("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
        q("symbol_word_ratio") <= th.maxSymbolWordRatio &&
        q("bullet_line_frac") <= th.maxBulletLineFrac &&
        q("ellipsis_line_frac") <= th.maxEllipsisLineFrac &&
        q("alpha_word_frac") >= th.minAlphaWordFrac &&
        q("stopword_hits") >= th.minStopwordHits &&
        r("dup_line_frac") <= th.maxDupLineFrac &&
        r("dup_para_frac") <= th.maxDupParaFrac &&
        r("dup_line_char_frac") <= th.maxDupLineCharFrac &&
        r("dup_para_char_frac") <= th.maxDupParaCharFrac &&
        r("top_gram_char_frac") <= th.maxTopGramCharFrac &&
        r("dup_gram_char_frac") <= th.maxDupGramCharFrac)
  }
}

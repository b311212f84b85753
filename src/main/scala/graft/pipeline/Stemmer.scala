package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Porter stemming (the classic 1980 algorithm, steps 1a-5b) as a text
 * ANALYZER stage for lexical retrieval: "merging", "merges" and
 * "merged" all index and query as "merg", so morphological variants
 * retrieve each other without wildcard scans.
 *
 * The stemmer is a pure JVM kernel (no lookup tables, no collects);
 * the Spark surface is a fused array-transform UDF over the token
 * array — one interpreted UDF call per document, not per token, the
 * [[graft.pipeline.Sft]] fused-kernel rule. Composition points:
 *
 *   - [[stemTerms]] — Column form: token array in, stemmed array out.
 *   - [[Retrieval.buildStemmedIndex]] / [[Retrieval.bm25TopKStemmed]]
 *     — index and query through the SAME analyzer (an index/query
 *     analyzer mismatch is the classic search bug; the API keeps them
 *     paired by construction).
 *
 * Reference behavior (public algorithm, Porter 1980): measure m =
 * number of VC sequences in the [C](VC)^m[V] decomposition; y is a
 * vowel iff preceded by a consonant. Steps follow the published rule
 * tables verbatim; ties resolve to the LONGEST matching suffix within
 * a step (the published "longest match" rule).
 *
 * Scale shape: stateless per-token string rewriting — embarrassingly
 * parallel, no shuffle, no broadcast state. Stemming SHRINKS the term
 * dictionary (variants fold together), so the stemmed index has fewer,
 * larger postings lists: df rises for folded families, bucket pruning
 * and every TextIndex protocol apply unchanged.
 */
object Stemmer {

  /** Stem one lowercase word. Non-letter characters make the word
    * ineligible (returned unchanged) — stemming is defined over
    * alphabetic tokens only; punctuation-bearing tokens pass through
    * so the analyzer never corrupts numerals/ids. Words shorter than
    * 3 characters return unchanged (Porter's k <= 1 guard). */
  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    var w = step1a(word)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    step5b(w)
  }

  // ---- measure machinery ------------------------------------------ //

  private def isVowelAt(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Porter's m for the stem w[0, end). */
  private def measure(w: String, end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i < end && !isVowelAt(w, i)) i += 1
    while (i < end) {
      // in a vowel run
      while (i < end && isVowelAt(w, i)) i += 1
      if (i < end) { // consonant follows a vowel: one VC
        m += 1
        while (i < end && !isVowelAt(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    val last = w.charAt(n - 1)
    !isVowelAt(w, n - 1) && isVowelAt(w, n - 2) && !isVowelAt(w, n - 3) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  private def doubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && !isVowelAt(w, n - 1)
  }

  // ---- steps ------------------------------------------------------- //

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w, w.length - 3) > 0) w.dropRight(1) else w
    } else {
      val stem =
        if (w.endsWith("ed") && hasVowel(w, w.length - 2)) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w, w.length - 3))
          Some(w.dropRight(3))
        else None
      stem match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz"))
            s + "e"
          else if (doubleConsonant(s) && !s.endsWith("l") &&
                   !s.endsWith("s") && !s.endsWith("z"))
            s.dropRight(1)
          else if (measure(s, s.length) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w, w.length - 1)) w.dropRight(1) + "i"
    else w

  // (suffix, replacement) pairs; applied when measure(stem) > 0 and the
  // suffix is the longest that matches. Published step-2 table (with
  // the standard logi fix for "logi" omitted — the original 1980 table).
  private val Step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "biliti" -> "ble")

  private val Step3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4: Seq[String] = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def applyTable(w: String, table: Seq[(String, String)],
      minMeasure: Int): String = {
    var best: Option[(String, String)] = None
    table.foreach { case (suf, rep) =>
      if (w.endsWith(suf) &&
          best.forall(_._1.length < suf.length)) best = Some((suf, rep))
    }
    best match {
      case Some((suf, rep)) if measure(w, w.length - suf.length) >= minMeasure =>
        w.dropRight(suf.length) + rep
      case _ => w
    }
  }

  private def step2(w: String): String = applyTable(w, Step2, 1)
  private def step3(w: String): String = applyTable(w, Step3, 1)

  private def step4(w: String): String = {
    var best: Option[String] = None
    Step4.foreach { suf =>
      if (w.endsWith(suf) && best.forall(_.length < suf.length))
        best = Some(suf)
    }
    best match {
      case Some("ion")
          if !(w.length > 3 &&
               (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't')) =>
        w // (ion) only strips after s or t
      case Some(suf) if measure(w, w.length - suf.length) > 1 =>
        w.dropRight(suf.length)
      case _ => w
    }
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val m = measure(w, w.length - 1)
      if (m > 1 || (m == 1 && !endsCvc(w.dropRight(1)))) w.dropRight(1) else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w, w.length) > 1) w.dropRight(1) else w

  // ---- Spark surface ------------------------------------------------ //

  /** Fused per-document kernel: stem every element of a token array in
    * one UDF call (never a per-token UDF — the interpreted-HOF rule).
    * NULL array yields NULL. */
  private val stemArrayUdf =
    F.udf((toks: Seq[String]) =>
      if (toks == null) null
      else toks.map(t => graft.pipeline.Stemmer.stem(t)))

  /** Column form: token array in, stemmed token array out. */
  def stemTerms(tokens: Column): Column = stemArrayUdf(tokens)

  /** Tokenize + stem a text column with the repo's standard analyzer
    * (lowercase, split on whitespace, drop empties) — the stemmed twin
    * of [[Retrieval.terms]]. */
  def stemmedTerms(text: Column): Column = stemTerms(Retrieval.terms(text))

  /** Stem a bounded driver-side query term list (query analysis MUST
    * match index analysis — this is the query half of the pair). */
  def stemQuery(queryTerms: Seq[String]): Seq[String] =
    queryTerms.map(t => stem(t.toLowerCase))
}

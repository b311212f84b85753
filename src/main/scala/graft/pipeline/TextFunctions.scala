package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{functions => F}

/**
 * Text-analysis primitives for training-data pipelines: shingling,
 * minhash/simhash signatures, rolling-hash fingerprints, language-ID
 * heuristic, quality features. All deterministic (no per-run seeds) so
 * results are reproducible across runs and cluster sizes.
 */
object TextFunctions {

  // ------------------------------------------------------------ hashing

  /** splitmix64 finalizer — cheap, well-mixed 64-bit hash step. */
  @inline private[pipeline] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-16 chars, then splitmix finalize. */
  private[pipeline] def hashString(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  // --------------------------------------------------------- shingling

  /** Distinct character n-grams of a string, in first-occurrence order. */
  private[pipeline] def charShingles(text: String, n: Int): Array[String] = {
    if (text == null || text.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= text.length) {
      seen.add(text.substring(i, i + n))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def shinglesUdf(n: Int): UserDefinedFunction =
    F.udf((text: String) => charShingles(text, n))

  /** Column of distinct char n-grams. */
  def char_shingles(text: Column, n: Int): Column = shinglesUdf(n)(text)

  // ----------------------------------------------------------- minhash

  /**
   * MinHash signature over a shingle set using the Kirsch-Mitzenmacher
   * construction: h_i(x) = h1(x) + i*h2(x), one string hash per shingle.
   */
  private[pipeline] def minhashSignature(shingles: Array[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h1 = hashString(shingles(s))
      val h2 = mix64(h1 ^ 0x9E3779B97F4A7C15L) | 1L
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      s += 1
    }
    sig
  }

  def minhashUdf(numHashes: Int): UserDefinedFunction =
    F.udf { (shingles: Seq[String]) =>
      val r: Array[Long] =
        if (shingles == null) null else minhashSignature(shingles.toArray, numHashes)
      r
    }

  /**
   * One-permutation-hashing signature (OPH): one hash per n-gram,
   * bucketed into `numHashes` slots by its top bits, min kept per slot;
   * empty slots filled by rotational densification (deterministic, so
   * identical inputs always produce identical signatures). ~numHashes x
   * less hashing work than the KM construction — the scan-cost lever at
   * corpus scale; slightly noisier per-slot estimates.
   */
  private[pipeline] def minhashTextOph(text: String, n: Int, numHashes: Int): Array[Long] = {
    require(Integer.bitCount(numHashes) == 1 && numHashes >= 2,
      "numHashes must be a power of two >= 2 (shift 64 is a JVM no-op)")
    val shift = 64 - Integer.numberOfTrailingZeros(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (text != null && text.length >= n) {
      var pos = 0
      val end = text.length - n
      while (pos <= end) {
        var h = 0xCBF29CE484222325L
        var j = 0
        while (j < n) {
          h ^= text.charAt(pos + j).toLong
          h *= 0x100000001B3L
          j += 1
        }
        h = mix64(h)
        val slot = (h >>> shift).toInt
        if (h < sig(slot)) sig(slot) = h
        pos += 1
      }
    }
    // rotational densification for empty slots
    var i = 0
    while (i < numHashes) {
      if (sig(i) == Long.MaxValue) {
        var j = 1
        var src = -1
        while (src < 0 && j < numHashes) {
          val cand = (i + j) & (numHashes - 1)
          if (sig(cand) != Long.MaxValue) src = cand
          j += 1
        }
        if (src >= 0) sig(i) = mix64(sig(src) ^ i.toLong)
      }
      i += 1
    }
    sig
  }

  def minhashTextOphUdf(n: Int, numHashes: Int): UserDefinedFunction =
    F.udf { (text: String) =>
      val r: Array[Long] = if (text == null) null else minhashTextOph(text, n, numHashes)
      r
    }

  /** Hash one LSH band (r consecutive signature slots) to a bucket key. */
  private[pipeline] def bandHash(sig: Array[Long], band: Int, rows: Int): Long = {
    var h = 0x2545F4914F6CDD1DL ^ band.toLong
    var i = band * rows
    val end = i + rows
    while (i < end) { h = mix64(h ^ sig(i)); i += 1 }
    h
  }

  /** (bandIndex, bucketHash) pairs for the banding join. */
  def bandsUdf(bands: Int, rows: Int): UserDefinedFunction =
    F.udf { (sig: Seq[Long]) =>
      val r: Seq[(Int, Long)] =
        if (sig == null) null
        else {
          val arr = sig.toArray
          (0 until bands).map(b => (b, bandHash(arr, b, rows)))
        }
      r
    }

  // Fused signature + banding kernels: the two-UDF chain
  // (minhash*Udf → bandsUdf) paid a boxed Seq[Long] Catalyst round
  // trip per row between the projections; one UDF keeps the signature
  // a primitive array start to finish. Bucket values are bit-identical
  // (same bandHash chain), so persisted signature indexes stay
  // compatible. The banding itself can't be pure Column arithmetic
  // under ANSI mode — bandHash's mix64 chain needs WRAPPING long
  // multiplies, which ANSI Multiply rejects as overflow.

  private def bandsOf(sig: Array[Long], bands: Int, rows: Int): Seq[(Int, Long)] =
    (0 until bands).map(b => (b, bandHash(sig, b, rows)))

  /** [[minhashUdf]] ∘ [[bandsUdf]] in one kernel (shingle-array input). */
  def minhashBandsUdf(numHashes: Int, bands: Int, rows: Int): UserDefinedFunction =
    F.udf { (shingles: Seq[String]) =>
      val r: Seq[(Int, Long)] =
        if (shingles == null) null
        else bandsOf(minhashSignature(shingles.toArray, numHashes), bands, rows)
      r
    }

  /** [[minhashTextOphUdf]] ∘ [[bandsUdf]] in one kernel (text input). */
  def minhashTextOphBandsUdf(
      n: Int, numHashes: Int, bands: Int, rows: Int): UserDefinedFunction =
    F.udf { (text: String) =>
      val r: Seq[(Int, Long)] =
        if (text == null) null
        else bandsOf(minhashTextOph(text, n, numHashes), bands, rows)
      r
    }

  // ----------------------------------------------------------- simhash

  /**
   * 64-bit SimHash over whitespace tokens (unigrams + bigrams, unit
   * weight): bit b of the result is the sign of the sum of ±1 votes of
   * each feature's hash bit b.
   */
  private[pipeline] def simhash64(tokens: Array[String]): Long = {
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    // hash each token once; bigram features combine the token hashes
    // (no string concatenation in the hot loop)
    val hs = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) { hs(i) = hashString(tokens(i)); i += 1 }
    i = 0
    while (i < tokens.length) {
      vote(hs(i))
      if (i + 1 < tokens.length)
        vote(mix64(hs(i) * 0x9E3779B97F4A7C15L + hs(i + 1)))
      i += 1
    }
    var result = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) result |= (1L << b)
      b += 1
    }
    result
  }

  val simhashUdf: UserDefinedFunction =
    F.udf { (text: String) =>
      val r: java.lang.Long =
        if (text == null) null
        else java.lang.Long.valueOf(simhash64(text.split("\\s+").filter(_.nonEmpty)))
      r
    }

  def simhash(text: Column): Column = simhashUdf(text)

  /** 8-bit chunks of a simhash: pairs within hamming distance 7 are
    * guaranteed to collide on at least one chunk (pigeonhole). */
  val simhashChunksUdf: UserDefinedFunction =
    F.udf((sig: Long) => (0 until 8).map(c => (c, ((sig >>> (8 * c)) & 0xFFL).toInt)))

  // ------------------------------------------------------- fingerprint

  /** Rolling polynomial (Karp-Rabin style) 64-bit fingerprint of
    * whitespace-normalized text. */
  private[pipeline] def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = 0L
    var i = 0
    var prevSpace = false
    while (i < text.length) {
      val c = text.charAt(i)
      val isSpace = Character.isWhitespace(c)
      if (!isSpace) { h = h * 0x100000001B3L + c.toLong; prevSpace = false }
      else if (!prevSpace) { h = h * 0x100000001B3L + ' '.toLong; prevSpace = true }
      i += 1
    }
    mix64(h)
  }

  val fingerprintUdf: UserDefinedFunction = F.udf((text: String) => fingerprint64(text))
  def fingerprint(text: Column): Column = fingerprintUdf(text)

  // ---------------------------------------------------------- language

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("a", "the", "of", "and", "to", "in", "is", "it", "that", "on", "for", "with", "as", "was", "are"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "auf", "für", "von", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "je", "pas", "un", "une", "avec", "pour", "dans", "que", "des"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "no", "un", "una", "con", "para", "en", "que", "por"),
    "zh" -> Set("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  /** Stopword-ratio language heuristic; "und" (undetermined) when no
    * language scores above zero. */
  private[pipeline] def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val tokens = text.toLowerCase.split("\\s+")
    var bestLang = "und"
    var bestScore = 0
    for ((lang, words) <- stopwords) {
      var score = 0
      var i = 0
      while (i < tokens.length) {
        if (words.contains(tokens(i))) score += 1
        i += 1
      }
      if (score > bestScore || (score == bestScore && score > 0 && lang < bestLang)) {
        bestScore = score
        bestLang = lang
      }
    }
    bestLang
  }

  val langIdUdf: UserDefinedFunction = F.udf((text: String) => detectLanguage(text))
  def lang_id(text: Column): Column = langIdUdf(text)

  // ------------------------------------------------------------ quality

  /** Pure-Column quality features: no UDF, fully codegen'd. */
  def tokenCount(text: Column): Column = F.size(F.split(text, "\\s+"))

  /** BPE-style pre-tokenization count: letter runs, digit runs, and
    * punctuation runs each count as one token (the shape BPE vocabularies
    * split on). The whitespace class is spelled out explicitly because
    * Java's \s includes \x0B while RE2's does not — an implicit \s
    * would diverge between Spark and the DuckDB oracle. */
  def bpeTokenCount(text: Column): Column =
    F.size(F.regexp_extract_all(text,
      F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\x0B\\f]+"), F.lit(0)))

  /** Canonical text normalization for dedup keys and cleaning passes:
    * control characters dropped, whitespace runs collapsed to one
    * space, trimmed, lowercased. Pure built-ins — fully codegen'd, and
    * the character classes are spelled out explicitly so Spark (Java
    * regex) and the DuckDB oracle (RE2) agree byte for byte. */
  def normalizeText(text: Column): Column =
    F.lower(F.trim(F.regexp_replace(
      F.regexp_replace(text, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\r\\x0B\\f]+", " ")))

  /** Typographic punctuation → ASCII (the part NFKC leaves alone):
    * curly quotes, en/em dashes, ellipsis, fraction slash. */
  private val PunctFold: Map[Char, String] = Map(
    '‘' -> "'", '’' -> "'", '‚' -> "'", '‛' -> "'",
    '“' -> "\"", '”' -> "\"", '„' -> "\"",
    '–' -> "-", '—' -> "-", '−' -> "-",
    '…' -> "...", '⁄' -> "/")

  /** Unicode canonicalization kernel: NFKC (ligatures, fullwidth,
    * compatibility forms), then NFD + combining-mark strip (accent
    * folding), then the typographic-punctuation fold, recomposed NFC.
    * The CCNet-style pass before hashing, shingling, or dedup so that
    * visually-identical variants collide. Null-safe. */
  private[pipeline] def foldUnicodeKernel(s: String): String = {
    if (s == null) return null
    import java.text.Normalizer
    val nfkc = Normalizer.normalize(s, Normalizer.Form.NFKC)
    val nfd = Normalizer.normalize(nfkc, Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        PunctFold.get(c) match {
          case Some(rep) => sb.append(rep)
          case None => sb.append(c)
        }
      }
      i += 1
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
  }

  /** [[foldUnicodeKernel]] as a map-only Column (JVM kernel — the
    * normalizer tables have no Column composition). Compose with
    * [[normalizeText]] for the full cleaning pass. */
  def foldUnicode(text: Column): Column =
    F.udf((s: String) => Option(foldUnicodeKernel(s))).apply(text)

  /** Plain NFC canonicalization (composed form) — the minimal
    * pre-hashing normalization when accent/compatibility FOLDING is
    * too aggressive: decomposed sequences ("e" + U+0301) compose to
    * their canonical code points, nothing else changes. Cross-engine
    * checkable directly (DuckDB ships nfc_normalize). Null-safe,
    * map-only. */
  def nfcNormalize(text: Column): Column =
    F.udf((s: String) => Option(s).map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC)))
      .apply(text)

  /** Gopher-style repetition score: the fraction of a document's word
    * n-grams that are repeats of an earlier n-gram
    * (`1 - distinct/total`). Boilerplate, templated spam, and
    * degenerate generations score high; normal prose scores near 0.
    * Pure list built-ins — codegen'd in Spark, byte-identical in any
    * engine with list_distinct (the oracle recomputes it in DuckDB).
    * NULL text or fewer than n words → 0.0 (nothing repeats). */
  def repetitionScore(text: Column, n: Int): Column =
    // bind: the gram construction is referenced 4x below and would
    // re-run each time (interpreted higher-order exprs, no CSE)
    Let.bind(allWordNgrams(text, n)) { grams =>
      F.when(F.size(grams) <= 0, 0.0)
        .otherwise(F.lit(1.0) -
          F.size(F.array_distinct(grams)).cast("double") / F.size(grams).cast("double"))
    }

  /** ALL (non-distinct) lowercase word n-grams — the multiset
    * [[graft.pipeline.Decontaminate.wordNgrams]] dedups. */
  def allWordNgrams(text: Column, n: Int): Column =
    Let.bind(F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "\\s+"),
        w => F.length(w) > 0)) { words =>
      val count = F.size(words) - (n - 1)
      // sequence(1, 0) yields a DESCENDING [1, 0], not empty
      F.when(count > 0,
        F.transform(F.sequence(F.lit(1), count),
          i => F.array_join(F.slice(words, i, F.lit(n)), " ")))
        .otherwise(F.typedlit(Seq.empty[String]))
    }

  def qualityScore(text: Column, nChars: Column): Column = {
    val tokens = tokenCount(text)
    val avgWordLen = (nChars - tokens + 1).cast("double") / tokens
    val lenScore = F.least(nChars.cast("double") / 500.0, F.lit(1.0))
    val wordLenScore = F.when(avgWordLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    val richScore = F.least(tokens.cast("double") / 100.0, F.lit(1.0))
    F.round((lenScore + wordLenScore + richScore) / 3.0, 4)
  }

  /** Deflate compression ratio (compressed/raw UTF-8 bytes, level 9):
    * the redundancy signal web-corpus filters use — boilerplate-ish or
    * machine-repeated text compresses far below fluent prose.
    * Map-only; NULL or empty text → NULL. Ratios are zlib-version-
    * dependent at the margin, so gates pin ORDERINGS between planted
    * redundancy levels, never raw values. */
  val compressionRatioUdf: UserDefinedFunction = F.udf((text: String) => {
    if (text == null || text.isEmpty) None
    else {
      val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
      try {
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](256)
        var out = 0L
        while (!d.finished()) out += d.deflate(buf)
        Some(out.toDouble / raw.length)
      } finally d.end()
    }
  })

  def compressionRatio(text: Column): Column = compressionRatioUdf(text)

  // ------------------------------------------------- sentence splitting

  /** Common sentence-final-period false friends for the abbreviation
    * guard: a boundary whose punctuation run is exactly "." and whose
    * preceding token (letters only, case-folded) is one of these — or
    * is a single uppercase letter (middle initials) — does not split. */
  private val Abbreviations: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "al", "inc", "ltd", "co", "fig", "no", "e.g", "i.e", "approx")

  /**
   * Sentence segmentation at punctuation-run boundaries: a maximal run
   * of `.`/`!`/`?` followed by whitespace ends a sentence (punctuation
   * stays with its sentence, the whitespace is dropped); leading and
   * trailing whitespace are trimmed first, so for non-empty trimmed
   * text the segment count is exactly `1 + (boundary matches)` — a
   * regex count any engine reproduces. `abbrevGuard = true`
   * additionally refuses to split after known abbreviations and
   * single-initial periods (heuristic — guard mode is spec-tested,
   * not oracle-replayed). NULL → null, whitespace-only → empty array.
   */
  private[pipeline] def sentenceSegments(
      text: String, abbrevGuard: Boolean): Array[String] = {
    if (text == null) return null
    val t = text.trim
    if (t.isEmpty) return Array.empty
    val m = java.util.regex.Pattern.compile("([.!?]+)(\\s+)").matcher(t)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var last = 0
    while (m.find()) {
      val guard = abbrevGuard && m.group(1) == "." && {
        // token immediately before the period
        var b = m.start(1) - 1
        var e = b
        while (b >= 0 && !Character.isWhitespace(t.charAt(b))) b -= 1
        val tok = t.substring(b + 1, e + 1)
        val folded = tok.toLowerCase(java.util.Locale.ROOT)
        Abbreviations.contains(folded) ||
          (tok.length == 1 && Character.isUpperCase(tok.charAt(0)))
      }
      if (!guard) {
        out += t.substring(last, m.end(1))
        last = m.end()
      }
    }
    if (last < t.length) out += t.substring(last)
    out.toArray
  }

  def splitSentencesUdf(abbrevGuard: Boolean): UserDefinedFunction =
    F.udf((text: String) => sentenceSegments(text, abbrevGuard))

  /** Column of sentences (see [[sentenceSegments]]). */
  def split_sentences(text: Column, abbrevGuard: Boolean = false): Column =
    splitSentencesUdf(abbrevGuard)(text)

  /** Word / sentence-boundary / syllable-proxy counts behind the
    * readability scores: words = non-empty whitespace splits,
    * sentences = `[.!?]+\s+` boundary matches + 1 on trimmed text
    * (the [[sentenceSegments]] count), syllables = vowel-group runs
    * (`[aeiouy]+`, case-folded) — the standard cheap proxy. All pure
    * regex/size expressions: codegen-friendly and replayable in any
    * engine. */
  def readabilityCounts(text: Column): Column = {
    val words = F.size(F.filter(F.split(text, "\\s+"),
      (w: Column) => F.length(w) > 0))
    val sentences = F.when(F.length(F.trim(text)) === 0, F.lit(0))
      .otherwise(F.size(F.regexp_extract_all(
        F.trim(text), F.lit("[.!?]+\\s+"), F.lit(0))) + F.lit(1))
    val syllables = F.size(F.regexp_extract_all(
      F.lower(text), F.lit("[aeiouy]+"), F.lit(0)))
    F.struct(words.as("words"), sentences.as("sentences"),
      syllables.as("syllables"))
  }

  /** Flesch reading ease from [[readabilityCounts]]:
    * `206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)`.
    * NULL when the text has no words (ANSI-safe: the divisions are
    * guarded, never evaluated at zero). */
  def fleschReadingEase(text: Column): Column = {
    val c = readabilityCounts(text)
    val w = c.getField("words").cast("double")
    val s = c.getField("sentences").cast("double")
    val y = c.getField("syllables").cast("double")
    F.when(c.getField("words") > 0 && c.getField("sentences") > 0,
      F.lit(206.835) - F.lit(1.015) * w / s - F.lit(84.6) * y / w)
  }

  /** Flesch-Kincaid grade level:
    * `0.39·(words/sentences) + 11.8·(syllables/words) - 15.59`. */
  def fleschKincaidGrade(text: Column): Column = {
    val c = readabilityCounts(text)
    val w = c.getField("words").cast("double")
    val s = c.getField("sentences").cast("double")
    val y = c.getField("syllables").cast("double")
    F.when(c.getField("words") > 0 && c.getField("sentences") > 0,
      F.lit(0.39) * w / s + F.lit(11.8) * y / w - F.lit(15.59))
  }

  /**
   * Encoding-damage profile — the mojibake/corruption screen run
   * before any text filter trusts its input: counts of Unicode
   * replacement chars (U+FFFD, a decoder already gave up), stray
   * C0/C1 control chars (tab/newline/CR excluded), and the classic
   * UTF-8-read-as-Latin-1 mojibake shapes (`Ã`/`Â` followed by a
   * C1-range char, and the `â€` punctuation prefix). Pure regex
   * counts (codegen, engine-replayable); `is_clean` = all zero.
   */
  def encodingDamage(text: Column): Column = {
    val repl = F.size(F.regexp_extract_all(text, F.lit("\\uFFFD"), F.lit(0)))
    val ctrl = F.size(F.regexp_extract_all(text,
      F.lit("[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u007F-\\u009F]"),
      F.lit(0)))
    val moji = F.size(F.regexp_extract_all(text,
      F.lit("[\\u00C2\\u00C3][\\u0080-\\u00BF]|\\u00E2[\\u0080\\u20AC]"),
      F.lit(0)))
    F.struct(repl.as("replacement_chars"), ctrl.as("control_chars"),
      moji.as("mojibake"),
      (repl + ctrl + moji === 0).as("is_clean"))
  }

  /**
   * Remove duplicated lines WITHIN a document, keeping first
   * occurrences in order — the within-page cleanup for nav bars and
   * repeated boilerplate lines (the cross-document form is
   * [[Dedup.dedupParagraphs]]). Pure `array_distinct` over the line
   * split (Spark's array_distinct preserves first-occurrence order),
   * map-only and codegen-friendly. NULL → NULL.
   */
  def dedupLines(text: Column): Column =
    F.when(text.isNull, F.lit(null).cast("string"))
      .otherwise(F.array_join(F.array_distinct(F.split(text, "\n")), "\n"))

  /** The scripts [[scriptProfile]] counts, with their BMP ranges —
    * Java spells them \uXXXX, RE2 (the DuckDB oracle) \x{....}; both
    * accept the identical range sets (the encodingDamage rule: no
    * lookaround, plain character classes only). */
  private val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\u00C0-\\u024F",
    "cyrillic" -> "\\u0400-\\u04FF",
    "greek" -> "\\u0370-\\u03FF",
    "arabic" -> "\\u0600-\\u06FF",
    "hebrew" -> "\\u0590-\\u05FF",
    "devanagari" -> "\\u0900-\\u097F",
    "cjk" -> "\\u3040-\\u30FF\\u4E00-\\u9FFF\\uAC00-\\uD7AF",
    "digit" -> "0-9")

  /**
   * Unicode-script composition of a document: per-script character
   * counts (Latin incl. the common European extensions, Cyrillic,
   * Greek, Arabic, Hebrew, Devanagari, CJK incl. kana and hangul,
   * digits), the DOMINANT letter script (count ties break to the
   * declaration order above; "und" when no script letter occurs), and
   * `mixed` = more than one letter script present — the script-level
   * complement of the stopword language heuristic, and the standard
   * pre-filter for script-targeted corpora (a "Latin-only" crawl with
   * CJK islands is usually boilerplate or spam injection). Counts are
   * plain regex quantities: map-only, codegen'd, cross-engine
   * replayable.
   */
  def scriptProfile(text: Column): Column = {
    val counts = ScriptRanges.map { case (name, ranges) =>
      name -> F.size(F.regexp_extract_all(text, F.lit(s"[$ranges]"), F.lit(0)))
    }
    val letters = counts.filter(_._1 != "digit")
    // first strictly-greater wins → declaration-order tie-break
    val maxCount = letters.map(_._2).reduce((a, b) => F.greatest(a, b))
    val dominant = letters.reverse.foldLeft(F.lit("und")) {
      case (acc, (name, c)) =>
        F.when(maxCount > 0 && c === maxCount, F.lit(name)).otherwise(acc)
    }
    val present = letters.map { case (_, c) =>
      F.when(c > 0, 1).otherwise(0) }.reduce(_ + _)
    F.struct(
      counts.map { case (name, c) => c.cast("long").as(name) } ++
        Seq(dominant.as("dominant"), (present > 1).as("mixed")): _*)
  }

  /**
   * Tokenizer-coverage report: per group, the exact token count, the
   * count of tokens OUTSIDE `vocab`, and the OOV rate (one division
   * over exact longs) — the fit-QA a tokenizer/vocabulary needs
   * before training commits to it. Token occurrences count (not
   * types): OOV rate is a corpus-mass statistic.
   *
   * Scale shape: the vocabulary broadcasts onto the token explode
   * (vocabularies are bounded); one shuffle on the group key.
   */
  def tokenCoverage(
      docs: DataFrame,
      textCol: String,
      vocab: DataFrame,
      groupCol: String): DataFrame = {
    val vCol = vocab.columns.head
    val v = vocab.select(F.lower(F.col(vCol)).as("term")).distinct()
      .withColumn("__in", F.lit(1))
    docs
      .select(F.col(groupCol).as("group"),
        F.explode(F.split(F.lower(F.col(textCol)), "\\s+")).as("term"))
      .filter(F.length(F.col("term")) > 0)
      .join(F.broadcast(v), Seq("term"), "left")
      .groupBy("group")
      .agg(F.count(F.lit(1)).as("n_tokens"),
        F.sum(F.when(F.col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        F.col("n_oov").cast("double") / F.col("n_tokens"))
  }

  /**
   * Bigram collocation mining by pointwise mutual information:
   *
   *   pmi(x, y) = ln( (c_xy / B) / ((c_x / T) * (c_y / T)) )
   *
   * over adjacent-token bigrams (B = total bigram occurrences,
   * T = total token occurrences). Bigrams below `minCount` drop —
   * PMI over-rewards rare pairs, the standard floor. Returns
   * (bigram, n, pmi); every count is exact, pmi is the single libm
   * expression (compare at 4dp cross-engine).
   *
   * Scale shape: one explode over the token arrays (bigrams via the
   * shifted-slice zip — no self-join), two grouped counts, unigram
   * counts broadcast back onto the surviving bigrams.
   */
  def collocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = F.filter(F.split(F.lower(F.col(textCol)), "\\s+"),
      (t: Column) => F.length(t) > 0)
    val witharr = docs.select(toks.as("__t"))
      .filter(F.size(F.col("__t")) > 0)
      .localCheckpoint(eager = false)
    val uni = witharr.select(F.explode(F.col("__t")).as("term"))
      .groupBy("term").agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val totals = uni.agg(F.sum(F.col("c")).as("t_tokens")).head()
    val tTokens = totals.getLong(0)
    val bi = witharr
      .select(F.explode(F.zip_with(
        F.slice(F.col("__t"), F.lit(1), F.size(F.col("__t")) - 1),
        F.slice(F.col("__t"), F.lit(2), F.size(F.col("__t")) - 1),
        (x, y) => F.struct(x.as("x"), y.as("y")))).as("p"))
      .select(F.col("p.x").as("x"), F.col("p.y").as("y"))
      .groupBy("x", "y").agg(F.count(F.lit(1)).as("n"))
    val bTotalDf = bi.agg(F.sum(F.col("n")).as("b_total"))
    bi.filter(F.col("n") >= minCount)
      .join(F.broadcast(uni.select(F.col("term").as("x"),
        F.col("c").as("cx"))), "x")
      .join(F.broadcast(uni.select(F.col("term").as("y"),
        F.col("c").as("cy"))), "y")
      .crossJoin(F.broadcast(bTotalDf))
      .select(F.concat_ws(" ", F.col("x"), F.col("y")).as("bigram"),
        F.col("n"),
        F.log((F.col("n").cast("double") / F.col("b_total")) /
          ((F.col("cx").cast("double") / F.lit(tTokens.toDouble)) *
           (F.col("cy").cast("double") / F.lit(tTokens.toDouble))))
          .as("pmi"))
  }
}

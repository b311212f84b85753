package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * PII scrubbing and document chunking — the C4/Dolma-style cleaning
 * passes a training corpus runs before tokenization.
 *
 * All pure Column built-ins: codegen'd, shuffle-free (scrubbing is a
 * projection; chunking is a bounded explode), and engine-portable —
 * the regex character classes are spelled out in the Java/RE2 common
 * subset exactly like TextFunctions.normalizeText, so the DuckDB
 * oracle reproduces results byte for byte.
 */
object Scrub {

  // Patterns stay in the Java-regex/RE2 common subset: no backrefs, no
  // lookaround, explicit character classes.
  private[pipeline] val EmailPattern =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // 7-15 digit runs with optional separators, led by +country or a
  // (area) group — conservative on purpose: version strings and years
  // must not match
  private[pipeline] val PhonePattern =
    "(\\+[0-9]{1,3}[ .-]?)?(\\([0-9]{2,4}\\)[ .-]?)?[0-9]{3,4}[ .-][0-9]{3,4}[ .-]?[0-9]{0,4}"
  private[pipeline] val Ipv4Pattern =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Replace emails with `replacement` (default the Dolma-style tag). */
  def scrubEmails(text: Column, replacement: String = "<EMAIL>"): Column =
    F.regexp_replace(text, EmailPattern, replacement)

  /** Replace IPv4 literals with `replacement`. */
  def scrubIps(text: Column, replacement: String = "<IP>"): Column =
    F.regexp_replace(text, Ipv4Pattern, replacement)

  /** Replace phone-shaped digit runs with `replacement`. */
  def scrubPhones(text: Column, replacement: String = "<PHONE>"): Column =
    F.regexp_replace(text, PhonePattern, replacement)

  /** The standard stack: emails, then IPs, then phones (emails first so
    * user@host never half-matches as digits; IPs before phones so
    * dotted quads are not eaten as phone separators). */
  def scrubPii(text: Column): Column =
    scrubPhones(scrubIps(scrubEmails(text)))

  // ------------------------------------------------- credit cards

  // Candidate: 13-19 digits with optional single space/dash
  // separators, not touching adjacent digits (the lookarounds keep a
  // 20+-digit run from being partially scrubbed). Validation is NOT
  // the regex's job — Luhn decides.
  private val CardPattern = java.util.regex.Pattern.compile(
    "(?<![0-9])(?:[0-9][ -]?){12,18}[0-9](?![0-9])")

  /** Luhn checksum (ISO/IEC 7812): double every second digit from the
    * right, subtract 9 above 9, valid iff the sum divides by 10. */
  private[pipeline] def luhnValid(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  /** Replace Luhn-VALID card-shaped digit runs; leave invalid ones
    * alone (a 16-digit order id that fails Luhn is content, not PII —
    * the checksum cuts false positives 10×). */
  private[pipeline] def scrubCardsKernel(text: String, replacement: String): String = {
    if (text == null) return null
    val m = CardPattern.matcher(text)
    if (!m.find()) return text
    val sb = new java.lang.StringBuilder(text.length)
    var last = 0
    do {
      val raw = m.group()
      var nd = 0
      var i = 0
      while (i < raw.length) { if (raw.charAt(i) >= '0' && raw.charAt(i) <= '9') nd += 1; i += 1 }
      val digits = new java.lang.StringBuilder(nd)
      i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c >= '0' && c <= '9') digits.append(c)
        i += 1
      }
      sb.append(text, last, m.start())
      if (nd >= 13 && nd <= 19 && luhnValid(digits.toString)) sb.append(replacement)
      else sb.append(raw)
      last = m.end()
    } while (m.find())
    sb.append(text, last, text.length)
    sb.toString
  }

  /** Replace Luhn-valid credit-card numbers with `replacement`
    * (default the Dolma-style tag). JVM kernel — conditional
    * replacement on a checksum has no regexp_replace form. Map-only,
    * null-safe. */
  def scrubCreditCards(text: Column, replacement: String = "<CC>"): Column =
    F.udf((s: String) => Option(scrubCardsKernel(s, replacement))).apply(text)

  /** [[scrubPii]] plus card scrubbing, cards FIRST — a dashed card
    * number must not be half-eaten as a phone-shaped digit run. */
  def scrubPiiAll(text: Column): Column = scrubPii(scrubCreditCards(text))

  /** Count of PII matches by kind — the audit signal (how much was
    * redacted) without materializing the scrubbed text. */
  def piiCounts(text: Column): Column = F.struct(
    F.size(F.regexp_extract_all(text, F.lit(EmailPattern), F.lit(0))).as("emails"),
    F.size(F.regexp_extract_all(text, F.lit(Ipv4Pattern), F.lit(0))).as("ips"),
    F.size(F.regexp_extract_all(F.regexp_replace(text, Ipv4Pattern, ""),
      F.lit(PhonePattern), F.lit(0))).as("phones"))

  /**
   * Split documents into word-window chunks of at most `chunkWords`
   * words with `overlapWords` words of left context — the
   * context-window shaping pass before tokenization. Output: one row
   * per chunk with (original columns, chunk_idx, chunk_text). The
   * explode is bounded by ceil(words / stride), documents shorter than
   * `chunkWords` yield exactly one chunk, and empty/NULL documents
   * yield one empty chunk (so no document is silently dropped).
   */
  def chunkWords(
      df: DataFrame,
      textCol: Column,
      chunkWords: Int,
      overlapWords: Int = 0): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    require(overlapWords >= 0 && overlapWords < chunkWords,
      s"overlapWords must be in [0, chunkWords), got $overlapWords")
    val clash = df.columns.toSet.intersect(Set("chunk_idx", "chunk_text", "__ws"))
    require(clash.isEmpty, s"column names reserved by chunkWords: $clash")
    val stride = chunkWords - overlapWords
    val words = F.filter(
      F.split(F.coalesce(textCol, F.lit("")), "\\s+"),
      w => F.length(w) > 0)
    // chunk starts: 1, 1+stride, 1+2*stride, ... while start <= len
    // (and at least one chunk)
    val nChunks = F.greatest(
      (F.size(F.col("__ws")) + stride - 1 - overlapWords)
        .cast("double").divide(stride).cast("int"),
      F.lit(1))
    df.withColumn("__ws", words)
      .withColumn("chunk_idx",
        F.explode(F.sequence(F.lit(0), nChunks - 1)))
      .withColumn("chunk_text",
        F.array_join(
          F.slice(F.col("__ws"), F.col("chunk_idx") * stride + 1, F.lit(chunkWords)), " "))
      .drop("__ws")
  }

  /** Greedy sentence packing for [[chunkSentences]]: whole sentences
    * accumulate until the next one would exceed `maxWords`; an
    * oversize sentence gets its own chunk (never split mid-sentence);
    * each flush seeds the next chunk with the previous chunk's last
    * `overlapSentences` sentences (their words count against the
    * budget). */
  private[pipeline] def packSentenceChunks(
      sentences: Array[String],
      maxWords: Int,
      overlapSentences: Int): Array[String] = {
    def wc(s: String): Int = {
      var n = 0; var i = 0; var inWord = false
      while (i < s.length) {
        val ws = Character.isWhitespace(s.charAt(i))
        if (!ws && !inWord) n += 1
        inWord = !ws
        i += 1
      }
      n
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var curWords = 0
    def flush(): Unit = if (cur.nonEmpty) {
      out += cur.iterator.map(_._1).mkString(" ")
      val keep = cur.takeRight(overlapSentences)
      cur = scala.collection.mutable.ArrayBuffer.from(keep)
      curWords = keep.iterator.map(_._2).sum
    }
    sentences.foreach { s =>
      val w = wc(s)
      if (cur.nonEmpty && curWords + w > maxWords) flush()
      // after a flush the overlap seed alone may already exceed the
      // budget with the new sentence; degrade to a fresh chunk
      if (cur.nonEmpty && curWords + w > maxWords) {
        cur.clear(); curWords = 0
      }
      cur += ((s, w)); curWords += w
    }
    if (cur.nonEmpty) out += cur.iterator.map(_._1).mkString(" ")
    out.toArray
  }

  /**
   * Sentence-aware chunking: split into sentences
   * ([[TextFunctions.sentenceSegments]], plain boundaries) and pack
   * WHOLE sentences greedily into chunks of at most `maxWords` words —
   * the RAG/context-window shaping pass that never cuts mid-sentence,
   * unlike [[chunkWords]]' fixed word windows. `overlapSentences`
   * repeats that many trailing sentences as left context in the next
   * chunk. Output: one row per chunk with (original columns,
   * chunk_idx, chunk_text); NULL/whitespace-only documents yield one
   * empty chunk (no document silently dropped). Map-only explode.
   */
  def chunkSentences(
      df: DataFrame,
      textCol: Column,
      maxWords: Int,
      overlapSentences: Int = 0): DataFrame = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    require(overlapSentences >= 0,
      s"overlapSentences must be >= 0, got $overlapSentences")
    val clash = df.columns.toSet.intersect(Set("chunk_idx", "chunk_text", "__cs"))
    require(clash.isEmpty, s"column names reserved by chunkSentences: $clash")
    val chunksU = F.udf((t: String) => {
      val sents = TextFunctions.sentenceSegments(
        if (t == null) "" else t, abbrevGuard = false)
      val packed = packSentenceChunks(sents, maxWords, overlapSentences)
      if (packed.isEmpty) Array("") else packed
    })
    df.withColumn("__cs", chunksU(textCol))
      .select(F.col("*"), F.posexplode(F.col("__cs")).as(Seq("chunk_idx", "chunk_text")))
      .drop("__cs")
  }
}

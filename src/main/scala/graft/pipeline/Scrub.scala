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
}

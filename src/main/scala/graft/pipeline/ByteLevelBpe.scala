package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * Byte-level BPE — the GPT-2 tokenizer family's text model: every input
 * is first mapped to a lossless byte-per-char intermediate alphabet, so
 * the learned vocabulary covers ALL of UTF-8 with exactly 256 base
 * symbols and `decode(encode(x)) == x` holds for arbitrary input (no
 * UNK, no normalization loss). This is the interchange form the GPT-2 /
 * RoBERTa / GPT-NeoX lineage ships as `merges.txt` + `vocab.json`
 * (published in the GPT-2 release's encoder.py), and the missing piece
 * between [[Vocab]]'s whitespace-word BPE and real-world tokenizer
 * artifacts: [[TokenizerIO]] can now round-trip models whose symbols
 * are byte-encoded rather than raw words.
 *
 * The reference has no tokenizer surface (it is a sketch extension —
 * /root/reference/src/lib.rs); this is beyond-parity pipeline surface.
 *
 * Scale shape: learning reuses [[Vocab.learnBpeMergesBatched]] over a
 * derived corpus column (distributed word count → vocabulary-bounded
 * distinct table → driver-local exact merge loop when it fits);
 * tokenization is map-only with a broadcast rank table and a per-thread
 * segmentation memo. Nothing here shuffles beyond the learner's counts.
 */
object ByteLevelBpe {

  /**
   * GPT-2 byte→unicode table: printable latin ranges map to themselves
   * (`!`..`~`, `¡`..`¬`, `®`..`ÿ` — 188 bytes), every other byte b maps
   * to U+0100+n in increasing-b order (68 bytes). Space (0x20) → `Ġ`
   * (U+0120), newline (0x0A) → `Ċ` (U+010A): the marker characters
   * visible in every published GPT-2 vocabulary. The image is 256
   * DISTINCT printable, non-whitespace chars, so byte-encoded symbols
   * are always whitespace-free — safe for the space-separated formats
   * [[Vocab]] and [[TokenizerIO]] assume.
   */
  val byteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('\u00a1' to '\u00ac') ++ ('\u00ae' to '\u00ff'))
      .map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteToChar]]; -1 for chars outside the image. */
  val charToByte: Array[Int] = {
    val out = Array.fill(256 + 68)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b).toInt) = b; b += 1 }
    out
  }

  /**
   * The GPT-2 pre-tokenizer regex (contractions, space-prefixed
   * letter/digit/punct runs, trailing-whitespace split): applied BEFORE
   * byte encoding, it bounds BPE merges to never cross word-ish
   * boundaries — the property that keeps segmentation memoizable and
   * the learned vocabulary linguistic. UNICODE_CHARACTER_CLASS makes
   * `\s`/`\p{N}` match their Unicode classes like the Python original.
   */
  private val pretokenPattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** GPT-2 pre-tokenization; the concatenation of the pieces is exactly
    * the input (the regex alternatives tile the string). */
  def pretokenize(text: String): Array[String] = {
    val m = pretokenPattern.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** UTF-8 bytes → intermediate alphabet (1 char per byte, so
    * `byteEncode(s).length` is the UTF-8 byte length of `s`). */
  def byteEncode(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { chars(i) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(chars)
  }

  /** Intermediate alphabet → original string; null on any char outside
    * the 256-char image (malformed input → NULL, never an error). */
  def byteDecode(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      if (c >= charToByte.length || charToByte(c) < 0) return null
      bytes(i) = charToByte(c).toByte
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Pre-tokenize + byte-encode: the "words" byte-level BPE learns and
    * segments over. Whitespace-free by construction. */
  def byteLevelWords(text: String): Array[String] =
    pretokenize(text).map(byteEncode)

  /**
   * Derived corpus column for learning: byte-level words joined by a
   * single space. Because the alphabet contains no whitespace, a
   * `\s+` split recovers exactly the word sequence —
   * [[Vocab.learnBpeMergesBatched]] runs on this column VERBATIM, so
   * byte-level learning inherits the batched-exact distributed loop,
   * the driver-local fast path, and its specs.
   */
  def byteLevelCorpus(
      docs: DataFrame,
      textCol: String,
      outCol: String = "bl_text"): DataFrame = {
    val u = F.udf((t: String) =>
      if (t == null) null else ByteLevelBpe.byteLevelWords(t).mkString(" "))
    docs.withColumn(outCol, u(F.col(textCol)))
  }

  /** Learn `k` byte-level merges (symbols are byte-encoded strings). */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      k: Int,
      maxLocalWords: Long = Vocab.DefaultMaxLocalWords): Seq[(String, String, Long)] = {
    val bl = byteLevelCorpus(docs, textCol, "__bl")
    Vocab.learnBpeMergesBatched(bl, "__bl", k, batchSize = 32, maxLocalWords)._1
  }

  /**
   * The model's id table, GPT-2 layout: ids 0..255 are the byte
   * alphabet in byte order, then one id per merge concatenation in
   * learned order. Total size 256 + merges (collisions impossible:
   * a concat has length >= 2).
   */
  def vocabulary(merges: Seq[(String, String)]): Seq[String] =
    byteToChar.map(_.toString).toSeq ++ merges.map { case (l, r) => l + r }

  /**
   * Map-only byte-level tokenization: `outCol` = the document's token
   * strings (byte-encoded symbols). Broadcast rank table + per-THREAD
   * LRU memo keyed on the byte-encoded word ([[Vocab.tokenizeBpe]]'s
   * cache discipline — a shared map corrupts under concurrent tasks).
   * NULL text → NULL.
   */
  def tokenize(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "tokens"): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val tokU = F.udf(new Function1[String, Array[String]] with Serializable {
      @transient private lazy val memo = ThreadLocal.withInitial(
        new java.util.function.Supplier[java.util.LinkedHashMap[String, Array[String]]] {
          def get() = new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 65536
          }
        })
      def apply(t: String): Array[String] =
        if (t == null) null
        else {
          val m = memo.get()
          ByteLevelBpe.byteLevelWords(t).iterator.flatMap { w =>
            var seg = m.get(w)
            if (seg == null) {
              seg = Vocab.applyBpeRanked(bc.value, w).toArray
              m.put(w, seg)
            }
            seg
          }.toArray
        }
    })
    docs.withColumn(outCol, tokU(F.col(textCol)))
  }

  /** Token strings → original text (exact inverse of [[tokenize]]'s
    * concatenation); null for null/undecodable input. */
  def decodeTokens(tokens: Seq[String]): String =
    if (tokens == null) null else byteDecode(tokens.mkString)

  /**
   * Map-only encode-to-ids: `outCol` = array<int> under the
   * [[vocabulary]] id table. Every base char has an id, so no token can
   * be OOV under its own merge table's vocabulary — there is no UNK
   * path by construction.
   */
  def encodeIds(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "ids"): DataFrame = {
    val vocab = vocabulary(merges).zipWithIndex.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(vocab)
    val toked = tokenize(docs, textCol, merges, "__blt")
    val idsU = F.udf((toks: Seq[String]) =>
      if (toks == null) null else toks.map(t => bc.value(t)).toArray)
    toked.withColumn(outCol, idsU(F.col("__blt"))).drop("__blt")
  }

  /** Ids → original text under the same merge table; null on any
    * out-of-range id (malformed → NULL). */
  def decodeIds(ids: Seq[Int], merges: Seq[(String, String)]): String = {
    if (ids == null) return null
    val vocab = vocabulary(merges)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id < 0 || id >= vocab.length) return null
      sb.append(vocab(id))
      i += 1
    }
    byteDecode(sb.toString)
  }
}

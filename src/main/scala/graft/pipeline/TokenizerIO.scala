package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/**
 * Tokenizer interchange in the de-facto ecosystem formats, so a
 * tokenizer learned here can leave the engine (and externally trained
 * artifacts can be loaded back into [[Vocab.applyBpe]] /
 * [[Vocab.tokenizeBpe]] / [[WordPiece.tokenize]]):
 *
 *  - BPE: `merges.txt` (`#version: 0.2` header, one `left right` pair
 *    per line in learned order) + `vocab.json` (token → id object) —
 *    the GPT-2 pair of files.
 *  - WordPiece: `vocab.txt` (one piece per line, line number = id) —
 *    the BERT form.
 *
 * Tokenizer artifacts are model-sized, not corpus-sized (a 32k-merge
 * table is ~1 MB), so this is deliberately driver-side IO — but it
 * goes through the Hadoop FileSystem API, so `hdfs://`/`s3a://`
 * destinations work the same as local paths on a cluster.
 *
 * BPE symbols come from whitespace-split words, so no symbol can
 * contain whitespace and the `left right` line form is unambiguous;
 * [[saveBpe]] still validates rather than silently writing an
 * unparseable file.
 */
object TokenizerIO {

  private val MergesHeader = "#version: 0.2"

  // ------------------------------------------------------------- file IO

  private def writeText(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  // ------------------------------------------------------------ JSON bits

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Minimal strict parser for a flat `{"token": int, ...}` object —
    * exactly what [[saveBpe]] writes and what HF vocab.json files
    * contain. Handles all JSON string escapes including \uXXXX. */
  private[pipeline] def parseStringIntObject(s: String): Map[String, Int] = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(
      s"vocab.json parse error at offset $i: $msg")
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) err("dangling escape")
          s.charAt(i + 1) match {
            case '"'  => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/'  => sb += '/'; i += 2
            case 'b'  => sb += '\b'; i += 2
            case 'f'  => sb += '\f'; i += 2
            case 'n'  => sb += '\n'; i += 2
            case 'r'  => sb += '\r'; i += 2
            case 't'  => sb += '\t'; i += 2
            case 'u'  =>
              if (i + 6 > s.length) err("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => err(s"unknown escape \\$other")
          }
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }
    def int(): Int = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
      if (i == start) err("expected integer")
      s.substring(start, i).toInt
    }
    ws(); expect('{'); ws()
    val out = Map.newBuilder[String, Int]
    if (i < s.length && s.charAt(i) == '}') { i += 1; return out.result() }
    var done = false
    while (!done) {
      ws()
      val k = str()
      ws(); expect(':'); ws()
      out += k -> int()
      ws()
      if (i < s.length && s.charAt(i) == ',') i += 1
      else { expect('}'); done = true }
    }
    out.result()
  }

  // ----------------------------------------------------------------- BPE

  /** The vocabulary a merge table induces: the single-character
    * alphabet (from `alphabet` plus every character appearing in the
    * merges), sorted, then each merge's concatenation in learned
    * order — deterministic ids, duplicates keep the first id. */
  def bpeVocabFromMerges(
      merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil): Seq[String] = {
    val chars = (alphabet.iterator ++
        merges.iterator.flatMap { case (l, r) => (l + r).map(_.toString) })
      .toSeq.distinct.sorted
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    chars.foreach(seen += _)
    merges.foreach { case (l, r) => seen += (l + r) }
    seen.toSeq
  }

  /**
   * Write a learned BPE tokenizer as `<dir>/merges.txt` +
   * `<dir>/vocab.json`. `vocab` defaults to [[bpeVocabFromMerges]];
   * pass the corpus alphabet through it to include characters that
   * never merged.
   */
  def saveBpe(
      spark: SparkSession,
      dir: String,
      merges: Seq[(String, String)],
      vocab: Seq[String] = Nil): Unit = {
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty && !(l + r).exists(Character.isWhitespace),
        s"BPE symbols must be non-empty and whitespace-free, got ('$l', '$r')")
    }
    val v = if (vocab.nonEmpty) vocab else bpeVocabFromMerges(merges)
    require(v.distinct.length == v.length, "vocab contains duplicate tokens")
    writeText(spark, s"$dir/merges.txt",
      (MergesHeader +: merges.map { case (l, r) => s"$l $r" }).mkString("", "\n", "\n"))
    writeText(spark, s"$dir/vocab.json",
      v.zipWithIndex.map { case (t, i) => s""""${jsonEscape(t)}": $i""" }
        .mkString("{", ", ", "}"))
  }

  /** Read `<dir>/merges.txt` back into the learned-order pair list
    * [[Vocab.applyBpe]] / [[Vocab.tokenizeBpe]] consume. Blank lines
    * are skipped; ONLY a leading `#version` line is treated as the
    * header (the HF layout). Filtering every `#`-prefixed line would
    * silently drop merges whose left symbol begins with '#' — common
    * in code/markdown corpora and present in real GPT-2-family
    * merges.txt files. */
  def loadBpeMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    readText(spark, s"$dir/merges.txt")
      .linesIterator
      .map(_.stripLineEnd)
      .zipWithIndex
      .filter { case (l, i) =>
        l.nonEmpty && !(i == 0 && l.startsWith("#version")) }
      .map { case (l, _) => l }
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merges.txt line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }
      .toSeq

  /** Read `<dir>/vocab.json` (token → id). */
  def loadBpeVocab(spark: SparkSession, dir: String): Map[String, Int] =
    parseStringIntObject(readText(spark, s"$dir/vocab.json"))

  // ------------------------------------------------------------ WordPiece

  /** Write a WordPiece model as BERT-style `<path>` vocab.txt: one
    * piece per line, line number = id; the unk token is included. */
  def saveWordPieceVocab(spark: SparkSession, path: String, model: WordPiece.Model): Unit = {
    val pieces = model.pieces.toSeq.sorted
    (model.unk +: pieces).foreach { p =>
      require(p.nonEmpty && !p.exists(c => c == '\n' || c == '\r'),
        s"WordPiece pieces must be non-empty single-line strings, got '$p'")
    }
    writeText(spark, path, (model.unk +: pieces).mkString("", "\n", "\n"))
  }

  /** Read a BERT-style vocab.txt back into a [[WordPiece.Model]]:
    * first line is taken as the unk token (the save-side layout);
    * pass `unk` explicitly to override for external files where
    * [UNK] sits elsewhere. */
  def loadWordPieceVocab(
      spark: SparkSession,
      path: String,
      unk: String = null): WordPiece.Model = {
    val lines = readText(spark, path).linesIterator
      .map(_.stripLineEnd).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, s"empty WordPiece vocab at $path")
    val u = if (unk != null) unk else lines.head
    WordPiece.Model(lines.filterNot(_ == u).toSet, u)
  }

  // ------------------------------------------------- HF tokenizer.json

  /** A BPE tokenizer in the single-file fast-tokenizer shape: learned
    * merges, the token → id vocabulary, and added (special) tokens
    * whose ids follow the vocabulary. */
  final case class BpeTokenizer(
      merges: Seq[(String, String)],
      vocab: Map[String, Int],
      addedTokens: Seq[String],
      byteLevel: Boolean = false)

  /** Minimal strict JSON value parser (objects → Map preserving no
    * order, arrays → Vector, strings, integer/double numbers,
    * booleans, null) — enough for tokenizer.json files without an
    * external dependency. Strict: trailing garbage is an error. */
  private[pipeline] def parseJson(s: String): Any = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(
      s"tokenizer.json parse error at offset $i: $msg")
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) err("dangling escape")
          s.charAt(i + 1) match {
            case '"'  => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/'  => sb += '/'; i += 2
            case 'b'  => sb += '\b'; i += 2
            case 'f'  => sb += '\f'; i += 2
            case 'n'  => sb += '\n'; i += 2
            case 'r'  => sb += '\r'; i += 2
            case 't'  => sb += '\t'; i += 2
            case 'u'  =>
              if (i + 6 > s.length) err("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => err(s"unknown escape \\$other")
          }
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }
    def value(): Any = {
      ws()
      if (i >= s.length) err("unexpected end")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val out = Map.newBuilder[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1 }
          else {
            var done = false
            while (!done) {
              ws()
              val k = str()
              ws(); expect(':')
              out += k -> value()
              ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect('}'); done = true }
            }
          }
          out.result()
        case '[' =>
          i += 1; ws()
          val out = Vector.newBuilder[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1 }
          else {
            var done = false
            while (!done) {
              out += value()
              ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect(']'); done = true }
            }
          }
          out.result()
        case '"' => str()
        case 't' =>
          if (!s.startsWith("true", i)) err("bad literal")
          i += 4; true
        case 'f' =>
          if (!s.startsWith("false", i)) err("bad literal")
          i += 5; false
        case 'n' =>
          if (!s.startsWith("null", i)) err("bad literal")
          i += 4; null
        case _ =>
          val start = i
          if (s.charAt(i) == '-') i += 1
          while (i < s.length && (Character.isDigit(s.charAt(i)) ||
            "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
          if (i == start) err("expected value")
          val tok = s.substring(start, i)
          if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
          else tok.toLong
      }
    }
    val v = value()
    ws()
    if (i != s.length) err("trailing content")
    v
  }

  /**
   * Write a learned BPE tokenizer as a single HF-fast-tokenizer-style
   * `tokenizer.json`: `model.type = "BPE"`, `model.vocab` (token →
   * id), `model.merges` as `"left right"` strings in learned order
   * (the widely compatible layout), and `added_tokens` entries whose
   * ids continue after the vocabulary. `vocab` defaults to
   * [[bpeVocabFromMerges]], like [[saveBpe]].
   */
  def saveTokenizerJson(
      spark: SparkSession,
      path: String,
      merges: Seq[(String, String)],
      vocab: Seq[String] = Nil,
      addedTokens: Seq[String] = Nil,
      byteLevel: Boolean = false): Unit = {
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty && !(l + r).exists(Character.isWhitespace),
        s"BPE symbols must be non-empty and whitespace-free, got ('$l', '$r')")
    }
    val v = if (vocab.nonEmpty) vocab else bpeVocabFromMerges(merges)
    require(v.distinct.length == v.length, "vocab contains duplicate tokens")
    require(addedTokens.distinct.length == addedTokens.length,
      "added_tokens contains duplicates")
    addedTokens.foreach(t => require(!v.contains(t),
      s"added token '$t' already in vocab"))
    val vocabJson = v.zipWithIndex
      .map { case (t, i) => s""""${jsonEscape(t)}": $i""" }
      .mkString("{", ", ", "}")
    val mergesJson = merges
      .map { case (l, r) => s""""${jsonEscape(l)} ${jsonEscape(r)}"""" }
      .mkString("[", ", ", "]")
    val addedJson = addedTokens.zipWithIndex.map { case (t, i) =>
      s"""{"id": ${v.length + i}, "content": "${jsonEscape(t)}", """ +
        """"single_word": false, "lstrip": false, "rstrip": false, """ +
        """"normalized": false, "special": true}"""
    }.mkString("[", ", ", "]")
    // byte-level models record the HF pre_tokenizer/decoder pair so a
    // fast-tokenizer loader applies the byte alphabet on both sides
    // (pass [[ByteLevelBpe.vocabulary]] as `vocab` for those)
    val pretok =
      if (byteLevel)
        """"pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false, """ +
          """"trim_offsets": true, "use_regex": true}, """ +
          """"decoder": {"type": "ByteLevel"}, """
      else ""
    writeText(spark, path,
      s"""{"version": "1.0", "added_tokens": $addedJson, $pretok""" +
        s""""model": {"type": "BPE", "unk_token": null, """ +
        s""""vocab": $vocabJson, "merges": $mergesJson}}""")
  }

  private def addedTokensJson(added: Seq[String], firstId: Int): String =
    added.zipWithIndex.map { case (t, i) =>
      s"""{"id": ${firstId + i}, "content": "${jsonEscape(t)}", """ +
        """"single_word": false, "lstrip": false, "rstrip": false, """ +
        """"normalized": false, "special": true}"""
    }.mkString("[", ", ", "]")

  private def parseAddedTokens(root: Map[String, Any]): Seq[String] =
    root.get("added_tokens") match {
      case Some(arr: Vector[Any @unchecked]) => arr.map {
        case m: Map[String @unchecked, Any @unchecked] => m.get("content") match {
          case Some(c: String) => c
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: added_tokens entry without string content")
        }
        case other => throw new IllegalArgumentException(
          s"tokenizer.json: malformed added_tokens entry $other")
      }
      case None => Vector.empty[String]
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: added_tokens must be an array")
    }

  private def parseModelObject(
      s: String, expectedType: String): (Map[String, Any], Map[String, Any]) = {
    val root = parseJson(s) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: root must be an object")
    }
    val model = root.get("model") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model object")
    }
    require(model.get("type").contains(expectedType),
      s"tokenizer.json: unsupported model.type ${model.get("type")} " +
        s"(expected $expectedType)")
    (root, model)
  }

  /**
   * Write a [[WordPiece.Model]] as a single `tokenizer.json`
   * (`model.type = "WordPiece"`, `continuing_subword_prefix` "##",
   * the BERT fast-tokenizer shape). Vocab ids: unk token first, then
   * the pieces sorted — the same deterministic layout as
   * [[saveWordPieceVocab]]; added (special) tokens follow the vocab.
   */
  def saveWordPieceTokenizerJson(
      spark: SparkSession,
      path: String,
      model: WordPiece.Model,
      addedTokens: Seq[String] = Nil): Unit = {
    val pieces = model.pieces.toSeq.sorted
    (model.unk +: pieces).foreach { p =>
      require(p.nonEmpty, "WordPiece pieces must be non-empty") }
    require(!model.pieces.contains(model.unk),
      s"unk token '${model.unk}' must not also be a piece")
    val v = model.unk +: pieces
    require(addedTokens.distinct.length == addedTokens.length,
      "added_tokens contains duplicates")
    addedTokens.foreach(t => require(!v.contains(t),
      s"added token '$t' already in vocab"))
    val vocabJson = v.zipWithIndex
      .map { case (t, i) => s""""${jsonEscape(t)}": $i""" }
      .mkString("{", ", ", "}")
    writeText(spark, path,
      s"""{"version": "1.0", """ +
        s""""added_tokens": ${addedTokensJson(addedTokens, v.length)}, """ +
        s""""model": {"type": "WordPiece", """ +
        s""""unk_token": "${jsonEscape(model.unk)}", """ +
        s""""continuing_subword_prefix": "##", """ +
        s""""max_input_chars_per_word": ${model.maxInputChars}, """ +
        s""""vocab": $vocabJson}}""")
  }

  /** Read a `model.type = "WordPiece"` tokenizer.json back into the
    * model plus its added tokens. Requires the "##" continuation
    * prefix ([[WordPiece.segment]] hardcodes it). */
  def loadWordPieceTokenizerJson(
      spark: SparkSession, path: String): (WordPiece.Model, Seq[String]) = {
    val (root, model) = parseModelObject(readText(spark, path), "WordPiece")
    val unk = model.get("unk_token") match {
      case Some(s: String) => s
      case None => "[UNK]"
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: malformed unk_token $other")
    }
    model.get("continuing_subword_prefix").foreach(p =>
      require(p == "##",
        s"tokenizer.json: unsupported continuing_subword_prefix '$p'"))
    val maxChars = model.get("max_input_chars_per_word") match {
      case Some(n: Long) => n.toInt
      case None => 200
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: malformed max_input_chars_per_word $other")
    }
    val vocab = model.get("vocab") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m.keySet
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.vocab")
    }
    (WordPiece.Model(vocab - unk, unk, maxChars), parseAddedTokens(root))
  }

  /**
   * Write a [[UnigramLm.Model]] as a single `tokenizer.json`
   * (`model.type = "Unigram"`, `model.vocab` as `[piece, logprob]`
   * pairs — the SentencePiece fast-tokenizer shape). The unk entry is
   * a real vocab row (id 0, score = the model's `unkScore`) pointed at
   * by `unk_id`, so the fallback score survives the round trip.
   * Log-probs are written with `Double.toString` — shortest form that
   * parses back to the identical bits, so reloaded scores are exact.
   */
  def saveUnigramTokenizerJson(
      spark: SparkSession,
      path: String,
      model: UnigramLm.Model,
      unkPiece: String = "<unk>",
      addedTokens: Seq[String] = Nil): Unit = {
    require(!model.pieces.contains(unkPiece),
      s"unk piece '$unkPiece' must not also be a vocab piece")
    require(addedTokens.distinct.length == addedTokens.length,
      "added_tokens contains duplicates")
    // a byte-fallback model materializes the 256 <0xNN> rows in the
    // vocab (the Llama-family file shape), scored at unkScore; they
    // are NOT text pieces (withByteFallback pins the namespaces
    // disjoint) and the loader folds them back into the flag
    val byteRows =
      if (model.byteFallback) UnigramLm.bytePieces.map(b => (b, model.unkScore))
      else Seq.empty
    val entries = (unkPiece, model.unkScore) +:
      (model.pieces.toSeq.sortBy(_._1) ++ byteRows)
    entries.foreach { case (p, _) =>
      require(p.nonEmpty, "Unigram pieces must be non-empty") }
    addedTokens.foreach(t => require(!entries.exists(_._1 == t),
      s"added token '$t' already in vocab"))
    val vocabJson = entries
      .map { case (p, lp) =>
        s"""["${jsonEscape(p)}", ${java.lang.Double.toString(lp)}]""" }
      .mkString("[", ", ", "]")
    writeText(spark, path,
      s"""{"version": "1.0", """ +
        s""""added_tokens": ${addedTokensJson(addedTokens, entries.length)}, """ +
        s""""model": {"type": "Unigram", "unk_id": 0, """ +
        s""""byte_fallback": ${model.byteFallback}, "vocab": $vocabJson}}""")
  }

  /** Read a `model.type = "Unigram"` tokenizer.json back into the
    * model plus its added tokens. The `unk_id` row (when present)
    * becomes the model's `unkScore` and is excluded from the pieces;
    * `maxPieceLen` derives from the longest piece — Viterbi
    * segmentation is identical for any bound >= that (no longer
    * candidate can match). */
  def loadUnigramTokenizerJson(
      spark: SparkSession, path: String): (UnigramLm.Model, Seq[String]) = {
    val (root, model) = parseModelObject(readText(spark, path), "Unigram")
    val rows = model.get("vocab") match {
      case Some(arr: Vector[Any @unchecked]) => arr.map {
        case pair: Vector[Any @unchecked] =>
          require(pair.length == 2 && pair(0).isInstanceOf[String],
            s"tokenizer.json: malformed Unigram vocab entry $pair")
          val score = pair(1) match {
            case d: Double => d
            case n: Long => n.toDouble
            case other => throw new IllegalArgumentException(
              s"tokenizer.json: non-numeric Unigram score $other")
          }
          (pair(0).asInstanceOf[String], score)
        case other => throw new IllegalArgumentException(
          s"tokenizer.json: malformed Unigram vocab entry $other")
      }
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: missing model.vocab")
    }
    val unkIdx = model.get("unk_id") match {
      case Some(n: Long) =>
        require(n >= 0 && n < rows.length,
          s"tokenizer.json: unk_id $n out of range")
        Some(n.toInt)
      case Some(null) | None => None
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: malformed unk_id $other")
    }
    val unkScore = unkIdx.map(rows(_)._2).getOrElse(-20.0)
    val byteFallback = model.get("byte_fallback") match {
      case Some(b: Boolean) => b
      case Some(null) | None => false
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: malformed byte_fallback $other")
    }
    val pieces = rows.zipWithIndex
      .filterNot { case (_, i) => unkIdx.contains(i) }
      .map(_._1)
      // under byte_fallback the 256 <0xNN> rows are the fallback
      // alphabet, not text pieces — fold them back into the flag
      .filterNot { case (p, _) => byteFallback && UnigramLm.isBytePiece(p) }
      .toMap
    val maxLen = if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max
    (UnigramLm.Model(pieces, maxLen, unkScore, byteFallback), parseAddedTokens(root))
  }

  /** Read a `tokenizer.json` back into merges + vocab + added tokens.
    * Accepts both merge spellings in the wild: `"left right"` strings
    * and `["left", "right"]` two-element arrays. Only `model.type =
    * "BPE"` files are supported — use [[loadWordPieceTokenizerJson]] /
    * [[loadUnigramTokenizerJson]] for the other model families. */
  def loadTokenizerJson(spark: SparkSession, path: String): BpeTokenizer = {
    val root = parseJson(readText(spark, path)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException("tokenizer.json: root must be an object")
    }
    val model = root.get("model") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model object")
    }
    require(model.get("type").contains("BPE"),
      s"tokenizer.json: unsupported model.type ${model.get("type")}")
    val vocab = model.get("vocab") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        m.map {
          case (k, n: Long) => k -> n.toInt
          case (k, other) => throw new IllegalArgumentException(
            s"tokenizer.json: non-integer vocab id for '$k': $other")
        }
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model.vocab")
    }
    val merges = model.get("merges") match {
      case Some(arr: Vector[Any @unchecked]) => arr.map {
        case s: String =>
          val sp = s.indexOf(' ')
          require(sp > 0 && sp < s.length - 1 && s.indexOf(' ', sp + 1) < 0,
            s"tokenizer.json: malformed merge '$s'")
          (s.substring(0, sp), s.substring(sp + 1))
        case pair: Vector[Any @unchecked] =>
          require(pair.length == 2 && pair.forall(_.isInstanceOf[String]),
            s"tokenizer.json: malformed merge pair $pair")
          (pair(0).asInstanceOf[String], pair(1).asInstanceOf[String])
        case other => throw new IllegalArgumentException(
          s"tokenizer.json: malformed merge entry $other")
      }
      case _ => throw new IllegalArgumentException("tokenizer.json: missing model.merges")
    }
    val added = root.get("added_tokens") match {
      case Some(arr: Vector[Any @unchecked]) => arr.map {
        case m: Map[String @unchecked, Any @unchecked] => m.get("content") match {
          case Some(c: String) => c
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: added_tokens entry without string content")
        }
        case other => throw new IllegalArgumentException(
          s"tokenizer.json: malformed added_tokens entry $other")
      }
      case None => Vector.empty[String]
      case _ => throw new IllegalArgumentException(
        "tokenizer.json: added_tokens must be an array")
    }
    val byteLevel = root.get("pre_tokenizer") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        m.get("type").contains("ByteLevel")
      case _ => false
    }
    BpeTokenizer(merges, vocab, added, byteLevel)
  }

  // --------------------------------------------- SentencePiece .model

  // The SentencePiece ModelProto wire format (public
  // sentencepiece_model.proto): ModelProto.pieces = field 1 (repeated
  // SentencePiece{piece=1 string, score=2 float, type=3 enum}),
  // ModelProto.trainer_spec = field 2 (TrainerSpec{model_type=3 enum
  // UNIGRAM=1, byte_fallback=35 bool}). Hand-rolled wire codec — tiny,
  // and keeps the zero-dependency rule.

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeLenDelim(
      out: java.io.ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  private def spmPieceBytes(piece: String, score: Float, tpe: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeLenDelim(out, 1, piece.getBytes(StandardCharsets.UTF_8))
    writeVarint(out, (2 << 3) | 5)
    val fb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(score).array()
    out.write(fb)
    if (tpe != 1) { writeVarint(out, (3 << 3) | 0); writeVarint(out, tpe.toLong) }
    out.toByteArray
  }

  /**
   * Write a [[UnigramLm.Model]] as a SentencePiece `.model` file (the
   * Llama-family on-disk artifact): unk row first (type UNKNOWN), text
   * pieces in sorted order, then — for a byte-fallback model — the 256
   * `<0xNN>` rows as type BYTE; `trainer_spec` carries
   * `model_type = UNIGRAM` and the `byte_fallback` flag. Scores are
   * protobuf FLOATS (the format's own width): reloading yields each
   * score's nearest float, so round-trip equality is at float
   * precision — compare against `score.toFloat.toDouble`.
   */
  def saveSentencePieceModel(
      spark: SparkSession,
      path: String,
      model: UnigramLm.Model,
      unkPiece: String = "<unk>"): Unit = {
    require(!model.pieces.contains(unkPiece),
      s"unk piece '$unkPiece' must not also be a vocab piece")
    val out = new java.io.ByteArrayOutputStream()
    writeLenDelim(out, 1,
      spmPieceBytes(unkPiece, model.unkScore.toFloat, 2))
    model.pieces.toSeq.sortBy(_._1).foreach { case (pc, sc) =>
      require(pc.nonEmpty, "SentencePiece pieces must be non-empty")
      writeLenDelim(out, 1, spmPieceBytes(pc, sc.toFloat, 1))
    }
    if (model.byteFallback)
      UnigramLm.bytePieces.foreach { b =>
        writeLenDelim(out, 1, spmPieceBytes(b, model.unkScore.toFloat, 6))
      }
    val ts = new java.io.ByteArrayOutputStream()
    writeVarint(ts, (3 << 3) | 0); writeVarint(ts, 1L) // model_type UNIGRAM
    if (model.byteFallback) {
      writeVarint(ts, (35 << 3) | 0); writeVarint(ts, 1L)
    }
    writeLenDelim(out, 2, ts.toByteArray)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write(out.toByteArray) finally o.close()
  }

  private final class ProtoReader(b: Array[Byte], var at: Int, end: Int) {
    def hasMore: Boolean = at < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(at < end, "SentencePiece model: truncated varint")
        val x = b(at) & 0xFF; at += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "SentencePiece model: varint overflow")
      }
      v
    }
    def bytesOf(n: Int): (Int, Int) = {
      require(at + n <= end, "SentencePiece model: truncated field")
      val r = (at, at + n); at += n; r
    }
    /** (field, wiretype) of the next tag. */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => bytesOf(8)
      case 2 => val n = varint(); bytesOf(n.toInt)
      case 5 => bytesOf(4)
      case other => throw new IllegalArgumentException(
        s"SentencePiece model: unsupported wire type $other")
    }
  }

  /** Read a `.model` written by [[saveSentencePieceModel]] (or any
    * UNIGRAM SentencePiece model using the piece/score/type and
    * byte_fallback fields). Returns (model, unkPiece). BYTE rows fold
    * into the byteFallback flag; CONTROL/USER_DEFINED rows load as
    * ordinary pieces; a non-UNIGRAM model_type is rejected. */
  def loadSentencePieceModel(
      spark: SparkSession, path: String): (UnigramLm.Model, String) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val r = new ProtoReader(bytes, 0, bytes.length)
    var pieces = Map.empty[String, Double]
    var unkPiece = "<unk>"
    var unkScore = -20.0
    var sawBytes = 0
    var byteFlag = false
    while (r.hasMore) {
      val (field, wt) = r.tag()
      (field, wt) match {
        case (1, 2) =>
          val n = r.varint().toInt
          val (a, e) = r.bytesOf(n)
          val pr = new ProtoReader(bytes, a, e)
          var piece: String = null
          var score = 0.0f
          var tpe = 1
          while (pr.hasMore) {
            val (f2, w2) = pr.tag()
            (f2, w2) match {
              case (1, 2) =>
                val m = pr.varint().toInt
                val (pa, pe) = pr.bytesOf(m)
                piece = new String(bytes, pa, pe - pa, StandardCharsets.UTF_8)
              case (2, 5) =>
                val (fa, _) = pr.bytesOf(4)
                score = java.nio.ByteBuffer.wrap(bytes, fa, 4)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
              case (3, 0) => tpe = pr.varint().toInt
              case (_, w) => pr.skip(w)
            }
          }
          require(piece != null, "SentencePiece model: piece row without text")
          tpe match {
            case 2 => unkPiece = piece; unkScore = score.toDouble
            case 6 => sawBytes += 1
            case 5 => () // UNUSED
            case _ => pieces += piece -> score.toDouble
          }
        case (2, 2) =>
          val n = r.varint().toInt
          val (a, e) = r.bytesOf(n)
          val tr = new ProtoReader(bytes, a, e)
          while (tr.hasMore) {
            val (f2, w2) = tr.tag()
            (f2, w2) match {
              case (3, 0) =>
                val mt = tr.varint()
                require(mt == 1L,
                  s"SentencePiece model: model_type $mt is not UNIGRAM")
              case (35, 0) => byteFlag = tr.varint() != 0L
              case (_, w) => tr.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    val maxLen = if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max
    val bf = byteFlag || sawBytes == 256
    val m0 = UnigramLm.Model(pieces, maxLen, unkScore, byteFallback = false)
    ((if (bf) UnigramLm.withByteFallback(m0) else m0), unkPiece)
  }

  /**
   * Write learned BPE merges as a SentencePiece `.model` with
   * `model_type = BPE`: pieces in [[bpeVocabFromMerges]] order
   * (alphabet, then merges in learn order) scored `-index` — the
   * SentencePiece convention where a BPE piece's score encodes its
   * merge priority (no merge PAIRS are stored in this format; see
   * [[loadSentencePieceBpe]] for why that is lossless anyway).
   */
  def saveSentencePieceBpe(
      spark: SparkSession,
      path: String,
      merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil,
      unkPiece: String = "<unk>"): Unit = {
    val vocab = bpeVocabFromMerges(merges, alphabet)
    require(!vocab.contains(unkPiece),
      s"unk piece '$unkPiece' must not also be a vocab piece")
    val out = new java.io.ByteArrayOutputStream()
    writeLenDelim(out, 1, spmPieceBytes(unkPiece, 0.0f, 2))
    vocab.zipWithIndex.foreach { case (pc, i) =>
      require(pc.nonEmpty, "SentencePiece pieces must be non-empty")
      writeLenDelim(out, 1, spmPieceBytes(pc, -i.toFloat, 1))
    }
    val ts = new java.io.ByteArrayOutputStream()
    writeVarint(ts, (3 << 3) | 0); writeVarint(ts, 2L) // model_type BPE
    writeLenDelim(out, 2, ts.toByteArray)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write(out.toByteArray) finally o.close()
  }

  /**
   * Read a BPE `.model` (ours or any SentencePiece BPE): pieces sort
   * by score descending (= priority order), and the pair-rank map is
   * reconstructed as EVERY two-piece split of every piece, ranked by
   * the merged piece's order — which is exactly SentencePiece's
   * inference rule (greedily merge the adjacent pair whose
   * CONCATENATION is the best-scored piece). The format stores no
   * merge pairs, but none are needed: for a self-consistent learned
   * model the extra never-learned splits are unreachable at inference
   * — a pair (l, r) with concat P can only meet if l and r are both
   * formed before P's true parents, and lowest-rank-first order
   * forbids that (the applyBpeRanked ≡ applyBpe argument, inverted).
   * Feed the result to [[Vocab.tokenizeBpeRanked]].
   *
   * Returns (pairRanks, vocab pieces in priority order, unkPiece).
   */
  def loadSentencePieceBpe(
      spark: SparkSession,
      path: String): (Map[(String, String), Int], Seq[String], String) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val r = new ProtoReader(bytes, 0, bytes.length)
    var rows = Vector.empty[(String, Float)]
    var unkPiece = "<unk>"
    var sawType = false
    while (r.hasMore) {
      val (field, wt) = r.tag()
      (field, wt) match {
        case (1, 2) =>
          val n = r.varint().toInt
          val (a, e) = r.bytesOf(n)
          val pr = new ProtoReader(bytes, a, e)
          var piece: String = null
          var score = 0.0f
          var tpe = 1
          while (pr.hasMore) {
            val (f2, w2) = pr.tag()
            (f2, w2) match {
              case (1, 2) =>
                val m = pr.varint().toInt
                val (pa, pe) = pr.bytesOf(m)
                piece = new String(bytes, pa, pe - pa, StandardCharsets.UTF_8)
              case (2, 5) =>
                val (fa, _) = pr.bytesOf(4)
                score = java.nio.ByteBuffer.wrap(bytes, fa, 4)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
              case (3, 0) => tpe = pr.varint().toInt
              case (_, w) => pr.skip(w)
            }
          }
          require(piece != null, "SentencePiece model: piece row without text")
          tpe match {
            case 2 => unkPiece = piece
            case 1 => rows :+= (piece, score)
            case _ => () // control/byte/user-defined rows are not merge vocab
          }
        case (2, 2) =>
          val n = r.varint().toInt
          val (a, e) = r.bytesOf(n)
          val tr = new ProtoReader(bytes, a, e)
          while (tr.hasMore) {
            val (f2, w2) = tr.tag()
            (f2, w2) match {
              case (3, 0) =>
                val mt = tr.varint()
                require(mt == 2L,
                  s"SentencePiece model: model_type $mt is not BPE")
                sawType = true
              case (_, w) => tr.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    require(sawType, "SentencePiece model: trainer_spec carries no BPE model_type")
    // priority order: score descending, file order on ties
    val ordered = rows.zipWithIndex
      .sortBy { case ((_, sc), i) => (-sc.toDouble, i) }
      .map(_._1._1)
    val idOf = ordered.zipWithIndex.toMap
    val ranks = scala.collection.mutable.Map.empty[(String, String), Int]
    ordered.zipWithIndex.foreach { case (pc, i) =>
      var j = 1
      while (j < pc.length) {
        val l = pc.substring(0, j)
        val rp = pc.substring(j)
        if (idOf.contains(l) && idOf.contains(rp)) ranks((l, rp)) = i
        j += 1
      }
    }
    (ranks.toMap, ordered, unkPiece)
  }
}

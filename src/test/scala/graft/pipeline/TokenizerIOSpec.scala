package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * TokenizerIO: merges.txt / vocab.json / vocab.txt interchange —
 * round-trips against the learners, ecosystem-format quirks, and
 * reloaded-tokenizer ≡ learned-tokenizer output on the real corpus.
 */
class TokenizerIOSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tokio").toString

  test("BPE merges+vocab round-trip through merges.txt / vocab.json") {
    val docs = sf("sf0.001", "documents")
    val merges = Vocab.learnBpeMerges(docs, "text", 24).map(m => (m._1, m._2))
    assert(merges.nonEmpty)
    val dir = tmp()
    TokenizerIO.saveBpe(spark, dir, merges)
    assert(TokenizerIO.loadBpeMerges(spark, dir) === merges)
    val vocab = TokenizerIO.loadBpeVocab(spark, dir)
    val expect = TokenizerIO.bpeVocabFromMerges(merges)
    assert(vocab === expect.zipWithIndex.toMap)
    // every merge's concatenation and both sides are resolvable tokens
    merges.foreach { case (l, r) =>
      assert(vocab.contains(l + r), s"merged token '$l$r' missing")
    }
  }

  test("reloaded tokenizer produces identical corpus tokenization") {
    val docs = sf("sf0.001", "documents").limit(100)
    val merges = Vocab.learnBpeMerges(docs, "text", 16).map(m => (m._1, m._2))
    val dir = tmp()
    TokenizerIO.saveBpe(spark, dir, merges)
    val reloaded = TokenizerIO.loadBpeMerges(spark, dir)
    val a = Vocab.tokenizeBpe(docs, "text", merges).select("doc_id", "tokens")
    val b = Vocab.tokenizeBpe(docs, "text", reloaded).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("vocab.json escapes survive: quotes, backslashes, control chars, unicode") {
    val vocab = Seq("plain", "has\"quote", "back\\slash", "unié", "nulbyte")
    val dir = tmp()
    TokenizerIO.saveBpe(spark, dir, Seq(("pl", "ain")), vocab = vocab)
    assert(TokenizerIO.loadBpeVocab(spark, dir) === vocab.zipWithIndex.toMap)
  }

  test("merges.txt tolerates headers and blank lines, rejects malformed pairs") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "merges.txt"),
      "#version: 0.2\n\na b\nab c\n")
    assert(TokenizerIO.loadBpeMerges(spark, dir) === Seq(("a", "b"), ("ab", "c")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "merges.txt"), "#version: 0.2\na b c\n")
    intercept[IllegalArgumentException] {
      TokenizerIO.loadBpeMerges(spark, dir)
    }
  }

  test("merges with '#'-initial symbols survive the round-trip") {
    // code/markdown corpora learn merges like ("#", "include"); only a
    // LEADING #version line is a header, so these must not be dropped
    val merges = Seq(("#", "#"), ("##", "inc"), ("a", "b"))
    val dir = tmp()
    TokenizerIO.saveBpe(spark, dir, merges)
    assert(TokenizerIO.loadBpeMerges(spark, dir) === merges)
    // an external file whose FIRST line is a real '#'-initial merge
    // (no header at all) parses fully too
    val dir2 = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "merges.txt"), "# #\n#version x\na b\n")
    assert(TokenizerIO.loadBpeMerges(spark, dir2) ===
      Seq(("#", "#"), ("#version", "x"), ("a", "b")))
  }

  test("saveBpe rejects whitespace-bearing symbols and duplicate vocab") {
    intercept[IllegalArgumentException] {
      TokenizerIO.saveBpe(spark, tmp(), Seq(("a b", "c")))
    }
    intercept[IllegalArgumentException] {
      TokenizerIO.saveBpe(spark, tmp(), Seq(("a", "b")), vocab = Seq("x", "x"))
    }
  }

  test("tokenizer.json round-trips merges, vocab, and added tokens") {
    val docs = sf("sf0.001", "documents")
    val merges = Vocab.learnBpeMerges(docs, "text", 24).map(m => (m._1, m._2))
    val path = tmp() + "/tokenizer.json"
    TokenizerIO.saveTokenizerJson(spark, path, merges,
      addedTokens = Seq("<|endoftext|>", "<|pad|>"))
    val tk = TokenizerIO.loadTokenizerJson(spark, path)
    assert(tk.merges === merges)
    assert(tk.vocab === TokenizerIO.bpeVocabFromMerges(merges).zipWithIndex.toMap)
    assert(tk.addedTokens === Seq("<|endoftext|>", "<|pad|>"))
    // reloaded merges drive identical corpus tokenization
    val a = Vocab.tokenizeBpe(docs, "text", merges).select("doc_id", "tokens")
    val b = Vocab.tokenizeBpe(docs, "text", tk.merges).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("tokenizer.json accepts external layouts and rejects malformed files") {
    val dir = tmp()
    // newer HF layout: merges as two-element arrays, escaped tokens
    val p1 = java.nio.file.Paths.get(dir, "ext.json")
    java.nio.file.Files.writeString(p1,
      """{"version":"1.0",
        |  "added_tokens":[{"id":3,"content":"<unk>","special":true}],
        |  "model":{"type":"BPE",
        |    "vocab":{"a":0,"b":1,"ab":2,"q\"x":3},
        |    "merges":[["a","b"],["ab","a"]]}}""".stripMargin)
    val tk = TokenizerIO.loadTokenizerJson(spark, p1.toString)
    assert(tk.merges === Seq(("a", "b"), ("ab", "a")))
    assert(tk.vocab === Map("a" -> 0, "b" -> 1, "ab" -> 2, "q\"x" -> 3))
    assert(tk.addedTokens === Seq("<unk>"))
    // non-BPE model type is refused, not mis-parsed
    val p2 = java.nio.file.Paths.get(dir, "wp.json")
    java.nio.file.Files.writeString(p2,
      """{"model":{"type":"WordPiece","vocab":{"a":0},"merges":[]}}""")
    intercept[IllegalArgumentException] {
      TokenizerIO.loadTokenizerJson(spark, p2.toString)
    }
    // trailing garbage is an error (strict parser)
    val p3 = java.nio.file.Paths.get(dir, "trail.json")
    java.nio.file.Files.writeString(p3,
      """{"model":{"type":"BPE","vocab":{},"merges":[]}} extra""")
    intercept[IllegalArgumentException] {
      TokenizerIO.loadTokenizerJson(spark, p3.toString)
    }
  }

  test("WordPiece model round-trips through vocab.txt, tokenization identical") {
    val docs = sf("sf0.001", "documents").limit(100)
    val model = WordPiece.learn(docs, "text", vocabSize = 64)
    val path = tmp() + "/vocab.txt"
    TokenizerIO.saveWordPieceVocab(spark, path, model)
    val reloaded = TokenizerIO.loadWordPieceVocab(spark, path)
    assert(reloaded.pieces === model.pieces)
    assert(reloaded.unk === model.unk)
    val a = WordPiece.tokenize(docs, "text", model).select("doc_id", "tokens")
    val b = WordPiece.tokenize(docs, "text", reloaded).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("WordPiece tokenizer.json round-trips model, added tokens, and tokenization") {
    val docs = sf("sf0.001", "documents").limit(100)
    val model = WordPiece.learn(docs, "text", vocabSize = 64)
    val path = tmp() + "/tokenizer.json"
    TokenizerIO.saveWordPieceTokenizerJson(
      spark, path, model, addedTokens = Seq("[CLS]", "[SEP]"))
    val (re, added) = TokenizerIO.loadWordPieceTokenizerJson(spark, path)
    assert(re === model)               // pieces, unk, maxInputChars all equal
    assert(added === Seq("[CLS]", "[SEP]"))
    val a = WordPiece.tokenize(docs, "text", model).select("doc_id", "tokens")
    val b = WordPiece.tokenize(docs, "text", re).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // wrong model family fails loudly
    intercept[IllegalArgumentException] {
      TokenizerIO.loadUnigramTokenizerJson(spark, path)
    }
  }

  test("Unigram tokenizer.json round-trips pieces score-exactly, tokenization identical") {
    val docs = sf("sf0.001", "documents").limit(100)
    val model = UnigramLm.learn(docs, "text", vocabSize = 128, iters = 2)
    val path = tmp() + "/tokenizer.json"
    TokenizerIO.saveUnigramTokenizerJson(
      spark, path, model, addedTokens = Seq("<s>", "</s>"))
    val (re, added) = TokenizerIO.loadUnigramTokenizerJson(spark, path)
    assert(re.pieces === model.pieces) // log-probs bit-exact via Double.toString
    assert(re.unkScore === model.unkScore)
    assert(added === Seq("<s>", "</s>"))
    // derived maxPieceLen may be tighter than the learn param but must
    // be segmentation-equivalent
    assert(re.maxPieceLen <= model.maxPieceLen)
    val a = UnigramLm.tokenize(docs, "text", model).select("doc_id", "tokens")
    val b = UnigramLm.tokenize(docs, "text", re).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    intercept[IllegalArgumentException] {
      TokenizerIO.loadWordPieceTokenizerJson(spark, path)
    }
    // a score that only round-trips via shortest-repr: plant one
    val planted = UnigramLm.Model(
      Map("ab" -> -1.0000000000000002, "a" -> -3.3, "b" -> -0.1), 2, -19.5)
    val p2 = tmp() + "/planted.json"
    TokenizerIO.saveUnigramTokenizerJson(spark, p2, planted)
    val (re2, _) = TokenizerIO.loadUnigramTokenizerJson(spark, p2)
    assert(re2.pieces === planted.pieces)
    assert(re2.unkScore === planted.unkScore)
  }

  test("SentencePiece .model round-trips at float precision; rejects non-unigram") {
    val docs = sf("sf0.001", "documents").limit(100)
    val model = UnigramLm.withByteFallback(
      UnigramLm.learn(docs, "text", vocabSize = 96, iters = 2))
    val path = tmp() + "/spm.model"
    TokenizerIO.saveSentencePieceModel(spark, path, model)
    val (re, unk) = TokenizerIO.loadSentencePieceModel(spark, path)
    assert(unk === "<unk>")
    assert(re.byteFallback)
    // scores are protobuf floats: round-trip equality at float precision
    val floatCast = UnigramLm.withByteFallback(UnigramLm.Model(
      model.pieces.map { case (p, v) => p -> v.toFloat.toDouble },
      model.maxPieceLen, model.unkScore.toFloat.toDouble))
    assert(re.pieces === floatCast.pieces)
    assert(re.unkScore === floatCast.unkScore)
    // tokenization under the reloaded model equals the float-cast model
    val a = UnigramLm.tokenize(docs, "text", floatCast).select("doc_id", "tokens")
    val b = UnigramLm.tokenize(docs, "text", re).select("doc_id", "tokens")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // byte fallback still lossless after the round trip
    val w = "zebraé😀"
    assert(UnigramLm.decodePieces(UnigramLm.viterbiSegment(re, w)) === w)

    // plain (no byte fallback) model: flag stays off
    val p2 = tmp() + "/plain.model"
    TokenizerIO.saveSentencePieceModel(spark, p2,
      UnigramLm.Model(Map("ab" -> -1.25, "a" -> -2.5, "b" -> -0.5), 2))
    val (re2, _) = TokenizerIO.loadSentencePieceModel(spark, p2)
    assert(!re2.byteFallback)
    assert(re2.pieces === Map("ab" -> -1.25, "a" -> -2.5, "b" -> -0.5))

    // unknown fields are skipped (forward compat): append a
    // length-delimited field 15 ("AB") at top level
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    val withExtra = raw ++
      Array[Byte](((15 << 3) | 2).toByte, 0x02, 0x41, 0x42)
    val p3 = tmp() + "/extra.model"
    java.nio.file.Files.write(java.nio.file.Paths.get(p3), withExtra)
    val (re3, _) = TokenizerIO.loadSentencePieceModel(spark, p3)
    assert(re3.pieces === re2.pieces)

    // a BPE-typed model is refused
    val bad = {
      val out = new java.io.ByteArrayOutputStream()
      // trainer_spec { model_type: 2 }
      out.write(Array[Byte](((2 << 3) | 2).toByte, 0x02, (3 << 3).toByte, 0x02))
      out.toByteArray
    }
    val p4 = tmp() + "/bad.model"
    java.nio.file.Files.write(java.nio.file.Paths.get(p4), bad)
    intercept[IllegalArgumentException] {
      TokenizerIO.loadSentencePieceModel(spark, p4)
    }
  }

  test("byte-fallback Unigram tokenizer.json round-trips flag, pieces, and fallback") {
    val docs = sf("sf0.001", "documents").limit(100)
    val model = UnigramLm.withByteFallback(
      UnigramLm.learn(docs, "text", vocabSize = 96, iters = 2))
    val path = tmp() + "/bf_tokenizer.json"
    TokenizerIO.saveUnigramTokenizerJson(spark, path, model)
    // the file carries the Llama-family spelling: flag + 256 <0xNN> rows
    val raw = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(raw.contains(""""byte_fallback": true"""))
    assert(raw.contains(""""<0x00>""") && raw.contains(""""<0xFF>"""))
    val (re, _) = TokenizerIO.loadUnigramTokenizerJson(spark, path)
    assert(re.byteFallback)
    assert(re.pieces === model.pieces)   // byte rows folded back into the flag
    assert(re.unkScore === model.unkScore)
    // the reloaded model still byte-falls-back losslessly
    val w = "zebraé😀"
    assert(UnigramLm.viterbiSegment(re, w).toSeq ==
      UnigramLm.viterbiSegment(model, w).toSeq)
    assert(UnigramLm.decodePieces(UnigramLm.viterbiSegment(re, w)) === w)
    // plain save still spells byte_fallback false
    val p0 = tmp() + "/plain.json"
    TokenizerIO.saveUnigramTokenizerJson(spark, p0,
      UnigramLm.Model(Map("a" -> -1.0), 1))
    val (re0, _) = TokenizerIO.loadUnigramTokenizerJson(spark, p0)
    assert(!re0.byteFallback)
  }

  test("SentencePiece BPE .model: pair ranks reconstruct, tokenization identical") {
    val docs = sf("sf0.001", "documents").limit(60)
    val merges = Vocab.learnBpeMerges(docs, "text", 8).map(m => (m._1, m._2))
    val path = tmp() + "/bpe.model"
    TokenizerIO.saveSentencePieceBpe(spark, path, merges)
    val (ranks, vocab, unk) = TokenizerIO.loadSentencePieceBpe(spark, path)
    assert(unk == "<unk>")
    assert(vocab == TokenizerIO.bpeVocabFromMerges(merges))
    // every learned pair is present at its priority position's rank order
    val trueRanks = merges.zipWithIndex.toMap
    trueRanks.foreach { case (pair, r) =>
      assert(ranks.contains(pair), s"missing learned pair $pair")
    }
    // rank ORDER of learned pairs is preserved (absolute values shift
    // by the alphabet prefix)
    val learnedOrdered = merges.map(ranks)
    assert(learnedOrdered == learnedOrdered.sorted)
    val a = Vocab.tokenizeBpe(docs, "text", merges, "ta")
      .select($"doc_id", $"ta").as[(Long, Seq[String])].collect().toMap
    val b = Vocab.tokenizeBpeRanked(docs, "text", ranks, "tb")
      .select($"doc_id", $"tb").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
    // loading a UNIGRAM model as BPE is rejected
    val upath = tmp() + "/uni.model"
    TokenizerIO.saveSentencePieceModel(spark, upath,
      UnigramLm.Model(Map("a" -> -1.0), 1))
    assertThrows[IllegalArgumentException] {
      TokenizerIO.loadSentencePieceBpe(spark, upath)
    }
    // and vice versa
    assertThrows[IllegalArgumentException] {
      TokenizerIO.loadSentencePieceModel(spark, path)
    }
  }

  test("SentencePiece BPE: never-learned splits are inference-unreachable (chain fixture)") {
    val merges = Seq(("a", "b"), ("b", "c"), ("ab", "c"))
    val path = tmp() + "/chain.model"
    TokenizerIO.saveSentencePieceBpe(spark, path, merges)
    val (ranks, _, _) = TokenizerIO.loadSentencePieceBpe(spark, path)
    // the reconstructed map holds the extra split (a, bc) at abc's rank
    assert(ranks.contains(("a", "bc")))
    val docs = Seq((1L, "abc xbc abcbc b c"), (2L, "ab abc abcabc"))
      .toDF("doc_id", "text")
    val a = Vocab.tokenizeBpe(docs, "text", merges, "ta")
      .select($"doc_id", $"ta").as[(Long, Seq[String])].collect().toMap
    val b = Vocab.tokenizeBpeRanked(docs, "text", ranks, "tb")
      .select($"doc_id", $"tb").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }
}

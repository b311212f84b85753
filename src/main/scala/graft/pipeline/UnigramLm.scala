package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Unigram language-model tokenizer (the SentencePiece unigram
 * algorithm, Kudo 2018): a piece vocabulary with log-probabilities,
 * trained by EM over the corpus word table, applied by per-word
 * Viterbi segmentation (maximum-likelihood split).
 *
 * This implementation is hard-EM (Viterbi counts in the E-step, the
 * SentencePiece paper's "one-best" variant): each round re-segments
 * every distinct word under the current model, re-estimates piece
 * probabilities from the weighted piece counts, and prunes the
 * lowest-count multi-char pieces toward the target vocabulary size.
 * Hard EM keeps the round a single distributed aggregate and is
 * monotone in Viterbi corpus likelihood.
 *
 * Scale shape: training never touches the corpus after the one word
 * aggregation — every EM round is a map over the (word, count) table
 * with the model BROADCAST (model size = vocabSize entries, driver
 * bounded by construction), followed by one piece-count aggregate
 * whose key cardinality is the vocabulary size. Tokenization is a
 * map-only corpus scan with a per-thread LRU (same shape as
 * [[Vocab.tokenizeBpe]]).
 */
object UnigramLm {

  /** Trained model: piece -> natural-log probability. Single
    * characters seen in training are never pruned, so any training
    * word re-segments; unseen characters at inference fall back to
    * one-char pieces at `unkScore` — or, with `byteFallback` set (the
    * SentencePiece `byte_fallback` option, the Llama-family spelling),
    * to their UTF-8 bytes as `<0xNN>` byte pieces, so NO unk-scored
    * raw piece ever reaches the output and decoding is lossless. */
  final case class Model(
      pieces: Map[String, Double],
      maxPieceLen: Int,
      unkScore: Double = -20.0,
      byteFallback: Boolean = false)

  /** The 256 byte pieces in SentencePiece spelling, `<0x00>`..`<0xFF>`. */
  val bytePieces: IndexedSeq[String] = (0 until 256).map(b => f"<0x$b%02X>")
  private val bytePieceIdx: Map[String, Int] =
    bytePieces.zipWithIndex.toMap

  /** Is `p` a byte piece (`<0xNN>` spelling)? */
  def isBytePiece(p: String): Boolean = bytePieceIdx.contains(p)

  /** Enable byte fallback on a trained model. Refuses a vocabulary
    * that already contains a literal `<0xNN>` string as a text piece —
    * the two namespaces must stay disjoint for decode to be
    * unambiguous. */
  def withByteFallback(model: Model): Model = {
    val clash = model.pieces.keysIterator.find(isBytePiece)
    require(clash.isEmpty,
      s"vocab piece '${clash.getOrElse("")}' collides with the byte-piece spelling")
    model.copy(byteFallback = true)
  }

  /** Expand every out-of-vocabulary piece of a segmentation into its
    * UTF-8 byte pieces. Unknown pieces are the DP's single-char (one
    * UTF-16 code unit) fallbacks, so an astral character arrives as a
    * surrogate PAIR of unknown pieces — re-join the pair before
    * encoding, else each half would encode as the replacement char and
    * decode would not be lossless. In-vocab pieces pass through. */
  private def expandUnknown(model: Model, segs: Array[String]): Array[String] = {
    var any = false
    var k = 0
    while (k < segs.length && !any) { any = !model.pieces.contains(segs(k)); k += 1 }
    if (!any) return segs
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < segs.length) {
      val p = segs(i)
      if (model.pieces.contains(p)) out += p
      else {
        val s =
          if (p.length == 1 && Character.isHighSurrogate(p.charAt(0)) &&
              i + 1 < segs.length && segs(i + 1).length == 1 &&
              Character.isLowSurrogate(segs(i + 1).charAt(0)) &&
              !model.pieces.contains(segs(i + 1))) {
            i += 1
            p + segs(i)
          } else p
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => out += bytePieces(b & 0xFF))
      }
      i += 1
    }
    out.toArray
  }

  /** Decode a piece sequence back to text: byte pieces contribute
    * their byte, every other piece its UTF-8 bytes; the byte stream
    * decodes as UTF-8. Inverse of tokenization under byte fallback
    * (whitespace between words is the caller's to re-insert, as with
    * every subword tokenizer here). */
  def decodePieces(pieces: Iterable[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    pieces.foreach { p =>
      bytePieceIdx.get(p) match {
        case Some(b) => bos.write(b)
        case None => bos.write(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /**
   * Viterbi segmentation of one word: the split maximizing the summed
   * piece log-probabilities. Characters absent from the vocabulary
   * segment as single-char pieces scored `unkScore` (never an error).
   * Ties prefer the longer final piece (fewer tokens); the DP is
   * deterministic for a fixed model. O(len · maxPieceLen).
   */
  def viterbiSegment(model: Model, word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)          // length of best piece ending at i
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(model.maxPieceLen, i)
      while (l <= lMax) {
        val prev = score(i - l)
        if (prev != Double.NegativeInfinity) {
          val piece = word.substring(i - l, i)
          val p = model.pieces.get(piece) match {
            case Some(lp) => lp
            case None => if (l == 1) model.unkScore else Double.NaN
          }
          if (!p.isNaN) {
            val s = prev + p
            // >= with ascending l: the LONGER piece wins exact ties
            if (s >= score(i)) { score(i) = s; back(i) = l }
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { out += word.substring(j - back(j), j); j -= back(j) }
    val segs = out.reverseIterator.toArray
    // SentencePiece semantics: byte fallback rewrites the EMITTED
    // pieces, never the DP scores — the lattice is identical either way
    if (model.byteFallback) expandUnknown(model, segs) else segs
  }

  /** Viterbi log-likelihood of one word under the model (sum of its
    * best segmentation's piece scores). */
  def viterbiScore(model: Model, word: String): Double =
    viterbiSegment(model, word).iterator
      .map(p => model.pieces.getOrElse(p, model.unkScore)).sum

  /** The corpus word table: (w, c) for every distinct whitespace
    * token, lazily checkpointed — EM re-reads it every round. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
        (t: Column) => F.length(t) > 0)).as("w"))
      .groupBy(F.col("w")).agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)

  /**
   * Train a unigram LM vocabulary of (at most) `vocabSize` pieces.
   *
   * Seeding: every substring of length <= maxPieceLen of every word,
   * weighted by word frequency; the top `seedMultiplier * vocabSize`
   * by weight, plus ALL single characters (guaranteed coverage). Each
   * EM round: Viterbi-segment the word table under the broadcast
   * model, aggregate weighted piece counts (one shuffle whose key
   * space is the vocabulary), re-estimate log-probs with +1 smoothing,
   * and prune multi-char pieces outside the top `vocabSize` by count.
   */
  def learn(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      iters: Int = 4,
      maxPieceLen: Int = 8,
      seedMultiplier: Int = 4): Model = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(iters >= 1, s"iters must be positive, got $iters")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive, got $maxPieceLen")
    val session = docs.sparkSession
    import session.implicits._
    val words = wordTable(docs, textCol)

    // ---- seed: substring counts, top-N + all single chars ----
    val subU = F.udf((w: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          out += w.substring(i, i + l); l += 1
        }
        i += 1
      }
      out.toArray
    })
    val subCounts = words
      .select(F.explode(subU(F.col("w"))).as("p"), F.col("c"))
      .groupBy(F.col("p")).agg(F.sum(F.col("c")).as("n"))
      .localCheckpoint(eager = false)
    val chars = subCounts.filter(F.length(F.col("p")) === 1)
      .as[(String, Long)].collect()
    val multi = subCounts.filter(F.length(F.col("p")) > 1)
      .orderBy(F.col("n").desc, F.col("p"))
      .limit(math.max(0, seedMultiplier.toLong * vocabSize - chars.length)
        .min(Int.MaxValue).toInt)
      .as[(String, Long)].collect()
    var counts: Map[String, Long] = (chars ++ multi).toMap

    def toModel(cs: Map[String, Long]): Model = {
      val total = cs.values.map(_.toDouble).sum + cs.size   // +1 smoothing
      Model(cs.map { case (p, n) => p -> math.log((n + 1.0) / total) }, maxPieceLen)
    }

    // ---- EM rounds: segment word table, re-count, re-estimate, prune ----
    var model = toModel(counts)
    val charSet = chars.map(_._1).toSet
    var it = 0
    while (it < iters) {
      val bc = session.sparkContext.broadcast(model)
      val segU = F.udf((w: String, c: Long) =>
        viterbiSegment(bc.value, w).map(p => (p, c)))
      val pieceCounts = words
        .select(F.explode(segU(F.col("w"), F.col("c"))).as("pc"))
        .groupBy(F.col("pc._1").as("p")).agg(F.sum(F.col("pc._2")).as("n"))
        .as[(String, Long)].collect().toMap
      // single chars survive at count >= 0 (coverage); multi-char pieces
      // compete for the remaining slots by (count DESC, piece)
      val keepMulti = pieceCounts.iterator
        .filter { case (p, _) => p.length > 1 }
        .toSeq.sortBy { case (p, n) => (-n, p) }
        .take(math.max(0, vocabSize - charSet.size))
      counts = charSet.iterator.map(c => c -> pieceCounts.getOrElse(c, 0L)).toMap ++
        keepMulti
      model = toModel(counts)
      it += 1
    }
    model
  }

  // ---------------------------------------------------------------- //
  // Soft EM (forward-backward expected counts)                        //
  // ---------------------------------------------------------------- //

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** The edge score of piece word[i-l, i): vocab log-prob, `unkScore`
    * for unknown single chars, NaN (no edge) otherwise — exactly the
    * [[viterbiSegment]] lattice. */
  private def edgeScore(model: Model, word: String, i: Int, l: Int): Double = {
    val piece = word.substring(i - l, i)
    model.pieces.get(piece) match {
      case Some(lp) => lp
      case None => if (l == 1) model.unkScore else Double.NaN
    }
  }

  /**
   * Forward-backward expected piece counts for one word — the soft-EM
   * E-step (real SentencePiece semantics, vs [[learn]]'s one-best
   * Viterbi counts): every lattice edge's posterior under the FULL
   * segmentation distribution,
   *
   *   E[piece at (i-l, i)] = exp(α(i-l) + lp + β(i) − α(n)),
   *
   * summed per piece. Also returns the word's MARGINAL log-likelihood
   * α(n) (the logsumexp over all segmentations — the quantity EM
   * provably increases). Unknown single chars participate at
   * `unkScore` like the Viterbi DP, so every word carries mass; their
   * expected counts are returned too (the caller's M-step decides
   * what survives, as in the hard path). O(len · maxPieceLen).
   */
  def expectedCounts(
      model: Model, word: String): (Array[(String, Double)], Double) = {
    val n = word.length
    if (n == 0) return (Array.empty, 0.0)
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(model.maxPieceLen, i)
      while (l <= lMax) {
        val p = edgeScore(model, word, i, l)
        if (!p.isNaN && alpha(i - l) != Double.NegativeInfinity)
          alpha(i) = logAdd(alpha(i), alpha(i - l) + p)
        l += 1
      }
      i += 1
    }
    beta(n) = 0.0
    var j = n - 1
    while (j >= 0) {
      var l = 1
      val lMax = math.min(model.maxPieceLen, n - j)
      while (l <= lMax) {
        val p = edgeScore(model, word, j + l, l)
        if (!p.isNaN && beta(j + l) != Double.NegativeInfinity)
          beta(j) = logAdd(beta(j), p + beta(j + l))
        l += 1
      }
      j -= 1
    }
    val total = alpha(n)
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(model.maxPieceLen, i)
      while (l <= lMax) {
        val p = edgeScore(model, word, i, l)
        if (!p.isNaN && alpha(i - l) != Double.NegativeInfinity &&
            beta(i) != Double.NegativeInfinity) {
          val post = math.exp(alpha(i - l) + p + beta(i) - total)
          if (post > 0.0) {
            val piece = word.substring(i - l, i)
            acc.update(piece, acc.getOrElse(piece, 0.0) + post)
          }
        }
        l += 1
      }
      i += 1
    }
    (acc.toArray, total)
  }

  /** Marginal log-likelihood of one word: logsumexp over ALL
    * segmentations (α(n) — always >= [[viterbiScore]]). */
  def marginalScore(model: Model, word: String): Double =
    expectedCounts(model, word)._2

  /** Corpus MARGINAL log-likelihood per word occurrence — the soft-EM
    * progress metric ([[corpusLogLikelihood]]'s all-paths sibling). */
  def corpusMarginalLogLikelihood(
      docs: DataFrame, textCol: String, model: Model): Double =
    marginalOf(wordTable(docs, textCol), model)

  private def marginalOf(words: DataFrame, model: Model): Double = {
    val bc = words.sparkSession.sparkContext.broadcast(model)
    val llU = F.udf((w: String) => expectedCounts(bc.value, w)._2)
    words.agg((F.sum(llU(F.col("w")) * F.col("c")) / F.sum(F.col("c"))).as("ll"))
      .head().getDouble(0)
  }

  /** One distributed E-step: corpus expected piece counts (weighted by
    * word frequency). One map over the word table with the model
    * broadcast + one aggregate keyed by the (bounded) vocabulary —
    * the [[learn]] round's shape with posteriors instead of Viterbi
    * counts. */
  private def softCounts(
      words: DataFrame, model: Model): Map[String, Double] = {
    val session = words.sparkSession
    import session.implicits._
    val bc = session.sparkContext.broadcast(model)
    val ecU = F.udf((w: String, c: Long) =>
      expectedCounts(bc.value, w)._1.map { case (p, e) => (p, e * c) })
    words
      .select(F.explode(ecU(F.col("w"), F.col("c"))).as("pc"))
      .groupBy(F.col("pc._1").as("p")).agg(F.sum(F.col("pc._2")).as("n"))
      .as[(String, Double)].collect().toMap
  }

  /** Pure-ML M-step over expected counts (no smoothing — smoothing
    * would break the EM monotonicity theorem the gate pins). Zero
    * counts floor at 1e-12 so a piece never reaches log(0). The
    * FIXED parameters (`unkScore`, `byteFallback`, `maxPieceLen`)
    * carry over from the prior model — resetting unkScore would
    * re-score unknown-char lattice edges mid-EM and break the
    * monotonicity bound; dropping byteFallback would break decode
    * losslessness. */
  private def toModelSoft(cs: Map[String, Double], template: Model): Model = {
    val floored = cs.map { case (p, c) => p -> math.max(c, 1e-12) }
    val total = floored.values.sum
    template.copy(
      pieces = floored.map { case (p, c) => p -> math.log(c / total) })
  }

  /**
   * `rounds` soft-EM rounds at a FIXED vocabulary — the monotonicity
   * witness: returns the final model and the corpus marginal
   * log-likelihood of model 0, 1, ..., rounds (rounds+1 values, the
   * EM theorem guarantees non-decreasing because each round is a pure
   * ML M-step over exact expected counts with no pruning and no
   * smoothing). Two passes per round (counts, likelihood) + one final
   * likelihood pass.
   */
  def softEmLikelihoods(
      docs: DataFrame,
      textCol: String,
      model0: Model,
      rounds: Int): (Model, Seq[Double]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = wordTable(docs, textCol)
    var model = model0
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var r = 0
    while (r < rounds) {
      lls += marginalOf(words, model)
      // FIXED vocabulary: drop unknown-char posteriors before the ML
      // renormalization — they are not free parameters (unkScore is
      // held fixed), and folding their mass into the vocab simplex
      // would both grow the vocabulary and break the constrained-ML
      // argument behind monotonicity
      val raw = softCounts(words, model)
      val ec = model0.pieces.keysIterator
        .map(p => p -> raw.getOrElse(p, 0.0)).toMap
      model = toModelSoft(ec, model)
      r += 1
    }
    lls += marginalOf(words, model)
    (model, lls.toSeq)
  }

  /**
   * Soft-EM unigram training — [[learn]] with forward-backward
   * expected counts in the E-step (the real SentencePiece trainer
   * semantics; hard EM converges to different vocabularies on
   * ambiguous corpora because one-best counting starves every
   * runner-up split). Seeding and the prune-toward-budget loop are
   * [[learn]]'s; each round re-estimates by pure ML over posteriors
   * and prunes multi-char pieces outside the top `vocabSize` by
   * EXPECTED count. Single chars survive (coverage). Keep [[learn]]
   * as the fast path — hard EM is one aggregate per round where this
   * is two, and its one-best counts are sparser to shuffle.
   */
  def learnSoft(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      iters: Int = 4,
      maxPieceLen: Int = 8,
      seedMultiplier: Int = 4): Model = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(iters >= 1, s"iters must be positive, got $iters")
    val session = docs.sparkSession
    import session.implicits._
    val words = wordTable(docs, textCol)
    val subU = F.udf((w: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          out += w.substring(i, i + l); l += 1
        }
        i += 1
      }
      out.toArray
    })
    val subCounts = words
      .select(F.explode(subU(F.col("w"))).as("p"), F.col("c"))
      .groupBy(F.col("p")).agg(F.sum(F.col("c")).as("n"))
      .localCheckpoint(eager = false)
    val chars = subCounts.filter(F.length(F.col("p")) === 1)
      .as[(String, Long)].collect()
    val multi = subCounts.filter(F.length(F.col("p")) > 1)
      .orderBy(F.col("n").desc, F.col("p"))
      .limit(math.max(0, seedMultiplier.toLong * vocabSize - chars.length)
        .min(Int.MaxValue).toInt)
      .as[(String, Long)].collect()
    val charSet = chars.map(_._1).toSet
    var model = toModelSoft(
      (chars ++ multi).map { case (p, n) => p -> n.toDouble }.toMap,
      Model(Map.empty, maxPieceLen))
    var it = 0
    while (it < iters) {
      val ec = softCounts(words, model)
      val keepMulti = ec.iterator
        .filter { case (p, _) => p.length > 1 }
        .toSeq.sortBy { case (p, n) => (-n, p) }
        .take(math.max(0, vocabSize - charSet.size))
      val counts = charSet.iterator
        .map(c => c -> ec.getOrElse(c, 0.0)).toMap ++ keepMulti
      model = toModelSoft(counts, model)
      it += 1
    }
    model
  }

  /** Viterbi score of the STRING `p` with the edge for piece `p`
    * itself disabled — the best way to spell p without p. Sub-edges
    * (proper substrings) and unknown single chars participate as in
    * the normal lattice, so an alternative always exists. */
  private[pipeline] def altSegmentationScore(model: Model, p: String): Double = {
    val n = p.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(model.maxPieceLen, i)
      while (l <= lMax) {
        if (!(l == n && i == n)) { // the self edge is the one we price
          val s = edgeScore(model, p, i, l)
          if (!s.isNaN && dp(i - l) != Double.NegativeInfinity)
            dp(i) = math.max(dp(i), dp(i - l) + s)
        }
        l += 1
      }
      i += 1
    }
    dp(n)
  }

  /**
   * Likelihood-loss vocabulary pruning — the real SentencePiece prune
   * step ([[learnSoft]] prunes by expected COUNT, which keeps
   * frequent-but-perfectly-decomposable pieces; the trainer's
   * criterion is what the likelihood LOSES when a piece disappears):
   *
   *   loss(p) = E[count(p)] * (logP(p) − altScore(p)),
   *
   * where altScore is the best segmentation of p's own string WITHOUT
   * the p edge ([[altSegmentationScore]] — the Viterbi approximation
   * of the re-segmentation cost). A frequent piece whose parts are
   * themselves probable has a SMALL loss (its occurrences re-spell
   * cheaply) and prunes before a rarer piece whose only alternative
   * runs through unknown-char edges.
   *
   * Each round drops the lowest-loss multi-char pieces down to
   * max(target, floor(shrinkFactor * current)) — the staged shrink of
   * the reference trainer, so the loss ranking is re-estimated as the
   * vocabulary changes — then re-normalizes by ML over the survivors'
   * expected counts and runs `emRoundsPerPrune` soft-EM refresh
   * rounds. Single-character pieces always survive (coverage: every
   * word stays spellable without unk edges). Fixed parameters
   * (unkScore, byteFallback, maxPieceLen) carry through `copy`.
   *
   * Scale shape: the E-step is the distributed [[softCounts]] pass;
   * the loss ranking is driver-side over the BOUNDED vocabulary
   * (each alt-segmentation DP is O(len·maxPieceLen) on a short piece
   * string — the same bounded-vocab argument as the M-step itself).
   */
  def pruneVocab(
      docs: DataFrame,
      textCol: String,
      model0: Model,
      targetVocab: Int,
      shrinkFactor: Double = 0.75,
      emRoundsPerPrune: Int = 1): Model = {
    require(targetVocab >= 1, s"targetVocab must be >= 1, got $targetVocab")
    require(shrinkFactor > 0.0 && shrinkFactor < 1.0,
      s"shrinkFactor must be in (0,1), got $shrinkFactor")
    val words = wordTable(docs, textCol)
    var model = model0
    var done = false
    while (model.pieces.size > targetVocab && !done) {
      val ec = softCounts(words, model)
      val (chars, multi) = model.pieces.keysIterator.toSeq
        .partition(_.length == 1)
      if (multi.isEmpty) done = true // chars alone exceed the target:
                                     // coverage wins, stop shrinking
      else {
        val targetMulti = math.max(0, targetVocab - chars.size)
        // floor guarantees strict progress for any shrinkFactor < 1
        val keepCount = math.max(targetMulti,
          math.floor(shrinkFactor * multi.size).toInt)
        val kept =
          if (multi.size <= keepCount) multi
          else multi
            .map { p =>
              val lp = model.pieces(p)
              val loss = ec.getOrElse(p, 0.0) *
                (lp - altSegmentationScore(model, p))
              (p, loss)
            }
            // highest loss = most load-bearing; ties by piece for
            // determinism
            .sortBy { case (p, loss) => (-loss, p) }
            .take(keepCount).map(_._1)
        if (kept.size == multi.size) done = true // cannot shrink further
        val counts = (chars ++ kept).iterator
          .map(p => p -> ec.getOrElse(p, 0.0)).toMap
        model = toModelSoft(counts, model)
        var r = 0
        while (r < emRoundsPerPrune) {
          val refresh0 = softCounts(words, model)
          val refresh = model.pieces.keysIterator
            .map(p => p -> refresh0.getOrElse(p, 0.0)).toMap
          model = toModelSoft(refresh, model)
          r += 1
        }
      }
    }
    model
  }

  /**
   * Map-only corpus tokenization: `outCol` = the concatenation of each
   * whitespace word's Viterbi segmentation. Broadcast model,
   * per-thread LRU memo (repeated words amortize to O(1) via Zipf —
   * same cache discipline as [[Vocab.tokenizeBpe]]: tasks share the
   * executor JVM, so the LRU is per thread). NULL text -> NULL.
   */
  def tokenize(
      docs: DataFrame,
      textCol: String,
      model: Model,
      outCol: String = "tokens"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sep = java.util.regex.Pattern.compile("\\s+")
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
          sep.split(t).iterator.filter(_.nonEmpty).flatMap { w =>
            var seg = m.get(w)
            if (seg == null) {
              seg = viterbiSegment(bc.value, w)
              m.put(w, seg)
            }
            seg
          }.toArray
        }
    })
    docs.withColumn(outCol, tokU(F.col(textCol)))
  }

  /**
   * The `n` best segmentations of one word with their summed piece
   * log-likelihoods, best first — the lattice n-best DP behind
   * subword-regularization sampling (Kudo 2018 §3). Per position the
   * DP keeps the n best (score, last-piece, predecessor-rank)
   * hypotheses; tie order matches [[viterbiSegment]]'s longer-piece
   * preference, so element 0 scores exactly `viterbiScore`. Unknown
   * characters fall back to single-char `unkScore` pieces like the
   * 1-best path. O(len · maxPieceLen · n log n).
   */
  def nbestSegmentations(
      model: Model, word: String, n: Int): Array[(Array[String], Double)] = {
    require(n >= 1, s"n must be >= 1, got $n")
    val len = word.length
    if (len == 0) return Array((Array.empty[String], 0.0))
    // hyps(i): up to n (score, lastPieceLen, prevRank), best first
    val hyps = new Array[Array[(Double, Int, Int)]](len + 1)
    hyps(0) = Array((0.0, 0, -1))
    var i = 1
    while (i <= len) {
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int)]
      var l = 1
      val lMax = math.min(model.maxPieceLen, i)
      while (l <= lMax) {
        val piece = word.substring(i - l, i)
        val p = model.pieces.get(piece) match {
          case Some(lp) => lp
          case None => if (l == 1) model.unkScore else Double.NaN
        }
        if (!p.isNaN) {
          val prev = hyps(i - l)
          var r = 0
          while (r < prev.length) { cand += ((prev(r)._1 + p, l, r)); r += 1 }
        }
        l += 1
      }
      hyps(i) = cand.sortBy { case (s, pl, pr) => (-s, -pl, pr) }
        .take(n).toArray
      i += 1
    }
    hyps(len).map { top =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var at = len
      var cur = top
      while (at > 0) {
        val l = cur._2
        pieces += word.substring(at - l, at)
        at -= l
        if (at > 0) cur = hyps(at)(cur._3)
      }
      val segs = pieces.reverseIterator.toArray
      (if (model.byteFallback) expandUnknown(model, segs) else segs, top._1)
    }
  }

  /** Sample one segmentation from the n-best list with probability
    * ∝ exp(alpha · logP) (P^α re-normalized over the list — the
    * paper's l-best approximation of the α-scaled posterior):
    * `alpha = 0` is uniform over the list, large alpha degenerates to
    * Viterbi. `u` ∈ [0, 1) is the CALLER's uniform draw, so the choice
    * is replayable from the seed rule alone. */
  def sampleSegment(
      model: Model,
      word: String,
      alpha: Double,
      nBest: Int,
      u: Double): Array[String] =
    sampleFrom(nbestSegmentations(model, word, nBest), alpha, u)

  private def sampleFrom(
      cands: Array[(Array[String], Double)],
      alpha: Double,
      u: Double): Array[String] = {
    if (cands.length == 1) return cands(0)._1
    val best = cands(0)._2
    val w = cands.map { case (_, ll) => math.exp(alpha * (ll - best)) }
    val total = w.sum
    val target = u * total
    var acc = 0.0
    var k = 0
    while (k < cands.length - 1 && acc + w(k) <= target) { acc += w(k); k += 1 }
    cands(k)._1
  }

  /** The deterministic per-(doc, word-position) uniform draw — the
    * tokenization sibling of the md5 sampling rules: replaying the
    * same (seed, id, pos) always redraws the same u, so a sampled
    * corpus is reproducible from the seed alone. */
  private[pipeline] def positionUniform(seed: Long, id: Long, pos: Int): Double = {
    val h = TextFunctions.mix64(
      seed ^ TextFunctions.mix64(id * 0x9E3779B97F4A7C15L + pos))
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  /**
   * Subword-regularization tokenization ([[tokenize]]'s sampled
   * sibling, Kudo 2018): each whitespace word draws a segmentation
   * from its n-best list under the α-scaled distribution instead of
   * always emitting the argmax — the training-time augmentation that
   * exposes a model to alternative subword splits. The draw is seeded
   * DETERMINISTICALLY per (document id, word position), so re-running
   * the pipeline reproduces the same corpus (no RNG state, no
   * shuffle-order sensitivity) while distinct positions of the same
   * word still sample independently.
   *
   * Map-only corpus scan: broadcast model, per-thread LRU memoizing
   * each word's N-BEST LIST (position-independent — only the draw
   * varies by position). NULL text -> NULL.
   */
  def tokenizeSampled(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      alpha: Double = 0.2,
      nBest: Int = 8,
      seed: Long = 0L,
      outCol: String = "tokens"): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    require(nBest >= 1, s"nBest must be >= 1, got $nBest")
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val tokU = F.udf(new Function2[java.lang.Long, String, Array[String]]
        with Serializable {
      @transient private lazy val memo = ThreadLocal.withInitial(
        new java.util.function.Supplier[
            java.util.LinkedHashMap[String, Array[(Array[String], Double)]]] {
          def get() =
            new java.util.LinkedHashMap[String, Array[(Array[String], Double)]](
                1 << 12, 0.75f, true) {
              override def removeEldestEntry(
                  e: java.util.Map.Entry[String, Array[(Array[String], Double)]])
                  : Boolean = size() > 65536
            }
        })
      def apply(id: java.lang.Long, t: String): Array[String] =
        if (t == null || id == null) null
        else {
          val m = memo.get()
          var pos = 0
          sep.split(t).iterator.filter(_.nonEmpty).flatMap { w =>
            var nb = m.get(w)
            if (nb == null) {
              nb = nbestSegmentations(bc.value, w, nBest)
              m.put(w, nb)
            }
            val out = sampleFrom(nb, alpha,
              positionUniform(seed, id.longValue(), pos))
            pos += 1
            out
          }.toArray
        }
    })
    docs.withColumn(outCol, tokU(F.col(idCol).cast("long"), F.col(textCol)))
  }

  /** Corpus Viterbi log-likelihood per word occurrence under `model` —
    * the EM progress metric (one map over the word table + a scalar
    * aggregate; higher is better). */
  def corpusLogLikelihood(docs: DataFrame, textCol: String, model: Model): Double = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val llU = F.udf((w: String) => viterbiScore(bc.value, w))
    val row = wordTable(docs, textCol)
      .agg((F.sum(llU(F.col("w")) * F.col("c")) / F.sum(F.col("c"))).as("ll"))
      .head()
    row.getDouble(0)
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("viterbiSegment picks the maximum-likelihood split, longer piece on ties") {
    val m = UnigramLm.Model(
      Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -3.0), maxPieceLen = 8)
    // "ab"+"c" = -4 beats "a"+"b"+"c" = -7
    assert(UnigramLm.viterbiSegment(m, "abc").toSeq == Seq("ab", "c"))
    assert(UnigramLm.viterbiSegment(m, "").isEmpty)
    // exact tie: {"xy": -4} vs {"x","y"}: -2 + -2 — longer piece wins
    val t = UnigramLm.Model(
      Map("xy" -> -4.0, "x" -> -2.0, "y" -> -2.0), maxPieceLen = 8)
    assert(UnigramLm.viterbiSegment(t, "xy").toSeq == Seq("xy"))
  }

  test("unseen characters fall back to single-char unk pieces, never error") {
    val m = UnigramLm.Model(Map("a" -> -1.0), maxPieceLen = 4)
    assert(UnigramLm.viterbiSegment(m, "aZa").toSeq == Seq("a", "Z", "a"))
    assert(UnigramLm.viterbiScore(m, "Z") == m.unkScore)
  }

  test("EM learns planted morphemes and likelihood does not degrade") {
    val rnd = new scala.util.Random(11)
    val stems = Vector("play", "work", "jump", "walk", "read", "sing")
    val sufs = Vector("ing", "ed", "er", "est", "ly", "s")
    val docs = Seq.tabulate(300) { i =>
      val ws = Seq.fill(8)(stems(rnd.nextInt(stems.size)) + sufs(rnd.nextInt(sufs.size)))
      (i.toLong, ws.mkString(" "))
    }.toDF("id", "text")
    // vocab too small for the 36 whole words (chars + 14 slots): the ML
    // solution is the 11 productive morphemes, not memorized words
    val nChars = docs.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).distinct.length
    val m0 = UnigramLm.learn(docs, "text", vocabSize = nChars + 14, iters = 1)
    val m = UnigramLm.learn(docs, "text", vocabSize = nChars + 14, iters = 4)
    val ll0 = UnigramLm.corpusLogLikelihood(docs, "text", m0)
    val ll = UnigramLm.corpusLogLikelihood(docs, "text", m)
    assert(ll >= ll0 - 1e-9, s"likelihood degraded: $ll0 -> $ll")
    // the productive morphemes should be vocabulary pieces
    assert(stems.count(m.pieces.contains) >= 3, m.pieces.keys.toSeq.sorted.toString)
    assert(sufs.filter(_.length > 1).count(m.pieces.contains) >= 2)
    // and a held-out composition segments into few pieces
    assert(UnigramLm.viterbiSegment(m, "working").length <= 3)
  }

  test("byte fallback: uncovered chars become <0xNN> pieces, decode is lossless") {
    val m = UnigramLm.withByteFallback(
      UnigramLm.Model(Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0), maxPieceLen = 8))
    // covered text: segmentation identical to the plain model
    assert(UnigramLm.viterbiSegment(m, "ab").toSeq == Seq("ab"))
    // 1-byte unknown: one byte piece
    assert(UnigramLm.viterbiSegment(m, "aZ").toSeq == Seq("a", "<0x5A>"))
    // multi-byte unknown: é = 0xC3 0xA9
    assert(UnigramLm.viterbiSegment(m, "é").toSeq == Seq("<0xC3>", "<0xA9>"))
    // astral char (surrogate pair): 😀 U+1F600 = F0 9F 98 80 — the pair
    // must re-join before encoding or decode would not round-trip
    assert(UnigramLm.viterbiSegment(m, "a😀b").toSeq ==
      Seq("a", "<0xF0>", "<0x9F>", "<0x98>", "<0x80>", "b"))
    // decode inverts every case, including mixed text+byte pieces
    Seq("ab", "aZ", "é", "a😀b", "ZéZ").foreach { w =>
      assert(UnigramLm.decodePieces(UnigramLm.viterbiSegment(m, w)) === w, w)
    }
    // no emitted piece is ever outside vocab ∪ byte pieces
    val segs = UnigramLm.viterbiSegment(m, "xy€zq")
    assert(segs.forall(p => m.pieces.contains(p) || UnigramLm.isBytePiece(p)))
    // nbest candidates expand identically (head == viterbi)
    val nb = UnigramLm.nbestSegmentations(m, "aé", 3)
    assert(nb.head._1.toSeq == UnigramLm.viterbiSegment(m, "aé").toSeq)
    // namespace guard: a literal <0xNN> text piece is refused
    val bad = UnigramLm.Model(Map("<0x41>" -> -1.0, "a" -> -2.0), maxPieceLen = 8)
    intercept[IllegalArgumentException] { UnigramLm.withByteFallback(bad) }
  }

  test("tokenize concatenates per-word Viterbi splits; NULL passes through") {
    val docs = Seq((1L, "aa ab"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val m = UnigramLm.Model(
      Map("aa" -> -1.0, "ab" -> -1.5, "a" -> -2.0, "b" -> -2.0), maxPieceLen = 2)
    val out = UnigramLm.tokenize(docs, "text", m)
      .orderBy("id").select("tokens").as[Seq[String]].collect()
    assert(out(0) == Seq("aa", "ab"))
    assert(out(1) == null)
  }

  test("tokenization round-trips: pieces concatenate to the original words") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"alpha$i beta gamma${i % 7}"))
      .toDF("id", "text")
    val m = UnigramLm.learn(docs, "text", vocabSize = 60, iters = 2)
    val bad = UnigramLm.tokenize(docs, "text", m)
      .select(F.col("text"),
        F.array_join(F.col("tokens"), "").as("joined"),
        F.array_join(F.filter(F.split(F.col("text"), "\\s+"),
          (x: org.apache.spark.sql.Column) => F.length(x) > 0), "").as("norm"))
      .filter(F.col("joined") =!= F.col("norm"))
      .count()
    assert(bad === 0L)
  }

  test("nbestSegmentations: exhaustive order, head == Viterbi score") {
    val m = UnigramLm.Model(
      Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "bc" -> -4.0),
      maxPieceLen = 8)
    val nb = UnigramLm.nbestSegmentations(m, "abc", 10)
    // all 3 reachable splits, best first: ab+c=-4, a+bc=-6, a+b+c=-7.5
    assert(nb.map(_._1.toSeq).toSeq ===
      Seq(Seq("ab", "c"), Seq("a", "bc"), Seq("a", "b", "c")))
    assert(nb.map(_._2).toSeq === Seq(-4.0, -6.0, -7.5))
    assert(nb(0)._2 === UnigramLm.viterbiScore(m, "abc"))
    // n caps the list; scores stay descending
    assert(UnigramLm.nbestSegmentations(m, "abc", 2).length === 2)
    val big = UnigramLm.nbestSegmentations(m, "ababab", 8)
    assert(big.map(_._2).toSeq === big.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    assert(big.forall(_._1.mkString("") == "ababab")) // every path reconstructs
    // empty word and n=1 degenerate cases
    assert(UnigramLm.nbestSegmentations(m, "", 3).head._1.isEmpty)
    assert(UnigramLm.nbestSegmentations(m, "abc", 1).head._1.toSeq === Seq("ab", "c"))
  }

  test("sampleSegment: u sweeps the alpha-scaled CDF; large alpha == Viterbi") {
    val m = UnigramLm.Model(
      Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "bc" -> -4.0),
      maxPieceLen = 8)
    // alpha = 0: uniform over the 3 candidates — thirds of u pick each
    assert(UnigramLm.sampleSegment(m, "abc", 0.0, 8, 0.0).toSeq === Seq("ab", "c"))
    assert(UnigramLm.sampleSegment(m, "abc", 0.0, 8, 0.5).toSeq === Seq("a", "bc"))
    assert(UnigramLm.sampleSegment(m, "abc", 0.0, 8, 0.99).toSeq === Seq("a", "b", "c"))
    // alpha = 1: weights exp(0), exp(-2), exp(-3.5) -> P(best) ~ 0.858,
    // P(2nd) ~ 0.116: u = 0.5 stays on the argmax, u = 0.9 crosses into
    // the second candidate
    assert(UnigramLm.sampleSegment(m, "abc", 1.0, 8, 0.5).toSeq === Seq("ab", "c"))
    assert(UnigramLm.sampleSegment(m, "abc", 1.0, 8, 0.9).toSeq === Seq("a", "bc"))
    // alpha huge: any u picks the argmax
    for (u <- Seq(0.0, 0.3, 0.7, 0.999))
      assert(UnigramLm.sampleSegment(m, "abc", 1e6, 8, u).toSeq === Seq("ab", "c"))
  }

  test("tokenizeSampled: deterministic per seed, reconstructs, shifts off Viterbi") {
    val rnd = new scala.util.Random(7)
    val stems = Vector("play", "work", "jump", "walk")
    val sufs = Vector("ing", "ed", "er", "s")
    val docs = Seq.tabulate(120) { i =>
      val ws = Seq.fill(6)(stems(rnd.nextInt(stems.size)) + sufs(rnd.nextInt(sufs.size)))
      (i.toLong, ws.mkString(" "))
    }.toDF("id", "text")
    val nChars = docs.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).distinct.length
    val m = UnigramLm.learn(docs, "text", vocabSize = nChars + 8, iters = 3)

    def run(seed: Long, alpha: Double) = UnigramLm.tokenizeSampled(
        docs, "id", "text", m, alpha = alpha, nBest = 8, seed = seed)
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    val a = run(7L, 0.2)
    assert(a === run(7L, 0.2))                    // replay-identical
    assert(a !== run(8L, 0.2))                    // seed moves the draws
    // every sampled doc still reconstructs its words
    val texts = docs.orderBy("id").as[(Long, String)].collect()
    a.zip(texts).foreach { case (toks, (_, t)) =>
      assert(toks.mkString("") === t.replace(" ", ""))
      val nWords = t.split("\\s+").count(_.nonEmpty)
      assert(toks.length >= nWords && toks.length <= t.replace(" ", "").length)
    }
    // distribution shift: sampling at small alpha leaves the argmax
    // for a real fraction of docs; the Viterbi path stays available
    val vit = UnigramLm.tokenize(docs, "text", m)
      .orderBy("id").select("tokens").as[Seq[String]].collect().toSeq
    val changed = a.zip(vit).count { case (x, y) => x != y }
    assert(changed > 0, "alpha=0.2 sampling never left the argmax")
    // same positions of the same word can differ ACROSS docs (the
    // position-seeded rule), pinned by there existing two docs with
    // equal viterbi output but different samples
    assert(a !== vit)
  }

  test("expectedCounts: hand lattice posteriors exact; marginal >= Viterbi") {
    val m = UnigramLm.Model(
      Map("ab" -> math.log(0.5), "a" -> math.log(0.3), "b" -> math.log(0.2)),
      maxPieceLen = 8)
    // word "ab": paths [ab] (0.5) and [a,b] (0.06); Z = 0.56
    val (ec, ll) = UnigramLm.expectedCounts(m, "ab")
    val e = ec.toMap
    assert(math.abs(ll - math.log(0.56)) < 1e-12)
    assert(math.abs(e("ab") - 0.5 / 0.56) < 1e-12)
    assert(math.abs(e("a") - 0.06 / 0.56) < 1e-12)
    assert(math.abs(e("b") - 0.06 / 0.56) < 1e-12)
    // expected counts at each boundary sum to the crossing posterior:
    // total pieces = 1*P([ab]) + 2*P([a,b])
    assert(math.abs(ec.map(_._2).sum - (0.5 + 2 * 0.06) / 0.56) < 1e-12)
    // marginal dominates the one-best score, strictly when ambiguous
    assert(ll > UnigramLm.viterbiScore(m, "ab"))
    assert(UnigramLm.marginalScore(m, "ab") == ll)
    // unknown chars participate at unkScore, like the Viterbi lattice
    val (ecZ, llZ) = UnigramLm.expectedCounts(m, "Z")
    assert(llZ == m.unkScore && ecZ.toMap.apply("Z") == 1.0)
  }

  test("soft EM: marginal likelihood monotone non-decreasing at fixed vocab") {
    val rnd = new scala.util.Random(13)
    val stems = Vector("play", "work", "jump", "walk")
    val sufs = Vector("ing", "ed", "er", "s")
    val docs = Seq.tabulate(150) { i =>
      val ws = Seq.fill(6)(stems(rnd.nextInt(stems.size)) + sufs(rnd.nextInt(sufs.size)))
      (i.toLong, ws.mkString(" "))
    }.toDF("id", "text")
    val m0 = UnigramLm.learn(docs, "text", vocabSize = 40, iters = 1)
    val (m, lls) = UnigramLm.softEmLikelihoods(docs, "text", m0, rounds = 3)
    assert(lls.length == 4)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"marginal LL degraded: $lls")
    }
    // the final model keeps exactly the fixed vocabulary
    assert(m.pieces.keySet == m0.pieces.keySet)
  }

  test("learnSoft: reconstructs, budget, finds planted morphemes") {
    val rnd = new scala.util.Random(17)
    val stems = Vector("play", "work", "jump", "walk", "read", "sing")
    val sufs = Vector("ing", "ed", "er", "est", "ly", "s")
    val docs = Seq.tabulate(300) { i =>
      val ws = Seq.fill(8)(stems(rnd.nextInt(stems.size)) + sufs(rnd.nextInt(sufs.size)))
      (i.toLong, ws.mkString(" "))
    }.toDF("id", "text")
    val nChars = docs.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).distinct.length
    val m = UnigramLm.learnSoft(docs, "text", vocabSize = nChars + 14, iters = 4)
    assert(m.pieces.size <= nChars + 14)
    // every word re-segments and reconstructs
    val bad = docs.as[(Long, String)].collect().flatMap(_._2.split("\\s+"))
      .distinct.filterNot { w =>
        UnigramLm.viterbiSegment(m, w).mkString("") == w
      }
    assert(bad.isEmpty, s"words fail to reconstruct: ${bad.take(3).toSeq}")
    // soft posteriors find the productive morphemes too
    assert(stems.count(m.pieces.contains) >= 3, m.pieces.keys.toSeq.sorted.toString)
    assert(sufs.filter(_.length > 1).count(m.pieces.contains) >= 2)
  }

  test("altSegmentationScore: best spelling of a piece WITHOUT its own edge") {
    val m = UnigramLm.Model(Map(
      "ab" -> math.log(0.3), "cd" -> math.log(0.3), "abcd" -> math.log(0.1),
      "a" -> math.log(0.1), "b" -> math.log(0.1),
      "c" -> math.log(0.05), "d" -> math.log(0.05)), maxPieceLen = 4)
    val alt = UnigramLm.altSegmentationScore(m, "abcd")
    // best non-self spelling is ab + cd
    assert(math.abs(alt - (math.log(0.3) + math.log(0.3))) < 1e-12)
    // a piece with no in-vocab parts re-spells through unk single chars
    val m2 = UnigramLm.Model(Map("qz" -> math.log(0.5),
      "x" -> math.log(0.5)), maxPieceLen = 4)
    val alt2 = UnigramLm.altSegmentationScore(m2, "qz")
    assert(math.abs(alt2 - 2 * m2.unkScore) < 1e-9)
  }

  test("pruneVocab: loss keeps the irreplaceable piece over the frequent one") {
    import spark.implicits._
    // "xy" is frequent but its chars are common elsewhere (cheap to
    // re-spell); "qz" is rarer but q/z appear ONLY inside it, so its
    // alternative runs through near-unk char probabilities
    val docs = (Seq.fill(60)("xy") ++ Seq.fill(25)("qz") ++
      Seq.fill(40)("x y x y")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m0 = UnigramLm.learnSoft(docs, "text", vocabSize = 8,
      iters = 3, maxPieceLen = 2)
    assert(m0.pieces.contains("xy") && m0.pieces.contains("qz"))
    val chars = m0.pieces.keys.count(_.length == 1)
    // force the multi-char budget down to ONE slot
    val pruned = UnigramLm.pruneVocab(docs, "text", m0,
      targetVocab = chars + 1, shrinkFactor = 0.5)
    val multis = pruned.pieces.keys.filter(_.length > 1).toSeq
    assert(multis == Seq("qz"), pruned.pieces.keys.toSeq.sorted.toString)
    // single chars all survive (coverage)
    assert(m0.pieces.keys.filter(_.length == 1).forall(pruned.pieces.contains))
    // pruned model still reconstructs every word
    val words = Seq("xy", "qz", "x", "y")
    words.foreach { w =>
      assert(UnigramLm.viterbiSegment(pruned, w).mkString == w)
    }
  }

  test("pruneVocab: reaches the target and stops at chars-only") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab cd cd abcd")).toDF("id", "text")
    val m0 = UnigramLm.learnSoft(docs, "text", vocabSize = 10,
      iters = 2, maxPieceLen = 4)
    val nChars = m0.pieces.keys.count(_.length == 1)
    val p = UnigramLm.pruneVocab(docs, "text", m0, targetVocab = nChars,
      shrinkFactor = 0.6)
    // multi-char pieces are gone; chars stay even if they alone
    // exceed a smaller target
    assert(p.pieces.keys.forall(_.length == 1))
    val p2 = UnigramLm.pruneVocab(docs, "text", m0, targetVocab = 1,
      shrinkFactor = 0.6)
    assert(p2.pieces.keys.forall(_.length == 1) && p2.pieces.nonEmpty)
  }
}

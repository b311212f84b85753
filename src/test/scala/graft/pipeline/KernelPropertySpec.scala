package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-style tests for the round-6 JVM kernels — pure functions
 * checked against brute-force references on seeded randomized inputs
 * (deterministic; no Spark session needed).
 */
class KernelPropertySpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private val tokenPool =
    Array("a", "b", "ab", "cat", "x1", "ünïcode", "字", "dog", "a1b2")

  test("clippedMatches equals the brute-force clipped count on random token arrays") {
    val r = rng(42)
    def randToks() = Array.fill(r.nextInt(12))(tokenPool(r.nextInt(tokenPool.length)))
    def grams(w: Array[String], n: Int): Seq[String] =
      if (w.length < n) Nil
      else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(""))
    for (_ <- 1 to 300) {
      val cand = randToks()
      val ref = randToks()
      val got = Eval.clippedMatches(cand, ref, 4)
      for (n <- 1 to 4) {
        val cg = grams(cand, n).groupBy(identity).view.mapValues(_.size)
        val rg = grams(ref, n).groupBy(identity).view.mapValues(_.size).toMap
        val want = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0)) }.sum
        assert(got(n - 1) === want.toLong,
          s"n=$n cand=${cand.toSeq} ref=${ref.toSeq}")
      }
    }
  }

  test("profileText counts code points, not UTF-16 units (supplementary planes)") {
    // U+1D11E (musical G clef) is a surrogate PAIR in UTF-16
    val clef = new String(Character.toChars(0x1D11E))
    val p = Sft.profileText(s"$clef$clef x", 1)
    // turn 0 (user): "<|user|>\n" + 2-codepoint token + "<|end|>\n"
    // turn 1 (assistant): role 9 chars + 1-codepoint token
    assert(p.rendered_chars === (4 + 5 + 2 + 8) + (9 + 5 + 1 + 8))
    assert(p.masked_chars === 1L)
    assert(p.span_sum === {
      val s = (4 + 5 + 2 + 8) + 9 + 5
      s.toLong + (s + 1)
    })
  }

  test("audioFingerprint and imageForDHash round-trip random planted hashes") {
    val r = rng(7)
    for (_ <- 1 to 25) {
      val h = r.nextLong()
      assert(Multimodal.audioFingerprint(Multimodal.wavForFingerprint(h)) === Some(h))
      assert(Multimodal.imageDHash(Multimodal.imageForDHash(h)) === Some(h))
    }
  }

  test("imageForPHash plants an exact DCT-domain pHash through the PNG round trip") {
    val r = rng(11)
    for (_ <- 1 to 100) {
      val h = r.nextLong()
      assert(Multimodal.imagePHash(Multimodal.imageForPHash(h)) === Some(h))
    }
    // extremes: all-zero and all-one AC signs
    assert(Multimodal.imagePHash(Multimodal.imageForPHash(0L)) === Some(0L))
    assert(Multimodal.imagePHash(Multimodal.imageForPHash(-1L)) === Some(-1L))
    assert(Multimodal.imagePHash(Array.empty[Byte]) === None)
    assert(Multimodal.imagePHash("not an image".getBytes) === None)
  }

  test("vocab.json escaping round-trips nasty unicode tokens") {
    val toks = Seq(
      "plain", "quote\"back\\slash", "tab\tnewline\ncr\r", "bellnull",
      new String(Character.toChars(0x1F600)), // emoji: surrogate pair
      "ünïcode-字", " leading and trailing ", "{}:,[]")
    def esc(t: String): String = t.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = toks.zipWithIndex
      .map { case (t, i) => "\"" + esc(t) + "\": " + i }
      .mkString("{", ", ", "}")
    assert(TokenizerIO.parseStringIntObject(json) === toks.zipWithIndex.toMap)
  }

  test("segment-tree first-fit equals the naive leftmost-scan reference") {
    val r = rng(1234)
    for (trial <- 1 to 200) {
      val budget = 100L
      val lens = List.fill(r.nextInt(60))(
        if (r.nextInt(20) == 0) 100L + r.nextInt(200) // occasional oversize
        else 1L + r.nextInt(120))
      val sorted = lens.zipWithIndex.sortBy { case (tk, i) => (-tk, i) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val naive = sorted.map { case (tk, _) =>
        var p = 0
        while (p < rem.length && rem(p) < tk) p += 1
        if (p == rem.length) rem += budget
        rem(p) -= tk
        p
      }
      val place = Packing.firstFitForTest(budget, math.max(sorted.length, 1))
      val tree = sorted.map { case (tk, _) => place(tk) }
      assert(tree === naive, s"trial=$trial lens=$lens")
    }
  }
}

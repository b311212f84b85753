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
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class AlignSpec extends SparkTestBase {
  import spark.implicits._

  test("identical length sequences align 1:1 on the diagonal") {
    val ls = Array(40, 25, 60, 10)
    val beads = Align.galeChurch(ls, ls)
    assert(beads.toSeq === (0 until 4).map(i => (i, 1, i, 1)))
  }

  test("a sentence split in the target aligns 1:2, not 1:1 + 0:1") {
    // src sentence 1 (40 chars) was rendered as two 20-char sentences
    val beads = Align.galeChurch(Array(30, 40, 30), Array(30, 20, 20, 30))
    assert(beads.toSeq === Seq((0, 1, 0, 1), (1, 1, 1, 2), (2, 1, 3, 1)))
  }

  test("an untranslated sentence folds into a 2:1 merge (deletions are rare by design)") {
    // 450 + lengthCost(35, 0) far exceeds 230 + lengthCost(65, 30):
    // Gale-Church absorbs missing translations into merges whenever a
    // neighbor exists; 1:0 beads only appear against exhausted sides
    // (the empty-side test below). Tie between merging (30,35) and
    // (35,30) resolves deterministically by DP fill order.
    val beads = Align.galeChurch(Array(30, 35, 30), Array(30, 30))
    assert(beads.toSeq === Seq((0, 2, 0, 1), (2, 1, 1, 1)))
  }

  test("2:2 merge-and-swap beats forcing bad 1:1 pairs") {
    // (10, 50) vs (45, 15): neither 1:1 order matches lengths, 2:2 does
    val beads = Align.galeChurch(Array(10, 50), Array(45, 15))
    assert(beads.toSeq === Seq((0, 2, 0, 2)))
  }

  test("empty sides align as pure insertions/deletions") {
    assert(Align.galeChurch(Array(10, 20), Array.empty[Int]).toSeq ===
      Seq((0, 1, 0, 0), (1, 1, 0, 0)))
    assert(Align.galeChurch(Array.empty[Int], Array(10)).toSeq ===
      Seq((0, 0, 0, 1)))
    assert(Align.galeChurch(Array.empty[Int], Array.empty[Int]).isEmpty)
  }

  test("beads tile both sequences exactly, in order, for seeded random inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val src = Array.fill(rnd.nextInt(12))(1 + rnd.nextInt(80))
      val tgt = Array.fill(rnd.nextInt(12))(1 + rnd.nextInt(80))
      val beads = Align.galeChurch(src, tgt)
      assert(beads.map(_._2).sum === src.length)
      assert(beads.map(_._4).sum === tgt.length)
      var (ci, cj) = (0, 0)
      beads.foreach { case (ss, sl, ts, tl) =>
        assert(ss === ci && ts === cj, s"non-contiguous bead at ($ss,$ts)")
        assert(sl + tl > 0)
        ci += sl; cj += tl
      }
    }
  }

  test("alignSentences: identical documents align every sentence 1:1") {
    val docs = Seq(
      (1L, "alpha beta gamma. delta epsilon zeta. eta theta."),
      (2L, "one two three."))
      .toDF("id", "text")
      .select(F.col("id"), F.col("text").as("src"), F.col("text").as("tgt"))
    val out = Align.alignSentences(docs, "id", "src", "tgt")
      .orderBy("id", "bead")
      .select("id", "bead", "src_start", "src_len", "tgt_start", "tgt_len")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
    assert(out.toSeq === Seq(
      (1L, 0, 0, 1, 0, 1), (1L, 1, 1, 1, 1, 1), (1L, 2, 2, 1, 2, 1),
      (2L, 0, 0, 1, 0, 1)))
  }

  test("alignSentences drops NULL and oversized pairs (NULL discipline)") {
    val many = (1 to 600).map(i => s"s$i.").mkString(" ")
    val docs = Seq(
      (1L, "a b.", null.asInstanceOf[String]),
      (2L, many, many))
      .toDF("id", "src", "tgt")
    assert(Align.alignSentences(docs, "id", "src", "tgt").count() === 0L)
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Exact prefix-filter set-similarity join: the recall guarantee is the
  * whole point, so the load-bearing test is equivalence with
  * brute-force all-pairs Jaccard on randomized corpora. */
class JaccardJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(
      docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, s) =>
      id -> s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter >= uni * t
    } yield (ia, ib, inter, uni)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double) =
    Dedup.jaccardPrefixPairs(docs.toDF("id", "text"), "id", "text", t)
      .select("id_a", "id_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("equivalent to brute-force all-pairs on random small-vocab corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    for (seed <- 1 to 4; t <- Seq(0.5, 0.8)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 60L).map { id =>
        val n = 3 + rnd.nextInt(8)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(run(docs, t) == bruteForce(docs, t), s"seed=$seed t=$t")
    }
  }

  test("planted near-duplicate found with exact counts") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over dogs",
      2L -> "the quick brown fox jumps over dogs tonight", // J = 7/8
      3L -> "completely different content entirely here")
    val got = run(docs, 0.8)
    assert(got == Set((1L, 2L, 7L, 8L)))
  }

  test("exact duplicates and case folding") {
    val docs = Seq(
      1L -> "Alpha Beta GAMMA",
      2L -> "alpha beta gamma",
      3L -> "alpha beta gamma delta") // J(1,3)=J(2,3)=3/4 < 0.8
    assert(run(docs, 0.8) == Set((1L, 2L, 3L, 3L)))
    assert(run(docs, 0.75) ==
      Set((1L, 2L, 3L, 3L), (1L, 3L, 3L, 4L), (2L, 3L, 3L, 4L)))
  }

  test("empty and whitespace-only docs never pair") {
    val docs = Seq(1L -> "", 2L -> "   ", 3L -> "alpha", 4L -> "alpha")
    assert(run(docs, 0.8) == Set((3L, 4L, 1L, 1L)))
  }

  test("prefix length never loses recall on IEEE-hostile thresholds") {
    // 0.8*5 = 4.0000000000000002 in IEEE: a naive ceil shortens the
    // prefix; the epsilon form must keep the planted pair (J = 4/5)
    val docs = Seq(
      1L -> "a1 a2 a3 a4",
      2L -> "a1 a2 a3 a4 a5") // inter 4, uni 5, J = 0.8 exactly
    assert(run(docs, 0.8) == Set((1L, 2L, 4L, 5L)))
  }

  test("lshParamsFor: midpoint tracks the threshold under the hash budget") {
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9); mh <- Seq(64, 128, 256)) {
      val (b, r) = Dedup.lshParamsFor(t, mh)
      assert(b * r <= mh, s"t=$t mh=$mh -> ($b,$r)")
      val mid = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(mid - t) < 0.06, s"t=$t mh=$mh mid=$mid ($b,$r)")
    }
  }

  test("nearDuplicatePairsAuto finds the planted shingle near-dup") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(1L -> base, 2L -> (base + " x"), 3L -> "totally unrelated text")
      .toDF("id", "text")
    val pairs = Dedup.nearDuplicatePairsAuto(
      docs, "id", "text", shingleSize = 5, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}

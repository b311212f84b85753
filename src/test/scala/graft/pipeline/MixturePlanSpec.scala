package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class MixturePlanSpec extends SparkTestBase {
  import spark.implicits._

  test("waterfillBudgets: small domains saturate, surplus flows by weight") {
    // T = (a: 100, b: 1000, c: 1000), equal weights, B = 1200:
    // round 1 fair share 400 -> a saturates at 100; remaining 1100 over
    // b, c -> 550 each.
    val got = Sampling.waterfillBudgets(
      Seq("a" -> 100L, "b" -> 1000L, "c" -> 1000L),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 1200L)
    assert(got == Map("a" -> 100L, "b" -> 550L, "c" -> 550L))
  }

  test("waterfillBudgets: weights skew the split; floor keeps total <= budget") {
    val got = Sampling.waterfillBudgets(
      Seq("a" -> 1000L, "b" -> 1000L),
      Map("a" -> 3.0, "b" -> 1.0), 1000L)
    assert(got("a") == 750L && got("b") == 250L)
    val odd = Sampling.waterfillBudgets(
      Seq("a" -> 1000L, "b" -> 1000L),
      Map("a" -> 1.0, "b" -> 2.0), 1001L)
    assert(odd.values.sum <= 1001L)
    assert(odd("b") > odd("a"))
  }

  test("waterfillBudgets edges: budget >= total keeps all; 0 weight excludes; 0 budget") {
    assert(Sampling.waterfillBudgets(
      Seq("a" -> 5L, "b" -> 7L), Map("a" -> 1.0, "b" -> 1.0), 100L)
      == Map("a" -> 5L, "b" -> 7L))
    assert(Sampling.waterfillBudgets(
      Seq("a" -> 5L, "b" -> 7L), Map("a" -> 1.0), 100L)
      == Map("a" -> 5L, "b" -> 0L))
    assert(Sampling.waterfillBudgets(
      Seq("a" -> 5L), Map("a" -> 1.0), 0L) == Map("a" -> 0L))
  }

  test("cascading saturation resolves in T/w order") {
    // a tiny, b small, equal-ish weights: both saturate, c takes the rest
    val got = Sampling.waterfillBudgets(
      Seq("a" -> 10L, "b" -> 50L, "c" -> 10000L),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 600L)
    assert(got("a") == 10L && got("b") == 50L && got("c") == 540L)
  }

  test("waterfillMixture: selection respects per-domain allocations exactly") {
    val rows = (0 until 300).map { i =>
      val dom = if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "books"
      (i.toLong, dom, 10L + (i % 5))
    }
    val df = rows.toDF("id", "dom", "tok")
    val weights = Map("web" -> 1.0, "code" -> 2.0, "books" -> 1.0)
    val budget = 1500L
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val allocs = Sampling.waterfillBudgets(totals.toSeq, weights, budget)
    val out = Sampling.waterfillMixture(
      df, F.col("dom"), F.col("id"), F.col("tok"), weights, budget).collect()
    val kept = out.map(r => (r.getAs[Long]("id"), r.getAs[String]("dom"), r.getAs[Long]("tok")))
    // per-domain kept tokens within the allocation, and maximal in md5 order
    val perDom = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    allocs.foreach { case (d, a) =>
      assert(perDom.getOrElse(d, 0L) <= a, s"domain $d over budget")
    }
    // the kept set is the md5-prefix: recompute locally and compare ids
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantIds = rows.groupBy(_._2).flatMap { case (d, rs) =>
      var cum = 0L
      rs.sortBy(r => (md5hex(r._1.toString), r._1)).takeWhile { r =>
        cum += r._3; cum <= allocs(d)
      }.map(_._1)
    }.toSet
    assert(kept.map(_._1).toSet == wantIds)
    // total within the global budget
    assert(kept.map(_._3).sum <= budget)
  }

  test("weightedFixedK: exact k per stratum, deterministic, heavy rows dominate") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => ("s", i, if (i < 5) 1000000L else 1L)) ++
      (0L until 50L).map(i => ("t", i, 10L))
    val df = rows.toDF("src", "id", "w")
    val got = Sampling.weightedFixedK(df, $"src", $"id", $"w", 10)
      .select("src", "id").as[(String, Long)].collect().toSet
    assert(got.count(_._1 == "s") == 10 && got.count(_._1 == "t") == 10)
    // million-weight rows score ln(u)/1e6 in (-2e-5, 0) — orders above
    // any weight-1 row's ~ln(u): always selected
    (0L until 5L).foreach(i => assert(got.contains(("s", i)), s"heavy $i"))
    val again = Sampling.weightedFixedK(df, $"src", $"id", $"w", 10)
      .select("src", "id").as[(String, Long)].collect().toSet
    assert(again == got)
    // k > stratum size keeps everything with positive weight
    assert(Sampling.weightedFixedK(df.filter($"src" === "t"),
      $"src", $"id", $"w", 100).count() == 50L)
    // non-positive weights drop
    val z = Sampling.weightedFixedK(
      Seq(("s", 1L, 0L), ("s", 2L, -3L), ("s", 3L, 5L)).toDF("src", "id", "w"),
      $"src", $"id", $"w", 10)
    assert(z.select("id").as[Long].collect().toSeq == Seq(3L))
  }
}

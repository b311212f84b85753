package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference PageRank — same math, plain Scala. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = scala.collection.mutable.HashMap.empty[String, Double]
        .withDefaultValue(0.0)
      for ((u, vs) <- out; v <- vs) contrib(v) += r(u) / vs.size
      r = nodes.map(v => v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }
    r
  }

  // cycle + dangling sink + a hub; parallel edge A->B planted twice
  private val edges = Seq(
    "A" -> "B", "A" -> "B", "B" -> "C", "C" -> "A",
    "A" -> "D", "B" -> "D", "C" -> "D", // D dangles
    "E" -> "A", "E" -> "B", "E" -> "C") // E has no inlinks

  test("pageRank matches the driver-side reference to 1e-12") {
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"),
        iterations = 4, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val want = refPageRank(edges, 4, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
  }

  test("rank mass is conserved and floors at (1-d)/N") {
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"),
        iterations = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    val floor = 0.15 / got.size
    assert(got.values.forall(_ >= floor - 1e-15))
    // E has no inlinks: exactly the teleport+dangling floor share
    assert(got("E") < got("D"))
  }

  test("pure cycle stays uniform; nulls drop") {
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x"),
      (null, "x"), ("x", null)).toDF("src", "dst")
    val got = LinkGraph.pageRank(cyc, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("x", "y", "z"))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank materializes the upstream edge extraction exactly once") {
    // the deduped edge list is checkpointed FIRST, so nodes/deg/ce/srcs
    // materialize from it instead of each re-running the upstream (at
    // crawl scale the upstream is the full HTML outlink extraction)
    val acc = spark.sparkContext.longAccumulator("graft.test.extractionRows")
    val track = F.udf((s: String) => { acc.add(1L); s }).asNondeterministic()
    val df = edges.toDF("raw", "dst")
      .select(track(F.col("raw")).as("src"), F.col("dst"))
    LinkGraph.pageRank(df, iterations = 3).collect()
    assert(acc.value === edges.size.toLong,
      s"upstream ran ${acc.value}/${edges.size} rows => ${acc.value / edges.size}x passes")
  }

  test("warm-start on an unchanged graph continues the cold iteration sequence") {
    val e = edges.toDF("src", "dst")
    val cold3 = LinkGraph.pageRank(e, iterations = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val prior = LinkGraph.pageRank(e, iterations = 2, damping = 0.85)
    val warm = LinkGraph.pageRankWarmStart(e, prior,
        iterations = 1, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(warm.keySet === cold3.keySet)
    for ((k, v) <- cold3)
      assert(math.abs(warm(k) - v) <= 1e-12 * v, s"node $k: ${warm(k)} vs $v")
  }

  test("warm-start on a grown graph seeds new nodes and keeps Σr = 1") {
    val e0 = edges.toDF("src", "dst")
    val prior = LinkGraph.pageRank(e0, iterations = 4, damping = 0.85)
    val grown = (edges ++ Seq("F" -> "A", "A" -> "F")).toDF("src", "dst")
    val warm = LinkGraph.pageRankWarmStart(grown, prior,
        iterations = 2, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(warm.contains("F"))
    assert(math.abs(warm.values.sum - 1.0) < 1e-9)
    // warm(2) lands nearer the grown graph's converged ranks than cold(2)
    val converged = refPageRank(edges ++ Seq("F" -> "A", "A" -> "F"), 40, 0.85)
    val cold2 = LinkGraph.pageRank(grown, iterations = 2, damping = 0.85)
      .as[(String, Double)].collect().toMap
    def l1(m: Map[String, Double]) =
      converged.map { case (k, v) => math.abs(m(k) - v) }.sum
    assert(l1(warm) < l1(cold2),
      s"warm ${l1(warm)} should beat cold ${l1(cold2)}")
  }

  test("inDegrees counts distinct sources") {
    val got = LinkGraph.inDegrees(edges.toDF("src", "dst"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 2L, "B" -> 2L, "C" -> 2L, "D" -> 3L))
  }

  test("topAnchors ranks by count then anchor, drops blanks") {
    val e = Seq(
      ("p1", "t", "Home"), ("p2", "t", "Home"), ("p3", "t", "home page"),
      ("p4", "t", "  "), ("p5", "t", null),
      ("p1", "u", "B"), ("p1", "u", "A") // same page twice -> pages=1 each
    ).toDF("src", "dst", "anchor")
    val got = LinkGraph.topAnchors(e, k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("t", "Home", 2L, 1L), ("t", "home page", 1L, 2L),
      ("u", "A", 1L, 1L), ("u", "B", 1L, 2L)))
  }

  test("hostGraph rolls up to registrable domains, distinct page pairs") {
    val e = Seq(
      ("http://a.site.com/1", "http://b.other.org/x"),
      ("http://a.site.com/1", "http://b.other.org/x"), // dup page pair
      ("http://c.site.com/2", "http://b.other.org/y"),
      ("http://a.site.com/1", "http://z.site.com/in")  // self-domain
    ).toDF("src", "dst")
    val got = LinkGraph.hostGraph(e).as[(String, String, Long)].collect().toSet
    assert(got == Set(("site.com", "other.org", 2L)))
    val self = LinkGraph.hostGraph(e, keepSelf = true)
      .as[(String, String, Long)].collect().toSet
    assert(self == Set(("site.com", "other.org", 2L), ("site.com", "site.com", 1L)))
  }

  test("hits: worked two-iteration hubs/authorities on a star graph") {
    // h1 -> a1,a2,a3 ; h2 -> a1. By hand (L1-normalized per half-step):
    // iter1 a = (a1 .5, a2 .25, a3 .25), h = (h1 2/3, h2 1/3)
    // iter2 a = (3/7, 2/7, 2/7),        h = (h1 .7, h2 .3)
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h1", "a3"), ("h2", "a1"))
      .toDF("src", "dst")
    val out = LinkGraph.hits(edges, iterations = 2)
      .select("node", "hub", "authority")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def ~=(x: Double, y: Double) = math.abs(x - y) < 1e-12
    assert(~=(out("h1")._1, 0.7) && ~=(out("h2")._1, 0.3))
    assert(~=(out("a1")._2, 3.0 / 7) && ~=(out("a2")._2, 2.0 / 7) &&
      ~=(out("a3")._2, 2.0 / 7))
    assert(~=(out.values.map(_._1).sum, 1.0))
    assert(~=(out.values.map(_._2).sum, 1.0))
    // sinks have hub 0, sources authority 0
    assert(out("a1")._1 === 0.0 && out("h1")._2 === 0.0)
  }
}

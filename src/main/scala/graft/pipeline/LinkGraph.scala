package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Link-graph analytics over a crawl's outlink edge list (the output
 * shape of [[graft.sources.Warc.outlinks]]: one row per src→dst edge,
 * optionally with anchor text). The crawl graph drives corpus curation
 * at scale: PageRank-style authority for quality weighting, in-degree
 * for popularity cutoffs, anchor aggregation for retrieval fields,
 * host-level rollups for domain policy.
 *
 * Scale shape: the edge list is the big table and is shuffled ONCE
 * (dedup + out-degree weighting + repartition by src, pinned with a
 * lazy localCheckpoint); each PageRank iteration then shuffles only
 * the rank vector (one row per node) into the edges' layout and one
 * aggregation by dst. Dangling mass and the node count ride as 1-row
 * broadcast re-attaches — nothing collects to the driver.
 */
object LinkGraph {

  /**
   * Deterministic uniform random walks over the edge list — the
   * DeepWalk/node2vec (p = q = 1) corpus generator: `walksPerNode`
   * walks of up to `walkLen` nodes from every distinct source, each
   * step choosing uniformly among the current node's out-neighbors.
   * The walk "randomness" is the repo's md5 convention — step t of
   * walk (start, w) draws neighbor index
   * `hex32(md5(seed:start:w:t)) mod outdeg(cur)` — so the whole walk
   * corpus is REPLAYABLE (in SQL, across runs, across engines): walk
   * generation for embedding training must be reproducible or the
   * training set silently drifts between pipeline runs.
   *
   * Returns long-format rows (start, walk, step, node), step 0 being
   * the start node. A walk reaching a dangling node (no out-edges)
   * simply ends there — shorter walks are emitted, never padded.
   *
   * Scale shape: the neighbor table (src, dst, idx, deg) builds with
   * ONE window over the deduped edges and is reused by every step;
   * each of the walkLen-1 steps is one equi-join of the frontier
   * (|nodes| * walksPerNode rows) against it — no driver state, no
   * per-walk loops.
   */
  def randomWalks(
      edges: DataFrame,
      walkLen: Int,
      walksPerNode: Int,
      seed: String,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(walkLen > 0, s"walkLen must be positive, got $walkLen")
    require(walksPerNode > 0,
      s"walksPerNode must be positive, got $walksPerNode")
    val spark = edges.sparkSession
    val e = edges.select(F.col(srcCol).cast("long").as("src"),
        F.col(dstCol).cast("long").as("dst"))
      .filter(F.col("src").isNotNull && F.col("dst").isNotNull)
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("src")).orderBy(F.col("dst").asc)
    val nbr = e
      .withColumn("idx", F.row_number().over(w) - 1)
      .withColumn("deg", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(F.col("src"))))
      .localCheckpoint(eager = false)
    val walks = spark.range(0, walksPerNode)
      .select(F.col("id").cast("long").as("walk"))
    var frontier = e.select(F.col("src").as("start"))
      .unionByName(e.select(F.col("dst").as("start")))
      .distinct()
      .crossJoin(walks)
      .select(F.col("start"), F.col("walk"), F.lit(0L).as("step"),
        F.col("start").as("node"))
    var out = frontier
    (1 until walkLen).foreach { t =>
      val pick = F.conv(F.substring(
          F.md5(F.concat_ws(":", F.lit(seed), F.col("start"), F.col("walk"),
            F.lit(t.toLong))), 1, 8), 16, 10).cast("long") % F.col("deg")
      val next = frontier
        .join(nbr, frontier("node") === nbr("src"))
        .filter(nbr("idx") === pick)
        .select(F.col("start"), F.col("walk"), F.lit(t.toLong).as("step"),
          F.col("dst").as("node"))
        .localCheckpoint(eager = false)
      out = out.unionByName(next)
      frontier = next
    }
    out
  }

  /**
   * Per-node triangle counts over the UNDIRECTED simple graph of the
   * edge list (direction and parallel edges collapse; self-loops
   * drop): for each triangle {a < b < c}, all three members count it.
   * Nodes in no triangle are absent from the result.
   *
   * All-integer — the counts replay exactly anywhere. Scale shape:
   * the ordered-edge representation (a < b) makes each triangle
   * enumerate exactly once via two equi-joins (wedge a<b<c closed by
   * the (a, c) edge); the classic degree-ordering refinement (point
   * high-degree nodes outward) drops in here if a skewed real graph
   * ever needs it — the synthetic and crawl graphs at hand are
   * near-regular.
   */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(F.least(F.col(srcCol).cast("long"), F.col(dstCol).cast("long"))
          .as("a"),
        F.greatest(F.col(srcCol).cast("long"), F.col(dstCol).cast("long"))
          .as("b"))
      .filter(F.col("a").isNotNull && F.col("a") < F.col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val tri = und.as("e1")
      .join(und.as("e2"), F.col("e1.b") === F.col("e2.a"))
      .join(und.as("e3"),
        F.col("e3.a") === F.col("e1.a") && F.col("e3.b") === F.col("e2.b"))
      .select(F.col("e1.a").as("x"), F.col("e1.b").as("y"),
        F.col("e2.b").as("z"))
    tri.select(F.explode(F.array(F.col("x"), F.col("y"), F.col("z")))
        .as("node"))
      .groupBy("node")
      .agg(F.count(F.lit(1)).as("n_triangles"))
  }

  /**
   * Deterministic label propagation for semi-supervised labeling
   * (weak supervision over a similarity/link graph): seed nodes carry
   * frozen labels; each iteration every unseeded node takes the MOST
   * FREQUENT label among its (undirected) neighbors' current labels —
   * ties broken by the smaller label, unlabeled neighbors ignored, a
   * node with no labeled neighbor stays unlabeled. Fixed iteration
   * count, min-tie-break: fully deterministic, replayable in SQL.
   *
   * Returns (node, label) with label NULL-free only for reached
   * nodes (unreached nodes carry NULL — filter as needed).
   *
   * Scale shape: one bidirectional edge table built once; each
   * iteration is an edge-sized join against the (node, label) state
   * plus a grouped count — the PageRank shuffle shape with labels in
   * place of rank mass.
   */
  def labelPropagation(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(F.col(srcCol).cast("long").as("a"),
        F.col(dstCol).cast("long").as("b"))
      .filter(F.col("a").isNotNull && F.col("b").isNotNull &&
        F.col("a") =!= F.col("b"))
    val und = e.unionByName(e.select(F.col("b").as("a"), F.col("a").as("b")))
      .distinct()
      .localCheckpoint(eager = false)
    val sCols = seeds.columns
    val seed = seeds.select(F.col(sCols(0)).cast("long").as("node"),
      F.col(sCols(1)).cast("long").as("label"))
    val nodes = und.select(F.col("a").as("node")).distinct()
      .unionByName(seed.select("node")).distinct()
    var state = nodes.join(seed, Seq("node"), "left")
      .localCheckpoint(eager = false)
    (1 to iterations).foreach { _ =>
      val votes = und
        .join(state.select(F.col("node").as("b"),
          F.col("label").as("__nl")), Seq("b"))
        .filter(F.col("__nl").isNotNull)
        .groupBy(F.col("a").as("node"), F.col("__nl").as("__cand"))
        .agg(F.count(F.lit(1)).as("__votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(F.col("node"))
        .orderBy(F.col("__votes").desc, F.col("__cand").asc)
      val picked = votes
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") === 1)
        .select(F.col("node"), F.col("__cand"))
      state = state
        .join(picked, Seq("node"), "left")
        .join(seed.select(F.col("node"), F.lit(1).as("__seed")),
          Seq("node"), "left")
        .withColumn("label",
          F.when(F.col("__seed").isNotNull, F.col("label"))
            .otherwise(F.coalesce(F.col("__cand"), F.col("label"))))
        .select("node", "label")
        .localCheckpoint(eager = false)
    }
    state
  }

  /**
   * PageRank with uniform teleport and dangling-mass redistribution:
   *
   *   r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u) + D/N )
   *
   * where `D` is the total rank mass sitting on dangling nodes (no
   * outlinks) — redistributed uniformly, so Σ r(v) = 1 after every
   * iteration. Parallel edges are deduplicated; self-loops count like
   * any other edge; NULL endpoints drop. A fixed `iterations` count
   * keeps the computation deterministic (no driver-side convergence
   * probe); each iteration is lazily checkpointed so iteration r does
   * not replay 1..r-1.
   *
   * Returns (node, rank) over all distinct endpoints.
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 3,
      damping: Double = 0.85): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, damping, None)

  /**
   * WARM-START continuation — the nightly link-graph shape: seed the
   * iteration from prior ranks (yesterday's run) instead of uniform,
   * so a grown graph reaches yesterday's convergence depth in a few
   * iterations instead of replaying them all. Exact contract on an
   * unchanged graph: `pageRankWarmStart(pageRank(E, k), j)` computes
   * the same iteration sequence as `pageRank(E, k + j)` (pinned in
   * LinkGraphSpec at float tolerance — partial-sum order is the only
   * divergence). On a changed graph: surviving nodes keep their prior
   * rank, NEW nodes start at 1/N, vanished nodes drop; the damping
   * term's uniform re-injection then re-mixes mass toward the new
   * fixed point (the total is re-normalized to 1 at seed time, so the
   * Σ r = 1 invariant holds from iteration one).
   */
  def pageRankWarmStart(
      edges: DataFrame,
      priorRanks: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 1,
      damping: Double = 0.85): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, damping,
      Some(priorRanks.select(F.col("node"), F.col("rank"))))

  private def pageRankCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double,
      prior: Option[DataFrame]): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .select(F.col(srcCol).as("__src"), F.col(dstCol).as("__dst"))
      .distinct()
      // checkpoint the deduped edge list FIRST: nodes/deg/ce/srcs all
      // derive from it, and without this each of their own checkpoint
      // materializations would re-run the upstream (e.g. a full-crawl
      // HTML outlink extraction) once more — ~4 extraction passes
      // before iteration 1. With it, the upstream runs exactly once.
      .localCheckpoint(eager = false)
    val nodes = e.select(F.col("__src").as("node"))
      .unionByName(e.select(F.col("__dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false) // reused every iteration
    // one row, re-attached by broadcast — N never touches the driver
    val nRow = nodes.agg(F.count(F.lit(1)).cast("double").as("__n"))
    // contribution edges: weight = 1/outdeg, laid out by src once
    val deg = e.groupBy("__src").agg(F.count(F.lit(1)).as("__d"))
    val ce = e.join(deg, "__src")
      .select(F.col("__src"), F.col("__dst"),
        (F.lit(1.0) / F.col("__d")).as("__w"))
      .repartition(F.col("__src"))
      .localCheckpoint(eager = false) // the big table: shuffled once
    val srcs = deg.select(F.col("__src").as("node"))
      .localCheckpoint(eager = false) // dangling anti-join probe, reused
    var ranks = prior match {
      case None =>
        nodes.crossJoin(F.broadcast(nRow))
          .select(F.col("node"), (F.lit(1.0) / F.col("__n")).as("rank"))
          .localCheckpoint(eager = false)
      case Some(p) =>
        // seed = prior rank where known, 1/N for new nodes; vanished
        // nodes drop via the join; renormalize so Σ r = 1 holds from
        // the first iteration (a 1-row broadcast re-attach)
        val seeded = nodes
          .join(p.withColumnRenamed("rank", "__pr"), Seq("node"), "left")
          .crossJoin(F.broadcast(nRow))
          .select(F.col("node"),
            F.coalesce(F.col("__pr"), F.lit(1.0) / F.col("__n")).as("rank"))
        val total = seeded.agg(F.sum("rank").as("__t"))
        seeded.crossJoin(F.broadcast(total))
          .select(F.col("node"), (F.col("rank") / F.col("__t")).as("rank"))
          .localCheckpoint(eager = false)
    }
    for (_ <- 1 to iterations) {
      val dangling = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).as("__dm"))
      val contrib = ce
        .join(ranks.withColumnRenamed("node", "__src"), "__src")
        .groupBy(F.col("__dst").as("node"))
        .agg(F.sum(F.col("__w") * F.col("rank")).as("__c"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(F.broadcast(dangling))
        .crossJoin(F.broadcast(nRow))
        .select(F.col("node"),
          (F.lit(1.0 - damping) / F.col("__n") + F.lit(damping) *
            (F.coalesce(F.col("__c"), F.lit(0.0)) +
              F.col("__dm") / F.col("__n"))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /**
   * HITS hubs & authorities (Kleinberg 1999): authority ← Σ over
   * in-links of hub, hub ← Σ over out-links of authority,
   * L1-normalized after each half-step. Returns
   * (node, hub, authority) with both columns summing to 1.
   *
   * Same scale shape as [[pageRank]]: the deduped edge list
   * checkpoints once and is the only corpus-sized table; each
   * half-step is one join + one aggregate keyed on the receiving
   * side, and every normalizer is a broadcast 1-row frame — nothing
   * graph-sized ever reaches the driver. Nodes with no in-links hold
   * authority 0 (and pure sinks hub 0); the L1 normalization keeps
   * the remaining mass comparable across iterations.
   */
  def hits(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges
      .filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .select(F.col(srcCol).as("__src"), F.col(dstCol).as("__dst"))
      .distinct()
      .localCheckpoint(eager = false) // the pageRank rule: upstream once
    val nodes = e.select(F.col("__src").as("node"))
      .unionByName(e.select(F.col("__dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    val nRow = nodes.agg(F.count(F.lit(1)).cast("double").as("__n"))
    def normalized(df: DataFrame, col: String): DataFrame = {
      val total = df.agg(F.sum(col).as("__t"))
      df.crossJoin(F.broadcast(total))
        .select(F.col("node"),
          F.when(F.col("__t") > 0.0, F.col(col) / F.col("__t"))
            .otherwise(F.lit(0.0)).as(col))
        .localCheckpoint(eager = false)
    }
    var hub = nodes.crossJoin(F.broadcast(nRow))
      .select(F.col("node"), (F.lit(1.0) / F.col("__n")).as("hub"))
      .localCheckpoint(eager = false)
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = nodes
        .join(e.join(hub.withColumnRenamed("node", "__src"), "__src")
          .groupBy(F.col("__dst").as("node"))
          .agg(F.sum("hub").as("__a")), Seq("node"), "left")
        .select(F.col("node"), F.coalesce(F.col("__a"), F.lit(0.0)).as("authority"))
      auth = normalized(aRaw, "authority")
      val hRaw = nodes
        .join(e.join(auth.withColumnRenamed("node", "__dst"), "__dst")
          .groupBy(F.col("__src").as("node"))
          .agg(F.sum("authority").as("__h")), Seq("node"), "left")
        .select(F.col("node"), F.coalesce(F.col("__h"), F.lit(0.0)).as("hub"))
      hub = normalized(hRaw, "hub")
    }
    hub.join(auth, "node")
  }

  /** Distinct-source in-degree per target — the popularity cutoff
    * signal. One shuffle (dedup folds into the aggregate). */
  def inDegrees(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    edges.filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .groupBy(F.col(dstCol).as("node"))
      .agg(F.count_distinct(F.col(srcCol)).as("in_degree"))

  /**
   * Anchor-text aggregation: the top `k` anchor strings per target by
   * (count DESC, anchor ASC), with their distinct-page counts — the
   * retrieval-side "anchor field" of a web index. Blank anchors drop.
   * Two aggregations, both keyed by dst (the second reuses the
   * first's hash layout — no extra exchange).
   */
  def topAnchors(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", anchorCol: String = "anchor"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counted = edges
      .filter(F.col(dstCol).isNotNull && F.col(anchorCol).isNotNull &&
        F.length(F.trim(F.col(anchorCol))) > 0)
      .groupBy(F.col(dstCol).as("dst"), F.col(anchorCol).as("anchor"))
      .agg(F.count_distinct(F.col(srcCol)).as("pages"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst")
      .orderBy(F.col("pages").desc, F.col("anchor"))
    counted.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
      .select(F.col("dst"), F.col("anchor"), F.col("pages"),
        F.col("__rn").cast("long").as("rank"))
  }

  /**
   * Host-level rollup of the page graph: edges between registrable
   * domains with distinct-page-pair weights, self-links optionally
   * dropped. Domain policy (crawl budgets, spam neighborhoods) runs on
   * this graph — millions of nodes where the page graph has billions.
   */
  def hostGraph(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", keepSelf: Boolean = false): DataFrame = {
    val d = edges
      .select(Urls.urlDomain(F.col(srcCol)).as("src_domain"),
        Urls.urlDomain(F.col(dstCol)).as("dst_domain"),
        F.col(srcCol).as("__s"), F.col(dstCol).as("__d"))
      .filter(F.col("src_domain").isNotNull && F.col("dst_domain").isNotNull)
    val kept = if (keepSelf) d
      else d.filter(F.col("src_domain") =!= F.col("dst_domain"))
    kept.groupBy("src_domain", "dst_domain")
      .agg(F.count_distinct(F.col("__s"), F.col("__d")).as("links"))
  }
}

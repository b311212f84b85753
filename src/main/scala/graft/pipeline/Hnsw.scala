package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Graph ANN (HNSW-class): a driver-built hierarchical small-world
 * graph over a BOUNDED navigation sample, with the corpus assigned to
 * navigation cells and probed distributively — the missing standard
 * ANN family noted by the r11 review, shaped for Spark's partition
 * model rather than single-node serving:
 *
 *   - The GRAPH lives on the driver and is broadcast (like IVF
 *     centroids): `maxNav` nodes, levels drawn geometrically, M
 *     neighbors per node — the classic Malkov-Yashunin construction
 *     (greedy descent through upper layers, best-first beam at each
 *     target layer), deterministic (seeded levels, no RNG state).
 *   - The CORPUS never collects: every row walks the broadcast graph
 *     once (map-only) to its nearest navigation node and lands in that
 *     node's `__cell` partition via the shared [[CellTable]] layout —
 *     so streaming append, takedown removal, and compaction all work
 *     through the existing IVF machinery unchanged.
 *   - A QUERY walks the graph (O(ef·M) dot products instead of the
 *     IVF probe's O(nlist) centroid scan — the reason graph routing
 *     matters at scale: nlist can grow to 10^5-10^6 fine cells at
 *     100 TB without a per-query linear scan over them), takes
 *     distance-ordered cells until `probeMass` of the corpus is
 *     covered (recall tracks probed MASS — the repo's measured IVF
 *     rule, unchanged by how the cells were ordered), and exact-cosine
 *     reranks the probed rows.
 *
 * Exact-copy guarantee: assignment and probing walk the SAME graph
 * with the SAME beam width (`efAssign`), so an identical query vector
 * reproduces its copy's walk bit-for-bit and the copy's cell is always
 * the FIRST probed cell — the q_decontaminate_semantic argument,
 * graph-routed. The probe beam (`efSearch`) widens the candidate list
 * beyond that guarantee; the assign-width walk rides along explicitly.
 */
object Hnsw {

  /** The in-memory navigation graph. `vecs` are unit-normalized;
    * `neighbors(i)(l)` is node i's adjacency at level l (l <=
    * levels(i)). Distance = squared L2 on normalized vectors
    * (monotone with cosine). */
  final case class Graph(
      vecs: Array[Array[Float]],
      levels: Array[Int],
      neighbors: Array[Array[Array[Int]]],
      entry: Int,
      m: Int,
      efAssign: Int,
      efConstruction: Int = 64) extends Serializable

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val t = a(i).toDouble - b(i); d += t * t; i += 1 }
    d
  }

  /** Deterministic geometric level draw: floor(-ln(u) · mL) with u
    * from the repo's replayable mix64 rule — no RNG state, the same
    * graph from the same inputs every build. */
  private def levelFor(seed: Long, i: Long, mL: Double): Int = {
    val u = math.max(UnigramLm.positionUniform(seed, i, 0), 1e-12)
    math.min((-math.log(u) * mL).toInt, 30)
  }

  /** Best-first beam search at one level: returns up to `ef` nodes as
    * (node, dist), ASCENDING by distance. The standard searchLayer. */
  private def searchLayer(
      g: Graph, q: Array[Float], eps: Seq[Int], ef: Int, level: Int)
      : Array[(Int, Double)] = {
    val visited = new java.util.BitSet(g.vecs.length)
    // candidates: nearest-first; results: farthest-first, capped at ef
    val cand = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(
      Ordering.by[(Double, Int), Double](_._1).reverse)
    val res = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(
      Ordering.by[(Double, Int), Double](_._1))
    eps.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val d = dist(q, g.vecs(e))
        cand.enqueue((d, e))
        res.enqueue((d, e))
        if (res.size > ef) res.dequeue()
      }
    }
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (res.size >= ef && dc > res.head._1) {
        cand.clear() // nearest candidate already worse than the beam edge
      } else {
        val nbrs = if (level < g.neighbors(c).length) g.neighbors(c)(level)
                   else Array.empty[Int]
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = dist(q, g.vecs(nb))
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((d, nb))
              res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.dequeueAll.toArray.reverse.map { case (d, n) => (n, d) }
  }

  /** Full multi-layer search: greedy ef=1 descent through the upper
    * layers, then an `ef` beam at layer 0. Distance-ascending. */
  def search(g: Graph, query: Array[Float], ef: Int): Array[(Int, Double)] = {
    if (g.vecs.isEmpty) return Array.empty
    val q = normalize(query)
    var ep = g.entry
    var l = g.levels(g.entry)
    while (l > 0) {
      ep = searchLayer(g, q, Seq(ep), 1, l).head._1
      l -= 1
    }
    searchLayer(g, q, Seq(ep), math.max(ef, 1), 0)
  }

  /**
   * Build the navigation graph over `points` (unit-normalized copies
   * are stored; inputs are untouched). Deterministic: node i's level
   * comes from the seeded mix64 draw; insertion order is the input
   * order. Neighbor selection is M-nearest from the construction beam,
   * with overfull adjacency shrunk back to the M nearest (2M at level
   * 0) — the simple-select HNSW variant.
   */
  def build(
      points: Array[Array[Float]],
      m: Int = 16,
      efConstruction: Int = 64,
      efAssign: Int = 16,
      seed: Long = 42L): Graph = {
    require(m >= 2, s"m must be >= 2, got $m")
    val n = points.length
    val vecs = points.map(normalize)
    val mL = 1.0 / math.log(m.toDouble)
    val levels = Array.tabulate(n)(i => levelFor(seed, i.toLong, mL))
    val neighbors = Array.tabulate(n)(i =>
      Array.fill(levels(i) + 1)(Array.empty[Int]))
    val g = Graph(vecs, levels, neighbors, entry = 0, m = m,
      efAssign = efAssign, efConstruction = efConstruction)
    if (n == 0) return g
    var entry = 0
    var maxLevel = levels(0)
    val maxAt = (lc: Int) => if (lc == 0) 2 * m else m

    var i = 1
    while (i < n) {
      val q = vecs(i)
      val l = levels(i)
      var ep = entry
      var lc = maxLevel
      while (lc > l) {
        ep = searchLayer(g, q, Seq(ep), 1, lc).head._1
        lc -= 1
      }
      var eps = Seq(ep)
      lc = math.min(l, maxLevel)
      while (lc >= 0) {
        val found = searchLayer(g, q, eps, efConstruction, lc)
        val selected = found.take(m).map(_._1)
        neighbors(i)(lc) = selected
        selected.foreach { nb =>
          val cur = neighbors(nb)(lc)
          val grown = cur :+ i
          neighbors(nb)(lc) =
            if (grown.length <= maxAt(lc)) grown
            else grown.map(x => (x, dist(vecs(nb), vecs(x))))
              .sortBy(_._2).take(maxAt(lc)).map(_._1)
        }
        eps = found.map(_._1).toSeq
        lc -= 1
      }
      if (l > maxLevel) { maxLevel = l; entry = i }
      i += 1
    }
    Graph(vecs, levels, neighbors, entry, m, efAssign, efConstruction)
  }

  /** The assignment walk: nearest navigation node at the index's
    * frozen beam width. Identical vectors produce identical walks —
    * the exact-copy contract. */
  private[pipeline] def assignCell(g: Graph, v: Array[Float]): Int =
    search(g, v, g.efAssign).head._1

  /**
   * Insert `points` into an EXISTING graph — the [[build]] loop
   * continued from node `n`: each new node draws its level from the
   * same seeded rule at its global index (so growing a graph in two
   * steps or one draws identical levels), descends from the current
   * entry, beams at `g.efConstruction`, links M-nearest, and shrinks
   * overfull neighbors — existing adjacency is REUSED, not rebuilt
   * (the incremental win: O(new · ef · M) vs the full O(n · ef · M)
   * reconstruction). Existing nodes keep their indices; new nodes
   * take n, n+1, ... (cell ids extend, never reshuffle). Input order
   * deterministic → the grown graph is deterministic.
   */
  def insertNav(
      g: Graph,
      points: Array[Array[Float]],
      seed: Long = 42L): Graph = {
    if (points.isEmpty) return g
    val oldN = g.vecs.length
    val n = oldN + points.length
    val mL = 1.0 / math.log(g.m.toDouble)
    val vecs = g.vecs ++ points.map(normalize)
    val levels = new Array[Int](n)
    System.arraycopy(g.levels, 0, levels, 0, oldN)
    var i = oldN
    while (i < n) { levels(i) = levelFor(seed, i.toLong, mL); i += 1 }
    // adjacency is mutated during insertion (new links + shrink) —
    // deep-copy the existing structure
    val neighbors = new Array[Array[Array[Int]]](n)
    i = 0
    while (i < oldN) { neighbors(i) = g.neighbors(i).map(_.clone()); i += 1 }
    while (i < n) { neighbors(i) = Array.fill(levels(i) + 1)(Array.empty[Int]); i += 1 }
    var entry = g.entry
    var maxLevel = if (oldN == 0) -1 else levels(entry)
    val g2 = Graph(vecs, levels, neighbors, entry, g.m, g.efAssign,
      g.efConstruction)
    val maxAt = (lc: Int) => if (lc == 0) 2 * g.m else g.m
    i = oldN
    while (i < n) {
      val q = vecs(i)
      val l = levels(i)
      if (maxLevel < 0) { entry = i; maxLevel = l }
      else {
        var ep = entry
        var lc = maxLevel
        while (lc > l) {
          ep = searchLayer(g2, q, Seq(ep), 1, lc).head._1
          lc -= 1
        }
        var eps = Seq(ep)
        lc = math.min(l, maxLevel)
        while (lc >= 0) {
          val found = searchLayer(g2, q, eps, g.efConstruction, lc)
          val selected = found.take(g.m).map(_._1)
          neighbors(i)(lc) = selected
          selected.foreach { nb =>
            val cur = neighbors(nb)(lc)
            val grown = cur :+ i
            neighbors(nb)(lc) =
              if (grown.length <= maxAt(lc)) grown
              else grown.map(x => (x, dist(vecs(nb), vecs(x))))
                .sortBy(_._2).take(maxAt(lc)).map(_._1)
          }
          eps = found.map(_._1).toSeq
          lc -= 1
        }
        if (l > maxLevel) { maxLevel = l; entry = i }
      }
      i += 1
    }
    Graph(vecs, levels, neighbors, entry, g.m, g.efAssign, g.efConstruction)
  }

  // ------------------------------------------------------------------ //
  // Spark integration                                                   //
  // ------------------------------------------------------------------ //

  /** A built HNSW index: the navigation graph, its nav-node source ids
    * (reporting only), per-cell row counts (mass-adaptive probing) and
    * the cell-assigned corpus (`neighbor_id`, `__cv`, `__cell` — the
    * [[Similarity.IvfIndex]] layout, so maintenance machinery is
    * shared). */
  final case class HnswIndex(
      graph: Graph,
      navIds: Array[Long],
      cellSizes: Array[Long],
      assigned: DataFrame) {
    def save(path: String): Unit = {
      CellTable.writeBase(assigned, s"$path/assigned")
      writeGraph(assigned.sparkSession, graph, navIds, path)
    }
  }

  /** Persist the navigation graph's nodes/edges side tables (bounded
    * driver-side rows — maxNav nodes). */
  private def writeGraph(
      spark: SparkSession, graph: Graph, navIds: Array[Long],
      path: String): Unit = {
    import spark.implicits._
    graph.vecs.indices.map { i =>
      (i, navIds(i), graph.levels(i), graph.vecs(i), graph.m,
        graph.efAssign, graph.entry, graph.efConstruction)
    }.toDF("ix", "nav_id", "level", "vec", "m", "ef_assign", "entry",
      "ef_construction")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/nodes")
    graph.neighbors.indices.flatMap { i =>
      graph.neighbors(i).indices.flatMap { l =>
        graph.neighbors(i)(l).map(nb => (i, l, nb))
      }
    }.toDF("ix", "level", "nbr")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/edges")
  }

  /** Reload an index written by [[HnswIndex.save]]. Cell sizes are
    * re-derived from the assignment (one bounded aggregate), so they
    * stay correct through appends and removals. */
  def loadHnswIndex(spark: SparkSession, path: String): HnswIndex = {
    val (g, navIds) = loadGraphOnly(spark, path)
    val assigned = loadAssignedOnly(spark, path)
    HnswIndex(g, navIds, cellSizesOf(assigned, g.vecs.length), assigned)
  }

  /** The navigation graph + nav ids of a saved index — the two
    * bounded-side collects, WITHOUT the assignment's cell-size
    * aggregate (a full corpus-scale job the graph-mutation paths
    * never need: they re-derive sizes after the swap anyway). */
  private def loadGraphOnly(
      spark: SparkSession, path: String): (Graph, Array[Long]) = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$path/nodes")
    // ef_construction joined the layout after the first release: an
    // older index (column absent) reloads at the build default
    val withEfc =
      if (raw.columns.contains("ef_construction")) raw
      else raw.withColumn("ef_construction", F.lit(64))
    val nodes = withEfc
      .select("ix", "nav_id", "level", "vec", "m", "ef_assign", "entry",
        "ef_construction")
      .as[(Int, Long, Int, Array[Float], Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    val edges = spark.read.parquet(s"$path/edges")
      .select("ix", "level", "nbr").as[(Int, Int, Int)].collect()
      .groupBy(e => (e._1, e._2))
    val n = nodes.length
    val neighbors = Array.tabulate(n)(i =>
      Array.tabulate(nodes(i)._3 + 1)(l =>
        edges.getOrElse((i, l), Array.empty).map(_._3)))
    val g = Graph(nodes.map(_._4), nodes.map(_._3), neighbors,
      entry = if (n == 0) 0 else nodes.head._7,
      m = if (n == 0) 16 else nodes.head._5,
      efAssign = if (n == 0) 16 else nodes.head._6,
      efConstruction = if (n == 0) 64 else nodes.head._8)
    (g, nodes.map(_._2))
  }

  /** Just the assignment frame — lazy, no driver job. */
  private def loadAssignedOnly(spark: SparkSession, path: String): DataFrame =
    CellTable.readVisible(spark, s"$path/assigned", "__cell")
      .withColumn("__cell", F.col("__cell").cast("int"))
      .select("neighbor_id", "__cv", "__cell")

  private def cellSizesOf(assigned: DataFrame, n: Int): Array[Long] = {
    val sizes = new Array[Long](n)
    assigned.groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
      .collect().foreach { r =>
        val c = r.getInt(0)
        if (c >= 0 && c < n) sizes(c) = r.getLong(1)
      }
    sizes
  }

  /**
   * One-off indexing pass: train `maxNav` k-means navigation points
   * (the IVF cell geometry — balanced Voronoi cells, which raw sample
   * points are not: a sample-point partition measured ~10 recall
   * points below k-means at the same probed mass), build the graph
   * over them driver-side, assign every corpus row by a broadcast
   * graph walk (map-only; NULL vectors skipped). `maxNav` bounds
   * driver memory — the corpus itself never collects. The graph's job
   * is ROUTING: it replaces the O(nlist) linear centroid scan of the
   * IVF probe with an O(ef·M) walk, which is what lets nlist grow to
   * 10^5-10^6 fine cells at 100 TB.
   */
  def buildHnswIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      maxNav: Int = 1024,
      m: Int = 16,
      efConstruction: Int = 64,
      efAssign: Int = 16,
      iterations: Int = 2,
      seed: Long = 42L): HnswIndex = {
    val spark = corpus.sparkSession
    val nonNull = corpus.filter(F.col(vecCol).isNotNull)
    // SPHERICAL k-means: the walk, the assignment, and the probe all
    // compare normalized vectors (cosine geometry), so the navigation
    // points must be trained in the same space — unnormalized means
    // over a cosine partition cost ~2 recall points at equal mass
    val normU = F.udf((v: Array[Float]) => normalize(v))
    val navs = Similarity.trainCentroids(
      nonNull.withColumn("__nv", normU(F.col(vecCol))),
      idCol, "__nv", maxNav, iterations)
    require(navs.nonEmpty, "buildHnswIndex: no non-null vectors")
    val g = build(navs, m, efConstruction, efAssign, seed)
    val gB = spark.sparkContext.broadcast(g)
    val assignU = F.udf((v: Array[Float]) => assignCell(gB.value, v))
    val assigned = nonNull
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        assignU(F.col(vecCol)).as("__cell"))
    HnswIndex(g, navs.indices.map(_.toLong).toArray,
      cellSizesOf(assigned, navs.length), assigned)
  }

  /** Distance-ordered probe cells for one query: the assign-width walk
    * head FIRST (the exact-copy guarantee), then the `efSearch` beam's
    * cells until `probeMass` of the corpus is covered (>= `minProbe`
    * cells). */
  private[pipeline] def probeCells(
      g: Graph, sizes: Array[Long], total: Long, v: Array[Float],
      efSearch: Int, minProbe: Int, probeMass: Double): Seq[Int] = {
    val head = assignCell(g, v)
    val beam = search(g, v, efSearch)
    val want = math.ceil(probeMass * total).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var acc = 0L
    def add(c: Int): Unit = if (seen.add(c)) {
      out += c
      acc += (if (c < sizes.length) sizes(c) else 0L)
    }
    add(head)
    var i = 0
    while (i < beam.length && (out.length < minProbe || acc < want)) {
      add(beam(i)._1)
      i += 1
    }
    out.toSeq
  }

  /**
   * Graph-routed approximate top-k with exact-cosine rerank over the
   * probed cells — [[Similarity.ivfTopKIndexed]]'s shape with the
   * probe list produced by the graph walk instead of a linear centroid
   * scan. Probing stops at `probeMass` of the corpus (mass-adaptive:
   * recall tracks probed mass as the corpus grows); `efSearch` bounds
   * the walk's beam and therefore how many distinct cells the walk can
   * surface.
   */
  def hnswTopK(
      index: HnswIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      efSearch: Int = 128,
      minProbe: Int = 4,
      probeMass: Double = 0.45): DataFrame = {
    val spark = index.assigned.sparkSession
    val gB = spark.sparkContext.broadcast(index.graph)
    val sizes = index.cellSizes
    val total = math.max(sizes.sum, 1L)
    // no silent caps: the beam can only surface efSearch distinct
    // cells — if the mass target needs more (roughly uniform cells),
    // probed mass silently falls short and recall decays as the nav
    // count outgrows a fixed efSearch (the fixed-nprobe failure mode)
    val cellsForMass = math.ceil(probeMass * index.graph.vecs.length).toInt
    if (cellsForMass > efSearch)
      org.slf4j.LoggerFactory.getLogger("graft.pipeline.Hnsw").warn(
        s"hnswTopK: efSearch=$efSearch surfaces at most $efSearch cells " +
          s"but probeMass=$probeMass needs ~$cellsForMass of " +
          s"${index.graph.vecs.length} — recall may fall below the mass " +
          "target; raise efSearch or lower probeMass")
    val probeU = F.udf((v: Array[Float]) =>
      probeCells(gB.value, sizes, total, v, efSearch, minProbe, probeMass))
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
        F.explode(probeU(F.col(vecCol))).as("__cell"))
    val scored = index.assigned.join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Metadata-filtered [[hnswTopK]]: candidates restricted to the ids
    * in `allowed` (one-column DataFrame) with the semi-join INSIDE the
    * probed cells — [[Similarity.ivfTopKFilteredIndexed]]'s pre-filter
    * strategy on the graph family. Selectivity compensation is the
    * caller's probeMass dial (mass/selectivity, the documented rule);
    * very selective filters are cheaper AND exact as a brute-force
    * scan of the filtered subset. */
  def hnswTopKFiltered(
      index: HnswIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      allowed: DataFrame,
      k: Int,
      efSearch: Int = 128,
      minProbe: Int = 4,
      probeMass: Double = 0.45): DataFrame = {
    val spark = index.assigned.sparkSession
    val gB = spark.sparkContext.broadcast(index.graph)
    val sizes = index.cellSizes
    val total = math.max(sizes.sum, 1L)
    val aCol = allowed.columns.head
    val ok = allowed.select(F.col(aCol).as("neighbor_id")).distinct()
    val probeU = F.udf((v: Array[Float]) =>
      probeCells(gB.value, sizes, total, v, efSearch, minProbe, probeMass))
    val q = queries.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
        F.explode(probeU(F.col(vecCol))).as("__cell"))
    val scored = index.assigned
      .join(ok, Seq("neighbor_id"), "left_semi")
      .join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos", Similarity.cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Measure the graph probe's mass→recall curve
    * ([[Similarity.calibrateIvfProbe]] on the graph family — replays
    * [[hnswTopK]]'s walk-ordered probe exactly, including `efSearch`
    * and `minProbe`). Calibrate at the efSearch you will query with:
    * the beam bounds how many cells a walk can surface, so the curve
    * is an (efSearch, mass) property, not a mass property alone. */
  def calibrateProbe(
      index: HnswIndex,
      k: Int = 10,
      nSample: Int = 64,
      efSearch: Int = 128,
      minProbe: Int = 4,
      grid: Seq[Double] = Similarity.DefaultCalibrationGrid)
      : Similarity.ProbeCalibration = {
    val sizes = index.cellSizes
    val total = math.max(sizes.sum, 1L)
    Similarity.calibrateProbe(index.assigned, k, nSample, grid,
      (v, m) => probeCells(index.graph, sizes, total, v, efSearch,
        minProbe, m))
  }

  /** Measure-and-persist — [[Similarity.recalibrateIvfIndex]]'s graph
    * sibling: the curve is stamped with the nav-cell count (geometry
    * validation) and the efSearch it was measured at (the graph curve
    * is an (efSearch, mass) property — query with the same beam). */
  def recalibrateHnswIndex(
      spark: SparkSession,
      path: String,
      k: Int = 10,
      nSample: Int = 64,
      efSearch: Int = 128,
      minProbe: Int = 4): Similarity.ProbeCalibration = {
    val idx = loadHnswIndex(spark, path)
    val cal = calibrateProbe(idx, k, nSample, efSearch, minProbe)
    Similarity.saveCalibration(spark, path, cal,
      cells = idx.graph.vecs.length, ef = efSearch)
    cal
  }

  /** [[hnswTopK]] with the mass solved from a requested recall target
    * via the index's measured curve ([[Similarity.ivfTopKTarget]]'s
    * graph sibling). Pass the SAME efSearch the curve was measured
    * at. */
  def hnswTopKTarget(
      index: HnswIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: Similarity.ProbeCalibration,
      efSearch: Int = 128,
      minProbe: Int = 4): DataFrame =
    hnswTopK(index, queries, idCol, vecCol, k, efSearch, minProbe,
      probeMass = cal.massFor(targetRecall))

  /** Nightly maintenance: assign a fresh batch with the FROZEN graph
    * (map-only) and append under the touched cells — the
    * [[Similarity.appendToIvfIndex]] contract on the shared layout.
    * Returns the reloaded index. */
  def appendToHnswIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String): HnswIndex = {
    appendBatchToHnswIndex(spark, path, fresh, idCol, vecCol, batchId = -1L)
    loadHnswIndex(spark, path)
  }

  /** One (batch or micro-batch) append: `-1` = batch maintenance
    * (pure file-adds); a real micro-batch id honors the maintenance
    * watermark and dynamic-overwrites exactly its own partitions —
    * the [[Similarity.appendToIvfIndexTouched]] protocol. */
  private[graft] def appendBatchToHnswIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      batchId: Long): Unit = {
    // a micro-batch at or below the maintenance watermark was already
    // mutated by a removal after it committed: its replay must write
    // nothing or taken-down vectors would resurrect
    if (batchId >= 0L &&
        batchId <= CellTable.readMaintainedThrough(spark, path)) return
    val idx = loadHnswIndex(spark, path)
    val gB = spark.sparkContext.broadcast(idx.graph)
    val assignU = F.udf((v: Array[Float]) => assignCell(gB.value, v))
    val rows = fresh.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        assignU(F.col(vecCol)).as("__cell"))
    if (!rows.isEmpty)
      CellTable.appendBatch(spark, s"$path/assigned", rows, batchId)
  }

  /** Continuous maintenance: each micro-batch assigns against the
    * frozen graph and lands under its own `__batch` partitions with
    * dynamic overwrite (replay-idempotent) — the
    * [[Similarity.streamToIvfIndex]] protocol on the shared layout.
    * One streaming writer per path; the writer lease heartbeats so
    * removals refuse until the stop-then-release handshake. */
  def streamToHnswIndex(
      stream: DataFrame,
      path: String,
      idCol: String,
      vecCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendBatchToHnswIndex(batch.sparkSession, path, batch, idCol,
          vecCol, batchId)
        ()
    }

  /** Takedown removal — the shared touched-cell pass over the
    * [[CellTable]] layout ([[Similarity.removeFromIvfIndex]]'s
    * contract: single-maintainer lock, writer lease enforced). The
    * navigation graph is untouched (nav nodes are ROUTING points, not
    * corpus rows — a removed document's vector may keep routing, like
    * a frozen IVF centroid). Returns the reloaded index. */
  def removeFromHnswIndex(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): HnswIndex = {
    Similarity.removeFromCellTable(spark, path, s"$path/assigned", ids, idCol)
    loadHnswIndex(spark, path)
  }

  /** Fold retired streaming batches — [[Similarity.compactIvfIndex]]
    * on the shared layout. */
  def compactHnswIndex(spark: SparkSession, path: String): HnswIndex = {
    CellTable.compact(spark, path, s"$path/assigned")
    loadHnswIndex(spark, path)
  }

  /** Cell-occupancy drift of a fresh batch vs the saved graph:
    * assign the batch with the FROZEN graph (map-only walk) and
    * compare occupancy against the index's stored cell sizes with the
    * same add-one-smoothed PSI as
    * [[graft.pipeline.Drift.embeddingDrift]]. Returns
    * (n_index, n_batch, psi). */
  def hnswDrift(
      index: HnswIndex,
      batch: DataFrame,
      vecCol: String,
      roundTo: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val k = index.graph.vecs.length
    val occIdx = index.cellSizes
    val gB = spark.sparkContext.broadcast(index.graph)
    val assignU = F.udf((v: Array[Float]) => assignCell(gB.value, v))
    val occBatch = {
      val occ = new Array[Long](k)
      batch.filter(F.col(vecCol).isNotNull)
        .select(assignU(F.col(vecCol)).as("__cell"))
        .groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
        .collect().foreach { r =>
          val c = r.getInt(0)
          if (c >= 0 && c < k) occ(c) = r.getLong(1)
        }
      occ
    }
    val nIdx = occIdx.sum
    val nBatch = occBatch.sum
    var psi = 0.0
    var c = 0
    while (c < k) {
      val pi = (occIdx(c) + 1).toDouble / (nIdx + k)
      val pb = (occBatch(c) + 1).toDouble / (nBatch + k)
      psi += (pb - pi) * math.log(pb / pi)
      c += 1
    }
    val rounded = BigDecimal(psi)
      .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.range(1).select(
      F.lit(nIdx).as("n_index"),
      F.lit(nBatch).as("n_batch"),
      F.lit(rounded).as("psi"))
  }

  /** Drift-triggered retrain policy —
    * [[Similarity.maybeRetrainIvfIndex]] on the graph family: at or
    * above `psiThreshold` the staged-swap [[retrainHnswIndex]] runs;
    * below it the only cost is one frozen-graph assignment pass.
    * Geometry defaults (`maxNav`, `m`, `efConstruction`, `efAssign`)
    * come from the SAVED index — the nodes layout persists the build
    * parameters, so a drift-triggered retrain reproduces the geometry
    * the index was built with unless the caller explicitly overrides
    * (a -1 means "as stored"). Append first, then maybeRetrain, so a
    * rebuild absorbs the fresh rows. Returns (retrained, psi). */
  def maybeRetrainHnswIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      vecCol: String,
      psiThreshold: Double = 0.2,
      maxNav: Int = -1,
      m: Int = -1,
      efConstruction: Int = -1,
      efAssign: Int = -1): (Boolean, Double) = {
    val cur = loadHnswIndex(spark, path)
    val psi = hnswDrift(cur, fresh, vecCol).head().getDouble(2)
    if (psi < psiThreshold) (false, psi)
    else {
      val nav = if (maxNav > 0) maxNav else cur.graph.vecs.length
      retrainHnswIndex(spark, path, nav,
        if (m > 0) m else cur.graph.m,
        if (efConstruction > 0) efConstruction else cur.graph.efConstruction,
        if (efAssign > 0) efAssign else cur.graph.efAssign)
      (true, psi)
    }
  }

  /** Auto-compaction dial — [[Similarity.maybeCompactIvfIndex]] on
    * the shared layout. */
  def maybeCompactHnswIndex(
      spark: SparkSession, path: String, maxFilesPerCell: Int = 4): Boolean =
    CellTable.maybeCompact(spark, path, s"$path/assigned", maxFilesPerCell)

  private val ManagedDirs = Seq("assigned", "nodes", "edges")

  /** Zero-downtime re-train — [[Similarity.retrainIvfIndex]]'s
    * protocol on the graph index: a fresh graph + navigation geometry
    * trained over the index's own contents, staged whole, journaled,
    * swapped. Lock held; writer lease enforced; stream-batch replays
    * suppressed (their rows land in the rebuilt base layer). */
  def retrainHnswIndex(
      spark: SparkSession,
      path: String,
      maxNav: Int = 1024,
      m: Int = 16,
      efConstruction: Int = 64,
      efAssign: Int = 16,
      iterations: Int = 2,
      seed: Long = 42L): HnswIndex =
      Maintenance.withExclusiveLock(spark, path) {
    StagedSwap.recoverLocked(spark, path, ManagedDirs)
    CellTable.recover(spark, s"$path/assigned")
    val priorCal = Similarity.loadCalibrationMeta(spark, path)
    // the retrain rebuilds graph and assignment from the rows alone —
    // loading the full index here paid two graph collects plus a
    // corpus-scale cell-size aggregate it immediately threw away
    val rows = loadAssignedOnly(spark, path)
      .select(F.col("neighbor_id"), F.col("__cv"))
      .localCheckpoint(eager = false)
    StagedSwap.suppressStreamReplays(spark, path, s"$path/assigned")
    StagedSwap.run(spark, path, ManagedDirs, () => (), () => ()) { staging =>
      buildHnswIndex(rows, "neighbor_id", "__cv", maxNav, m,
        efConstruction, efAssign, iterations, seed).save(staging)
    }
    // fresh navigation geometry invalidates any measured curve; a
    // calibrated index recalibrates in place at the SAME k and
    // efSearch (recalibrate wherever you retrain)
    Similarity.dropCalibration(spark, path)
    priorCal.foreach { case (c, _, ef) =>
      recalibrateHnswIndex(spark, path, c.k,
        efSearch = if (ef > 0) ef else 128) }
    loadHnswIndex(spark, path)
  }

  /** Crash repair for [[retrainHnswIndex]] and [[addNavNodes]]. */
  def recoverRetrain(spark: SparkSession, path: String): Unit =
    Maintenance.withLock(spark, path) {
      StagedSwap.recoverLocked(spark, path, ManagedDirs)
    }

  /**
   * Incremental navigation growth — the adaptation path BETWEEN
   * appends (which freeze the graph) and [[retrainHnswIndex]] (which
   * rebuilds everything): train `maxNewNav` spherical k-means points
   * over the FRESH batch only (the drifted region — one bounded pass
   * over the batch, never the corpus), [[insertNav]] them into the
   * existing graph (O(new · ef · M) driver work vs the full rebuild's
   * O(nav · ef · M)), and re-walk the corpus once (map-only) so every
   * row sits at its new-graph assignment — the exact-copy guarantee
   * (assign walk ≡ probe walk on the SAME graph) survives the
   * mutation, which a graph-swap without reassignment would break.
   * Staged like retrain (whole-dir staging + journal + swap): the
   * reassignment write is full-table, but the TRAINING cost is
   * batch-bounded — that is the saving, measured in SCALING.md.
   * Writer-exclusive; stream-batch replays suppressed (their rows
   * land in the rebuilt base layer). Returns the reloaded index.
   */
  def addNavNodes(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      maxNewNav: Int,
      iterations: Int = 2,
      seed: Long = 42L): HnswIndex =
    addNavNodesImpl(spark, path, fresh, idCol, vecCol, maxNewNav, iterations,
      seed, () => (), () => ())

  private[graft] def addNavNodesImpl(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      maxNewNav: Int,
      iterations: Int,
      seed: Long,
      afterStage: () => Unit,
      afterJournal: () => Unit): HnswIndex =
      Maintenance.withExclusiveLock(spark, path) {
    require(maxNewNav >= 1, s"maxNewNav must be >= 1, got $maxNewNav")
    StagedSwap.recoverLocked(spark, path, ManagedDirs)
    CellTable.recover(spark, s"$path/assigned")
    val priorCal = Similarity.loadCalibrationMeta(spark, path)
    // graph + nav ids only: the growth path never reads cell sizes
    // (the full load's corpus-scale aggregate), and the assignment is
    // re-walked below anyway
    val (curGraph, curNavIds) = loadGraphOnly(spark, path)
    val normU = F.udf((v: Array[Float]) => normalize(v))
    val navsNew = Similarity.trainCentroids(
      fresh.filter(F.col(vecCol).isNotNull)
        .withColumn("__nv", normU(F.col(vecCol))),
      idCol, "__nv", maxNewNav, iterations)
    require(navsNew.nonEmpty, "addNavNodes: no non-null vectors in the batch")
    val g2 = insertNav(curGraph, navsNew, seed)
    val rows = loadAssignedOnly(spark, path)
      .select(F.col("neighbor_id"), F.col("__cv"))
      .localCheckpoint(eager = false)
    require(!rows.isEmpty, s"addNavNodes: index at $path is empty")
    StagedSwap.suppressStreamReplays(spark, path, s"$path/assigned")
    val gB = spark.sparkContext.broadcast(g2)
    val assignU = F.udf((v: Array[Float]) => assignCell(gB.value, v))
    val navIds = curNavIds ++
      (curGraph.vecs.length until g2.vecs.length).map(_.toLong)
    StagedSwap.run(spark, path, ManagedDirs, afterStage, afterJournal) {
      staging =>
        // ONE corpus pass: the re-walk feeds the staged write directly.
        // cellSizes are never persisted (loadHnswIndex re-derives them),
        // so computing them here would be a second full walk for nothing
        val assigned = rows.select(F.col("neighbor_id"), F.col("__cv"),
          assignU(F.col("__cv")).as("__cell"))
        CellTable.writeBase(assigned, s"$staging/assigned")
        writeGraph(spark, g2, navIds, staging)
    }
    // the grown graph re-routes walks — any measured curve is stale;
    // a calibrated index recalibrates in place (same k, same beam)
    Similarity.dropCalibration(spark, path)
    priorCal.foreach { case (c, _, ef) =>
      recalibrateHnswIndex(spark, path, c.k,
        efSearch = if (ef > 0) ef else 128) }
    loadHnswIndex(spark, path)
  }

  /** Drift-dialed navigation growth — [[maybeRetrainHnswIndex]]'s
    * cheaper first line: at or above `psiThreshold` the drifted
    * batch's region gets `maxNewNav` new navigation cells
    * ([[addNavNodes]] — batch-bounded training, no corpus
    * re-clustering); below it the only cost is the frozen-graph
    * drift measurement. Escalation guidance: expand on moderate
    * drift, [[retrainHnswIndex]] when repeated expansions stop
    * lowering the PSI (geometry truly moved). Returns
    * (expanded, psi). */
  def maybeExpandHnswIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      psiThreshold: Double = 0.2,
      maxNewNav: Int = 16): (Boolean, Double) = {
    val cur = loadHnswIndex(spark, path)
    val psi = hnswDrift(cur, fresh, vecCol).head().getDouble(2)
    if (psi < psiThreshold) (false, psi)
    else {
      addNavNodes(spark, path, fresh, idCol, vecCol, maxNewNav)
      (true, psi)
    }
  }
}

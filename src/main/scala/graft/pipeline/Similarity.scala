package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Similarity search over embedding columns (Array[Float]).
 *
 * Brute-force cosine top-k is the exact baseline: O(|Q|·|corpus|) dot
 * products, embarrassingly parallel after broadcasting the (small)
 * query set. The LSH variant (random-hyperplane signatures) is the
 * scale path: bucket-join on signature prefix so each query only
 * scores a fraction of the corpus.
 */
object Similarity {

  // Array[Float] parameters deserialize from Spark's ArrayData without
  // per-element boxing — measurably faster than Seq[Float] on wide
  // fanouts. NULL vectors yield NULL (repo-wide discipline: malformed
  // input never throws).
  private val dotUdf = F.udf((a: Array[Float], b: Array[Float]) => {
    val r: java.lang.Double =
      if (a == null || b == null) null
      else {
        var s = 0.0
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        java.lang.Double.valueOf(s)
      }
    r
  })

  private val normUdf = F.udf((a: Array[Float]) => {
    val r: java.lang.Double =
      if (a == null) null
      else {
        var s = 0.0
        var i = 0
        while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
        java.lang.Double.valueOf(math.sqrt(s))
      }
    r
  })

  /** cosine(a, b) as a Column over two Array[Float] columns. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dotUdf(a, b) / (normUdf(a) * normUdf(b))

  /**
   * Late-interaction rerank (the ColBERT MaxSim scoring, Khattab &
   * Zaharia 2020): queries and documents are MULTI-VECTOR (one
   * embedding per token/segment) and
   *
   *   score(q, d) = Σ_{i ∈ q} max_{j ∈ d} cos(q_i, d_j)
   *
   * — each query vector matches its best document vector
   * independently, so partial/compositional matches score where a
   * single pooled vector washes them out. `candidates` (query_id,
   * doc_id) bounds the interaction to a first-stage pool (ANN over
   * pooled vectors, or BM25) — the standard two-stage serving shape;
   * the full quadratic interaction never runs corpus-wide.
   *
   * Returns (query_id, rank, doc_id, score) top-k per query, ties by
   * doc_id. An exact planted contract rides the testdata argument:
   * when a query IS some document's vector set, every per-vector max
   * is exactly 1.0 against that document and < 1 elsewhere, so it
   * ranks first unconditionally.
   *
   * Scale shape: candidates and query vectors are serving-bounded —
   * both broadcast onto the doc-vector scan (corpus touched once,
   * map-side); one repartition on (query_id, doc_id) serves BOTH the
   * per-query-vector max and the per-document sum (grouping keys ⊇
   * partition keys, the gapFill contract); the final top-k window
   * runs over pool-sized rows.
   */
  def maxSimRerank(
      candidates: DataFrame,
      queryVecs: DataFrame,
      docVecs: DataFrame,
      k: Int): DataFrame = {
    val cand = candidates.select(F.col(candidates.columns(0)).as("query_id"),
      F.col(candidates.columns(1)).as("doc_id"))
    val qv = queryVecs.select(F.col(queryVecs.columns(0)).as("query_id"),
      F.col(queryVecs.columns(1)).as("__qvid"),
      F.col(queryVecs.columns(2)).as("__qv"))
    // doc vec ids are irrelevant (max over j): accept (doc_id, vec)
    // or the symmetric (doc_id, vec_id, vec)
    val dvCol = if (docVecs.columns.length >= 3) docVecs.columns(2)
                else docVecs.columns(1)
    val dv = docVecs.select(F.col(docVecs.columns(0)).as("doc_id"),
      F.col(dvCol).as("__dv"))
    val interactions = dv
      .join(F.broadcast(cand), "doc_id")
      .join(F.broadcast(qv), "query_id")
      .withColumn("__cos", cosine(F.col("__qv"), F.col("__dv")))
      .repartition(F.col("query_id"), F.col("doc_id"))
    val scored = interactions
      .groupBy(F.col("query_id"), F.col("doc_id"), F.col("__qvid"))
      .agg(F.max(F.col("__cos")).as("__m"))
      .groupBy(F.col("query_id"), F.col("doc_id"))
      .agg(F.sum(F.col("__m")).as("score"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("score").desc, F.col("doc_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }

  /**
   * Exact top-k nearest neighbors by cosine for each query vector.
   * `queries` is expected to be small — it is broadcast, so the corpus
   * is scanned exactly once with no shuffle of the embeddings.
   * Returns (query_id, rank, neighbor_id, cos).
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored
      .withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /**
   * Margin-scored pair mining (Artetxe & Schwenk 2019 — the
   * LASER/CCMatrix bitext-mining criterion): for each query `x` in
   * `a`, its cosine-top-`k` candidates `y` in `b` scored by
   *
   *   margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)
   *
   * where avgK(x) is the mean cosine of x's `kAvg` nearest candidates
   * in `b` and avgK(y) the mean of y's `kAvg` nearest in `a` — the
   * ratio-margin that suppresses hub vectors (high similarity to
   * everything) which absolute cosine thresholds cannot. margin > 1
   * means the pair stands out above both local neighborhoods;
   * translation mining typically keeps margin >= ~1.05.
   *
   * Returns (a_id, b_id, rank, cos, margin) with rank = x's cosine
   * rank of y (ties broken by b_id, deterministic).
   *
   * Scale shape: ONE pass materializes the a x b cosine table with
   * `a` BROADCAST onto the `b` scan (a is the bounded query side —
   * mining batches of queries against a corpus; for corpus x corpus
   * mining, batch `a`). Both neighborhood averages and the rank come
   * from two window passes over that table — no second scan of
   * either side.
   */
  def mineMarginPairs(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kAvg: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kAvg >= 1, s"kAvg must be >= 1, got $kAvg")
    val qa = a.select(F.col(idCol).as("a_id"), F.col(vecCol).as("__av"))
    val cb = b.select(F.col(idCol).as("b_id"), F.col(vecCol).as("__bv"))
    val pairs = cb.crossJoin(F.broadcast(qa))
      .withColumn("cos", cosine(F.col("__av"), F.col("__bv")))
      .select(F.col("a_id"), F.col("b_id"), F.col("cos"))
      .localCheckpoint(eager = false) // feeds three windows below
    val wa = Window.partitionBy(F.col("a_id"))
      .orderBy(F.col("cos").desc, F.col("b_id").asc)
    val wb = Window.partitionBy(F.col("b_id"))
      .orderBy(F.col("cos").desc, F.col("a_id").asc)
    val ranked = pairs
      .withColumn("__ra", F.row_number().over(wa))
      .withColumn("__rb", F.row_number().over(wb))
    val avgA = ranked.filter(F.col("__ra") <= kAvg)
      .groupBy(F.col("a_id")).agg(F.avg(F.col("cos")).as("__avga"))
    val avgB = ranked.filter(F.col("__rb") <= kAvg)
      .groupBy(F.col("b_id")).agg(F.avg(F.col("cos")).as("__avgb"))
    ranked
      .filter(F.col("__ra") <= k)
      .join(avgA, "a_id")
      .join(avgB, "b_id")
      .select(F.col("a_id"), F.col("b_id"),
        F.col("__ra").cast("long").as("rank"), F.col("cos"),
        (F.col("cos") / ((F.col("__avga") + F.col("__avgb")) / 2.0)).as("margin"))
  }

  /**
   * Margin-scored pair mining against prebuilt IVF indexes on BOTH
   * sides — the corpus x corpus form of [[mineMarginPairs]]. Each
   * side's vectors probe the OTHER side's cells (mass-adaptive like
   * [[ivfTopKIndexed]]), candidates join cell-to-cell with a SHUFFLE
   * hash join — neither corpus is broadcast and no cartesian product
   * ever forms, so both sides can be web-scale. The same 3-window
   * LASER margin math runs over the probed candidate set; ranks and
   * neighborhood averages are therefore over FOUND candidates
   * (approximate, like every IVF probe — measure recall vs the exact
   * form on samples). A `b` candidate whose own reverse probe found
   * no `a` rows (possible only when probed cells are empty) falls
   * back to the query-side average rather than dropping the pair.
   */
  def mineMarginPairsIndexed(
      aIndex: IvfIndex,
      bIndex: IvfIndex,
      k: Int,
      kAvg: Int = 4,
      nprobe: Int = 4,
      probeMass: Double = 0.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kAvg >= 1, s"kAvg must be >= 1, got $kAvg")
    val need = math.max(k, kAvg)
    // a-side rows probe b's cells; candidates come from b's assignment.
    val ab = probeCandidates(bIndex, aIndex.assigned, nprobe, probeMass,
        "a_id", "b_id")
      .localCheckpoint(eager = false) // feeds the rank window AND avgA
    val wa = Window.partitionBy(F.col("a_id"))
      .orderBy(F.col("cos").desc, F.col("b_id").asc)
    val rankedA = ab.withColumn("__ra", F.row_number().over(wa))
      .filter(F.col("__ra") <= need)
    val avgA = rankedA.filter(F.col("__ra") <= kAvg)
      .groupBy(F.col("a_id")).agg(F.avg(F.col("cos")).as("__avga"))
    // reverse direction: b-side rows probe a's cells.
    val ba = probeCandidates(aIndex, bIndex.assigned, nprobe, probeMass,
        "b_id", "a_id")
    val wb = Window.partitionBy(F.col("b_id"))
      .orderBy(F.col("cos").desc, F.col("a_id").asc)
    val avgB = ba.withColumn("__rb", F.row_number().over(wb))
      .filter(F.col("__rb") <= kAvg)
      .groupBy(F.col("b_id")).agg(F.avg(F.col("cos")).as("__avgb"))
    rankedA
      .filter(F.col("__ra") <= k)
      .join(avgA, Seq("a_id"))
      .join(avgB, Seq("b_id"), "left")
      .withColumn("__avgb", F.coalesce(F.col("__avgb"), F.col("__avga")))
      .select(F.col("a_id"), F.col("b_id"),
        F.col("__ra").cast("long").as("rank"), F.col("cos"),
        (F.col("cos") / ((F.col("__avga") + F.col("__avgb")) / 2.0)).as("margin"))
  }

  /**
   * [[mineMarginPairsIndexed]] convenience: builds scale-aware IVF
   * indexes (nlist = sqrt(n)) over both sides, then mines with
   * mass-adaptive probing. At real scale build the indexes once with
   * [[buildIvfIndex]]/[[IvfIndex.save]] and call the indexed form per
   * batch.
   */
  def mineMarginPairsAuto(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kAvg: Int = 4,
      probeMass: Double = 0.45,
      iterations: Int = 2): DataFrame = {
    val ai = buildIvfIndex(a, idCol, vecCol, ivfNlistFor(a.count()), iterations)
    val bi = buildIvfIndex(b, idCol, vecCol, ivfNlistFor(b.count()), iterations)
    mineMarginPairsIndexed(ai, bi, k, kAvg, nprobe = 4, probeMass = probeMass)
  }

  /** Probe `index` with the vectors of `rows` (an [[IvfIndex.assigned]]
    * frame: `neighbor_id`, `__cv`, `__cell`), joining candidates
    * cell-to-cell WITHOUT broadcasting either side. Returns
    * (`pIdName`, `nIdName`, cos) for every (probe row, candidate in a
    * probed cell) pair with distinct ids. */
  private def probeCandidates(
      index: IvfIndex,
      rows: DataFrame,
      nprobe: Int,
      probeMass: Double,
      pIdName: String,
      nIdName: String): DataFrame = {
    val probeU = probeCellsUdf(index, nprobe, probeMass)
    val probes = rows.select(
      F.col("neighbor_id").as(pIdName), F.col("__cv").as("__pv"),
      F.explode(probeU(F.col("__cv"))).as("__cell"))
    val cands = index.assigned.select(
      F.col("neighbor_id").as(nIdName), F.col("__cv").as("__nv"),
      F.col("__cell"))
    cands.join(probes, Seq("__cell"))
      .filter(F.col(nIdName) =!= F.col(pIdName))
      .select(F.col(pIdName), F.col(nIdName),
        cosine(F.col("__pv"), F.col("__nv")).as("cos"))
    // no dedup needed: a candidate lives in exactly ONE cell and the
    // probe list is distinct cells, so each pair joins at most once
  }

  /** The cell-probe UDF of [[ivfTopKIndexed]]: `nprobe` nearest cells,
    * or mass-adaptive (distance-ordered cells until `probeMass` of the
    * corpus is covered) when `probeMass > 0`. Cell sizes come from one
    * bounded nlist-row aggregate over the index. */
  private def probeCellsUdf(
      index: IvfIndex,
      nprobe: Int,
      probeMass: Double): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(probeMass >= 0.0 && probeMass <= 1.0,
      s"probeMass must be in [0, 1], got $probeMass")
    val spark = index.assigned.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    if (probeMass == 0.0)
      F.udf((v: Array[Float]) => nearestCentroids(cB.value, v, nprobe))
    else {
      val sizes = new Array[Long](index.centroids.length)
      index.assigned.groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
        .collect().foreach { r =>
          val c = r.getInt(0)
          if (c >= 0 && c < sizes.length) sizes(c) = r.getLong(1)
        }
      val total = sizes.sum
      val sB = spark.sparkContext.broadcast(sizes)
      F.udf((v: Array[Float]) =>
        nearestCentroidsByMass(cB.value, sB.value, total, v, nprobe, probeMass))
    }
  }

  /** Deterministic random-ish hyperplane: dimension d's coefficient for
    * plane p is a fixed hash-derived value in [-1, 1). */
  private def planeCoef(plane: Int, dim: Int): Double = {
    val h = TextFunctions.mix64(plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  // Hyperplane rows are pure functions of (plane, dim) — materialize each
  // once per executor instead of re-hashing mix64 per row x plane x dim
  // (the signature scan is the whole cost of the LSH index build).
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  private def planeRow(plane: Int, dim: Int): Array[Double] =
    coefCache.computeIfAbsent((plane, dim),
      _ => Array.tabulate(dim)(d => planeCoef(plane, d)))

  /** Signatures for L independent random-hyperplane tables of `planes`
    * bits each; position in the result = table index. NULL vector →
    * NULL signature array (the row then drops out of any explode). */
  private[pipeline] def tableSigsUdf(tables: Int, planes: Int) = F.udf((v: Array[Float]) => {
    val r: Seq[Int] =
      if (v == null) null
      else (0 until tables).map { t =>
        var sig = 0
        var p = 0
        while (p < planes) {
          val row = planeRow(t * planes + p, v.length)
          var s = 0.0
          var i = 0
          while (i < v.length) { s += row(i) * v(i); i += 1 }
          if (s >= 0) sig |= (1 << p)
          p += 1
        }
        sig
      }
    r
  })

  /**
   * LSH-bucketed approximate top-k: L independent random-hyperplane
   * tables of `planes` bits; candidates are corpus vectors sharing a
   * bucket with the query in any table (plus single-bit probes on the
   * query side). Multiple tables are essential for recall when nearest
   * neighbors sit at moderate angles; each corpus vector is replicated
   * L times into the bucket index, which stays tiny relative to the
   * embeddings. Recall < 1 by design; verify with [[bruteForceTopK]] on
   * samples.
   */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      planes: Int = 8,
      probeBits: Int = 1): DataFrame = {
    require(planes <= 24, "signature must stay a small int")
    require(probeBits >= 0 && probeBits <= 1,
      "only 0 (exact bucket) or 1 (single-bit probes) are implemented")
    val sigU = tableSigsUdf(tables, planes)
    val probes = F.udf((sigs: Seq[Int]) => {
      sigs.zipWithIndex.flatMap { case (sig, t) =>
        val base = List((t, sig))
        val exp = if (probeBits >= 1) (0 until planes).map(b => (t, sig ^ (1 << b))) else Nil
        base ++ exp
      }.distinct
    })
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
                          F.posexplode(sigU(F.col(vecCol))).as(Seq("__t", "__sig")))
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
                           F.explode(probes(sigU(F.col(vecCol)))).as("__ts"))
      .select(F.col("query_id"), F.col("__qv"),
              F.col("__ts._1").as("__t"), F.col("__ts._2").as("__sig"))
    val scored = c.join(F.broadcast(q), Seq("__t", "__sig"))
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("__qv"), F.col("__cv"))
      .distinct()
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  // ------------------------------------------------------------------ IVF

  /** Deterministic k-means (Lloyd) over the corpus: seeded init from
    * hash-ordered sample, `iterations` assignment/mean rounds. Centroids
    * are collected to the driver (nlist is small by design) and
    * broadcast back for assignment — the corpus itself never shuffles
    * by vector. */
  private[pipeline] def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iterations: Int): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // orderBy + limit compiles to TakeOrderedAndProject: per-partition
    // top-nlist then a driver merge — no global sort even at corpus scale
    val seeds: Array[Array[Float]] = corpus
      .select(F.col(idCol), F.col(vecCol))
      .orderBy(F.abs(F.hash(F.col(idCol))), F.col(idCol))
      .limit(nlist)
      .select(F.col(vecCol)).as[Array[Float]].collect()
    if (seeds.isEmpty) return seeds
    // train at the seed sample's modal dimension — keying off seeds(0)
    // would let one ragged vector that happens to hash first invert the
    // ragged-vector filter below and train on garbage
    val dim = seeds.map(_.length).groupBy(identity)
      .maxBy { case (d, g) => (g.length, d) }._1
    var centroids = seeds.filter(_.length == dim)
    for (_ <- 1 to iterations) {
      val cB = spark.sparkContext.broadcast(centroids)
      val assignU = F.udf((v: Array[Float]) => nearestCentroid(cB.value, v))
      // distributed mean via ONE vec_sum aggregate carrying a dim-wide
      // buffer: map-side partials mean the shuffle carries nlist x dim
      // partial sums per partition, and — unlike `dim` separate
      // sum(element_at) columns — plan width stays constant, so real
      // embedding widths (768-1536) neither blow codegen limits nor
      // crawl through expression compilation. Only nlist aggregated
      // rows reach the driver. Ragged vectors are excluded from
      // centroid training (vec_sum would skip them anyway; the filter
      // also keeps the count consistent) — assignment still tolerates
      // them via nearestCentroid's min-length loop.
      val means = corpus
        .filter(F.size(F.col(vecCol)) === dim)
        .select(assignU(F.col(vecCol)).as("__c"), F.col(vecCol).as("__v"))
        .groupBy(F.col("__c"))
        .agg(F.count(F.lit(1)).cast("double").as("__n"),
             VectorAgg.vec_sum(F.col("__v")).as("__s"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { row =>
        val c = row.getInt(0)
        val n = row.getDouble(1)
        if (n > 0 && !row.isNullAt(2)) {
          val s = row.getSeq[Double](2)
          var d = 0
          while (d < dim) { next(c)(d) = (s(d) / n).toFloat; d += 1 }
        }
      }
      centroids = next
      cB.destroy()
    }
    centroids
  }

  private[pipeline] def nearestCentroid(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      val cc = cs(c)
      val n = math.min(cc.length, v.length)
      while (i < n) { val t = cc(i) - v(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[pipeline] def nearestCentroids(cs: Array[Array[Float]], v: Array[Float], m: Int): Seq[Int] = {
    cs.indices.map { c =>
      var d = 0.0
      var i = 0
      val cc = cs(c)
      val n = math.min(cc.length, v.length)
      while (i < n) { val t = cc(i) - v(i); d += t * t; i += 1 }
      (c, d)
    }.sortBy(_._2).take(m).map(_._1)
  }

  /** Distance-ordered cells until their cumulative size reaches
    * `mass` x total (at least `minProbe` cells) — the probed corpus
    * fraction, and with it recall, stays roughly constant as the
    * corpus grows instead of decaying at a fixed nprobe. */
  private[pipeline] def nearestCentroidsByMass(
      cs: Array[Array[Float]],
      sizes: Array[Long],
      total: Long,
      v: Array[Float],
      minProbe: Int,
      mass: Double): Seq[Int] = {
    val ordered = cs.indices.map { c =>
      var d = 0.0
      var i = 0
      val cc = cs(c)
      val n = math.min(cc.length, v.length)
      while (i < n) { val t = cc(i) - v(i); d += t * t; i += 1 }
      (c, d)
    }.sortBy(_._2)
    val want = math.ceil(mass * total).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var acc = 0L
    var i = 0
    while (i < ordered.length && (out.length < minProbe || acc < want)) {
      val c = ordered(i)._1
      out += c
      acc += (if (c < sizes.length) sizes(c) else 0L)
      i += 1
    }
    out.toSeq
  }

  /** A built IVF index: trained centroids plus the cell-assigned corpus
    * (`neighbor_id`, `__cv`, `__cell`) — [[IvfIndex.save]] persists it
    * and [[Similarity.loadIvfIndex]] reloads it, so the one-off
    * indexing pass is reused across sessions and query batches. */
  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame) {
    /** Persist to `path`: the assignment as parquet PARTITIONED BY cell
      * (a query batch with nprobe cells then partition-prunes its scan
      * to nprobe/nlist of the index files) plus the nlist centroid rows
      * as a side parquet. */
    def save(path: String): Unit = {
      val spark = assigned.sparkSession
      import spark.implicits._
      // cluster each cell into one task before the partitioned write
      // (the SketchView lesson): without it every task holds a slice
      // of MANY cells and opens a file per slice — tasks x nlist
      // small files that every later probe pays to list. The base
      // build lands under __batch=-1 (the SketchView / TextIndex
      // batch-stamped protocol) so streaming appends are
      // replay-idempotent per micro-batch.
      CellTable.writeBase(assigned, s"$path/assigned")
      centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("cell", "centroid")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/centroids")
    }
  }

  /** Reload an index written by [[IvfIndex.save]]. */
  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex =
    IvfIndex(
      {
        import spark.implicits._
        spark.read.parquet(s"$path/centroids")
          .orderBy("cell").select("centroid").as[Array[Float]].collect()
      },
      loadIvfAssigned(spark, path))

  /** Just the assignment frame of a saved index — lazy (no driver
    * job), shared by [[loadIvfIndex]] and the maintenance paths that
    * never touch the centroids (a full load pays a centroid-collect
    * job they would throw away). Partition column comes back as its
    * own column; restore the int type. Journal-aware: exact even
    * mid-crashed-compact. */
  private def loadIvfAssigned(spark: SparkSession, path: String): DataFrame =
    CellTable.readVisible(spark, s"$path/assigned", "__cell")
      .withColumn("__cell", F.col("__cell").cast("int"))
      .select("neighbor_id", "__cv", "__cell")

  /**
   * Nightly IVF maintenance: assign a fresh vector batch against the
   * SAVED index's FROZEN centroids (map-only, broadcast centroids) and
   * append the rows to the cell-partitioned assignment parquet — the
   * corpus index grows without re-clustering and without rewriting
   * history (each append adds files under the touched cell partitions
   * only). Rows with NULL vectors are skipped. Returns the reloaded
   * index over the grown assignment.
   *
   * Every probe API (`ivfTopKIndexed`, `ivfRadiusPairs`,
   * `semanticContaminationFlagsIndexed`, ...) works on the appended
   * index unchanged; exact re-ingested copies keep probing their own
   * cell (frozen centroids make the assignment deterministic).
   * Re-train when the drift telemetry ([[Drift]]) says the embedding
   * distribution left the centroids behind — appends never do.
   */
  def appendToIvfIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String): IvfIndex =
    appendToIvfIndexTouched(spark, path, fresh, idCol, vecCol)._1

  /** [[appendToIvfIndex]] also returning the TOUCHED cell set — the
    * batch is assigned exactly once (checkpointed), so callers that
    * need the cells ([[Diversity.d4Incremental]]) do not pay a second
    * assignment pass. `batchId = -1` is batch maintenance (pure
    * file-adds); a real micro-batch id writes its own `__batch`
    * partitions with dynamic overwrite and honors the maintenance
    * watermark — the [[graft.pipeline.Retrieval.appendBatchToTextIndex]]
    * protocol applied to the vector index. */
  private[graft] def appendToIvfIndexTouched(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      batchId: Long = -1L): (IvfIndex, Seq[Int]) = {
    // a micro-batch at or below the maintenance watermark was already
    // mutated by a removal after it committed: its replay must write
    // nothing or taken-down vectors would resurrect
    if (batchId >= 0L &&
        batchId <= CellTable.readMaintainedThrough(spark, path))
      return (loadIvfIndex(spark, path), Seq.empty)
    val idx = loadIvfIndex(spark, path)
    val cB = spark.sparkContext.broadcast(idx.centroids)
    val assignU = F.udf((v: Array[Float]) => nearestCentroid(cB.value, v))
    val assigned = fresh.filter(F.col(vecCol).isNotNull)
      .select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
        assignU(F.col(vecCol)).as("__cell"))
      .localCheckpoint(eager = false)
    // bounded by nlist — driver-side is fine
    val touched = assigned.select(F.col("__cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // an all-empty batch writes nothing — in particular it must NOT
    // clear an empty-index schema sentinel (zero-row partitioned
    // writes land no files; the dir would become uninferrable)
    if (touched.nonEmpty)
      CellTable.appendBatch(spark, s"$path/assigned", assigned, batchId)
    // centroids are FROZEN across appends: reuse the ones already
    // collected instead of paying a second centroid-collect job
    (IvfIndex(idx.centroids, loadIvfAssigned(spark, path)), touched)
  }

  /**
   * Fold a saved IVF index's retired micro-batches into the base
   * `__batch=-1` layer, one file per cell — the small-file reclaim for
   * long-lived [[streamToIvfIndex]] writers. The newest streaming
   * batch stays merge-on-read (a concurrent writer may be mid-commit
   * of exactly it); a crash-replay of a FOLDED batch writes nothing
   * (the fold advances `_maintained_through` before pruning).
   * Crash-safe via a staged fold + file journal; any entry-point
   * maintenance call (compact, removal) finishes a crashed fold
   * first. Single-maintainer; the streaming writer may keep running.
   * Returns the reloaded index.
   */
  def compactIvfIndex(spark: SparkSession, path: String): IvfIndex = {
    CellTable.compact(spark, path, s"$path/assigned")
    loadIvfIndex(spark, path)
  }

  /** [[compactIvfIndex]] with the crash-window hook (test/bench seam:
    * throwing from `afterJournal` leaves the index in the
    * journaled-but-unfinished state readVisible must stay exact in —
    * and the state the journal-read-tax bench measures). */
  private[graft] def compactIvfIndexImpl(
      spark: SparkSession, path: String, afterJournal: () => Unit): Unit =
    CellTable.compact(spark, path, s"$path/assigned", afterJournal)

  /** Auto-compaction policy hook: [[compactIvfIndex]] iff the
    * assignment table holds more than `maxFilesPerCell` files per cell
    * (one cheap directory listing below the dial) — call it after
    * every N micro-batches and a long-lived [[streamToIvfIndex]]
    * writer self-maintains. Returns true iff a compaction ran. */
  def maybeCompactIvfIndex(
      spark: SparkSession, path: String, maxFilesPerCell: Int = 4): Boolean =
    CellTable.maybeCompact(spark, path, s"$path/assigned", maxFilesPerCell)

  /**
   * Zero-downtime re-train — the endpoint of the "re-train when the
   * drift telemetry says so" loop ([[graft.pipeline.Drift]]
   * embeddingDrift): train fresh centroids over the index's CURRENT
   * contents (the assignment rows carry the full vectors, so the
   * corpus is never re-read), re-assign, STAGE the whole new index
   * under `_retrain/` (invisible to readers), then journal and swap.
   * A crash before the journal leaves the live index untouched (the
   * orphaned staging is recovered away); a crash after it is finished
   * idempotently by the next maintenance call or [[recoverRetrain]].
   * The maintenance lock is held throughout and the streaming writer
   * must be stopped (enforced): the re-assignment reads a snapshot, so
   * the maintenance watermark advances past every on-disk stream batch
   * — their rows are IN the rebuilt base layer, and an unsuppressed
   * crash-replay would duplicate them. Readers racing the swap window
   * itself see a missing-dir error, not wrong data — schedule retrains
   * like compactions. Returns the reloaded index.
   */
  def retrainIvfIndex(
      spark: SparkSession,
      path: String,
      nlist: Int,
      iterations: Int = 5): IvfIndex =
    retrainIvfIndexImpl(spark, path, nlist, iterations, () => (), () => ())

  /** [[retrainIvfIndex]] with crash-window hooks (test seam):
    * `afterStage` runs with the new index fully staged but not yet
    * journaled (a crash here must leave the OLD index live);
    * `afterJournal` after the pending marker commits (a crash here is
    * finished by recovery). */
  private[graft] def retrainIvfIndexImpl(
      spark: SparkSession,
      path: String,
      nlist: Int,
      iterations: Int,
      afterStage: () => Unit,
      afterJournal: () => Unit): IvfIndex =
      Maintenance.withExclusiveLock(spark, path) {
    StagedSwap.recoverLocked(spark, path, Seq("assigned", "centroids"))
    CellTable.recover(spark, s"$path/assigned") // crashed compact first
    // a calibrated index stays calibrated: remember the curve's k so
    // the post-swap recalibration replays at the same contract
    val priorCal = loadCalibrationMeta(spark, path)
    // the retrain only reads the assignment (fresh centroids come from
    // the k-means below) — skip the full load's centroid-collect job
    // every read of `rows` (training passes, the staged save) happens
    // BEFORE the swap deletes the source dirs — a lazy checkpoint just
    // pins one materialization across the k-means passes
    val rows = loadIvfAssigned(spark, path)
      .select(F.col("neighbor_id"), F.col("__cv"))
      .localCheckpoint(eager = false)
    // an empty index would stage NO assigned dir (a zero-row
    // partitioned write lands nothing) and the swap would then delete
    // the live one as "stale" — refuse instead
    require(!rows.isEmpty, s"retrainIvfIndex: index at $path is empty")
    StagedSwap.suppressStreamReplays(spark, path, s"$path/assigned")
    StagedSwap.run(spark, path, Seq("assigned", "centroids"),
      afterStage, afterJournal) { staging =>
      buildIvfIndex(rows, "neighbor_id", "__cv", nlist, iterations)
        .save(staging)
    }
    // fresh cells invalidate any measured mass->recall curve — delete
    // it; a stale curve would silently solve masses against geometry
    // that no longer exists (the r12 stale-rotation lesson applied to
    // calibration). A previously CALIBRATED index then recalibrates
    // in place (same k), so a drift-fired retrain never leaves a
    // missing curve for a human to notice — the SCALING.md rule
    // "recalibrate wherever you retrain" made code.
    dropCalibration(spark, path)
    priorCal.foreach { case (c, _, _) => recalibrateIvfIndex(spark, path, c.k) }
    loadIvfIndex(spark, path)
  }

  /** Idempotent crash repair for [[retrainIvfIndex]]: a pending marker
    * means the staged index is complete — finish the swap; no marker
    * means the staging (if any) is a half-write — drop it. */
  def recoverRetrain(spark: SparkSession, path: String): Unit =
    Maintenance.withLock(spark, path) {
      StagedSwap.recoverLocked(spark, path, Seq("assigned", "centroids"))
    }

  /**
   * Drift-triggered retrain policy hook — the "re-train when the
   * drift telemetry says so" loop made one call (the
   * [[CellTable.maybeCompact]] discipline applied to geometry):
   * measure the fresh batch's cell-occupancy PSI against the saved
   * index's frozen centroids
   * ([[graft.pipeline.Drift.embeddingDrift]]); at or above
   * `psiThreshold`, [[retrainIvfIndex]] runs (current nlist kept
   * unless overridden). Below the dial the only cost is the drift
   * measurement (one assignment pass over the batch). Call it where
   * the nightly append runs — append first, then maybeRetrain, so the
   * rebuild absorbs the fresh rows. Returns (retrained, psi).
   */
  def maybeRetrainIvfIndex(
      spark: SparkSession,
      path: String,
      fresh: DataFrame,
      vecCol: String,
      psiThreshold: Double = 0.2,
      nlist: Int = -1,
      iterations: Int = 5): (Boolean, Double) = {
    val cur = loadIvfIndex(spark, path)
    val psi = graft.pipeline.Drift.embeddingDrift(cur, fresh, vecCol)
      .head().getDouble(2)
    if (psi < psiThreshold) (false, psi)
    else {
      val n = if (nlist > 0) nlist else cur.centroids.length
      retrainIvfIndex(spark, path, n, iterations)
      (true, psi)
    }
  }

  /**
   * Continuous IVF maintenance: a foreachBatch sink that assigns each
   * micro-batch against the saved index's frozen centroids and lands
   * it under its own `__batch` partitions with dynamic overwrite — a
   * replayed micro-batch replaces exactly its own files, so the index
   * stays correct (effectively-once) on at-least-once delivery; the
   * [[graft.pipeline.Retrieval.streamToTextIndex]] protocol applied
   * to the vector index. One streaming writer per path; batch
   * [[appendToIvfIndex]]/[[removeFromIvfIndex]] interleave safely
   * (removals require the writer stopped, and advance the watermark
   * so a crash-replay of an already-mutated micro-batch no-ops).
   * Returns the writer — set trigger/checkpoint and `.start()`.
   */
  def streamToIvfIndex(
      stream: DataFrame,
      path: String,
      idCol: String,
      vecCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        Maintenance.heartbeat(batch.sparkSession, path)
        Maintenance.requireNoExclusiveMaintenance(batch.sparkSession, path)
        appendToIvfIndexTouched(batch.sparkSession, path, batch, idCol,
          vecCol, batchId)
        ()
    }

  /**
   * Takedown / dedup-drop maintenance: REMOVE ids from a saved IVF
   * index. One scan of the assignment finds the touched cells; only
   * those cell partitions rewrite (anti-join against the broadcast id
   * set, dynamic overwrite), and a cell emptied entirely has its
   * directory deleted explicitly — dynamic overwrite writes nothing
   * for it and would otherwise leave the stale rows behind. History
   * outside touched cells is never rewritten. Returns the reloaded
   * index. Single-maintainer like every other index mutation.
   */
  def removeFromIvfIndex(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): IvfIndex = {
    removeFromCellTable(spark, path, s"$path/assigned", ids, idCol)
    loadIvfIndex(spark, path)
  }

  /** The shared touched-partition removal pass over a batch-stamped
    * cell table with a `neighbor_id` column ([[removeFromIvfIndex]]
    * and [[ProductQuantization.removeFromIvfPq]]). Contract —
    * ENFORCED, not conventional: single-maintainer (the [[Maintenance]]
    * lock at `rootPath`) AND the streaming writer stopped (refused
    * while a writer heartbeat is fresh) — the removal first advances
    * `rootPath`'s `_maintained_through` watermark so a crash-replay of
    * an already-mutated micro-batch writes nothing instead of
    * resurrecting removed vectors (the
    * [[graft.pipeline.Retrieval.removeFromTextIndex]] rule). */
  private[pipeline] def removeFromCellTable(
      spark: SparkSession,
      rootPath: String,
      tablePath: String,
      ids: DataFrame,
      idCol: String): Unit =
      // writer-exclusive: a live streaming writer's crash-replay would
      // resurrect the removed vectors (lease checked, marker dropped)
      Maintenance.withExclusiveLock(spark, rootPath) {
    // finish any crashed compaction first — its window holds folded
    // rows twice, which would double the doom counts below
    CellTable.recover(spark, tablePath)
    // the RAW table, batch column included — survivors rewrite into
    // exactly their own (__cell, __batch) partitions
    val rows = CellTable.readRaw(spark, tablePath)
    val del = ids.select(F.col(idCol).as("neighbor_id")).distinct()
      .localCheckpoint(eager = false)
    // one index scan: which (cell, batch) partitions hold any doomed
    // row, which of those end up EMPTY (dynamic overwrite writes
    // nothing for them — their dirs need an explicit delete), and
    // whether the WHOLE table empties out. Bounded: one row per live
    // (cell, batch) pair — nlist x retained batches, driver-fine.
    // The max live stream batch (the watermark value) reads off the
    // same per-partition rows — the old separate max() pass over the
    // full table was a second scan for one number.
    val perPart = rows
      .join(F.broadcast(del.withColumn("__del", F.lit(1))),
        Seq("neighbor_id"), "left")
      .groupBy(F.col("__cell"), F.col("__batch"))
      .agg(F.sum(F.coalesce(F.col("__del"), F.lit(0))).as("__doomed"),
           F.count(F.lit(1)).as("__n"))
      .select(F.col("__cell"), F.col("__batch"), F.col("__doomed"),
        (F.col("__n") === F.col("__doomed")).as("__empties"))
      .collect()
    // watermark BEFORE any mutation (the crash-replay rule); computing
    // perPart first is read-only and changes nothing about the window
    val maxStream = {
      val bs = perPart.map(_.getLong(1)).filter(_ >= 0L)
      if (bs.isEmpty) -1L else bs.max
    }
    if (maxStream >= 0L)
      CellTable.writeMaintainedThrough(spark, rootPath, maxStream)
    val touchedCells = perPart.filter(_.getLong(2) > 0L)
      .map(_.getInt(0)).distinct.toSeq
    val emptiedPairs = perPart
      .filter(r => r.getLong(2) > 0L && r.getBoolean(3))
      .map(r => (r.getInt(0), r.getLong(1)))
    val allEmpty = perPart.nonEmpty && perPart.forall(_.getBoolean(3))
    if (allEmpty) {
      // the table emptied out entirely: a partitioned write of zero
      // rows writes NOTHING (no partition values) and deleting every
      // cell dir leaves an uninferrable directory — land one empty
      // schema-bearing file instead (the partition keys become plain
      // columns; the next append clears the sentinel). Same rule as
      // Retrieval.removeFromTextIndex.
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rows.schema)
      empty.repartition(1).write.mode("overwrite").parquet(tablePath)
    } else if (touchedCells.nonEmpty) {
      val survivors = rows
        .filter(F.col("__cell").isInCollection(touchedCells))
        .join(F.broadcast(del), Seq("neighbor_id"), "left_anti")
        // materialize BEFORE the dynamic overwrite replaces its input
        .localCheckpoint(eager = true)
      survivors
        .repartition(F.col("__cell"))
        .write.partitionBy("__cell", "__batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(tablePath)
      val fs = new org.apache.hadoop.fs.Path(tablePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptiedPairs.foreach { case (c, b) =>
        fs.delete(new org.apache.hadoop.fs.Path(tablePath,
          s"__cell=$c/__batch=$b"), true)
      }
      // a cell whose every batch emptied keeps an empty __cell dir
      // after the pair deletes — drop it whole
      val liveCells = perPart.filter(!_.getBoolean(3)).map(_.getInt(0)).toSet
      emptiedPairs.map(_._1).distinct
        .filterNot(liveCells.contains)
        .foreach { c =>
          fs.delete(new org.apache.hadoop.fs.Path(tablePath, s"__cell=$c"), true)
        }
    }
  }

  /** A cell table once emptied by [[removeFromCellTable]] holds a flat
    * schema-sentinel file; partitioned appends must clear it first or
    * the mixed directory depth breaks parquet discovery (the
    * [[graft.pipeline.Retrieval]] appendBatch rule). */
  private[pipeline] def clearCellSentinel(
      spark: SparkSession, tablePath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      if (st.isFile && !st.getPath.getName.startsWith("_"))
        fs.delete(st.getPath, false)
    }
  }

  /** One-off IVF indexing pass: train k-means centroids, assign every
    * corpus vector to its nearest cell. */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      iterations: Int = 2): IvfIndex = {
    val spark = corpus.sparkSession
    val centroids = trainCentroids(corpus, idCol, vecCol, nlist, iterations)
    val cB = spark.sparkContext.broadcast(centroids)
    val assignU = F.udf((v: Array[Float]) => nearestCentroid(cB.value, v))
    IvfIndex(centroids,
      corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
                    assignU(F.col(vecCol)).as("__cell")))
  }

  /** Query a prebuilt IVF index: each query scores only the cells of
    * its `nprobe` nearest centroids (~nprobe/nlist of the corpus).
    *
    * `probeMass > 0` switches to mass-adaptive probing: each query
    * takes distance-ordered cells until they cover `probeMass` of the
    * corpus (never fewer than `nprobe`). A fixed nprobe's probed
    * fraction — and with it recall — decays as the corpus outgrows
    * the cell count; the mass form keeps recall roughly constant at
    * the price of a corpus-fraction-proportional scan, which is the
    * honest tradeoff dial at 100 TB. Cell sizes are one bounded
    * nlist-row aggregate over the index (eager, like bloomPrune's
    * build job).
    */
  def ivfTopKIndexed(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4,
      probeMass: Double = 0.0): DataFrame = {
    val probeU = probeCellsUdf(index, nprobe, probeMass)
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
                           F.explode(probeU(F.col(vecCol))).as("__cell"))
    val scored = index.assigned.join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /**
   * IVF radius search: ALL (query, neighbor) pairs with cosine >=
   * `threshold`, probing each query's cells like [[ivfTopKIndexed]]
   * (fixed `nprobe` or mass-adaptive `probeMass`). The threshold-join
   * primitive under semantic decontamination and duplicate auditing —
   * unlike top-k there is no per-query window, so the only shuffle is
   * the candidate hash join. Self-matches (equal ids) are KEPT: a
   * radius query that finds its own exact copy found a real neighbor
   * (callers joining a corpus against itself filter `query_id =!=
   * neighbor_id` themselves). Recall is the IVF dial: an identical
   * vector is always found (it shares the query's nearest cell, which
   * every probe list includes first).
   */
  def ivfRadiusPairs(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nprobe: Int = 4,
      probeMass: Double = 0.0): DataFrame = {
    val probeU = probeCellsUdf(index, nprobe, probeMass)
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
                           F.explode(probeU(F.col(vecCol))).as("__cell"))
    index.assigned.join(F.broadcast(q), "__cell")
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
      .filter(F.col("cos") >= threshold)
      .select("query_id", "neighbor_id", "cos")
  }

  /**
   * IVF (inverted-file) approximate top-k: the corpus is partitioned
   * into `nlist` k-means cells; each query scores only the cells of its
   * `nprobe` nearest centroids. Convenience form that builds the index
   * and queries it in one call — at scale, [[buildIvfIndex]] once and
   * [[ivfTopKIndexed]] per query batch. Recall < 1 by design —
   * measure against [[bruteForceTopK]].
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iterations: Int = 2): DataFrame =
    ivfTopKIndexed(
      buildIvfIndex(corpus, idCol, vecCol, nlist, iterations),
      queries, idCol, vecCol, k, nprobe)

  // ------------------------------------------------------- auto defaults

  /** nlist ~ sqrt(n) (the classic IVF sizing), clamped to [16, 4096]. */
  def ivfNlistFor(n: Long): Int =
    math.max(16, math.min(4096, math.round(math.sqrt(math.max(n, 1L).toDouble)).toInt))

  /** Hyperplane bits that keep expected bucket occupancy near
    * `targetBucket` (planes = log2(n / targetBucket)), clamped to
    * [4, 24] (the signature int cap). Fixed planes shrink buckets as
    * the corpus grows and recall decays — this holds occupancy, and
    * with it recall, roughly constant. */
  def lshPlanesFor(n: Long, targetBucket: Int = 32): Int = {
    require(targetBucket >= 1, s"targetBucket must be >= 1, got $targetBucket")
    val raw = math.round(
      math.log(math.max(n, 1L).toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /**
   * Scale-aware IVF: nlist = sqrt(n) and mass-adaptive probing at
   * `probeMass` of the corpus — both re-derived from the corpus size
   * every call, so recall holds as the corpus grows where fixed
   * (nlist, nprobe) defaults decay (measured at sf0.1: fixed
   * nlist=16/nprobe=4 fell to 0.55 recall@10; this form holds ~0.8).
   * The default 0.45 mass suits spread-out synthetic embeddings;
   * naturally clustered corpora reach the same recall at far lower
   * mass — tune down before committing to a big scan.
   */
  def ivfTopKAuto(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      probeMass: Double = 0.45,
      iterations: Int = 2): DataFrame = {
    val n = corpus.count()
    ivfTopKIndexed(
      buildIvfIndex(corpus, idCol, vecCol, ivfNlistFor(n), iterations),
      queries, idCol, vecCol, k, nprobe = 4, probeMass = probeMass)
  }

  /** Scale-aware LSH: plane count from [[lshPlanesFor]] (constant
    * expected bucket occupancy), 8 tables, 1-bit probes — recall@10
    * measured 0.875 at sf0.1 where the fixed 8-plane default fell to
    * 0.59. */
  def lshTopKAuto(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetBucket: Int = 32,
      tables: Int = 8): DataFrame =
    lshTopK(corpus, queries, idCol, vecCol, k,
      tables = tables, planes = lshPlanesFor(corpus.count(), targetBucket),
      probeBits = 1)

  // ---------------------------------------------------------------- //
  // Recall-target probe calibration                                   //
  // ---------------------------------------------------------------- //

  /**
   * A measured probe-mass → recall curve for a cell-probed index —
   * the controller that turns the manual `probeMass` dial into a
   * requested `targetRecall`. Built at index (re)build time by
   * [[calibrateIvfProbe]] / [[Hnsw.calibrateProbe]] /
   * [[ProductQuantization.calibrateIvfPqProbe]] from a bounded sample
   * of the corpus's own vectors scored against exact brute force, and
   * persisted next to the geometry ([[saveCalibration]]).
   *
   * Validity tracks the GEOMETRY, not the corpus: appends under
   * frozen centroids shift cell occupancy, and with it the curve —
   * the drift-PSI dial ([[maybeRetrainIvfIndex]]) is the recalibrate
   * trigger, and a retrain always invalidates the curve (fresh cells).
   * Recalibrate wherever you retrain.
   */
  final case class ProbeCalibration(k: Int, grid: Vector[(Double, Double)]) {
    require(grid.nonEmpty, "ProbeCalibration: empty grid")
    /** Smallest measured mass whose recall reaches `targetRecall`;
      * 1.0 when no measured point does (probe everything — exact for
      * the IVF family; the graph family's beam may still bound it,
      * see [[Hnsw.hnswTopK]]'s efSearch note). */
    def massFor(targetRecall: Double): Double =
      grid.sortBy(_._1).find(_._2 >= targetRecall).map(_._1).getOrElse(1.0)
  }

  /** Default measurement grid — dense at the cheap end where the
    * curve is steep. */
  val DefaultCalibrationGrid: Seq[Double] =
    Seq(0.05, 0.1, 0.15, 0.2, 0.3, 0.45, 0.6, 0.8, 1.0)

  /**
   * The rerank-pool analogue of [[ProbeCalibration]] for the families
   * whose recall dial is POOL SIZE, not probed mass (binary
   * quantization, SQ8, flat PQ): a measured pool → recall@k curve.
   * Recall at pool P is exactly the fraction of true top-k neighbors
   * whose COARSE rank is ≤ P — a pooled true neighbor always survives
   * the exact-cosine rerank (anything outranking it in the pool has
   * cosine ≥ its own and is therefore itself a true top-j neighbor;
   * tie-breaks are neighbor_id asc on both sides), so the on-sample
   * achievement at `poolFor(t)` reproduces the measured point
   * deterministically.
   */
  final case class PoolCalibration(k: Int, grid: Vector[(Int, Double)]) {
    require(grid.nonEmpty, "PoolCalibration: empty grid")
    /** Smallest measured pool whose recall reaches `targetRecall`;
      * Int.MaxValue when no measured point does (pool everything —
      * exactly brute force for every pool family here). */
    def poolFor(targetRecall: Double): Int =
      grid.sortBy(_._1).find(_._2 >= targetRecall).map(_._1)
        .getOrElse(Int.MaxValue)
  }

  /** Default pool grid — doubling steps over the serving-realistic
    * range. */
  val DefaultPoolGrid: Seq[Int] = Seq(50, 100, 200, 400, 800, 1600, 3200)

  /** Shared pool-curve assembly from the coarse ranks of the true
    * neighbors: recall(P) = |{true pairs with coarse rank ≤ P}| / n. */
  private[pipeline] def poolCurveFromRanks(
      truthRanks: Seq[Long], nTruth: Long, k: Int,
      grid: Seq[Int]): PoolCalibration = {
    val curve = grid.sorted.map { p =>
      p -> (if (nTruth == 0) 1.0
            else truthRanks.count(_ <= p).toDouble / nTruth)
    }
    PoolCalibration(k, curve.toVector)
  }

  /** Persist a pool curve beside an index
    * (`<path>/_pool_calibration.json`): `n` stamps the corpus size at
    * measurement (informational — pool coverage dilutes as the corpus
    * grows; the family's drift dial is the recalibrate trigger), and
    * a geometry-replacing retrain refreshes the curve in place like
    * the mass curves. */
  def savePoolCalibration(
      spark: SparkSession, path: String, cal: PoolCalibration,
      n: Long = -1L): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_pool_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"k":${cal.k},"pool_grid":[${cal.grid
      .map { case (pl, r) => s"[$pl,$r]" }.mkString(",")}],"n":$n}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Reload a persisted pool curve; None when never calibrated. */
  def loadPoolCalibration(
      spark: SparkSession, path: String): Option[PoolCalibration] = {
    val p = new org.apache.hadoop.fs.Path(path, "_pool_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    val k = """"k"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
      .map(_.group(1).toInt).getOrElse(return None)
    val pair = """\[\s*(\d+)\s*,\s*([0-9.Ee+-]+)\s*\]""".r
    val grid = pair.findAllMatchIn(raw)
      .map(m => (m.group(1).toInt, m.group(2).toDouble)).toVector
    if (grid.isEmpty) None else Some(PoolCalibration(k, grid))
  }

  private[pipeline] def dropPoolCalibration(
      spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_pool_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
  }

  /** Shared hash-ordered query sample for pool calibration (the
    * [[calibrateProbe]] sampling rule on an (id, vec) corpus). */
  private[pipeline] def poolCalibrationSample(
      corpus: DataFrame, idCol: String, vecCol: String,
      nSample: Int): DataFrame =
    corpus.filter(F.col(vecCol).isNotNull)
      .orderBy(F.xxhash64(F.col(idCol).cast("string")),
        F.col(idCol).cast("string"))
      .limit(nSample)
      .select(F.col(idCol), F.col(vecCol))
      .localCheckpoint(eager = false)

  /**
   * Shared measurement core: sample `nSample` corpus vectors
   * (hash-ordered — deterministic, distribution-blind), brute-force
   * their exact top-`k` (ONE bounded corpus scan — the build-time
   * cost), then replay the family's probe rule per grid mass DRIVER
   * side and count which true neighbors' cells the probe covers.
   * `probeFor(queryVec, mass)` must replay the family's EXACT probe
   * rule (same ordering, same stopping rule, same minProbe), so the
   * curve predicts the distributed probe bit-for-bit on the sample.
   * Recall is cell membership — exact for every family here because
   * probed cells rerank by exact cosine (the candidate survives iff
   * its cell is probed).
   */
  private[pipeline] def calibrateProbe(
      assigned: DataFrame,
      k: Int,
      nSample: Int,
      grid: Seq[Double],
      probeFor: (Array[Float], Double) => Seq[Int]): ProbeCalibration = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val sample = assigned
      .select(F.col("neighbor_id").cast("string").as("__id"), F.col("__cv"))
      .orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
      .limit(nSample)
      .collect()
      .map(r => (r.getString(0),
        r.getAs[scala.collection.Seq[Float]](1).toArray))
    require(sample.nonEmpty, "calibrateProbe: empty index")
    val qDf = sample.toSeq.toDF("id", "v")
    val corpus = assigned.select(
      F.col("neighbor_id").cast("string").as("id"), F.col("__cv").as("v"))
    val truth = bruteForceTopK(corpus, qDf, "id", "v", k)
      .select(F.col("query_id"), F.col("neighbor_id")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val needed = truth.map(_._2).distinct.toSeq
    val cellOf = assigned
      .select(F.col("neighbor_id").cast("string").as("id"), F.col("__cell"))
      .join(F.broadcast(needed.toDF("id")), Seq("id"), "left_semi")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    val curve = grid.sorted.map { m =>
      val probed = sample.map { case (id, v) =>
        id -> probeFor(v, m).toSet }.toMap
      val hits = truth.count { case (q, n) =>
        cellOf.get(n).exists(probed(q).contains) }
      m -> (if (truth.isEmpty) 1.0 else hits.toDouble / truth.length)
    }
    ProbeCalibration(k, curve.toVector)
  }

  /** Measure the mass→recall curve of an IVF index (replays
    * [[ivfTopKIndexed]]'s mass probe exactly, including `minProbe`). */
  def calibrateIvfProbe(
      index: IvfIndex,
      k: Int = 10,
      nSample: Int = 64,
      minProbe: Int = 4,
      grid: Seq[Double] = DefaultCalibrationGrid): ProbeCalibration = {
    val sizes = new Array[Long](index.centroids.length)
    index.assigned.groupBy(F.col("__cell")).agg(F.count(F.lit(1)).as("__n"))
      .collect().foreach { r =>
        val c = r.getInt(0)
        if (c >= 0 && c < sizes.length) sizes(c) = r.getLong(1)
      }
    val total = sizes.sum
    calibrateProbe(index.assigned, k, nSample, grid,
      (v, m) => nearestCentroidsByMass(index.centroids, sizes, total, v,
        minProbe, m))
  }

  /** [[ivfTopKIndexed]] with the mass solved from a requested recall
    * target via the index's measured curve — `probeMass` becomes
    * "give me ~`targetRecall` recall@k and spend no more than that". */
  def ivfTopKTarget(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      targetRecall: Double,
      cal: ProbeCalibration,
      minProbe: Int = 4): DataFrame =
    ivfTopKIndexed(index, queries, idCol, vecCol, k, nprobe = minProbe,
      probeMass = cal.massFor(targetRecall))

  /** Persist a calibration next to the index geometry
    * (`<path>/_calibration.json` — the underscore keeps it out of
    * Spark's data-file listing, the manifest convention). `cells`
    * stamps the GEOMETRY the curve was measured on (cell/nav count;
    * -1 = unstamped legacy) so a validating load can refuse a curve
    * that outlived a retrain; `ef` records the graph family's
    * efSearch (the curve is an (efSearch, mass) property — a
    * recalibration must replay the same beam). */
  def saveCalibration(
      spark: SparkSession, path: String, cal: ProbeCalibration,
      cells: Int = -1, ef: Int = -1): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"k":${cal.k},"grid":[${cal.grid
      .map { case (m, r) => s"[$m,$r]" }.mkString(",")}],""" +
      s""""cells":$cells,"ef":$ef}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Measure-and-persist in one call — run it at build time and after
    * every geometry change (the drift dial / retrain rule in
    * SCALING.md). */
  def recalibrateIvfIndex(
      spark: SparkSession,
      path: String,
      k: Int = 10,
      nSample: Int = 64,
      minProbe: Int = 4): ProbeCalibration = {
    val idx = loadIvfIndex(spark, path)
    val cal = calibrateIvfProbe(idx, k, nSample, minProbe)
    saveCalibration(spark, path, cal, cells = idx.centroids.length)
    cal
  }

  /** A retrain replaces the cell geometry, so any persisted curve is
    * meaningless — every geometry-replacing op deletes it (the stale-
    * rotation rule applied to calibration). */
  private[pipeline] def dropCalibration(
      spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
  }

  /** Reload a persisted calibration; None when the index was never
    * calibrated (callers fall back to the manual mass dial). */
  def loadCalibration(
      spark: SparkSession, path: String): Option[ProbeCalibration] =
    loadCalibrationMeta(spark, path).map(_._1)

  /** [[loadCalibration]] plus the persisted stamps:
    * (curve, cells, ef) — cells/ef are -1 on unstamped legacy files. */
  def loadCalibrationMeta(
      spark: SparkSession, path: String)
      : Option[(ProbeCalibration, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(path, "_calibration.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    val k = """"k"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
      .map(_.group(1).toInt).getOrElse(return None)
    val pair = """\[\s*([0-9.Ee+-]+)\s*,\s*([0-9.Ee+-]+)\s*\]""".r
    val grid = pair.findAllMatchIn(raw)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toVector
    if (grid.isEmpty) None
    else {
      def intField(key: String): Int =
        ("\"" + key + """"\s*:\s*(-?\d+)""").r.findFirstMatchIn(raw)
          .map(_.group(1).toInt).getOrElse(-1)
      Some((ProbeCalibration(k, grid), intField("cells"), intField("ef")))
    }
  }

  /** [[loadCalibration]] that REFUSES a stale curve: a stamped cell
    * count that no longer matches the live geometry means the curve
    * was measured on cells that no longer exist — solving masses
    * against it would be silent garbage. Unstamped (legacy) curves
    * pass un-validated; a missing curve is None (fall back to the
    * manual dial or recalibrate). */
  def loadCalibrationValidated(
      spark: SparkSession, path: String,
      expectedCells: Int): Option[ProbeCalibration] =
    loadCalibrationMeta(spark, path).map { case (cal, cells, _) =>
      if (cells >= 0 && cells != expectedCells)
        throw new IllegalStateException(
          s"stale calibration at $path: measured on $cells cells but the " +
            s"index has $expectedCells — a retrain/geometry change " +
            "invalidates the curve; recalibrate before solving targets")
      cal
    }

  // ---------------------------------------------------------------- //
  // Filtered (predicate-constrained) ANN                              //
  // ---------------------------------------------------------------- //

  /**
   * Metadata-filtered top-k over a prebuilt IVF index: nearest
   * neighbors among only the rows whose id appears in `allowed` — the
   * PRE-FILTER strategy (restrict candidates, then rank), which is
   * exact within the probed cells; a post-filter (rank, then drop)
   * under-fills k whenever the filter is selective.
   *
   * `allowed` is a one-column DataFrame of ids — the caller expresses
   * the predicate as an ordinary DataFrame filter over their metadata
   * table and passes the surviving ids (Spark-first: the predicate
   * stays declarative, pushdown and pruning apply to the metadata
   * scan). The semi-join against the probed cells is left to
   * Catalyst/AQE: a small allowed set broadcasts, a large one hash-
   * joins on the id — either way nothing is collected.
   *
   * Recall under filtering is the probe dial: with selectivity s the
   * probed cells hold ~s x probeMass x n candidates, so a fixed mass
   * that is fine unfiltered starves a selective filter. Use
   * [[ivfTopKFilteredAuto]] to compensate automatically.
   */
  def ivfTopKFilteredIndexed(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      allowed: DataFrame,
      k: Int,
      nprobe: Int = 4,
      probeMass: Double = 0.0): DataFrame = {
    val aCol = allowed.columns.head
    val ok = allowed.select(F.col(aCol).as("neighbor_id")).distinct()
    val probeU = probeCellsUdf(index, nprobe, probeMass)
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
                           F.explode(probeU(F.col(vecCol))).as("__cell"))
    val scored = index.assigned
      .join(ok, Seq("neighbor_id"), "left_semi")
      .join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /**
   * Selectivity-adaptive filtered top-k — the dispatch every serving
   * stack converges on. Measures the filter's selectivity s =
   * |allowed ∩ corpus| / n (one semi-join count, the only extra job),
   * then:
   *
   *   - s x n <= bruteThreshold, or the compensated probe mass
   *     baseMass / s reaches 1: EXACT brute force over the filtered
   *     subset (a selective filter shrinks the corpus until scanning
   *     it outright is cheaper AND exact — probing would touch most
   *     cells anyway);
   *   - otherwise: IVF probe at mass min(1, baseMass / s), holding
   *     the expected candidate count at the unfiltered baseMass
   *     level, so recall does not decay with selectivity.
   *
   * The brute branch is exact and the probe branch keeps the
   * unfiltered candidate budget — both sides of the boundary give
   * planted exact copies rank-1 and return min(k, |allowed|-ish) rows,
   * which is what gates pin (the branches legitimately differ on
   * marginal natural neighbors).
   */
  def ivfTopKFilteredAuto(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      allowed: DataFrame,
      k: Int,
      baseMass: Double = 0.45,
      bruteThreshold: Long = 100000L): DataFrame = {
    val aCol = allowed.columns.head
    val ok = allowed.select(F.col(aCol).as("neighbor_id")).distinct()
    val filtered = index.assigned.join(ok, Seq("neighbor_id"), "left_semi")
    val nAllowed = filtered.count()
    val n = math.max(index.assigned.count(), 1L)
    val s = math.max(nAllowed.toDouble / n, 1e-12)
    val mass = baseMass / s
    if (nAllowed <= bruteThreshold || mass >= 1.0)
      bruteForceTopK(
        filtered.select(F.col("neighbor_id").as(idCol), F.col("__cv").as(vecCol)),
        queries, idCol, vecCol, k)
    else
      ivfTopKFilteredIndexed(index, queries, idCol, vecCol, allowed, k,
        nprobe = 4, probeMass = math.min(mass, 1.0))
  }

  /**
   * Unified serving dispatch — the one entry point a serving stack
   * calls, generalizing [[ivfTopKFilteredAuto]] with the measured
   * calibration curve and the unfiltered case:
   *
   *   - effective corpus (|allowed ∩ corpus|, or n unfiltered) at or
   *     under `bruteThreshold`, OR the selectivity-compensated mass
   *     reaching 1: EXACT brute force over the (filtered) corpus —
   *     probing would touch most cells anyway and brute force is
   *     exact;
   *   - otherwise: the IVF probe at the curve-solved mass
   *     (`cal.massFor(targetRecall)`, falling back to `baseMass` when
   *     the index was never calibrated), divided by the filter's
   *     selectivity so the candidate budget — and with it recall —
   *     does not decay with the filter.
   *
   * Dispatch cannot change results in the pinned sense: every branch
   * puts a planted exact copy at rank 1, honors the filter, and
   * fills k (the branches legitimately differ on marginal natural
   * neighbors — the brute side is exact, the probe side is the
   * calibrated approximation). The family LADDER (when to reach for
   * binary/SQ8/PQ/HNSW instead of IVF) is a build-time storage/recall
   * decision, not a per-query one — the decision table lives in
   * SCALING.md; this dispatch covers the per-query choices (brute vs
   * probe, filter compensation, curve-solved mass).
   */
  def annTopKAuto(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cal: Option[ProbeCalibration] = None,
      allowed: Option[DataFrame] = None,
      targetRecall: Double = 0.85,
      baseMass: Double = 0.45,
      bruteThreshold: Long = 100000L): DataFrame = {
    val filtered = allowed match {
      case Some(a) =>
        val aCol = a.columns.head
        val ok = a.select(F.col(aCol).as("neighbor_id")).distinct()
        index.assigned.join(ok, Seq("neighbor_id"), "left_semi")
      case None => index.assigned
    }
    val nEff = filtered.count()
    val n = math.max(index.assigned.count(), 1L)
    val s = math.max(nEff.toDouble / n, 1e-12)
    val mass = cal.map(_.massFor(targetRecall)).getOrElse(baseMass)
    val compMass = mass / s
    if (nEff <= bruteThreshold || compMass >= 1.0)
      bruteForceTopK(
        filtered.select(F.col("neighbor_id").as(idCol), F.col("__cv").as(vecCol)),
        queries, idCol, vecCol, k)
    else allowed match {
      case Some(a) =>
        ivfTopKFilteredIndexed(index, queries, idCol, vecCol, a, k,
          nprobe = 4, probeMass = math.min(compMass, 1.0))
      case None =>
        ivfTopKIndexed(index, queries, idCol, vecCol, k,
          nprobe = 4, probeMass = mass)
    }
  }

  // ---------------------------------------------------------------- //
  // MMR diversified rerank                                            //
  // ---------------------------------------------------------------- //

  /**
   * Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) of
   * an ANN candidate pool: greedily select `k` of each query's
   * candidates maximizing
   *
   *   lambda * rel(c) - (1 - lambda) * max_{s in selected} sim(c, s)
   *
   * where rel is the candidate's incoming score (`cos` column — any
   * ANN family's output plugs in) and sim is cosine between
   * candidates. lambda = 1 degenerates to plain relevance order;
   * smaller lambda trades relevance for diversity — the RAG-context
   * and search-results dial that stops near-duplicate passages from
   * monopolizing a context window.
   *
   * `candidates` is (query_id, neighbor_id, cos) — the top-k shape
   * every ANN operator here returns; vectors are fetched from
   * `corpus` with the candidate table BROADCAST onto the corpus scan
   * (candidates are |queries| x pool, bounded). The greedy loop runs
   * per query over its pooled candidates inside one UDF — O(pool * k)
   * dot products over a bounded pool, map-side after the group. Ties
   * break (score desc, neighbor_id asc): deterministic.
   *
   * Ids must be long-typed (cast upstream). Returns (query_id, rank,
   * neighbor_id, score, cos) — `score` is the marginal-relevance
   * value at selection time (rank 1's score = lambda * rel).
   */
  def mmrRerank(
      candidates: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val cvec = corpus.select(F.col(idCol).cast("long").as("neighbor_id"),
      F.col(vecCol).as("__cv"))
    val joined = cvec.join(
      F.broadcast(candidates.select(F.col("query_id").cast("long").as("query_id"),
        F.col("neighbor_id").cast("long").as("neighbor_id"),
        F.col("cos").cast("double").as("cos"))),
      "neighbor_id")
    val greedy = F.udf((cands: Seq[org.apache.spark.sql.Row]) => {
      val n = cands.length
      val ids = new Array[Long](n)
      val rel = new Array[Double](n)
      val vecs = new Array[Array[Double]](n)
      var i = 0
      while (i < n) {
        val r = cands(i)
        ids(i) = r.getLong(0)
        rel(i) = r.getDouble(1)
        val v = r.getSeq[Float](2)
        val d = new Array[Double](v.length)
        var nrm = 0.0
        var j = 0
        while (j < v.length) { d(j) = v(j).toDouble; nrm += d(j) * d(j); j += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 0) { j = 0; while (j < v.length) { d(j) /= nrm; j += 1 } }
        vecs(i) = d
        i += 1
      }
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var j = 0
        val m = math.min(a.length, b.length)
        while (j < m) { s += a(j) * b(j); j += 1 }
        s
      }
      val maxSim = Array.fill(n)(0.0) // max sim to the selected set so far
      val taken = new Array[Boolean](n)
      val out = Seq.newBuilder[(Int, Long, Double, Double)]
      var step = 0
      var none = false
      while (step < math.min(k, n) && !none) {
        var best = -1
        var bestScore = 0.0
        var ii = 0
        while (ii < n) {
          if (!taken(ii)) {
            val s = if (step == 0) lambda * rel(ii)
                    else lambda * rel(ii) - (1.0 - lambda) * maxSim(ii)
            if (best < 0 || s > bestScore ||
                (s == bestScore && ids(ii) < ids(best))) {
              best = ii; bestScore = s
            }
          }
          ii += 1
        }
        if (best < 0) none = true
        else {
          taken(best) = true
          out += ((step + 1, ids(best), bestScore, rel(best)))
          ii = 0
          while (ii < n) {
            if (!taken(ii)) {
              val s = dot(vecs(ii), vecs(best))
              if (s > maxSim(ii)) maxSim(ii) = s
            }
            ii += 1
          }
          step += 1
        }
      }
      out.result()
    })
    joined
      .groupBy(F.col("query_id"))
      .agg(F.collect_list(F.struct(F.col("neighbor_id"), F.col("cos"),
        F.col("__cv"))).as("__cands"))
      .select(F.col("query_id"), F.explode(greedy(F.col("__cands"))).as("__sel"))
      .select(F.col("query_id"), F.col("__sel._1").as("rank"),
        F.col("__sel._2").as("neighbor_id"), F.col("__sel._3").as("score"),
        F.col("__sel._4").as("cos"))
  }

  /** Convenience: exact top-`poolSize` pool (bruteForceTopK) then MMR
    * — at scale feed [[mmrRerank]] from an indexed ANN family
    * instead. */
  def mmrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lambda: Double = 0.7,
      poolSize: Int = 100): DataFrame =
    mmrRerank(
      bruteForceTopK(corpus, queries, idCol, vecCol, poolSize),
      corpus, idCol, vecCol, k, lambda)

  // ---------------------------------------------------------------- //
  // kNN label propagation                                             //
  // ---------------------------------------------------------------- //

  /**
   * Nearest-neighbor classification against a labeled index — the
   * semi-supervised labeling pass a curation pipeline runs to extend
   * a small annotated seed set over a crawl (quality tiers, topics,
   * licenses). Each query's `k` approximate nearest labeled rows vote
   * with weight = cosine; the heaviest label wins (ties by label
   * value, deterministic).
   *
   * Returns (query_id, label, weight, votes). Scale shape: one
   * [[ivfTopKIndexed]] probe (query batch broadcast), then the
   * |queries| x k neighbor table BROADCASTS onto the labels scan —
   * the label table never shuffles — and the vote is a bounded
   * groupBy + top-1 window over queries x distinct-labels rows.
   *
   * k = 1 is exact nearest-label assignment (an exact copy of a
   * labeled row always recovers that row's label: identical vectors
   * share the probe's first cell and cosine 1 outranks). Weighted
   * votes at k > 1 sum <= k doubles per (query, label) — order-noise
   * ~1e-15; don't pin near-tie outcomes in oracles.
   */
  def knnClassifyIndexed(
      index: IvfIndex,
      labels: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nprobe: Int = 4,
      probeMass: Double = 0.0): DataFrame = {
    val nn = ivfTopKIndexed(index, queries, idCol, vecCol, k, nprobe, probeMass)
    val lab = labels.select(F.col(idCol).as("neighbor_id"), F.col(labelCol).as("label"))
      .filter(F.col("label").isNotNull)
    // repartition(query_id) BEFORE the vote: HashPartitioning(query_id)
    // satisfies BOTH the (query_id, label) aggregate's clustering and
    // the top-1 window's, so vote -> argmax rides ONE exchange (the
    // gapFill partitioning contract)
    val votes = lab.join(F.broadcast(nn), "neighbor_id")
      .repartition(F.col("query_id"))
      .groupBy(F.col("query_id"), F.col("label"))
      .agg(F.sum(F.col("cos")).as("weight"), F.count(F.lit(1)).as("votes"))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("weight").desc, F.col("label").asc)
    votes.withColumn("__r", F.row_number().over(w))
      .filter(F.col("__r") === 1)
      .select("query_id", "label", "weight", "votes")
  }

  /** Convenience form: build the IVF index over the labeled set
    * (nlist = sqrt(n), the auto sizing) and classify in one call. At
    * scale, [[buildIvfIndex]]/save once and [[knnClassifyIndexed]]
    * per batch. */
  def knnClassify(
      labeled: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      probeMass: Double = 0.45,
      iterations: Int = 2): DataFrame = {
    val n = labeled.count()
    val index = buildIvfIndex(labeled, idCol, vecCol, ivfNlistFor(n), iterations)
    knnClassifyIndexed(index, labeled, queries, idCol, vecCol, labelCol, k,
      nprobe = 4, probeMass = probeMass)
  }

  /** Streaming label propagation: classify each micro-batch of
    * unlabeled vectors against a persisted labeled IVF index (loaded
    * ONCE at writer build — the frozen-index contract every streaming
    * probe here uses). Stateless per batch; each micro-batch
    * dynamic-overwrites its own `__batch` partition of the prediction
    * table, so crash-replays are idempotent. */
  def knnClassifyStream(
      stream: DataFrame,
      indexPath: String,
      labels: DataFrame,
      outPath: String,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nprobe: Int = 4,
      probeMass: Double = 0.45)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val index = loadIvfIndex(stream.sparkSession, indexPath)
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val preds = knnClassifyIndexed(index, labels, batch, idCol, vecCol,
          labelCol, k, nprobe, probeMass)
        if (!preds.isEmpty)
          preds.withColumn("__batch", F.lit(batchId))
            .repartition(1)
            .write.partitionBy("__batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(outPath)
        ()
    }
  }

  // ---------------------------------------------------------------- //
  // Contrastive-pair mining                                           //
  // ---------------------------------------------------------------- //

  /**
   * Mine contrastive training pairs: for each query, the `k` items
   * most cosine-similar to it whose label relation matches `positive`
   * — `positive = false` yields HARD NEGATIVES (different label, high
   * similarity: the near-boundary examples contrastive/embedding
   * training wants most), `positive = true` hard positives (same
   * label, for verification or triplet anchors).
   *
   * Exact scan, same scale shape as [[bruteForceTopK]]: the query
   * batch broadcasts, the corpus never shuffles, the label filter
   * prunes BEFORE the per-query rank window. NULL labels never match
   * either relation (they drop out, repo NULL discipline). For corpus-
   * scale query batches use [[hardNegativesIndexed]].
   */
  def minePairs(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      positive: Boolean): DataFrame = {
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
      F.col(labelCol).as("query_label"))
    val c = corpus.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("__cv"),
      F.col(labelCol).as("neighbor_label"))
    val rel =
      if (positive) F.col("neighbor_label") === F.col("query_label")
      else F.col("neighbor_label") =!= F.col("query_label")
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("neighbor_id") =!= F.col("query_id") && rel)
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "query_label", "neighbor_label", "cos")
  }

  /** [[minePairs]] with `positive = false`. */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame =
    minePairs(corpus, queries, idCol, vecCol, labelCol, k, positive = false)

  /**
   * Hard-negative mining against a persisted IVF index: candidates
   * come from the `nprobe` nearest cells (the [[ivfTopKIndexed]]
   * probe), labels attach to the CANDIDATE rows only (a
   * candidates-sized join, never a corpus reshuffle), then the
   * different-label filter and per-query rank. Approximate like every
   * IVF probe — recall vs [[hardNegatives]] is the metric to watch.
   * `labels` must carry (`idCol`, `labelCol`).
   */
  def hardNegativesIndexed(
      index: IvfIndex,
      queries: DataFrame,
      labels: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = index.assigned.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    val probeU = F.udf((v: Array[Float]) => nearestCentroids(cB.value, v, nprobe))
    val q = queries.select(F.col(idCol).as("query_id"), F.col(vecCol).as("__qv"),
      F.col(labelCol).as("query_label"),
      F.explode(probeU(F.col(vecCol))).as("__cell"))
    val lab = labels.select(F.col(idCol).as("neighbor_id"),
      F.col(labelCol).as("neighbor_label"))
    val scored = index.assigned.join(F.broadcast(q), "__cell")
      .filter(F.col("neighbor_id") =!= F.col("query_id"))
      .join(lab, "neighbor_id")
      .filter(F.col("neighbor_label") =!= F.col("query_label"))
      .withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cos").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "query_label", "neighbor_label", "cos")
  }
}

/**
 * Whole-index staged swap — the re-train promotion protocol shared by
 * the retrain family ([[Similarity.retrainIvfIndex]],
 * [[Hnsw.retrainHnswIndex]], [[ProductQuantization.retrainIvfPq]]):
 * the caller stages a COMPLETE new index under `_retrain/`, the swap
 * journals WHICH subdirectories were staged to `_retrain_pending`,
 * then deletes-and-renames each into place; a managed dir the new
 * geometry does not produce (e.g. a stale `rotation` after an OPQ →
 * plain retrain) is deleted rather than left to poison later loads.
 * A crash before the marker leaves the live index untouched; after
 * it, recovery re-finishes idempotently (the marker's dir list
 * distinguishes "never staged" from "already swapped", so a re-finish
 * can never delete a freshly-swapped dir). Callers hold the
 * [[Maintenance]] lock.
 */
private[pipeline] object StagedSwap {

  private val Staging = "_retrain"
  private val Pending = "_retrain_pending"

  /** Advance the cell-table maintenance watermark past every on-disk
    * stream batch BEFORE a rebuild absorbs them into the new base
    * layer — an unsuppressed crash-replay would duplicate its rows. */
  def suppressStreamReplays(
      spark: org.apache.spark.sql.SparkSession,
      rootPath: String,
      tablePath: String): Unit = {
    val r = CellTable.readRaw(spark, tablePath)
      .agg(F.max(F.when(F.col("__batch") >= 0L, F.col("__batch")))).head()
    val maxStream = if (r.isNullAt(0)) -1L else r.getLong(0)
    if (maxStream >= 0L) {
      val prior = CellTable.readMaintainedThrough(spark, rootPath)
      CellTable.writeMaintainedThrough(spark, rootPath,
        math.max(prior, maxStream))
    }
  }

  /** Stage (via `stage(stagingPath)`), journal, swap. `managedDirs` =
    * every subdirectory the index family may own. */
  def run(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      managedDirs: Seq[String],
      afterStage: () => Unit,
      afterJournal: () => Unit)(stage: String => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, Staging), true)
    stage(s"$path/$Staging")
    afterStage()
    val staged = managedDirs.filter(d =>
      fs.exists(new org.apache.hadoop.fs.Path(root, s"$Staging/$d")))
    val out = fs.create(new org.apache.hadoop.fs.Path(root, Pending), true)
    try out.write(staged.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    afterJournal()
    finish(fs, root, managedDirs, staged)
  }

  private def finish(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      managedDirs: Seq[String],
      staged: Seq[String]): Unit = {
    managedDirs.foreach { d =>
      val st = new org.apache.hadoop.fs.Path(root, s"$Staging/$d")
      val live = new org.apache.hadoop.fs.Path(root, d)
      if (staged.contains(d)) {
        if (fs.exists(st)) { // else: already swapped by a prior finish
          fs.delete(live, true)
          if (!fs.rename(st, live))
            throw new java.io.IOException(
              s"retrain: swap failed: $st -> $live; pending marker kept")
        }
      } else fs.delete(live, true) // stale dir the new geometry lacks
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, Pending), false)
    fs.delete(new org.apache.hadoop.fs.Path(root, Staging), true)
  }

  /** Idempotent crash repair: marker present → staged dirs were
    * complete, re-finish; absent → drop any half-written staging. */
  def recoverLocked(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      managedDirs: Seq[String]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = new org.apache.hadoop.fs.Path(root, Pending)
    if (fs.exists(pending)) {
      val in = fs.open(pending)
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      try {
        var n = in.read(buf)
        while (n > 0) { b.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      val staged = new String(b.toByteArray, "UTF-8").split("\n")
        .map(_.trim).filter(_.nonEmpty).toSeq
      finish(fs, root, managedDirs, staged)
    } else fs.delete(new org.apache.hadoop.fs.Path(root, Staging), true)
  }
}

/**
 * The batch-stamped cell-table protocol shared by the persisted ANN
 * indexes ([[Similarity.IvfIndex]]'s `assigned`,
 * [[ProductQuantization.IvfPqIndex]]'s `encoded`): rows live under
 * `__cell=C/__batch=N` partitions. The base build and batch
 * maintenance stamp `__batch=-1` (pure file-adds); a streaming
 * micro-batch stamps its id and writes with DYNAMIC overwrite, so a
 * replay replaces exactly its own files (effectively-once on
 * at-least-once delivery). A `_maintained_through` watermark at the
 * index root makes crash-replays of removal-mutated micro-batches
 * write nothing — the [[graft.pipeline.Retrieval]] / SketchView
 * `__batch` protocol applied to vector search. Probes partition-prune
 * on `__cell` exactly as before; the batch dimension is invisible to
 * readers (loaders drop it).
 */
private[pipeline] object CellTable {

  private val WatermarkFile = "_maintained_through.json"

  def readMaintainedThrough(
      spark: org.apache.spark.sql.SparkSession, rootPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(rootPath, WatermarkFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else try {
      val in = fs.open(p)
      val b = new Array[Byte](64)
      val n = try in.read(b) finally in.close()
      new String(b, 0, math.max(n, 0), "UTF-8").trim.toLong
    } catch { case _: Exception => -1L }
  }

  def writeMaintainedThrough(
      spark: org.apache.spark.sql.SparkSession,
      rootPath: String, v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(rootPath, WatermarkFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The raw table with partition columns normalized (`__cell` int,
    * `__batch` long — partition inference types both as int; the
    * empty-table sentinel stores them as plain columns). */
  def readRaw(
      spark: org.apache.spark.sql.SparkSession, tablePath: String): DataFrame =
    normalize(readVisible(spark, tablePath, "__cell"))

  private def normalize(df: DataFrame): DataFrame = {
    val withBatch =
      if (df.columns.contains("__batch")) df
      else df.withColumn("__batch", F.lit(-1L)) // pre-protocol layout
    withBatch
      .withColumn("__cell", F.col("__cell").cast("int"))
      .withColumn("__batch", F.col("__batch").cast("long"))
  }

  /**
   * Journal-aware read — EXACT in every crash state of [[compact]].
   * Normal path (no pending journal): one plain directory read, zero
   * extra IO. With a journal on disk the fold is fully staged, so the
   * post-fold view is assembled as (live data files MINUS the
   * journaled originals still present) UNION (whatever remains under
   * the staging dir): before the move phase that is staged ∪ nothing
   * pruned yet; mid-move each file is on exactly one side (rename is
   * atomic); after the prune it degenerates to the plain read. Readers
   * therefore never see folded rows twice OR zero times, even while a
   * crashed compact awaits recovery.
   */
  def readVisible(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      keyName: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = new org.apache.hadoop.fs.Path(root, PendingFile)
    if (!fs.exists(pending)) return spark.read.parquet(tablePath)
    val journaled = readJson(fs, pending).toSet
    def dataFiles(base: org.apache.hadoop.fs.Path): Seq[String] = {
      if (!fs.exists(base)) return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      fs.listStatus(base).foreach { k =>
        if (k.isDirectory && k.getPath.getName.startsWith(keyName + "="))
          fs.listStatus(k.getPath).foreach { b =>
            if (b.isDirectory) fs.listStatus(b.getPath).foreach { f =>
              if (f.isFile && !f.getPath.getName.startsWith("_"))
                out += f.getPath.toString
            }
          }
      }
      out.toSeq
    }
    val staging = new org.apache.hadoop.fs.Path(root, StagingDir)
    val live = dataFiles(root).filterNot(journaled.contains)
    val staged = dataFiles(staging)
    val parts = Seq(
      if (live.nonEmpty)
        Some(spark.read.option("basePath", tablePath).parquet(live: _*))
      else None,
      if (staged.nonEmpty)
        Some(spark.read.option("basePath", staging.toString)
          .parquet(staged: _*))
      else None).flatten
    if (parts.isEmpty) spark.read.parquet(tablePath)
    else parts.reduce(_ unionByName _)
  }

  /** Base (build-time) write: everything under `__batch=-1`, static
    * overwrite, one file per cell. */
  def writeBase(rows: DataFrame, tablePath: String): Unit =
    rows.withColumn("__batch", F.lit(-1L))
      .repartition(F.col("__cell"))
      .write.partitionBy("__cell", "__batch").mode("overwrite")
      .parquet(tablePath)

  /** One maintenance write of already-assigned rows (must carry
    * `__cell`): `batchId = -1` appends files; a real micro-batch id
    * dynamic-overwrites exactly its own `(__cell, __batch)`
    * partitions. Callers guard emptiness and the watermark. */
  def appendBatch(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      rows: DataFrame,
      batchId: Long): Unit = {
    // an index once emptied by a removal holds a flat schema-sentinel
    // file; partitioned appends must clear it first or the mixed
    // directory depth breaks parquet discovery
    Similarity.clearCellSentinel(spark, tablePath)
    val w = rows.withColumn("__batch", F.lit(batchId))
      // one file per touched cell per append, not one per task-slice
      .repartition(F.col("__cell"))
      .write.partitionBy("__cell", "__batch")
    (if (batchId == -1L) w.mode("append")
     else w.option("partitionOverwriteMode", "dynamic").mode("overwrite"))
      .parquet(tablePath)
  }

  private val PendingFile = "_compact_pending.json"
  private val StagingDir = "_compact_fold"

  /**
   * Fold retired batches of a cell table into `__batch=-1` — every
   * micro-batch leaves one file per touched cell, so a long-lived
   * stream accumulates files linearly; compaction rewrites each cell
   * back to one file. The SketchView snapshot-fold protocol, simplified
   * for plain rows (the fold is a set union, no merge math):
   *
   *   1. recover any pending compact, then SNAPSHOT the data files of
   *      every batch except the HIGHEST streaming id (a concurrent
   *      writer may be mid-commit of exactly that batch — it stays
   *      merge-on-read until the next compact);
   *   2. stage the snapshot's fold under `_compact_fold` (underscore
   *      dir — invisible to readers), one file per cell;
   *   3. advance the `_maintained_through` watermark, THEN journal the
   *      snapshot file list to `_compact_pending.json` — a crash-replay
   *      of a FOLDED micro-batch must write nothing, or its rows would
   *      land twice (once in the fold, once re-delivered); the ordering
   *      matters: a crash between the two leaves the watermark advanced
   *      with no journal (suppressed replays lose nothing while the
   *      originals are still live), never a recoverable fold whose
   *      replays aren't suppressed;
   *   4. MOVE the staged files under `__cell=C/__batch=-1` (checked
   *      renames; staged part names carry job UUIDs so they cannot
   *      collide with live appends), then prune the snapshot files
   *      (and emptied batch dirs), then drop journal + staging.
   *
   * Move-before-prune means a reader in the crash window sees folded
   * rows TWICE (benign for top-k probes — a duplicate candidate ties
   * at its own id — and repaired by the next maintenance call's
   * recovery), never zero times. Appends landing at ANY point are not
   * in the snapshot and survive; batch `-1` appends add files the
   * prune does not touch. Single-maintainer ENFORCED via the
   * [[Maintenance]] lock at `rootPath` (the streaming WRITER may keep
   * running). Returns the highest folded streaming batch id, or -1 if
   * nothing folded.
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      rootPath: String,
      tablePath: String,
      afterJournal: () => Unit = () => (),
      keyName: String = "__cell"): Long =
    Maintenance.withLock(spark, rootPath) {
      compactLocked(spark, rootPath, tablePath, afterJournal, keyName)
    }

  /** [[compact]]'s body WITHOUT the maintenance lock — for the one
    * caller that already holds it across a larger span
    * ([[graft.pipeline.Retrieval.compactTextIndex]]'s stats fold). */
  private[pipeline] def compactLocked(
      spark: org.apache.spark.sql.SparkSession,
      rootPath: String,
      tablePath: String,
      afterJournal: () => Unit = () => (),
      keyName: String = "__cell"): Long = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, tablePath, keyName)
    if (!fs.exists(root)) return -1L
    val cellDirs = fs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith(keyName + "="))
    if (cellDirs.isEmpty) return -1L // empty-table sentinel: nothing to fold
    val batchDirs = cellDirs.flatMap(c => fs.listStatus(c.getPath))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__batch="))
    val ids = batchDirs.map(_.getPath.getName.stripPrefix("__batch=").toLong)
      .distinct.sorted
    val streamIds = ids.filter(_ >= 0L)
    // nothing beyond the mid-commit window → no-op (folding -1 into
    // itself only rewrites files without reclaiming a batch dimension;
    // do it anyway when a cell holds several -1 files)
    val excluded = streamIds.lastOption
    val foldIds = ids.filterNot(excluded.contains).toSet
    val snapshot = batchDirs
      .filter(d => foldIds.contains(
        d.getPath.getName.stripPrefix("__batch=").toLong))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
    // fewer files than cells means folding cannot shrink anything
    if (snapshot.length <= cellDirs.length &&
        foldIds.forall(_ == -1L)) return -1L
    if (snapshot.isEmpty) return -1L
    val maxFolded = foldIds.filter(_ >= 0L).reduceOption(_ max _).getOrElse(-1L)
    val staging = new org.apache.hadoop.fs.Path(root, StagingDir)
    fs.delete(staging, true)
    spark.read.option("basePath", tablePath)
      .parquet(snapshot.map(_.toString).toIndexedSeq: _*)
      .drop("__batch")
      .withColumn("__batch", F.lit(-1L))
      .repartition(F.col(keyName))
      .write.partitionBy(keyName, "__batch").mode("overwrite")
      .parquet(staging.toString)
    // suppress folded replays FIRST, then journal the exact files to
    // prune — a crash between the two leaves the watermark advanced
    // with no journal (benign: originals still live), never a
    // recoverable fold whose folded batches could replay as duplicates
    if (maxFolded >= 0L) {
      val prior = readMaintainedThrough(spark, rootPath)
      writeMaintainedThrough(spark, rootPath, math.max(prior, maxFolded))
    }
    writeJson(fs, new org.apache.hadoop.fs.Path(root, PendingFile),
      snapshot.map(_.toString).toIndexedSeq)
    afterJournal() // spec seam: crash AFTER the journal commits
    finishCompact(fs, root, keyName)
    maxFolded
  }

  /**
   * Auto-compaction policy hook: run [[compact]] iff the table's
   * data-file count exceeds `maxFilesPerPart` × (number of key
   * partitions) — so long-lived streaming writers self-maintain on a
   * dial instead of accumulating one file per touched partition per
   * micro-batch until someone remembers the nightly call. The check is
   * ONE directory listing (driver-side, bounded by partitions ×
   * retained batches — kept small by the compaction itself); below the
   * dial it costs no job at all. Returns true iff a compaction ran.
   */
  def maybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      rootPath: String,
      tablePath: String,
      maxFilesPerPart: Int = 4,
      keyName: String = "__cell"): Boolean = {
    require(maxFilesPerPart >= 1,
      s"maxFilesPerPart must be >= 1, got $maxFilesPerPart")
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val keyDirs = fs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith(keyName + "="))
    if (keyDirs.isEmpty) return false
    // count per batch id so the NEWEST streaming batch — which compact
    // never folds (mid-commit window) — doesn't keep re-triggering a
    // fold that cannot reclaim it
    val perBatch = scala.collection.mutable.Map.empty[Long, Long]
    keyDirs.foreach { c =>
      fs.listStatus(c.getPath).foreach { b =>
        if (b.isDirectory && b.getPath.getName.startsWith("__batch=")) {
          val id = scala.util.Try(
            b.getPath.getName.stripPrefix("__batch=").toLong).getOrElse(-1L)
          val n = fs.listStatus(b.getPath).count(f =>
            f.isFile && !f.getPath.getName.startsWith("_"))
          perBatch(id) = perBatch.getOrElse(id, 0L) + n
        }
      }
    }
    val newest = perBatch.keys.filter(_ >= 0L).reduceOption(_ max _)
    val foldable = perBatch.filterNot(kv => newest.contains(kv._1))
      .values.sum
    if (foldable <= maxFilesPerPart.toLong * keyDirs.length) false
    else {
      compact(spark, rootPath, tablePath, keyName = keyName)
      true
    }
  }

  /** Finish (or re-finish, after a crash) a journaled fold: move the
    * staged files live, prune the journaled snapshot, drop journal +
    * staging. Every step is idempotent; renames are CHECKED (a silent
    * rename failure followed by the prune would lose rows). */
  private def finishCompact(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      keyName: String): Unit = {
    val staging = new org.apache.hadoop.fs.Path(root, StagingDir)
    if (fs.exists(staging)) fs.listStatus(staging).foreach { cell =>
      if (cell.isDirectory && cell.getPath.getName.startsWith(keyName + "=")) {
        val dest = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root, cell.getPath.getName), "__batch=-1")
        fs.mkdirs(dest)
        fs.listStatus(cell.getPath).foreach { b =>
          if (b.isDirectory) fs.listStatus(b.getPath).foreach { f =>
            if (f.isFile && !f.getPath.getName.startsWith("_")) {
              val to = new org.apache.hadoop.fs.Path(dest, f.getPath.getName)
              if (fs.exists(to)) fs.delete(f.getPath, false) // already moved
              else if (!fs.rename(f.getPath, to))
                throw new java.io.IOException(
                  s"compact: rename ${f.getPath} -> $to failed; journal kept")
            }
          }
        }
      }
    }
    val pending = new org.apache.hadoop.fs.Path(root, PendingFile)
    readJson(fs, pending).foreach { file =>
      fs.delete(new org.apache.hadoop.fs.Path(file), false)
    }
    // drop batch dirs the prune emptied (keep __batch=-1 homes)
    fs.listStatus(root).foreach { cell =>
      if (cell.isDirectory && cell.getPath.getName.startsWith(keyName + "=")) {
        var live = false
        fs.listStatus(cell.getPath).foreach { b =>
          if (b.isDirectory) {
            if (fs.listStatus(b.getPath).exists(_.isFile)) live = true
            else if (b.getPath.getName != "__batch=-1") fs.delete(b.getPath, true)
          }
        }
        if (!live && fs.listStatus(cell.getPath).isEmpty)
          fs.delete(cell.getPath, true)
      }
    }
    fs.delete(pending, false)
    fs.delete(staging, true)
  }

  /** Idempotent crash recovery: a journal on disk means the fold was
    * fully staged — re-finish it. No journal: drop any half-written
    * staging (the next compact restages from intact originals). */
  def recover(
      spark: org.apache.spark.sql.SparkSession, tablePath: String,
      keyName: String = "__cell"): Unit = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(root, PendingFile)))
      finishCompact(fs, root, keyName)
    else fs.delete(new org.apache.hadoop.fs.Path(root, StagingDir), true)
  }

  private def writeJson(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      files: Seq[String]): Unit = {
    val json = files
      .map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readJson(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] = {
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
    val s = new String(bytes, "UTF-8").trim
    // quote-aware parse, symmetric with writeJson's escaping — a data
    // file path may legally contain ',' (or '"' via escaping), so a
    // bare split-on-comma would corrupt recovery's prune list
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inString = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inString) {
        if (c == '\\' && i + 1 < s.length) {
          cur.append(s.charAt(i + 1)); i += 1
        } else if (c == '"') { out += cur.toString; cur.setLength(0); inString = false }
        else cur.append(c)
      } else if (c == '"') inString = true
      i += 1
    }
    out.toSeq
  }
}

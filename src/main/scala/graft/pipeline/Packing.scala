package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/**
 * Deterministic sequence packing: batch shaping for training pipelines,
 * where documents are concatenated into fixed token-budget packs.
 *
 * Semantics: within each stratum, documents are laid out in `orderCol`
 * order and cut into contiguous packs at every `budget` tokens of the
 * running total — `pack_id = exclusive-prefix-sum div budget`. Every
 * pack except a stratum's last therefore carries at least
 * `budget - max_doc_tokens` tokens, documents are never reordered, and
 * the assignment is a pure function of (stratum, order, tokens) —
 * reproducible across runs, cluster sizes, and engines (one window
 * sum + an integer division). A document larger than the budget spans
 * several budget multiples and pushes the next document to a fresh
 * pack, so oversize documents get packs of their own (intermediate
 * pack ids are skipped, not reused).
 *
 * Scale shape: ONE hash exchange on the stratum column plus a
 * per-partition external sort — the same physical shape as any window
 * aggregation. Choose stratum granularity (e.g. source x date-hour) so
 * a stratum's documents fit one executor's spillable sort, exactly as
 * with any windowed operator.
 *
 * NULL discipline: rows with NULL token counts get a NULL pack_id and
 * consume no budget; rows with NULL strata pack together in the NULL
 * stratum (window partitioning groups NULLs).
 */
object Packing {

  /**
   * Adds `pack_id` (per-stratum pack ordinal from 0) and `pack_pos`
   * (position within the pack from 0). `tokensCol` must be numeric;
   * pack totals use long arithmetic.
   */
  def packSequences(
      df: DataFrame,
      stratumCol: Column,
      orderCol: Column,
      tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val clash = df.columns.toSet.intersect(Set("pack_id", "pack_pos", "__cs"))
    require(clash.isEmpty, s"column names reserved by packSequences: $clash")

    val w = Window.partitionBy(stratumCol).orderBy(orderCol.asc_nulls_last)
    // exclusive prefix sum: the pack a document starts in
    val cs = F.coalesce(
      F.sum(tokensCol.cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)),
      F.lit(0L))
    val packed = df
      .withColumn("__cs", cs)
      .withColumn("pack_id",
        F.when(tokensCol.isNull, F.lit(null).cast("long"))
          .otherwise(F.expr(s"__cs div ${budget}L")))
    // pack_pos shares the window's partitioning and ordering, so both
    // window passes sit over the single exchange
    packed
      .withColumn("pack_pos",
        F.when(F.col("pack_id").isNull, F.lit(null).cast("long"))
          .otherwise(F.row_number().over(
            Window.partitionBy(stratumCol, F.col("pack_id"))
              .orderBy(orderCol.asc_nulls_last)).cast("long") - 1L))
      .drop("__cs")
  }

  /**
   * GPT-style GLOBAL token-stream layout: documents (plus one EOS
   * token each) concatenate in ascending `idCol` order into one
   * corpus-wide token stream that is cut into fixed `seqLen` windows —
   * documents STRADDLE sequence boundaries (no padding, no waste),
   * exactly the layout causal-LM pretraining consumes. Returns one row
   * per document: (id, n_tokens, token_offset, first_seq, last_seq)
   * where the doc's tokens (EOS included) occupy global positions
   * [token_offset, token_offset + n_tokens] and sequences
   * first_seq..last_seq.
   *
   * Unlike [[packSequences]] (per-stratum, whole-document packs), the
   * offset here is a GLOBAL exclusive prefix sum — computed with the
   * [[RangeCumsum]] two-phase cumsum (range-bucketed parallel windows
   * + broadcast prefix offsets), so no single-partition window ever
   * forms. Pure integer math: the layout is a function of
   * (id order, token counts) alone, reproducible across engines.
   */
  /**
   * In-context-pretraining ordering (semantic document adjacency —
   * the "related documents in the same context window" curation step):
   * assign every document to its frozen-centroid IVF cell, rank
   * within the cell by DESCENDING similarity to the cell centroid
   * (ties by id), and emit a single numeric `ord` key — cell in the
   * high bits, within-cell rank in the low 40 — whose ascending order
   * walks cell by cell through progressively less-central documents.
   * Feed `ord` to [[packTokenStream]] and related documents become
   * NEIGHBORS in the packed token stream instead of a random shuffle.
   *
   * Scale shape: assignment + csim are one broadcast-centroid map-only
   * pass; the within-cell rank is a window PARTITIONED by cell (never
   * a global sort); the key arithmetic is pure column math. Documents
   * with NULL vectors are dropped (they have no semantic address —
   * route them to a separate plain-packed stream).
   */
  def semanticOrder(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      index: Similarity.IvfIndex): DataFrame = {
    val spark = docs.sparkSession
    val cB = spark.sparkContext.broadcast(index.centroids)
    val assignU = F.udf((v: Array[Float]) => Similarity.nearestCentroid(cB.value, v))
    val csimU = F.udf((cell: Int, v: Array[Float]) => {
      val c = cB.value(cell)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      val n = math.min(c.length, v.length)
      while (i < n) {
        dot += v(i).toDouble * c(i).toDouble
        nv += v(i).toDouble * v(i).toDouble
        nc += c(i).toDouble * c(i).toDouble
        i += 1
      }
      if (nv == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(nv) * math.sqrt(nc))
    })
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col("__cell"))
      .orderBy(F.col("__csim").desc, F.col(idCol))
    docs
      .filter(F.col(vecCol).isNotNull)
      .withColumn("__cell", assignU(F.col(vecCol)))
      .withColumn("__csim", csimU(F.col("__cell"), F.col(vecCol)))
      // 2^40 rows per cell and 2^23 cells before the key saturates —
      // both orders of magnitude past any real nlist/cell occupancy
      .withColumn("ord",
        F.col("__cell").cast("long") * (1L << 40) +
          F.row_number().over(w).cast("long"))
  }

  def packTokenStream(
      df: DataFrame,
      idCol: String,
      nTokensCol: Column,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = df.select(F.col(idCol), nTokensCol.cast("long").as("n_tokens"))
      .filter(F.col("n_tokens").isNotNull && F.col("n_tokens") >= 0)
    val cum = RangeCumsum.inclusive(
      base, F.col(idCol), Seq(((F.col("n_tokens") + 1L), "__incl")))
    cum
      .withColumn("token_offset", F.col("__incl") - (F.col("n_tokens") + 1L))
      .withColumn("first_seq", F.expr(s"token_offset div ${seqLen}L"))
      .withColumn("last_seq",
        F.expr(s"(token_offset + n_tokens) div ${seqLen}L"))
      .drop("__incl")
  }

  /**
   * Per-sequence occupancy stats for a [[packTokenStream]] layout:
   * (seq_id, n_docs, n_tokens) — how many documents intersect each
   * `seqLen` window and how many of its tokens they fill (the last
   * sequence may be partial; all others are exactly full). Map-side
   * explode of each doc's first_seq..last_seq span (bounded fanout:
   * a doc touches ceil(n/seqLen)+1 sequences) + one aggregate.
   */
  def packedSequenceStats(layout: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    layout
      .select(F.col("token_offset"), F.col("n_tokens"),
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).as("seq_id"))
      .withColumn("__s", F.greatest(F.col("seq_id") * seqLen, F.col("token_offset")))
      .withColumn("__e", F.least(
        (F.col("seq_id") + 1L) * seqLen - 1L,
        F.col("token_offset") + F.col("n_tokens")))
      .groupBy(F.col("seq_id"))
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col("__e") - F.col("__s") + 1L).as("n_tokens"))
  }

  /**
   * Per-sequence DOCUMENT SPANS — the boundary side input for
   * sample-packed training: block-diagonal attention masks and
   * per-document position-id resets need to know where each
   * document's slice sits inside each fixed-length sequence. Returns
   * (seq_id, spans) with `spans` = array<struct<start, end, id>>
   * ordered by start — within-sequence INCLUSIVE token positions,
   * the EOS slot belonging to its document. Spans tile each sequence
   * gaplessly from position 0 (only the final sequence ends early).
   * Same bounded per-doc fanout + single aggregate as
   * [[packedSequenceStats]].
   */
  def packedDocSpans(layout: DataFrame, idCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    layout
      .select(F.col(idCol), F.col("token_offset"), F.col("n_tokens"),
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).as("seq_id"))
      .withColumn("__s", F.greatest(F.col("seq_id") * seqLen, F.col("token_offset")))
      .withColumn("__e", F.least(
        (F.col("seq_id") + 1L) * seqLen - 1L,
        F.col("token_offset") + F.col("n_tokens")))
      .groupBy(F.col("seq_id"))
      .agg(F.sort_array(F.collect_list(F.struct(
        (F.col("__s") - F.col("seq_id") * seqLen).cast("int").as("start"),
        (F.col("__e") - F.col("seq_id") * seqLen).cast("int").as("end"),
        F.col(idCol).as("id")))).as("spans"))
  }

  /**
   * Materialize the packed sequences themselves: documents' token-id
   * arrays (with `eosId` appended) concatenate in `idCol` order and
   * re-window into `seqLen`-sized id arrays — (seq_id, ids). One
   * map-side position explode + ONE hash exchange on seq_id; the
   * within-sequence order is pinned by sort_array on (position, id),
   * never by collect order.
   */
  def packTokenIds(
      df: DataFrame,
      idCol: String,
      idsCol: Column,
      seqLen: Long,
      eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = df.select(F.col(idCol),
        F.concat(idsCol.cast("array<int>"), F.array(F.lit(eosId))).as("__ids"))
      .filter(F.col("__ids").isNotNull)
    val layout = packTokenStream(
      base, idCol, F.size(F.col("__ids")) - 1, seqLen)
    base.join(layout, idCol)
      .select(F.col("token_offset"),
        F.posexplode(F.col("__ids")).as(Seq("__i", "__tok")))
      .withColumn("__pos", F.col("token_offset") + F.col("__i"))
      .groupBy(F.expr(s"__pos div ${seqLen}L").as("seq_id"))
      .agg(F.transform(
        F.sort_array(F.collect_list(F.struct(
          (F.col("__pos") % seqLen).cast("int").as("p"), F.col("__tok").as("t")))),
        s => s.getField("t")).as("ids"))
  }

  /**
   * First-fit-decreasing packing: within each stratum, documents sort
   * by (tokens DESC, id ASC) and greedily take the first open pack
   * with room — the classic FFD bin-packing heuristic (never worse
   * than 11/9 OPT + 1 packs), which beats [[packSequences]]'s
   * order-preserving cut whenever document lengths vary (the
   * sequential packer wastes whatever tail each cut leaves). Use it
   * when the training order within a pack doesn't matter; use
   * [[packSequences]] when document order must survive.
   *
   * Output: df + (pack_id, pack_pos) — pack ids ordinal per stratum
   * in pack-creation order, positions in assignment order; both a
   * pure function of (stratum, id, tokens), reproducible anywhere.
   * Documents larger than the budget get singleton packs. Rows with
   * NULL tokens get NULL pack_id (no budget consumed). `idCol` must
   * be unique across the input (the assignment joins back on it).
   *
   * Scale shape: one groupBy exchange carrying (stratum, id, tokens)
   * triples — never the text — plus a broadcast-or-shuffle join of
   * the id→pack mapping back onto the input. A stratum's TRIPLES
   * must fit one executor's memory (24 bytes/doc — hundreds of
   * millions per stratum before that binds); choose stratum
   * granularity accordingly, as with any windowed operator.
   */
  def packBestFit(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val clash = df.columns.toSet.intersect(Set("pack_id", "pack_pos"))
    require(clash.isEmpty, s"column names reserved by packBestFit: $clash")
    val session = df.sparkSession
    import session.implicits._
    val triples = df
      .filter(F.col(tokensCol).isNotNull)
      .select(F.col(stratumCol).cast("string").as("__st"),
        F.col(idCol).cast("long").as("__pk_id"),
        F.col(tokensCol).cast("long").as("__tk"))
      .as[(String, Long, Long)]
    val mapping = triples.groupByKey(_._1).flatMapGroups { (_, it) =>
      val docs = it.toArray.sortBy { case (_, id, tk) => (-tk, id) }
      // first-fit via a max-segment-tree over pack remainders: the
      // leftmost pack with room resolves in O(log packs), so a stratum
      // costs O(n log n) instead of the naive scan's O(n * packs)
      val ff = new FirstFit(budget, docs.length)
      val fill = new Array[Long](docs.length)
      docs.iterator.map { case (_, id, tk0) =>
        val p = ff.place(math.max(tk0, 0L))
        fill(p) += 1L
        (id, p.toLong, fill(p) - 1L)
      }
    }.toDF("__pk_id", "pack_id", "pack_pos")
    df.join(mapping.withColumnRenamed("__pk_id", "__pk_join"),
        F.col(idCol).cast("long") === F.col("__pk_join"), "left")
      .drop("__pk_join")
  }

  /** Test hook: a fresh first-fit placer as a plain function, so the
    * segment tree can be property-checked against a naive reference
    * without a Spark session. */
  private[pipeline] def firstFitForTest(budget: Long, maxPacks: Int): Long => Int = {
    val ff = new FirstFit(budget, maxPacks)
    tk => ff.place(tk)
  }

  /** Leftmost-pack-with-room structure for first-fit packing: a
    * perfect binary max-tree over pack remainders (capacity
    * `maxPacks` leaves, rounded to a power of two). `place(tk)`
    * descends to the leftmost leaf with remainder >= tk (opening a
    * fresh pack when none fits) and deducts — O(log packs). */
  private final class FirstFit(budget: Long, maxPacks: Int) {
    private val leaves = {
      var n = 1
      while (n < math.max(maxPacks, 1)) n <<= 1
      n
    }
    // tree(1) = root; leaf i at tree(leaves + i); unopened leaves hold
    // budget so "no open pack fits" naturally opens the next one
    private val tree = Array.fill(2 * leaves)(budget)

    /** Pack index for a document of `tk` tokens (tk may exceed
      * budget: the leftmost unopened pack absorbs it whole). */
    def place(tk: Long): Int = {
      val want = math.min(tk, budget) // oversize -> fresh pack, forced fit
      var node = 1
      while (node < leaves) {
        node = if (tree(2 * node) >= want) 2 * node else 2 * node + 1
      }
      val leaf = node - leaves
      tree(node) -= tk // oversize goes negative: nothing else fits
      var up = node >> 1
      while (up >= 1) {
        tree(up) = math.max(tree(2 * up), tree(2 * up + 1))
        up >>= 1
      }
      leaf
    }
  }

  /**
   * Length-bucketed batching for padded training (the SFT/batched-
   * inference efficiency dial): order rows by length DESC (ties by
   * id — deterministic) and chunk into fixed-size batches, so each
   * batch pads to a near-uniform max length. Returns (id, len, batch,
   * batch_pos). Padding waste per batch = max_len_in_batch * n - sum
   * of lens — sorting typically cuts it several-fold vs arrival-order
   * batching; measure with [[paddingWasteReport]].
   *
   * Exact integer math throughout (SQL-replayable). One global sort
   * (rank window over an empty partition — acceptable for the batch
   * sizes this feeds; shard first at corpus scale, the documented
   * RangeCumsum rule).
   */
  def lengthBucketBatches(
      df: DataFrame,
      idCol: String,
      lenCol: org.apache.spark.sql.Column,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val w = Window.orderBy(F.col("__len").desc, F.col(idCol).asc)
    df.select(F.col(idCol), lenCol.cast("long").as("__len"))
      .filter(F.col("__len").isNotNull)
      .withColumn("__rn", F.row_number().over(w))
      .select(F.col(idCol), F.col("__len").as("len"),
        // `div`, not Column `/` (which is always double division)
        F.expr(s"CAST((__rn - 1) div $batchSize AS BIGINT)").as("batch"),
        (((F.col("__rn") - 1) % batchSize).cast("int")).as("batch_pos"))
  }

  /** Per-batch padding accounting over [[lengthBucketBatches]] output
    * (or any (len, batch) table): (batch, n, max_len, sum_len,
    * padding_waste = max_len * n - sum_len). All exact longs. */
  def paddingWasteReport(batches: DataFrame): DataFrame =
    batches.groupBy(F.col("batch"))
      .agg(F.count(F.lit(1)).as("n"),
        F.max(F.col("len")).as("max_len"),
        F.sum(F.col("len")).as("sum_len"))
      .select(F.col("batch"), F.col("n"), F.col("max_len"), F.col("sum_len"),
        (F.col("max_len") * F.col("n") - F.col("sum_len")).as("padding_waste"))
}

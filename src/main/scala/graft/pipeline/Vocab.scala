package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Vocabulary induction for tokenizer prep: the top-V corpus tokens by
 * frequency, and the out-of-vocabulary rate that vocabulary leaves
 * behind — the two numbers that size a word-level tokenizer before
 * training one.
 *
 * Shape at 100 TB: token counting is one hash exchange with map-side
 * combine (the shuffle carries (token, partial-count), never text);
 * top-V is TakeOrderedAndProject (per-partition heaps, no global
 * sort); the OOV pass re-attaches the V-row vocabulary by BROADCAST
 * anti-join, so the corpus token stream is never shuffled for it.
 * Ordering ties break by (count DESC, token ASC) so the boundary of
 * the vocabulary is engine-deterministic.
 */
object Vocab {

  /** Whitespace tokens, exactly as q_topk_words / DuckDB
    * string_split_regex tokenize (empties included — both engines
    * yield them identically). */
  private def tokens(df: DataFrame, textCol: Column): DataFrame =
    df.select(F.explode(F.split(textCol, "\\s+")).as("token"))

  /** Top-`vocabSize` tokens as (token, cnt), deterministic order. */
  def buildVocabulary(df: DataFrame, textCol: Column, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    tokens(df, textCol)
      .groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .orderBy(F.col("cnt").desc, F.col("token"))
      .limit(vocabSize)
  }

  /** Document frequencies of every distinct non-empty token:
    * (token, dfreq). One hash exchange of (token, partial-count) with
    * map-side combine — the text never shuffles. */
  def documentFrequencies(df: DataFrame, textCol: Column): DataFrame =
    df.select(F.explode(F.array_distinct(
        F.filter(F.split(textCol, "\\s+"), t => F.length(t) > 0))).as("token"))
      .groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("dfreq"))

  /**
   * Per-document top-`k` distinctive terms — TF-IDF-style keyword
   * extraction ranked by tf/df, which orders identically to
   * tf·idf = tf·ln(N/df) for a fixed document (idf is monotone in
   * 1/df) while staying engine-exact: one integer-over-integer IEEE
   * division per term, no transcendental whose last ulp could differ
   * across engines. Ties break by term ASC. Output: (id, rank, term,
   * tf, dfreq), rank 1-based.
   *
   * Scale shape: document frequencies are one map-side-combined hash
   * exchange; the map collected to the driver is PRUNED to df >= 2
   * tokens — a df=1 token can only be scored by its own document, and
   * the probe's getOrElse(1) default is exact for it — which drops the
   * hapax-legomenon half of a web-scale vocabulary from the broadcast.
   * The scoring pass is then map-only over the corpus (per-doc tf
   * hashmap + top-k heap in one UDF, posexplode of k rows).
   */
  def topDistinctiveTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val session = docs.sparkSession
    import session.implicits._
    val dfMap: Map[String, Long] = documentFrequencies(docs, F.col(textCol))
      .filter(F.col("dfreq") >= 2L)
      .as[(String, Long)].collect().toMap
    val bc = session.sparkContext.broadcast(dfMap)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val topU = F.udf((t: String) => {
      if (t == null) Seq.empty[(String, Long, Long)]
      else {
        val tf = scala.collection.mutable.HashMap.empty[String, Long]
        sep.split(t).foreach(w => if (w.nonEmpty) tf.update(w, tf.getOrElse(w, 0L) + 1L))
        tf.iterator
          .map { case (w, n) => (w, n, bc.value.getOrElse(w, 1L)) }
          .toSeq
          .sortBy { case (w, n, d) => (-n.toDouble / d, w) }
          .take(k)
      }
    })
    docs.select(F.col(idCol), F.posexplode(topU(F.col(textCol))).as(Seq("__pos", "__t")))
      .select(F.col(idCol), (F.col("__pos") + 1L).cast("long").as("rank"),
        F.col("__t._1").as("term"), F.col("__t._2").as("tf"),
        F.col("__t._3").as("dfreq"))
  }

  /**
   * Join-based [[topDistinctiveTerms]] — identical output, NO
   * driver-side document-frequency map. The broadcast form's hapax
   * pruning halves a web vocabulary but by Heaps' law a 100 TB corpus
   * still leaves O(10^8) df>=2 terms — a multi-GB driver/executor map —
   * so past single-digit-TB corpora this is the form to run.
   *
   * Scale shape (the [[bigramLogLoss]] shape): per-document term
   * frequencies are one (id, term) map-side-combined exchange;
   * document frequencies one (term) exchange; scoring re-joins tf
   * against df on the term key (both sides shuffle on term — nothing
   * is ever collected); top-k is a row_number window partitioned by
   * document. The tf/df score is the same single IEEE division as the
   * broadcast form, and a df=1 term joins its true count 1 — exactly
   * the broadcast form's getOrElse(1) default — so the two forms are
   * row-for-row EQUAL, not merely close.
   */
  def topDistinctiveTermsJoined(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = docs
      .select(F.col(idCol), F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
        t => F.length(t) > 0)).as("term"))
      .groupBy(F.col(idCol), F.col("term"))
      .agg(F.count(F.lit(1)).as("tf"))
    val dfreq = documentFrequencies(docs, F.col(textCol))
      .withColumnRenamed("token", "term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(idCol))
      .orderBy((F.col("tf").cast("double") / F.col("dfreq").cast("double")).desc,
        F.col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select(F.col(idCol), F.col("rank"), F.col("term"), F.col("tf"), F.col("dfreq"))
  }

  /**
   * Per-document unigram cross-entropy — the cheap LM-quality signal:
   * score = avg over token occurrences of -ln(count(token)/total),
   * rounded to 4 decimals. Rare-token/gibberish documents score high,
   * common-token documents low; filter the top tail before training.
   * Returns (id, tokens, score); documents with no tokens are omitted.
   *
   * Scale shape: one map-side-combined token-count exchange, then the
   * count map is PRUNED to count >= 2 before the collect — a hapax
   * (count-1) token needs no map entry because the scorer's
   * `getOrElse(w, 1)` default IS its exact count, so scores are
   * bit-identical while the driver/broadcast footprint drops from the
   * full vocabulary to its non-hapax fraction (typically less than half
   * of a web-scale vocabulary; same pruning argument as
   * [[topDistinctiveTerms]]'s df >= 2). `total` still counts every
   * occurrence (a separate 1-row aggregate over the same lazily
   * checkpointed count table). Unseen tokens (scoring a stream against
   * a reference corpus) smooth to count 1.
   */
  def unigramLogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val session = docs.sparkSession
    val (countMap, total) = prunedUnigramModel(docs, textCol)
    val bc = session.sparkContext.broadcast(countMap)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val scoreU = F.udf((t: String) => {
      if (t == null) None
      else {
        val toks = sep.split(t).filter(_.nonEmpty)
        if (toks.isEmpty) None
        else {
          var s = 0.0
          toks.foreach { w =>
            s -= math.log(bc.value.getOrElse(w, 1L).toDouble / total)
          }
          Some((toks.length.toLong,
            BigDecimal(s / toks.length).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble))
        }
      }
    })
    docs.select(F.col(idCol), scoreU(F.col(textCol)).as("__s"))
      .filter(F.col("__s").isNotNull)
      .select(F.col(idCol), F.col("__s._1").as("tokens"), F.col("__s._2").as("score"))
  }

  /**
   * Join-based [[unigramLogLoss]] — same output at the 4-dp contract,
   * NO driver-side count map (the [[bigramLogLoss]] shape, for corpora
   * where even the count>=2 vocabulary outgrows a broadcast). One
   * map-side-combined token-count exchange builds the count table; the
   * corpus-wide total is a 1-row aggregate broadcast back via
   * crossJoin; scoring re-joins per-document token occurrences against
   * the counts on the token key. Per-token -ln(c/total) values are
   * bit-identical to the broadcast form; only the per-document
   * summation ORDER differs (groupBy vs token order), whose ~1e-13
   * noise the 4-dp rounding absorbs — the same argument, and the same
   * spec pin, as [[bigramLogLoss]].
   */
  def unigramLogLossJoined(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = docs
      .select(F.col(idCol).as("id"),
        F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
          t => F.length(t) > 0)).as("token"))
      .localCheckpoint(eager = false) // scored against its own counts below
    val counts = occ.groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val totalDf = counts.agg(F.coalesce(F.sum(F.col("c")), F.lit(0L))
      .cast("double").as("__total"))
    occ
      .join(counts, Seq("token"))
      .crossJoin(F.broadcast(totalDf))
      .groupBy(F.col("id"))
      .agg(F.count(F.lit(1)).as("tokens"),
        F.round(F.avg(-F.log(F.col("c").cast("double") / F.col("__total"))), 4)
          .as("score"))
      .select(F.col("id").as(idCol), F.col("tokens"), F.col("score"))
  }

  /**
   * Per-document bigram cross-entropy — the next signal up from
   * [[unigramLogLoss]]: score = avg over adjacent token pairs of
   * -ln(count(l,r) / count(l as left)), rounded to 4 decimals. Word
   * salad scores high even when its individual words are common;
   * fluent text scores low. Returns (id, bigrams, score); documents
   * with fewer than two tokens are omitted.
   *
   * Scale shape: join-based, NO driver-side model (the
   * [[NgramLm.kneserNeyLogLoss]] shape) — the unigram model's
   * hapax-pruning argument does NOT transfer to bigrams, whose
   * non-hapax type count keeps growing near-linearly with corpus
   * size, so a broadcast map would be an unbounded driver footprint
   * at web scale. One map-side-combined bigram-count exchange feeds
   * the (l, r) count table; left totals aggregate from that table
   * (not the corpus); scoring re-joins the per-document bigram rows
   * against both. Per-document averages round to 4 decimals — the
   * repo's cross-engine float form; the groupBy summation-order noise
   * is ~1e-13, far inside the rounding.
   */
  def bigramLogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = F.filter(F.split(F.col(textCol), "\\s+"), t => F.length(t) > 0)
    val big = docs
      .select(F.col(idCol).as("id"), toks.as("__w"))
      .filter(F.size(F.col("__w")) >= 2)
      .select(F.col("id"), F.explode(F.transform(
        F.sequence(F.lit(1), F.size(F.col("__w")) - 1),
        i => F.struct(
          F.element_at(F.col("__w"), i).as("l"),
          F.element_at(F.col("__w"), i + 1).as("r")))).as("__b"))
      .select(F.col("id"), F.col("__b.l").as("l"), F.col("__b.r").as("r"))
      .localCheckpoint(eager = false) // scored against its own counts below
    val bc = big.groupBy(F.col("l"), F.col("r"))
      .agg(F.count(F.lit(1)).as("cb"))
      .localCheckpoint(eager = false)
    val lc = bc.groupBy(F.col("l")).agg(F.sum(F.col("cb")).as("cl"))
    big
      .join(bc, Seq("l", "r"))
      .join(lc, Seq("l"))
      .groupBy(F.col("id"))
      .agg(F.count(F.lit(1)).as("bigrams"),
        F.round(F.avg(-F.log(F.col("cb").cast("double") / F.col("cl").cast("double"))), 4)
          .as("score"))
      .select(F.col("id").as(idCol), F.col("bigrams"), F.col("score"))
  }

  /** The bounded unigram model behind [[unigramLogLoss]]: the count map
    * pruned to count >= 2 (hapaxes reconstruct exactly via the
    * smoothing default), plus the UNPRUNED total occurrence count.
    * Exposed for specs pinning the broadcast footprint. */
  private[pipeline] def prunedUnigramModel(
      docs: DataFrame, textCol: String): (Map[String, Long], Double) = {
    val session = docs.sparkSession
    import session.implicits._
    val tokenCounts = docs
      .select(F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
        t => F.length(t) > 0)).as("token"))
      .groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val total = Option(tokenCounts.agg(F.sum(F.col("c"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble
    val countMap = tokenCounts.filter(F.col("c") >= 2L)
      .as[(String, Long)].collect().toMap
    (countMap, total)
  }

  /**
   * Learn `k` BPE merges over the corpus (word-internal, character
   * initial alphabet): repeatedly count adjacent symbol pairs weighted
   * by word frequency and merge the most frequent pair, left-to-right
   * non-overlapping, ties broken by (left, right) lexicographically.
   * Returns the merge table (left, right, pairFrequency) in learned
   * order — with [[buildVocabulary]]/[[oovStats]] this completes the
   * tokenizer-prep surface.
   *
   * Scale shape: the classic trick — learning runs on the DISTINCT
   * word-frequency table (one map-side-combined token count), never the
   * corpus; and merges are learned in BATCHES: each round is ONE
   * pair-count aggregate + top-(batch+1) collect that admits up to
   * `batchSize` merges, so a 32k-merge vocabulary needs ~k/batch
   * pair-count passes rather than one per merge. Batching is EXACT,
   * not a heuristic — see [[learnBpeMergesBatched]] for the invariant.
   * The evolving symbol sequences carry forward under a lazy checkpoint
   * that cuts the lineage.
   */
  def learnBpeMerges(
      docs: DataFrame,
      textCol: String,
      k: Int): Seq[(String, String, Long)] =
    // a wider batch is free when admission is low (the collect grows by
    // batch+1 TINY rows) and halves the rounds when pairs are disjoint
    learnBpeMergesBatched(docs, textCol, k, batchSize = 32)._1

  /**
   * Batched BPE learning; returns (merges, rounds) where `rounds` is
   * the number of pair-count passes run (the spec hook for the
   * jobs-per-vocabulary bound).
   *
   * Why the batch is exact: rank the round's pairs by (freq DESC, pair)
   * — the sequential tie-break. Take the maximal PREFIX q1..qm whose
   * members are pairwise symbol-disjoint, counting each earlier
   * member's concatenation as a used symbol (merging (a,b) changes the
   * counts of exactly the pairs touching a, b, or "ab" — neighbours
   * lose an occurrence, (x,"ab")/("ab",y) are created), then TRIM to
   * members whose frequency is STRICTLY above the first excluded
   * pair's. After merging q1..q(i-1): batch members' counts are
   * untouched (disjointness); every non-batch pair's count can only
   * have decreased from its original, which was already <= the
   * boundary frequency by rank (the prefix is contiguous); and every
   * newly created pair is count-bounded by an old pair touching some
   * merged symbol — excluded from the prefix, hence also <= the
   * boundary. Strict inequality means no tie-break can promote any of
   * them past q(i), so q(i) is exactly the sequential argmax at its
   * step, at its original frequency. Worst case (immediate conflict or
   * a boundary tie) degrades to one merge per round — never to a wrong
   * merge.
   */
  /** Distinct-word ceiling for the driver-local BPE merge loop: ~2M
    * entries at tens of bytes each is ~100-200 MB driver heap. Above
    * it, learning stays fully distributed. */
  val DefaultMaxLocalWords: Long = 2L * 1024 * 1024

  /** Exact sequential BPE over an in-memory word-count table:
    * incremental pair-count maintenance (only words containing the
    * merged pair are touched) plus a lazy max-heap — every count
    * change is pushed, stale entries are discarded against the live
    * map on pop, so each step's pop is the true (freq DESC, pair ASC)
    * argmax: the same tie-break the distributed path encodes with its
    * NUL-joined sort key (lexicographic on l+NUL+r == tuple order on
    * (l, r) because NUL sorts below every character). */
  private[pipeline] def localBpe(
      table: Seq[(Seq[String], Long)], k: Int): Seq[(String, String, Long)] = {
    val words = table.map { case (sym, c) =>
      (scala.collection.mutable.ArrayBuffer.from(sym), c)
    }.toArray
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    val heap = new java.util.PriorityQueue[(Long, (String, String))](64,
      new java.util.Comparator[(Long, (String, String))] {
        def compare(a: (Long, (String, String)), b: (Long, (String, String))): Int = {
          val byF = java.lang.Long.compare(b._1, a._1) // freq DESC
          if (byF != 0) byF
          else {
            val byL = a._2._1.compareTo(b._2._1)       // pair ASC
            if (byL != 0) byL else a._2._2.compareTo(b._2._2)
          }
        }
      })
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val n = pairCount.getOrElse(p, 0L) + delta
      if (n <= 0) pairCount.remove(p) else pairCount(p) = n
      val set = pairWords.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty)
      if (delta > 0) set += wi
      if (n > 0) heap.add((n, p))
    }
    var wi = 0
    while (wi < words.length) {
      val (sym, c) = words(wi)
      var j = 0
      while (j + 1 < sym.length) { bump((sym(j), sym(j + 1)), c, wi); j += 1 }
      wi += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    while (merges.size < k && !heap.isEmpty) {
      val (f, p) = heap.poll()
      if (pairCount.get(p).contains(f)) {
        merges += ((p._1, p._2, f))
        val (l, r) = p
        val affected = pairWords(p).toArray
        pairCount.remove(p)
        var ai = 0
        while (ai < affected.length) {
          val i = affected(ai)
          val (sym, c) = words(i)
          var j = 0
          while (j + 1 < sym.length) {
            val q = (sym(j), sym(j + 1))
            if (q != p) { bump(q, -c, i); pairWords.get(q).foreach(_ -= i) }
            else pairCount.get(q).foreach(n =>
              if (n - c <= 0) pairCount.remove(q) else { pairCount(q) = n - c; heap.add((n - c, q)) })
            j += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          j = 0
          while (j < sym.length) {
            if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == r) {
              out += l + r; j += 2
            } else { out += sym(j); j += 1 }
          }
          words(i) = (out, c)
          j = 0
          while (j + 1 < out.length) { bump((out(j), out(j + 1)), c, i); j += 1 }
          ai += 1
        }
        pairCount.remove(p)
        pairWords.remove(p)
      }
    }
    merges.toSeq
  }

  def learnBpeMergesBatched(
      docs: DataFrame,
      textCol: String,
      k: Int,
      batchSize: Int,
      maxLocalWords: Long = DefaultMaxLocalWords): (Seq[(String, String, Long)], Int) = {
    require(k >= 1, s"k must be positive, got $k")
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val session = docs.sparkSession
    import session.implicits._
    val charsU = F.udf((w: String) => w.map(_.toString).toArray)
    var words = docs
      .select(F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
        t => F.length(t) > 0)).as("w"))
      .groupBy(F.col("w")).agg(F.count(F.lit(1)).as("c"))
      .select(charsU(F.col("w")).as("sym"), F.col("c"))
      .localCheckpoint(eager = false)
    // driver-local fast path: BPE learns from the DISTINCT word-count
    // table, whose size is vocabulary-bounded, not corpus-bounded —
    // when it fits, collect it once and run the exact sequential
    // learner with zero per-round Spark jobs (the shape every real
    // tokenizer trainer uses: distributed count, local merge loop)
    if (words.count() <= maxLocalWords) {
      val tbl = words.as[(Seq[String], Long)].collect()
      return (localBpe(tbl, k), 0)
    }
    // NUL as the pair separator: it sorts below every character, so
    // lexicographic order on the joined string equals tuple order on
    // (left, right) — the tie-break the oracle replicates
    val pairU = F.udf((sym: Seq[String]) =>
      if (sym.length < 2) Array.empty[String]
      else Array.tabulate(sym.length - 1)(j => sym(j) + "\u0000" + sym(j + 1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var rounds = 0
    var done = false
    while (merges.size < k && !done) {
      val maxTake = math.min(batchSize, k - merges.size)
      val top = words.select(F.explode(pairU(F.col("sym"))).as("p"), F.col("c"))
        .groupBy(F.col("p")).agg(F.sum(F.col("c")).as("f"))
        .orderBy(F.col("f").desc, F.col("p"))
        .limit(maxTake + 1).as[(String, Long)].collect()
      rounds += 1
      if (top.isEmpty) done = true
      else {
        // maximal disjoint prefix of the ranked list
        val used = scala.collection.mutable.HashSet.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var m = 0
        var conflict = false
        while (m < top.length && !conflict && batch.size < maxTake) {
          val Array(l, r) = top(m)._1.split("\u0000", 2)
          if (batch.isEmpty || (!used(l) && !used(r))) {
            batch += ((l, r, top(m)._2))
            used += l; used += r; used += (l + r)
            m += 1
          } else conflict = true
        }
        // boundary = first excluded pair's frequency (None when the
        // collected list is complete and fully taken — no pairs remain)
        val fNext: Option[Long] =
          if (m < top.length) Some(top(m)._2) else None
        val admitted = (batch.head +: batch.tail.takeWhile(b =>
          fNext.forall(b._3 > _))).toSeq
        merges ++= admitted
        val batchArr = admitted.map(b => (b._1, b._2)).toArray
        val mergeU = F.udf((sym: Seq[String]) => {
          var cur: Array[String] = sym.toArray
          var bi = 0
          while (bi < batchArr.length) {
            val (l, r) = batchArr(bi)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < cur.length) {
              if (j + 1 < cur.length && cur(j) == l && cur(j + 1) == r) {
                out += l + r; j += 2
              } else { out += cur(j); j += 1 }
            }
            cur = out.toArray
            bi += 1
          }
          cur
        })
        words = words.select(mergeU(F.col("sym")).as("sym"), F.col("c"))
          .localCheckpoint(eager = false)
      }
    }
    (merges.toSeq, rounds)
  }

  /**
   * Rank-based BPE segmentation — the tokenizer-shaped apply: instead
   * of one pass per learned merge (O(k·len), infeasible at a real 32k
   * merge table), repeatedly merge the LOWEST-ranked pair present
   * (left-to-right non-overlapping), O(len²) per word independent of
   * k. Provably equivalent to [[applyBpe]]: a pair containing a merge's
   * concatenation can only have been learned AFTER that merge (the
   * symbol didn't exist before), so every pair a merge creates has a
   * higher rank than the merge itself — the minimum present rank never
   * decreases, and merges fire in exactly the learned order.
   */
  def applyBpeRanked(ranks: Map[(String, String), Int], word: String): Seq[String] = {
    var sym: Array[String] = word.map(_.toString).toArray
    var done = sym.length < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < sym.length - 1) {
        val r = ranks.getOrElse((sym(j), sym(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length &&
              ranks.getOrElse((sym(i), sym(i + 1)), Int.MaxValue) == best) {
            out += sym(i) + sym(i + 1); i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.toArray
        done = sym.length < 2
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(sym)
  }

  /**
   * Distributed BPE tokenization: adds `outCol` = the document's token
   * sequence (whitespace words segmented by the learned merge table,
   * concatenated in order). Map-only over the corpus — the merge table
   * broadcasts as a rank map ([[applyBpeRanked]]), and a per-task memo
   * cache reuses segmentations across repeated words (Zipf makes the
   * hit rate very high), so the corpus pays amortized O(tokens), not
   * O(tokens · word-length²). NULL text → NULL tokens.
   */
  def tokenizeBpe(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      outCol: String = "tokens"): DataFrame =
    tokenizeBpeRanked(docs, textCol,
      merges.zipWithIndex.map { case (m, i) => m -> i }.toMap, outCol)

  /** Column-level learned-BPE token count — the budget pricer for
    * [[graft.pipeline.Retrieval.assembleContextBatch]]'s `tokenCost`
    * (real RAG budgets are MODEL-token budgets, not whitespace-word
    * budgets). One bounded UDF over the snippet strings; empty/NULL
    * text prices 0. */
  def bpeTokenCount(merges: Seq[(String, String)])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val ranks = merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val u = F.udf((s: String) =>
      if (s == null || s.isEmpty) 0
      else s.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => graft.pipeline.Vocab.applyBpeRanked(ranks, w).length).sum)
    (c: org.apache.spark.sql.Column) => u(c)
  }

  /** [[tokenizeBpe]] from an explicit pair-rank map — the shape
    * [[TokenizerIO.loadSentencePieceBpe]] reconstructs (SPM BPE stores
    * pieces, not pairs; every valid split of a piece shares the
    * piece's rank, which is exactly SentencePiece's piece-score greedy
    * merging expressed as pair ranks). */
  def tokenizeBpeRanked(
      docs: DataFrame,
      textCol: String,
      ranks: Map[(String, String), Int],
      outCol: String = "tokens"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val tokU = F.udf(new Function1[String, Array[String]] with Serializable {
      // per-THREAD LRU: tasks run concurrently in one executor JVM and
      // LinkedHashMap is not thread-safe
      @transient private lazy val memo = ThreadLocal.withInitial(
        new java.util.function.Supplier[java.util.LinkedHashMap[String, Array[String]]] {
          def get() = new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 65536
          }
        })
      def apply(t: String): Array[String] =
        if (t == null) null
        else {
          val m = memo.get()
          sep.split(t).iterator.filter(_.nonEmpty).flatMap { w =>
            var seg = m.get(w)
            if (seg == null) {
              seg = applyBpeRanked(bc.value, w).toArray
              m.put(w, seg)
            }
            seg
          }.toArray
        }
    })
    docs.withColumn(outCol, tokU(F.col(textCol)))
  }

  /**
   * BPE-dropout segmentation (Provilkov et al. 2020): like
   * [[applyBpeRanked]], but each merge OCCURRENCE is dropped with
   * probability `p` at the moment it would apply — PERMANENTLY for
   * that occurrence (the huggingface-tokenizers semantics: a skipped
   * queue entry is consumed; only a neighbor merge that re-forms the
   * pair re-queues it). Dropping where merges do not compete leaves
   * the word partially merged — that is the point: the training-time
   * augmentation exposes a model to coarser segmentations of the same
   * word. `p = 0` reproduces [[applyBpeRanked]] exactly (and consumes
   * no draws). `nextU` supplies the caller's uniform draws, so a
   * seeded source replays the same segmentation. Occurrences pop in
   * (rank, left-to-right insertion) order, so the walk is
   * deterministic given the draws.
   */
  def applyBpeDropout(
      ranks: Map[(String, String), Int],
      word: String,
      p: Double,
      nextU: () => Double): Seq[String] = {
    require(p >= 0.0 && p < 1.0, s"dropout p must be in [0, 1), got $p")
    if (p == 0.0) return applyBpeRanked(ranks, word)
    if (word.length < 2) return word.map(_.toString)
    final class Node(var s: String) {
      var prev: Node = null
      var next: Node = null
      var dead: Boolean = false
    }
    val head = new Node(word.charAt(0).toString)
    var tail = head
    var ci = 1
    while (ci < word.length) {
      val n = new Node(word.charAt(ci).toString)
      n.prev = tail; tail.next = n; tail = n; ci += 1
    }
    // queue entries: (rank, seq, left node, expected left/right strings);
    // stale entries (either member changed or died) are discarded on pop
    final case class Cand(rank: Int, seq: Long, left: Node, ls: String, rs: String)
    implicit val ord: Ordering[Cand] =
      Ordering.by((c: Cand) => (-c.rank, -c.seq)) // PQ is a max-heap
    val queue = scala.collection.mutable.PriorityQueue.empty[Cand]
    var seq = 0L
    def push(left: Node): Unit =
      if (left != null && !left.dead && left.next != null && !left.next.dead) {
        val r = ranks.getOrElse((left.s, left.next.s), Int.MaxValue)
        if (r != Int.MaxValue) { queue.enqueue(Cand(r, seq, left, left.s, left.next.s)); seq += 1 }
      }
    var n0 = head
    while (n0 != null) { push(n0); n0 = n0.next }
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      val l = c.left
      val valid = !l.dead && l.s == c.ls && l.next != null &&
        !l.next.dead && l.next.s == c.rs
      if (valid && nextU() >= p) {
        val r = l.next
        l.s = l.s + r.s
        r.dead = true
        l.next = r.next
        if (r.next != null) r.next.prev = l
        push(l.prev)
        push(l)
      } // dropped or stale: the entry is consumed
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var n = head
    while (n != null) { out += n.s; n = n.next }
    out.toSeq
  }

  /**
   * BPE-dropout corpus tokenization — [[tokenizeBpe]]'s sampled
   * sibling: each whitespace word segments under per-occurrence merge
   * dropout, with draws seeded DETERMINISTICALLY per (document id,
   * word position, draw index) like
   * [[UnigramLm.tokenizeSampled]]'s rule — re-running the pipeline
   * reproduces the same corpus, while positions sample independently.
   * No word memoization (draws are position-dependent by design);
   * `p = 0` short-circuits to the memoized [[tokenizeBpe]].
   */
  def tokenizeBpeDropout(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      p: Double,
      seed: Long = 0L,
      outCol: String = "tokens"): DataFrame = {
    require(p >= 0.0 && p < 1.0, s"dropout p must be in [0, 1), got $p")
    if (p == 0.0) return tokenizeBpe(docs, textCol, merges, outCol)
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (m, i) => m -> i }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val tokU = F.udf((id: java.lang.Long, t: String) =>
      if (t == null || id == null) null
      else {
        var pos = 0
        sep.split(t).iterator.filter(_.nonEmpty).flatMap { w =>
          val base = TextFunctions.mix64(
            seed ^ TextFunctions.mix64(id.longValue() * 0x9E3779B97F4A7C15L + pos))
          var draw = 0L
          val nextU = () => {
            val h = TextFunctions.mix64(base + draw * 0xC2B2AE3D27D4EB4FL)
            draw += 1
            (h >>> 11).toDouble / (1L << 53).toDouble
          }
          pos += 1
          applyBpeDropout(bc.value, w, p, nextU)
        }.toArray
      })
    docs.withColumn(outCol, tokU(F.col(idCol).cast("long"), F.col(textCol)))
  }

  /** Segment a word with a learned merge table (merges applied in
    * learned order, each left-to-right non-overlapping). */
  def applyBpe(merges: Seq[(String, String)], word: String): Seq[String] = {
    var sym: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < sym.length) {
        if (j + 1 < sym.length && sym(j) == l && sym(j + 1) == r) {
          out += (l + r); j += 2
        } else { out += sym(j); j += 1 }
      }
      sym = out.result()
    }
    sym
  }

  /** One row: (total_tokens, oov_tokens, vocab_size) of the corpus
    * against a (token, ...) vocabulary. */
  def oovStats(df: DataFrame, textCol: Column, vocabulary: DataFrame): DataFrame = {
    val toks = tokens(df, textCol)
    val vocab = vocabulary.select(F.col("token"))
    val oov = toks.join(F.broadcast(vocab), Seq("token"), "left_anti")
      .agg(F.count(F.lit(1)).as("oov_tokens"))
    toks.agg(F.count(F.lit(1)).as("total_tokens"))
      .crossJoin(oov)
      .crossJoin(vocab.agg(F.count(F.lit(1)).as("vocab_size")))
  }

  /**
   * CCNet-style corpus partition (Wenzek et al. 2020): score every
   * document with [[unigramLogLoss]] cross-entropy, then split the
   * corpus into `nBuckets` equi-depth tiers of the corpus-wide score
   * distribution — bucket 0 ("head", most-fluent/lowest-loss) through
   * the last bucket ("tail"). Returns (id, tokens, score, bucket,
   * tier); documents with no tokens are omitted, like the scorer.
   *
   * Scale shape: the scorer's broadcast count map plus TWO 1-row
   * aggregates — the exact score minimum and a DDSketch over the
   * MIN-SHIFTED scores; the corpus re-attaches to both by broadcast
   * and never shuffles. The shift matters: cross-entropy scores
   * cluster in a band much narrower than their magnitude (ln V ± a
   * little), where a relative-accuracy sketch has one bin for the
   * whole corpus — shifting to the band's origin makes the bins as
   * fine as the band needs, and a monotone shift cannot change any
   * rank. Bucket assignment compares each shifted score against the
   * sketch's nBuckets-1 quantile thresholds — explicit cutoffs, the
   * CCNet formulation: a tie mass sitting exactly on a cutoff stays
   * together in the LOWER tier, where a floor(cdf*n) rule would split
   * it on float rounding. The repeated quantile probes fuse into one
   * sketch decode via MultiQuantileFusion. Thresholds are
   * sketch-accurate, which is exactly how CCNet computes them (on a
   * sample) — tier boundaries are statistical, not exact order
   * statistics.
   */
  def perplexityPartition(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 tiers, got $nBuckets")
    val G = graft.sketch.functions
    val scored = unigramLogLoss(docs, idCol, textCol)
    val mn = scored.agg(F.min(F.col("score")).as("__mn"))
    val shifted = scored.crossJoin(F.broadcast(mn))
      .withColumn("__shift", F.col("score") - F.col("__mn"))
    val sk = shifted.agg(G.ddsketch_agg_values(F.col("__shift")).as("__sk"))
    // a quantile estimate can undershoot the true cutoff value by up to
    // the sketch's relative accuracy; inflate by the two-sided bound so
    // the cutoff bin's own tie mass is never "strictly greater"
    val alpha = graft.sketch.DDSketch.DefaultRelativeAccuracy
    val inflate = (1 + alpha) / (1 - alpha)
    val bucket = (1 until nBuckets)
      .map(i => (F.col("__shift") >
        G.ddsketch_quantile(F.col("__sk"), i.toDouble / nBuckets) * inflate)
        .cast("int"))
      .reduce(_ + _)
    shifted.crossJoin(F.broadcast(sk))
      .withColumn("bucket", bucket)
      .withColumn("tier",
        F.when(F.col("bucket") === 0, "head")
          .when(F.col("bucket") === nBuckets - 1, "tail")
          .otherwise("middle"))
      .drop("__mn", "__shift", "__sk")
  }
}

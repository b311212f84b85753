package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * WordPiece tokenizer (Schuster & Nakajima 2012; the BERT form):
 * greedy longest-match-first segmentation against a piece vocabulary,
 * with word-internal continuation pieces prefixed "##" and an [UNK]
 * fallback for unsegmentable words. Third tokenizer family next to
 * BPE ([[Vocab.tokenizeBpe]]) and the unigram LM ([[UnigramLm]]).
 *
 * Vocabulary induction reuses the EXACT sequential BPE learner over
 * position-marked symbols: every non-initial character carries a
 * one-char continuation sentinel, so merges stay position-aware
 * ("ab" word-initial and "##ab" word-internal are distinct pieces)
 * while the learner remains oblivious. Sentinels are interior-stripped
 * when pieces are rendered.
 *
 * Scale shape: training = ONE map-side-combined word-count shuffle,
 * then a driver-local merge loop on the vocabulary-bounded word table
 * (same threshold story as [[Vocab.DefaultMaxLocalWords]]);
 * tokenization is a map-only scan with a broadcast piece set and a
 * per-THREAD LRU memo (executor JVMs share tasks — a shared map would
 * corrupt; repeated words amortize to O(1) via Zipf).
 */
object WordPiece {

  /** Continuation sentinel used internally during training; never
    * appears in rendered pieces. */
  private val Cont = '\u0001'

  final case class Model(
      pieces: Set[String],
      unk: String = "[UNK]",
      maxInputChars: Int = 200) {
    /** Longest piece length (rendered, without the ## prefix),
      * precomputed to bound the greedy scan. */
    private[pipeline] val maxPiece: Int =
      if (pieces.isEmpty) 0
      else pieces.iterator.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  }

  /**
   * Greedy longest-match-first segmentation (the BERT algorithm):
   * from each position take the LONGEST vocabulary piece (with "##"
   * prefix when not word-initial); if no piece matches at any
   * position, the whole word degrades to `unk`. Words longer than
   * `maxInputChars` also become `unk` (the BERT guard against
   * pathological inputs making the O(len·maxPiece) scan quadratic).
   */
  def segment(model: Model, word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > model.maxInputChars) return Array(model.unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = math.min(word.length, start + model.maxPiece)
      var found: String = null
      while (found == null && end > start) {
        val sub = word.substring(start, end)
        val cand = if (start == 0) sub else "##" + sub
        if (model.pieces.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Array(model.unk)
      out += found
      start = end
    }
    out.toArray
  }

  /**
   * Induce a WordPiece vocabulary of (up to) `vocabSize` pieces from
   * the corpus: all single-character pieces (both positions) are
   * always included — that is what guarantees zero [UNK] on the
   * training corpus — and the remainder of the budget is filled by
   * exact BPE merges over the position-marked word table. Above
   * `maxLocalWords` distinct words the table is truncated to the most
   * frequent entries (logged, never silent) — character coverage is
   * still computed from the FULL table.
   */
  def learn(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      unk: String = "[UNK]",
      maxLocalWords: Long = Vocab.DefaultMaxLocalWords): Model = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val session = docs.sparkSession
    import session.implicits._
    val counts = docs
      .select(F.explode(F.filter(F.split(F.col(textCol), "\\s+"),
        t => F.length(t) > 0)).as("w"))
      .groupBy(F.col("w")).agg(F.count(F.lit(1)).as("c"))
      .localCheckpoint(eager = false)
    // full-table character coverage (tiny aggregate: one row per char)
    val chars = counts
      .select(F.posexplode(F.split(F.col("w"), "")))
      .filter(F.length(F.col("col")) > 0)
      .select(F.when(F.col("pos") === 0, F.col("col"))
          .otherwise(F.concat(F.lit("##"), F.col("col"))).as("p"))
      .distinct().as[String].collect().toSet
    val n = counts.count()
    val table =
      if (n <= maxLocalWords) counts.as[(String, Long)].collect()
      else {
        org.slf4j.LoggerFactory.getLogger("graft.pipeline.WordPiece").warn(
          s"word table has $n distinct words; truncating to the $maxLocalWords most frequent for merge learning")
        counts.orderBy(F.col("c").desc, F.col("w"))
          .limit(maxLocalWords.toInt).as[(String, Long)].collect()
      }
    val marked = table.toSeq.map { case (w, c) =>
      (w.iterator.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else s"${Cont}$ch"
      }.toSeq, c)
    }
    val budget = math.max(0, vocabSize - chars.size)
    val merges = Vocab.localBpe(marked, budget)
    val merged = merges.map { case (l, r, _) => render(l + r) }
    Model(chars ++ merged, unk)
  }

  /** Render an internal symbol as a vocabulary piece: leading
    * sentinel -> "##" prefix, interior sentinels stripped. */
  private def render(sym: String): String = {
    val cont = sym.nonEmpty && sym.charAt(0) == Cont
    val bare = sym.filterNot(_ == Cont)
    if (cont) "##" + bare else bare
  }

  /** Map-only corpus tokenization: whitespace words through
    * [[segment]] with a broadcast model and a per-thread LRU memo.
    * NULL text -> NULL. */
  def tokenize(
      docs: DataFrame,
      textCol: String,
      model: Model,
      outCol: String = "tokens"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sep = java.util.regex.Pattern.compile("\\s+")
    val tokU = F.udf(new Function1[String, Array[String]] with Serializable {
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
              seg = segment(bc.value, w)
              m.put(w, seg)
            }
            seg
          }.toArray
        }
    })
    docs.withColumn(outCol, tokU(F.col(textCol)))
  }
}

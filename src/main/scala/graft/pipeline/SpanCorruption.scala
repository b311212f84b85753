package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/**
 * T5/UL2-style span-corruption objective prep — the denoising sibling
 * of the SFT-mask and FIM transforms: replace sampled token spans with
 * numbered sentinels in the input and emit the spans behind their
 * sentinels as the target, terminated by a closing sentinel.
 *
 *   tokens:  the quick brown fox jumps over the lazy dog
 *   input:   the quick <extra_id_0> jumps over <extra_id_1> dog
 *   target:  <extra_id_0> brown fox <extra_id_1> the lazy <extra_id_2>
 *
 * Determinism contract (the md5-sampling-rule sibling): every
 * quantity is EXACT integer math —
 *
 *   corrupted = n * rateNum / rateDen          (floor)
 *   spans     = max(1, corrupted / meanSpan)   (floor; 0 if corrupted=0)
 *   lengths   = corrupted / spans each, +1 for the first
 *               corrupted % spans spans
 *
 * and each span k lands inside its own contiguous segment
 * [k*n/spans, (k+1)*n/spans) at offset floor(u_k * (segLen - len_k + 1)),
 * where u_k is the replayable per-(doc, k) uniform draw
 * ([[UnigramLm.positionUniform]]'s rule). Segments keep spans disjoint
 * and ordered with NO clamping: len_k <= segLen_k holds for every rate
 * <= meanSpan/(meanSpan+1) — [[corrupt]] REQUIRES that bound. (Proof
 * sketch: for spans s >= 2, s = floor(c/m) gives c >= m*s, and
 * c <= n*m/(m+1) gives n >= c + c/m >= c + s, so floor(n/s) >=
 * floor(c/s) + 1 >= len_k; for s = 1, c <= n-1 < n. Above the bound a
 * remainder span can exceed its segment — e.g. n=11, rate 95/100,
 * meanSpan 3 — and would collide with its neighbor.)
 * Re-running the pipeline reproduces the corpus bit-for-bit from the
 * seed alone; `corrupted`/`spans` replay verbatim in any SQL engine.
 *
 * Scale shape: one map-only UDF kernel over the corpus (the
 * sftTextProfile discipline — no interpreted higher-order chains in
 * the hot path). NULL text -> NULL outputs.
 */
object SpanCorruption {

  def sentinel(k: Int): String = s"<extra_id_$k>"

  /** The deterministic corruption plan for one document: span
    * (start, length) pairs in token coordinates, ascending. */
  private[pipeline] def plan(
      n: Int,
      rateNum: Int,
      rateDen: Int,
      meanSpan: Int,
      seed: Long,
      id: Long): Array[(Int, Int)] = {
    val corrupted = (n.toLong * rateNum / rateDen).toInt
    if (corrupted <= 0) return Array.empty
    val spans = math.max(1, corrupted / meanSpan)
    val base = corrupted / spans
    val rem = corrupted % spans
    Array.tabulate(spans) { k =>
      val segStart = (k.toLong * n / spans).toInt
      val segEnd = ((k + 1).toLong * n / spans).toInt
      val len = base + (if (k < rem) 1 else 0)
      val room = segEnd - segStart - len + 1
      val off = math.floor(
        UnigramLm.positionUniform(seed, id, k) * room).toInt
      (segStart + math.min(off, room - 1), len)
    }
  }

  /**
   * Corrupt every document: returns `docs` plus
   * (input_tokens, target_tokens, n_tokens, n_corrupted, n_spans).
   * `rateNum/rateDen` is the corruption fraction as an exact rational
   * (15/100 = the T5 default), `meanSpan` the mean corrupted-span
   * length (T5 uses 3). A document too short to corrupt
   * (corrupted = 0) passes through whole with empty targets.
   */
  def corrupt(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rateNum: Int = 15,
      rateDen: Int = 100,
      meanSpan: Int = 3,
      seed: Long = 0L): DataFrame = {
    require(meanSpan >= 1, s"meanSpan must be >= 1, got $meanSpan")
    // rate <= meanSpan/(meanSpan+1) is the exact bound under which
    // every span provably fits its segment with no clamping (see the
    // object docs) — reject rather than silently misplace spans
    require(rateNum > 0 &&
        rateNum.toLong * (meanSpan + 1) <= rateDen.toLong * meanSpan,
      s"corruption rate must be in (0, meanSpan/(meanSpan+1)] = " +
        s"(0, $meanSpan/${meanSpan + 1}], got $rateNum/$rateDen")
    val sep = java.util.regex.Pattern.compile("\\s+")
    val u = F.udf((id: java.lang.Long, t: String) =>
      if (t == null || id == null) null
      else {
        val toks = sep.split(t).filter(_.nonEmpty)
        val spans = plan(toks.length, rateNum, rateDen, meanSpan,
          seed, id.longValue())
        val input = scala.collection.mutable.ArrayBuffer.empty[String]
        val target = scala.collection.mutable.ArrayBuffer.empty[String]
        var at = 0
        var k = 0
        while (k < spans.length) {
          val (s0, len) = spans(k)
          while (at < s0) { input += toks(at); at += 1 }
          input += sentinel(k)
          target += sentinel(k)
          var j = 0
          while (j < len) { target += toks(at); at += 1; j += 1 }
          k += 1
        }
        while (at < toks.length) { input += toks(at); at += 1 }
        if (spans.nonEmpty) target += sentinel(spans.length)
        (input.toArray, target.toArray,
          toks.length.toLong,
          spans.map(_._2.toLong).sum,
          spans.length.toLong)
      })
    docs
      .withColumn("__sc", u(F.col(idCol).cast("long"), F.col(textCol)))
      .withColumn("input_tokens", F.col("__sc._1"))
      .withColumn("target_tokens", F.col("__sc._2"))
      .withColumn("n_tokens", F.col("__sc._3"))
      .withColumn("n_corrupted", F.col("__sc._4"))
      .withColumn("n_spans", F.col("__sc._5"))
      .drop("__sc")
  }

  /** Inverse transform for verification: splice each sentinel's target
    * span back into the input. Returns the reconstructed token array
    * (drops the closing sentinel). */
  def reconstruct(input: Seq[String], target: Seq[String]): Seq[String] = {
    val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
    var cur: String = null
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = if (cur != null) { spans(cur) = buf.toSeq; buf.clear() }
    target.foreach { t =>
      if (t.startsWith("<extra_id_") && t.endsWith(">")) { flush(); cur = t }
      else buf += t
    }
    flush()
    input.flatMap { t =>
      if (t.startsWith("<extra_id_") && t.endsWith(">"))
        spans.getOrElse(t, Seq.empty)
      else Seq(t)
    }
  }
}

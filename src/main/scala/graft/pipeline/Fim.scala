package graft.pipeline

import org.apache.spark.sql.{Column, functions => F}

/**
 * Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022,
 * "Efficient Training of Language Models to Fill in the Middle") —
 * the code-corpus preparation step that rewrites a document into
 * sentinel-delimited prefix/suffix/middle blocks so an autoregressive
 * model learns infilling:
 *
 *   PSM: `<|fim_pre|>` prefix `<|fim_suf|>` suffix `<|fim_mid|>` middle
 *   SPM: `<|fim_suf|>` suffix `<|fim_pre|>` prefix `<|fim_mid|>` middle
 *
 * Split points are CALLER-SUPPLIED columns (derive them from id
 * arithmetic, a hash, or line boundaries) — keeping the randomness
 * source out of the operator is what makes the transform
 * deterministic, reproducible across runs/engines, and exactly
 * replayable by an oracle. Positions index CHARACTERS (code points,
 * Spark `substring` semantics), are 0-based, and clamp to
 * [0, length] with p1 <= p2, so any integer inputs are safe; a NULL
 * position (like NULL text) yields a NULL output — `least`/`greatest`
 * skip NULLs, so without the explicit guard a NULL p1 would silently
 * clamp to the text length instead.
 *
 * Everything is a per-row Column expression: map-only, no shuffle,
 * NULL text → NULL output per the repo's discipline.
 */
object Fim {

  val PrefixSentinel = "<|fim_pre|>"
  val SuffixSentinel = "<|fim_suf|>"
  val MiddleSentinel = "<|fim_mid|>"

  /** (pre, mid, suf) split of `text` at clamped code-point positions. */
  def fimParts(text: Column, p1: Column, p2: Column): Column = {
    val n = F.length(text)
    val a = F.greatest(F.lit(0), F.least(p1.cast("int"), n))
    val b = F.greatest(a, F.least(p2.cast("int"), n))
    F.when(text.isNull || p1.isNull || p2.isNull, F.lit(null).cast(
        "struct<pre:string,mid:string,suf:string>"))
      .otherwise(F.struct(
        text.substr(F.lit(1), a).as("pre"),
        text.substr(a + 1, b - a).as("mid"),
        text.substr(b + 1, n - b).as("suf")))
  }

  /** The sentinel-assembled FIM document (PSM by default, SPM with
    * `spm = true`). The model's training target is always
    * `...<|fim_mid|>middle`; prefix/suffix order is the PSM/SPM
    * choice. */
  def fimTransform(
      text: Column, p1: Column, p2: Column, spm: Boolean = false): Column = {
    val parts = graft.pipeline.Let.bind(fimParts(text, p1, p2)) { p =>
      val pre = F.concat(F.lit(PrefixSentinel), p.getField("pre"))
      val suf = F.concat(F.lit(SuffixSentinel), p.getField("suf"))
      val mid = F.concat(F.lit(MiddleSentinel), p.getField("mid"))
      if (spm) F.concat(suf, pre, mid) else F.concat(pre, suf, mid)
    }
    F.when(text.isNull, F.lit(null).cast("string")).otherwise(parts)
  }
}

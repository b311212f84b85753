package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * SFT / chat-format preparation: the conversation-shaped side of a
 * training-data pipeline. Conversations are modeled as
 * `array<struct<role string, content string>>` columns; everything
 * here is a pure per-row Column expression (transform / aggregate /
 * zip_with folds) — map-only, no shuffle, no UDF — so it rides
 * whatever partitioning the corpus already has and whole-stage
 * codegen keeps it in one pass.
 *
 * The template is deliberately minimal and deterministic:
 * `<|role|>\ncontent<|end|>\n` per turn — enough to pin exact
 * character arithmetic (loss-mask spans, lengths) across engines
 * without committing to any tokenizer's chat markup.
 */
object Sft {

  val RoleUser = "user"
  val RoleAssistant = "assistant"

  // evaluate-once binding for shared subtrees (see [[Let.bind]]) —
  // binding the token split cut the corpus bench ~3x here
  private def bind(c: Column)(f: Column => Column): Column = Let.bind(c)(f)

  /**
   * Deterministic conversation synthesis from flat text: whitespace
   * tokens chunked `tokensPerTurn` at a time, roles alternating
   * user/assistant from user. Yields an empty array for NULL/blank
   * text. This is the corpus-to-chat bridge for pipelines that need
   * conversation-shaped data from document-shaped sources (and the
   * fixture generator for the oracle, which replays the same
   * arithmetic in SQL).
   */
  def conversationsFromText(text: Column, tokensPerTurn: Int): Column = {
    require(tokensPerTurn > 0, s"tokensPerTurn must be positive, got $tokensPerTurn")
    val empty = F.array().cast("array<struct<role:string,content:string>>")
    F.when(text.isNull, empty).otherwise(
      bind(F.filter(F.split(text, "\\s+"), t => F.length(t) > 0)) { toks =>
        val nChunks = F.ceil(F.size(toks).cast("double") / tokensPerTurn).cast("int")
        F.when(nChunks <= 0, empty).otherwise(F.transform(
          F.sequence(F.lit(0), nChunks - 1),
          ci => F.struct(
            F.when(ci % 2 === 0, RoleUser).otherwise(RoleAssistant).as("role"),
            F.array_join(
              F.slice(toks, ci * tokensPerTurn + 1, F.lit(tokensPerTurn)), " ")
              .as("content"))))
      })
  }

  /**
   * Structural validation of a turns array: per-conversation booleans
   * for the invariants an SFT trainer assumes. `valid` is their
   * conjunction. NULL/empty arrays fail everything except
   * `roles_known`.
   */
  def validateTurns(turns: Column): Column = bind(
    F.transform(turns, t => t.getField("role"))) { roles =>
    val n = F.size(turns)
    // try_element_at: a bare element_at raises under ANSI on the empty
    // array even when the n > 0 guard is false (&& does not gate
    // subexpression evaluation)
    val startsUser = n > 0 && F.try_element_at(roles, F.lit(1)) === RoleUser
    val endsAssistant = n > 0 && F.try_element_at(roles, F.lit(-1)) === RoleAssistant
    val alternates = F.forall(
      F.zip_with(
        F.slice(roles, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(roles, F.lit(2), F.greatest(n - 1, F.lit(0))),
        (a, b) => a =!= b),
      x => x)
    val rolesKnown = F.forall(roles, r => r.isin(RoleUser, RoleAssistant))
    val noEmpty = n > 0 && F.forall(turns, t => F.length(t.getField("content")) > 0)
    F.struct(
      n.as("n_turns"),
      startsUser.as("starts_with_user"),
      endsAssistant.as("ends_with_assistant"),
      alternates.as("alternates"),
      rolesKnown.as("roles_known"),
      noEmpty.as("no_empty_content"),
      (startsUser && endsAssistant && alternates && rolesKnown && noEmpty)
        .as("valid"))
  }

  /** Render a turns array to the canonical template:
    * `<|role|>\ncontent<|end|>\n` per turn, concatenated. */
  def renderTemplate(turns: Column): Column =
    F.concat_ws("", F.transform(turns, t =>
      F.concat(F.lit("<|"), t.getField("role"), F.lit("|>\n"),
        t.getField("content"), F.lit("<|end|>\n"))))

  // per-turn rendered width: "<|" + role + "|>\n" (role+5 chars) +
  // content + "<|end|>\n" (8 chars)
  private def turnWidth(t: Column): Column =
    F.length(t.getField("role")) + 5 + F.length(t.getField("content")) + 8

  /**
   * Character spans (start inclusive, end exclusive, 0-based) of each
   * ASSISTANT turn's content inside [[renderTemplate]]'s output — the
   * loss mask an SFT trainer applies so only assistant tokens carry
   * gradient. Computed as a single left fold over the turns, tracking
   * the running character position; bit-exact integer arithmetic.
   */
  def assistantSpans(turns: Column): Column = {
    val folded = F.aggregate(
      turns,
      F.struct(
        F.lit(0L).as("pos"),
        F.array().cast("array<struct<s:bigint,e:bigint>>").as("spans")),
      (acc, t) => {
        val start = acc.getField("pos") + F.length(t.getField("role")) + 5
        val end = start + F.length(t.getField("content"))
        F.struct(
          (acc.getField("pos") + turnWidth(t)).cast("bigint").as("pos"),
          F.when(t.getField("role") === RoleAssistant,
              F.concat(acc.getField("spans"),
                F.array(F.struct(start.cast("bigint").as("s"),
                  end.cast("bigint").as("e")))))
            .otherwise(acc.getField("spans")).as("spans"))
      })
    folded.getField("spans")
  }

  /**
   * Loss-mask accounting over a turns array: rendered length, masked
   * (assistant-content) characters, span count — the numbers a
   * packing/budgeting stage needs. All exact integer sums.
   */
  def maskStats(turns: Column): Column =
    bind(assistantSpans(turns)) { spans =>
      F.struct(
        F.length(renderTemplate(turns)).cast("bigint").as("rendered_chars"),
        F.aggregate(spans, F.lit(0L),
          (acc, sp) => acc + (sp.getField("e") - sp.getField("s")))
          .as("masked_chars"),
        F.size(spans).as("n_spans"))
    }

  /**
   * Whitespace token count per turn — `array<int>` aligned with the
   * turns array; the unit a token-budget packer consumes.
   */
  def turnTokenCounts(turns: Column): Column =
    F.transform(turns, t =>
      F.size(F.filter(F.split(t.getField("content"), "\\s+"),
        x => F.length(x) > 0)))

  /** Everything [[validateTurns]] + [[maskStats]] + the span checksum
    * derive for a text-synthesized conversation, in one flat struct. */
  final case class SftProfile(
      n_turns: Int,
      starts_with_user: Boolean,
      ends_with_assistant: Boolean,
      alternates: Boolean,
      roles_known: Boolean,
      no_empty_content: Boolean,
      valid: Boolean,
      rendered_chars: Long,
      masked_chars: Long,
      n_spans: Int,
      span_sum: Long)

  /** The JVM kernel behind [[sftTextProfile]]: one pass over the
    * whitespace tokens, no intermediate turn structs. Exposed for the
    * equivalence spec against the Column-expression path. Character
    * counts are code points (Spark `length` semantics), not UTF-16
    * units. */
  private[pipeline] def profileText(text: String, tokensPerTurn: Int): SftProfile = {
    val toks =
      if (text == null) Array.empty[String]
      else text.split("\\s+").filter(_.nonEmpty)
    val n = (toks.length + tokensPerTurn - 1) / tokensPerTurn
    var pos = 0L
    var masked = 0L
    var nSpans = 0
    var spanSum = 0L
    var i = 0
    while (i < n) {
      val isUser = i % 2 == 0
      val roleLen = if (isUser) RoleUser.length else RoleAssistant.length
      val from = i * tokensPerTurn
      val until = math.min(from + tokensPerTurn, toks.length)
      var clen = (until - from - 1).toLong // joining spaces
      var j = from
      while (j < until) {
        clen += toks(j).codePointCount(0, toks(j).length)
        j += 1
      }
      if (!isUser) {
        val s = pos + roleLen + 5
        val e = s + clen
        masked += clen
        nSpans += 1
        spanSum += s + e
      }
      pos += roleLen + 5 + clen + 8
      i += 1
    }
    // synthesized turns start with user, alternate, use known roles,
    // and every chunk holds >= 1 non-empty token — identical to what
    // validateTurns reports on conversationsFromText's output
    SftProfile(
      n_turns = n,
      starts_with_user = n > 0,
      ends_with_assistant = n > 0 && n % 2 == 0,
      alternates = true,
      roles_known = true,
      no_empty_content = n > 0,
      valid = n > 0 && n % 2 == 0,
      rendered_chars = pos,
      masked_chars = masked,
      n_spans = nSpans,
      span_sum = spanSum)
  }

  /**
   * Fused text → SFT profile: exactly
   * [[conversationsFromText]] → [[validateTurns]] + [[maskStats]] +
   * the Σ(s+e) span checksum, computed in ONE codegen'd-UDF pass.
   *
   * The composable Column forms above run on Spark's INTERPRETED
   * higher-order functions (transform/aggregate have no codegen), so
   * a corpus-wide profile pays interpreter overhead per row even
   * though the pipeline is map-only; this kernel is the hot-path
   * form (~an order of magnitude cheaper per row). Semantics are
   * pinned identical to the expression path by SftSpec, and the
   * cross-engine oracle covers the fused form directly.
   */
  def sftTextProfile(text: Column, tokensPerTurn: Int): Column = {
    require(tokensPerTurn > 0, s"tokensPerTurn must be positive, got $tokensPerTurn")
    F.udf((t: String) => graft.pipeline.Sft.profileText(t, tokensPerTurn))
      .apply(text)
  }
}

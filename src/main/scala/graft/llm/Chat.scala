package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Instruction/SFT conversation operators: the validation and rendering
  * layer between raw multi-turn data and a chat-templated training set.
  * Every SFT pipeline runs exactly these checks before templating
  * (role-alternation, user-first/assistant-last framing, empty-turn
  * rejection) — a malformed conversation silently teaches the model the
  * wrong turn structure, so the verdicts must be exact, auditable
  * per-conversation columns rather than a lossy drop.
  *
  * Scale shape: one window + one aggregate, both keyed by conversation
  * id — partitions are conversation-sized (tens of turns), never
  * corpus-sized; rendering is an ordered in-group fold, not a global
  * sort. 100 TB of chat data shuffles once, as (conv, turn) rows.
  */
object Chat {

  /** Default chat template: each turn renders as `<|role|>content`.
    * Any (role, content) => piece Column function works — e.g. a
    * ChatML-style `<|im_start|>role\ncontent<|im_end|>` — and flows
    * through [[validateConversations]] / [[validatePreferencePairs]]
    * rendering unchanged (validation verdicts never depend on the
    * template; only `rendered`/`n_tok` do).
    */
  val DefaultTemplate: (Column, Column) => Column =
    (role, content) => concat(lit("<|"), role, lit("|>"), content)

  /** [[DefaultTemplate]]'s own delimiter strings — the default for the
    * collision guard below: content CONTAINING these renders
    * indistinguishably from a real turn boundary (`<|assistant|>` inside
    * a user turn forges an assistant turn in `rendered` — the classic
    * chat-template injection hazard). A custom template should pass its
    * own delimiters alongside.
    */
  val DefaultCollisionMarkers: Seq[String] = Seq("<|", "|>")

  /** True when any `collisionMarkers` element occurs in `content`
    * (NULL-safe: NULL content carries no markers).
    */
  private def collidesWith(content: Column, markers: Seq[String]): Column =
    if (markers.isEmpty) lit(false)
    else markers.map(m => coalesce(content.contains(lit(m)), lit(false)))
      .reduce(_ || _)

  /** Per-conversation validation + template rendering over a turns table
    * (convCol, idxCol: 0-based turn order, roleCol: 'user'/'assistant',
    * contentCol). Output one row per conversation:
    *
    *  - n_turns, starts_user, alternates (no adjacent same-role turns),
    *    has_empty (any whitespace-only content), ends_assistant,
    *  - valid = starts_user ∧ alternates ∧ ¬has_empty ∧ ends_assistant
    *    (the standard SFT framing contract),
    *  - has_template_collision: some turn's CONTENT contains a template
    *    delimiter (`collisionMarkers`, default [[DefaultCollisionMarkers]])
    *    — such content forges a turn boundary in `rendered`
    *    (chat-template injection); flagged as its own auditable boolean,
    *    NOT folded into `valid` (whether to drop or escape is a policy
    *    decision, the flag is the fact),
    *  - rendered: `template` pieces concatenated in turn order (the
    *    chat-template form token pricing runs on; default `<|role|>content`),
    *  - n_tok: token count of the rendered conversation under
    *    `countTokens` (default whitespace; pass `Bpe.countTokens(_)` to
    *    price in frozen-BPE subwords — the budget convention real
    *    pipelines need, cf. q157/q161/q162).
    */
  def validateConversations(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String,
      template: (Column, Column) => Column = DefaultTemplate,
      countTokens: Column => Column = TextAnalysis.tokenCountWs,
      collisionMarkers: Seq[String] = DefaultCollisionMarkers): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("idx"))
    val flagged = turns.select(
        col(convCol).as("conv_id"), col(idxCol).as("idx"),
        col(roleCol).as("role"), col(contentCol).as("content"))
      .withColumn("same_as_prev",
        coalesce(col("role") === lag(col("role"), 1).over(w), lit(false)))
    flagged.groupBy(col("conv_id")).agg(
        count(lit(1)).as("n_turns"),
        // coalesce to false: a 1-based-index conversation has no idx=0
        // row (the max() is NULL, not false), and NULL content poisons
        // the trim comparison — either way the verdict must stay a
        // definite boolean or the row drops out of BOTH filter(valid)
        // and filter(!valid), contradicting the auditable contract.
        // NULL content counts as an empty turn.
        coalesce(max(when(col("idx") === 0, col("role") === "user")),
          lit(false)).as("starts_user"),
        (!max(col("same_as_prev"))).as("alternates"),
        coalesce(max(coalesce(trim(col("content")) === "", lit(true))),
          lit(false)).as("has_empty"),
        coalesce(max(collidesWith(col("content"), collisionMarkers)),
          lit(false)).as("has_template_collision"),
        max(struct(col("idx"), col("role"))).getField("role").as("__last_role"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"),
            template(col("role"), col("content")).as("piece")))),
            x => x.getField("piece")), "").as("rendered"))
      .withColumn("ends_assistant",
        coalesce(col("__last_role") === "assistant", lit(false)))
      .withColumn("valid",
        col("starts_user") && col("alternates") && !col("has_empty") &&
          col("ends_assistant"))
      .withColumn("n_tok", countTokens(col("rendered")))
      .drop("__last_role")
  }

  /** Template-marker SANITIZER — the apply step behind
    * [[validateConversations]]' `has_template_collision` flag (q210
    * flags; this transforms): rewrite turn content so no marker can
    * forge a turn boundary in `rendered`, with auditable per-turn
    * counts. Compose AHEAD of render/validation.
    *
    * Policies:
    *  - `escape` (default, recommended): each marker occurrence keeps
    *    its characters with a `\` inserted before its last one
    *    (`<|` → `<\|`, `|>` → `|\>`) — content stays human-readable and
    *    the insertion can never assemble a NEW marker (no marker
    *    contains `\`), so one sequential pass is closed-form safe.
    *  - `drop`: marker occurrences are removed. One pass; a pathological
    *    nesting (`<<||>`) can reassemble a marker from the residue — a
    *    downstream [[validateConversations]] still flags such rows,
    *    which is why `escape` is the production default.
    *
    * Output: conv_id, idx, role, content (sanitized; NULL stays NULL),
    * n_markers (non-overlapping occurrences found in the ORIGINAL
    * content, summed over markers — the audit trail). Deterministic
    * string work, replayed exactly by the DuckDB oracle (q215).
    * Narrow per-row transform: no shuffle, whole-stage codegen.
    */
  def sanitizeTemplateMarkers(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String,
      policy: String = "escape",
      markers: Seq[String] = DefaultCollisionMarkers): DataFrame = {
    require(policy == "escape" || policy == "drop", s"unknown policy: $policy")
    require(markers.forall(_.nonEmpty), "markers must be non-empty strings")
    val c = col(contentCol)
    // non-overlapping occurrence count per marker, on the ORIGINAL text:
    // (len - len(without)) / len(marker) — the same arithmetic both
    // engines evaluate identically
    val nMarkers = markers.map { m =>
      (length(c) - length(replace(c, lit(m)))) / m.length
    }.reduce(_ + _)
    val sanitized = markers.foldLeft(c) { (acc, m) =>
      val to = if (policy == "escape") m.init + "\\" + m.last else ""
      replace(acc, lit(m), lit(to))
    }
    turns.select(
      col(convCol).as("conv_id"), col(idxCol).as("idx"),
      col(roleCol).as("role"),
      sanitized.as("content"),
      coalesce(nMarkers.cast("long"), lit(0L)).as("n_markers"))
  }

  /** Preference-pair (RLHF/DPO) validation over a turn-level table with a
    * `side` column ('chosen'/'rejected'). A DPO pair is two conversations
    * sharing every turn EXCEPT the final assistant completion; training on
    * a malformed pair (mismatched prompts, identical completions, a
    * missing side) silently corrupts the reward signal, so — like
    * [[validateConversations]] — every verdict is a definite, auditable
    * boolean (coalesced, never NULL). Output one row per pair:
    *
    *  - has_both: both sides present; has_unknown_side: a side value
    *    outside {chosen, rejected} appeared,
    *  - chosen_valid / rejected_valid: each side passes the q204 framing
    *    contract (user-first, alternating, non-empty, assistant-last),
    *  - prompts_match: the two sides' shared prefixes (all turns before
    *    the final one — idx, role AND content) are identical,
    *  - divergent: the final completions differ (trimmed) — an identical
    *    pair carries zero preference signal,
    *  - valid = has_both ∧ ¬has_unknown_side ∧ both sides valid ∧
    *    prompts_match ∧ divergent,
    *  - has_template_collision: any turn's content on EITHER side
    *    contains a template delimiter (see [[validateConversations]] —
    *    same injection hazard, same flag-not-verdict policy),
    *  - rendered_chosen / rendered_rejected: template renders (NULL for a
    *    missing side).
    *
    * Scale shape: one window + two grouped aggregates, keyed (pair, side)
    * then pair — partitions are conversation-sized, the prefix collapses
    * to an md5 fingerprint before the pair-level shuffle, so the second
    * exchange carries two fingerprint rows per pair, never turn text.
    */
  def validatePreferencePairs(turns: DataFrame, pairCol: String, sideCol: String,
      idxCol: String, roleCol: String, contentCol: String,
      template: (Column, Column) => Column = DefaultTemplate,
      collisionMarkers: Seq[String] = DefaultCollisionMarkers): DataFrame = {
    val wOrd = Window.partitionBy(col("pair_id"), col("side")).orderBy(col("idx"))
    val wAll = Window.partitionBy(col("pair_id"), col("side"))
    val t = turns.select(col(pairCol).as("pair_id"), col(sideCol).as("side"),
        col(idxCol).as("idx"), col(roleCol).as("role"), col(contentCol).as("content"))
      .withColumn("same_as_prev",
        coalesce(col("role") === lag(col("role"), 1).over(wOrd), lit(false)))
      .withColumn("max_idx", max(col("idx")).over(wAll))
    val perSide = t.groupBy(col("pair_id"), col("side")).agg(
        count(lit(1)).as("n_turns"),
        coalesce(max(when(col("idx") === 0, col("role") === "user")),
          lit(false)).as("starts_user"),
        (!max(col("same_as_prev"))).as("alternates"),
        coalesce(max(coalesce(trim(col("content")) === "", lit(true))),
          lit(false)).as("has_empty"),
        coalesce(max(collidesWith(col("content"), collisionMarkers)),
          lit(false)).as("side_collision"),
        max(struct(col("idx"), col("role"))).getField("role").as("__last_role"),
        // prefix fingerprint: idx + role + content of every turn BEFORE
        // the final completion, idx-ordered (collect_list drops the NULL
        // the when() leaves on the final turn); md5 bounds what the
        // pair-level shuffle carries
        md5(array_join(transform(array_sort(collect_list(
          when(col("idx") < col("max_idx"),
            struct(col("idx"), concat_ws("\u0001", col("idx").cast("string"),
              coalesce(col("role"), lit("")),
              coalesce(col("content"), lit(""))).as("piece"))))),
          x => x.getField("piece")), "\n").cast("binary")).as("prefix_fp"),
        max(struct(col("idx"), col("content"))).getField("content").as("last_content"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"),
            template(col("role"), col("content")).as("piece")))),
            x => x.getField("piece")), "").as("rendered"))
      .withColumn("ends_assistant",
        coalesce(col("__last_role") === "assistant", lit(false)))
      .withColumn("side_valid",
        col("starts_user") && col("alternates") && !col("has_empty") &&
          col("ends_assistant"))
    perSide.groupBy(col("pair_id")).agg(
        coalesce(max(when(col("side") === "chosen", lit(true))), lit(false))
          .as("has_chosen"),
        coalesce(max(when(col("side") === "rejected", lit(true))), lit(false))
          .as("has_rejected"),
        coalesce(max(when(!col("side").isin("chosen", "rejected"), lit(true))),
          lit(false)).as("has_unknown_side"),
        coalesce(max(col("side_collision")), lit(false))
          .as("has_template_collision"),
        coalesce(max(when(col("side") === "chosen", col("side_valid"))), lit(false))
          .as("chosen_valid"),
        coalesce(max(when(col("side") === "rejected", col("side_valid"))), lit(false))
          .as("rejected_valid"),
        max(when(col("side") === "chosen", col("prefix_fp"))).as("__cfp"),
        max(when(col("side") === "rejected", col("prefix_fp"))).as("__rfp"),
        max(when(col("side") === "chosen", col("last_content"))).as("__cl"),
        max(when(col("side") === "rejected", col("last_content"))).as("__rl"),
        max(when(col("side") === "chosen", col("rendered"))).as("rendered_chosen"),
        max(when(col("side") === "rejected", col("rendered"))).as("rendered_rejected"))
      .withColumn("has_both", col("has_chosen") && col("has_rejected"))
      .withColumn("prompts_match", coalesce(col("__cfp") === col("__rfp"), lit(false)))
      .withColumn("divergent",
        coalesce(trim(col("__cl")) =!= trim(col("__rl")), lit(false)))
      .withColumn("valid",
        col("has_both") && !col("has_unknown_side") && col("chosen_valid") &&
          col("rejected_valid") && col("prompts_match") && col("divergent"))
      .drop("__cfp", "__rfp", "__cl", "__rl")
  }

  /** Context-window trim: fit each conversation into `maxTokens` by
    * keeping the longest SUFFIX of whole turns whose token sum fits —
    * the standard SFT trim (recent turns carry the training signal; a
    * turn is never split mid-content). Every input row comes back with
    * a definite `kept` boolean (auditable, never a silent drop): a turn
    * survives iff its reverse-cumulative token count (itself + every
    * later turn) is within budget, so a single turn larger than the
    * budget drops entirely. NULL content counts zero tokens (the q204
    * NULL-verdict lesson — a NULL must not poison the running sum and
    * void every earlier turn's verdict).
    *
    * `countTokens` plugs the pricing convention (the
    * `Chunking.chunkByTokens` pattern): whitespace by default, pass
    * `Bpe.countTokens(_)` to price the budget in REAL subword tokens — a
    * ws-token trim misfits an actual model context by the corpus's
    * fertility factor (the q197 number), so production budgets should
    * use the BPE form (q209 gates it).
    *
    * Output: conv_id, idx, role, content, n_tok, kept.
    *
    * Scale shape: one conversation-keyed window (partitions are tens of
    * turns) — 100 TB of chat data shuffles once as (conv, turn) rows,
    * same as [[validateConversations]].
    */
  def fitToTokenBudget(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String, maxTokens: Long,
      countTokens: Column => Column = TextAnalysis.tokenCountWs): DataFrame = {
    require(maxTokens >= 0, s"maxTokens must be non-negative: $maxTokens")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns.select(col(convCol).as("conv_id"), col(idxCol).as("idx"),
        col(roleCol).as("role"), col(contentCol).as("content"))
      .withColumn("n_tok",
        coalesce(countTokens(col("content")), lit(0L)))
      .withColumn("kept", sum(col("n_tok")).over(w) <= maxTokens)
  }

  /** Loss-mask token accounting — the budget arithmetic behind SFT loss
    * masking (train on assistant turns, mask user/prompt turns): per
    * conversation, total content tokens, trainable (assistant) tokens,
    * the trainable fraction (NULL when the conversation has no content
    * tokens at all), and the assistant turn count. A pipeline uses this
    * to price an SFT mixture in TRAINABLE tokens rather than raw tokens
    * — a long-prompt corpus can be 10× its useful size. One grouped
    * aggregate over (conv, turn) rows; map-side partial sums.
    * `countTokens` plugs the pricing convention as in
    * [[fitToTokenBudget]] (ws default, `Bpe.countTokens(_)` for real
    * subword pricing).
    */
  def lossMaskCounts(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String,
      countTokens: Column => Column = TextAnalysis.tokenCountWs): DataFrame = {
    val tok = coalesce(countTokens(col(contentCol)), lit(0L))
    turns.groupBy(col(convCol).as("conv_id"))
      .agg(
        sum(tok).as("n_tok_total"),
        sum(when(col(roleCol) === "assistant", tok).otherwise(lit(0L)))
          .as("n_tok_trainable"),
        sum(when(col(roleCol) === "assistant", 1L).otherwise(0L))
          .as("n_assistant_turns"))
      .withColumn("trainable_frac",
        when(col("n_tok_total") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_tok_trainable").cast("double") /
            col("n_tok_total"), 6)))
  }
}

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

  /** Per-conversation validation + template rendering over a turns table
    * (convCol, idxCol: 0-based turn order, roleCol: 'user'/'assistant',
    * contentCol). Output one row per conversation:
    *
    *  - n_turns, starts_user, alternates (no adjacent same-role turns),
    *    has_empty (any whitespace-only content), ends_assistant,
    *  - valid = starts_user ∧ alternates ∧ ¬has_empty ∧ ends_assistant
    *    (the standard SFT framing contract),
    *  - rendered: `<|role|>content` pieces concatenated in turn order
    *    (the chat-template form token pricing runs on),
    *  - n_tok: whitespace token count of the rendered conversation.
    */
  def validateConversations(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String): DataFrame = {
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
        max(struct(col("idx"), col("role"))).getField("role").as("__last_role"),
        array_join(
          transform(array_sort(collect_list(struct(col("idx"),
            concat(lit("<|"), col("role"), lit("|>"), col("content")).as("piece")))),
            x => x.getField("piece")), "").as("rendered"))
      .withColumn("ends_assistant",
        coalesce(col("__last_role") === "assistant", lit(false)))
      .withColumn("valid",
        col("starts_user") && col("alternates") && !col("has_empty") &&
          col("ends_assistant"))
      .withColumn("n_tok", TextAnalysis.tokenCountWs(col("rendered")))
      .drop("__last_role")
  }

  /** Loss-mask token accounting — the budget arithmetic behind SFT loss
    * masking (train on assistant turns, mask user/prompt turns): per
    * conversation, total content tokens, trainable (assistant) tokens,
    * the trainable fraction (NULL when the conversation has no content
    * tokens at all), and the assistant turn count. A pipeline uses this
    * to price an SFT mixture in TRAINABLE tokens rather than raw tokens
    * — a long-prompt corpus can be 10× its useful size. One grouped
    * aggregate over (conv, turn) rows; map-side partial sums.
    */
  def lossMaskCounts(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String): DataFrame = {
    val tok = TextAnalysis.tokenCountWs(col(contentCol))
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

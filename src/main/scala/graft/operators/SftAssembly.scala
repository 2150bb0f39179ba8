package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT (supervised fine-tuning) sample assembly — the last mile of a
  * training-data pipeline: turn interaction logs into chat-templated
  * training text plus the LOSS-MASK character spans that tell the
  * trainer which characters are supervised (assistant content) and
  * which are context (system/user turns, template tokens).
  *
  * Template (fixed, documented): a conversation is
  * `<|system|>conversation <id>\n` followed by one
  * `<|role|>content\n` block per turn; roles alternate user/assistant
  * by turn parity; content is the deterministic rendering
  * `event_type k=<k> v=<cents>` with `cents = floor(value·100)`
  * (explicit floor — BIGINT casts round in some engines and truncate
  * in others, so the cast is never left implicit). The loss span of a
  * turn covers the CONTENT only — template tokens and the trailing
  * newline are context, the convention of span-masked SFT trainers.
  *
  * All offsets are 0-based character offsets into the final
  * conversation string, published as exact integers: a consumer can
  * slice `text.substring(start_off, end_off)` and get precisely the
  * supervised characters.
  *
  * Distribution shape (the 100 TB contract): turn numbering and the
  * prefix-sum of rendered lengths are two window functions over the
  * SAME `(user_id)` partitioning — one hash exchange total; the
  * conversation-level render is a groupBy on that same key (no second
  * shuffle under co-partitioning). Nothing is corpus-wide: state is
  * conversation-sized, and real pipelines bound conversation length
  * upstream (sessionization), which this operator inherits.
  *
  * Reference scope: the reference's only per-entity sequencing is the
  * per-key traffic aggregation over its event stream
  * (/root/reference/src/main/java/org/test/pcap4j/MainApp.java:51-55);
  * chat assembly is that same per-key ordered surface rendered into
  * training text.
  */
object SftAssembly {

  private val SysTag = "<|system|>"

  /** The deterministic turn/candidate content rendering
    * (`event_type k=<k> v=<cents>`, explicit floor) — shared by both
    * SFT surfaces here, the DPO pair assembly
    * ([[Preference.dpoPairs]]) and its streamed twin
    * ([[graft.streaming.StreamingPreference.dpoPairsStream]]), so pair
    * texts and conversation texts render candidate payloads
    * identically. */
  private[graft] def contentExpr: org.apache.spark.sql.Column =
    concat(col("event_type"), lit(" k="),
      get_json_object(col("props"), "$.k"),
      lit(" v="), floor(col("value") * 100).cast("long"))

  /** Per-turn rendering with loss-span offsets:
    * `(conv_id, turn_idx, role, content, start_off, end_off)` where
    * `[start_off, end_off)` bounds the turn's CONTENT inside the
    * assembled conversation string of [[renderConversations]]. */
  def renderTurns(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val turns = events
      .withColumn("turn_idx",
        row_number().over(w).cast("long"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("content", contentExpr)
      .withColumn("rendered",
        concat(lit("<|"), col("role"), lit("|>"), col("content"),
          lit("\n")))
    val preambleLen = length(concat(lit(SysTag), lit("conversation "),
      col("user_id").cast("string"), lit("\n")))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("prev_len",
        coalesce(sum(length(col("rendered"))).over(cum), lit(0L)))
      .select(col("user_id").as("conv_id"), col("turn_idx"), col("role"),
        col("content"),
        (preambleLen + col("prev_len") + length(col("role")) + lit(4L))
          .cast("long").as("start_off"),
        (preambleLen + col("prev_len") + length(col("role")) + lit(4L) +
          length(col("content"))).cast("long").as("end_off"))
  }

  /** Assembled conversations:
    * `(conv_id, n_turns, n_mask_chars, text)` — `text` is the full
    * chat-templated string, `n_mask_chars` the total supervised
    * (assistant-content) character count, consistent with the spans
    * from [[renderTurns]] by construction. */
  def renderConversations(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("turn_idx", row_number().over(w).cast("long"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("content", contentExpr)
      .withColumn("rendered",
        concat(lit("<|"), col("role"), lit("|>"), col("content"),
          lit("\n")))
      .groupBy(col("user_id").as("conv_id"))
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        sum(when(col("role") === "assistant", length(col("content"))
          .cast("long")).otherwise(lit(0L))).cast("long")
          .as("n_mask_chars"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("turn_idx"),
            col("rendered")))),
          x => x.getField("rendered"))).as("body"))
      .select(col("conv_id"), col("n_turns"), col("n_mask_chars"),
        concat(lit(SysTag), lit("conversation "),
          col("conv_id").cast("string"), lit("\n"), col("body"))
          .as("text"))
  }
}

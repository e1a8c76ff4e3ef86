"""Conversation / instruction-data operators.

Post-training corpora are conversations, not documents: ordered
(role, content) turns that must be rendered through a chat template
into one training string, with per-role token budgets checked along
the way. This module pins that stage Spark-side:

* `synthesize_conversations` — the deterministic documents→turns
  adapter the declared queries run on (the testdata ships no
  conversation table; same posture as multimodal.attach_media).
* `flatten_conversations` — template rendering + per-role stats as ONE
  aggregation: turns sort inside `sort_array(collect_list(struct))`
  (engine-portable ordering, no window), the rendered string is a
  codegen concat, and the only shuffle is the groupBy on conv_id. At
  100 TB the exchange carries (conv_id, turn) rows once — the same
  shape SFT data prep runs before packing.

Everything is built-ins end to end (zero Python), so the whole surface
is SQL-expressible and hash-verified against a DuckDB twin
(q_chat_flatten).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURNS_PER_CONV = 4
PREVIEW_CHARS = 80


def synthesize_conversations(documents: DataFrame) -> DataFrame:
    """documents → (conv_id, turn_no, role, content): consecutive
    doc_ids group into conversations of ≤TURNS_PER_CONV turns,
    alternating user/assistant (doc_id parity), content truncated to
    PREVIEW_CHARS. Pure projection — deterministic, SQL-twinnable."""
    return documents.select(
        (F.col("doc_id") / TURNS_PER_CONV).cast("long").alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_no"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, PREVIEW_CHARS).alias("content"),
    )


def flatten_conversations(turns: DataFrame) -> DataFrame:
    """Render each conversation through a minimal chat template
    (`<|role|>content` per turn, in turn order) and compute the
    per-role stats an SFT pipeline filters on: turn counts, per-role
    char budgets, and whether the conversation alternates roles
    strictly (non-alternating = a malformed sample to drop).

    One groupBy(conv_id); ordering comes from sort_array over
    (turn_no, rendered) structs — no window, no second shuffle."""
    rendered = F.concat(F.lit("<|"), F.col("role"), F.lit("|>"),
                        F.col("content"))
    is_user = (F.col("role") == "user").cast("long")
    per_turn = turns.select(
        "conv_id", "turn_no", "role", "content",
        rendered.alias("rendered"),
        is_user.alias("is_user"),
        F.length("content").alias("n_content"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("is_user").alias("n_user_turns"),
        (F.count(F.lit(1)) - F.sum("is_user")).cast("long")
        .alias("n_assistant_turns"),
        F.sum(F.when(F.col("is_user") == 1, F.col("n_content"))
              .otherwise(F.lit(0))).cast("long").alias("user_chars"),
        F.sum(F.when(F.col("is_user") == 0, F.col("n_content"))
              .otherwise(F.lit(0))).cast("long").alias("assistant_chars"),
        F.concat_ws(
            "", F.transform(
                F.sort_array(F.collect_list(
                    F.struct(F.col("turn_no"), F.col("rendered")))),
                lambda s: s["rendered"])).alias("chat_text"),
        F.transform(
            F.sort_array(F.collect_list(
                F.struct(F.col("turn_no"), F.col("is_user")))),
            lambda s: s["is_user"]).alias("__roles"),
    )
    # strict alternation: every adjacent pair of turn parities differs —
    # zip the sorted role sequence against its own tail (zip_with pads
    # the tail with NULL at the end: that final lonely pair, and a
    # 1-turn conversation, count as alternating). The tail length is
    # size(__roles), NEVER Integer.MAX_VALUE: slice's start+length
    # arithmetic overflows int at 2+2147483647 and silently yields an
    # empty tail (everything "alternates").
    alternates = F.expr(
        "CAST(aggregate(zip_with(__roles, "
        "slice(__roles, 2, size(__roles)), "
        "(a, b) -> CASE WHEN b IS NULL THEN 1 ELSE CAST(a != b AS INT) "
        "END), 1, (acc, x) -> acc * x) AS BOOLEAN)"
    ).alias("alternates")
    return agg.select(
        "conv_id", "n_turns", "n_user_turns", "n_assistant_turns",
        "user_chars", "assistant_chars", "chat_text", alternates)

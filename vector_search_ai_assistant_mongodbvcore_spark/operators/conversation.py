"""Conversation-history assembly: running-token-sum window trim.

Reference: ChatService.GetConversationHistory
(/root/reference/Search/Services/ChatService.cs:248-271):

    messages ordered most-recent-first (:259)
    TakeWhile(m => (tokensUsed += m.Tokens) <= _maxConversationTokens) (:260)
    reverse back to chronological (:264)
    join with "\n" (:267)

Boundary semantics preserved exactly: the running sum is incremented BEFORE
the comparison, so a message is kept iff the cumulative token count
*including itself* is within the cap — and TakeWhile stops at the FIRST
violation, so a later small message cannot re-enter the window.

Spark-first: a rows-unbounded-preceding window per session, newest-first.
`sum(tokens) OVER (PARTITION BY session ORDER BY ts DESC ROWS UNBOUNDED
PRECEDING..CURRENT)` gives exactly the take-while running sum; the
"stops at first violation" contract needs min(violating rank), implemented
with a second windowed aggregate instead of a correlated subquery — still one
shuffle on session_id, no driver loop, scales to any number of sessions at
once (the reference processes ONE session per call; this processes all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_CONVERSATION_TOKENS = 1000  # Search/appsettings.json:15


def conversation_window(
    messages: DataFrame,
    max_tokens: int = DEFAULT_MAX_CONVERSATION_TOKENS,
    session_col: str = "session_id",
    time_col: str = "ts",
    tokens_col: str = "tokens",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session trim to the most recent messages whose running token sum
    (newest-first, inclusive) stays within `max_tokens`, stopping at the
    first message that crosses the cap. Output rows come back in
    chronological order per session (W3)."""
    order = [F.desc(time_col)]
    if tiebreak_col:
        order.append(F.desc(tiebreak_col))
    w = (
        Window.partitionBy(session_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sum = messages.withColumn("_running", F.sum(F.col(tokens_col)).over(w)).withColumn(
        "_rn", F.row_number().over(Window.partitionBy(session_col).orderBy(*order))
    )
    # TakeWhile: keep rows strictly before the first violating row.
    wall = Window.partitionBy(session_col)
    with_cut = with_sum.withColumn(
        "_first_bad",
        F.min(F.when(F.col("_running") > max_tokens, F.col("_rn"))).over(wall),
    )
    kept = with_cut.filter(F.col("_rn") < F.coalesce(F.col("_first_bad"), F.lit(2**31 - 1)))
    # W3 needs CHRONOLOGICAL-PER-SESSION order, not a global order: the
    # window already hash-partitioned by session, so an intra-partition sort
    # delivers it with no extra exchange — a global orderBy would add a
    # range-partitioning shuffle + full sort at 100 TB for nothing.
    return kept.drop("_running", "_rn", "_first_bad").sortWithinPartitions(
        session_col, time_col
    )


def conversation_text(
    messages: DataFrame,
    max_tokens: int = DEFAULT_MAX_CONVERSATION_TOKENS,
    session_col: str = "session_id",
    time_col: str = "ts",
    tokens_col: str = "tokens",
    text_col: str = "text",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """A2: one row per session with the trimmed conversation newline-joined
    in chronological order (ChatService.cs:267). collect_list has no
    cross-partition order, so the collected structs are sorted by
    (time, tiebreak) before joining."""
    trimmed = conversation_window(
        messages, max_tokens, session_col, time_col, tokens_col, tiebreak_col
    )
    order_cols = [time_col] + ([tiebreak_col] if tiebreak_col else []) + [text_col]
    return (
        trimmed.groupBy(session_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(*order_cols))),
                    lambda s: s[text_col],
                ),
                "\n",
            ).alias("conversation")
        )
    )

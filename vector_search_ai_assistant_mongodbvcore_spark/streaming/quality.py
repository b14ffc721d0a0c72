"""Streaming corpus quality gating: the batch pipeline's quality stage
applied to an unbounded document stream.

prepare_training_corpus's quality gates are pure column expressions —
the Gopher rule battery (functions/text.gopher_quality_flags), the
learned-classifier floor (weights inlined as literals), and PII
scrubbing are all stateless projections/filters — so the exact same
semantics run under Structured Streaming with NO state store, NO
watermark, and NO output-mode constraints: each micro-batch is gated
independently and identically to the batch form (parity pinned in
tests/test_streaming_quality.py).

Composes with the rest of the streaming tier: gate first, then
streaming exact dedup (streaming/dedup.py — the only stateful hygiene
step) and index maintenance (streaming/incremental.py) downstream, so
junk never enters the dedup state store or the serving indexes.

What deliberately does NOT stream: corpus-relative signals (DSIR
weights, near-dup pairs, mixture planning) need corpus-wide statistics
— for those, fit on the accumulated batch corpus and re-apply; the
fitted forms (classifier weights, DSIR lambda) are literals and DO
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX

__all__ = ["gopher_keep", "gate_stream"]

_GOPHER_RULES = (
    "too_few_words", "too_many_words", "bad_mean_word_len",
    "low_alpha_words", "mostly_bullets", "mostly_ellipsis", "repetitive",
)


def gopher_keep(text_col) -> "F.Column":
    """Boolean keep predicate: NO Gopher rule fires. The single-expression
    form of prepare_training_corpus's use_gopher_rules stage, shared by
    the batch and streaming gates."""
    flags = TX.gopher_quality_flags(F.col(text_col) if isinstance(text_col, str) else text_col)
    violated = None
    for nm in _GOPHER_RULES:
        f = flags.getField(nm)
        violated = f if violated is None else (violated | f)
    return ~violated


def gate_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_gopher_rules: bool = True,
    min_quality: float | None = None,
    quality_model: dict | None = None,
    min_classifier_prob: float = 0.5,
    blocklist: "list[str] | None" = None,
    blocklist_max_hits: int = 0,
    scrub: bool = True,
    max_repeated_word_frac: float | None = None,
    max_dup_line_frac: float | None = None,
) -> DataFrame:
    """Gate a (streaming or batch) document frame with the stateless
    quality battery; returns the same frame filtered and (optionally)
    PII-scrubbed. Accepts a readStream frame unchanged — every predicate
    is a projection, so the plan stays append-mode-safe. `blocklist`
    adds the C4-style badwords screen (word-boundary, case-insensitive),
    stateless like the rest. `max_repeated_word_frac`/`max_dup_line_frac`
    complete the batch pipeline's NON-Gopher heuristic trio
    (prepare_training_corpus's quality stage when use_gopher_rules=False
    is quality floor + repetition ceilings — a stream gating on
    min_quality alone would pass docs batch rejects)."""
    out = docs
    if use_gopher_rules:
        out = out.filter(gopher_keep(text_col))
    if min_quality is not None:
        out = out.filter(TX.quality_score(F.col(text_col)) >= min_quality)
    if max_repeated_word_frac is not None:
        out = out.filter(
            TX.repeated_word_fraction(F.col(text_col)) <= max_repeated_word_frac
        )
    if max_dup_line_frac is not None:
        out = out.filter(
            TX.duplicate_line_fraction(F.col(text_col)) <= max_dup_line_frac
        )
    if blocklist is not None:
        out = out.filter(
            TX.blocklist_keep(F.col(text_col), blocklist, blocklist_max_hits)
        )
    if quality_model is not None:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.quality_classifier import (
            quality_prob_col,
        )

        out = out.filter(quality_prob_col(quality_model, text_col) >= min_classifier_prob)
    if scrub:
        out = out.withColumn(text_col, TX.scrub_pii(F.col(text_col)))
    return out

"""RAG document chunking: overlapping token-window chunks as pure column
expressions.

The reference ingests whole documents and embeds them 1:1
(Vectorize/IngestAndVectorize.cs: each item serialized and embedded as one
vector). Production RAG
pipelines chunk long documents into overlapping windows BEFORE embedding so
retrieval granularity matches context budgets; this operator supplies that
stage Spark-first:

  words  = whitespace-split(trim(text))          n = len(words)
  starts = 0, stride, 2*stride, ... < n          stride = size - overlap
  chunk  i covers words[start+1 .. start+size]   (1-based slice, truncated
                                                  at the tail)

Entirely narrow operations — split/sequence/explode/slice/array_join, no
shuffle, no UDF: the plan is scan -> generate -> project, which scales
linearly and partition-locally at any corpus size. Chunk counts per doc are
ceil(n/stride), so output row count is bounded by tokens/stride — the
explode cannot amplify beyond the token count.

Every expression has an exact DuckDB twin (chunking_sql) for the oracle
gate: same split regex, same 1-based inclusive slicing, same integer
start/stride arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The engine tokenizer's fallback splitter (functions/tokenizer.py _TOKEN_RE)
# expressed for Spark's Java regex engine: words / digit runs / punctuation
# runs each with an optional single leading whitespace char, plus bare
# whitespace runs. The alternation PARTITIONS any string, so concatenating
# the tokens of a document reconstructs it byte-for-byte — the property the
# unit="token" round-trip contract rests on.
TOKEN_SPLIT_RE = r"\s?[A-Za-z]+|\s?\d+|\s?[^\sA-Za-z\d]+|\s+"


def chunk_documents(
    docs: DataFrame,
    size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...] | list[str]" = (),
    unit: str = "word",
) -> DataFrame:
    """(id, *carry_cols, chunk_id, n_tokens, chunk_text): overlapping token
    windows.

    size = tokens per chunk, overlap = tokens shared with the previous
    chunk; stride = size - overlap must be positive. Documents that are
    empty after trim() produce no chunks; the final chunk may be shorter
    than `size` (never empty).

    unit='word' (default): tokens are whitespace-split words joined back
    with single spaces — the ANSI-expressible form with an exact DuckDB twin
    (chunking_sql).

    unit='token': tokens come from the engine tokenizer's splitter
    (functions/tokenizer.py F6) expressed as a JVM-side regexp_extract_all —
    the same token currency the prompt-budget operators count, so chunk
    budgets and completion budgets measure the same thing. Tokens keep their
    leading whitespace, chunks join with '' — concatenating chunk i with
    chunk i+1 minus its `overlap` leading tokens reconstructs the document
    exactly (round-trip contract, tested). With tiktoken installed the
    count_tokens UDF counts real cl100k ids; this splitter is the
    deterministic env-independent fallback both sides share in this
    container.

    `carry_cols` are per-document columns (split labels, source tags)
    carried through the explode onto every chunk — a narrow projection, so
    downstream consumers never pay a join back to the document table to
    recover them (the join would shuffle the LARGEST table in the pipeline
    on id; at 100 TB that is the difference between a zero-exchange stage
    and the dominant shuffle).

    Both units are entirely narrow plans — split/sequence/explode/slice, no
    shuffle, no Python UDF."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    if unit not in ("word", "token"):
        raise ValueError(f"unit must be word|token, got {unit!r}")
    carry = [c for c in carry_cols if c != id_col]
    stride = size - overlap
    if unit == "word":
        w = F.split(F.trim(F.col(text_col)), r"\s+")
        joiner = " "
    else:
        w = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_SPLIT_RE), F.lit(0))
        joiner = ""
    nonempty = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), *[F.col(c) for c in carry], w.alias("_w")
    )
    starts = F.sequence(F.lit(0), F.size("_w") - 1, F.lit(stride))
    chunks = nonempty.select(
        id_col, *carry, "_w", F.explode(starts).alias("_start")
    )
    piece = F.slice(F.col("_w"), F.col("_start") + 1, size)
    return chunks.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.floor(F.col("_start") / stride).cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, joiner).alias("chunk_text"),
    )


def chunking_sql(
    size: int = 32,
    overlap: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of chunk_documents (same arithmetic, same
    truncating 1-based inclusive slice)."""
    stride = size - overlap
    return f"""
    WITH words AS (
      SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS w
      FROM {table} WHERE trim({text_col}) <> ''
    ),
    st AS (
      SELECT {id_col}, w, unnest(range(0, len(w), {stride})) AS start
      FROM words
    )
    SELECT {id_col},
           start // {stride} AS chunk_id,
           len(w[start + 1 : start + {size}]) AS n_tokens,
           array_to_string(w[start + 1 : start + {size}], ' ') AS chunk_text
    FROM st
    """

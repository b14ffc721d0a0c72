"""Sequence packing: lay a corpus out into fixed-length training sequences.

Not in the reference (it serves retrieval, not training); part of the
extended LLM-training-pipeline surface. Two standard policies:

  pack_sequences         GPT-style "concat then chop": the token streams of
                         all documents are concatenated in deterministic id
                         order and cut into consecutive blocks of exactly
                         seq_len tokens; a document may straddle a block
                         boundary (each straddle emits one row per block the
                         doc touches, with within-doc offsets so a loader
                         can slice text/token arrays locally).
  pack_sequences_greedy  boundary-respecting greedy: documents are never
                         split; walk docs in id order and open a new bin
                         whenever the next doc would overflow seq_len. Docs
                         longer than seq_len get a bin of their own, flagged
                         `overflow`.

Scale design — the global prefix sum is the whole problem. A naive
`sum() OVER (ORDER BY id)` moves the corpus to ONE partition (Spark warns
"No Partition Defined"); at 100 TB that is a non-starter. Instead the
classic two-level scan:

  1. group documents by a deterministic id-range key g = floor(id / G)
     (G docs per group; groups are thousands of docs, so the groups table
     is ~corpus/G rows — tiny);
  2. local prefix sums inside each group — ONE hash shuffle on g, and the
     per-group totals aggregate reuses that same partitioning (no second
     Exchange, asserted in tests);
  3. a prefix sum OVER the per-group totals — a single-partition window
     over the TINY totals frame (bounded by n_groups, not corpus size);
  4. broadcast-join the group offsets back.

So the corpus-sized data crosses the wire exactly once, keyed on g, with
no global sort anywhere. The same decomposition is how MPI/beam implement
distributed scan.

The id order is the packing order; any desired curriculum/shuffle order is
imposed by materializing a surrogate id first (e.g. md5-bucketed — see
operators/splits.py for the portable hash trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_starts(
    d: DataFrame,
    id_col: str,
    n_col: str,
    group_size: int,
    key_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Add `_start`: exclusive prefix sum of n_col in id_col order —
    global, or per key group when `key_cols` is set (r15: one pass packs
    EVERY split instead of one plan branch per split).

    Two-level distributed scan (see module docstring). Requires numeric,
    unique ids (per key group); ties are impossible by uniqueness, so the
    result is total and deterministic."""
    keys = list(key_cols)
    g = (F.floor(F.col(id_col) / group_size)).alias("_g")
    d = d.withColumn("_g", g)
    local = Window.partitionBy(*keys, "_g").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = d.withColumn("_local", F.coalesce(F.sum(n_col).over(local), F.lit(0)))
    totals = d.groupBy(*keys, "_g").agg(F.sum(n_col).alias("_tot"))
    # prefix over the tiny per-group totals frame: one partition holds only
    # n_groups rows per key (the constant key keeps the partition spec
    # explicit in the unkeyed case)
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import bounded_window_key

    part = keys if keys else [bounded_window_key("_g")]
    off = Window.partitionBy(*part).orderBy("_g").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        *keys, "_g", F.coalesce(F.sum("_tot").over(off), F.lit(0)).alias("_off")
    )
    return (
        d.join(F.broadcast(offsets), [*keys, "_g"])
        .withColumn("_start", (F.col("_off") + F.col("_local")).cast("long"))
        .drop("_g", "_local", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_size: int = 4096,
    carry_cols: "tuple[str, ...] | list[str]" = (),
    key_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """(seq_id, id_col, begin, n_toks, *carry_cols): concat-and-chop packing.

    Every output sequence 0..ceil(total_tokens/seq_len)-1 is exactly
    seq_len tokens (the last may be short). `begin` is the 0-based offset
    WITHIN the document where this sequence's slice of it starts; `n_toks`
    is the slice length — so `sum(n_toks) GROUP BY doc` reproduces the doc
    lengths and `sum(n_toks) GROUP BY seq` is seq_len everywhere but the
    tail (both asserted in tests). Zero-token docs are excluded.

    `carry_cols` are per-document payload columns (e.g. the token-id array
    the export step slices) passed through to every piece a document emits
    — the same narrow-passthrough trick as chunking's carry_cols, avoiding
    a corpus-sized rejoin downstream. A straddling doc duplicates its
    payload once per touched block (almost always 1-2 blocks).

    The explode emits one row per (doc, touched block): row count is
    n_docs + total_tokens/seq_len in the worst case — linear, never
    quadratic."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    carry = [c for c in carry_cols if c != id_col]
    keys = [c for c in key_cols if c != id_col]
    d = docs.select(
        *keys, id_col, F.col(n_tokens_col).cast("long").alias("_n"), *carry
    ).filter(F.col("_n") > 0)
    d = _global_starts(d, id_col, "_n", group_size, key_cols=tuple(keys))
    first = F.floor(F.col("_start") / seq_len)
    last = F.floor((F.col("_start") + F.col("_n") - 1) / seq_len)
    pieces = d.select(
        *keys,
        id_col,
        "_n",
        "_start",
        *carry,
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    block_lo = F.col("seq_id") * seq_len
    block_hi = block_lo + seq_len
    lo = F.greatest(F.col("_start"), block_lo)
    hi = F.least(F.col("_start") + F.col("_n"), block_hi)
    return pieces.select(
        *keys,
        F.col("seq_id").cast("long"),
        F.col(id_col),
        (lo - F.col("_start")).cast("long").alias("begin"),
        (hi - lo).cast("long").alias("n_toks"),
        *carry,
    )


def pack_sequences_greedy(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_size: int = 4096,
) -> DataFrame:
    """(bin_id, id_col, n_toks, overflow): greedy whole-document packing.

    Documents are walked in id order WITHIN each id-range group of
    `group_size` docs; a new bin opens when the next doc would push the
    bin past seq_len. Bins never span groups (each group packs
    independently — the fragmentation cost is at most one underfull bin
    per group, amortized to nothing at group_size >> 1), which is what
    makes the operator embarrassingly parallel: one applyInPandas pass
    per group, no global state. bin_id = group * 2^32 + local_bin is
    globally unique and order-preserving. Docs with n > seq_len are
    emitted alone in their own bin with overflow=true (the trainer's
    truncation policy applies downstream)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    import pandas as pd

    d = (
        docs.select(id_col, F.col(n_tokens_col).cast("long").alias("_n"))
        .filter(F.col("_n") > 0)
        .withColumn("_g", F.floor(F.col(id_col) / group_size))
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort")
        base = int(pdf["_g"].iloc[0]) << 32
        bins, fills, overflow = [], 0, []
        local, fill = -1, 0
        for n in pdf["_n"]:
            n = int(n)
            if local < 0 or fill + n > seq_len:
                local += 1
                fill = 0
            bins.append(base + local)
            overflow.append(n > seq_len)
            fill += n
        return pd.DataFrame(
            {
                "bin_id": bins,
                id_col: pdf[id_col].values,
                "n_toks": pdf["_n"].values,
                "overflow": overflow,
            }
        )

    id_t = docs.schema[id_col].dataType.simpleString()
    out_schema = f"bin_id long, {id_col} {id_t}, n_toks long, overflow boolean"
    return d.groupBy("_g").applyInPandas(pack, schema=out_schema)


def pack_corpus_chunks(
    chunks: DataFrame,
    seq_len: int,
    split_col: str = "split",
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    n_tokens_col: str = "n_tokens",
    chunk_bits: int = 20,
    group_size: int = 4096,
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Pack prepare_training_corpus output into training sequences, PER
    SPLIT: (split, seq_id, doc_id, chunk_id, begin, n_toks, *carry_cols).
    Sequences
    never mix splits — a train sequence containing a test chunk would be
    leakage at the token level, after all the document-level care.

    Each chunk gets the surrogate ordering id doc_id * 2^chunk_bits +
    chunk_id (guarded row-wise: a chunk_id >= 2^chunk_bits fails loudly
    rather than silently colliding), so packing order is (doc, chunk) —
    chunks of a document stay adjacent and in order inside the token
    stream, which is what lets a loader reconstruct contiguous text. For
    a shuffled curriculum, materialize a surrogate id ordered by
    splits.shuffle_key upstream instead.

    ONE split-keyed pack_sequences pass covers every split (r15): the
    two-level prefix scan's windows and totals are keyed on (split, _g),
    so sequences stay split-pure with a single plan branch — the old
    one-branch-per-split loop re-derived the chunk frame per split AND
    paid a distinct+collect job just to enumerate split names."""
    lim = 1 << chunk_bits
    # the guard lives INSIDE the surrogate-id expression so Catalyst
    # cannot prune it away (a standalone assert column would be
    # dropped as unused and never evaluate)
    sid = F.when(
        F.col(chunk_col) < lim, F.col(doc_col) * lim + F.col(chunk_col)
    ).otherwise(
        F.raise_error(F.lit(f"chunk_id >= 2^{chunk_bits}; raise chunk_bits"))
    )
    carry = [c for c in carry_cols if c not in (doc_col, chunk_col, split_col)]
    sub = chunks.select(
        F.col(split_col),
        F.col(doc_col),
        F.col(chunk_col),
        sid.alias("_sid"),
        F.col(n_tokens_col),
        *carry,
    )
    # group_size is in DOCUMENT units, but _sid lives in the surrogate
    # space doc_id * 2^chunk_bits + chunk_id: consecutive documents sit
    # 2^chunk_bits apart, so grouping raw _sid on group_size would put
    # ~1 document per group (2^chunk_bits divides any power-of-two
    # group_size) and the per-group totals frame would be CORPUS-sized,
    # defeating the two-level scan. Scale the grouping to the surrogate
    # space so a group again spans ~group_size documents and the totals
    # frame stays ~n_docs/group_size rows.
    packed = pack_sequences(
        sub, seq_len, n_tokens_col=n_tokens_col, id_col="_sid",
        group_size=group_size * lim, carry_cols=carry,
        key_cols=(split_col,),
    )
    return packed.select(
        F.col(split_col),
        "seq_id",
        F.floor(F.col("_sid") / lim).cast("long").alias(doc_col),
        (F.col("_sid") % lim).cast("long").alias(chunk_col),
        "begin",
        "n_toks",
        *carry,
    )


def packing_efficiency(
    sequences: DataFrame,
    seq_len: int,
    split_col: str = "split",
    n_toks_col: str = "n_toks",
) -> DataFrame:
    """(split, n_sequences, total_tokens, padded_tokens, efficiency):
    what fraction of trainer positions carry real tokens — short tail
    sequences pad to seq_len and waste compute, and a trainer sizes its
    token budget off THIS number, not the raw corpus count. One
    map-side-combined aggregate over the sequence frame."""
    pad = F.lit(seq_len) - F.col(n_toks_col)
    return (
        sequences.groupBy(split_col)
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.sum(n_toks_col).cast("long").alias("total_tokens"),
            F.sum(pad).cast("long").alias("padded_tokens"),
        )
        .withColumn(
            "efficiency",
            F.col("total_tokens")
            / (F.col("total_tokens") + F.col("padded_tokens")),
        )
    )

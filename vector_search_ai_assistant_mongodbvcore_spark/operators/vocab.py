"""Vocabulary induction over a document corpus — the distributed counting
that dominates tokenizer training (BPE/WordPiece) and corpus auditing.

Three stages, each a bounded-output aggregate over an unbounded corpus:

  * `term_stats` — per-term collection frequency (cf: total occurrences)
    and document frequency (df: docs containing the term). The heavy-
    hitter table every vocab build starts from.
  * `top_vocab` — the K most frequent terms with cumulative token
    coverage ("the top 1k terms cover 93.4% of all token occurrences"),
    the statistic that picks a vocab size.
  * `bpe_merge_candidates` — adjacent character-pair counts weighted by
    term frequency, over the TERM table rather than the corpus: exactly
    the count a BPE trainer computes each merge iteration, but the input
    is the bounded distinct-term table (weighted by cf) instead of the
    100 TB corpus — the standard trick that makes distributed BPE
    tractable (each iteration re-counts pairs over the vocab table only).

Scale shape: term_stats is two hash aggregates (distinct (term, doc)
then per-term counts — both map-side combinable; the distinct's shuffle
is the unavoidable one for exact df). top_vocab's global sort is
TakeOrderedAndProject (per-partition heaps, no total sort), and the
cumulative-coverage window runs over the K selected rows only — it is
given an explicit constant partition key so the plan shows a real (if
single-partition-by-construction) partition spec over a K-row frame.
The corpus-wide token total is a one-row aggregate joined in by
broadcast.

Reference has no analog (its tokenizer is an external service,
SharedLib/Services/TokenizerService.cs); determinism: counts are exact
integers, coverage is a single IEEE division of two longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.text import words

__all__ = [
    "term_stats", "top_vocab", "bpe_merge_candidates", "learn_bpe",
    "bpe_encode", "bpe_tokenize_col", "bpe_ids_col", "bpe_encode_corpus",
    "bpe_vocab_ids", "bpe_unk_id", "bpe_decode_ids", "bpe_unk_report",
]


def term_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(term, cf, df) — exact collection and document frequency per term.

    One aggregation (r16, guide §2.4): count(*) + count_distinct(doc) in
    a single groupBy replaces the old two-branch shape (cf aggregate JOIN
    distinct->df aggregate), which exploded the token stream twice and
    paid three exchanges plus a term-keyed join. Spark's distinct-agg
    rewrite plans this as one explode pass with an Expand(2) feeding
    partially-combined aggregates — fewer passes and exchanges at any
    scale; rows identical (A/B at sf0.1: vocab_top_terms 0.58 -> 0.49 s
    median, bit-parity on all 31 rows)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    exploded = df.select(
        F.col(id_col).alias("_doc"), F.explode(words(F.coalesce(t, F.lit("")))).alias("term")
    )
    return exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"), F.count_distinct("_doc").alias("df")
    )


def top_vocab(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-k terms by cf (term tiebreak) with rank and cumulative coverage.

    coverage = (running sum of cf over the selected rows) / (total token
    occurrences in the WHOLE corpus) — so a truncated vocab's last row
    reads off exactly how much of the token stream it explains.
    """
    stats = term_stats(df, id_col, text_col, lowercase)
    top = stats.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(k)
    total = stats.agg(F.sum("cf").alias("_total_cf"))
    # constant partition key over the bounded K-row frame (survives the
    # optimizer; see plans.inspect.bounded_window_key)
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import bounded_window_key

    w = (
        Window.partitionBy(bounded_window_key("term"))
        .orderBy(F.col("cf").desc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("_cum_cf", F.sum("cf").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "cf",
            "df",
            "rank",
            (F.col("_cum_cf").cast("double") / F.col("_total_cf").cast("double")).alias(
                "coverage"
            ),
        )
    )


def bpe_merge_candidates(
    terms: DataFrame,
    top_m: int = 100,
    term_col: str = "term",
    weight_col: str = "cf",
) -> DataFrame:
    """Rank adjacent character pairs by corpus frequency — one BPE merge
    iteration's counting step, run over the bounded term table.

    Input is `term_stats` output (or any (term, weight) frame); each term
    contributes every adjacent char pair, weighted by the term's corpus
    frequency. Output: (pair, weight, rank), top_m rows. A full BPE
    trainer loops: take rank-1 pair, rewrite the term table's symbol
    sequences, re-count — each iteration stays on the vocab table.
    """
    t = F.col(term_col)
    pairs = terms.select(
        F.explode(
            F.when(
                F.length(t) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: F.substr(t, i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        F.col(weight_col).alias("w"),
    )
    ranked = (
        pairs.groupBy("pair")
        .agg(F.sum("w").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("pair").asc())
        .limit(top_m)
    )
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import bounded_window_key

    w = Window.partitionBy(bounded_window_key("pair")).orderBy(F.col("weight").desc(), F.col("pair").asc())
    return ranked.withColumn("rank", F.row_number().over(w))


def learn_bpe(
    df: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    max_terms: int = 200_000,
    end_of_word: str = "</w>",
) -> dict:
    """Train a BPE tokenizer from the corpus (Sennrich et al. 2016,
    arXiv:1508.07909 — the word-count formulation every BPE trainer
    uses).

    Division of labor at 100 TB: Spark computes the (term, cf) table —
    the only corpus-sized work, one heavy-hitter aggregate; the merge
    loop then runs driver-side on the COLLECTED table (bounded by
    `max_terms` most-frequent terms; natural-language vocabularies are
    millions of terms at web scale, a few MB — the same bounded-collect
    discipline as the IVF/PQ codebook fits). Each merge takes the
    most-frequent adjacent symbol pair (lexicographic tiebreak, so
    training is deterministic) and rewrites the term table in place.

    Returns {"merges": [[a, b], ...], "vocab": sorted symbol list,
    "end_of_word": marker, "lowercase": flag} — feed to bpe_encode /
    bpe_tokenize_col / bpe_ids_col / bpe_encode_corpus (the encoders read
    the lowercase flag from the model, so a case-sensitive vocabulary is
    encoded case-sensitively).
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    stats = (
        term_stats(df, id_col, text_col, lowercase)
        .orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(max_terms)
        .collect()
    )
    # word -> symbol tuple (chars + end-of-word marker) with its count
    words: dict[tuple[str, ...], int] = {}
    for r in stats:
        words[tuple(r["term"]) + (end_of_word,)] = r["cf"]

    merges: list[list[str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append([best[0], best[1]])
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, cnt in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + cnt
        words = new_words

    vocab = sorted({s for syms in words for s in syms} | {m[0] + m[1] for m in merges})
    return {
        "merges": merges,
        "vocab": vocab,
        "end_of_word": end_of_word,
        "lowercase": lowercase,
    }


def bpe_encode(word: str, model: dict) -> list[str]:
    """Apply the learned merges to ONE word (greedy lowest-rank-first —
    the standard BPE inference): chars + end-of-word marker, then merge
    the present pair with the smallest training rank until none apply."""
    eow = model["end_of_word"]
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    syms = list(word) + [eow]
    while len(syms) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def bpe_tokenize_col(model: dict, text_col) -> Column:
    """array<string> BPE tokens for a text column — an Arrow-batched UDF
    applying the learned merges per word (the model dict rides the
    closure; KBs). For corpus-scale encoding prefer encoding the DISTINCT
    term table once and joining back — same trick as training."""
    import pandas as pd
    from pyspark.sql import functions as _F
    from pyspark.sql import types as T

    lower = model.get("lowercase", True)

    @_F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(texts):  # no annotations: local 'pd' names don't resolve
        # under `from __future__ import annotations`
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None or not t.strip():
                return []
            out: list[str] = []
            src = t.strip().lower() if lower else t.strip()
            for w in src.split():
                if w not in cache:
                    cache[w] = bpe_encode(w, model)
                out.extend(cache[w])
            return out

        return texts.map(one)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return enc(c)


def bpe_vocab_ids(model: dict) -> dict[str, int]:
    """Stable symbol -> id mapping: the sorted training vocab indexed in
    order, with id len(vocab) reserved for symbols assembled from
    characters never seen in training (<unk>)."""
    return {s: i for i, s in enumerate(model["vocab"])}


def bpe_unk_id(model: dict) -> int:
    return len(model["vocab"])


def bpe_ids_col(model: dict, text_col) -> Column:
    """array<int> BPE token ids for a text column — bpe_tokenize_col
    composed with the vocab id map inside one Arrow batch (per-word memo,
    model rides the closure). The per-row form: right for chunk-level
    tokenizing behind a staging barrier (materialize_sequences runs it
    ONCE per chunk); for whole-corpus encoding prefer bpe_encode_corpus,
    which pays the merge loop only once per DISTINCT term."""
    from pyspark.sql import functions as _F
    from pyspark.sql import types as T

    ids = bpe_vocab_ids(model)
    unk = bpe_unk_id(model)
    lower = model.get("lowercase", True)

    @_F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(texts):
        cache: dict[str, list[int]] = {}

        def one(t):
            if t is None or not t.strip():
                return []
            out: list[int] = []
            src = t.strip().lower() if lower else t.strip()
            for w in src.split():
                if w not in cache:
                    cache[w] = [ids.get(s, unk) for s in bpe_encode(w, model)]
                out.extend(cache[w])
            return out

        return texts.map(one)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return enc(c)


def bpe_encode_corpus(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    key_cols: "tuple[str, ...] | list[str]" = ("doc_id",),
    out_col: str = "input_ids",
) -> DataFrame:
    """Corpus-scale BPE encoding: df's columns + `out_col` (array<int>).

    The trick vocab training already uses, applied to inference (promised
    at bpe_tokenize_col): the greedy merge loop is O(word_len * merges)
    PYTHON work per word, so never pay it per occurrence — encode the
    DISTINCT term table once (bounded: natural-language vocabularies are
    millions of terms at web scale, MBs), then BROADCAST-join the encoded
    terms back onto the position-exploded corpus and reassemble each
    document's ids in word order.

    Plan: one narrow posexplode -> distinct-term aggregate (the bounded
    frame the Python UDF runs over) -> broadcast hash join (corpus side
    streams map-side, no shuffle for the probe) -> one keyed aggregation
    on `key_cols` (group size bounded by document word count). Rows whose
    text has no words (NULL/empty) keep an empty id array — parity with
    bpe_ids_col, pinned in tests.
    """
    keys = list(key_cols)
    t = F.col(text_col)
    if model.get("lowercase", True):
        # casing is a property of the TRAINED MODEL (learn_bpe records
        # it): a case-sensitive vocab must see case-preserved terms, and
        # a lowercased vocab must never receive case-variant duplicates
        # that bloat the distinct-term table
        t = F.lower(t)
    wp = df.select(
        *keys, F.posexplode(words(F.coalesce(t, F.lit("")))).alias("_pos", "_term")
    )
    terms = wp.select(F.col("_term")).distinct()
    enc = terms.withColumn("_ids", bpe_ids_col(model, F.col("_term")))
    joined = wp.join(F.broadcast(enc), "_term")
    docs = (
        joined.groupBy(*keys)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos").alias("p"), F.col("_ids").alias("i")))
                    ),
                    lambda x: x["i"],
                )
            ).alias(out_col)
        )
    )
    return df.join(docs, keys, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<int>"))
    )


def bpe_decode_ids(ids: "list[int]", model: dict) -> str:
    """Round-trip helper: token ids -> whitespace-joined words. Inverse of
    bpe_ids_col/bpe_encode_corpus on text whose characters the training
    corpus covers (unk ids decode to the empty string and break the
    round trip, by design)."""
    vocab = model["vocab"]
    eow = model["end_of_word"]
    syms = [vocab[i] if 0 <= i < len(vocab) else "" for i in ids]
    text = "".join(syms).replace(eow, " ")
    return " ".join(text.split())


def bpe_unk_report(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """(group?, n_docs, total_tokens, unk_tokens, unk_rate): how much of
    each group's text the trained tokenizer CANNOT represent — the
    coverage audit a trainer runs before committing to a vocab (a
    domain/language whose characters the training corpus never saw
    encodes to <unk> and contributes nothing to the loss).

    One bpe_encode_corpus pass (distinct-term broadcast join) + one
    map-side-combined aggregate; unk counting is a JVM array filter over
    the id arrays, no second Python pass."""
    unk = bpe_unk_id(model)
    enc = bpe_encode_corpus(df, model, text_col=text_col, key_cols=(id_col,))
    toks = F.size("input_ids")
    unks = F.size(F.filter("input_ids", lambda i: i == F.lit(unk)))
    keys = [group_col] if group_col is not None else []
    return (
        enc.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("long").alias("total_tokens"),
            F.sum(unks).cast("long").alias("unk_tokens"),
        )
        .withColumn(
            "unk_rate",
            F.when(F.col("total_tokens") > 0,
                   F.col("unk_tokens") / F.col("total_tokens")).otherwise(F.lit(0.0)),
        )
    )

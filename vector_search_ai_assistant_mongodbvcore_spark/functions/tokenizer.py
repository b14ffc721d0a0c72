"""Deterministic tokenizer kit: encode / count / decode.

The reference tokenizes with SharpToken (tiktoken's cl100k_base) to count and
trim prompt payloads (/root/reference/Search/Services/ChatService.cs:183-224).
tiktoken is not available in this container, so the engine ships a
deterministic BPE-ish tokenizer with the same *interface* and uses tiktoken
transparently when importable. The trim operators only rely on the interface
contract: encode -> list[int], len(encode(x)) == count(x), decode(encode(x))
round-trips whitespace-delimited text.

All three are Arrow-batched pandas UDFs (the reference's per-call C# loop is
the slow path this replaces).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - tiktoken absent in this container
    import tiktoken

    _ENC = tiktoken.get_encoding("cl100k_base")
except Exception:  # ImportError or download failure
    _ENC = None

# BPE-ish word/punctuation splitter: words, numbers, punctuation runs,
# whitespace attached to the following word (like cl100k's " word" tokens).
_TOKEN_RE = re.compile(r"\s?[A-Za-z]+|\s?\d+|\s?[^\sA-Za-z\d]+|\s+")


def _encode_py(text: str) -> list[int]:
    if _ENC is not None:
        return _ENC.encode(text or "")
    if not text:
        return []
    # Deterministic id: 31-bit FNV-1a of the token string. decode() needs the
    # original strings, so ids are only used for counting/slicing; decode is
    # implemented by re-splitting (see _decode_slice_py).
    out = []
    for m in _TOKEN_RE.finditer(text):
        h = 2166136261
        for ch in m.group().encode("utf-8"):
            h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
        out.append(h)
    return out


def _split_py(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


@pandas_udf(ArrayType(IntegerType()))
def tokenize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(lambda t: _encode_py(t if t is not None else ""))


@pandas_udf(IntegerType())
def count_tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(lambda t: len(_encode_py(t if t is not None else "")))


@pandas_udf(ArrayType(IntegerType()))
def count_tokens3(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series]]
) -> Iterator[pd.Series]:
    """Fused counter: token counts of THREE text columns in one Arrow
    round-trip (one Python eval node instead of three in the trim plan)."""
    for a, b, c in it:
        yield pd.Series(
            [
                [len(_encode_py(x if x is not None else "")) for x in row]
                for row in zip(a, b, c)
            ]
        )


@pandas_udf(StructType([StructField("head", StringType()), StructField("tail", StringType())]))
def slice_head_tail(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]]
) -> Iterator[pd.DataFrame]:
    """Fused trim: decode(encode(head_text)[:n_head]) AND
    decode(encode(tail_text)[-n_tail:]) in one Arrow round-trip."""
    for head_text, n_head, tail_text, n_tail in it:
        if _ENC is not None:
            heads = [
                _ENC.decode(_ENC.encode(t or "")[: int(k)]) for t, k in zip(head_text, n_head)
            ]
            tails = [
                _ENC.decode(_ENC.encode(t or "")[-int(k):]) if int(k) > 0 else ""
                for t, k in zip(tail_text, n_tail)
            ]
        else:
            heads = ["".join(_split_py(t or "")[: int(k)]) for t, k in zip(head_text, n_head)]
            tails = [
                "".join(_split_py(t or "")[-int(k):]) if int(k) > 0 else ""
                for t, k in zip(tail_text, n_tail)
            ]
        yield pd.DataFrame({"head": heads, "tail": tails})


@pandas_udf(StringType())
def detokenize_head(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """decode(encode(text)[:n]) — head-slice used for RAG payload trimming
    (ChatService.cs:214). Implemented by re-splitting so it works without
    tiktoken; with tiktoken it decodes real token ids."""
    for text, n in it:
        if _ENC is not None:
            yield pd.Series(
                [
                    _ENC.decode(_ENC.encode(t or "")[: int(k)])
                    for t, k in zip(text, n)
                ]
            )
        else:
            yield pd.Series(
                ["".join(_split_py(t or "")[: int(k)]) for t, k in zip(text, n)]
            )


@pandas_udf(StringType())
def detokenize_tail(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """decode(encode(text)[-n:]) — tail-slice used for conversation trimming
    (ChatService.cs:218-221)."""
    for text, n in it:
        if _ENC is not None:
            yield pd.Series(
                [
                    _ENC.decode(_ENC.encode(t or "")[-int(k):]) if int(k) > 0 else ""
                    for t, k in zip(text, n)
                ]
            )
        else:
            yield pd.Series(
                [
                    "".join(_split_py(t or "")[-int(k):]) if int(k) > 0 else ""
                    for t, k in zip(text, n)
                ]
            )


def approx_token_count(col: Column | str) -> Column:
    """Pure-SQL token estimate (whitespace-delimited), exactly expressible in
    any ANSI engine — used where a DuckDB oracle must agree bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )

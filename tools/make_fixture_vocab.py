"""Generate tests/fixtures/mini_bpe.tiktoken — a tiny but REAL
tiktoken-format vocabulary for hermetic BPE tests.

Layout follows the published cl100k_base.tiktoken format exactly
('<base64 token> <rank>' per line): ranks 0-255 are the single bytes,
then 150 merges trained with classic BPE (most-frequent adjacent pair,
ties broken by first occurrence order) over a fixed English corpus,
pre-tokenized with the engine's cl100k split pattern.  Training in merge
order guarantees every merged token's halves exist at lower ranks, so
the byte-pair-merge encoder can always reach it — the same invariant the
real cl100k vocab holds.

Deterministic: same script -> byte-identical file.  Rerun after changing
the corpus or merge count and commit the result.
"""

from __future__ import annotations

import base64
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
    CL100K_SPLIT_PATTERN,
)

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the theatre is the thing: there they thought the weather together. "
    "spark partitions the data and the engine merges the tokens. "
    "tokens, tokens; tokens! counting tokens in the streaming engine. "
    "hello world, hello spark, hello tokenizer. "
    "what products are available? the products in the catalog. "
) * 4

N_MERGES = 150


def train() -> "list[bytes]":
    import regex

    split = regex.compile(CL100K_SPLIT_PATTERN)
    pieces = [m.group().encode("utf-8") for m in split.finditer(CORPUS)]
    words = [[p[i : i + 1] for i in range(len(p))] for p in pieces]
    merges: list[bytes] = []
    for _ in range(N_MERGES):
        counts: dict[tuple[bytes, bytes], int] = {}
        order: dict[tuple[bytes, bytes], int] = {}
        for w in words:
            for i in range(len(w) - 1):
                pair = (w[i], w[i + 1])
                counts[pair] = counts.get(pair, 0) + 1
                order.setdefault(pair, len(order))
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], order[p]))
        if counts[best] < 2:
            break
        merged = best[0] + best[1]
        merges.append(merged)
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == best[0] and w[i + 1] == best[1]:
                    w[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "mini_bpe.tiktoken",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lines = [
        f"{base64.b64encode(bytes([b])).decode()} {b}" for b in range(256)
    ]
    for i, tok in enumerate(train()):
        lines.append(f"{base64.b64encode(tok).decode()} {256 + i}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} tokens")


if __name__ == "__main__":
    main()

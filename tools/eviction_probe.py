"""Eviction-cost curve for the streaming fuzzy-dedup store (judge r9
directive #6): max_history_batches trades near-dup RECALL for bounded
state — this probe quantifies the trade.

Protocol: batches of fresh documents arrive in id order; each batch also
carries near-duplicates of documents that arrived `lag` batches earlier
(lags 1/2/4/8). For each horizon H the store is evicted after every
batch to the last H batches (exactly what start_corpus_stream's
max_history_batches does), and the probe records, per lag, the fraction
of planted duplicates that SURVIVED (missed — their original's band keys
were evicted) plus the final store row count.

Expected shape (pinned by tests/test_streaming_neardup.py's
zero-miss-below-horizon test): miss rate 0 for lag < H, ~1 for lag > H
(a duplicate can also be caught by a same-batch sibling, so >H rates can
sit below 1.0 when several dups of one family share a batch — this probe
plants one dup per family per batch to keep the signal clean).

Usage: python tools/eviction_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAGS = (1, 2, 4, 8)
HORIZONS = (2, 4, 8, None)  # None = unbounded (no eviction)
N_BATCHES = 12
FRESH_PER_BATCH = 4


def _prose(tag: str) -> str:
    # every token tag-prefixed: cross-family Jaccard is exactly 0, so a
    # surviving duplicate is purely an eviction signal, never an
    # (un)lucky MinHash band collision with an unrelated family
    return " ".join(f"{tag}w{i} {tag}x{i} {tag}y{i}" for i in range(20))


def run() -> None:
    from vector_search_ai_assistant_mongodbvcore_spark import get_spark
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        evict_neardup_history,
        neardup_filter_batch,
        open_neardup_store,
    )

    spark = get_spark(app_name="eviction-probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # fresh docs: family f born in batch f // FRESH_PER_BATCH; each
    # family gets EXACTLY ONE near-duplicate, `LAGS[f % 4]` batches
    # after birth — no intermediate member re-seeds the family's band
    # keys, so the miss signal is purely (duplicate gap vs horizon)
    def batch_rows(e: int):
        rows = []
        for j in range(FRESH_PER_BATCH):
            fam = e * FRESH_PER_BATCH + j
            rows.append((fam * 1000, _prose(f"fam{fam}x"), None))
        for lag in LAGS:
            born = e - lag
            if born >= 0:
                # the one family born `lag` batches ago whose designated
                # lag is `lag` (tail tweak keeps it a NEAR-dup, not exact)
                for j in range(FRESH_PER_BATCH):
                    fam = born * FRESH_PER_BATCH + j
                    if LAGS[fam % len(LAGS)] == lag:
                        rows.append(
                            (fam * 1000 + 100 + e, _prose(f"fam{fam}x") + " tail", lag)
                        )
        return rows

    print("| horizon H | store rows (end) |", " | ".join(f"miss@lag{g}" for g in LAGS), "|")
    print("|---|---|" + "---|" * len(LAGS))
    for horizon in HORIZONS:
        root = tempfile.mkdtemp(prefix="evprobe_")
        store = open_neardup_store(spark, os.path.join(root, "store"), n_buckets=8)
        planted = {g: 0 for g in LAGS}
        missed = {g: 0 for g in LAGS}
        for e in range(N_BATCHES):
            rows = batch_rows(e)
            df = spark.createDataFrame(
                [(i, t) for i, t, _ in rows], "doc_id long, text string"
            )
            kept = {
                r["doc_id"]
                for r in neardup_filter_batch(
                    df, store, e, run_id="probe", seq=e, bands=8, shingle_size=3
                ).collect()
            }
            for i, _, lag in rows:
                if lag is not None:
                    planted[lag] += 1
                    if i in kept:
                        missed[lag] += 1
            if horizon is not None and e + 1 >= horizon:
                evict_neardup_history(store, e - horizon + 1)
        n_rows = store.read().count()
        cells = " | ".join(
            f"{missed[g]}/{planted[g]} ({missed[g] / max(1, planted[g]):.0%})"
            for g in LAGS
        )
        print(f"| {horizon if horizon is not None else 'unbounded'} | {n_rows} | {cells} |")
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    run()

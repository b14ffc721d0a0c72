"""E2E smoke of the one-command training-data run (tools/prepare_run.py):
subprocess at sf0.001 -> shard tree + manifest exist and account for the
same sequences the loader view reads back."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.deep  # slow E2E lane (r16 tiering): run with -m deep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prepare_run_end_to_end(spark, tmp_path):
    out = str(tmp_path / "run")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_run.py"),
         "/root/testdata/sf0.001", out],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["epochs"] == 2 and summary["sequences"] > 0

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert {"epochs", "domain_audit", "tokenizer_fertility", "shards"} <= set(manifest)
    assert all("rates" in e for e in manifest["epochs"].values())

    # the ingest contract pre-flight ran and the run artifact records it
    contract = manifest["ingest_contract"]
    assert contract["all_passed"] is True
    assert {r["constraint"] for r in contract["report"]} == {
        "completeness(text) >= 0.99",
        "uniqueness(doc_id) >= 1.0",
        "compliance(n_chars >= 0) >= 1.0",
        "row_count >= 1",
    }

    # the loader view agrees with the manifest's accounting
    df = spark.read.parquet(os.path.join(out, "shards"))
    assert df.count() == summary["sequences"]
    assert {"input_ids", "n_toks", "split", "epoch"} <= set(df.columns)
    assert {r["epoch"] for r in df.select("epoch").distinct().collect()} == {0, 1}

    # the run trains its own BPE tokenizer and the shard ids stay inside
    # its vocab (unk id == vocab_size)
    tok = manifest["tokenizer"]
    assert tok["kind"] == "bpe" and os.path.exists(os.path.join(out, "tokenizer.json"))
    model = json.load(open(os.path.join(out, "tokenizer.json")))
    assert tok["vocab_size"] == len(model["vocab"])
    from pyspark.sql import functions as F

    mx = df.select(F.max(F.array_max("input_ids"))).collect()[0][0]
    assert mx <= len(model["vocab"])

    # the output dir carries a self-describing dataset card whose run
    # sections agree with the manifest
    card = open(os.path.join(out, "DATACARD.md")).read()
    for section in (
        "## Domain audit", "## PII incidence", "## Tokenizer fertility",
        "## Training run", "### Per-epoch mixture",
    ):
        assert section in card, section
    assert f"{summary['sequences']} sequences" in card
    assert f"{tok['num_merges']} merges" in card
    for e, plan in manifest["epochs"].items():
        for src, rate in plan["rates"].items():
            assert f"| {e} | {src} | {rate:.4f}" in card, (e, src)
    # unk audit: manifest rows rendered in the card, totals conserve
    # against the shard token count per split-agnostic sum
    assert "### Tokenizer coverage" in card
    audit = tok["unk_audit"]
    assert audit and all(0.0 <= e["unk_rate"] <= 1.0 for e in audit)
    for e in audit:
        assert f"| {e['source']} | {e['total_tokens']} | {e['unk_tokens']}" in card

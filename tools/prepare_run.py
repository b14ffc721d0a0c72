"""One-command training-data run: raw documents -> gated, deduplicated,
decontaminated, split, packed, epoch-sharded token sequences + a run
manifest — every stage an engine operator, composed the way SURVEY §8's
second table describes them.

    python tools/prepare_run.py [sf_dir] [out_dir]

Stages (all deterministic; re-running reproduces byte-identical shards):
  1. prepare_training_corpus  exact dedup -> MinHash fuzzy dedup
                              (best-quality survivor per cluster;
                              SPARK_GRAFT_NEARDUP=0 disables) -> n-gram
                              decontamination (benchmark = every 17th
                              doc, standing in for an eval suite) ->
                              Gopher rule battery -> PII scrub ->
                              splits -> chunking
  2. learn_bpe                train a BPE tokenizer ON the cleaned
                              corpus (SPARK_GRAFT_BPE_MERGES merges,
                              default 200; 0 disables and falls back to
                              the engine splitter), then encode every
                              chunk via bpe_encode_corpus — the
                              distinct-term broadcast-join path, so the
                              Python merge loop runs once per DISTINCT
                              term, not per occurrence
  3. plan_curriculum          2-epoch anneal: uniform sources -> the
                              top-half sources by token supply
  4. export_curriculum_shards pretokenized ids -> per-epoch mixture
                              sample -> pack to 256-token sequences ->
                              shard tree
  5. manifest.json +          corpus-level audit (domain_audit),
     tokenizer.json           tokenizer fertility, per-epoch mixture
                              plans, shard counts, and the trained BPE
                              model itself — the trainer needs the
                              tokenizer that produced the ids.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # dataset_card

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vsai_training_run"


def main() -> None:
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark import get_spark, load_tables
    from vector_search_ai_assistant_mongodbvcore_spark.operators.export import (
        export_curriculum_shards,
        shard_manifest,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.profile import (
        domain_audit,
        tokenizer_fertility,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        plan_curriculum,
        source_token_stats,
    )

    spark = get_spark(app_name="prepare-run", cpus=16)
    docs = load_tables(spark, SF_DIR)["documents"]

    # 0. ingest contract pre-flight (operators/contracts.py): the
    # declarative expectations a delivery must meet before any stage
    # spends compute on it — ONE map-combined agg scan; the report ships
    # in the manifest so the run artifact records what was checked.
    # Policy here is report-and-warn (the one-command demo must not die
    # on exotic local corpora); a production gate would route a failing
    # delivery to quarantine instead — that path exists as
    # streaming/contracts.start_contract_monitor_stream.
    from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import (
        check,
        completeness,
        compliance,
        row_count,
        uniqueness,
    )

    ingest_contract = [
        completeness("text", 0.99),
        uniqueness("doc_id", 1.0),
        compliance("n_chars >= 0", 1.0),
        row_count(1, None),
    ]
    contract_report = [r.asDict() for r in check(docs, ingest_contract).collect()]
    contract_ok = all(r["passed"] for r in contract_report)
    if not contract_ok:
        print(
            "[contract] WARNING: ingest contract violated — see the "
            "ingest_contract manifest section; continuing (report-only policy)"
        )

    # 1. corpus prep: the benchmark stand-in must NOT also be train data
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.join(bench.select("doc_id"), "doc_id", "left_anti")
    # fuzzy dedup defaults ON for the one-command run (best-quality
    # survivor): the trainer-facing path matches the RefinedWeb recipe;
    # SPARK_GRAFT_NEARDUP=0 falls back to exact-only
    neardup = os.environ.get("SPARK_GRAFT_NEARDUP", "1") != "0"
    chunks = prepare_training_corpus(
        corpus,
        use_gopher_rules=True,
        benchmark=bench,
        chunk_size=64,
        chunk_overlap=0,
        neardup_minhash=neardup,
        neardup_keep="best_quality",
    )
    # carry source back for the curriculum sampler (chunking emits
    # (doc_id, split, chunk_id, n_tokens, chunk_text))
    chunks = chunks.join(docs.select("doc_id", "source"), "doc_id")

    # 2. tokenizer: train BPE on the CLEANED corpus (the chunk text —
    # post dedup/decontam/gopher/PII-scrub, so no scrubbed PII string can
    # become a vocab entry in the shipped tokenizer.json), then encode
    # the same chunks via the distinct-term broadcast join
    bpe_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "200"))
    bpe_model = None
    if bpe_merges > 0:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.vocab import (
            bpe_encode_corpus,
            learn_bpe,
        )

        bpe_model = learn_bpe(
            chunks, num_merges=bpe_merges, max_terms=20_000,
            id_col="doc_id", text_col="chunk_text",
        )
        chunks = bpe_encode_corpus(
            chunks,
            bpe_model,
            text_col="chunk_text",
            key_cols=("doc_id", "chunk_id"),
            out_col="_toks",
        )

    # 3. curriculum: uniform start -> token-rich half at the end
    avail = source_token_stats(corpus)
    ranked = sorted(avail, key=lambda s: -avail[s])
    rich = set(ranked[: max(1, len(ranked) // 2)])
    start = {s: 1.0 / len(avail) for s in avail}
    end = {s: (1.0 / len(rich) if s in rich else 0.0) for s in avail}
    budget = max(1, sum(avail.values()) // 4)
    plans = plan_curriculum(avail, start, end, token_budget_per_epoch=budget, epochs=2)

    # 4. shards
    shards_dir = os.path.join(OUT, "shards")
    manifest_epochs = export_curriculum_shards(
        chunks,
        plans,
        shards_dir,
        seq_len=256,
        stage_dir=os.path.join(OUT, "_stage"),
        group_size=64,
        pretokenized=bpe_model is not None,
    )

    # 5. manifest + tokenizer
    os.makedirs(OUT, exist_ok=True)
    tokenizer_info = {"kind": "engine-splitter"}
    if bpe_model is not None:
        tok_path = os.path.join(OUT, "tokenizer.json")
        with open(tok_path, "w") as f:
            json.dump(bpe_model, f)
        # fertility of the tokenizer that ACTUALLY produced the shard ids
        # (the per-language tokenizer_fertility section below uses the
        # engine splitter and is labeled as such — a trainer planning
        # token budgets must use this number, not that one)
        fert = chunks.agg(
            F.sum(F.size("_toks")).alias("t"), F.sum("n_tokens").alias("w")
        ).first()
        tokenizer_info = {
            "kind": "bpe",
            "path": tok_path,
            "num_merges": len(bpe_model["merges"]),
            "vocab_size": len(bpe_model["vocab"]),
            "unk_id": len(bpe_model["vocab"]),
            "bpe_tokens_per_word": round(fert["t"] / max(fert["w"], 1), 4),
        }
        # unk audit straight off the already-encoded _toks column — the
        # coverage bpe_unk_report measures, without a second encode pass
        unk_id = len(bpe_model["vocab"])
        unk_audit = [
            r.asDict()
            for r in chunks.groupBy("source")
            .agg(
                F.sum(F.size("_toks")).cast("long").alias("total_tokens"),
                F.sum(
                    F.size(F.filter("_toks", lambda i: i == F.lit(unk_id)))
                ).cast("long").alias("unk_tokens"),
            )
            .withColumn(
                "unk_rate",
                F.when(
                    F.col("total_tokens") > 0,
                    F.col("unk_tokens") / F.col("total_tokens"),
                ).otherwise(F.lit(0.0)),
            )
            .collect()
        ]
        tokenizer_info["unk_audit"] = unk_audit
    from vector_search_ai_assistant_mongodbvcore_spark.operators.export import (
        read_training_shards,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.packing import (
        packing_efficiency,
    )

    # real-token fraction of trainer positions (tail padding accounted) —
    # the number a token budget is sized from
    pack_eff = [
        r.asDict()
        for r in packing_efficiency(
            read_training_shards(spark, shards_dir), seq_len=256
        ).collect()
    ]
    shards = [r.asDict() for r in shard_manifest(spark, shards_dir).collect()]
    manifest = {
        "source_dir": SF_DIR,
        "shards_dir": shards_dir,
        "seq_len": 256,
        "fuzzy_dedup": (
            {"method": "minhash-lsh", "keep": "best_quality"} if neardup else None
        ),
        "tokenizer": tokenizer_info,
        "epochs": manifest_epochs,
        "domain_audit": [r.asDict() for r in domain_audit(corpus).collect()],
        # per-language fertility of the ENGINE SPLITTER (corpus-profile
        # diagnostic); the BPE fertility for the shard ids is
        # tokenizer.bpe_tokens_per_word above
        "tokenizer_fertility_kind": "engine-splitter",
        "tokenizer_fertility": [
            r.asDict() for r in tokenizer_fertility(corpus).collect()
        ],
        "packing_efficiency": pack_eff,
        "shards": shards,
        "ingest_contract": {"all_passed": contract_ok, "report": contract_report},
    }
    path = os.path.join(OUT, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    n_seqs = sum(s.get("n_sequences", 0) for s in shards)

    # 6. dataset card next to the shard tree: the corpus profile (every
    # number from an engine operator) + this run's manifest sections, so
    # the artifact a trainer receives is self-describing
    from dataset_card import build_card

    card = build_card(corpus, f"{SF_DIR}/documents.parquet")
    card += [
        "",
        "## Training run (this shard tree)",
        "",
        f"* shards: `{shards_dir}` — {len(shards)} files, {n_seqs} sequences"
        f" of seq_len {manifest['seq_len']}",
        f"* tokenizer: {tokenizer_info['kind']}"
        + (
            f" ({tokenizer_info['num_merges']} merges, vocab"
            f" {tokenizer_info['vocab_size']}, unk {tokenizer_info['unk_id']})"
            if tokenizer_info["kind"] == "bpe"
            else ""
        ),
    ] + (
        [
            "",
            "### Tokenizer coverage (unk rate per source, shard ids)",
            "",
            "| source | tokens | unk | unk rate |",
            "|---|---|---|---|",
        ]
        + [
            f"| {e['source']} | {e['total_tokens']} | {e['unk_tokens']}"
            f" | {e['unk_rate']:.5f} |"
            for e in sorted(
                tokenizer_info.get("unk_audit", []), key=lambda x: x["source"]
            )
        ]
        if tokenizer_info["kind"] == "bpe"
        else []
    ) + [
        "",
        "### Packing efficiency (real-token fraction of trainer positions)",
        "",
        "| split | sequences | tokens | padded | efficiency |",
        "|---|---|---|---|---|",
    ] + [
        f"| {e['split']} | {e['n_sequences']} | {e['total_tokens']}"
        f" | {e['padded_tokens']} | {e['efficiency']:.3f} |"
        for e in sorted(pack_eff, key=lambda x: x["split"])
    ] + [
        "",
        "### Per-epoch mixture (plan_curriculum)",
        "",
        "| epoch | source | rate | expected tokens | shortfall |",
        "|---|---|---|---|---|",
    ]
    for e, plan in sorted(manifest_epochs.items()):
        for src in sorted(plan["rates"]):
            card.append(
                f"| {e} | {src} | {plan['rates'][src]:.4f}"
                f" | {plan['expected_tokens'].get(src, 0)}"
                f" | {plan['shortfall'].get(src, 0)} |"
            )
    with open(os.path.join(OUT, "DATACARD.md"), "w") as f:
        f.write("\n".join(card) + "\n")
    print(
        json.dumps(
            {"out": OUT, "shard_files": len(shards), "sequences": n_seqs,
             "epochs": len(plans)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

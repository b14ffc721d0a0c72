"""Decontamination operator (operators/decontam.py): benchmark n-gram
overlap flagging, python-oracle parity, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import decontam as DC


def _df(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


def _py_ngrams(text, n):
    w = text.lower().strip().split()
    if not text.strip():
        return {""}
    if len(w) <= n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_hand_computed_hits(spark):
    docs = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "quick brown fox jumps over something else entirely here"),
        ],
    )
    bench = _df(spark, [(100, "the quick brown fox jumps over a fence")])
    rep = {
        r.doc_id: r
        for r in DC.contamination_report(docs, bench, n=3, min_hits=1).collect()
    }
    # doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps",
    # "fox jumps over" with the benchmark
    assert rep[1].hits == 4 and rep[1].contaminated
    assert rep[2].hits == 0 and not rep[2].contaminated
    assert rep[3].hits == 3 and rep[3].contaminated
    # n_ngrams = 9 words -> 7 trigrams each
    assert rep[1].n_ngrams == 7


def test_python_oracle_parity(spark, tables):
    docs = tables["documents"].limit(60)
    bench = tables["documents"].filter(F.col("doc_id") % 11 == 0).limit(10)
    n = 4
    got = {
        r.doc_id: (r.n_ngrams, r.hits)
        for r in DC.contamination_report(docs, bench, n=n).collect()
    }
    bset = set()
    for r in bench.select("text").collect():
        bset |= _py_ngrams(r.text or "", n)
    for r in docs.select("doc_id", "text").collect():
        ngs = _py_ngrams(r.text or "", n) if r.text is not None else set()
        exp = (len(ngs), len(ngs & bset)) if r.text is not None else (0, 0)
        assert got[r.doc_id] == exp, r.doc_id


def test_min_hits_threshold_and_decontaminate(spark):
    docs = _df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma unrelated tail words here"),
            (3, "totally clean document goes right here now"),
        ],
    )
    bench = _df(spark, [(9, "alpha beta gamma delta epsilon eta")])
    # doc1 shares 3 trigrams, doc2 shares 1
    strict = DC.contamination_report(docs, bench, n=3, min_hits=2)
    flags = {r.doc_id: r.contaminated for r in strict.collect()}
    assert flags == {1: True, 2: False, 3: False}
    kept = sorted(
        r.doc_id for r in DC.decontaminate(docs, bench, n=3, min_hits=2).collect()
    )
    assert kept == [2, 3]
    # decontaminate preserves all original columns
    assert DC.decontaminate(docs, bench, n=3).columns == docs.columns


def test_every_doc_reported_including_unshingleable(spark):
    docs = _df(spark, [(1, "some real text right here"), (2, ""), (3, None)])
    bench = _df(spark, [(9, "benchmark text")])
    rep = {r.doc_id: r for r in DC.contamination_report(docs, bench, n=3).collect()}
    assert set(rep) == {1, 2, 3}
    # NULL text: no shingle rows -> zeros; empty text: the "" shingle
    assert rep[3].n_ngrams == 0 and rep[3].hits == 0 and not rep[3].contaminated
    assert rep[2].hits == 0


def test_benchmark_side_is_broadcast(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    docs = tables["documents"]
    bench = tables["documents"].filter(F.col("doc_id") % 13 == 0)
    rep = plan_report(DC.contamination_report(docs, bench, n=5))
    assert rep.broadcast_joins >= 1
    assert rep.python_evals == 0  # pure column exprs end to end


def test_contamination_sources_attribution(spark):
    docs = _df(
        spark,
        [
            (1, "alpha beta gamma delta unrelated tail words here"),
            (2, "omega psi chi phi upsilon tau more words"),
            (3, "nothing shared with any benchmark document at all"),
        ],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"), (200, "omega psi chi phi other")],
        ["bench_id", "text"],
    )
    edges = {
        (r.doc_id, r.bench_id): r.shared_ngrams
        for r in DC.contamination_sources(
            docs, bench, n=3, bench_id_col="bench_id"
        ).collect()
    }
    # doc1 shares alpha-beta-gamma + beta-gamma-delta with bench 100 only
    assert edges == {(1, 100): 2, (2, 200): 2}


def test_sources_explain_report_hits(spark, tables):
    from pyspark.sql import functions as F

    docs = tables["documents"].limit(80)
    bench = tables["documents"].filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    rep = {r.doc_id: r.hits for r in DC.contamination_report(
        corpus, bench, n=5, bench_id_col="bench_id"
    ).collect()}
    edges = DC.contamination_sources(corpus, bench, n=5, bench_id_col="bench_id")
    # per-doc union of edge n-grams == report hits; since hits counts
    # DISTINCT overlapping n-grams, each doc's max single-edge count is a
    # lower bound and the sum an upper bound
    agg = {
        r.doc_id: (r.mx, r.sm)
        for r in edges.groupBy("doc_id").agg(
            F.max("shared_ngrams").alias("mx"), F.sum("shared_ngrams").alias("sm")
        ).collect()
    }
    for d, (mx, sm) in agg.items():
        assert mx <= rep[d] <= sm, d
    # docs with no edges report zero hits
    for d, h in rep.items():
        if d not in agg:
            assert h == 0


def test_remove_contaminated_spans_hand_computed(spark):
    docs = _df(
        spark,
        [
            # the full benchmark sentence embedded at word positions 3..11
            (1, "intro words here the quick brown fox jumps over the lazy dog closing words here now"),
            (2, "a completely different sentence with no overlap at all"),
            (3, None),
        ],
    )
    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    out = {
        r.doc_id: r
        for r in DC.remove_contaminated_spans(docs, bench, n=3).collect()
    }
    # every trigram of the embedded passage hits; no straddling trigram does
    assert out[1].clean_text == "intro words here closing words here now"
    assert out[1].n_words == 16 and out[1].n_removed == 9
    assert out[2].clean_text == docs.filter(F.col("doc_id") == 2).first().text
    assert out[2].n_removed == 0
    assert out[3].clean_text is None and out[3].n_words == 0 and out[3].n_removed == 0


def test_remove_contaminated_spans_bounded_parity(spark, tables):
    docs = tables["documents"].limit(80)
    bench = tables["documents"].filter(F.col("doc_id") % 11 == 0).limit(12)
    a = sorted(
        map(tuple, DC.remove_contaminated_spans(docs, bench, n=4).collect())
    )
    b = sorted(
        map(tuple, DC.remove_contaminated_spans(docs, bench, n=4, bounded=True).collect())
    )
    assert a == b


def test_remove_contaminated_spans_python_parity(spark, tables):
    docs = tables["documents"].limit(60)
    bench = tables["documents"].filter(F.col("doc_id") % 11 == 0).limit(10)
    n = 4
    bset = set()
    for r in bench.select("text").collect():
        bset |= _py_ngrams(r.text or "", n)
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in DC.remove_contaminated_spans(docs, bench, n=n).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        if r.text is None:
            assert got[r.doc_id] == (None, 0)
            continue
        w = r.text.split()
        lw = [x.lower() for x in w]
        cov = set()
        if lw:
            if len(lw) <= n:
                if " ".join(lw) in bset:
                    cov = set(range(len(lw)))
            else:
                for i in range(len(lw) - n + 1):
                    if " ".join(lw[i : i + n]) in bset:
                        cov |= set(range(i, i + n))
        exp_clean = " ".join(x for i, x in enumerate(w) if i not in cov)
        assert got[r.doc_id] == (exp_clean, len(cov)), r.doc_id


def test_mask_benchmark_side_is_broadcast(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    docs = tables["documents"]
    bench = tables["documents"].filter(F.col("doc_id") % 13 == 0)
    rep = plan_report(DC.remove_contaminated_spans(docs, bench, n=5))
    assert rep.broadcast_joins >= 1  # benchmark n-gram set never shuffles
    assert rep.python_evals == 0  # span blanking is pure column exprs

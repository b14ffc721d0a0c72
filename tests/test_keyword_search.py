"""BM25 keyword search + RRF hybrid fusion (operators/keyword_search.py).

The BM25 oracle here is an independent pure-Python implementation over a
hand-built corpus — not the DuckDB SQL twin (that runs in the driver gate);
if both agree with this third implementation the score expression is right.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import keyword_search as KW

CORPUS = [
    (0, "spark joins fast spark spark"),
    (1, "hash join hash join hash join"),
    (2, "the quick brown fox"),
    (3, "spark hash scan scan"),
    (4, ""),  # empty doc: no tokens, excluded from N/avgdl and results
    (5, "Spark!! SCAN, spark-scan"),  # case + punctuation fold into terms
]
TERMS = ["spark", "hash", "scan"]


def py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: [t for t in _split(txt)] for i, txt in corpus}
    toks = {i: ts for i, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += (idf * tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * len(ts)) / avgdl))
        if any(t in ts for t in terms):
            out[i] = s
    return out


def _split(txt):
    import re

    return [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_python_oracle(spark, docs):
    got = {
        r["doc_id"]: r["bm25"]
        for r in KW.bm25_scores(docs, TERMS).collect()
    }
    want = py_bm25(CORPUS, TERMS)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12), i


def test_bm25_excludes_nonmatching_and_empty(spark, docs):
    ids = {r["doc_id"] for r in KW.bm25_scores(docs, TERMS).collect()}
    assert 2 not in ids  # no query term
    assert 4 not in ids  # empty doc
    assert 5 in ids  # matched through case/punctuation folding


def test_bm25_rare_term_outscores_common_on_equal_tf(spark):
    # 'rare' appears in 1 of 10 docs, 'common' in 9 of 10; the probe doc
    # has each exactly once at identical length -> idf must dominate.
    rows = [(i, "common filler words here") for i in range(9)]
    rows.append((9, "rare common filler here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s_rare = KW.bm25_scores(docs, ["rare"]).filter("doc_id = 9").collect()[0]["bm25"]
    s_common = KW.bm25_scores(docs, ["common"]).filter("doc_id = 9").collect()[0]["bm25"]
    assert s_rare > s_common


def test_ranked_topk_limits_then_ranks(spark, docs):
    scored = KW.bm25_scores(docs, TERMS)
    ranked = KW.ranked_topk(scored, "bm25", "doc_id", k=2).collect()
    assert [r["rank"] for r in sorted(ranked, key=lambda r: r["rank"])] == [1, 2]
    assert len(ranked) == 2


def test_rrf_fuse_union_and_scores(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in KW.rrf_fuse(a, b).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["rrf"] == pytest.approx(1 / 61)
    assert got[2]["rrf"] == pytest.approx(1 / 62 + 1 / 61)  # both lists
    assert got[3]["rrf"] == pytest.approx(1 / 62)
    assert got[1]["rank_b"] is None and got[3]["rank_a"] is None


def test_registered_queries_shape(spark):
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    reg = q.queries()
    # bm25_topk retired r15 (slot -> bm25_search_many); shape pinned on the
    # function directly
    top = q.bm25_topk(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(top) <= 10
    assert [c for c in top[0].asDict()] == ["doc_id", "bm25"]
    # descending by rounded score, id tiebreak
    keys = [(-r["bm25"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)

    batch = reg["bm25_search_many"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(batch) <= 30
    assert [c for c in batch[0].asDict()] == ["query_id", "doc_id", "bm25", "rank"]
    # query 0 of the batch IS the retired query's term set: identical rows
    q0 = [(r["doc_id"], r["bm25"]) for r in sorted(
        (r for r in batch if r["query_id"] == 0), key=lambda r: r["rank"]
    )]
    assert q0 == [(r["doc_id"], r["bm25"]) for r in top]

    hyb = reg["hybrid_search_indexed"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(hyb) <= 10
    for r in hyb:
        present = (r["kw_rank"] is not None) + (r["vec_rank"] is not None)
        assert present >= 1
        assert r["rrf"] > 0


def test_bm25_topk_plan_is_take_ordered(spark):
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    df = q.bm25_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_index_matches_batch_scores(spark, tmp_path, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    docs = tables["documents"]
    idx = Bm25Index(spark, str(tmp_path / "bm25")).build_if_absent(docs, n_buckets=16)
    got = {r["doc_id"]: r["bm25"] for r in idx.search(TERMS, k=10).collect()}
    batch = KW.bm25_scores(docs, TERMS)
    want = {
        r["doc_id"]: r["bm25"]
        for r in batch.orderBy(F.col("bm25").desc(), "doc_id").limit(10).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_bm25_index_prunes_partitions(spark, tmp_path, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    idx = Bm25Index(spark, str(tmp_path / "bm25p")).build_if_absent(
        tables["documents"], n_buckets=16
    )
    df = idx.search(["spark"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    b = Bm25Index.bucket_py("spark", 16)
    assert f"bucket#" in plan  # partition column present
    assert "PartitionFilters: [" in plan and str(b) in plan.split("PartitionFilters:")[1][:120]


def test_bm25_index_rebuilds_on_stale_fingerprint(spark, tmp_path):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    src = tmp_path / "corpus"
    spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(src))
    docs1 = spark.read.parquet(str(src))
    idx = Bm25Index(spark, str(tmp_path / "idx")).build_if_absent(docs1, n_buckets=4)
    assert idx.search(["alpha"], k=1).count() == 1

    import time

    time.sleep(0.05)
    spark.createDataFrame(
        [(0, "gamma delta"), (1, "gamma")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(src))
    docs2 = spark.read.parquet(str(src))
    idx = Bm25Index(spark, str(tmp_path / "idx")).build_if_absent(docs2, n_buckets=4)
    assert idx.search(["alpha"], k=5).count() == 0
    assert idx.search(["gamma"], k=5).count() == 2


def test_hybrid_search_indexed_end_to_end(spark, tmp_path, tables):
    """Both legs served from materialized indexes, fused with RRF."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import HashNgramEmbedder
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import (
        Bm25Index,
        hybrid_search_indexed,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex

    bm = Bm25Index(spark, str(tmp_path / "bm")).build_if_absent(
        tables["documents"], n_buckets=16
    )
    lsh = LshIndex(spark, str(tmp_path / "lsh")).build_if_absent(
        tables["embeddings"], dims=64, bits=4, tables=2,
        vector_col="embedding", id_col="vec_id",
    )
    qtext = "spark hash join scan"
    qvec = [float(x) for x in HashNgramEmbedder(dims=64).embed_numpy([qtext])[0]]
    out = hybrid_search_indexed(bm, lsh, qtext, qvec, k=10).collect()
    assert 0 < len(out) <= 10
    # rrf scores positive, sorted desc with id tiebreak
    keys = [(-r["rrf"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    for r in out:
        assert (r["kw_rank"] is not None) or (r["vec_rank"] is not None)


def test_entry_flagship_hybrid(spark):
    """Driver smoke-check twin: entry() returns >0 rows, stable schema."""
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    df = q.entry(spark)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert df.columns == ["doc_id", "rrf", "kw_rank", "vec_rank", "text", "lang", "source"]
    assert all(r["rrf"] > 0 for r in rows)


def test_bm25_index_incremental_add_equals_rebuild(spark, tmp_path, tables):
    """After add_documents, serving is IDENTICAL to a fresh build over the
    union corpus — df/dl/N/total_tokens are exact integers."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    docs = tables["documents"]
    base = docs.filter("doc_id < 300")
    extra = docs.filter("doc_id >= 300")

    inc = Bm25Index(spark, str(tmp_path / "inc")).build(base, n_buckets=8)
    inc.add_documents(extra)
    full = Bm25Index(spark, str(tmp_path / "full")).build(docs, n_buckets=8)

    got = {r["doc_id"]: r["bm25"] for r in inc.search(TERMS, k=20).collect()}
    want = {r["doc_id"]: r["bm25"] for r in full.search(TERMS, k=20).collect()}
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    # meta totals accumulated exactly
    assert inc.meta()["n_docs"] == full.meta()["n_docs"]
    assert inc.meta()["total_tokens"] == full.meta()["total_tokens"]


def test_bm25_index_add_rejects_wrong_key(spark, tmp_path, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    idx = Bm25Index(spark, str(tmp_path / "wk")).build(
        tables["documents"].limit(10), n_buckets=4
    )
    with pytest.raises(ValueError):
        idx.add_documents(tables["documents"].limit(5), id_col="other_id")


def test_tokenize_query_matches_index_tokenizer():
    """Query terms must come from the SAME rule as the corpus tokenizer —
    punctuation-bearing queries ('hash-join, scan.') must still hit
    postings instead of silently degrading the keyword leg to empty."""
    assert KW.tokenize_query("Hash-Join, scan.") == ["hash", "join", "scan"]
    assert KW.tokenize_query("  spark!!  ") == ["spark"]
    assert KW.tokenize_query("...") == []


def test_bm25_cte_sql_rejects_non_token_terms():
    with pytest.raises(ValueError):
        KW.bm25_cte_sql(["o'brien"])
    with pytest.raises(ValueError):
        KW.bm25_cte_sql(["hash-join"])
    # plain tokens pass
    assert "bm25_scored" in KW.bm25_cte_sql(["hash", "join"])


def test_hybrid_indexed_punctuated_query_hits_keyword_leg(spark, tmp_path, tables):
    """A punctuated query produces the same result as its clean form — the
    regression the whitespace tokenizer had."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import HashNgramEmbedder
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import (
        Bm25Index,
        hybrid_search_indexed,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex

    bm = Bm25Index(spark, str(tmp_path / "bmq")).build_if_absent(
        tables["documents"], n_buckets=16
    )
    lsh = LshIndex(spark, str(tmp_path / "lshq")).build_if_absent(
        tables["embeddings"], dims=64, bits=4, tables=2,
        vector_col="embedding", id_col="vec_id",
    )
    qvec = [float(x) for x in HashNgramEmbedder(dims=64).embed_numpy(["spark hash join scan"])[0]]
    clean = hybrid_search_indexed(bm, lsh, "spark hash join scan", qvec, k=10).collect()
    punct = hybrid_search_indexed(bm, lsh, "Spark: hash-join (scan)!", qvec, k=10).collect()
    assert [r.asDict() for r in clean] == [r.asDict() for r in punct]
    assert any(r["kw_rank"] is not None for r in clean)


def test_bm25_index_add_duplicate_raises_then_skip_noops(spark, tmp_path, tables):
    """Re-adding an indexed doc must NOT silently corrupt df/dl/N: default
    mode raises naming offenders; skip mode adds only genuinely-new ids and
    leaves serving identical to the correct union build."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    docs = tables["documents"]
    base = docs.filter("doc_id < 300")
    idx = Bm25Index(spark, str(tmp_path / "dup")).build(base, n_buckets=8)
    before = idx.meta()

    with pytest.raises(ValueError, match="already indexed"):
        idx.add_documents(docs.filter("doc_id < 5"))
    # failed guard left nothing behind
    assert idx.meta() == before
    got = {r["doc_id"]: r["bm25"] for r in idx.search(TERMS, k=20).collect()}

    # skip: overlap (0..299 indexed) + new (300..) -> equals fresh full build
    idx.add_documents(docs, on_duplicate="skip")
    full = Bm25Index(spark, str(tmp_path / "dupfull")).build(docs, n_buckets=8)
    got2 = {r["doc_id"]: r["bm25"] for r in idx.search(TERMS, k=20).collect()}
    want = {r["doc_id"]: r["bm25"] for r in full.search(TERMS, k=20).collect()}
    assert got2.keys() == want.keys()
    for d in want:
        assert got2[d] == pytest.approx(want[d], abs=1e-12)
    assert idx.meta()["n_docs"] == full.meta()["n_docs"]
    assert idx.meta()["total_tokens"] == full.meta()["total_tokens"]
    # pure-duplicate add is a no-op
    idx.add_documents(docs.filter("doc_id < 5"), on_duplicate="skip")
    assert idx.meta()["n_docs"] == full.meta()["n_docs"]


def test_bm25_index_remove_equals_fresh_build(spark, tmp_path, tables):
    """remove_documents == fresh build over the surviving corpus — the
    near-real-time delete twin of AddRemoveData.cs; df/dl/N all exact."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    docs = tables["documents"]
    removed_ids = [r["doc_id"] for r in docs.limit(7).collect()]
    idx = Bm25Index(spark, str(tmp_path / "rm")).build(docs, n_buckets=8)
    idx.remove_documents(removed_ids)

    survivors = docs.filter(~F.col("doc_id").isin(removed_ids))
    fresh = Bm25Index(spark, str(tmp_path / "rmfresh")).build(survivors, n_buckets=8)
    got = {r["doc_id"]: r["bm25"] for r in idx.search(TERMS, k=30).collect()}
    want = {r["doc_id"]: r["bm25"] for r in fresh.search(TERMS, k=30).collect()}
    assert got.keys() == want.keys()
    assert not (set(got) & set(removed_ids))
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    assert idx.meta()["n_docs"] == fresh.meta()["n_docs"]
    assert idx.meta()["total_tokens"] == fresh.meta()["total_tokens"]
    # removing unknown ids is a no-op
    idx.remove_documents([10**9])
    assert idx.meta()["n_docs"] == fresh.meta()["n_docs"]


def test_bm25_index_remove_all_docs_of_a_bucket(spark):
    """A term-bucket whose every posting is doomed must end up EMPTY (the
    dynamic-overwrite blind spot): searching the removed doc's unique term
    finds nothing."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.keyword_search import Bm25Index

    import tempfile

    docs = spark.createDataFrame(
        [(0, "zzzuniquez only here"), (1, "common words common")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        idx = Bm25Index(spark, d).build(docs, n_buckets=4)
        assert idx.search(["zzzuniquez"], k=5).count() == 1
        idx.remove_documents([0])
        assert idx.search(["zzzuniquez"], k=5).count() == 0
        assert idx.search(["common"], k=5).count() == 1
        assert idx.meta()["n_docs"] == 1

"""The IVF access-path rewrite for raw SQL (plans/sql_rewrite.py):
a plain `ORDER BY cosine_sim(...) DESC LIMIT k` query over an
IVF-indexed table gets the centroid partition IN-filter injected; the
same SQL without a registered index full-scans with identical
semantics."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report
from vector_search_ai_assistant_mongodbvcore_spark.plans.sql_rewrite import (
    VectorSqlSession,
)


def _qvec():
    return [float(x) for x in np.random.RandomState(7).randn(64)]


def _arr_sql(vec):
    return "array(" + ", ".join(f"{x}D" for x in vec) + ")"


@pytest.fixture()
def vsql(spark, tables, tmp_path):
    tables["embeddings"].createOrReplaceTempView("embeddings")
    IvfIndex(spark, str(tmp_path / "ivf")).build(
        tables["embeddings"], vector_col="embedding", num_lists=4, seed=42
    )
    vs = VectorSqlSession(spark)
    vs.register_index("embeddings", str(tmp_path / "ivf"), n_probe=2)
    return vs


def _topk_sql(vec, k=10):
    return (
        "SELECT vec_id, cosine_sim(embedding, "
        + _arr_sql(vec)
        + f") AS score FROM embeddings ORDER BY score DESC LIMIT {k}"
    )


def test_raw_sql_gets_partition_filter(vsql, tmp_path):
    df = vsql.sql(_topk_sql(_qvec()))
    raw = plan_report(df).raw
    assert "PartitionFilters" in raw and "centroid_id" in raw
    assert plan_report(df).take_ordered  # still the top-k physical shape


def test_rewritten_sql_matches_index_search(vsql, spark, tmp_path):
    q = _qvec()
    got = [(r["vec_id"], round(r["score"], 6)) for r in vsql.sql(_topk_sql(q)).collect()]
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    want = [
        (r["vec_id"], round(r["score"], 6))
        for r in idx.search(q, k=10, n_probe=2, id_col="vec_id").collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert got == want  # scores bit-comparable at 6 dp: same codegen expr


def test_other_alias_and_projection_order_also_match(vsql, spark, tmp_path):
    q = _qvec()
    sql = (
        "SELECT cosine_sim(embedding, "
        + _arr_sql(q)
        + ") AS sim, vec_id FROM embeddings ORDER BY sim DESC LIMIT 5"
    )
    got = [r["vec_id"] for r in vsql.sql(sql).collect()]
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    want = [r["vec_id"] for r in idx.search(q, k=5, n_probe=2, id_col="vec_id").collect()]
    assert got == want


def test_unregistered_table_passes_through(spark, tables):
    tables["embeddings"].createOrReplaceTempView("embeddings")
    vs = VectorSqlSession(spark)  # nothing registered
    df = vs.sql(_topk_sql(_qvec()))
    raw = plan_report(df).raw
    assert "PartitionFilters" not in raw  # full scan
    assert df.count() == 10


def test_full_probe_rewrite_equals_unpruned_scan(spark, tables, tmp_path):
    """n_probe = num_lists: the pruned path must equal the full scan
    exactly — pruning is an IO optimization, never a semantics change."""
    tables["embeddings"].createOrReplaceTempView("embeddings")
    IvfIndex(spark, str(tmp_path / "ivf_all")).build(
        tables["embeddings"], vector_col="embedding", num_lists=4, seed=42
    )
    vs = VectorSqlSession(spark)
    q = _qvec()
    plain = [r["vec_id"] for r in vs.sql(_topk_sql(q)).collect()]
    vs.register_index("embeddings", str(tmp_path / "ivf_all"), n_probe=4)
    routed = [r["vec_id"] for r in vs.sql(_topk_sql(q)).collect()]
    assert routed == plain


def test_non_topk_shapes_pass_through(vsql):
    # no LIMIT, ASC ordering, non-cosine order key: all full-scan SQL
    for sql in (
        "SELECT count(*) AS n FROM embeddings",
        "SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 3",
    ):
        assert vsql.sql(sql).count() > 0


def test_cte_and_multi_cosine_queries_pass_through(vsql):
    """The rule binds textually to FROM/cosine_sim, so any shape with
    more than one of either is ambiguous and must NOT be rewritten —
    a CTE's full-table aggregate must never be centroid-pruned, and a
    two-projection query must never probe with the wrong vector."""
    q = _qvec()
    total = vsql.sql("SELECT count(*) AS n FROM embeddings").collect()[0]["n"]
    cte = (
        "WITH t AS (SELECT count(*) AS n FROM embeddings) "
        "SELECT e.vec_id, t.n, cosine_sim(e.embedding, "
        + _arr_sql(q)
        + ") AS score FROM embeddings e CROSS JOIN t ORDER BY score DESC LIMIT 3"
    )
    rows = vsql.sql(cte).collect()
    assert all(r["n"] == total for r in rows)  # CTE count NOT pruned
    raw = plan_report(vsql.sql(cte)).raw
    assert "PartitionFilters" not in raw

    q2 = [float(x) for x in np.random.RandomState(9).randn(64)]
    two = (
        "SELECT vec_id, cosine_sim(embedding, " + _arr_sql(q2) + ") AS s1, "
        "cosine_sim(embedding, " + _arr_sql(q) + ") AS score "
        "FROM embeddings ORDER BY score DESC LIMIT 3"
    )
    assert "PartitionFilters" not in plan_report(vsql.sql(two)).raw


def test_concurrent_sql_calls_do_not_share_views(vsql, spark, tmp_path):
    """Each .sql() call prunes through its own uniquely-named view: a
    second call with a different query vector must not disturb the
    first call's (already-analyzed) plan or results."""
    qa = _qvec()
    qb = [float(x) for x in np.random.RandomState(11).randn(64)]
    df_a = vsql.sql(_topk_sql(qa, k=5))
    df_b = vsql.sql(_topk_sql(qb, k=5))  # would clobber a shared view
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    want_a = [r["vec_id"] for r in idx.search(qa, k=5, n_probe=2, id_col="vec_id").collect()]
    want_b = [r["vec_id"] for r in idx.search(qb, k=5, n_probe=2, id_col="vec_id").collect()]
    assert [r["vec_id"] for r in df_a.collect()] == want_a
    assert [r["vec_id"] for r in df_b.collect()] == want_b


def test_aggregate_and_window_shapes_pass_through(vsql):
    """ADVICE r9 (medium): a GROUP BY / DISTINCT / OVER query that
    happens to ORDER BY a cosine_sim-derived alias DESC LIMIT k passes
    every textual top-k check, but pruning it would compute count()/max()
    over only the probed partitions and silently DROP groups outside the
    probes — wrong data, not a top-k approximation. All such shapes must
    pass through unrewritten and agree with the full scan."""
    q = _qvec()
    agg = (
        "SELECT label, count(*) AS n, max(cosine_sim(embedding, "
        + _arr_sql(q)
        + ")) AS score FROM embeddings GROUP BY label "
        "ORDER BY score DESC LIMIT 10"
    )
    raw = plan_report(vsql.sql(agg)).raw
    assert "PartitionFilters" not in raw  # NOT pruned
    # group counts equal the true full-scan counts
    truth = {
        r["label"]: r["n"]
        for r in vsql.spark.sql(
            "SELECT label, count(*) AS n FROM embeddings GROUP BY label"
        ).collect()
    }
    got = {r["label"]: r["n"] for r in vsql.sql(agg).collect()}
    assert all(truth[s] == n for s, n in got.items())

    distinct = (
        "SELECT DISTINCT vec_id, cosine_sim(embedding, "
        + _arr_sql(q)
        + ") AS score FROM embeddings ORDER BY score DESC LIMIT 5"
    )
    assert "PartitionFilters" not in plan_report(vsql.sql(distinct)).raw

    windowed = (
        "SELECT vec_id, count(*) OVER () AS total, cosine_sim(embedding, "
        + _arr_sql(q)
        + ") AS score FROM embeddings ORDER BY score DESC LIMIT 5"
    )
    wdf = vsql.sql(windowed)
    assert "PartitionFilters" not in plan_report(wdf).raw
    n_all = vsql.spark.sql("SELECT count(*) AS n FROM embeddings").collect()[0]["n"]
    assert all(r["total"] == n_all for r in wdf.collect())

"""Queries retired from the fixed-slot driver registry (51 slots as of r10) stay exercised here.

Each retirement freed a slot for a new oracle-paired operator; the retired
shape's correctness is still covered — transitively by a surviving oracle
where noted, and directly against DuckDB on the test fixture here.
"""

from __future__ import annotations

import duckdb

from vector_search_ai_assistant_mongodbvcore_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("events", "documents", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_events_hourly_rollup_matches_duckdb(spark):
    """Retired r7 (slot -> training_shards); oracle was identical SQL to
    windowed_event_counts, still hash-gated there."""
    got = {
        (r.hour.isoformat(), r.event_type): (r.n, round(r.total_value, 2))
        for r in Q.events_hourly_rollup(spark, SF).collect()
    }
    want = {
        (h.isoformat(), et): (n, round(tv, 2))
        for h, et, n, tv in _duck(
            """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
                      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
               FROM events GROUP BY 1, 2"""
        )
    }
    assert got == want


def test_key_lookup_matches_duckdb_and_pushes_filter(spark):
    """Retired r7 (slot -> contamination_sources); equality-pushed-filter
    shape subsumed by events_conjunctive_filter + latest_order_lookup."""
    df = Q.key_lookup(spark, SF)
    got = [tuple(r) for r in df.collect()]
    want = [
        (eid, ts, u, et, v)
        for eid, ts, u, et, v in _duck(
            "SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id = 4242"
        )
    ]
    assert [(g[0], g[2], g[3]) for g in got] == [(w[0], w[2], w[3]) for w in want]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_id), EqualTo(event_id,4242)]" in plan


def test_simhash_fingerprints_match_duckdb(spark):
    """Retired r7 (slot -> duplicated_ngram_stats); fingerprint shape still
    gated by rolling_fingerprints, bit recurrence pinned here against the
    former registry oracle SQL."""
    got = {r.doc_id: r.simhash for r in Q.simhash_fingerprints(spark, SF).collect()}
    want = dict(_duck(Q.SIMHASH_SQL))
    assert got == want


def _duck_orders(sql: str):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "nation", "region", "supplier", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_top_orders_by_price_matches_duckdb(spark):
    """Retired r7 (slot -> vocab_top_terms); top-k-under-total-order stays
    hash-gated by ann_topk/bm25_topk/vocab_top_terms."""
    got = [tuple(r) for r in Q.top_orders_by_price(spark, SF).collect()]
    want = _duck_orders(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    )
    assert got == want


def test_customer_order_stats_matches_duckdb(spark):
    """Retired r7 (slot -> domain_audit); join+agg+countDistinct stays
    hash-gated by domain_audit and vocab_top_terms."""
    got = {r[0]: tuple(r[1:]) for r in Q.customer_order_stats(spark, SF).collect()}
    want = {
        seg: (n, nc, tp)
        for seg, n, nc, tp in _duck_orders(
            """SELECT c_mktsegment, COUNT(*) AS n_orders,
                      COUNT(DISTINCT o_custkey) AS n_customers,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
               FROM customer JOIN orders ON c_custkey = o_custkey
               GROUP BY c_mktsegment"""
        )
    }
    assert got == want


def test_order_priority_rollup_matches_duckdb(spark):
    """Retired r7 (slot -> dsir_importance_weights); rollup grouping sets."""
    got = sorted(
        (tuple(r) for r in Q.order_priority_rollup(spark, SF).collect()),
        key=lambda t: tuple(map(str, t)),
    )
    want = sorted(
        (
            tuple(row)
            for row in _duck_orders(
                """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
                          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
                   FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""
            )
        ),
        key=lambda t: tuple(map(str, t)),
    )
    assert got == want


def test_purchase_ranks_per_user_matches_duckdb(spark):
    """Retired r7 (slot -> source_capped_sample, itself a partitioned
    row_number rank window)."""
    got = sorted(tuple(r) for r in Q.purchase_ranks_per_user(spark, SF).collect())
    want = sorted(
        tuple(row)
        for row in _duck_orders(
            """SELECT user_id, event_id, rnk, tile FROM (
                 SELECT user_id, event_id,
                        dense_rank() OVER w AS rnk, ntile(4) OVER w AS tile
                 FROM events WHERE event_type = 'purchase'
                 WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
               ) WHERE rnk <= 5"""
        )
    )
    assert got == want


def test_customers_without_big_orders_matches_duckdb(spark):
    """Retired r7 (slot -> semantic_contamination); NOT EXISTS anti-join."""
    got = sorted(tuple(r) for r in Q.customers_without_big_orders(spark, SF).collect())
    want = sorted(
        tuple(row)
        for row in _duck_orders(
            """SELECT c_custkey, c_mktsegment FROM customer
               WHERE NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey AND o_totalprice > 400000)"""
        )
    )
    assert got == want


def test_regional_revenue_matches_duckdb(spark):
    """Retired r7 (slot -> bpe_merge_ranking); TPC-H Q5 broadcast star join."""
    got = {r[0]: r[1] for r in Q.regional_revenue(spark, SF).collect()}
    want = {
        n: rev
        for n, rev in _duck_orders(
            """SELECT n_name,
                      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate < TIMESTAMP '1998-01-01'
               GROUP BY n_name"""
        )
    }
    assert got == want


def test_duplicated_ngram_stats_matches_duckdb(spark):
    """Retired r8 (slot -> remove_duplicated_spans, its APPLY form with
    the same three-linear-shuffle shape); the scoring form's full oracle
    SQL stays pinned here."""
    got = {
        r.doc_id: (r.n_positions, r.dup_positions, round(r.dup_fraction, 9))
        for r in Q.duplicated_ngram_stats_q(spark, SF).collect()
    }
    want = {
        d: (np, dp, round(fr, 9))
        for d, np, dp, fr in _duck(Q.DUPLICATED_NGRAM_STATS_SQL)
    }
    assert got == want


def test_scalar_function_suite_matches_duckdb(spark):
    """Retired r9 (slot -> cleaned_corpus); every scalar shape remains
    oracle-covered elsewhere (regexp_replace in cleaned_corpus/text_stats,
    substring/length in document_chunks, replace/case in domain_audit) —
    the five-column suite itself stays DuckDB-gated here."""
    got = [
        tuple(r)
        for r in Q.scalar_function_suite(spark, SF).orderBy("doc_id").collect()
    ]
    want = [
        tuple(w)
        for w in _duck(
            """SELECT doc_id,
                      substr(text, 1, 20),
                      regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'),
                      upper(lang),
                      length(text),
                      replace(source, 'src', 'source-')
               FROM documents ORDER BY doc_id"""
        )
    ]
    assert got == want


def test_latest_events_per_user_matches_duckdb(spark):
    """Retired r14 (slot -> distinct_cardinality_kmv); the ranked-window
    shape stays hash-gated by latest_order_lookup + source_capped_sample
    + conversation_window_events."""
    got = sorted(tuple(r) for r in Q.latest_events_per_user(spark, SF).collect())
    want = sorted(
        _duck(
            """SELECT event_id, user_id, CAST(rn AS BIGINT) AS rn FROM (
                 SELECT event_id, user_id,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events) WHERE rn <= 3"""
        )
    )
    assert [(g[0], g[1], int(g[2])) for g in got] == [
        (w[0], w[1], int(w[2])) for w in want
    ]


def test_sessionization_matches_duckdb(spark):
    """Retired r14 (slot -> data_quality_report); the lag-window shape
    stays hash-gated by running_value_per_user, the session semantics by
    tests/test_session_windows.py stream==batch."""
    got = sorted(tuple(r) for r in Q.sessionization(spark, SF).collect())
    want = sorted(
        _duck(
            """SELECT user_id,
                      CAST(1 + SUM(CASE WHEN prev IS NOT NULL
                                         AND epoch_us(ts) - epoch_us(prev) > 1800000000
                                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
               FROM (SELECT user_id, ts,
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                     FROM events)
               GROUP BY user_id"""
        )
    )
    assert got == [tuple(w) for w in want]


def _duck_with_embeddings(sql: str):
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_ivf_search_all_probes_matches_duckdb(spark):
    """Slot stays recorded (r15 restored it alongside the batched
    ivf_search_many, whose query 0 is this very vector); all-probe IVF
    == brute force, so the plain top-10 SQL is a true oracle for the
    single-query build+search path — belt-and-braces parity here too."""
    got = [(r["vec_id"], r["score"]) for r in Q.ivf_search_all_probes(spark, SF).collect()]
    cos = Q._cos_sql(Q._vec_sql(Q._QV_IVF))
    want = _duck_with_embeddings(
        f"""SELECT vec_id, round({cos}, 4) AS score FROM embeddings
            ORDER BY round({cos}, 4) DESC, vec_id LIMIT 10"""
    )
    assert got == [tuple(w) for w in want]


def test_bm25_topk_matches_duckdb(spark):
    """Slot stays recorded (r15 restored it alongside the batched
    bm25_search_many, whose query 0 is this very term set); the
    single-query INDEX serve stays hash-gated inside
    hybrid_search_indexed's keyword leg — belt-and-braces parity here."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators import keyword_search as KW

    got = [(r["doc_id"], r["bm25"]) for r in Q.bm25_topk(spark, SF).collect()]
    want = _duck_with_embeddings(
        f"""WITH {KW.bm25_cte_sql(Q._BM25_TERMS)}
            SELECT doc_id, round(bm25, 4) AS bm25 FROM bm25_scored
            ORDER BY round(bm25, 4) DESC, doc_id LIMIT 10"""
    )
    assert got == [tuple(w) for w in want]

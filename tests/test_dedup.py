"""Dedup family: exact groups, MinHash/LSH invariants, SimHash, exact
Jaccard vs itertools oracle, pair_structs building block."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import dedup as DD

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "The  Quick Brown   Fox jumps over the lazy dog"),  # ws/case variant
    (4, "the quick brown fox jumps over the sleepy dog"),  # near dup
    (5, "completely different content about databases and queries"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    out = {r.fingerprint: (r.keep_id, r.dup_count) for r in DD.exact_dedup(docs).collect()}
    # 1, 2, 3 normalize identically (lowercase + whitespace collapse)
    assert sorted(v for v in out.values()) == [(1, 3), (4, 1), (5, 1)]


def test_pair_structs_matches_itertools(spark):
    ids = [3, 1, 4, 1, 5]  # duplicates allowed
    df = spark.createDataFrame([(sorted(ids),)], "ids array<int>")
    got = [
        (r.p.id_a, r.p.id_b)
        for r in df.select(F.explode(DD.pair_structs(F.col("ids"))).alias("p")).collect()
    ]
    assert got == list(combinations(sorted(ids), 2))


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sigs = {r.doc_id: r.signature for r in DD.minhash_signatures(docs, num_hashes=16).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert len(sigs[1]) == 16
    assert sigs[1] != sigs[5]


def test_minhash_band_pairs_finds_duplicate_cluster(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4).collect()}
    # identical signatures ALWAYS share every band
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    # the unrelated doc never pairs
    assert not any(5 in p for p in pairs)


def test_simhash_properties(spark, docs):
    fps = {r.doc_id: r.simhash for r in DD.simhash(docs, bits=16).collect()}
    assert fps[1] == fps[2] == fps[3]  # same token multiset
    assert 0 <= fps[1] < (1 << 16)
    assert bin(fps[1] ^ fps[4]).count("1") <= bin(fps[1] ^ fps[5]).count("1")
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    assert DD.simhash(empty, bits=16).first().simhash == 0


def _jaccard_oracle(n=3, df_cut=None):
    """Plain-Python Jaccard over distinct word n-gram shingles."""
    def sh(text):
        w = text.lower().split()
        if len(w) <= n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    shingle_sets = {i: sh(t) for i, t in DOCS}
    if df_cut is not None:
        from collections import Counter

        freq = Counter(g for s in shingle_sets.values() for g in s)
        shingle_sets = {i: {g for g in s if freq[g] <= df_cut} for i, s in shingle_sets.items()}
    out = {}
    for a, b in combinations(sorted(shingle_sets), 2):
        sa, sb = shingle_sets[a], shingle_sets[b]
        if sa | sb:
            out[(a, b)] = len(sa & sb) / len(sa | sb)
    return out


@pytest.mark.parametrize("df_cut", [None, 2])
def test_ngram_jaccard_matches_python_oracle(spark, docs, df_cut):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(docs, n=3, threshold=0.1, df_cut=df_cut).collect()
    }
    expect = {k: v for k, v in _jaccard_oracle(3, df_cut).items() if v >= 0.1}
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k])


def test_drop_exact_duplicates_keeps_min_id(spark, docs):
    out = DD.drop_exact_duplicates(docs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 4, 5]  # 2,3 dup 1


def test_drop_near_duplicates_greedy_chain(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(1, 5)], "doc_id long, text string")
    # chain a~b, b~c plus isolated pair c~d: greedy drops every id_b
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in DD.drop_near_duplicates(df, pairs).collect())
    assert kept == [1]  # documented over-removal along chains


def test_capped_bucket_pairs_routes_hot_buckets_identically(spark):
    """A pathological all-identical corpus puts every doc in ONE band bucket.
    With max_bucket far below the corpus size, the hot bucket routes through
    the equi-join path — the pair SET must be identical to the posting-list
    path, and equal to all C(n,2) pairs."""
    n = 40
    df = spark.createDataFrame(
        [(i, "identical text repeated for every single document") for i in range(n)],
        "doc_id long, text string",
    )
    capped = {
        (r.id_a, r.id_b)
        for r in DD.minhash_lsh_pairs(df, num_hashes=16, bands=4, max_bucket=5).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in DD.minhash_lsh_pairs(df, num_hashes=16, bands=4, max_bucket=10_000).collect()
    }
    expect = {(a, b) for a in range(n) for b in range(a + 1, n)}
    assert capped == uncapped == expect


def test_ngram_checkpoint_leaves_no_persistent_rdds(spark, docs, tmp_path):
    """checkpoint_dir materializes the inverted index as parquet: results
    match the in-memory persist path and NOTHING stays cached on the
    executors after the action (the round-2 persist leak)."""
    via_ckpt = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, n=3, threshold=0.1, checkpoint_dir=str(tmp_path / "inv")
        ).collect()
    }
    via_persist_df = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.1, persist_index=True)
    via_persist = {(r.id_a, r.id_b): r.jaccard for r in via_persist_df.collect()}
    assert via_ckpt == via_persist
    # the checkpoint path must leave zero persistent RDDs; the explicit
    # persist path leaves exactly the caller-owned one (cleared here)
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    assert {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, n=3, threshold=0.1, checkpoint_dir=str(tmp_path / "inv2")
        ).collect()
    } == via_ckpt
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def _py_components(pairs):
    """Union-find oracle: node -> min reachable id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_neardup_components_matches_union_find(spark):
    """Min-label propagation must equal a union-find oracle on a graph with
    a long chain, a clique, a star, and an isolated pair."""
    edges = (
        [(i, i + 1) for i in range(1, 8)]            # chain 1..8
        + [(a, b) for a in (20, 21, 22) for b in (21, 22, 23) if a < b]  # clique
        + [(30, 31), (30, 32), (30, 33)]             # star
        + [(40, 41)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.comp for r in DD.neardup_components(pairs).collect()}
    assert got == _py_components(edges)


def test_neardup_components_disk_checkpoint_matches(spark, tmp_path):
    """checkpoint_dir= (the 100 TB mode: parquet round-trip instead of
    memory-pinned localCheckpoint — the r10 scale probe OOM'd the heap
    pinning a 3x10^8-edge graph) yields IDENTICAL components, including
    the multi-round chain that exercises the ping-pong label files."""
    edges = (
        [(i, i + 1) for i in range(1, 8)]
        + [(a, b) for a in (20, 21, 22) for b in (21, 22, 23) if a < b]
        + [(40, 41)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.comp
        for r in DD.neardup_components(
            pairs, checkpoint_dir=str(tmp_path / "cc")
        ).collect()
    }
    assert got == _py_components(edges)


def test_neardup_components_raises_on_max_iter(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 30)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.neardup_components(pairs, max_iter=2)


def test_drop_component_duplicates_keeps_one_per_cluster(spark):
    """Cluster-exact apply: the a~b, b~c chain keeps a (component min) —
    where the greedy policy over-removes to [1] on the same graph, CC
    keeps one representative per component."""
    df = spark.createDataFrame([(i, f"d{i}") for i in range(1, 7)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in DD.drop_component_duplicates(df, pairs).collect())
    assert kept == [1, 4, 6]  # 6 is in no pair and survives untouched


def test_duplicated_ngram_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared boiler plate text here plus unique tail alpha"),
            (2, "shared boiler plate text here plus unique tail beta"),
            (3, "completely different words nothing in common at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in DD.duplicated_ngram_stats(docs, n=3).collect()}
    # 9 words -> 7 trigram positions; docs 1/2 share trigrams from the
    # 8-word common prefix: trigrams at positions 0..5 identical, position
    # 6 differs ("unique tail alpha" vs "unique tail beta")
    assert out[1].n_positions == 7 and out[1].dup_positions == 6
    assert out[2].dup_positions == 6
    assert out[3].dup_positions == 0 and out[3].dup_fraction == 0.0
    assert out[1].dup_fraction == pytest.approx(6 / 7)


def test_duplicated_ngram_stats_python_oracle(spark, tables):
    docs = tables["documents"].limit(50)
    n = 4
    rows = docs.select("doc_id", "text").collect()
    def ngrams(text):
        w = text.lower().strip().split()
        if not text.strip():
            return [""]
        if len(w) <= n:
            return [" ".join(w)]
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    by_doc = {r.doc_id: ngrams(r.text) for r in rows if r.text is not None}
    owners = {}
    for d, ngs in by_doc.items():
        for g in set(ngs):
            owners.setdefault(g, set()).add(d)
    got = {r.doc_id: (r.n_positions, r.dup_positions) for r in
           DD.duplicated_ngram_stats(docs, n=n).collect()}
    for d, ngs in by_doc.items():
        exp_dup = sum(1 for g in ngs if len(owners[g]) > 1)
        assert got[d] == (len(ngs), exp_dup), d


def test_duplicated_ngram_stats_within_doc_repeat_not_cross(spark):
    # a shingle repeated INSIDE one doc but found nowhere else is not dup
    docs = spark.createDataFrame(
        [(1, "la la la la la la"), (2, "other words entirely here now")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in DD.duplicated_ngram_stats(docs, n=3).collect()}
    assert out[1].dup_positions == 0


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL (r7): the APPLY form of duplicated_ngram_stats
# ---------------------------------------------------------------------------


def _py_remove_spans(docs, n):
    """Python oracle: first corpus occurrence of each word n-gram (by
    (id, pos)) survives; every other occurrence blanks its n-word span."""
    occs = {}
    shingled = {}
    for d, t in sorted(docs):
        ws = t.lower().split()
        k = len(ws)
        if k <= n:
            poss = [0] if t.strip() or True else []
            grams = {0: " ".join(ws)}
        else:
            grams = {p: " ".join(ws[p : p + n]) for p in range(k - n + 1)}
        shingled[d] = grams
        for p in sorted(grams):
            occs.setdefault(grams[p], []).append((d, p))
    out = {}
    for d, t in docs:
        ws = t.split()
        cov = set()
        for p, g in shingled[d].items():
            if occs[g][0] != (d, p):
                cov |= set(range(p, p + n))
        kept = [w for i, w in enumerate(ws) if i not in cov]
        out[d] = (" ".join(kept), len(ws), len(cov & set(range(len(ws)))))
    return out


def test_remove_duplicated_spans_hand_computed(spark):
    docs = [
        (1, "Alpha beta gamma delta epsilon"),   # first occurrence of the run
        (2, "zeta alpha beta gamma delta tail"), # shares the 3-gram run
        (3, "totally unrelated words here now"),
        (4, "alpha beta gamma delta epsilon"),   # exact lowered dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_words, r.n_removed)
        for r in DD.remove_duplicated_spans(df, n=3).collect()
    }
    want = _py_remove_spans(docs, 3)
    assert got == want
    # the first occurrence survives untouched; the exact dup is emptied
    assert got[1][0] == "Alpha beta gamma delta epsilon"
    assert got[4][0] == ""
    # doc 2 keeps its unique prefix/suffix, loses the shared middle
    assert got[2][0] == "zeta tail"


def test_remove_duplicated_spans_conservation_and_nulls(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(200)
    out = DD.remove_duplicated_spans(docs, n=8).collect()
    assert len(out) == docs.count()
    for r in out:
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert kept + r.n_removed == r.n_words, r.doc_id
    # NULL text passes through
    nul = spark.createDataFrame([(99, None)], "doc_id long, text string")
    r = DD.remove_duplicated_spans(nul, n=3).collect()[0]
    assert r.clean_text is None and r.n_words == 0 and r.n_removed == 0


def test_remove_duplicated_spans_every_ngram_keeps_one_copy(spark):
    """Global property: after removal, for every n-gram that was duplicated,
    its first occurrence's words are still present somewhere (unless a
    different duplicated n-gram covered them)."""
    docs = [
        (1, "one two three four five"),
        (2, "one two three four five"),
        (3, "one two three four five"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.clean_text for r in DD.remove_duplicated_spans(df, n=3).collect()}
    assert got[1] == "one two three four five"
    assert got[2] == "" and got[3] == ""


def test_remove_duplicated_spans_plan_linear(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    rep = plan_report(
        DD.remove_duplicated_spans(tables["documents"].select("doc_id", "text"), n=8)
    )
    assert rep.python_evals == 0
    assert "CartesianProduct" not in rep.raw
    assert "BroadcastNestedLoopJoin" not in rep.raw


def test_remove_spans_bounded_form_matches_array_form(spark):
    """bounded=True (word-granular anti-join; nothing larger than the doc
    itself) must produce the identical frame as the default array form,
    including NULL/empty/whitespace docs and fully-covered docs."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    rep = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, rep + " tail one"),
        (1, rep + " tail two"),          # shares the 6-gram with 0
        (2, rep),                        # fully covered duplicate
        (3, "unique words entirely here and now"),
        (4, None),
        (5, ""),
        (6, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
        for r in remove_duplicated_spans(df, n=3).collect()
    }
    b = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
        for r in remove_duplicated_spans(df, n=3, bounded=True).collect()
    }
    assert a == b
    assert b[2][0] == "" and b[2][2] == b[2][1]  # fully covered
    assert b[4] == (None, 0, 0)

    # and on the real fixture table
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fa = remove_duplicated_spans(docs, n=8).orderBy("doc_id").collect()
    fb = remove_duplicated_spans(docs, n=8, bounded=True).orderBy("doc_id").collect()
    assert [tuple(r) for r in fa] == [tuple(r) for r in fb]

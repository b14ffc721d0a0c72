"""EmulatedObjectDataPlane contract (sources/dataplane.py): the commit
protocol survives object-store data-plane semantics — non-atomic
per-object publish (a writer can die half way through), per-object
deletes, lagging LIST — with committed data untouched and debris
reclaimed by the normal horizon/TTL mechanisms. Complements the
parameterized end-to-end runs in test_concurrency.py /
test_crash_recovery.py with direct fault-injection at the plane."""

from __future__ import annotations

import os
import time

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.sources import managed_table as mt
from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
    EmulatedObjectDataPlane,
    LocalDataPlane,
)
from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
    BucketedTable,
    ConditionalPutCommitter,
    ManagedTable,
    MemoryConditionalStore,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, val STRING")


def _universe(plane=None):
    return ConditionalPutCommitter(
        MemoryConditionalStore(), plane if plane is not None else EmulatedObjectDataPlane()
    )


class _DieAfter:
    """Fault hook: raise on the Nth matching operation."""

    def __init__(self, op: str, n: int):
        self.op, self.n, self.seen = op, n, 0

    def __call__(self, op: str, path: str) -> None:
        if op == self.op:
            self.seen += 1
            if self.seen > self.n:
                raise OSError(f"injected {op} fault at {path}")


def test_publish_moves_whole_tree_without_rename(spark, tmp_path):
    """A bucketed layout (nested partition dirs) publishes byte-identical
    through per-object copy+delete."""
    t = BucketedTable(
        spark, str(tmp_path / "bt"), bucket_by=["id"], n_buckets=4,
        committer=_universe(),
    )
    t.overwrite(_df(spark, [(i, f"v{i}") for i in range(20)]))
    t.merge(_df(spark, [(3, "updated"), (100, "new")]))
    rows = {(r["id"], r["val"]) for r in t.read().collect()}
    assert (3, "updated") in rows and (100, "new") in rows and len(rows) == 21
    # no staging debris
    assert not [n for n in os.listdir(t.path) if n.startswith("_staging_")]


def test_writer_dying_mid_publish_leaves_committed_data_intact(spark, tmp_path):
    """Crash between object copies: partial final + staging debris, both
    invisible to readers and reclaimed later; committed version unharmed."""
    path = str(tmp_path / "t")
    store = MemoryConditionalStore()
    good = ManagedTable(
        spark, path, committer=ConditionalPutCommitter(store, EmulatedObjectDataPlane())
    )
    good.overwrite(_df(spark, [(1, "committed")]))
    v0 = good.current_version()

    dying_plane = EmulatedObjectDataPlane(fault_hook=_DieAfter("copy", 0))
    dying = ManagedTable(
        spark, path, committer=ConditionalPutCommitter(store, dying_plane)
    )
    with pytest.raises(OSError, match="injected copy fault"):
        # bypass the public retry loop: one raw commit attempt, like a
        # process that died (the retry would just re-fault anyway)
        dying._commit(_df(spark, [(2, "doomed")]), "append", expected=v0)
    # committed table untouched, still readable, version unchanged
    assert {r["val"] for r in good.read().collect()} == {"committed"}
    assert good.current_version() == v0
    # the dying writer's debris is attempt-unique and unreferenced:
    # later commits proceed and the horizon reclaims v-numbered orphans
    for i in range(4):
        good.append(_df(spark, [(10 + i, "later")]))
    assert {r["id"] for r in good.read().collect()} == {1, 10, 11, 12, 13}
    leftovers = [
        n for n in os.listdir(path)
        if n.startswith("v_") and mt._parse_versioned_name(n, "v_") <= good.current_version() - 2
    ]
    assert leftovers == [], leftovers


def test_vacuum_faults_never_break_commits(spark, tmp_path):
    """A delete fault during post-swap vacuum must not surface (the swap
    already made the commit durable); the faulted objects SURVIVE as
    debris (the emulation must not let an ignore_errors rmtree delete
    what the injected DELETE 'failed' to — r13 review finding) and the
    next clean pass reclaims them."""
    path = str(tmp_path / "t")
    plane = EmulatedObjectDataPlane(fault_hook=_DieAfter("delete", 2))
    t = ManagedTable(spark, path, committer=_universe(plane))
    for i in range(5):
        t.append(_df(spark, [(i, "x")]))  # post-commit vacuums hit faults
    assert t.read().count() == 5

    def stale_files():
        out = []
        for n in os.listdir(path):
            v = mt._parse_versioned_name(n, "v_")
            if v is not None and v <= t.current_version() - 2:
                full = os.path.join(path, n)
                if not os.path.isdir(full) or any(os.scandir(full)):
                    out.append(n)
        return out

    # the injected faults left REAL debris behind (files, not just husks)
    assert stale_files(), "delete faults left no debris — injection neutralized"
    plane.fault_hook = None  # faults clear; next commit's vacuum reclaims
    t.append(_df(spark, [(99, "x")]))
    assert stale_files() == []


def test_lagging_list_only_delays_reclamation(spark, tmp_path, monkeypatch):
    """With list_lag=True every listing is one snapshot behind: vacuum
    and staging sweep still converge one pass later, and no committed
    artifact is ever deleted."""
    monkeypatch.setattr(mt, "_STAGING_TTL_SEC", 0.0)
    path = str(tmp_path / "t")
    plane = EmulatedObjectDataPlane(list_lag=True)
    t = ManagedTable(spark, path, committer=_universe(plane))
    t.overwrite(_df(spark, [(1, "a")]))
    # plant crashed-writer staging debris
    staging = os.path.join(path, "_staging_deadbeef0000")
    os.makedirs(staging)
    with open(os.path.join(staging, "junk"), "w") as f:
        f.write("crashed")
    old = time.time() - 10
    os.utime(os.path.join(staging, "junk"), (old, old))
    os.utime(staging, (old, old))
    for i in range(4):  # each commit: vacuum + sweep on lagging listings
        t.append(_df(spark, [(10 + i, "b")]))
    assert not os.path.exists(staging)  # reclaimed despite the lag
    assert t.read().count() == 5  # every commit intact


def test_atomic_put_never_exposes_partial_object(tmp_path):
    d = str(tmp_path)
    plane = EmulatedObjectDataPlane()
    p = os.path.join(d, "obj.json")
    plane.write_text(p, "x" * 100)
    assert plane.read_text(p) == "x" * 100
    # the tmp name of the in-flight put is never visible afterward
    assert [n for n in os.listdir(d) if n.startswith("obj.json.tmp_")] == []


def test_explicit_table_plane_overrides_committer_plane(spark, tmp_path):
    """Resolution order: explicit dataplane= wins over the committer's."""
    sentinel = LocalDataPlane()
    t = ManagedTable(
        spark, str(tmp_path / "t"), committer=_universe(), dataplane=sentinel
    )
    assert t.plane is sentinel
    t2 = ManagedTable(spark, str(tmp_path / "t2"), committer=_universe())
    assert isinstance(t2.plane, EmulatedObjectDataPlane)


def test_bucketed_commit_survives_lagging_list(spark, tmp_path):
    """The r13 review's data-loss scenario: under list_lag=True the
    commit path's staging discovery must STILL see every just-written
    bucket (list_names_fresh is read-own-writes by contract) — a stale
    listing here would commit a manifest missing buckets."""
    t = BucketedTable(
        spark, str(tmp_path / "bt"), bucket_by=["id"], n_buckets=4,
        committer=_universe(EmulatedObjectDataPlane(list_lag=True)),
    )
    t.overwrite(_df(spark, [(i, f"v{i}") for i in range(40)]))
    assert t.read().count() == 40  # every bucket present in the manifest
    t.merge(_df(spark, [(1, "updated"), (100, "new")]))
    rows = {(r["id"], r["val"]) for r in t.read().collect()}
    assert (1, "updated") in rows and (100, "new") in rows and len(rows) == 41


def test_write_text_crash_tmp_is_sweepable(tmp_path, monkeypatch):
    """A writer dying between the tmp write and the replace leaves a
    _staging_-named artifact the TTL sweep reclaims — not a forever-leak
    (r13 review finding on the old <name>.tmp_<hex> naming)."""
    import time as _time

    d = str(tmp_path)
    plane = EmulatedObjectDataPlane()
    orig_replace = os.replace
    monkeypatch.setattr(os, "replace", lambda *a: (_ for _ in ()).throw(OSError("died")))
    with pytest.raises(OSError):
        plane.write_text(os.path.join(d, "filestats_3_uab.json"), "{}")
    monkeypatch.setattr(os, "replace", orig_replace)
    debris = [n for n in os.listdir(d) if n.startswith("_staging_")]
    assert debris, "crash tmp is not a _staging_ artifact"
    # age it past the TTL and run the sweep — gone
    old = _time.time() - 10
    for n in debris:
        os.utime(os.path.join(d, n), (old, old))
    monkeypatch.setattr(mt, "_STAGING_TTL_SEC", 1.0)
    mt._sweep_stale_staging(d, plane)
    assert not [n for n in os.listdir(d) if n.startswith("_staging_")]

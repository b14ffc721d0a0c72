"""Property tests for the additive schema-evolution core
(sources/managed_table._evolve_schema / _merge_types) — pure functions,
so hypothesis can sweep the structural space cheaply: evolution is
idempotent, preserves committed field order and types, is additive-only
(every old leaf survives unchanged), and rejects any nested retype."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
    SchemaEvolutionError,
    _evolve_schema,
    _merge_types,
)

_PRIMS = st.sampled_from(["string", "long", "integer", "double", "boolean", "date"])


def _types(depth: int):
    if depth <= 0:
        return _PRIMS
    sub = _types(depth - 1)
    return st.one_of(
        _PRIMS,
        st.builds(
            lambda fields: {"type": "struct", "fields": fields},
            st.lists(
                st.builds(
                    lambda n, t, nl: {
                        "name": n, "type": t, "nullable": nl, "metadata": {}
                    },
                    st.sampled_from(["a", "b", "c", "d"]),
                    sub,
                    st.booleans(),
                ),
                min_size=1,
                max_size=3,
                unique_by=lambda f: f["name"],
            ),
        ),
        st.builds(
            lambda t, cn: {"type": "array", "elementType": t, "containsNull": cn},
            sub,
            st.booleans(),
        ),
    )


def _schemas(depth: int = 2):
    return st.builds(
        lambda fields: {"type": "struct", "fields": fields},
        st.lists(
            st.builds(
                lambda n, t: {"name": n, "type": t, "nullable": True, "metadata": {}},
                st.sampled_from(["w", "x", "y", "z"]),
                _types(depth),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda f: f["name"],
        ),
    )


def _leaves(t, path=""):
    """(path, primitive) leaves of a schema-JSON type."""
    if isinstance(t, str):
        yield path, t
    elif t["type"] == "struct":
        for f in t["fields"]:
            yield from _leaves(f["type"], f"{path}.{f['name']}")
    elif t["type"] == "array":
        yield from _leaves(t["elementType"], path + "[]")
    elif t["type"] == "map":
        yield from _leaves(t["keyType"], path + ".key")
        yield from _leaves(t["valueType"], path + ".value")


@settings(max_examples=200, deadline=None)
@given(_schemas(), _schemas())
def test_evolution_is_additive_or_rejects(prev, new):
    """Either the merge succeeds and EVERY committed leaf survives at
    its path with its exact type (additive-only), or it raises
    SchemaEvolutionError — never a silent retype."""
    try:
        merged = json.loads(_evolve_schema(json.dumps(prev), json.dumps(new)))
    except SchemaEvolutionError:
        return
    old_leaves = dict(_leaves(prev))
    new_leaves = dict(_leaves(merged))
    for path, t in old_leaves.items():
        assert new_leaves.get(path) == t, f"committed leaf {path} changed"
    # and every incoming leaf is present too (nothing silently dropped)
    for path, t in dict(_leaves(new)).items():
        assert path in new_leaves


@settings(max_examples=200, deadline=None)
@given(_schemas(), _schemas())
def test_evolution_is_idempotent(prev, new):
    try:
        once = _evolve_schema(json.dumps(prev), json.dumps(new))
    except SchemaEvolutionError:
        return
    assert _evolve_schema(once, json.dumps(new)) == once
    assert _evolve_schema(once, once) == once


@settings(max_examples=200, deadline=None)
@given(_schemas(), _schemas())
def test_committed_field_order_is_stable(prev, new):
    try:
        merged = json.loads(_evolve_schema(json.dumps(prev), json.dumps(new)))
    except SchemaEvolutionError:
        return
    old_names = [f["name"] for f in prev["fields"]]
    merged_names = [f["name"] for f in merged["fields"]]
    assert merged_names[: len(old_names)] == old_names


def test_nested_retype_raises_with_path():
    old = {"type": "struct", "fields": [
        {"name": "m", "nullable": True, "metadata": {},
         "type": {"type": "struct", "fields": [
             {"name": "a", "type": "long", "nullable": True, "metadata": {}}]}}]}
    new = {"type": "struct", "fields": [
        {"name": "m", "nullable": True, "metadata": {},
         "type": {"type": "struct", "fields": [
             {"name": "a", "type": "string", "nullable": True, "metadata": {}}]}}]}
    with pytest.raises(SchemaEvolutionError, match="m.a"):
        _evolve_schema(json.dumps(old), json.dumps(new))


def test_merge_types_nullability_ors():
    a = {"type": "array", "elementType": "long", "containsNull": False}
    b = {"type": "array", "elementType": "long", "containsNull": True}
    assert _merge_types(a, b, "x")["containsNull"] is True

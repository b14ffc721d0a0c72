"""Declarative data-quality contracts — constraint checking for
ingest/export gates, compiled into ONE map-combined aggregate scan.

The shape is the Deequ/Great-Expectations idea (Schelter et al., "Unit
Tests for Data", VLDB 2018) re-expressed Spark-first: a contract is a
list of constraints; `check` compiles EVERY constraint's statistics
into a single `df.agg(...)` — partial aggregation happens map-side
inside the scan, the exchange carries one row per partition, and the
constraint rows are exploded from the single result row. Adding a
constraint never adds a scan. At 100 TB that is the difference between
"the quality gate is one pass over the shard" and "the quality gate is
N passes".

Metric arithmetic is engine-portable by construction (the gate's
`data_quality_report` query hash-compares against a DuckDB twin):
counts are exact longs, fractions are single IEEE divisions of exact
longs, means are exact DECIMAL sums cast to double once — no
float-accumulation order anywhere. Empty-input conventions are pinned
and documented per constraint (vacuous truth for fractions, explicit
failure for row_count minimums).

The reference has no quality-contract surface; this module is part of
the training-data-pipeline tier the brief adds (the batch twin of the
streaming quality gate in streaming/quality.py, and the declarative
form of functions/text.py's fixed quality battery).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Constraint",
    "rule_name",
    "completeness",
    "uniqueness",
    "compliance",
    "row_count",
    "mean_between",
    "min_between",
    "max_between",
    "check",
    "compare_reports",
]


def rule_name(kind: str, *args) -> str:
    """The display name of a constraint, as a PURE function of its spec —
    importable without a SparkContext, so oracle/report generators can
    name rules identically to the live Constraint objects (which build
    their names through this same function)."""
    if kind == "completeness":
        col, mf = args
        return f"completeness({col}) >= {mf}"
    if kind == "uniqueness":
        col, mf = args
        return f"uniqueness({col}) >= {mf}"
    if kind == "compliance":
        pred, mf = args
        return f"compliance({pred}) >= {mf}"
    if kind == "row_count":
        mn, mx = args
        bound = f"in [{mn}, {mx}]" if mx is not None else f">= {mn}"
        return f"row_count {bound}"
    if kind in ("mean_between", "min_between", "max_between"):
        col, lo, hi = args
        return f"{kind.split('_')[0]}({col}) in [{lo}, {hi}]"
    raise ValueError(f"unknown constraint kind {kind!r}")


class Constraint:
    """One declared expectation: a set of aggregate statistics plus how
    to fold them into (metric, passed). `aggs` maps a local suffix to an
    UNALIASED aggregate Column; `metric` receives a getter resolving a
    suffix to that aggregate's result column; `passed` receives the
    metric column. Instances are engine-buildable data, so `check` can
    compile any mix of them into one scan."""

    def __init__(
        self,
        name: str,
        aggs: "dict[str, Column]",
        metric: "Callable[[Callable[[str], Column]], Column]",
        passed: "Callable[[Column], Column]",
    ):
        self.name = name
        self.aggs = aggs
        self.metric = metric
        self.passed = passed


def _frac(num: Column, den: Column) -> Column:
    """num/den as a double with the vacuous-truth empty convention:
    den = 0 -> 1.0 (no rows violate a contract nobody is party to).
    Guarded division — ANSI mode is ON."""
    return F.when(den == 0, F.lit(1.0)).otherwise(
        num.cast("double") / den.cast("double")
    )


def completeness(col: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of rows with a non-null `col` (Deequ's completeness).
    Empty input is vacuously complete (1.0)."""
    return Constraint(
        rule_name("completeness", col, min_fraction),
        {"nn": F.count(F.col(col)), "n": F.count(F.lit(1))},
        lambda get: _frac(get("nn"), get("n")),
        lambda m: m >= F.lit(float(min_fraction)),
    )


def uniqueness(col: str, min_fraction: float = 1.0) -> Constraint:
    """Distinct non-null values over non-null rows — 1.0 iff `col` is a
    key among present values. All-null / empty input is vacuously unique.
    The count_distinct rides the same single agg (Spark plans it as one
    expand + two-phase aggregate — still one scan of the data)."""
    return Constraint(
        rule_name("uniqueness", col, min_fraction),
        {"d": F.count_distinct(F.col(col)), "nn": F.count(F.col(col))},
        lambda get: _frac(get("d"), get("nn")),
        lambda m: m >= F.lit(float(min_fraction)),
    )


def compliance(predicate: str, min_fraction: float = 1.0) -> Constraint:
    """Fraction of rows satisfying a SQL boolean `predicate` (rows where
    it is NULL count as non-compliant, like a WHERE). The predicate is
    ANSI SQL text so the same string runs verbatim in an oracle engine.
    Empty input is vacuously compliant."""
    pred = F.when(F.expr(predicate), F.lit(1)).otherwise(F.lit(0))
    return Constraint(
        rule_name("compliance", predicate, min_fraction),
        {"ok": F.sum(pred), "n": F.count(F.lit(1))},
        lambda get: _frac(F.coalesce(get("ok"), F.lit(0)), get("n")),
        lambda m: m >= F.lit(float(min_fraction)),
    )


def row_count(min_rows: int = 0, max_rows: "int | None" = None) -> Constraint:
    """Total row count within [min_rows, max_rows]. The one constraint
    where empty input can FAIL (a vanished dataset must not pass its
    ingest gate)."""
    return Constraint(
        rule_name("row_count", min_rows, max_rows),
        {"n": F.count(F.lit(1))},
        lambda get: get("n").cast("double"),
        lambda m: (m >= F.lit(float(min_rows)))
        & (F.lit(True) if max_rows is None else (m <= F.lit(float(max_rows)))),
    )


def _decimal_mean(col: str) -> "dict[str, Column]":
    # EXACT decimal sum -> ONE double conversion: no float-accumulation
    # order, so the mean is bit-identical across engines/partitionings
    return {
        "s": F.sum(F.col(col).cast("decimal(28,6)")),
        "nn": F.count(F.col(col)),
    }


def _mean_metric(get: "Callable[[str], Column]") -> Column:
    return F.when(get("nn") == 0, F.lit(None).cast("double")).otherwise(
        get("s").cast("double") / get("nn").cast("double")
    )


def mean_between(col: str, lo: float, hi: float) -> Constraint:
    """Mean of non-null `col` within [lo, hi]; NULL metric (and failed)
    when no values are present — an absent signal is not a passing one."""
    return Constraint(
        rule_name("mean_between", col, lo, hi),
        _decimal_mean(col),
        _mean_metric,
        lambda m: F.coalesce((m >= F.lit(float(lo))) & (m <= F.lit(float(hi))), F.lit(False)),
    )


def min_between(col: str, lo: float, hi: float) -> Constraint:
    """Minimum of `col` within [lo, hi]; fails when no values present."""
    return Constraint(
        rule_name("min_between", col, lo, hi),
        {"m": F.min(F.col(col))},
        lambda get: get("m").cast("double"),
        lambda m: F.coalesce((m >= F.lit(float(lo))) & (m <= F.lit(float(hi))), F.lit(False)),
    )


def max_between(col: str, lo: float, hi: float) -> Constraint:
    """Maximum of `col` within [lo, hi]; fails when no values present."""
    return Constraint(
        rule_name("max_between", col, lo, hi),
        {"m": F.max(F.col(col))},
        lambda get: get("m").cast("double"),
        lambda m: F.coalesce((m >= F.lit(float(lo))) & (m <= F.lit(float(hi))), F.lit(False)),
    )


def check(df: DataFrame, constraints: "list[Constraint]") -> DataFrame:
    """Evaluate every constraint in ONE aggregate scan; returns one row
    per constraint: (constraint string, metric double, passed boolean).
    Row order follows the declared constraint order."""
    if not constraints:
        raise ValueError("check() needs at least one constraint")
    agg_exprs = [
        expr.alias(f"c{i}_{suffix}")
        for i, c in enumerate(constraints)
        for suffix, expr in c.aggs.items()
    ]
    row = df.agg(*agg_exprs)
    structs = []
    for i, c in enumerate(constraints):
        def get(suffix: str, i: int = i) -> Column:
            return F.col(f"c{i}_{suffix}")

        m = c.metric(get)
        structs.append(
            F.struct(
                F.lit(c.name).alias("constraint"),
                m.cast("double").alias("metric"),
                c.passed(m).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def compare_reports(
    current: DataFrame,
    baseline: DataFrame,
    max_rel_delta: float = 0.05,
    max_abs_delta: "float | None" = None,
) -> DataFrame:
    """Metric drift between two contract reports (the Deequ
    anomaly-detection shape): join on the rule string and flag rows
    whose metric moved more than the tolerance versus the baseline run —
    the question a scheduled ingest asks ("completeness fell 12% since
    yesterday") that absolute thresholds alone cannot, because a healthy
    metric band is usually narrower than the hard contract bound.

    Tolerances: relative (|cur - base| / |base|) when the baseline metric
    is nonzero, absolute (|cur - base|) when it is zero or when
    `max_abs_delta` is given (whichever tolerance is satisfied clears
    the row). A rule present on only ONE side always drifts — a
    disappeared or brand-new expectation is a contract change someone
    should see. NULL metrics (e.g. mean of an empty column) drift unless
    both sides are NULL.

    Output: (rule, metric, baseline_metric, delta, drifted), one row per
    rule in either report. Both inputs are the tiny per-constraint
    frames `check` returns — this composes as report-over-report
    monitoring with no rescan of any data."""
    cur = current.select(
        F.col("constraint").alias("rule"), F.col("metric"), F.lit(True).alias("_c")
    )
    base = baseline.select(
        F.col("constraint").alias("rule"),
        F.col("metric").alias("baseline_metric"),
        F.lit(True).alias("_b"),
    )
    joined = cur.join(base, "rule", "full_outer")
    # presence flags, not metric nullness: a rule can be PRESENT with a
    # NULL metric (mean of an empty column) — that is distinct from the
    # rule being absent from one report
    in_both = F.col("_c").isNotNull() & F.col("_b").isNotNull()
    both_metrics = F.col("metric").isNotNull() & F.col("baseline_metric").isNotNull()
    delta = F.col("metric") - F.col("baseline_metric")
    rel_ok = (F.col("baseline_metric") != 0) & (
        F.abs(delta) / F.abs(F.col("baseline_metric")) <= F.lit(float(max_rel_delta))
    )
    abs_ok = (
        F.lit(False)
        if max_abs_delta is None
        else (F.abs(delta) <= F.lit(float(max_abs_delta)))
    ) | ((F.col("baseline_metric") == 0) & (F.abs(delta) <= F.lit(0.0)))
    one_sided_null = F.col("metric").isNull() != F.col("baseline_metric").isNull()
    drifted = (
        F.when(~in_both, F.lit(True))  # appeared or disappeared rule
        .when(both_metrics, ~(rel_ok | abs_ok))
        .otherwise(one_sided_null)  # both NULL -> no drift; one NULL -> drift
    )
    return joined.select(
        "rule",
        "metric",
        "baseline_metric",
        F.when(both_metrics, delta).alias("delta"),
        drifted.alias("drifted"),
    )

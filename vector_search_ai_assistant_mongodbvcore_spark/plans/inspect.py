"""Physical-plan guardrails: make "would this hold at 1000×?" checkable.

`plan_report(df)` parses `explain("formatted")` output and counts the
things that matter at 100 TB: shuffles (Exchange), whole-stage-codegen
coverage, scan pushdown (PushedFilters / ReadSchema width), broadcast vs
sort-merge joins, and the top-k pattern (TakeOrderedAndProject vs global
Sort). Tests assert on these so perf regressions fail CI, not the bench.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@dataclass
class PlanReport:
    exchanges: int = 0
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    take_ordered: bool = False
    global_sorts: int = 0
    codegen_stages: int = 0
    python_evals: int = 0
    scans: list[dict] = field(default_factory=list)
    raw: str = ""

    def summary(self) -> str:
        return (
            f"exchanges={self.exchanges} bcast_joins={self.broadcast_joins} "
            f"smj={self.sortmerge_joins} take_ordered={self.take_ordered} "
            f"sorts={self.global_sorts} codegen={self.codegen_stages} "
            f"python={self.python_evals} scans={len(self.scans)}"
        )


def plan_report(df: DataFrame) -> PlanReport:
    """Counts operate on the '(n) NodeName' detail headers only — each node
    appears twice in formatted output (tree line + detail section), and a
    bare substring count double-counts everything."""
    txt = explain_str(df, "formatted")
    rep = PlanReport(raw=txt)
    rep.exchanges = len(re.findall(r"\(\d+\) Exchange\b", txt))
    rep.broadcast_joins = len(re.findall(r"\(\d+\) BroadcastHashJoin\b", txt))
    rep.sortmerge_joins = len(re.findall(r"\(\d+\) SortMergeJoin\b", txt))
    rep.take_ordered = "TakeOrderedAndProject" in txt
    # a Sort node's Arguments end with "<global>, <offset>"; only global=true
    # sorts are the scale smell (SortAggregate's per-partition sorts are not)
    rep.global_sorts = len(
        re.findall(r"\(\d+\) Sort\b[^(]*?Arguments: \[[^\]]*\], true,", txt)
    )
    rep.codegen_stages = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
    rep.python_evals = len(
        re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas)\b", txt)
    )
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        rep.scans.append({"pushed_filters": m.group(1)})
    return rep


def bounded_window_key(anchor) -> "Column":
    """A constant-zero partition key for windows over PROVABLY BOUNDED
    frames (post-LIMIT top-k ranks, per-group totals) that must evaluate
    in one partition by construction.

    Why not Window.orderBy(...) alone: Spark logs a scary (and there,
    unwarranted) "No Partition Defined ... serious performance
    degradation" warning per execution. Why not partitionBy(lit(0)) or
    (column * 0): Catalyst folds both out of the window spec (constant
    folding + multiply-by-zero simplification), re-arming the warning.
    least(length(cast(anchor as string)), 0) is always 0 (length >= 0,
    least skips the NULL of a NULL anchor) but the optimizer cannot
    prove it, so the partition spec survives to the physical plan
    (verified against Spark 4.1); every row still lands in the single
    partition the bounded frame needs, at the cost of one length() per
    row.
    """
    from pyspark.sql import Column, functions as F

    c = F.col(anchor) if isinstance(anchor, str) else anchor
    return F.least(F.length(c.cast("string")), F.lit(0))

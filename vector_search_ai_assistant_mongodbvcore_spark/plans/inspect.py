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
    txt = explain_str(df, "formatted")
    rep = PlanReport(raw=txt)
    rep.exchanges = len(re.findall(r"\bExchange\b", txt))
    rep.broadcast_joins = len(re.findall(r"BroadcastHashJoin", txt))
    rep.sortmerge_joins = len(re.findall(r"SortMergeJoin", txt))
    rep.take_ordered = "TakeOrderedAndProject" in txt
    rep.global_sorts = len(re.findall(r"\(\d+\) Sort\b", txt))
    rep.codegen_stages = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
    rep.python_evals = len(re.findall(r"(ArrowEvalPython|BatchEvalPython|MapInPandas)", txt))
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        rep.scans.append({"pushed_filters": m.group(1)})
    return rep

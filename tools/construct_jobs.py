"""Count Spark jobs run while CONSTRUCTING each bench query.

    python tools/construct_jobs.py

A registry query whose construction runs zero DAG jobs is pure
plan-building and safe for the prepared-plan cache
(queries._EAGER_CONSTRUCT is the complement of this set); one that runs
jobs while constructing (an eager fit/probe/write) must be re-run on
every invocation. The count reads the DAGScheduler's job-id counter
around a SECOND construction (the first warms model fits and table
handles, which are memoized independently of the prepared-plan cache).

tests/test_prepared_plans.py pins the classification; re-run this after
adding or restructuring a query to see where a new one falls.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from vector_search_ai_assistant_mongodbvcore_spark import get_spark
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    spark = get_spark(app_name="construct-jobs")
    sc = spark.sparkContext
    q.prewarm_indexes(spark, SF_DIR)
    # raw registry functions: the prepared-plan cache would hide the
    # second construction this tool exists to observe
    reg = {name: fn for name, (fn, _) in q.REGISTRY.items()}

    def next_job_id() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    out = {}
    for name in bench.BENCH_QUERIES:
        reg[name](spark, SF_DIR)  # warm (model fits, table handles)
        before = next_job_id()
        reg[name](spark, SF_DIR)
        out[name] = next_job_id() - before
    print(json.dumps(out, indent=2))
    eager = sorted(n for n, c in out.items() if c > 0)
    print(f"\neager-construct ({len(eager)}): {eager}", file=sys.stderr)


if __name__ == "__main__":
    main()

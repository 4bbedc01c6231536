"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r07 before q1_pricing_summary ...

Runs against the same synthesized sf1 tier the bench uses (so plan shapes
— join strategies, AQE thresholds — match what bench.py times). Queries
whose *construction* executes jobs (similarity_*, kg_remove*) are captured
as-is; kg_remove_equals_complement is skipped (it is a multi-pipeline
procedure, not one plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kiwi_spark.session import get_spark

SKIP = {"kg_remove_equals_complement"}


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-capture", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 16))
    spark.sparkContext.setLogLevel("ERROR")

    from tools.make_bench_sf import ensure

    sf_dir = ensure(spark, os.environ.get("SPARK_GRAFT_BENCH_DIR",
                                          "/tmp/kiwi_bench_sf1"))

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    queries = entrymod.queries()
    names = only or [n for n in queries if n not in SKIP]
    for name in names:
        if name in SKIP:
            continue
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

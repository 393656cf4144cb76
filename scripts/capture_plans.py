"""Capture .explain('formatted') for every declared query into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default "before"). Queries whose construction itself fails are recorded
with the error so the capture run is auditable.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:])
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from qdrant_spark.session import get_spark

    spark = get_spark(app_name="plan-capture", cpus=8, shuffle_partitions=8)
    qs = E.queries()
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        t0 = time.time()
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as ex:
            plan = f"<capture error: {type(ex).__name__}: {ex}>"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {time.time() - t0:.1f}s -> {path}")
    print(f"total {time.time() - t_all:.1f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

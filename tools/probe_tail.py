"""Warm-session decomposition of per-query time: DataFrame CONSTRUCTION
(py4j + analysis) vs EXECUTION (noop write) on repeat runs, plus the
number of Spark jobs the execution schedules. Unlike profile_queries.py
this reports the WARM (min-of-N) split, which is what the bench median
actually measures.

Usage: python tools/probe_tail.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ), args
    runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_session("probe-tail")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    specs = load_all()

    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()
    from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).write.mode("overwrite").format(
            "noop"
        ).save()

    tracker = sc.statusTracker()
    print(f"{'construct':>9} {'exec':>9} {'jobs':>4}  query")
    tot_c = tot_e = 0.0
    for name in names:
        fn = specs[name].fn
        best_c, best_e, best_j = None, None, None
        for i in range(runs):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            j1 = len(tracker.getJobIdsForGroup(None))
            if i == 0:
                continue  # skip cold run
            if best_e is None or (t2 - t0) < (best_c + best_e):
                best_c, best_e, best_j = t1 - t0, t2 - t1, j1 - j0
        tot_c += best_c
        tot_e += best_e
        print(f"{best_c:9.3f} {best_e:9.3f} {best_j:4d}  {name}")
    print(f"{tot_c:9.3f} {tot_e:9.3f}       TOTAL ({len(names)})")


if __name__ == "__main__":
    main()

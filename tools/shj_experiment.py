"""A/B: sort-merge vs shuffled-hash join posture on the iterative
graph family (and any named queries) — guide §3.1. Runs the same
mini-bench methodology with the session conf overridden via
SPARK_GRAFT_SHJ=1 (preferSortMergeJoin=false + AQE SMJ->SHJ runtime
conversion bounded by the advisory partition size).

Usage: [SPARK_GRAFT_SHJ=1] python tools/shj_experiment.py [sf_dir] q ...
"""

from __future__ import annotations

import os
import statistics
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
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_session("shj-experiment")
    if os.environ.get("SPARK_GRAFT_SHJ") == "1":
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
            ),
        )
        print("SHJ posture ON")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()
    from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).write.mode("overwrite").format(
            "noop"
        ).save()

    total = 0.0
    for name in names:
        fn = specs[name].fn
        samples = []
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        total += med
        print(f"{med:8.3f}  (runs: {' '.join(f'{s:.2f}' for s in samples)})  {name}")
    print(f"{total:8.3f}  TOTAL ({len(names)} queries)")


if __name__ == "__main__":
    main()

"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line {"metric","value","unit","queries","sf"}.

Results are materialized with the noop writer — full execution on the
executors, nothing collected to the driver — so the number measures
the distributed plan, not driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # JVM/codegen warmup + parquet footer/FS cache touch so the
    # alphabetically-first queries don't absorb one-time IO costs
    spark.range(1_000_000).selectExpr("sum(id)").write.mode(
        "overwrite"
    ).format("noop").save()
    from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).write.mode("overwrite").format(
            "noop"
        ).save()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        fn = specs[name].fn
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for named queries to
plans/<round>/<query>_<tag>.txt — the before/after plan evidence for
the OPTIMIZATION_r* reports. Usage:

    python tools/dump_plans.py <tag> <query> [query ...]

Env: SPARK_GRAFT_PLANS_ROUND (default r12) picks the output subdir.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython')}"
              f" pyEval -> plans/{rnd}/{name}_{tag}.txt")


if __name__ == "__main__":
    main()

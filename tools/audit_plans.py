"""Physical-plan audit: for every registered query, summarize the
facts that matter at 100 TB — shuffle (Exchange) count, join
strategies, parquet filter pushdown, scan column pruning, codegen
coverage. Usage: python tools/audit_plans.py [sf_dir] [query ...]"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402


def _scan_width(schema_tail: str) -> int:
    """Top-level field count of a ``ReadSchema: struct<...`` tail.

    Counts commas only at angle-bracket depth 0 (nested struct/map
    fields no longer inflate the number — the round-1 overcount), stops
    at the matching ``>``, and honors Spark's line-truncation suffix
    ``... N more fields``."""
    depth = 0
    fields = 0
    seen_any = False
    for i, ch in enumerate(schema_tail):
        if ch == "<":
            depth += 1
        elif ch == ">":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
        elif not ch.isspace() and depth == 0:
            seen_any = True
        if schema_tail.startswith("... ", i) and depth == 0:
            m = re.match(r"\.\.\. (\d+) more fields", schema_tail[i:])
            if m:
                return fields + seen_any + int(m.group(1))
            break
    return fields + (1 if seen_any else 0)


def _global_windows(plan: str) -> int:
    """Count windowspecdefinition occurrences with an EMPTY partition
    spec — the shape WindowExec warns about ("Moving all data to a
    single partition"). Detection: the spec's argument list is
    partition columns, then ordering expressions (carrying ASC/DESC),
    then the frame; if the FIRST argument is an ordering or the frame
    itself, no partition key exists."""
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, arg = m.end(), 1, []
        while i < len(plan) and depth:
            ch = plan[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 1 and ch == ",":
                break
            arg.append(ch)
            i += 1
        first = "".join(arg).strip()
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            n += 1
    return n


def plan_facts(df) -> dict:
    """The physical-plan facts that matter at 100 TB, as a dict —
    shared by the CLI audit and the plan-contract pytest."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # after an action, AQE's toString appends the pre-optimization tree
    # under "== Initial Plan ==" — keep only the executed (final) tree
    # or every Exchange would be counted twice
    plan = plan.split("== Initial Plan ==")[0]
    scans = re.findall(r"ReadSchema: struct<(.*)", plan)
    return {
        "global_windows": _global_windows(plan),
        "shuffles": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "sorts": len(re.findall(r"\+- Sort ", plan)),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "scan_cols": [_scan_width(s) for s in scans],
    }


def audit(sf_dir: str, only: list[str] | None = None) -> None:
    specs = load_all()
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = only or sorted(specs)
    print(f"{'query':32s} {'shuffles':>8s} {'bhj':>4s} {'smj':>4s} "
          f"{'sort':>5s} {'gwin':>5s} {'pushed':>7s} {'scan_cols'}")
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            facts = plan_facts(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {e}")
            continue
        widths = ",".join(str(w) for w in facts["scan_cols"])
        print(f"{name:32s} {facts['shuffles']:8d} {facts['bhj']:4d} "
              f"{facts['smj']:4d} {facts['sorts']:5d} "
              f"{facts['global_windows']:5d} "
              f"{'yes' if facts['pushed'] else '-':>7s} [{widths}]")


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    audit(sf_dir, only)

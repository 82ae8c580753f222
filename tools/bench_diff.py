"""Round-over-round bench regression diff (NEXT r2 #9).

    python tools/bench_diff.py OLD.json NEW.json [--ratio 1.5]
        [--min-sec 0.3] [--fail]

Both inputs are `BENCH_DETAIL.json`-shaped (bench.py writes one per
run; archive the previous round's copy to diff against). Reports, per
query: median-seconds ratio and shuffle-write-bytes ratio, flagging
anything past ``--ratio`` whose absolute time also exceeds
``--min-sec`` (sub-300 ms queries are all JVM noise locally). With
``--fail`` the exit code is the number of flagged regressions, so CI
can gate on it; without, it's informational.

Output: one JSON line {"regressions": [...], "improved": [...],
"added": [...], "removed": [...], "total_old": s, "total_new": s}.
"""

from __future__ import annotations

import argparse
import json
import sys


def diff(old: dict, new: dict, ratio: float, min_sec: float) -> dict:
    ot, nt = old.get("queries", {}), new.get("queries", {})
    ob, nb = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    regressions, improved = [], []
    for q in sorted(set(ot) & set(nt)):
        t0, t1 = ot[q], nt[q]
        if t0 <= 0 or t1 <= 0:
            continue
        entry = {
            "query": q,
            "old_sec": t0,
            "new_sec": t1,
            "ratio": round(t1 / t0, 2),
        }
        b0, b1 = ob.get(q, -1), nb.get(q, -1)
        if b0 > 0 and b1 >= 0:
            entry["old_bytes"] = b0
            entry["new_bytes"] = b1
            entry["bytes_ratio"] = round(b1 / b0, 2)
        time_reg = t1 > t0 * ratio and t1 > min_sec
        # shuffle bytes are deterministic per plan — ANY growth beyond
        # noise means the physical plan changed for the worse, which
        # local wall time can hide but 100 TB will not
        bytes_reg = b0 > 0 and b1 > b0 * ratio
        if time_reg or bytes_reg:
            entry["why"] = "+".join(
                w for w, flag in (("time", time_reg), ("bytes", bytes_reg)) if flag
            )
            regressions.append(entry)
        elif t0 > t1 * ratio and t0 > min_sec:
            improved.append(entry)
    return {
        "regressions": regressions,
        "improved": improved,
        "added": sorted(set(nt) - set(ot)),
        "removed": sorted(set(ot) - set(nt)),
        "total_old": old.get("value"),
        "total_new": new.get("value"),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--ratio", type=float, default=1.5)
    p.add_argument("--min-sec", type=float, default=0.3)
    p.add_argument("--fail", action="store_true")
    args = p.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    out = diff(old, new, args.ratio, args.min_sec)
    print(json.dumps(out))
    if args.fail:
        sys.exit(len(out["regressions"]))


if __name__ == "__main__":
    main()

"""Prose registry counts stay in lockstep with the registry (VERDICT
r7 next-round #2: the r6 red suite came from exactly this
end-of-round-addition drift — OPERATORS.md said 255 while queries()
said 256; the machine-checked surfaces were in lockstep but the prose
was unchecked). Every human-readable count now fails the suite the
moment it goes stale."""

from __future__ import annotations

import re
from pathlib import Path

from scylla_pg_cdc_spark.registry import load_all

REPO = Path(__file__).resolve().parent.parent


def test_operators_md_total_matches_registry():
    """The LAST 'Total: N registered queries' in OPERATORS.md (the
    current round's closing count) must equal len(load_all())."""
    text = (REPO / "OPERATORS.md").read_text()
    totals = re.findall(r"Total: (\d+) registered queries", text)
    assert totals, "OPERATORS.md lost its Total line"
    assert int(totals[-1]) == len(load_all()), (
        f"OPERATORS.md says {totals[-1]}, registry has {len(load_all())}"
    )


def test_next_md_state_count_matches_registry():
    """NEXT.md's round-state header count must equal len(load_all())."""
    text = (REPO / "NEXT.md").read_text()
    m = re.search(r"\*\*(\d+) registered queries\*\*", text)
    assert m, "NEXT.md lost its round-state count"
    assert int(m.group(1)) == len(load_all()), (
        f"NEXT.md says {m.group(1)}, registry has {len(load_all())}"
    )


def test_schema_snapshot_matches_registry():
    """tests/query_schemas.json covers exactly the registry (the r6
    stale-snapshot red, pinned here alongside the prose counts)."""
    import json

    snap = json.loads((REPO / "tests" / "query_schemas.json").read_text())
    assert sorted(snap) == sorted(load_all()), (
        len(snap),
        len(load_all()),
    )

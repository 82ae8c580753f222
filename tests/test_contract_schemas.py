"""Contract test: every registered query has a stable output schema.

The driver hashes (column names, values) — silent schema drift would
fail the correctness gate, so drift must fail here first (reference
contract-test analog, `tests/contract/test_postgres_sink.py:66-307`).
Regenerate after intentional changes:
    python -c "from tests.test_contract_schemas import regenerate; regenerate()"
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from scylla_pg_cdc_spark.registry import load_all
from tests.conftest import SF_SMALL

SNAPSHOT = Path(__file__).parent / "query_schemas.json"
SPECS = load_all()


def _current_schemas(spark) -> dict[str, str]:
    return {
        name: SPECS[name].fn(spark, SF_SMALL).schema.simpleString()
        for name in sorted(SPECS)
    }


def regenerate() -> None:
    from scylla_pg_cdc_spark.session import get_session

    schemas = _current_schemas(get_session("schema-snapshot"))
    SNAPSHOT.write_text(json.dumps(schemas, indent=1, sort_keys=True))
    print(f"wrote {len(schemas)} schemas to {SNAPSHOT}")


@pytest.mark.skipif(not SNAPSHOT.exists(), reason="no snapshot yet")
def test_query_schemas_unchanged(spark):
    want = json.loads(SNAPSHOT.read_text())
    got = _current_schemas(spark)
    assert set(got) == set(want), (
        f"query set drift: +{set(got) - set(want)} -{set(want) - set(got)}"
    )
    diffs = {n: (want[n], got[n]) for n in want if want[n] != got[n]}
    assert not diffs, f"schema drift: {diffs}"

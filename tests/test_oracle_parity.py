"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — the same check the driver's correctness gate performs at
sf0.01 (SURVEY.md §5 rebuild strategy)."""

from __future__ import annotations

import duckdb
import pytest

from scylla_pg_cdc_spark.registry import load_all
from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_SMALL
from tools.check_oracle import _norm_rows

SPECS = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMALL)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(spark_rows) > 0, f"{name}: rows-only check found 0 rows"
        return
    res = duck.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    spark_cols = [c.lower() for c in sdf.columns]
    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_aligned = [tuple(row[i] for i in idx) for row in duck_rows]
    assert _norm_rows(spark_rows) == _norm_rows(duck_aligned), (
        f"{name}: value mismatch"
    )

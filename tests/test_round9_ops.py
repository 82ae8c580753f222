"""Round-9 unit tests: corpus-scaled sign-LSH geometry and the
skyline merge hardening.

The load-bearing invariant is cross-engine: ``scaled_planes`` (Python,
drives the Spark plan) and ``_np_cte`` (SQL, drives the DuckDB oracle)
must pick the IDENTICAL plane count for every corpus size, or the
bucket structures diverge and every hash comparison in the family
fails. Pinned here over the full interesting range, including the
k <= 1 edge where bit_length and bin-length genuinely differ (both
clamp to the base)."""

import duckdb
import pytest

from scylla_pg_cdc_spark.operators.vector import (
    LSH_MAX_PLANES,
    LSH_TARGET_BUCKET,
    _np_cte,
    scaled_planes,
)


def _oracle_planes(n: int, base: int) -> int:
    cte = _np_cte(base).replace(
        "COUNT(*)", f"CAST({n} AS BIGINT)"
    ).replace(" FROM embeddings", "")
    return duckdb.sql(f"WITH {cte} SELECT n_planes FROM np").fetchone()[0]


@pytest.mark.parametrize("base", [4, 6])
def test_scaled_planes_matches_oracle_formula(base):
    sizes = (
        list(range(0, 2000, 97))
        + [2**p + d for p in range(9, 32, 2) for d in (-1, 0, 1)]
        + [500, 2000, 19991, 199901, 10**7, 10**9, 10**12, 10**14]
    )
    for n in sizes:
        assert scaled_planes(n, base) == _oracle_planes(n, base), n


def test_scaled_planes_envelope():
    # floor at the historical base: small corpora keep r1-r8 geometry
    assert scaled_planes(500, 6) == 6
    assert scaled_planes(2000, 6) == 6
    assert scaled_planes(19991, 6) == 6  # amp10: k=40 -> 6 bits
    # amp100 crosses the floor: 199901/512 -> k=391 -> 9 planes
    assert scaled_planes(199901, 6) == 9
    # expected bucket population stays ~TARGET as n grows 1000x
    for n in (10**6, 10**8, 10**9):
        planes = scaled_planes(n, 6)
        assert n / 2**planes <= LSH_TARGET_BUCKET
        assert n / 2**planes > LSH_TARGET_BUCKET / 4
    # hard cap
    assert scaled_planes(10**15, 6) == LSH_MAX_PLANES


def test_skyline_2d_registered_plan_has_no_global_window(spark):
    """The registered q_skyline_2d must never fall back to the
    single-partition global window (ADVICE r8): every Window node in
    its physical plan carries a partition key."""
    from scylla_pg_cdc_spark.registry import load_all

    reg = load_all()
    df = reg["q_skyline_2d"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            # keyed spec renders as Window [...], [key#id], [order];
            # the empty-partition form has no partition column list
            # between the spec and the ordering.
            assert "], [" in line.split("windowspecdefinition")[0] or (
                line.count("], [") >= 2
            ), f"global window in q_skyline_2d plan: {line.strip()[:160]}"


def test_skyline_nd_second_round_is_lossless(spark):
    """skyline_nd_max with the smallest bucket counts still equals the
    brute-force dominance set on a duplicate-heavy frame (exercises
    local -> rebucket -> final chain with real cross-bucket moves)."""
    import itertools

    from scylla_pg_cdc_spark.operators.analytics import skyline_nd_max

    rows = [
        (i, (i * 7) % 13, (i * 11) % 17, (i * 5) % 7)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["id", "a", "b", "c"])
    got = {
        tuple(r)
        for r in skyline_nd_max(df, ["a", "b", "c"], prereduce_buckets=5)
        .collect()
    }
    pts = {r[0]: r[1:] for r in rows}
    expect = {
        (i, *p)
        for i, p in pts.items()
        if not any(
            all(q[d] >= p[d] for d in range(3))
            and any(q[d] > p[d] for d in range(3))
            for q in pts.values()
        )
    }
    assert got == expect

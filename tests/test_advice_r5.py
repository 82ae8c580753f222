"""Round-5 advisor regressions: int64-overflow envelopes, floor-vs-
truncate division parity, constraint-engine edge cases, and shared
Hadoop-conf hygiene (ADVICE.md round 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions import constraints as C
from scylla_pg_cdc_spark.operators.analytics import floordiv_sql


def test_floordiv_sql_matches_python_floor(spark):
    """The Spark-side floor-division used by q_event_twap must agree
    with Python // (== DuckDB //) for negative numerators, where a
    bare DIV truncates toward zero and diverges."""
    rows = [(-7, 2), (-8, 2), (7, 2), (8, 2), (-1, 3), (0, 5),
            (-1000000007, 3), (1000000007, 3)]
    df = spark.createDataFrame(rows, "num long, den long")
    got = [
        r["fd"]
        for r in df.select(
            F.expr(floordiv_sql("num", "den")).alias("fd")
        ).collect()
    ]
    assert got == [n // d for n, d in rows]
    # sanity: plain DIV really does differ on the negative cases,
    # i.e. this helper is load-bearing, not decorative
    trunc = [
        r["td"]
        for r in df.select(F.expr("num DIV den").alias("td")).collect()
    ]
    assert trunc != got


def test_weighted_sample_filter_survives_int64_overflow(spark):
    """The q_weighted_sample keep-test (hv * w_total < E * w * 2^32)
    in its decimal(38,0) form must stay exact where the old bigint
    form overflowed: hv near 2^32 against a w_total past 2^31."""
    hv = (1 << 32) - 5
    w_total = (1 << 33) + 11  # > 2^31 chars: hv*w_total > int64 max
    e, w = 1000, 4096
    df = spark.createDataFrame([(hv, w_total, e, w)],
                               "hv long, w_total long, e long, w long")
    keep = df.filter(
        F.col("hv").cast("decimal(38,0)")
        * F.col("w_total").cast("decimal(38,0)")
        < F.expr(
            "CAST(e AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))"
            " * CAST(4294967296 AS DECIMAL(38,0))"
        )
    ).count()
    want = 1 if hv * w_total < e * w * (1 << 32) else 0
    assert keep == want
    # and the exact boundary: equality must NOT keep
    df2 = spark.createDataFrame([(e * w, 1 << 32, e, w)],
                                "hv long, w_total long, e long, w long")
    assert df2.filter(
        F.col("hv").cast("decimal(38,0)")
        * F.col("w_total").cast("decimal(38,0)")
        < F.expr(
            "CAST(e AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))"
            " * CAST(4294967296 AS DECIMAL(38,0))"
        )
    ).count() == 0


def test_colloc_independence_filter_survives_int64_overflow(spark):
    """q_bigram_colloc's 10*c_xy*N1^2 > 11*N2*c_x*c_y in decimal form
    at N1 = 4e9 tokens (N1^2 alone overflows int64)."""
    n1 = 4_000_000_000
    rows = [
        # (c_xy, n1, n2, c_x, c_y, expect_keep)
        (100, n1, n1 - 1, 1_000_000, 1_000_000, True),   # lift >> 1.1
        (1, n1, n1 - 1, n1 // 2, n1 // 2, False),        # lift << 1.1
    ]
    df = spark.createDataFrame(
        [r[:5] for r in rows],
        "c_xy long, n1 long, n2 long, c_x long, c_y long",
    )
    got = (
        df.withColumn(
            "keep",
            F.expr(
                "CAST(10 AS DECIMAL(38,0)) * c_xy * n1 * n1"
                " > CAST(11 AS DECIMAL(38,0)) * n2 * c_x * c_y"
            ),
        )
        .select("keep")
        .collect()
    )
    want = [10 * r[0] * r[1] * r[1] > 11 * r[2] * r[3] * r[4] for r in rows]
    assert [r["keep"] for r in got] == want


def test_domain_lift_ratio_survives_int64_overflow(spark):
    """q_doc_domain_lift's (1e6*o*N1) DIV (c*ns) in decimal form at
    N1 = 1e10 tokens (1e6*o*N1 overflows int64 even at o=1000)."""
    o, n1, c, ns = 1000, 10_000_000_000, 5000, 2_000_000_000
    df = spark.createDataFrame([(o, n1, c, ns)],
                               "o long, n1 long, c long, ns long")
    got = df.select(
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * o * n1)"
            " DIV (CAST(c AS DECIMAL(38,0)) * ns) AS BIGINT)"
        ).alias("ppm")
    ).head()["ppm"]
    assert got == (1_000_000 * o * n1) // (c * ns)


def test_audit_empty_rules_returns_empty_frame(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = C.audit({"t": df}, [])
    assert out.columns == ["rule", "kind", "n_violations"]
    assert out.count() == 0


def test_audit_fk_without_broadcast_matches_broadcast(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    tables = {"c": child, "p": parent}
    rules = [C.foreign_key("fk", "c", ("id",), "p", ("pid",))]
    a = C.audit(tables, rules).head()["n_violations"]
    b = C.audit(tables, rules, broadcast_parents=False).head()["n_violations"]
    assert a == b == 1
    # the non-broadcast plan must not carry a broadcast hint
    plan = (
        C.audit(tables, rules, broadcast_parents=False)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "broadcast" not in plan.lower()


def test_floordiv_sql_random_sweep(spark):
    """200 seeded random (num, den) pairs, both signs of num, in one
    DataFrame pass — floordiv_sql must equal Python // everywhere."""
    import random

    rng = random.Random(20260814)
    rows = [
        (rng.randint(-10**12, 10**12), rng.randint(1, 10**6))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "num long, den long")
    got = [
        r["fd"]
        for r in df.select(
            F.expr(floordiv_sql("num", "den")).alias("fd")
        ).collect()
    ]
    assert got == [n // d for n, d in rows]

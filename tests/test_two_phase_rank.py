"""two_phase_row_number / two_phase_ntile must equal the native
global-window forms bit-for-bit — they replace the corpus-sized
single-partition NTILEs in q_customer_rfm / q_curriculum_bins
(round 9; the escape hatch those docstrings promised)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.sweep import (
    two_phase_ntile,
    two_phase_row_number,
)


def _frame(spark, seed, n, vmax):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(vmax)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long")


@pytest.mark.parametrize("seed,n,vmax,width", [
    (1, 200, 50, 7),      # heavy value ties, several bands
    (2, 173, 10**6, 4096),  # near-unique values
    (3, 64, 3, 1),        # tiny domain, band per value
    (4, 257, 1000, 10**9),  # everything in ONE band (degenerate)
])
def test_row_number_matches_global_window(spark, seed, n, vmax, width):
    df = _frame(spark, seed, n, vmax)
    got = {
        r["id"]: r["rn"]
        for r in two_phase_row_number(df, "v", "id", width).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("rn"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed,n,vmax,width,k", [
    (5, 200, 50, 7, 5),
    (6, 173, 10**6, 4096, 4),
    (7, 10, 100, 16, 4),   # n % k != 0: remainder buckets fill first
    (8, 3, 100, 16, 5),    # n < k: every row its own bucket
    (9, 256, 8, 1, 5),     # massive ties across bucket boundaries
    (11, 300, 10**9, None, 5),  # autotuned width (min/max probe)
    (12, 40, 2, None, 3),       # autotuned on a 2-value domain
])
def test_ntile_matches_native(spark, seed, n, vmax, width, k):
    df = _frame(spark, seed, n, vmax)
    got = {
        r["id"]: r["t"]
        for r in two_phase_ntile(df, "v", "id", k, width, "t").collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.select(
            "id",
            F.ntile(k).over(Window.orderBy("v", "id")).alias("t"),
        ).collect()
    }
    assert got == want


def test_no_global_window_in_plan(spark):
    from tools.audit_plans import plan_facts

    df = _frame(spark, 10, 100, 1000)
    out = two_phase_ntile(df, "v", "id", 5, 64, "t")
    facts = plan_facts(out)
    assert facts["global_windows"] == 0, facts
    assert facts["bnlj"] == 0 and facts["cartesian"] == 0, facts


def test_tie_degenerate_column_subbands(spark):
    """r10: a fully-tied value column (ONE distinct value) must not
    collapse into a single band — the autotune probe sees band_width
    1 and sub-bands by id range, restoring parallelism while staying
    bit-identical to the naive global window."""
    df = spark.range(0, 5000).select(
        F.lit(7).cast("long").alias("v"), F.col("id").cast("long")
    )
    out = two_phase_row_number(df, "v", "id").drop("__n")
    got = {r["id"]: r["rn"] for r in out.collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("rn"),
        ).collect()
    }
    assert got == want
    # the within-band window really is split: >1 band in the plan's
    # partitioning (probe the band expression directly)
    from scylla_pg_cdc_spark.functions.sweep import _TIE_SUBBANDS

    n_bands = (
        df.withColumn(
            "b", F.expr(f"id DIV {max(1, 5000 // _TIE_SUBBANDS)}")
        )
        .select("b")
        .distinct()
        .count()
    )
    assert n_bands > 1


def test_tie_degenerate_three_values(spark):
    """Three distinct values, heavy collisions (the ties-profile
    lineitem shape): exact AND sub-banded."""
    df = spark.range(0, 6000).select(
        (F.col("id") % 3 + 1).cast("long").alias("v"),
        F.col("id").cast("long"),
    )
    out = two_phase_row_number(df, "v", "id").drop("__n")
    got = {r["id"]: r["rn"] for r in out.collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("rn"),
        ).collect()
    }
    assert got == want

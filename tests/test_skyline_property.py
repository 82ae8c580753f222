"""Property test for the 2-D skyline operator: the value-grouped
running-max algorithm (`skyline_2d_max`) must return EXACTLY the
rows an O(n^2) dominance scan returns — on random point sets with
heavy duplicate mass on both axes (ties are where rank-style skyline
rewrites classically go wrong: equal points are mutually
non-dominating and must all survive)."""

from __future__ import annotations

import random

from scylla_pg_cdc_spark.operators.analytics import skyline_2d_max

SEEDS = (11, 23, 47, 101, 202)


def _brute_skyline(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((i, x, y))
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        n = rng.randint(30, 120)
        # small value ranges force many exact ties on each axis and
        # frequent full-duplicate points
        pts = [
            (rng.randint(0, 12), rng.randint(0, 12)) for _ in range(n)
        ]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "id long, x long, y long",
        )
        got = sorted(
            (r["id"], r["x"], r["y"])
            for r in skyline_2d_max(df, "x", "y").collect()
        )
        assert got == _brute_skyline(pts), f"seed {seed}"


def test_skyline_all_duplicates_survive(spark):
    df = spark.createDataFrame(
        [(i, 5, 5) for i in range(7)], "id long, x long, y long"
    )
    got = skyline_2d_max(df, "x", "y").collect()
    assert len(got) == 7


def test_skyline_single_chain(spark):
    # strictly increasing x with strictly decreasing y: every point
    # is on the frontier
    df = spark.createDataFrame(
        [(i, i, 100 - i) for i in range(20)], "id long, x long, y long"
    )
    assert skyline_2d_max(df, "x", "y").count() == 20
    # strictly increasing on both: only the last survives
    df2 = spark.createDataFrame(
        [(i, i, i) for i in range(20)], "id long, x long, y long"
    )
    rows = skyline_2d_max(df2, "x", "y").collect()
    assert [(r["x"], r["y"]) for r in rows] == [(19, 19)]


def test_skyline_prereduce_equivalence(spark):
    """The union-skyline identity: the bucketed pre-reduce path must
    return exactly the plain path's rows for any bucket count."""
    for seed, buckets in ((7, 3), (13, 8), (29, 1)):
        rng = random.Random(seed)
        pts = [
            (rng.randint(0, 15), rng.randint(0, 15)) for _ in range(150)
        ]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "id long, x long, y long",
        )
        plain = sorted(
            (r["id"], r["x"], r["y"])
            for r in skyline_2d_max(df, "x", "y").collect()
        )
        pre = sorted(
            (r["id"], r["x"], r["y"])
            for r in skyline_2d_max(
                df, "x", "y", prereduce_buckets=buckets
            ).collect()
        )
        assert pre == plain == _brute_skyline(pts), (seed, buckets)


def test_skyline_nd_matches_brute_force(spark):
    """3-D: the bucketed applyInPandas sweep must equal the O(n^2)
    definition on duplicate-heavy random sets, for several bucket
    counts (1 = single-pass degenerate case)."""
    from scylla_pg_cdc_spark.operators.analytics import skyline_nd_max

    def brute3(pts):
        out = []
        for i, p in enumerate(pts):
            dominated = any(
                all(q[k] >= p[k] for k in range(3))
                and any(q[k] > p[k] for k in range(3))
                for j, q in enumerate(pts)
                if j != i
            )
            if not dominated:
                out.append((i, *p))
        return sorted(out)

    for seed, buckets in ((5, 1), (17, 4), (31, 16)):
        rng = random.Random(seed)
        pts = [
            tuple(rng.randint(0, 8) for _ in range(3)) for _ in range(120)
        ]
        df = spark.createDataFrame(
            [(i, *p) for i, p in enumerate(pts)],
            "id long, x long, y long, z long",
        )
        got = sorted(
            (r["id"], r["x"], r["y"], r["z"])
            for r in skyline_nd_max(
                df, ["x", "y", "z"], prereduce_buckets=buckets
            ).collect()
        )
        assert got == brute3(pts), (seed, buckets)

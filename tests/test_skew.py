"""Salted join/aggregate correctness: results must be identical to the
unsalted plan on a pathologically skewed dataset (one key holds ~90%
of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(90_000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).alias("v")
    )
    cold = spark.range(10_000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 100).alias("v")
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, on="k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, on="k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark, skewed, dim):
    missing_dim = dim.filter(F.col("k") != 7)  # hot key unmatched
    plain = skewed.join(missing_dim, on="k", how="left")
    salted = salted_join(skewed, missing_dim, on="k", how="left")
    assert plain.count() == salted.count()
    assert (
        salted.filter(F.col("k") == 7).filter(F.col("name").isNotNull()).count()
        == 0
    )


def test_salted_aggregate_matches_plain(spark, skewed):
    salted = salted_aggregate(skewed, ["k"], {"v": "sum"}, n_salt=16)
    plain_sums = {
        r["k"]: r["s"]
        for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    got_sums = {r["k"]: r["sum_v"] for r in salted.collect()}
    assert got_sums == plain_sums
    counts = salted_aggregate(skewed, ["k"], {"v": "count"}, n_salt=4)
    plain_counts = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["k"]: r["count_v"] for r in counts.collect()} == plain_counts


def test_salted_aggregate_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(skewed, ["k"], {"v": "median"})


def test_salted_count_skips_nulls_like_plain_count(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 5), (2, 7)], "k long, v long"
    )
    got = {r["k"]: r["count_v"] for r in
           salted_aggregate(df, ["k"], {"v": "count"}, n_salt=4).collect()}
    assert got == {1: 1, 2: 1}
    got_star = {r["k"]: r["count_*"] for r in
                salted_aggregate(df, ["k"], {"*": "count"}, n_salt=4).collect()}
    assert got_star == {1: 2, 2: 1}


def test_salted_join_rejects_right_and_full(spark, skewed, dim):
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner/left only"):
            salted_join(skewed, dim, on="k", how=how)


def test_salted_join_random_mode_matches_plain(spark, skewed, dim):
    plain = skewed.join(dim, on="k").count()
    salted = salted_join(skewed, dim, on="k", salt_mode="random").count()
    assert plain == salted

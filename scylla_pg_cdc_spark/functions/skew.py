"""Skew mitigation: salted joins for power-law keys.

AQE's skew-join split handles most skew automatically (enabled in
``session.py``), but extreme hot keys in *aggregations* and in joins
AQE can't split (e.g. broadcast-ineligible build sides) need salting:
replicate the small side k times and scatter the big side's hot keys
across k sub-keys, turning one straggler partition into k parallel
ones. Deterministic salt = pmod(hash(entire row), k), so results are
reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salt: int = 8,
    salt_mode: str = "row_hash",
) -> DataFrame:
    """Equi-join big⋈small on ``on`` with the big side scattered over
    ``n_salt`` sub-partitions per key and the small side replicated
    ``n_salt`` times. Result is identical to a plain join; only the
    shuffle distribution changes.

    Only inner/left joins are supported: right/full outer would emit
    one null-extended copy of each unmatched small-side row PER
    REPLICA (n_salt duplicates) — salt the other side instead.

    ``salt_mode``: 'row_hash' (default) is deterministic run-to-run
    but cannot scatter a hot key whose rows are IDENTICAL duplicates
    (equal rows hash to equal salts); 'random' uses a seeded rand()
    that scatters duplicates too, at the cost of row-to-salt placement
    varying with partitioning."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): "
            "right/full would duplicate unmatched small-side rows per salt"
        )
    if salt_mode == "row_hash":
        salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    elif salt_mode == "random":
        salt = (F.rand(seed=42) * n_salt).cast("int")
    else:
        raise ValueError(f"unknown salt_mode: {salt_mode!r}")
    salted_big = big.withColumn("__salt", salt)
    salted_small = small.join(
        F.broadcast(
            small.sparkSession.range(n_salt).select(
                F.col("id").cast("int").alias("__salt")
            )
        ),
        how="cross",
    )
    joined = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate
    on (keys..., salt), then final aggregate on keys. Supports the
    decomposable aggregates sum/count/min/max (avg = sum/count at the
    call site). Identical result to a direct groupBy."""
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        pname = f"__p_{fn}_{col}"
        if fn == "count":
            # count(col) skips NULLs, matching a direct groupBy agg;
            # use the literal "*" column name for a row count
            counted = F.count(F.lit(1)) if col == "*" else F.count(col)
            partial_exprs.append(counted.alias(pname))
            final_exprs.append(F.sum(pname).cast("long").alias(f"count_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(pname))
            final_exprs.append(F.sum(pname).alias(f"sum_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(pname))
            final_exprs.append(F.min(pname).alias(f"min_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(pname))
            final_exprs.append(F.max(pname).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    partial = df.withColumn("__salt", salt).groupBy(
        *keys, "__salt"
    ).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)

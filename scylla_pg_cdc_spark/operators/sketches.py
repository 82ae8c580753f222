"""Mergeable-sketch operators: KMV (k-minimum-values) distinct-count
sketches with an exact differential oracle.

The reference ships row-count / checksum validation probes
(``tests/validation/warehouse_checks.sql``); at 100 TB exact
COUNT(DISTINCT) costs a second expand shuffle, so warehouses keep
*mergeable sketches* instead. Spark's built-in HLL++
(``approx_count_distinct``, covered by ``q_agg_approx_distinct``) is
engine-internal and can't be differentially checked value-for-value;
KMV is the sketch you can check exactly, because it is a pure function
of the data: keep the k smallest values of a uniform hash; the k-th
smallest value m estimates distinct count as (k-1) * H / m for hash
range H (Bar-Yossef et al., RANDOM 2002).

Portability: the hash is the first 8 hex chars of md5 parsed as an
integer — Spark ``conv(substring(md5(x), 1, 8), 16, 10)`` and a
strpos-polynomial in DuckDB produce the identical bigint, and the
estimate is exact integer floor-division. Everything downstream of the
hash is min-k + integer arithmetic: order-independent, partitionable,
and mergeable (the min-k of a union is the min-k of the merged min-k
sets — a distributed TakeOrdered, which is how this scales: per-
partition min-k, merge at the reducer, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

_K = 64
_HASH_RANGE = 4294967296  # 2^32


def _duck_hex_poly(expr: str) -> str:
    """DuckDB SQL computing the first-8-hex-chars-of-md5 integer."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "q_kmv_distinct",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
    ), hh AS (
        SELECT DISTINCT l_returnflag,
               {_duck_hex_poly("'kmv:' || CAST(l_partkey AS VARCHAR)")} AS hv
        FROM du
    ), rk AS (
        SELECT l_returnflag, hv,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv)
                   AS rk
        FROM hh
    ), kth AS (
        SELECT l_returnflag, hv AS kth_hv FROM rk WHERE rk = {_K}
    ), ex AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS exact_distinct
        FROM du GROUP BY l_returnflag
    )
    SELECT e.l_returnflag, k.kth_hv,
           CAST(({_K - 1} * {_HASH_RANGE}) // k.kth_hv AS BIGINT)
               AS est_distinct,
           e.exact_distinct
    FROM ex e JOIN kth k ON e.l_returnflag = k.l_returnflag
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-partkey sketch per returnflag, k=64, reported next to
    the exact distinct count so the estimate's error is visible in the
    output itself. The sketch state is the 64 smallest hash values per
    group — built here with a rank window for oracle parity, but
    merge-able at scale as per-partition min-k + reducer merge
    (TakeOrdered shape), which is what replaces the exact-distinct
    expand shuffle at 100 TB. Estimate = (k-1) * 2^32 DIV kth_value,
    exact integer both engines."""
    du = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_partkey")
        .distinct()
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col("l_partkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    hh = du.select("l_returnflag", hv.alias("hv")).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("hv")
    kth = (
        hh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == _K)
        .select("l_returnflag", F.col("hv").alias("kth_hv"))
    )
    ex = du.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return ex.join(kth, "l_returnflag").select(
        "l_returnflag",
        "kth_hv",
        F.expr(f"CAST(({_K - 1} * {_HASH_RANGE}) DIV kth_hv AS BIGINT)").alias(
            "est_distinct"
        ),
        "exact_distinct",
    )

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
        -- NULL is not a value: COUNT(DISTINCT) semantics (r10 nullts)
        SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
        WHERE l_partkey IS NOT NULL
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
        # NULL is not a value: COUNT(DISTINCT) semantics (r10 nullts)
        .filter(F.col("l_partkey").isNotNull())
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


_CM_DEPTH = 4
_CM_WIDTH = 256


def _cm_bucket_duck(expr: str, row: int) -> str:
    """DuckDB bucket for count-min row ``row``: md5-hash mod width."""
    salted = f"'cm{row}:' || {expr}"
    return f"({_duck_hex_poly(salted)} % {_CM_WIDTH})"


def _cm_bucket_spark(col, row: int):
    """Spark bucket for count-min row ``row`` — same md5-prefix hash."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{row}:"), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % _CM_WIDTH
    )


def _cm_oracle() -> str:
    key = "CAST(l_partkey AS VARCHAR)"
    counter_rows = "\n        UNION ALL\n".join(
        f"""        SELECT {r} AS r, {_cm_bucket_duck(key, r)} AS bucket
        FROM lineitem WHERE l_partkey IS NOT NULL"""
        for r in range(_CM_DEPTH)
    )
    est_terms = ", ".join(
        f"MIN(CASE WHEN c.r = {r} AND c.bucket = t.b{r}"
        f" THEN c.cnt END)"
        for r in range(_CM_DEPTH)
    )
    top_buckets = ", ".join(
        f"{_cm_bucket_duck('CAST(l_partkey AS VARCHAR)', r)} AS b{r}"
        for r in range(_CM_DEPTH)
    )
    return f"""
    WITH cells AS (
{counter_rows}
    ), counters AS (
        SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY r, bucket
    ), top AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
               {top_buckets}
        FROM lineitem WHERE l_partkey IS NOT NULL
        GROUP BY l_partkey
        ORDER BY exact_cnt DESC, l_partkey LIMIT 20
    )
    SELECT t.l_partkey, t.exact_cnt,
           CAST(LEAST({est_terms}) AS BIGINT) AS est_cnt
    FROM top t CROSS JOIN counters c
    GROUP BY t.l_partkey, t.exact_cnt
    """


@query("q_sketch_countmin", oracle=_cm_oracle())
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 256) over lineitem part
    frequencies, evaluated against the 20 true heaviest parts: the
    mergeable heavy-hitter structure streams keep when exact per-key
    counts would need an unbounded-key shuffle. Sketch state is
    depth*width = 1024 integer cells — additive across partitions and
    across time windows (counter merge = cell-wise sum), so at 100 TB
    each executor folds its partition into 1024 cells and the reduce
    is constant-size. Estimate = min over rows of the hashed cell
    (classic Cormode-Muthukrishnan bound: overestimate only). The
    md5-prefix hash is the engine-portable one used by every sketch
    in this module, so DuckDB reproduces the cells bit-for-bit.
    Output: part, exact count, sketch estimate (est >= exact always;
    equal when no collision)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        # a NULL key hashes to no sketch cell (r10 nullts fuzz)
        .filter(F.col("l_partkey").isNotNull())
        .select(F.col("l_partkey").cast("string").alias("k"), "l_partkey")
    )
    cells = None
    for r in range(_CM_DEPTH):
        c = li.select(
            F.lit(r).alias("r"), _cm_bucket_spark(F.col("k"), r).alias("bucket")
        )
        cells = c if cells is None else cells.unionAll(c)
    counters = cells.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "l_partkey")
        .limit(20)
        .select(
            "l_partkey",
            "exact_cnt",
            *[
                _cm_bucket_spark(
                    F.col("l_partkey").cast("string"), r
                ).alias(f"b{r}")
                for r in range(_CM_DEPTH)
            ],
        )
    )
    # one broadcast equi-join per sketch row: each top key picks up
    # its 4 hashed cells by (row, bucket) lookup — no cross join
    out = top
    for r in range(_CM_DEPTH):
        cr = counters.filter(F.col("r") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
        )
        out = out.join(F.broadcast(cr), f"b{r}")
    return out.select(
        "l_partkey",
        "exact_cnt",
        F.least(*[F.col(f"c{r}") for r in range(_CM_DEPTH)])
        .cast("long")
        .alias("est_cnt"),
    )


@query(
    "q_kmv_setops",
    oracle=f"""
    WITH flags AS (
        -- NULL is not a value (COUNT DISTINCT semantics; r10 compound
        -- fuzz: the NULL-user group's NULL hash ranked NULLS-FIRST on
        -- Spark and NULLS-LAST on DuckDB, shifting the kth minimum)
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), f AS (
        SELECT user_id, in_a, in_b,
               {_duck_hex_poly("'kmv:' || CAST(user_id AS VARCHAR)")} AS hv
        FROM flags WHERE in_a = 1 OR in_b = 1
    ), rk AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM f
    ), kth AS (
        SELECT hv AS kth_hv FROM rk WHERE rk = {_K}
    ), topk AS (
        SELECT SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS p
        FROM rk WHERE rk <= {_K}
    ), ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
        FROM f
    )
    SELECT CAST(({_K - 1} * {_HASH_RANGE}) // k.kth_hv AS BIGINT)
               AS est_union,
           e.exact_union,
           CAST((t.p * (({_K - 1} * {_HASH_RANGE}) // k.kth_hv))
                // {_K} AS BIGINT) AS est_inter,
           e.exact_inter
    FROM kth k CROSS JOIN topk t CROSS JOIN ex e
    """,
)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS — the property that makes min-hash
    sketches a distributed-systems tool rather than a single counter:
    the min-k of a union is computable from the two sides' min-k
    alone, so |A ∪ B| and |A ∩ B| between clickers (A) and purchasers
    (B) come from merged 64-value states without re-scanning either
    input. Union estimate = (k-1)*2^32 DIV kth-smallest-merged-hash;
    intersection = (fraction of the k merged minima belonging to
    both sets) * union estimate, floor-divided to exact integers
    (Beyer et al. SIGMOD'07 KMV synopses). Exact counts ride along so
    the output shows the sketch error directly. At 100 TB the flag
    aggregation is the only full shuffle; everything after is a
    64-row TakeOrdered. Differentially exact vs DuckDB because the
    hash, ordering, and arithmetic are all portable integers."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()  # NULL key is not a set member
    )
    flags = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("in_a"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("in_b"),
    ).filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    f = flags.select("user_id", "in_a", "in_b", hv.alias("hv"))
    rk = f.withColumn(
        "rk", F.row_number().over(Window.orderBy("hv"))
    ).filter(F.col("rk") <= _K)
    kth = rk.filter(F.col("rk") == _K).select(F.col("hv").alias("kth_hv"))
    topk = rk.agg(
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("p")
    )
    ex = f.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("exact_inter"),
    )
    return (
        kth.crossJoin(F.broadcast(topk))
        .crossJoin(F.broadcast(ex))
        .select(
            F.expr(
                f"CAST(({_K - 1} * {_HASH_RANGE}) DIV kth_hv AS BIGINT)"
            ).alias("est_union"),
            "exact_union",
            F.expr(
                f"CAST((p * (({_K - 1} * {_HASH_RANGE}) DIV kth_hv))"
                f" DIV {_K} AS BIGINT)"
            ).alias("est_inter"),
            "exact_inter",
        )
    )


@query(
    "q_stream_countmin",
    oracle=f"""
    WITH cells AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               {_cm_bucket_duck("CAST(user_id AS VARCHAR)", 0)} AS bucket
        FROM events
        UNION ALL
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               {_cm_bucket_duck("CAST(user_id AS VARCHAR)", 1)} + {_CM_WIDTH}
        FROM events
    )
    SELECT day, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY day, bucket
    """,
)
def q_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tumbling-window count-min state: one depth-2 sketch of
    user-event frequencies PER DAY — the windowed-sketch
    materialization a streaming pipeline emits from foreachBatch so
    heavy-hitter queries over ANY time range become cell-wise sums of
    per-window states (the additivity proven in
    tests/test_round5_ops.py), never a re-scan. This is how a CDC
    consumer answers "top talkers last week" at 100 TB: merge 7
    constant-size states. Rows 0/1 are disambiguated by offsetting
    row 1's bucket by the width, keeping the state one narrow (day,
    bucket, cnt) frame — the layout a state store or compacted topic
    holds. One aggregation, map-side combinable, output bounded by
    days x (2 x 256) cells regardless of event volume."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        F.col("user_id").cast("string").alias("k"),
    )
    cells = ev.select(
        "day", _cm_bucket_spark(F.col("k"), 0).alias("bucket")
    ).unionAll(
        ev.select(
            "day",
            (_cm_bucket_spark(F.col("k"), 1) + _CM_WIDTH).alias("bucket"),
        )
    )
    return cells.groupBy("day", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )

"""Scalar-function operators (SURVEY.md §2A F1-F13).

Parity with the reference's value handling:
- F1 string ops: lower-cased key matching (`differ.py:724-726`), quote
  escaping (`repairer.py:514-516`), LIKE filters, `||` concat
- F2 date/time: DATE() truncation (`init.sql:197`), epoch extraction
  (`data-model.md:582`), ISO formatting (`repairer.py:534-535`)
- F3/F4 math + casts: ABS tolerance (`init.sql:423-431`), ROUND
- F5/F6 NULL handling + CASE (`handle-partial-updates.sql:12-42`,
  `comparer.py:247-250`)
- F8 JSON extraction (JSONB columns, `init.sql:28,112`)
- F9 array ops (`comparer.py:277-280`)
- F10 hash fingerprints (`schema_validator.py:492-508`)
- F11 interval arithmetic (`repairer.py:537-540`)

Cross-engine type policy: year()/floor()/etc. return different widths
in Spark vs DuckDB, so every such output is CAST to BIGINT on both
sides; timestamps are exchanged as epoch-millis BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 4) AS prefix4,
           REPLACE(p_name, ' ', '_') AS name_snake,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           p_brand || ':' || p_type AS brand_type
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (F1).

    brand_type uses NULL-propagating concatenation on BOTH engines
    (Spark concat() propagates NULL; DuckDB's CONCAT() silently SKIPS
    NULL arguments, so the oracle must use `||` — round-9 dim-null
    fuzzing caught ':ECONOMY' vs NULL on a NULL brand)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("prefix4"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           epoch_ms(o_orderdate) AS epoch_millis
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (F2). o_orderdate is parquet
    TIMESTAMP_NTZ; cast to session-tz (UTC) timestamp for epoch
    extraction — matching the reference's naive-timestamps-are-UTC rule
    (`comparer.py:214-218`)."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.unix_millis(ts).alias("epoch_millis"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 50000.0), 2) AS abs_diff,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + cast family (F3, F4): the ABS tolerance / ROUND patterns
    of the validation views (`init.sql:412-434`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000.0), 2).alias("abs_diff"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@query(
    "q_scalar_case_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_coalesced,
           (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O') AS is_open_nullsafe,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM orders
    """,
)
def q_scalar_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/null-safe equality (F5, F6) — the NULL-preserving
    partial-update pattern (`handle-partial-updates.sql:12-42`) and the
    comparer's null==null rule (`comparer.py:247-250`)."""
    orders = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return orders.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_coalesced"),
        status_or_null.eqNullSafe(F.lit("O")).alias("is_open_nullsafe"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


@query(
    "q_scalar_hash",
    oracle="""
    SELECT c_custkey,
           md5(CONCAT(CAST(c_custkey AS VARCHAR), '|', c_name)) AS row_md5
    FROM customer
    """,
)
def q_scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row fingerprint via md5 of canonical key string (F10; sha256
    schema fingerprint analog, `schema_validator.py:492-508`)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5(
            F.concat(F.col("c_custkey").cast("string"), F.lit("|"), F.col("c_name"))
        ).alias("row_md5"),
    )


@query(
    "q_scalar_interval",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           epoch_ms(ts + INTERVAL 1 HOUR) AS shifted_ms
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
    """,
)
def q_scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + shifted-window filter (F11;
    `repairer.py:537-540`, `NOW() - INTERVAL '24 hours'`
    `data-model.md:605`)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
        )
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.unix_millis(F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("shifted_ms"),
        )
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation (F8; JSONB columns
    `init.sql:28,112`, dict->JSON `repairer.py:549-551`)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_array_ops",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops (F9): size + element access over the embedding column
    (`comparer.py:277-280` ordered-list semantics)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
    )


@query(
    "q_scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 1365) AS xored,
           event_id << 2 AS shifted_l,
           event_id >> 3 AS shifted_r
    FROM events WHERE event_id < 1000
    """,
)
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (and/or/xor/shifts) — exact integer
    semantics, identical across engines."""
    events = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    return events.filter(e < 1000).select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(e, 2).alias("shifted_l"),
        F.shiftright(e, 3).alias("shifted_r"),
    )

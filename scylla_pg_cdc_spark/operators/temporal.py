"""Temporal join operators: as-of join and range join.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do); the scalable
construction here is the union-window form — tag both sides, union,
and carry the last right-side row forward per key with
``last(ignorenulls) over (partition by key order by ts)``:

- ONE shuffle (the window), regardless of how many right rows precede
  each left row — the naive ``join on key and r.ts <= l.ts`` +
  ``max_by`` explodes to O(left x matching-right) intermediate rows
  and is never acceptable at 100 TB;
- skew behaves like any window (hot keys can salt on a ts-bucket
  prefix if needed).

The range join keeps its equi-key as the hash-join key and applies the
interval predicate as a post-join filter, so Catalyst plans a real
hash/SMJ join, not a nested loop.

Oracles: the as-of query cross-validates against DuckDB's NATIVE
``ASOF LEFT JOIN`` — two independent implementations of the operator
must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row: the latest right row with the same key and
    ``right_ts <= left_ts`` (NULL-extended when none). Union-window
    construction, one shuffle. Right rows sort before left rows at
    equal timestamps, so an exactly-simultaneous right row IS visible
    (matching DuckDB ASOF's ``>=``).

    ``right_tiebreak``: column making the pick deterministic when
    several right rows share (key, ts) — the row with the MINIMUM
    tiebreak wins (without it, ``last(ignorenulls)`` picks whichever
    tied row the shuffle happened to order last, and a differential
    oracle can flake).

    NULL semantics (r10 nullts fuzz): SQL three-valued logic, same as
    DuckDB's native ASOF — a right row with NULL ts or NULL key can
    never satisfy ``right_ts <= left_ts AND key = key`` and is DROPPED
    (without this, a NULL-ts right row sorts NULLS-FIRST into the
    window and its non-null payload is carried as "latest"); a left
    row with NULL ts or NULL key gets the left-join NULL extension
    (it sorts NULLS FIRST, before every surviving right row, so the
    running carry sees nothing — pinned explicitly below)."""
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lcols = left.columns
    right = right.filter(
        F.col(right_ts).isNotNull() & F.col(right_on).isNotNull()
    )
    l2 = left.select(
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in value_cols],
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *(
            [F.lit(None).cast(rtypes[right_tiebreak]).alias("__tb")]
            if right_tiebreak
            else []
        ),
    )
    r2 = right.select(
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *([F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []),
    )
    # among right rows tied on (__k, __ts), DESC tiebreak puts the
    # MIN-tiebreak row last, which is the one last(ignorenulls) carries.
    # NULLS FIRST pinned: a NULL-ts LEFT row must sort before every
    # right row so it gets the no-match NULL extension (right NULL ts
    # rows were dropped above).
    order = [F.asc_nulls_first("__ts"), "__src"] + (
        [F.desc_nulls_last("__tb")] if right_tiebreak else []
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        *lcols,
        "__src",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__src") == 1).select(
        *lcols, *[F.col(f"__r_{c}").alias(c) for c in value_cols]
    )


@query(
    "q_asof_join",
    oracle="""
    WITH ev AS (
        -- one row per (user, ms): MIN(event_id) — the same
        -- deterministic tie rule the Spark side applies via
        -- right_tiebreak, so equal-timestamp events can never make
        -- the two engines pick different rows. NULL-ts / NULL-key
        -- events are excluded EXPLICITLY: DuckDB's native ASOF does
        -- not follow three-valued logic for NULLs (r10 nullts fuzz:
        -- it paired a NULL probe with a NULL build row), so the NULL
        -- contract must live in the SQL, not the operator.
        SELECT user_id, epoch_ms(ts) AS ev_ms, MIN(event_id) AS event_id
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id, epoch_ms(ts)
    ), o AS (
        SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS order_ms
        FROM orders
    )
    SELECT o.o_orderkey, o.o_custkey, o.order_ms,
           CAST(COALESCE(e.event_id, -1) AS BIGINT) AS last_event_id,
           CAST(COALESCE(e.ev_ms, -1) AS BIGINT) AS last_event_ms
    FROM (SELECT * FROM o
          WHERE order_ms IS NOT NULL AND o_custkey IS NOT NULL) o
    ASOF LEFT JOIN ev e
      ON o.o_custkey = e.user_id AND o.order_ms >= e.ev_ms
    UNION ALL
    -- a NULL-ts or NULL-key probe can match nothing (SQL 3VL):
    -- NULL-extended by definition
    SELECT o_orderkey, o_custkey, order_ms,
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM o WHERE order_ms IS NULL OR o_custkey IS NULL
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each order picks the user's latest event at-or-
    before the order timestamp. The oracle uses DuckDB's NATIVE ASOF
    JOIN — an independent implementation the union-window plan must
    match row-for-row; its right side is pre-reduced to one row per
    (user, ms) with MIN(event_id), the identical tie rule the Spark
    window applies, so the differential is deterministic. -1 sentinels
    stand in for no-match NULLs (keeps both engines' dtypes
    integral)."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ev_ms")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_ms"),
    )
    joined = asof_join(
        orders, events,
        left_on="o_custkey", right_on="user_id",
        left_ts="order_ms", right_ts="ev_ms",
        value_cols=["event_id", "ev_ms"],
        right_tiebreak="event_id",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_ms",
        F.coalesce("event_id", F.lit(-1)).alias("last_event_id"),
        F.coalesce("ev_ms", F.lit(-1)).alias("last_event_ms"),
    )


@query(
    "q_range_join",
    oracle="""
    SELECT anchor_id,
           CAST(COUNT(event_id) AS BIGINT) AS n_follow,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM (
        SELECT s.event_id AS anchor_id, e.event_id, e.event_type
        FROM events s
        JOIN events e
          ON e.user_id = s.user_id
         AND epoch_ms(e.ts) > epoch_ms(s.ts)
         AND epoch_ms(e.ts) <= epoch_ms(s.ts) + 3600000
        WHERE s.event_type = 'signup'
    )
    GROUP BY anchor_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for every signup event, the same user's
    activity in the following hour (attribution-window shape). The
    user-key equality drives a hash join; the time interval is a
    post-join filter — never a nested loop. Signups with no follow-up
    drop out (inner)."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ev_ms")
    )
    anchors = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("anchor_id"),
        F.col("ev_ms").alias("a_ms"),
    )
    hour = 3_600_000
    return (
        anchors.join(
            events,
            (events.user_id == anchors.a_user)
            & (events.ev_ms > anchors.a_ms)
            & (events.ev_ms <= anchors.a_ms + hour),
        )
        .groupBy("anchor_id")
        .agg(
            F.count("event_id").alias("n_follow"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
        )
    )


@query(
    "q_gapfill_locf",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               epoch_ms(ts) // 3600000 AS hb,
               epoch_ms(ts) AS ts_ms,
               event_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ), picked AS (
        SELECT user_id, hb, vc FROM (
            SELECT user_id, hb, vc,
                   ROW_NUMBER() OVER (PARTITION BY user_id, hb
                                      ORDER BY ts_ms DESC, event_id DESC)
                       AS rn
            FROM ev
        ) WHERE rn = 1
    ), bounds AS (
        SELECT user_id, MIN(hb) AS min_hb, MAX(hb) AS max_hb
        FROM ev GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(min_hb, max_hb)) AS hb
        FROM bounds
    )
    SELECT g.user_id, g.hb,
           last_value(p.vc IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS vc_filled,
           CAST(p.vc IS NOT NULL AS BOOLEAN) AS observed
    FROM grid g
    LEFT JOIN picked p ON g.user_id = p.user_id AND g.hb = p.hb
    """,
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap-fill with last-observation-carried-forward —
    the hypertable ``time_bucket_gapfill(..) + locf(..)`` shape
    (TimescaleDB-style continuous time series from an irregular event
    stream). Per user: hourly buckets from first to last event, each
    empty bucket filled with the user's most recent observed value
    (deterministic pick inside a bucket: latest (ts, event_id)).
    The dense grid is generated ROW-LOCALLY per user with
    sequence()/explode — no cross-join against a calendar table — so
    grid size is Σ per-user spans; the fill is one
    last(ignorenulls) window per user partition. At 100 TB,
    partitioning the output by time bucket keeps downstream scans
    partition-pruned; values are exact integer cents so the fill is
    bit-stable cross-engine."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.expr("unix_millis(ts) DIV 3600000").alias("hb"),
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
        )
    )
    w_pick = Window.partitionBy("user_id", "hb").orderBy(
        F.col("ts_ms").desc(), F.col("event_id").desc()
    )
    picked = (
        ev.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "hb", "vc")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("hb").alias("min_hb"), F.max("hb").alias("max_hb"))
        .select(
            "user_id",
            F.explode(F.sequence("min_hb", "max_hb")).alias("hb"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(picked, ["user_id", "hb"], "left")
        .select(
            "user_id",
            "hb",
            F.last("vc", ignorenulls=True).over(w_fill).alias("vc_filled"),
            F.col("vc").isNotNull().alias("observed"),
        )
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
               epoch_ms(ts) AS ts_ms,
               event_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ), rn AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, hour_ms
                   ORDER BY ts_ms, event_id
               ) AS rna,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, hour_ms
                   ORDER BY ts_ms DESC, event_id DESC
               ) AS rnd
        FROM ev
    )
    SELECT event_type, CAST(hour_ms AS BIGINT) AS hour_ms,
           CAST(MAX(CASE WHEN rna = 1 THEN vc END) AS BIGINT) AS open_c,
           CAST(MAX(vc) AS BIGINT) AS high_c,
           CAST(MIN(vc) AS BIGINT) AS low_c,
           CAST(MAX(CASE WHEN rnd = 1 THEN vc END) AS BIGINT) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(vc) AS BIGINT) AS vol_c
    FROM rn GROUP BY event_type, hour_ms
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the
    time-series downsampling shape every monitoring/trading consumer
    of a CDC feed materializes (the reference's warehouse rollup
    views, `docker/postgres/init.sql:195-206`, as candlesticks).

    Open/close are first/last by (ts, event_id) — picked with two
    row_number windows over the SAME (type, hour) partitioning and
    folded in the grouped aggregation via MAX(CASE WHEN rn=1 ...), so
    the whole query is one shuffle: the window partition key equals
    the groupBy key and AQE coalesces them into a single exchange.
    Values quantized to exact cents (the repo's money convention,
    `functions/money.py`); ties broken deterministically by event_id.
    Bars partition perfectly at 100 TB — (type, hour) cardinality
    grows with time span, not data volume, and no bar ever exceeds one
    hour of one type's events."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.expr("(unix_millis(ts) DIV 3600000) * 3600000").alias(
                "hour_ms"
            ),
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
        )
    )
    part = Window.partitionBy("event_type", "hour_ms")
    rn = ev.withColumn(
        "rna",
        F.row_number().over(part.orderBy("ts_ms", "event_id")),
    ).withColumn(
        "rnd",
        F.row_number().over(
            part.orderBy(F.desc("ts_ms"), F.desc("event_id"))
        ),
    )
    return rn.groupBy("event_type", "hour_ms").agg(
        F.max(F.when(F.col("rna") == 1, F.col("vc")))
        .cast("long")
        .alias("open_c"),
        F.max("vc").cast("long").alias("high_c"),
        F.min("vc").cast("long").alias("low_c"),
        F.max(F.when(F.col("rnd") == 1, F.col("vc")))
        .cast("long")
        .alias("close_c"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vc").cast("long").alias("vol_c"),
    )


@query(
    "q_attribution_pairs",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_ms(ts) AS view_ms
        FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
        FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id, v.view_id, c.click_id, v.view_ms, c.click_ms
    FROM v JOIN c
      ON v.user_id = c.user_id
     AND c.click_ms > v.view_ms
     AND c.click_ms <= v.view_ms + 3600000
    """,
)
def q_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->click attribution interval join (60-min window) — the
    BATCH face of the stream-stream watermarked join in
    ``streaming/joins.py`` (same filter/join tree; the streaming run
    is proven row-identical in tests/test_stream_join.py). Registered
    here so the driver's differential gate covers the join tree both
    execution modes share. Equi-key on user_id keeps it a real hash
    join with the interval predicate as a post-join filter; at 100 TB
    the streaming form bounds state by the watermark horizon while
    this batch form shuffles once per side."""
    from scylla_pg_cdc_spark.streaming.joins import attribution_pairs_batch

    return attribution_pairs_batch(spark, sf_dir, gap_minutes=60)


@query(
    "q_attribution_last_touch",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_ms(ts) AS view_ms
        FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
        FROM events WHERE event_type = 'click'
    ), pairs AS (
        SELECT c.user_id, c.click_id, c.click_ms, v.view_id, v.view_ms,
               ROW_NUMBER() OVER (
                   PARTITION BY c.click_id
                   ORDER BY v.view_ms DESC, v.view_id DESC
               ) AS rn
        FROM c JOIN v
          ON v.user_id = c.user_id
         AND v.view_ms < c.click_ms
         AND v.view_ms >= c.click_ms - 3600000
    )
    SELECT user_id, click_id, click_ms, view_id AS attributed_view,
           CAST(click_ms - view_ms AS BIGINT) AS touch_gap_ms
    FROM pairs WHERE rn = 1
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: each click credits the single most
    recent view by the same user within the preceding hour — the
    business model marketers actually bill on, vs the all-pairs
    interval join (``q_attribution_pairs``) that feeds it. The pick
    is a per-click rn=1 over (view_ms DESC, view_id DESC): the
    deterministic tie rule, and exactly an AS-OF JOIN with a lower
    bound — same user-keyed hash join + bounded interval as the pair
    query, one extra window on the click partition (clicks x their
    in-window views only, never the raw streams)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_millis("ts").alias("view_ms"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_millis("ts").alias("click_ms"),
    )
    pairs = c.join(v, "user_id").filter(
        (F.col("view_ms") < F.col("click_ms"))
        & (F.col("view_ms") >= F.col("click_ms") - 3600000)
    )
    rn = F.row_number().over(
        Window.partitionBy("click_id").orderBy(
            F.desc("view_ms"), F.desc("view_id")
        )
    )
    return (
        pairs.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "click_id",
            "click_ms",
            F.col("view_id").alias("attributed_view"),
            (F.col("click_ms") - F.col("view_ms"))
            .cast("long")
            .alias("touch_gap_ms"),
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row: the EARLIEST right row with the same key
    and ``right_ts >= left_ts`` (NULL-extended when none) — the
    forward/next-event direction of ``asof_join``, same union-window
    construction mirrored: right rows sort AFTER left rows at equal
    timestamps (so an exactly-simultaneous right row is visible,
    matching DuckDB forward ASOF's ``<=``) and the carry is
    first(ignorenulls) over the FOLLOWING frame.

    ``right_tiebreak``: deterministic pick among right rows tied on
    (key, ts) — the MINIMUM tiebreak wins (same rule as
    ``asof_join``).

    NULL semantics (r10 nullts fuzz): same three-valued rule as
    ``asof_join`` — NULL-ts/NULL-key right rows dropped; a NULL-ts
    left row sorts NULLS LAST here (the frame looks FORWARD, so
    "after everything" is the position where the carry sees nothing
    and the row NULL-extends)."""
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lcols = left.columns
    right = right.filter(
        F.col(right_ts).isNotNull() & F.col(right_on).isNotNull()
    )
    l2 = left.select(
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in value_cols],
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *(
            [F.lit(None).cast(rtypes[right_tiebreak]).alias("__tb")]
            if right_tiebreak
            else []
        ),
    )
    r2 = right.select(
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *([F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []),
    )
    # ASC tiebreak: the first right row first(ignorenulls) reaches in
    # the FOLLOWING frame is the min-tiebreak row of the earliest ts.
    # NULLS LAST pinned: a NULL-ts LEFT row must sort after every
    # right row so the forward-looking carry sees nothing (mirror of
    # the backward join's NULLS FIRST).
    order = [F.asc_nulls_last("__ts"), "__src"] + (
        [F.asc_nulls_last("__tb")] if right_tiebreak else []
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = l2.unionByName(r2).select(
        *lcols,
        "__src",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__src") == 0).select(
        *lcols, *[F.col(f"__r_{c}").alias(c) for c in value_cols]
    )


@query(
    "q_asof_join_forward",
    oracle="""
    WITH ev AS (
        -- MIN(event_id) per (user, ms): the Spark side's tie rule,
        -- see q_asof_join (including the explicit NULL exclusions —
        -- DuckDB's native ASOF has its own NULL pairing quirk)
        SELECT user_id, epoch_ms(ts) AS ev_ms, MIN(event_id) AS event_id
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id, epoch_ms(ts)
    ), o AS (
        SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS order_ms
        FROM orders
    )
    SELECT o.o_orderkey, o.o_custkey, o.order_ms,
           CAST(COALESCE(e.event_id, -1) AS BIGINT) AS next_event_id,
           CAST(COALESCE(e.ev_ms, -1) AS BIGINT) AS next_event_ms
    FROM (SELECT * FROM o
          WHERE order_ms IS NOT NULL AND o_custkey IS NOT NULL) o
    ASOF LEFT JOIN ev e
      ON o.o_custkey = e.user_id AND o.order_ms <= e.ev_ms
    UNION ALL
    SELECT o_orderkey, o_custkey, order_ms,
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM o WHERE order_ms IS NULL OR o_custkey IS NULL
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each order picks the user's EARLIEST event
    at-or-after the order timestamp — the "next reading after the
    request" direction (reaction-time / time-to-first-event analyses)
    that completes the as-of pair. Cross-validated against DuckDB's
    native forward ASOF JOIN (``<=``) — two independent
    implementations again. Same single-shuffle scale shape as the
    backward join; -1 sentinels for no-match keep dtypes integral."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ev_ms")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_ms"),
    )
    joined = asof_join_forward(
        orders, events,
        left_on="o_custkey", right_on="user_id",
        left_ts="order_ms", right_ts="ev_ms",
        value_cols=["event_id", "ev_ms"],
        right_tiebreak="event_id",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_ms",
        F.coalesce("event_id", F.lit(-1)).alias("next_event_id"),
        F.coalesce("ev_ms", F.lit(-1)).alias("next_event_ms"),
    )


@query(
    "q_attribution_first_touch",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_ms(ts) AS view_ms
        FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
        FROM events WHERE event_type = 'click'
    ), pairs AS (
        SELECT c.user_id, c.click_id, c.click_ms, v.view_id, v.view_ms,
               ROW_NUMBER() OVER (
                   PARTITION BY c.click_id
                   ORDER BY v.view_ms ASC, v.view_id ASC
               ) AS rn
        FROM c JOIN v
          ON v.user_id = c.user_id
         AND v.view_ms < c.click_ms
         AND v.view_ms >= c.click_ms - 3600000
    )
    SELECT user_id, click_id, click_ms, view_id AS attributed_view,
           CAST(click_ms - view_ms AS BIGINT) AS touch_gap_ms
    FROM pairs WHERE rn = 1
    """,
)
def q_attribution_first_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIRST-TOUCH attribution: each click credits the EARLIEST view
    by the same user within the preceding hour — the discovery-credit
    policy, vs ``q_attribution_last_touch``'s conversion-credit. The
    implementation differs in exactly one thing — the rn=1 window's
    ORDER BY flips to (view_ms ASC, view_id ASC) — the demonstration
    that attribution policy is a pluggable ordering over the same
    bounded interval join, the same lesson as the survivorship pair.
    Same single-shuffle scale shape as last-touch."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_millis("ts").alias("view_ms"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_millis("ts").alias("click_ms"),
    )
    pairs = c.join(v, "user_id").filter(
        (F.col("view_ms") < F.col("click_ms"))
        & (F.col("view_ms") >= F.col("click_ms") - 3600000)
    )
    rn = F.row_number().over(
        Window.partitionBy("click_id").orderBy("view_ms", "view_id")
    )
    return (
        pairs.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "click_id",
            "click_ms",
            F.col("view_id").alias("attributed_view"),
            (F.col("click_ms") - F.col("view_ms"))
            .cast("long")
            .alias("touch_gap_ms"),
        )
    )

"""Event-analytics operators: funnel + retention cohorts.

The warehouse-side event analyses a CDC pipeline's consumers run over
the replicated events table (the reference's warehouse views,
`docker/postgres/init.sql:195-206`, generalized): ordered funnel
conversion and cohort retention. Both are exact-integer outputs with
full SQL oracles.

Scale shape: per-user scalars (funnel stage timestamps, cohort day)
are keyed aggregations — each step is one shuffle on user_id and the
step joins stay on that same key, so a clustered-by-user layout runs
the whole funnel without a single repartition.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


def floordiv_sql(num: str, den: str) -> str:
    """Exact integer ``floor(num/den)`` for ``den > 0`` as Spark SQL,
    in pure int64 arithmetic (no float detour).

    CAUTION (measured round 9, DuckDB 1.0.0): DuckDB's integer ``//``
    TRUNCATES toward zero exactly like Spark's ``DIV`` — the two
    engines already agree on a bare DIV for every sign. Pair this
    helper only with an oracle that spells out the same floor
    rearrangement; pairing it with a plain ``//`` oracle diverges by
    one on negative non-exact numerators (found by the
    q_ivf_epoch_maintenance sf0.001 gate)."""
    return (
        f"((({num}) DIV ({den}))"
        f" - (CASE WHEN ({num}) < 0 AND ({num}) % ({den}) != 0"
        f" THEN 1 ELSE 0 END))"
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ), s1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t1
        FROM ev GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, s1.t1, MIN(e.ts_ms) AS t2
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts_ms > s1.t1
        GROUP BY e.user_id, s1.t1
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts_ms) AS t3
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(s1.t1) AS BIGINT) AS n_signup,
           CAST(COUNT(s2.t2) AS BIGINT) AS n_signup_view,
           CAST(COUNT(s3.t3) AS BIGINT) AS n_signup_view_purchase
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    WHERE s1.t1 IS NOT NULL
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> view -> purchase: each stage counts
    users whose stage event happened strictly AFTER their previous
    stage's first event (not merely users who did all three in any
    order — the distinction that makes funnels order-sensitive).
    Three keyed aggregations, all on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t1")
    ).filter(F.col("t1").isNotNull())
    s2 = (
        ev.join(s1, "user_id")
        .filter((F.col("event_type") == "view") & (F.col("ts_ms") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts_ms") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_signup"),
            F.count("t2").alias("n_signup_view"),
            F.count("t3").alias("n_signup_view_purchase"),
        )
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH ev AS (
        SELECT user_id, date_trunc('day', ts) AS day FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT)
               AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM ev e JOIN cohort c ON e.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, e.day) <= 7
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day,
    counted as active on each of the following 7 day-offsets. Two
    keyed aggregations + one join on user_id; the matrix itself is
    tiny (days x 8)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
            "user_id",
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "q_copurchase_pairs",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM op a
    JOIN op b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    ORDER BY support DESC, part_a, part_b
    LIMIT 50
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-ordered in the same order,
    ranked by support — the frequent-itemset primitive behind
    'bought-together' recommendation and co-occurrence features. The
    pair expansion is basket-LOCAL: one groupBy collects each order's
    distinct part set (k <= 7 here) and the k(k-1)/2 ordered pairs
    expand row-locally from the sorted set — bounded per basket, never
    corpus-quadratic, and the support aggregation gets map-side
    partial combine. r12 (guide §2.4): this replaces the basket-key
    SELF-JOIN form, which paid a distinct exchange plus TWO join-side
    re-exchanges-with-sorts of the same frame (4 shuffles -> 2,
    measured 1.89 -> faster at sf0.1; identical pair multiset — the
    sorted distinct set expands exactly the a.part < b.part join
    output, and NULL basket keys are filtered explicitly because an
    equi-join drops them while groupBy would keep the NULL group).
    At 100 TB the same plan holds while baskets stay bounded;
    degenerate mega-baskets (a key owning thousands of lines) are the
    skew case — cap or salt them."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(parts, (x, i) ->"
            " transform(slice(parts, i + 2, size(parts)),"
            " y -> struct(x AS part_a, y AS part_b))))"
        )
    ).alias("p")
    return (
        baskets.select(pair)
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "q_event_twap",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc,
               epoch_ms(ts) AS ts_ms,
               LEAD(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts) NULLS FIRST, event_id
               ) AS next_ms
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(vc * (next_ms - ts_ms))
                // SUM(next_ms - ts_ms) AS BIGINT) AS twap_cents
    FROM ev
    WHERE next_ms IS NOT NULL AND next_ms > ts_ms
    GROUP BY user_id
    """,
)
def q_event_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP/metrics shape:
    each observation counts for how long it was the live value, not
    once per sample — irregular sampling stops biasing the mean).
    Dwell = time to the next event (lead window); the weighted mean is
    exact-bigint floor(Σ(v*dwell) / Σ(dwell)) — FLOOR division, not
    truncation, matched explicitly on the Spark side (Spark's DIV
    truncates toward zero while DuckDB's // floors, so a negative
    numerator would silently diverge; the denominator is always > 0
    by the dwell filter). One lead window + one aggregation, both on
    the user_id partition."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
            F.unix_millis("ts").alias("ts_ms"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    ev = ev.withColumn("next_ms", F.lead("ts_ms").over(w))
    return (
        ev.filter(F.col("next_ms").isNotNull() & (F.col("next_ms") > F.col("ts_ms")))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            # plain DIV: DuckDB's integer // truncates exactly like
            # Spark DIV (see floordiv_sql CAUTION), so the oracle's
            # // matches for negative-value events too
            F.expr(
                "CAST(SUM(vc * (next_ms - ts_ms))"
                " DIV SUM(next_ms - ts_ms) AS BIGINT)"
            ).alias("twap_cents"),
        )
    )


@query(
    "q_event_trend",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS y,
               (epoch_ms(ts) - MIN(epoch_ms(ts)) OVER (PARTITION BY user_id))
                   // 60000 AS x
        FROM events WHERE value IS NOT NULL
    ), s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM ev GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(FLOOR((n * sxy - sx * sy) * 1.0
                      / ((n * sxx - sx * sx) * 1.0)
                      * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
           CAST(FLOOR((n * sxy - sx * sy) * 1.0
                      / (sqrt((n * sxx - sx * sx) * 1.0)
                         * sqrt((n * syy - sy * sy) * 1.0))
                      * 1000.0 + 0.5) AS BIGINT) AS corr_milli
    FROM s
    WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def q_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trend detection: ordinary-least-squares slope of event
    value over time (micro-cents per minute) plus the Pearson
    correlation (milli-units) — the grouped-regression shape behind
    drift monitors and engagement trend features. Time normalizes to
    minutes since the user's first event (keeps every moment sum
    inside exact bigint range) and values to integer cents, so all
    five sufficient statistics are order-independent exact integers;
    only the final slope/corr division is float, built from
    +,-,*,/,sqrt on identical inputs — bit-stable cross-engine. One
    window (per-user min) + one aggregation."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("y"),
            F.unix_millis("ts").alias("ts_ms"),
        )
        .withColumn(
            "x",
            F.expr(
                "(ts_ms - MIN(ts_ms) OVER (PARTITION BY user_id)) DIV 60000"
            ),
        )
    )
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.floor(
        num * F.lit(1.0) / (denx * F.lit(1.0)) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    corr = F.floor(
        num * F.lit(1.0)
        / (F.sqrt(denx * F.lit(1.0)) * F.sqrt(deny * F.lit(1.0)))
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        s.filter((F.col("n") >= 10) & (denx > 0) & (deny > 0))
        .select(
            "user_id",
            "n",
            slope.alias("slope_micro"),
            corr.alias("corr_milli"),
        )
    )


@query(
    "q_event_autocorr",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS y,
               LEAD(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts) NULLS FIRST, event_id
               ) AS ynext
        FROM events WHERE value IS NOT NULL
    ), s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sx,
               CAST(SUM(ynext) AS BIGINT) AS sy,
               CAST(SUM(y * ynext) AS BIGINT) AS sxy,
               CAST(SUM(y * y) AS BIGINT) AS sxx,
               CAST(SUM(ynext * ynext) AS BIGINT) AS syy
        FROM ev WHERE ynext IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(FLOOR((n * sxy - sx * sy) * 1.0
                      / (sqrt((n * sxx - sx * sx) * 1.0)
                         * sqrt((n * syy - sy * sy) * 1.0))
                      * 1000.0 + 0.5) AS BIGINT) AS autocorr_milli
    FROM s
    WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def q_event_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values: Pearson
    correlation between consecutive observations (y_t, y_{t+1}) in
    event order — the signal that separates trending/sticky metrics
    (autocorr near 1) from noise (near 0) and oscillation (negative),
    used for seasonality detection and anomaly-detector tuning. Same
    exactness discipline as q_event_trend: values quantize to integer
    cents, all six sufficient statistics are order-independent exact
    bigints, and only the final correlation is float built from
    +,-,*,/,sqrt — bit-stable cross-engine. One lead window + one
    aggregation, both on the user_id partition (a clustered-by-user
    layout runs this with zero extra shuffles at 100 TB)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("y"),
            F.unix_millis("ts").alias("ts_ms"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    pairs = (
        ev.withColumn("ynext", F.lead("y").over(w))
        .filter(F.col("ynext").isNotNull())
    )
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sx"),
        F.sum("ynext").alias("sy"),
        F.sum(F.col("y") * F.col("ynext")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
        F.sum(F.col("ynext") * F.col("ynext")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.floor(
        num * F.lit(1.0)
        / (F.sqrt(denx * F.lit(1.0)) * F.sqrt(deny * F.lit(1.0)))
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        s.filter((F.col("n") >= 10) & (denx > 0) & (deny > 0))
        .select("user_id", "n", corr.alias("autocorr_milli"))
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) NULLS FIRST, event_id
               ) AS prev_type
        FROM events
    ), c AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ), tot AS (
        SELECT prev_type, SUM(n) AS row_total FROM c GROUP BY prev_type
    )
    SELECT c.prev_type, c.next_type, c.n,
           CAST((1000000 * c.n) // t.row_total AS BIGINT) AS p_ppm
    FROM c JOIN tot t ON c.prev_type = t.prev_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: count (prev -> next) adjacencies via one lag window, then
    row-normalize to exact ppm probabilities — the sequence statistics
    a session-based recommender or anomalous-flow detector trains on.
    One window (user partition) + two vocabulary-sized aggregations;
    the row-total join is broadcast (|event types|^2 rows)."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.unix_millis("ts"), F.col("event_id")
            )
        )
        .alias("prev_type"),
    )
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        c.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("CAST((1000000 * n) DIV row_total AS BIGINT)").alias(
                "p_ppm"
            ),
        )
    )


_SEQ_PATTERNS = (
    ("triple_error_run", "eee"),
    ("adjacent_view_click_purchase", "vcp"),
    ("signup_first", "^s"),
    ("repeat_purchase_run", "pp"),
)


@query(
    "q_sequence_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY epoch_ms(ts) NULLS FIRST, event_id) AS s
        FROM events GROUP BY user_id
    ), tot AS (SELECT COUNT(*) AS n_total FROM seq)
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS pattern,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(s, '{rx}'))
                AS BIGINT) AS n_users,
           CAST((1000000 * COUNT(*) FILTER (
                     WHERE regexp_matches(s, '{rx}')))
                // MIN(t.n_total) AS BIGINT) AS share_ppm
    FROM seq CROSS JOIN tot t
    """
        for name, rx in _SEQ_PATTERNS
    ),
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event histories — the
    MATCH_RECOGNIZE workaround: each user's events collapse to an
    ordered initial-letter string (one aggregation, bounded by events
    per user), and behavioral patterns become plain regexes evaluated
    row-locally (triple error run, adjacent view->click->purchase,
    signup-first, repeat purchases). Only regex constructs with
    identical semantics in Java regex and RE2 are used (literals,
    anchors — no backrefs/lookaround), so the DuckDB oracle is exact.
    At 100 TB this is one user-keyed shuffle; the per-user string is
    bounded by session length, and patterns extend without replanning
    (they're data, not plan)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_millis("ts").alias("ts_ms"),
            F.col("event_id").alias("eid"),
            F.substring("event_type", 1, 1).alias("i"),
        ).alias("x"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("x")), lambda x: x["i"]
            ),
            "",
        ).alias("s")
    )
    # ONE aggregation computes every pattern's count plus the total;
    # the per-pattern rows then explode from a struct array — the
    # string build and regex evaluation run in a single pass instead
    # of once per pattern.
    agg = seq.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum(F.col("s").rlike(rx).cast("long")).alias(f"m{i}")
            for i, (_, rx) in enumerate(_SEQ_PATTERNS)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("pattern"),
                F.col(f"m{i}").alias("n_users"),
                F.expr(f"CAST((1000000 * m{i}) DIV n_total AS BIGINT)").alias(
                    "share_ppm"
                ),
            )
            for i, (name, _) in enumerate(_SEQ_PATTERNS)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.pattern", "r.n_users", "r.share_ppm"
    )


_OVERLAP_TTL_MS = 300_000  # each event counts as "active" for 5 minutes
_OVERLAP_DAY_MS = 86_400_000


@query(
    "q_interval_overlap",
    oracle=f"""
    WITH d AS (
        -- a NULL-ts event has no position on the sweep line (r10
        -- nullts fuzz): excluded on BOTH engines by definition
        SELECT event_type, epoch_ms(ts) AS t, 1 AS dlt FROM events
        WHERE ts IS NOT NULL
        UNION ALL
        SELECT event_type, epoch_ms(ts) + {_OVERLAP_TTL_MS}, -1 FROM events
        WHERE ts IS NOT NULL
    ), net AS (
        SELECT event_type, t, CAST(SUM(dlt) AS BIGINT) AS net
        FROM d GROUP BY event_type, t
    ), run AS (
        SELECT event_type, t,
               SUM(net) OVER (
                   PARTITION BY event_type ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS conc
        FROM net
    ), pk AS (
        SELECT event_type, t, conc,
               MAX(conc) OVER (PARTITION BY event_type) AS pkc
        FROM run
    )
    SELECT event_type,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(MIN(CASE WHEN conc = pkc THEN t END) AS BIGINT)
               AS peak_first_ms,
           CAST(COUNT(*) AS BIGINT) AS n_timepoints
    FROM pk GROUP BY event_type
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval-overlap: peak number of simultaneously
    "active" events per type, where an event is active for 5 minutes
    after its timestamp (the live-sessions / connection-concurrency
    gauge the reference samples point-in-time via pg_stat_activity,
    `src/monitoring/metrics.py:24-85`, computed exactly over history).

    Classic sweep: +1 at each start, -1 at each expiry, sort, running
    sum, max.  The naive form windows over ``PARTITION BY event_type``
    — with a handful of types that is a per-type serial scan, the one
    low-cardinality-partition trap in this suite.  So the Spark plan is
    the TWO-PHASE parallel prefix sum: running sums are computed inside
    (event_type, day) slices — thousands of fine partitions — and each
    slice's opening offset comes from a tiny per-day net table (types ×
    days rows) that cumulates per-day deltas and broadcast-joins back.
    conc(t) = day_offset(type, day(t)) + running_within_day(t).  The
    oracle keeps the naive single-window form, so the equality check
    proves the decomposition; at 100 TB the slice width just narrows
    (hour/minute) to keep partitions bounded.  All-integer output."""
    ev = (
        load_table(spark, sf_dir, "events")
        # NULL-ts events have no sweep-line position (matches oracle)
        .filter(F.col("ts").isNotNull())
        .select("event_type", F.unix_millis("ts").alias("s"))
    )
    deltas = ev.select("event_type", F.col("s").alias("t"), F.lit(1).alias("dlt")).unionAll(
        ev.select(
            "event_type",
            (F.col("s") + F.lit(_OVERLAP_TTL_MS)).alias("t"),
            F.lit(-1).alias("dlt"),
        )
    )
    from scylla_pg_cdc_spark.functions.sweep import two_phase_running_sum

    net = deltas.groupBy("event_type", "t").agg(
        F.sum("dlt").cast("long").alias("net")
    )
    run = two_phase_running_sum(
        net, "event_type", "t", "net", _OVERLAP_DAY_MS, out_col="conc"
    ).select("event_type", "t", "conc")
    pk = run.withColumn(
        "pkc", F.max("conc").over(Window.partitionBy("event_type"))
    )
    return pk.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.min(F.when(F.col("conc") == F.col("pkc"), F.col("t")))
        .cast("long")
        .alias("peak_first_ms"),
        F.count(F.lit(1)).alias("n_timepoints"),
    )


@query(
    "q_event_lateness",
    oracle="""
    WITH pos AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
               event_id + CASE WHEN event_id % 7 = 0 THEN 10 ELSE 0 END
                   AS arr_pos
        FROM events
    ), arr AS (
        SELECT user_id, event_type, ts_ms, event_id,
               MAX(ts_ms) OVER (
                   PARTITION BY user_id ORDER BY arr_pos, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS seen_ms
        FROM pos
    ), late AS (
        SELECT event_type,
               GREATEST(seen_ms - ts_ms, 0) AS late_ms
        FROM arr
    )
    SELECT event_type,
           CASE WHEN late_ms = 0 THEN 'on_time'
                WHEN late_ms < 60000 THEN 'lt_1m'
                WHEN late_ms < 300000 THEN 'lt_5m'
                WHEN late_ms < 1800000 THEN 'lt_30m'
                ELSE 'ge_30m' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
    FROM late GROUP BY event_type, bucket
    """,
)
def q_event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order lateness profile — the measurement that CALIBRATES
    watermark delay (the `withWatermark` knob every streaming operator
    in this engine takes; the reference hard-codes its tolerance in
    the 30-60 s replication-lag alert, `src/monitoring/metrics.py`).
    Arrival order is event_id (the CDC log offset proxy in this
    schema) with every 7th offset deterministically delayed by 10
    slots — the synthetic testdata arrives perfectly ordered, so the
    query injects bounded disorder the same way ``q_stream_dedup``
    injects duplicates (the oracle mirrors the injection exactly).
    Lateness of an event = how far the per-user max event time had
    already advanced past it when it arrived. Bucketed exact-integer
    histogram per event type — read off the p99 bucket and set the
    watermark delay there. One user_id window (running max over the
    high-cardinality key, no low-cardinality trap) + one aggregation."""
    arr_w = (
        Window.partitionBy("user_id")
        .orderBy("arr_pos", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = (
        load_table(spark, sf_dir, "events")
        .withColumn(
            "arr_pos",
            F.col("event_id")
            + F.when(F.col("event_id") % 7 == 0, 10).otherwise(0),
        )
        .select(
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            F.max(F.unix_millis("ts")).over(arr_w).alias("seen_ms"),
        )
    )
    late = arr.select(
        "event_type",
        F.greatest(F.col("seen_ms") - F.col("ts_ms"), F.lit(0)).alias(
            "late_ms"
        ),
    )
    bucket = (
        F.when(F.col("late_ms") == 0, "on_time")
        .when(F.col("late_ms") < 60000, "lt_1m")
        .when(F.col("late_ms") < 300000, "lt_5m")
        .when(F.col("late_ms") < 1800000, "lt_30m")
        .otherwise("ge_30m")
    )
    return (
        late.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("late_ms").cast("long").alias("max_late_ms"),
        )
    )


_FUNNEL_WINDOW_MS = 86_400_000  # each stage must convert within 24 h


@query(
    "q_funnel_windowed",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ), s1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t1
        FROM ev GROUP BY user_id
        HAVING MIN(CASE WHEN event_type = 'signup' THEN ts_ms END)
               IS NOT NULL
    ), s2 AS (
        SELECT e.user_id, s1.t1, MIN(e.ts_ms) AS t2
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts_ms > s1.t1
          AND e.ts_ms <= s1.t1 + {_FUNNEL_WINDOW_MS}
        GROUP BY e.user_id, s1.t1
    ), s3 AS (
        SELECT e.user_id, s2.t2, MIN(e.ts_ms) AS t3
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
          AND e.ts_ms <= s2.t2 + {_FUNNEL_WINDOW_MS}
        GROUP BY e.user_id, s2.t2
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_view_24h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase_24h,
           (SELECT CAST(SUM(t2 - t1) // COUNT(*) AS BIGINT) FROM s2)
               AS avg_ms_signup_view,
           (SELECT CAST(SUM(t3 - t2) // COUNT(*) AS BIGINT) FROM s3)
               AS avg_ms_view_purchase
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: signup -> view -> purchase where each
    stage must land within 24 h of the previous stage's first event —
    the time-bounded form real product funnels use (the unbounded
    ``q_funnel_conversion`` over-counts conversions that took weeks).
    Also reports the exact mean time-to-convert per hop
    (SUM DIV COUNT — delays are non-negative, so truncating and floor
    division agree). Same scale shape as the unbounded funnel: three
    keyed aggregations, every join on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    s1 = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts_ms"))
            ).alias("t1")
        )
        .filter(F.col("t1").isNotNull())
    )
    s2 = (
        ev.join(s1, "user_id")
        .filter(
            (F.col("event_type") == "view")
            & (F.col("ts_ms") > F.col("t1"))
            & (F.col("ts_ms") <= F.col("t1") + _FUNNEL_WINDOW_MS)
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts_ms").alias("t2"))
    )
    s3 = (
        ev.join(s2.select("user_id", "t2"), "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts_ms") > F.col("t2"))
            & (F.col("ts_ms") <= F.col("t2") + _FUNNEL_WINDOW_MS)
        )
        .groupBy("user_id", "t2")
        .agg(F.min("ts_ms").alias("t3"))
    )
    a1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    a2 = s2.agg(
        F.count(F.lit(1)).alias("n_view_24h"),
        F.expr("CAST(SUM(t2 - t1) DIV COUNT(*) AS BIGINT)").alias(
            "avg_ms_signup_view"
        ),
    )
    a3 = s3.agg(
        F.count(F.lit(1)).alias("n_purchase_24h"),
        F.expr("CAST(SUM(t3 - t2) DIV COUNT(*) AS BIGINT)").alias(
            "avg_ms_view_purchase"
        ),
    )
    return (
        a1.crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(a3))
        .select(
            "n_signup",
            "n_view_24h",
            "n_purchase_24h",
            "avg_ms_signup_view",
            "avg_ms_view_purchase",
        )
    )


@query(
    "q_rolling_active_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT event_type,
               epoch_ms(ts) // 86400000 AS day, user_id
        FROM events
    ), dau AS (
        SELECT event_type, day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM du GROUP BY event_type, day
    ), shifted AS (
        SELECT DISTINCT d.event_type, d.day + o.off AS day, d.user_id
        FROM du d, range(0, 7) o(off)
    ), wau AS (
        SELECT event_type, day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM shifted GROUP BY event_type, day
    )
    SELECT dau.event_type, CAST(dau.day AS BIGINT) AS day,
           dau.dau, wau.wau
    FROM dau JOIN wau
      ON dau.event_type = wau.event_type AND dau.day = wau.day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: exact DAU and trailing-7-day WAU per event
    type — the retention dashboard counters a CDC-fed warehouse
    serves. Sliding COUNT DISTINCT cannot use a window frame (distinct
    sets don't merge by subtraction), so the scalable construction is
    the bounded explode: each (type, day, user) row contributes
    itself to the 7 target days it is visible from (x7 row fanout,
    CONSTANT in window length w, never data-quadratic), then one
    distinct-count per shifted day. At 100 TB the fanout happens
    AFTER per-day dedup, so it multiplies the distinct triple count,
    not the raw event count; for w >> 7 switch to KMV/HLL sketch
    merge (`operators/sketches.py`) — the exact form stays the
    audit baseline. Only days that appear in DAU are emitted (the
    inner join), so trailing ghost days past the stream's end drop
    out."""
    du = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_millis(ts) DIV 86400000").alias("day"),
            "user_id",
        )
        .distinct()
    )
    dau = du.groupBy("event_type", "day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    shifted = (
        du.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
            "day",
            "user_id",
        )
        .select(
            "event_type", (F.col("day") + F.col("off")).alias("day"), "user_id"
        )
        .distinct()
    )
    wau = shifted.groupBy("event_type", "day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, ["event_type", "day"]).select(
        "event_type", F.col("day").cast("long").alias("day"), "dau", "wau"
    )


@query(
    "q_cumulative_uniques",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events
    ),
    d AS (SELECT day, COUNT(*) AS n_events FROM ev GROUP BY day),
    fu AS (SELECT user_id, MIN(day) AS first_day FROM ev
           GROUP BY user_id),
    nu AS (SELECT first_day AS day, COUNT(*) AS n_new_users
           FROM fu GROUP BY first_day)
    SELECT d.day,
           CAST(d.n_events AS BIGINT) AS n_events,
           CAST(COALESCE(nu.n_new_users, 0) AS BIGINT) AS n_new_users,
           -- NULLS FIRST: the undated (NULL-ts) bucket sorts before
           -- time began on BOTH engines (r10 nullts fuzz)
           CAST(SUM(COALESCE(nu.n_new_users, 0))
                    OVER (ORDER BY d.day NULLS FIRST) AS BIGINT)
               AS cum_unique_users
    FROM d LEFT JOIN nu ON d.day = nu.day
    """,
)
def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth curve: per day, event volume, NEW users (first-ever
    event that day), and the running total of unique users to date —
    i.e. an exact cumulative COUNT(DISTINCT) over time, computed
    without any per-day distinct scan: each user contributes once at
    their min(day), and the daily new-user counts prefix-sum into the
    cumulative curve (the first-seen decomposition; a windowed
    count-distinct would rescan every prefix). Complements
    ``q_rolling_active_users`` (windowed actives) with the
    monotone-reach view.

    Plan: one per-user MIN aggregation (user-keyed shuffle), one
    per-day count each for events and first-seens, a day-keyed join of
    two day-sized frames, and a cumsum window over the DAY relation —
    calendar-sized, not corpus-sized (the two-phase prefix-sum
    library applies if the time grain ever makes it data-sized).
    Days are integer epoch-day indices (positive, so Spark DIV and
    DuckDB // agree)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_millis(ts) DIV 86400000").alias("day"),
    )
    d = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    nu = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new_users"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.join(nu, "day", "left")
        .select(
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.coalesce("n_new_users", F.lit(0))
            .cast("long")
            .alias("n_new_users"),
        )
        .withColumn(
            "cum_unique_users",
            F.sum("n_new_users").over(w).cast("long"),
        )
    )


@query(
    "q_hourly_profile",
    oracle="""
    SELECT event_type,
           CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN value IS NOT NULL
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS value_cents,
           CAST(COUNT(value) AS BIGINT) AS n_valued
    FROM events
    GROUP BY event_type, hour(ts)
    """,
)
def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: event counts
    and exact cent totals by the cyclic hour key — the diurnal
    baseline an anomaly detector normalizes against before flagging
    (a 3x traffic spike at 14:00 is noise if 14:00 is always 3x; the
    raw EWMA/KS monitors cannot see cyclic structure). One hash
    aggregation on a 24-value key crossed with event types — map-side
    combine collapses it to (types x 24) rows per partition, shuffle
    is constant-bounded at any corpus size. Session timezone is UTC
    in both engines, so hour(ts) is the identical integer."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("value_cents"),
        F.count("value").cast("long").alias("n_valued"),
    )


@query(
    "q_fulfillment_lag",
    oracle="""
    WITH lag AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
                   AS lag_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(lag_days) AS BIGINT) AS sum_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_90d
    FROM lag GROUP BY o_orderpriority
    """,
)
def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment lag by priority: days from order date to the
    LAST line shipment per order, rolled up per priority class with an
    SLA-breach census (>90 days) — the operational latency metric the
    reference's warehouse validation layer summarizes with plain
    AVG/SUM probes, in exact integer days (sum + count instead of a
    float mean, so the differential is exact and the mean is
    recoverable downstream). Plan: one orders-lineitem key join
    (fact-fact, single shuffle each side under AQE) + per-order
    max-shipdate aggregation + a 5-row priority rollup."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff("last_ship", "o_orderdate").alias("lag_days"),
        )
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("lag_days").cast("long").alias("sum_lag_days"),
        F.max("lag_days").cast("long").alias("max_lag_days"),
        F.sum(F.when(F.col("lag_days") > 90, 1).otherwise(0))
        .cast("long")
        .alias("n_over_90d"),
    )


@query(
    "q_customer_rfm",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT custkey,
               -- NULLS FIRST on every rank key (r10 nullts@sf0.1):
               -- the NULL-custkey group and all-NULL-date customers
               -- band to the NULL (lowest) band in the two-phase
               -- decomposition, i.e. NULLS FIRST — pin the oracle to
               -- the same end
               NTILE(5) OVER (ORDER BY last_order NULLS FIRST,
                              custkey NULLS FIRST) AS r_score,
               NTILE(5) OVER (ORDER BY frequency NULLS FIRST,
                              custkey NULLS FIRST) AS f_score,
               NTILE(5) OVER (ORDER BY monetary_cents NULLS FIRST,
                              custkey NULLS FIRST) AS m_score
        FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer scored 1-5 on
    Recency (last order date), Frequency (order count), and Monetary
    (exact cent total) via NTILE quintiles, reported as segment-cell
    counts — the marketing-analytics workload a warehouse summary
    layer serves. NTILE is deterministic once the ORDER BY is a total
    order, so every ranking carries the custkey tiebreak and both
    engines cut identical quintile boundaries (the same
    tie-discipline as every rank window in this repo). Scale: the
    base frame is one orders aggregation (customer-sized) — which
    GROWS with the corpus, so the three NTILEs run as the two-phase
    banded rank decomposition (functions/sweep.py:two_phase_ntile,
    bit-identical to engine NTILE, zero single-partition windows over
    the customer frame; wired round 9 — it was the documented escape
    hatch through r8). Dates rank as epoch days (monotonic), so the
    (value, custkey) order matches the oracle's (date, custkey)."""
    from scylla_pg_cdc_spark.functions.sweep import two_phase_ntile

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        ).alias("monetary_cents"),
    )
    b = base.select(
        "custkey",
        F.datediff(F.to_date("last_order"), F.lit("1970-01-01"))
        .cast("long")
        .alias("r_days"),
        "frequency",
        "monetary_cents",
    # localCheckpoint: each chained two_phase_ntile references its
    # input twice (banded + counts), so three calls would unroll the
    # orders aggregation 2^3 times; the checkpoint pins it to ONE
    # customer-sized materialization (the graph.py idiom)
    ).localCheckpoint()
    # ONE combined min/max probe feeds all three ntile autotunes
    # (r11 — was one probe job per ranking; identical values reach
    # the identical band-width decisions)
    pr = b.agg(
        F.min("r_days"), F.max("r_days"),
        F.min("frequency"), F.max("frequency"),
        F.min("monetary_cents"), F.max("monetary_cents"),
        F.min("custkey"), F.max("custkey"),
    ).first()
    ck = (pr[6], pr[7])
    b = two_phase_ntile(
        b, "r_days", "custkey", 5, None, "r_score",
        probe=(pr[0], pr[1]) + ck,
    )
    b = two_phase_ntile(
        b, "frequency", "custkey", 5, None, "f_score",
        probe=(pr[2], pr[3]) + ck,
    )
    b = two_phase_ntile(
        b, "monetary_cents", "custkey", 5, None, "m_score",
        probe=(pr[4], pr[5]) + ck,
    )
    return b.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "q_repeat_rate",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, o.o_custkey
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS repeat_ppm
    FROM per_cust GROUP BY segment
    """,
)
def q_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-customer rate per market segment: ordering customers
    split into one-time vs repeat (2+ orders), with the repeat share
    in ppm — the loyalty headline that pairs with the RFM cells
    (``q_customer_rfm`` says who the segments are; this says how each
    acquisition segment retains). One broadcast dim join + a
    customer-keyed count + a 5-row rollup; exact integer ppm."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    per_cust = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("segment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return per_cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_repeat"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0"
            " END)) DIV COUNT(1) AS BIGINT)"
        ).alias("repeat_ppm"),
    )


@query(
    "q_weekly_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) AS BIGINT) AS day_of_week,
           CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN value IS NOT NULL
                    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS value_cents
    FROM events
    GROUP BY day_of_week, hour_of_day
    """,
)
def q_weekly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day traffic heatmap: events, distinct
    users, exact cent totals per cell — the WEEKLY face of
    ``q_hourly_profile`` (weekday-vs-weekend structure that a pure
    hour profile averages away; capacity planning and anomaly
    baselines read this matrix). Day numbering is portable by
    construction: Spark's dayofweek is 1-based Sunday, DuckDB's
    0-based Sunday, so Spark emits ``dayofweek(ts) - 1``. One hash
    aggregation on a <=168-cell key — map-side combine bounds the
    shuffle at any corpus size (COUNT DISTINCT adds the standard
    expand pass)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - F.lit(1)).cast("long").alias("day_of_week"),
        F.hour("ts").cast("long").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("value_cents"),
    )


@query(
    "q_basket_profile",
    oracle="""
    WITH c AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(length(bin(c.n_items)) AS BIGINT) AS size_band,
           o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c.n_items) AS BIGINT) AS items_total,
           CAST(MAX(c.n_items) AS BIGINT) AS max_items
    FROM c JOIN orders o ON c.l_orderkey = o.o_orderkey
    GROUP BY size_band, o.o_orderstatus
    """,
)
def q_basket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution in log2 bands crossed with order
    status: how many line items an order carries, and whether fat
    baskets skew toward open/fulfilled states — the order-shape census
    a fulfillment planner and a join-skew analyst both read (the max
    band bounds the per-key fan-in of any order-grain join). Plan:
    one map-side-combined count per order, then a broadcast-scale
    status join and a <=10x3-cell rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    c = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        c.join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
            ),
            "l_orderkey",
        )
        .groupBy(
            F.length(F.bin("n_items")).cast("long").alias("size_band"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").cast("long").alias("items_total"),
            F.max("n_items").cast("long").alias("max_items"),
        )
    )


@query(
    "q_skyline_2d",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    ), grp AS (
        SELECT total_cents, MAX(n_orders) AS max_n
        FROM base GROUP BY total_cents
    ), front AS (
        SELECT total_cents, max_n,
               MAX(max_n) OVER (
                   ORDER BY total_cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_best
        FROM grp
    )
    SELECT b.custkey, b.total_cents, b.n_orders
    FROM base b
    JOIN front f ON b.total_cents = f.total_cents
    WHERE b.n_orders = f.max_n
      AND b.n_orders > COALESCE(f.prev_best, -1)
    """,
)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier, Borzsony ICDE'01): the customers
    no other customer dominates on (total spend, order count) — both
    >=, at least one strictly > — the classic multi-objective "best
    customers / best configs" operator missing from plain SQL
    vocabularies. For two MAX dimensions the frontier is computable
    without the O(n^2) dominance anti-join: group to one row per
    spend value (max order-count per value), then a running max over
    STRICTLY GREATER spend values; a point survives iff it carries
    its value-group's max count AND beats every richer group's best
    (ties on both axes are mutually non-dominating, so duplicates
    all survive — the ROWS ... 1 PRECEDING frame excludes the
    current value group exactly). Exact cents; no floats anywhere.
    Scale: registered with prereduce_buckets=32 — the union-skyline
    identity runs the value-grouped running max PER HASH BUCKET as a
    keyed window (x here is near-unique per customer, so the per-x
    reduction alone is ~1:1 and would otherwise funnel the whole
    customer frame through one task), and only the union of the 32
    local frontiers reaches the constant-keyed final merge. The plan
    carries NO empty-partitionBy window (asserted by
    tests/test_plan_contract.py)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        ).alias("total_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return skyline_2d_max(
        base, "total_cents", "n_orders", prereduce_buckets=32
    )


def skyline_2d_max(
    df: DataFrame, x: str, y: str, prereduce_buckets: int = 0
) -> DataFrame:
    """Rows of ``df`` not dominated on two MAX dimensions: no other
    row has x' >= x AND y' >= y with at least one strict. Equal
    (x, y) duplicates are mutually non-dominating and all survive.

    Algorithm (linear after a group-by, never the O(n^2) dominance
    anti-join): reduce to one row per x value carrying max(y), take a
    running max of that over STRICTLY greater x (the ROWS ... 1
    PRECEDING frame excludes the current value group exactly), keep
    the value groups whose max beats it — the frontier-sized
    survivor set — and broadcast that back onto the full frame. A
    row survives iff it carries its surviving group's max (y = max_y
    > prev_best is implied by group survival).

    The plain path's one global window runs over the per-x-value
    REDUCED frame; when even the distinct-x frame is too large for a
    single task, pass ``prereduce_buckets=B`` to apply the
    union-skyline identity skyline(S) = skyline(U skyline(S_b)) over
    any partition of the rows: a deterministic hash of (x, y) assigns
    buckets, the same value-grouped running max runs PER BUCKET as a
    keyed window (never single-partition), and only the union of the
    B local frontiers — bounded by B x frontier size — reaches the
    global pass. Equal results by the identity (local non-survivors
    are dominated within their own bucket, hence globally);
    `tests/test_skyline_property.py` pins prereduce == plain == the
    O(n^2) brute force on duplicate-heavy random sets."""
    if prereduce_buckets:
        bucket = F.pmod(
            F.xxhash64(F.col(x), F.col(y)), F.lit(prereduce_buckets)
        ).alias("_sky_bucket")
        local = _skyline_pass(
            df.select(*df.columns, bucket), x, y, part_col="_sky_bucket"
        ).drop("_sky_bucket")
        # localCheckpoint: each _skyline_pass references its input
        # twice (frame + per-x frontier), so the nested passes would
        # evaluate the caller's base aggregation 4x; pinning the
        # frontier-union (<= B x frontier rows — tiny) halves the
        # lineage to the local pass's own two references.
        local = local.localCheckpoint()
        # Final merge = the SAME keyed pass with bucket count 1 over
        # the union of local frontiers (<= B x frontier rows). The
        # key must be non-foldable — a literal 0 is constant-folded
        # out of the window spec and WindowExec reverts to the
        # single-partition global window the plan contract bans —
        # so it is pmod(hash, 1): always 0, never folded. One task
        # still does the merge, but it sees frontier-bounded rows,
        # not the corpus, and the plan shape is uniformly keyed.
        final = local.select(
            *df.columns,
            F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(1)).alias(
                "_sky_final"
            ),
        )
        return _skyline_pass(final, x, y, part_col="_sky_final").select(
            *df.columns
        )
    return _skyline_pass(df, x, y)


def _skyline_pass(
    df: DataFrame, x: str, y: str, part_col: str | None = None
) -> DataFrame:
    """One value-grouped running-max skyline pass, optionally scoped
    per ``part_col`` (keyed window; the local phase of the
    union-skyline pre-reduce)."""
    keys = [part_col] if part_col else []
    grp = df.groupBy(*keys, x).agg(F.max(y).alias("_max_y"))
    base = (
        Window.partitionBy(*keys) if keys else Window.partitionBy()
    )
    w = base.orderBy(F.desc(x)).rowsBetween(Window.unboundedPreceding, -1)
    front = grp.select(
        *keys,
        x,
        "_max_y",
        F.max("_max_y").over(w).alias("_prev_best"),
    ).filter(
        # NULL prev_best = the highest x group: always on the frontier.
        # An explicit IS NULL (not a sentinel coalesce) keeps y's type
        # un-coerced — a double sentinel would silently round a
        # past-2^53 bigint dimension.
        F.col("_prev_best").isNull()
        | (F.col("_max_y") > F.col("_prev_best"))
    )
    return (
        df.join(F.broadcast(front), keys + [x])
        .filter(F.col(y) == F.col("_max_y"))
        .drop("_max_y", "_prev_best")
        .select(*df.columns)
    )


@query(
    "q_transition_surprisal",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) NULLS FIRST, event_id
               ) AS prev_type
        FROM events
    ), tr AS (
        SELECT user_id, prev_type, event_type AS next_type
        FROM seq WHERE prev_type IS NOT NULL
    ), c AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM tr GROUP BY prev_type, next_type
    ), tot AS (
        SELECT prev_type, SUM(n) AS row_total FROM c GROUP BY prev_type
    )
    SELECT tr.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(length(bin(t.row_total)) - length(bin(c.n)))
                AS BIGINT) AS surprisal_bits,
           CAST((1000 * SUM(length(bin(t.row_total)) - length(bin(c.n))))
                // COUNT(*) AS BIGINT) AS mean_bits_milli
    FROM tr
    JOIN c ON tr.prev_type = c.prev_type AND tr.next_type = c.next_type
    JOIN tot t ON tr.prev_type = t.prev_type
    GROUP BY tr.user_id
    """,
)
def q_transition_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stream predictability under the corpus's own
    first-order Markov model: every observed transition contributes
    floor(log2(row_total)) - floor(log2(n)) bits — the banded form of
    -log2 p(next|prev) — summed per user, via the same zero-FP binary
    digit-length trick as ``q_doc_surprisal`` (length(bin(x)) =
    floor(log2 x)+1 in both engines; no libm anywhere). High
    mean-bits users follow rare transition paths (bot probes, broken
    flows, genuinely novel behavior); low ones ride the corpus's
    dominant edges — the per-ENTITY consumption of the transition
    matrix ``q_event_transitions`` only reports globally. DIV is safe
    (non-negative operands). Plan: one lag window on the user
    partition, the |types|^2-sized model joined back by broadcast,
    one per-user aggregation — shuffles bounded by users + the tiny
    model; nothing quadratic."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.unix_millis("ts"), F.col("event_id")
            )
        )
        .alias("prev_type"),
    )
    tr = seq.filter(F.col("prev_type").isNotNull())
    c = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    bits = (
        F.length(F.bin(F.col("row_total"))) - F.length(F.bin(F.col("n")))
    ).cast("long")
    return (
        tr.join(F.broadcast(c), ["prev_type", "next_type"])
        .join(F.broadcast(tot), "prev_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(bits).alias("surprisal_bits"),
            F.expr(
                "CAST((1000 * SUM(CAST(length(bin(row_total))"
                " - length(bin(n)) AS BIGINT)))"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("mean_bits_milli"),
        )
    )


def skyline_nd_max(
    df: DataFrame, cols: list[str], prereduce_buckets: int = 32
) -> DataFrame:
    """N-dimensional skyline on MAX dimensions ``cols``: rows no
    other row dominates (>= on every dimension, > on at least one;
    equal tuples are mutually non-dominating and all survive).

    Three and more dimensions have no value-grouped running-max
    rewrite (the 2-D trick in ``skyline_2d_max`` relies on a total
    order of the second dimension under the first), so this is the
    repo's documented applyInPandas case: semantics the built-in
    operators genuinely cannot express. The union-skyline identity
    makes it distributed — a deterministic hash of the dimension
    tuple buckets the rows, each bucket's skyline is computed by a
    vectorized numpy dominance sweep (O(n_b^2) comparisons but
    row-vectorized; a bucket is one Arrow batch), and only the union
    of local frontiers (<= buckets x frontier) reaches the final
    single-group pass. Local non-survivors are dominated within
    their own bucket, hence globally — dropping them early is
    lossless. At 100 TB: size ``prereduce_buckets`` so a bucket fits
    an executor's Arrow batch; a second bucketing round (different
    hash seed, ceil(sqrt(B)) buckets) runs between the local and
    final passes, so the final single-group Arrow batch is bounded
    by sqrt(B) x frontier, not B x frontier."""

    def _sky(pdf):
        import numpy as np

        a = pdf[list(cols)].to_numpy()
        n = len(a)
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            # j == i contributes all>= True but any> False: safe
            if ((a >= a[i]).all(axis=1) & (a > a[i]).any(axis=1)).any():
                keep[i] = False
        return pdf[keep]

    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(prereduce_buckets)
    ).alias("_sky_bucket")
    bucketed = df.select(*df.columns, bucket)
    local = (
        bucketed.groupBy("_sky_bucket")
        .applyInPandas(_sky, schema=bucketed.schema)
        .drop("_sky_bucket")
    )
    # Second bucketing round (union-skyline identity applied again,
    # under a DIFFERENT hash so survivors that never shared a round-1
    # bucket now meet): bounds the final single-group pass by
    # ceil(sqrt(B)) x frontier instead of B x frontier, so a
    # duplicate-heavy frontier cannot funnel B full local frontiers
    # into one Arrow batch. Lossless at every round: a row dominated
    # in ANY bucket it lands in is dominated globally.
    b2 = max(2, math.isqrt(max(prereduce_buckets - 1, 0)) + 1)
    rebucket = F.pmod(
        F.xxhash64(F.lit(0x5EED), *[F.col(c) for c in cols]), F.lit(b2)
    ).alias("_sky_bucket")
    mid_in = local.select(*df.columns, rebucket)
    mid = (
        mid_in.groupBy("_sky_bucket")
        .applyInPandas(_sky, schema=mid_in.schema)
        .drop("_sky_bucket")
    )
    glob = mid.select(*df.columns, F.lit(0).alias("_sky_bucket"))
    return (
        glob.groupBy("_sky_bucket")
        .applyInPandas(_sky, schema=glob.schema)
        .drop("_sky_bucket")
    )


@query(
    "q_skyline_3d",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(datediff('day', DATE '1970-01-01',
                             CAST(MAX(o_orderdate) AS DATE))
                    AS BIGINT) AS last_day
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_custkey
    )
    SELECT custkey, total_cents, n_orders, last_day
    FROM base b
    WHERE NOT EXISTS (
        SELECT 1 FROM base o
        WHERE o.total_cents >= b.total_cents
          AND o.n_orders >= b.n_orders
          AND o.last_day >= b.last_day
          AND (o.total_cents > b.total_cents
               OR o.n_orders > b.n_orders
               OR o.last_day > b.last_day))
    """,
)
def q_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D Pareto frontier over one market segment's customers on
    (total spend, order count, recency) — "best customers" when no
    single score is agreed on, in the dimension regime where the 2-D
    running-max rewrite no longer exists. Runs the bucketed
    ``skyline_nd_max`` (union-skyline identity + per-bucket numpy
    dominance sweep — the repo's documented applyInPandas case);
    the oracle is the INDEPENDENT O(n^2) NOT EXISTS dominance
    anti-join, so the hash match proves the bucket decomposition and
    the sweep against the definition itself. Segment scoping keeps
    that quadratic oracle replayable at amplified scale (0.8 s at
    10x, ~80 s at 100x) and adds the broadcast dimension join;
    recency is exact integer epoch-days (datediff vs 1970-01-01,
    identical in both engines). Plan: broadcast segment filter ->
    one customer-keyed aggregation -> two Arrow passes bounded by
    bucket size and buckets x frontier."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    base = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
            F.datediff(
                F.to_date(F.max("o_orderdate")), F.lit("1970-01-01")
            )
            .cast("long")
            .alias("last_day"),
        )
    )
    return skyline_nd_max(
        base, ["total_cents", "n_orders", "last_day"]
    )

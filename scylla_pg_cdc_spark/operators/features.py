"""Feature-engineering operators: per-entity time-series features and
corpus-statistics scores for training-data pipelines.

Three shapes a feature platform computes at 100 TB:
- EWMA-style decayed aggregates per entity (one window, no shuffle
  beyond the user_id partition — clustered-by-user layouts run it
  in place);
- corpus-frequency-derived scores (two aggregations + one join back,
  the TF-IDF plan shape, integer-exact here);
- per-group deterministic reservoirs (hash-ranked top-k per group —
  reproducible "random" samples with zero stored state).

All outputs are integers (floor-quantized where a float intermediate
exists), so every query carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

_DECAY = 0.8
_EWMA_TAPS = 8
# a^k literals precomputed in Python (IEEE doubles — the same values
# both engines multiply by)
_POWS = [_DECAY**k for k in range(_EWMA_TAPS)]


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(LAG(value, {k}) OVER w * {_POWS[k]!r}, 0)"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN LAG(value, {k}) OVER w IS NOT NULL"
        f" THEN {_POWS[k]!r} ELSE 0 END)"
        for k in range(_EWMA_TAPS)
    )
    return f"""
    SELECT user_id, event_id,
           CAST(FLOOR(({num}) / ({den}) * 1000000 + 0.5) AS BIGINT)
               AS ewma_micro
    FROM (SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms
          FROM events WHERE value IS NOT NULL)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms NULLS FIRST, event_id)
    """


@query("q_event_ewma", oracle=_ewma_sql())
def q_event_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values (decay 0.8, 8 taps) — the classic streaming-feature shape
    (recency-weighted engagement). A true infinite-history EWMA is a
    sequential recurrence; the 8-tap truncation (0.8^8 ~= 0.17 tail)
    makes it ONE window over (user_id, ts) with fixed lag taps — no
    recursion, no UDF, exact in both engines. Weights renormalize over
    the taps that exist, so early rows aren't biased toward zero."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts"), F.col("event_id")
    )
    num = sum(
        F.coalesce(F.lag("value", k).over(w) * F.lit(_POWS[k]), F.lit(0.0))
        for k in range(_EWMA_TAPS)
    )
    den = sum(
        F.when(F.lag("value", k).over(w).isNotNull(), F.lit(_POWS[k]))
        .otherwise(F.lit(0.0))
        for k in range(_EWMA_TAPS)
    )
    return events.select(
        "user_id",
        "event_id",
        F.floor((num / den) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("ewma_micro"),
    )


@query(
    "q_token_rarity",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), dtok AS (
        SELECT DISTINCT doc_id, token FROM tok WHERE length(token) > 0
    ), freq AS (
        SELECT token, COUNT(*) AS n_docs FROM dtok GROUP BY token
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(CAST(FLOOR(1000000000.0 / f.n_docs) AS BIGINT))
                AS BIGINT) AS rarity_score
    FROM dtok d JOIN freq f ON d.token = f.token
    GROUP BY d.doc_id
    """,
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-rarity document score: each distinct token contributes
    floor(1e9 / document-frequency), so documents full of rare tokens
    score high — the integer-exact cousin of IDF scoring used for
    quality/diversity sampling. Plan: explode -> distinct -> one freq
    aggregation -> join back -> per-doc sum (the TF-IDF shape; the
    freq table is vocabulary-sized and broadcastable at any corpus
    scale with a bounded vocabulary)."""
    docs = load_table(spark, sf_dir, "documents")
    dtok = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.length("token") > 0)
        .distinct()
    )
    freq = dtok.groupBy("token").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dtok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum(
                F.floor(F.lit(1_000_000_000.0) / F.col("n_docs")).cast("long")
            ).alias("rarity_score"),
        )
    )


@query(
    "q_event_anomaly",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc,
               epoch_ms(ts) AS ts_ms
        FROM events WHERE value IS NOT NULL
    ), stats AS (
        SELECT user_id, event_id, vc,
               COUNT(vc) OVER w AS n,
               SUM(vc)   OVER w AS s,
               SUM(vc * vc) OVER w AS q
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms NULLS FIRST, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, CAST(n AS BIGINT) AS n_window,
           CAST(FLOOR((vc * n - s) * 1.0
                      / sqrt((n * q - s * s) * 1.0)
                      * 1000.0 + 0.5) AS BIGINT) AS z_milli
    FROM stats
    WHERE n >= 10 AND n * q - s * s >= n * n
      AND ABS(CAST(FLOOR((vc * n - s) * 1.0
                         / sqrt((n * q - s * s) * 1.0)
                         * 1000.0 + 0.5) AS BIGINT)) >= 2000
    """,
)
def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection: flag events whose value is
    >= 2 standard deviations from the mean of that user's previous
    <= 20 events (a trailing window, so the flagged event never sees
    itself — the online-scoring shape). Values quantize to exact
    integer cents first, so the window sums S and Q are
    order-independent bigints and the z-score
    ``(v*n - S) / sqrt(n*Q - S^2)`` is built from +,-,*,/,sqrt only —
    bit-identical across engines (no libm). The exact-integer variance
    guard ``n*Q - S^2 >= n^2`` (variance >= 1 cent^2) keeps the sqrt
    argument positive under any rounding. One window per user
    partition; no shuffle beyond the user_id hash."""
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
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = ev.select(
        "user_id",
        "event_id",
        "vc",
        F.count("vc").over(w).alias("n"),
        F.sum("vc").over(w).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("q"),
    )
    z_milli = F.floor(
        (F.col("vc") * F.col("n") - F.col("s")) * F.lit(1.0)
        / F.sqrt((F.col("n") * F.col("q") - F.col("s") * F.col("s")) * F.lit(1.0))
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        stats.filter(
            (F.col("n") >= 10)
            & (
                F.col("n") * F.col("q") - F.col("s") * F.col("s")
                >= F.col("n") * F.col("n")
            )
        )
        .select(
            "user_id",
            "event_id",
            F.col("n").cast("long").alias("n_window"),
            z_milli.alias("z_milli"),
        )
        .filter(F.abs(F.col("z_milli")) >= 2000)
    )


@query(
    "q_group_sample",
    oracle="""
    SELECT event_type, event_id, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY md5('rsv:' || CAST(event_id AS VARCHAR)),
                            event_id) AS rk
        FROM events
    )
    WHERE rk <= 5
    """,
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic reservoir: rank rows inside each group
    by a portable hash and keep the 5 smallest — a uniform-without-
    replacement sample per group that is a pure function of the data
    (re-runs, engines, and shard orders all agree; a stored-state
    reservoir can't promise that). One window per group; at scale this
    is rank-within-partition with no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat(F.lit("rsv:"), F.col("event_id").cast("string"))),
        F.col("event_id"),
    )
    return (
        events.select(
            "event_type",
            "event_id",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


@query(
    "q_event_gaps",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) NULLS FIRST, event_id
               ) AS prev_ms
        FROM events
    ), gaps AS (
        SELECT user_id, ts_ms - prev_ms AS gap_ms
        FROM ev WHERE prev_ms IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE gap_ms > 21600000) AS BIGINT)
               AS n_gaps,
           CAST(MAX(gap_ms) // 60000 AS BIGINT) AS max_gap_minutes,
           CAST(SUM(gap_ms) // COUNT(*) // 60000 AS BIGINT)
               AS mean_gap_minutes
    FROM gaps
    GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE gap_ms > 21600000) > 0
    """,
)
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-gap detection: users whose event stream went silent for
    more than 6 hours, with gap counts and extremes — the analog of
    the reference's replication-lag monitoring (a CDC feed that stops
    flowing is the incident its alerting exists for), generalized to
    per-key silence detection. One lag window per user partition plus
    one aggregation; all durations are exact integer milliseconds."""
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts"), F.col("event_id")
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag(F.unix_millis("ts")).over(w).alias("prev_ms"),
    )
    gaps = ev.filter(F.col("prev_ms").isNotNull()).select(
        "user_id", (F.col("ts_ms") - F.col("prev_ms")).alias("gap_ms")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.sum((F.col("gap_ms") > 21_600_000).cast("long")).alias(
                "n_gaps"
            ),
            F.expr("CAST(MAX(gap_ms) DIV 60000 AS BIGINT)").alias(
                "max_gap_minutes"
            ),
            F.expr(
                "CAST(SUM(gap_ms) DIV COUNT(1) DIV 60000 AS BIGINT)"
            ).alias("mean_gap_minutes"),
        )
        .filter(F.col("n_gaps") > 0)
    )


@query(
    "q_event_ewma_exact",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc,
               epoch_ms(ts) AS ts_ms, event_id
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT user_id,
               list(vc ORDER BY ts_ms NULLS FIRST, event_id) AS l
        FROM ev GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(l) AS BIGINT) AS n,
           CAST(CASE WHEN len(l) = 1 THEN l[1]
                ELSE list_reduce(l, (acc, x) -> (acc * 7 + x) // 8)
                END AS BIGINT) AS ewma_cents
    FROM g
    """,
)
def q_event_ewma_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT infinite-horizon EWMA (alpha = 1/8) of event value per
    user — the genuinely sequential recurrence s_i = (7*s_{i-1} +
    v_i) DIV 8 that no window frame can express (the 8-tap
    ``q_event_ewma`` is its SQL-checkable truncation; this is the
    full fold). The recurrence floors to integer cents at every step,
    so the fold is a pure function of the ordered integer sequence —
    DuckDB replays it exactly with ``list_reduce``, giving a bit-exact
    cross-engine oracle.

    r11 (guide §4.1): the fold now runs INSIDE the JVM as an
    ``aggregate`` higher-order function over the per-user
    ``array_sort``-ordered (ts_ms, event_id, vc) struct array — the
    former ``groupBy().applyInPandas`` shipped every event row across
    the Arrow boundary and replayed the recurrence in an interpreted
    Python row loop (2.9 s at sf0.1; FlatMapGroupsInPandas in the
    plan). Same single user_id shuffle, same per-group memory bound
    (one user's events in one aggregation buffer vs one pandas frame),
    zero Python. Bit-identity pinned: ``array_sort`` on structs orders
    NULL ts_ms first (Spark struct ordering = NULLS FIRST ascending,
    matching the oracle's ORDER BY ts_ms NULLS FIRST and the old
    ``na_position='first'``), and the recurrence divides with the
    exact FLOOR rearrangement (``floordiv_sql``) because Python ``//``
    and DuckDB ``list_reduce`` floor negative quotients while Spark
    DIV truncates toward zero. The NULL user_id group survives as a
    first-class groupBy key, as before."""
    from scylla_pg_cdc_spark.operators.analytics import floordiv_sql

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

    step = floordiv_sql("7 * acc + x", "8")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_ms", "event_id", "vc"))
            ).alias("seq")
        )
        .select(
            "user_id",
            F.size("seq").cast("long").alias("n"),
            F.expr(
                "aggregate(slice(transform(seq, e -> e.vc), 2, size(seq) - 1), "
                f"seq[0].vc, (acc, x) -> {step})"
            ).cast("long").alias("ewma_cents"),
        )
    )


@query(
    "q_gap_percentile",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ) AS gap_ms
        FROM events
    ), gg AS (
        SELECT event_type, gap_ms,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY gap_ms
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM g WHERE gap_ms IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_ms END)
                AS BIGINT) AS p50_ms,
           CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN gap_ms END)
                AS BIGINT) AS p95_ms,
           CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_ms END)
                AS BIGINT) AS p99_ms
    FROM gg GROUP BY event_type
    """,
)
def q_gap_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p95/p99 inter-event gap per event type — the SLO
    numbers behind streaming watermark and session-gap choices (the
    lateness histogram in `analytics.py:q_event_lateness` buckets;
    this ranks). Discrete (type-7) percentiles via rank selection —
    rank ceil(q*n) picked with integer arithmetic, no interpolation,
    no engine-specific percentile function (Spark `percentile` and
    DuckDB `quantile_cont` interpolate differently; rank-select is
    bit-portable).

    TWO-PHASE distributed order statistics (the naive per-type rank
    window cost 30x per-row at 10M gap rows — measured, SCALE.md):
    delegated to ``functions/percentiles.py:rank_select_percentiles``
    (bucket ledger -> locate each percentile's bucket -> rank only
    target buckets), which the ORACLE's naive global window and an
    adversarial-ties property test both pin as value-identical."""
    from scylla_pg_cdc_spark.functions.percentiles import (
        rank_select_percentiles,
    )

    g = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.unix_millis("ts")
            - F.lag(F.unix_millis("ts")).over(
                Window.partitionBy("user_id").orderBy(
                    F.unix_millis("ts"), "event_id"
                )
            )
        ).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    out = rank_select_percentiles(
        g,
        "event_type",
        "gap_ms",
        spec=[
            ("p50_ms", "(n + 1) DIV 2"),
            ("p95_ms", "(95 * n + 99) DIV 100"),
            ("p99_ms", "(99 * n + 99) DIV 100"),
        ],
        bucket_width=60_000,
    )
    return out.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        "p50_ms",
        "p95_ms",
        "p99_ms",
    )


@query(
    "q_doc_surprisal",
    oracle="""
    WITH tok AS (
        SELECT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) WHERE length(token) > 0
    ), ctc AS (
        SELECT token, COUNT(*) AS c FROM tok GROUP BY token
    ), tot AS (
        SELECT COUNT(*) AS n1 FROM tok
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(length(bin(t.n1)) - length(bin(ctc.c)))
                AS BIGINT) AS surprisal_bits,
           CAST((1000 * SUM(length(bin(t.n1)) - length(bin(ctc.c))))
                // COUNT(*) AS BIGINT) AS mean_bits_milli
    FROM tok
    JOIN ctc ON tok.token = ctc.token
    CROSS JOIN tot t
    GROUP BY tok.doc_id
    """,
)
def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact unigram surprisal per document: every token
    occurrence contributes floor(log2(N)) - floor(log2(c_t)) bits
    (corpus size N, corpus frequency c_t), computed as a BINARY
    DIGIT-LENGTH difference — ``length(bin(x))`` is floor(log2 x)+1
    for x > 0 in both engines — so the per-doc sum is the banded
    form of the cross-entropy a unigram LM assigns the document,
    with ZERO floating point anywhere (the repo-wide ban on libm
    transcendentals makes true ln-perplexity un-oracle-able; the
    log2 band keeps the ranking signal and is bit-identical by
    construction). High mean-bits documents are rare-vocabulary
    (specialist or noisy), low ones are boilerplate — the cheap
    quality/novelty axis next to ``q_token_rarity``'s IDF sum,
    which weights DISTINCT tokens, where this weights occurrences.
    DIV is safe: both operands are non-negative. Plan: the TF-IDF
    shape — one vocabulary-sized count broadcast back onto the token
    stream, the one-row corpus total on a broadcast cross join, one
    per-doc aggregation; shuffle bounded by vocabulary + documents."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    ctc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n1"))
    bits = (
        F.length(F.bin(F.col("n1"))) - F.length(F.bin(F.col("c")))
    ).cast("long")
    return (
        tok.join(F.broadcast(ctc), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).alias("surprisal_bits"),
            F.expr(
                "CAST((1000 * SUM(CAST(length(bin(n1)) - length(bin(c))"
                " AS BIGINT))) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_bits_milli"),
        )
    )

"""Stream-stream joins: watermarked interval joins between two live
streams — the attribution/enrichment shape (view -> click within a
time bound) that a CDC platform needs when BOTH sides of a join are
change streams, not one stream + one static table.

Reference anchor: the reference joins its CDC stream only against
static Postgres state (sink-side upsert); true stream-stream
correlation (e.g. "pair each replicated write with the audit event
that acknowledged it within N minutes") is left to downstream SQL.
Spark expresses it natively: each side declares a watermark, the join
condition carries an event-time interval, and the state store retains
only rows inside the watermark horizon (Structured Streaming
stream-stream join semantics).

Scale: state is bounded by (watermark horizon x per-key arrival
rate), not stream length. The equality key (user_id) hash-partitions
both sides, so the join is co-partitioned streaming symmetric-hash;
the time-interval predicate prunes state eagerly. Without watermarks
this join would buffer forever — both are mandatory here by design.

The batch face (``attribution_pairs_batch``) runs the identical
filter/join tree on the static table, which is what the equivalence
test checks (one definition of correctness, two execution modes —
the repo-wide CDC discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.streaming.pipeline import read_event_stream


def _split_views_clicks(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return views, clicks


def _join_condition(gap_minutes: int):
    return (
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        )
    )


_OUT_COLS = (
    "user_id",
    "view_id",
    "click_id",
)


def attribution_pairs_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 60,
    watermark_minutes: int = 120,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming view->click attribution: each view pairs with every
    click by the same user in the following ``gap_minutes``. Returns
    an unbounded streaming DataFrame; drive it with an availableNow
    writeStream. Watermarks on BOTH sides let Spark drop view state
    once no qualifying click can still arrive, and click state once
    its views have expired — state is O(horizon), not O(stream)."""
    views, clicks = _split_views_clicks(
        read_event_stream(
            spark, sf_dir, max_files_per_trigger=max_files_per_trigger
        )
    )
    views = views.withWatermark("view_ts", f"{watermark_minutes} minutes")
    clicks = clicks.withWatermark("click_ts", f"{watermark_minutes} minutes")
    joined = views.join(clicks, _join_condition(gap_minutes), "inner")
    return joined.select(
        *_OUT_COLS,
        F.unix_millis("view_ts").alias("view_ms"),
        F.unix_millis("click_ts").alias("click_ms"),
    )


def attribution_pairs_batch(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 60
) -> DataFrame:
    """The identical join tree over the static events table — the
    ground truth the streaming run must reproduce exactly."""
    views, clicks = _split_views_clicks(load_table(spark, sf_dir, "events"))
    joined = views.join(clicks, _join_condition(gap_minutes), "inner")
    return joined.select(
        *_OUT_COLS,
        F.unix_millis("view_ts").alias("view_ms"),
        F.unix_millis("click_ts").alias("click_ms"),
    )

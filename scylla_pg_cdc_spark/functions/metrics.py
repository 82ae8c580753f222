"""Operational metrics & alerting as DataFrame aggregations.

Capability port of the reference's monitoring layer
(`src/monitoring/metrics.py:24-237`: counters, gauges, histograms with
explicit bucket bounds, summaries; `src/monitoring/alerts.py`:
threshold rules over rates/accuracy/DLQ depth;
`scripts/measure-latency.sh:208-216`: p50/p95/p99).

A metric series here is just a DataFrame (labels..., ts, value); every
aggregation is a groupBy — so the same definitions run batch or inside
a streaming foreachBatch. The ``ProgressListener`` is the Spark-native
replacement for the reference's Prometheus exporters: it observes
micro-batch progress events (rows/sec, batch duration) off the
StreamingQueryListener bus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # the listener API lives in different modules across versions
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


def bucketize(value: Column | str, bounds: list[float]) -> Column:
    """Histogram bucket label with explicit bounds
    (`metrics.py:45-50`, `metrics_collector.py:387-399`). Labels are
    zero-padded so lexicographic order == numeric order."""
    v = F.col(value) if isinstance(value, str) else value
    width = len(str(len(bounds)))
    expr = F.when(v < bounds[0], f"{0:0{width}d}_lt_{bounds[0]:g}")
    for i in range(1, len(bounds)):
        expr = expr.when(
            v < bounds[i], f"{i:0{width}d}_{bounds[i-1]:g}_{bounds[i]:g}"
        )
    return expr.otherwise(f"{len(bounds):0{width}d}_ge_{bounds[-1]:g}")


def histogram(
    df: DataFrame, value: str, bounds: list[float], by: list[str] | None = None
) -> DataFrame:
    keys = [bucketize(value, bounds).alias("bucket")] + [
        F.col(c) for c in (by or [])
    ]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def percentile_summary(
    df: DataFrame, value: str, by: list[str] | None = None
) -> DataFrame:
    """min/max/avg/p50/p95/p99 — the latency-stat block
    (`measure-latency.sh:208-216,360-363`)."""
    aggs = [
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
        F.avg(value).alias("avg_v"),
        F.expr(f"percentile({value}, 0.5)").alias("p50"),
        F.expr(f"percentile({value}, 0.95)").alias("p95"),
        F.expr(f"percentile({value}, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    ]
    return df.groupBy(*(by or [])).agg(*aggs) if by else df.agg(*aggs)


def rate_over_windows(
    df: DataFrame, ts: str, window: str = "5 minutes", slide: str | None = None
) -> DataFrame:
    """rate(metric[w]) analog (`alerts.py:79,92`): events/sec per
    (sliding) window."""
    w = F.window(ts, window, slide) if slide else F.window(ts, window)
    out = df.groupBy(w.alias("w")).agg(F.count(F.lit(1)).alias("n"))
    dur = F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start"))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
        (F.col("n") / dur.cast("double")).alias("rate_per_sec"),
    )


@dataclass(frozen=True)
class AlertRule:
    """Threshold rule (`alerts.py:53,66,114,127,236,249` shapes)."""

    name: str
    severity: str  # warning | critical
    predicate: Column  # evaluated against the metric row


def evaluate_alerts(metrics: DataFrame, rules: list[AlertRule]) -> DataFrame:
    """Fire rules against a metrics DataFrame; one output row per
    (metric row, fired rule). An empty rule list yields an empty
    result, not an error."""
    if not rules:
        return metrics.sparkSession.createDataFrame(
            [], "alert string, severity string, context string"
        )
    fired = [
        metrics.filter(r.predicate).select(
            F.lit(r.name).alias("alert"),
            F.lit(r.severity).alias("severity"),
            F.to_json(F.struct(*[F.col(c) for c in metrics.columns])).alias(
                "context"
            ),
        )
        for r in rules
    ]
    out = fired[0]
    for f in fired[1:]:
        out = out.unionByName(f)
    return out


DEFAULT_ALERT_RULES = [
    # reference thresholds: lag >300s warn / >900s crit; accuracy <95/<90;
    # DLQ >100/>1000 (`alerts.py`)
    ("replication_lag_high", "warning", "lag_sec > 300"),
    ("replication_lag_critical", "critical", "lag_sec > 900"),
    ("accuracy_low", "warning", "accuracy_pct < 95"),
    ("accuracy_critical", "critical", "accuracy_pct < 90"),
    ("dlq_depth_high", "warning", "dlq_depth > 100"),
    ("dlq_depth_critical", "critical", "dlq_depth > 1000"),
]


def default_rules() -> list[AlertRule]:
    return [
        AlertRule(name, sev, F.expr(pred))
        for name, sev, pred in DEFAULT_ALERT_RULES
    ]


@dataclass
class ProgressListener(StreamingQueryListener):
    """StreamingQueryListener capturing per-batch throughput — the D6
    analog of the reference's Prometheus counters
    (`metrics.py:87-188`)."""

    progress: list = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "processed_rows_per_sec": p.processedRowsPerSecond,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

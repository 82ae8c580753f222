"""Two-phase distributed order statistics: exact rank-select
percentiles without a global per-key sort window.

The naive form (row_number over PARTITION BY key ORDER BY val) costs
a full per-key sort of the DATA — measured 30x per-row at 10M rows
when the key is low-cardinality (SCALE.md). This decomposition:

1. values bucket by range (``val DIV bucket_width``); the per-(key,
   bucket) count ledger — bucket-table sized, tiny — cumulates to
   locate, for each requested percentile, the bucket holding global
   rank ``r`` and how many values precede it;
2. ONLY the target buckets' rows get a within-bucket rank (fine
   (key, bucket) partitions), and the answer is the
   ``(r - before)``-th smallest inside its bucket.

The selected VALUE is tie-order independent (the value at a global
rank is a property of the sorted multiset), so the result is
bit-identical to the naive window — proven by the unchanged naive
oracle on ``q_gap_percentile`` and by the adversarial-ties property
test. Degenerate case: one bucket holding nearly everything reduces
to the naive cost for that bucket — narrow ``bucket_width``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (output column name, rank formula as SQL over the per-key count n;
# must yield 1..n for n >= 1)
PercentileSpec = list[tuple[str, str]]

DEFAULT_SPEC: PercentileSpec = [
    ("p50", "(n + 1) DIV 2"),
    ("p95", "(95 * n + 99) DIV 100"),
    ("p99", "(99 * n + 99) DIV 100"),
]


def rank_select_percentiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    spec: PercentileSpec = DEFAULT_SPEC,
    bucket_width: int = 60_000,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact percentiles of integer ``val_col`` per ``key_col``.

    Returns one row per key: (key, n, <spec names...>). ``checkpoint``
    materializes the input once (both phases consume it — recomputing
    an expensive upstream lineage would double the query; disable for
    cheap inputs).

    A NULL key is a first-class group (matching GROUP BY semantics on
    both engines): the key is carried inside a one-field STRUCT, whose
    equality is null-safe in Spark joins — the bare-column form lost
    the NULL group at the target-bucket joins while the naive-window
    oracle kept it (round-9 dimension-null fuzzing, q_gap_percentile /
    q_equidepth_bins rowcounts off by one group)."""
    vb = df.select(
        F.struct(F.col(key_col).alias("k")).alias("__key"), val_col
    ).withColumn("__bkt", F.expr(f"{val_col} DIV {bucket_width}"))
    key_col_orig, key_col = key_col, "__key"
    if checkpoint:
        vb = vb.localCheckpoint()
    counts = vb.groupBy(key_col, "__bkt").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wb = Window.partitionBy(key_col).orderBy("__bkt")
    ledger = counts.select(
        key_col,
        "__bkt",
        "__cnt",
        F.coalesce(
            F.sum("__cnt").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__before"),
        F.sum("__cnt").over(Window.partitionBy(key_col)).alias("n"),
    )
    qspec: Column = F.array(
        *[
            F.struct(
                F.lit(name).alias("p"), F.expr(rank_sql).alias("r")
            )
            for name, rank_sql in spec
        ]
    )
    targets = (
        ledger.select(
            key_col, "__bkt", "__before", "__cnt", "n",
            F.explode(qspec).alias("q"),
        )
        .filter(
            (F.col("q.r") > F.col("__before"))
            & (F.col("q.r") <= F.col("__before") + F.col("__cnt"))
        )
        .select(
            key_col,
            "__bkt",
            F.col("q.p").alias("__p"),
            (F.col("q.r") - F.col("__before")).alias("__k"),
        )
    )
    in_target = vb.join(
        F.broadcast(targets.select(key_col, "__bkt").distinct()),
        [key_col, "__bkt"],
    )
    ranked = in_target.withColumn(
        "__rnb",
        F.row_number().over(
            Window.partitionBy(key_col, "__bkt").orderBy(val_col)
        ),
    )
    picked = ranked.join(
        F.broadcast(targets), [key_col, "__bkt"]
    ).filter(F.col("__rnb") == F.col("__k"))
    names = [name for name, _ in spec]
    return (
        picked.groupBy(key_col)
        .pivot("__p", names)
        .agg(F.max(val_col))
        .join(
            ledger.groupBy(key_col).agg(
                F.max("n").cast("long").alias("n")
            ),
            key_col,
        )
        .select(
            F.col("__key.k").alias(key_col_orig),
            "n",
            *[F.col(nm).cast("long").alias(nm) for nm in names],
        )
    )

"""Two-phase parallel prefix sum: running totals over a
low-cardinality partition key without serializing on it.

``SUM(x) OVER (PARTITION BY key ORDER BY t)`` puts each key's entire
history on one task — the classic low-cardinality window trap (a
handful of event types at 100 TB = a handful of busy cores). The
decomposition:

1. running sums are computed inside (key, slice) partitions, where
   ``slice = t DIV slice_width`` — thousands of fine partitions;
2. each slice's opening offset comes from a tiny per-slice net table
   (keys x slices rows) cumulated with an ordinary window, then
   broadcast-joined back.

``prefix(t) = slice_offset(key, slice(t)) + running_within_slice(t)``
— exactly equal to the naive window (proven by ``q_interval_overlap``'s
naive-form oracle and the property test), with the slice width as the
parallelism/ledger-size dial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_phase_running_sum(
    df: DataFrame,
    key_col: str,
    t_col: str,
    val_col: str,
    slice_width: int,
    out_col: str = "running",
) -> DataFrame:
    """Append ``out_col`` = SUM(val) OVER (PARTITION BY key ORDER BY t
    ROWS UNBOUNDED PRECEDING) to ``df``. Requires (key, t) unique
    (pre-aggregate ties first — a running sum over tied order keys is
    not well-defined row-wise).

    A NULL key is a first-class partition (window PARTITION BY already
    treats it as one; the offset join must too): the join key is
    carried in a one-field STRUCT, whose equality is null-safe —
    the bare-column join silently dropped the NULL partition's rows
    while the naive-window oracle kept them (round-9 dimension-null
    fuzzing, q_interval_overlap)."""
    sliced = df.withColumn(
        "__skey", F.struct(F.col(key_col).alias("k"))
    ).withColumn(
        "__slice", F.expr(f"{t_col} DIV {slice_width}")
    )
    key_col = "__skey"
    w_in = (
        Window.partitionBy(key_col, "__slice")
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inslice = sliced.withColumn("__run_in", F.sum(val_col).over(w_in))
    slice_net = sliced.groupBy(key_col, "__slice").agg(
        F.sum(val_col).alias("__net")
    )
    w_slices = (
        Window.partitionBy(key_col)
        .orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = slice_net.select(
        key_col,
        "__slice",
        F.coalesce(F.sum("__net").over(w_slices), F.lit(0)).alias(
            "__off"
        ),
    )
    return (
        inslice.join(F.broadcast(offsets), [key_col, "__slice"])
        .withColumn(out_col, F.col("__off") + F.col("__run_in"))
        .drop("__skey", "__slice", "__run_in", "__off")
    )


# sub-bands per single-value band under heavy ties (r10): 64 restores
# two-orders-of-magnitude parallelism on a fully-tied column while
# keeping the ledger <= 1024 values x 64 = 65k rows — still tiny
_TIE_SUBBANDS = 64


def two_phase_row_number(
    df: DataFrame,
    value_col: str,
    id_col: str,
    band_width: int | None = None,
    out_col: str = "rn",
    probe: tuple | None = None,
) -> DataFrame:
    """Append ``out_col`` = ROW_NUMBER() OVER (ORDER BY value, id)
    without a single-partition global window — the distributed form
    of a global ranking (the escape hatch q_customer_rfm /
    q_curriculum_bins docstrings promised; wired round 9).

    Decomposition (exact, any non-negative integer ``value_col`` with
    a unique ``id_col`` tiebreak):

    1. ``band = value DIV band_width`` — monotonic in value, so the
       global order is (band, value, id) and ranks split into a
       per-band offset plus a WITHIN-band row_number (keyed window;
       thousands of bands = thousands of independent tasks);
    2. per-band counts cumulate into opening offsets on the
       band-sized ledger — ordered under a NON-FOLDABLE constant key
       (pmod(xxhash64(band), 1)): one task, but over #bands rows,
       scale-independent (same trick as skyline_2d's final merge; a
       foldable literal would constant-fold back into the banned
       empty-partition window);
    3. offsets broadcast back onto the bands.

    ``band_width`` is the parallelism dial: pick it so a band holds
    roughly corpus/1000 rows, or pass None (the default) to autotune
    from a one-job min/max probe — width = ceil(range / 1024), i.e.
    <=1024 bands regardless of the value domain, the same
    derive-the-dial-from-the-data move as vector.scaled_planes.
    The ONE driver action per call is that probe: an O(1)-result
    min/max aggregation (never a column collect — SCALE.md envelope).

    Heavy-tie degeneracy (r10, measured on the ties fuzz profile): a
    quantized/low-cardinality value column can leave the whole corpus
    in a handful of bands (3 distinct lineitem quantities -> 3 bands,
    the largest holding 34% of all rows — and ONE distinct value
    would re-create the single-task global window this library exists
    to remove). When the autotune probe sees a span so small that
    every band is a SINGLE value (band_width == 1), the global order
    inside a band is (id) alone, so banding by ``(value, id DIV idw)``
    is order-aligned and restores up to ``_TIE_SUBBANDS``-way
    parallelism per tied value. Multi-value bands (band_width > 1)
    cannot sub-band — splitting by id there would interleave values —
    and keep the honest range-partitioner residual: value ranges
    concentrate bands exactly as they would concentrate any range
    partitioner, dial-able per column."""
    sub_width = None
    id_integral = dict(df.dtypes).get(id_col) in (
        "tinyint", "smallint", "int", "bigint",
    )
    if band_width is None:
        # ``probe`` lets a caller that ranks SEVERAL columns of one
        # frame supply all the min/max pairs from ONE combined
        # aggregation job instead of one probe job per ranking
        # (r11 — q_customer_rfm ran 3 probe jobs; same numbers, same
        # autotune decision)
        lo, hi, ilo, ihi = probe if probe is not None else (df.agg(
            F.min(value_col),
            F.max(value_col),
            F.min(id_col) if id_integral else F.lit(None),
            F.max(id_col) if id_integral else F.lit(None),
        ).first() or (None, None, None, None))
        span = (hi - lo + 1) if lo is not None else 1
        band_width = max(1, (span + 1023) // 1024)
        if band_width == 1 and ilo is not None:
            ispan = ihi - ilo + 1
            sub_width = max(1, (ispan + _TIE_SUBBANDS - 1) // _TIE_SUBBANDS)
    if sub_width is not None:
        # single-value bands: order within a band is id alone, so an
        # id-range split preserves the global (value, id) order
        banded = df.withColumn(
            "__band",
            F.struct(
                F.col(value_col).alias("v"),
                F.expr(f"{id_col} DIV {sub_width}").alias("s"),
            ),
        )
    else:
        banded = df.withColumn(
            "__band",
            F.struct(
                F.expr(f"{value_col} DIV {band_width}").alias("v"),
                F.lit(0).alias("s"),
            ),
        )
    w_in = Window.partitionBy("__band").orderBy(value_col, id_col)
    counts = banded.groupBy("__band").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_led = (
        Window.partitionBy("__k")
        .orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("__k")
    offsets = counts.withColumn(
        "__k", F.pmod(F.xxhash64(F.col("__band.v"), F.col("__band.s")), F.lit(1))
    ).select(
        "__band",
        F.coalesce(F.sum("__cnt").over(w_led), F.lit(0)).alias("__off"),
        # total row count rides the same ledger (no extra 1-row
        # crossJoin — that would be the BNLJ shape the plan contract
        # bans); consumers that don't need it drop it below
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    return (
        banded.join(F.broadcast(offsets), "__band")
        .withColumn(
            out_col,
            (F.col("__off") + F.row_number().over(w_in)).cast("long"),
        )
        .drop("__band", "__off")
    )


def two_phase_ntile(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int,
    band_width: int | None,
    out_col: str,
    probe: tuple | None = None,
) -> DataFrame:
    """Append ``out_col`` = NTILE(k) OVER (ORDER BY value, id) via
    ``two_phase_row_number`` — bit-identical to engine NTILE (first
    n % k buckets take ceil(n/k) rows, the rest floor(n/k); pinned
    against F.ntile by tests/test_two_phase_rank.py) with no
    single-partition window over the data frame. The total row count
    rides the broadcast band ledger (``__n``), so no extra pass and
    no 1-row crossJoin."""
    rn = two_phase_row_number(df, value_col, id_col, band_width, "__rn", probe)
    quot = F.expr(f"__n DIV {k}")
    rem = F.expr(f"__n % {k}")
    cut = rem * (quot + 1)
    tile = F.when(
        F.col("__rn") <= cut,
        F.expr(f"(__rn - 1) DIV (__n DIV {k} + 1) + 1"),
    ).otherwise(
        rem
        + F.expr(
            f"(__rn - (__n % {k}) * (__n DIV {k} + 1) - 1)"
            f" DIV (__n DIV {k}) + 1"
        )
    )
    return rn.withColumn(out_col, tile.cast("long")).drop("__rn", "__n")

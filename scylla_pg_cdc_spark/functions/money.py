"""Exact money math as integer cents.

The reference compares money under ABS(delta) < 0.01 and rounds to 2
decimals (`docker/postgres/init.sql:412-434`), and its comparer uses a
1e-4 float tolerance (`src/reconciliation/comparer.py:27,266-267`)
because row-at-a-time Python float math drifts. At 100 TB a
sum-of-doubles is *order-dependent* across partial aggregation, which
breaks both reproducibility and oracle checks — so the engine's policy
is: convert 2-decimal money to integer cents at scan time, aggregate
exactly in LongType (no overflow below ~9.2e16 cents = $92 trillion),
and divide by 100.0 only at the very end for presentation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """2-decimal double -> exact integer cents (LongType)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def pct_units(col: Column | str) -> Column:
    """2-decimal fraction (e.g. discount 0.07) -> integer percent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def dollars(cents_col: Column | str) -> Column:
    """Integer cents -> presentation double (deterministic: a single
    IEEE-754 division, identical in any engine)."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return (c / F.lit(100.0)).cast("double")

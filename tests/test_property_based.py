"""Property-based tests (hypothesis) — a testing mode the reference
lacks (SURVEY.md §5 'not present'): randomized perturbations must
always satisfy the diff engine's algebraic invariants, and random
schema edits must satisfy compatibility-mode algebra."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from scylla_pg_cdc_spark.functions.schema_evolution import (
    BACKWARD,
    FORWARD,
    FULL,
    check_compatibility,
)
from scylla_pg_cdc_spark.operators.reconcile import diff_datasets

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, value) universe; keys may repeat across src/tgt with different values
row_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5)),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@SETTINGS
@given(src_rows=row_strategy, tgt_rows=row_strategy)
def test_diff_partition_invariants(spark, src_rows, tgt_rows):
    """The 4 classes partition the key universe:
    missing+match+mismatch = |src|, extra+match+mismatch = |tgt|,
    and classification matches set algebra exactly."""
    schema = "k long, v long"
    src = spark.createDataFrame(src_rows or [], schema)
    tgt = spark.createDataFrame(tgt_rows or [], schema)
    diff = {r["k"]: r["diff_type"] for r in diff_datasets(src, tgt, ["k"]).collect()}

    s = dict(src_rows)
    t = dict(tgt_rows)
    for k in set(s) | set(t):
        if k in s and k not in t:
            assert diff[k] == "missing"
        elif k in t and k not in s:
            assert diff[k] == "extra"
        elif s[k] == t[k]:
            assert diff[k] == "match"
        else:
            assert diff[k] == "mismatch"
    assert set(diff) == set(s) | set(t)


@SETTINGS
@given(src_rows=row_strategy, tgt_rows=row_strategy)
def test_diff_symmetry(spark, src_rows, tgt_rows):
    """Swapping source and target swaps missing<->extra and preserves
    match/mismatch."""
    schema = "k long, v long"
    src = spark.createDataFrame(src_rows or [], schema)
    tgt = spark.createDataFrame(tgt_rows or [], schema)
    fwd = {r["k"]: r["diff_type"] for r in diff_datasets(src, tgt, ["k"]).collect()}
    rev = {r["k"]: r["diff_type"] for r in diff_datasets(tgt, src, ["k"]).collect()}
    swap = {"missing": "extra", "extra": "missing",
            "match": "match", "mismatch": "mismatch"}
    assert rev == {k: swap[v] for k, v in fwd.items()}


field_pool = ["a", "b", "c", "d", "e"]
schema_strategy = st.lists(
    st.tuples(st.sampled_from(field_pool), st.booleans()),
    min_size=1, max_size=5, unique_by=lambda t: t[0],
)


def _mk(fields):
    return StructType(
        [StructField(n, LongType() if n < "c" else StringType(), nullable)
         for n, nullable in fields]
    )


@SETTINGS
@given(old=schema_strategy, new=schema_strategy)
def test_compatibility_mode_algebra(spark, old, new):
    """FULL <=> BACKWARD and FORWARD; self-compatibility always holds;
    BACKWARD(new, old) == FORWARD(old, new)."""
    so, sn = _mk(old), _mk(new)
    assert check_compatibility(so, so, FULL).compatible
    b = check_compatibility(sn, so, BACKWARD).compatible
    f = check_compatibility(sn, so, FORWARD).compatible
    full = check_compatibility(sn, so, FULL).compatible
    assert full == (b and f)
    assert f == check_compatibility(so, sn, BACKWARD).compatible


update_sequence = st.lists(
    st.tuples(
        st.integers(0, 3),                                  # key
        st.one_of(st.none(), st.integers(0, 9)),            # col a
        st.one_of(st.none(), st.integers(0, 9)),            # col b
    ),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(seq=update_sequence)
def test_partial_update_merge_matches_reference_semantics(spark, seq):
    """compact_partial_updates == the reference trigger's row-at-a-time
    semantics (IF NEW.x IS NULL THEN keep OLD.x), checked against a
    driver-side replay of the same sequence."""
    from scylla_pg_cdc_spark.streaming.pipeline import compact_partial_updates

    rows = [
        (i, key, i * 10, a, b) for i, (key, a, b) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, key long, commit_ms long, a long, b long"
    )
    got = {
        r["key"]: (r["a"], r["b"])
        for r in compact_partial_updates(df, "key", ["a", "b"]).collect()
    }
    # reference replay: apply updates in commit order, NULLs preserved
    want: dict = {}
    for _, key, _, a, b in rows:
        prev_a, prev_b = want.get(key, (None, None))
        want[key] = (a if a is not None else prev_a,
                     b if b is not None else prev_b)
    assert got == want


@SETTINGS
@given(src_rows=row_strategy, tgt_rows=row_strategy)
def test_repair_roundtrip_always_converges(spark, src_rows, tgt_rows):
    """For ANY source/target pair: diff -> actions -> apply yields a
    target whose re-diff against the source is all-match, and applying
    the same actions twice equals applying them once (idempotence).
    This is the algebraic contract of the repair executor
    (scripts/reconcile.py:490-522 analog) under arbitrary data."""
    from scylla_pg_cdc_spark.operators.reconcile import (
        apply_repairs,
        generate_repair_actions,
    )

    schema = "k long, v long"
    src = spark.createDataFrame(src_rows or [], schema)
    tgt = spark.createDataFrame(tgt_rows or [], schema)
    diff = diff_datasets(src, tgt, ["k"])
    actions = generate_repair_actions(diff, src, ["k"], "t")
    once = apply_repairs(tgt, actions, src, ["k"])
    rediff = diff_datasets(src, once, ["k"]).collect()
    assert all(r["diff_type"] == "match" for r in rediff)
    assert len(rediff) == len(src_rows)
    twice = apply_repairs(once, actions, src, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=20,
    )
)
def test_morton_code_matches_python_reference(spark, pairs):
    """The Spark Morton-code expression equals a bit-twiddling Python
    reference for arbitrary 16-bit pairs, and the code is injective."""
    from scylla_pg_cdc_spark.operators.layout import _morton_spark

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            _morton_spark(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    assert got == [morton(a, b) for a, b in pairs]
    assert len(set(got)) == len(set(pairs))


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),
            st.one_of(st.none(), st.integers(-50, 150)),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_constraint_counts_match_python_reference(spark, rows):
    """audit() violation counts equal a naive Python recount for
    random (possibly-null, possibly-duplicate) data."""
    from scylla_pg_cdc_spark.functions import constraints as C

    df = spark.createDataFrame(rows, "id long, value long") if rows else (
        spark.createDataFrame([], "id long, value long")
    )
    rules = [
        C.not_null("nn", "t", "value"),
        C.accepted_range("rng", "t", "value", 0, 100),
        C.unique("uq", "t", "id"),
    ]
    got = {
        r["rule"]: r["n_violations"]
        for r in C.audit({"t": df}, rules).collect()
    }
    want_nn = sum(1 for _, v in rows if v is None)
    want_rng = sum(1 for _, v in rows if v is None or v < 0 or v > 100)
    from collections import Counter

    counts = Counter(i for i, _ in rows)
    want_uq = sum(n - 1 for n in counts.values() if n > 1)
    assert got == {"nn": want_nn, "rng": want_rng, "uq": want_uq}


@SETTINGS
@given(
    epochs=st.lists(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 99)),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_join_view_ivm_matches_recompute_under_random_churn(spark, epochs):
    """maintain_join_view == full recompute for ANY sequence of keyed
    replacements (last write per key wins within an epoch)."""
    from scylla_pg_cdc_spark.streaming.mv import (
        compute_join_view,
        maintain_join_view,
    )

    dim = spark.createDataFrame(
        [(k, f"t{k % 3}") for k in range(0, 7, 2)], "k long, tier string"
    )
    state: dict[int, int] = {}
    view = None
    for batch in epochs:
        for k, v in batch:
            state[k] = v
        touched = spark.createDataFrame(
            [(k,) for k in {k for k, _ in batch}] or [(None,)], "k long"
        ).filter(F.col("k").isNotNull())
        a_new = (
            spark.createDataFrame(list(state.items()), "k long, v long")
            if state
            else spark.createDataFrame([], "k long, v long")
        )
        view = maintain_join_view(view, a_new, dim, touched, "k")
        view = spark.createDataFrame(view.collect(), view.schema)
        want = sorted(
            tuple(r) for r in compute_join_view(a_new, dim, "k").collect()
        )
        got = sorted(tuple(r) for r in view.collect())
        assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),          # type
            st.integers(0, 10_000_000),           # ts_ms
            st.floats(0, 500, allow_nan=False),   # value
        ),
        min_size=4,
        max_size=40,
    )
)
def test_drift_ks_bounds_and_self_zero(spark, rows):
    """KS invariants on random event frames: 0 <= ks_ppm <= 1e6, and
    a distribution tested against itself (duplicated stream around
    the midpoint) gives ks_ppm == 0."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from scylla_pg_cdc_spark.streaming.drift_state import _ks, _value_counts

    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("event_id", LongType()),
        ]
    )
    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [
            (t, base + dt.timedelta(milliseconds=ms), v, i)
            for i, (t, ms, v) in enumerate(rows)
        ],
        schema,
    )
    counts = _value_counts(df)
    # self-comparison: identical distributions -> D = 0 per type
    self_ks = _ks(counts, counts).collect()
    assert all(r["ks_ppm"] == 0 for r in self_ks)
    # split halves: bounds hold whatever the split
    half_a = _value_counts(df.filter(F.col("event_id") % 2 == 0))
    half_b = _value_counts(df.filter(F.col("event_id") % 2 == 1))
    for r in _ks(half_a, half_b).collect():
        assert 0 <= r["ks_ppm"] <= 1_000_000


@SETTINGS
@given(
    vals=st.lists(
        st.integers(-(10**9), 10**9), min_size=1, max_size=30
    ),
    den=st.integers(1, 10**6),
)
def test_floordiv_sql_matches_python_floor(spark, vals, den):
    """analytics.floordiv_sql must equal Python's // (true floor) for
    any sign of numerator — the Spark-DIV-vs-DuckDB-// trap."""
    from scylla_pg_cdc_spark.operators.analytics import floordiv_sql

    df = spark.createDataFrame([(v,) for v in vals], "num long")
    got = [
        r["fd"]
        for r in df.select(
            F.expr(floordiv_sql("num", str(den))).alias("fd")
        ).collect()
    ]
    assert got == [v // den for v in vals]


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            # tiny value range + multiples of the bucket width force
            # heavy ties ON bucket boundaries — the adversarial case
            # for the two-phase rank select
            st.sampled_from([0, 1, 2, 5, 5, 5, 10, 10, 11, 19, 20, 21]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rank_select_percentiles_match_full_sort(spark, rows):
    """Two-phase rank-select == full-sort selection for any data,
    including massive ties across bucket boundaries (bucket_width=10
    so values 10/20 sit exactly on boundaries)."""
    from scylla_pg_cdc_spark.functions.percentiles import (
        rank_select_percentiles,
    )

    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: (r["n"], r["p50"], r["p95"], r["p99"])
        for r in rank_select_percentiles(
            df, "k", "v", bucket_width=10, checkpoint=False
        ).collect()
    }
    want = {}
    for k in {k for k, _ in rows}:
        vs = sorted(v for kk, v in rows if kk == k)
        n = len(vs)
        want[k] = (
            n,
            vs[(n + 1) // 2 - 1],
            vs[(95 * n + 99) // 100 - 1],
            vs[(99 * n + 99) // 100 - 1],
        )
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(0, 50),          # t — small range forces slice
            st.integers(-5, 5),          #     boundary collisions
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),  # (key, t) unique by contract
    )
)
def test_two_phase_running_sum_matches_naive_window(spark, rows):
    """two_phase_running_sum == the naive global window for any data,
    slice boundaries landing mid-stream included (slice_width=7)."""
    from scylla_pg_cdc_spark.functions.sweep import two_phase_running_sum

    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {
        (r["k"], r["t"]): r["running"]
        for r in two_phase_running_sum(df, "k", "t", "v", 7).collect()
    }
    want = {}
    for k in {k for k, _, _ in rows}:
        acc = 0
        for _, t, v in sorted(
            (r for r in rows if r[0] == k), key=lambda r: r[1]
        ):
            acc += v
            want[(k, t)] = acc
    assert got == want

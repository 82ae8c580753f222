"""Distribution-fuzz regressions (tools/fuzz_oracle.py findings).

Round-9 distribution fuzzing ran every registered query over
adversarial derivations of the testdata (ties / sparse / unicode /
nulls profiles).  The bugs it found are pinned here on in-test
miniature corpora so they cannot regress without a full fuzz sweep.

Finding 1 (fixed): PQ/IVF k-means seeding assumed DENSE vec_ids
(`vec_id BETWEEN 1 AND K`) — any filtered or sparse-id corpus produced
an EMPTY seed set and a driver-side `max() arg is an empty sequence`
crash.  Seeding is now rank-based (the K smallest vec_ids), identical
on both engines (`ROW_NUMBER() OVER (ORDER BY vec_id)` in the oracle).

Finding 2 (fixed): q_ngram_lm_counts built trigram slices with length
`size(l) - 2`, and Spark's slice() hard-rejects negative lengths — one
single-token document crashed the whole corpus query (the oracle's
range() comprehensions were naturally empty).  Lengths are now clamped
with greatest(..., 0).

Finding 3 (fixed): ROUND over an interpolated percentile diverges
between engines whenever the true quantile lands on an exact .xx5
midpoint — Spark round() goes through BigDecimal.valueOf's
shortest-decimal repr (36.035 -> 36.04) while DuckDB rounds the stored
binary (36.03499... -> 36.03).  q_agg_percentile now interpolates over
integer CENTS (midpoints are *.5, binary-exact) and divides by 100
once — no ROUND anywhere after interpolation.

Finding 4 (fixed): Spark ASC ordering defaults to NULLS FIRST, DuckDB
to NULLS LAST — a window ranking over a nullable sort key silently
gives the same row percent_rank 0.0 on one engine and 1.0 on the
other.  q_window_percentile_rank pins NULLS FIRST explicitly on both
sides.

Finding 8 (fixed): a (lang, source) group made entirely of empty
documents has zero words, and q_tokenizer_compression's bare integer
DIV aborted the whole query under ANSI mode (found by the hostile
profile at sf0.01 mass — sf0.001 had no all-empty group).  NULLIF
guard on both sides, the q_domain_tvd / funnel discipline.

Dimension-null profile (nullsdim: holes in lang/source/event_type/
mktsegment/brand) found a third wave, all fixed:
- the two-phase libraries (rank_select_percentiles,
  two_phase_running_sum) joined on the bare group key, and Spark inner
  joins drop NULL keys while GROUP BY (the oracle form) keeps the NULL
  group — keys now travel in one-field STRUCTs, whose equality is
  null-safe, so a NULL key is a first-class group end to end;
- CDC op classification: a NULL/unknown op type is an UPSERT — only an
  explicit tombstone deletes (IS DISTINCT FROM / COALESCE(...=,FALSE)
  in the oracles);
- the funnel's langid stage: NULL label = FAIL, COALESCE'd on both
  sides (Spark's negated when() let NULL fall through to PASS);
- DuckDB CONCAT() silently SKIPS NULL arguments — oracles must use
  NULL-propagating || to match Spark concat().

Extended-nulls profile (holes in o_totalprice / l_quantity /
l_extendedprice) found three more, same families, all fixed:
q_agg_equidepth (NTILE null end pinned), q_winsorized_mean (NULL
totals excluded like AVG on both sides), and q_merkle_diff — the
canonical row string used NULL-propagating `||` in the oracle but
NULL-SKIPPING concat_ws in Spark, so a NULL field silently diverged
the content digests; both sides now coalesce every field to an
explicit sentinel before joining (the bucket_digests discipline).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.vector import (
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    _pq_train,
    q_embed_pq_codes,
)
from scylla_pg_cdc_spark.registry import load_all
from scylla_pg_cdc_spark.sources.tables import load_table

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def sparse_dir(spark, tmp_path_factory):
    """A 10-vector embeddings corpus whose vec_ids are sparse multiples
    of 53 (plus vec_id 0) — the exact shape that crashed the dense-id
    seeding."""
    d = tmp_path_factory.mktemp("fuzz_sparse_emb")
    emb = load_table(spark, SF_SMALL, "embeddings")
    emb.filter((F.col("vec_id") % 53 == 0) | (F.col("vec_id") == 0)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pq_train_sparse_ids_smaller_than_k(spark, sparse_dir):
    """Training on a sparse-id corpus (n >= K) must not crash and must
    seed centroids by RANK: cid 0..K-1 present, each SUBDIM wide."""
    cents = _pq_train(spark, sparse_dir)
    assert set(cents) == {(s, j) for s in range(PQ_M) for j in range(PQ_K)}
    for comp in cents.values():
        assert len(comp) == PQ_SUBDIM


def test_pq_train_corpus_smaller_than_k(spark, tmp_path):
    """A corpus with FEWER than K vectors trains a correspondingly
    smaller codebook instead of crashing."""
    d = tmp_path / "tiny"
    emb = load_table(spark, SF_SMALL, "embeddings")
    emb.filter(F.col("vec_id").isin([7, 211, 499])).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    cents = _pq_train(spark, str(d))
    cids = {j for _, j in cents}
    assert cids == {0, 1, 2}


def test_pq_train_empty_corpus_raises(spark, tmp_path):
    d = tmp_path / "empty"
    emb = load_table(spark, SF_SMALL, "embeddings")
    emb.filter(F.lit(False)).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    with pytest.raises(ValueError, match="empty"):
        _pq_train(spark, str(d))


def test_ngram_lm_counts_short_docs(spark, tmp_path):
    """Empty-string and 1-token documents must not crash the n-gram
    count-of-counts query, and its trigram/bigram arrays must be empty
    (not negative-length) for them."""
    d = tmp_path / "shortdocs"
    spark.createDataFrame(
        [(1, "", "en", "src0", 0), (2, "one", "en", "src0", 3),
         (3, "a b c d", "en", "src0", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from scylla_pg_cdc_spark.operators.text import q_ngram_lm_counts

    rows = {(r["n"], r["count_value"]): r["n_types"]
            for r in q_ngram_lm_counts(spark, str(d)).collect()}
    # doc 3 contributes 3 bigrams and 2 trigrams, each seen once;
    # docs 1/2 contribute only unigrams ("", "one")
    assert rows[(2, 1)] == 3
    assert rows[(3, 1)] == 2


def test_percentile_midpoint_is_engine_exact(spark, tmp_path):
    """A p50 landing exactly between 36.03 and 36.04 must come out as
    36.035 (cent-midpoints are binary-exact), never a per-engine
    rounding of it."""
    d = tmp_path / "mid"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, "purchase", 36.03, "{}"),
         (2, "2024-01-01 00:00:01", 10, "purchase", 36.04, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    from scylla_pg_cdc_spark.operators.aggregates import q_agg_percentile

    row = q_agg_percentile(spark, str(d)).collect()[0]
    assert row["p50"] == 36.035

    spec = load_all()["q_agg_percentile"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    drow = con.execute(spec.oracle).fetchone()
    assert drow[1] == 36.035


def test_window_rank_null_ordering_pinned(spark, tmp_path):
    """A NULL sort key must land at the SAME end of the window on both
    engines (pinned NULLS FIRST)."""
    d = tmp_path / "nullrank"
    spark.createDataFrame(
        [(1, "a", 1, None, "SEG"), (2, "b", 1, 10.0, "SEG"),
         (3, "c", 1, 20.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "customer.parquet")
    )
    from scylla_pg_cdc_spark.operators.windows import q_window_percentile_rank

    srows = {r["c_custkey"]: r["pct_rank"]
             for r in q_window_percentile_rank(spark, str(d)).collect()}
    assert srows[1] == 0.0  # NULL balance ranks first

    spec = load_all()["q_window_percentile_rank"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{d}/customer.parquet/*.parquet')"
    )
    drows = {r[0]: r[2] for r in con.execute(spec.oracle).fetchall()}
    assert drows == srows


def test_rank_select_keeps_null_group(spark):
    """rank_select_percentiles must return a row for the NULL group,
    identical to what a naive GROUP-BY-with-window computes."""
    from scylla_pg_cdc_spark.functions.percentiles import (
        rank_select_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), (None, 5), (None, 15)],
        "k string, v long",
    )
    out = {r["k"]: (r["n"], r["p50"])
           for r in rank_select_percentiles(
               df, "k", "v", [("p50", "(n + 1) DIV 2")],
               bucket_width=10, checkpoint=False).collect()}
    assert out["a"] == (3, 20)
    assert out[None] == (2, 5)


def test_two_phase_running_sum_keeps_null_partition(spark):
    """two_phase_running_sum must carry the NULL partition through the
    offset join (window PARTITION BY already treats NULL as one
    partition; the join must not drop it)."""
    from scylla_pg_cdc_spark.functions.sweep import two_phase_running_sum

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 100, 2), (None, 2, 5), (None, 200, 7)],
        "k string, t long, x long",
    )
    out = two_phase_running_sum(df, "k", "t", "x", 50, out_col="run")
    got = {(r["k"], r["t"]): r["run"] for r in out.collect()}
    assert got[("a", 1)] == 1 and got[("a", 100)] == 3
    assert got[(None, 2)] == 5 and got[(None, 200)] == 12


def test_tokenizer_compression_all_empty_group(spark, tmp_path):
    """A source whose documents are all empty must yield NULL
    chars_per_word_ppm on both engines, not an ANSI divide-by-zero
    abort."""
    d = tmp_path / "emptygrp"
    spark.createDataFrame(
        [(1, "", "en", "srcA", 0), (2, "  ", "en", "srcA", 2),
         (3, "real words here", "en", "srcB", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from scylla_pg_cdc_spark.operators.text import q_tokenizer_compression

    rows = {r["source"]: r["chars_per_word_ppm"]
            for r in q_tokenizer_compression(spark, str(d)).collect()}
    assert rows["srcA"] is None
    assert rows["srcB"] == 5_000_000  # 15 chars / 3 words

    spec = load_all()["q_tokenizer_compression"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    drows = {r[1]: r[5] for r in con.execute(spec.oracle).fetchall()}
    assert drows == rows


def test_merkle_digest_null_sentinel(spark, tmp_path):
    """A NULL field in the canonical row string must digest identically
    on both engines (explicit per-field sentinel, not ||-propagation or
    concat_ws-skipping), and distinctly from an empty string."""
    d = tmp_path / "merkle_nulls"
    spark.createDataFrame(
        [(1, 10, "F", None, "2024-01-01 00:00:00", "1-URGENT"),
         (2, 11, "O", 55.5, "2024-01-02 00:00:00", "2-HIGH"),
         (3, 12, "F", 0.0, "2024-01-03 00:00:00", "3-MEDIUM")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))

    spec = load_all()["q_merkle_diff"]
    srows = sorted(tuple(r) for r in spec.fn(spark, str(d)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet/*.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert srows == drows


def test_pq_codes_sparse_ids_match_oracle(spark, sparse_dir):
    """The full engine-vs-oracle differential on the sparse-id corpus:
    the rank-based seeding must agree between Spark and DuckDB."""
    spec = load_all()["q_embed_pq_codes"]
    sdf = q_embed_pq_codes(spark, sparse_dir)
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sparse_dir}/embeddings.parquet/*.parquet')"
    )
    duck_rows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# Round-10 nullts profile (NULL timestamps + NULL join/entity keys —
# the axis the generator contract forbids). 26 queries diverged on the
# first sweep; the fix classes pinned here:
#
# - asof joins: DuckDB's native ASOF does NOT follow three-valued
#   logic for NULLs (it paired a NULL probe with a NULL build row);
#   the engine drops NULL-ts/NULL-key right rows and NULL-extends
#   NULL-ts/NULL-key probes, and the oracle spells that contract out.
# - every window ORDER BY over a nullable ts pins NULLS FIRST on both
#   engines (Spark's asc default vs DuckDB's NULLS LAST).
# - sessionization (incl. native session_window) is defined over
#   timestamped events only.
# - sketches: a NULL key is not a value (COUNT(DISTINCT) semantics).
# - reconciliation joins composite keys NULL-SAFELY with presence
#   flags — a NULL key component reconciles against its twin instead
#   of decaying into a missing+extra pair.
# - SNM blocking: a NULL blocking key forms its own block, like the
#   window PARTITION BY it mirrors.
# - applyInPandas folds: int(NaN) on the NULL group key crashed the
#   worker; NULL groups are first-class output rows.
# ---------------------------------------------------------------------------

_NULLTS_PINNED = [
    "q_agg_approx_distinct",
    "q_asof_join",
    "q_asof_join_forward",
    "q_event_ewma",
    "q_event_ewma_exact",
    "q_event_gaps",
    "q_stream_session",
    "q_stream_session_native",
    "q_kmv_distinct",
    "q_reconcile_composite",
    "q_fuzzy_name_match_scaled",
]


@pytest.fixture(scope="module")
def nullts_dir(tmp_path_factory):
    """The real nullts fuzz profile over sf0.001 — NULL ts in
    events/orders/lineitem, NULL FKs (user_id, o_custkey, l_suppkey,
    l_partkey, c_nationkey, s_nationkey, label)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from fuzz_oracle import fuzz_nullts

    d = tmp_path_factory.mktemp("fuzz_nullts")
    fuzz_nullts(Path(SF_SMALL), d)
    return str(d)


@pytest.fixture(scope="module")
def nullts_duck(nullts_dir):
    con = duckdb.connect()
    from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nullts_dir}/{t}.parquet')"
        )
    return con


def _norm_sorted(rows):
    """Null-safe order-insensitive canonicalization (the check_oracle
    discipline: tag each cell by type so None/int/float sort)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from check_oracle import _norm_rows

    return _norm_rows([tuple(r) for r in rows])


@pytest.mark.parametrize("name", _NULLTS_PINNED)
def test_nullts_profile_engine_matches_oracle(
    spark, nullts_dir, nullts_duck, name
):
    spec = load_all()[name]
    srows = _norm_sorted(spec.fn(spark, nullts_dir).collect())
    drows = _norm_sorted(nullts_duck.execute(spec.oracle).fetchall())
    assert srows == drows, f"{name} diverged on the nullts corpus"


def test_asof_null_ts_right_rows_never_carried(spark):
    """A right row with NULL ts must not be picked as 'latest', and a
    NULL-ts probe NULL-extends — the exact r10 failure shape."""
    from scylla_pg_cdc_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, None)], "lid int, k int, lts long"
    )
    right = spark.createDataFrame(
        [(7, 10, None), (8, 10, 50), (9, None, 40)],
        "rid int, rk int, rts long",
    )
    back = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "rk", "lts", "rts", ["rid"],
            right_tiebreak="rid",
        ).collect()
    }
    assert back == {1: 8, 2: None}
    fwd = {
        r["lid"]: r["rid"]
        for r in asof_join_forward(
            left, right, "k", "rk", "lts", "rts", ["rid"],
            right_tiebreak="rid",
        ).collect()
    }
    assert fwd == {1: None, 2: None}


def test_ewma_exact_null_user_group_survives(spark, nullts_dir):
    """The applyInPandas fold must emit the NULL-user group as a row,
    not crash on int(NaN)."""
    spec = load_all()["q_event_ewma_exact"]
    rows = spec.fn(spark, nullts_dir).collect()
    assert any(r["user_id"] is None for r in rows)


def test_window_full_key_tie_order_insensitive(spark, tmp_path):
    """r10 COMPOUND find (nullts amplified to sf0.01 mass): nulling
    l_partkey collapses two distinct rows into a full-sort-key TIE
    with different measures — a running sum over an order-undefined
    tie diverges between engines. The fix appends the measure itself
    as the final tiebreak; this pins the mini shape that needs it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "l_orderkey": [1, 1, 1],
        "l_partkey": pa.array([None, None, 5], type=pa.int64()),
        "l_suppkey": [30, 30, 7],
        "l_linenumber": pa.array([2, 2, 3], type=pa.int32()),
        "l_quantity": [12.0, 41.0, 3.0],
        "l_extendedprice": [100.0, 900.0, 50.0],
        "l_discount": [0.0, 0.0, 0.0],
        "l_tax": [0.0, 0.0, 0.0],
        "l_returnflag": ["N", "N", "N"],
        "l_linestatus": ["O", "O", "O"],
        "l_shipdate": pa.array([None, None, None], type=pa.timestamp("us")),
    }
    d = tmp_path / "li"
    d.mkdir()
    pq.write_table(pa.table(rows), d / "lineitem.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    for name in ("q_window_running_sum", "q_window_moving_avg"):
        spec = load_all()[name]
        srows = _norm_sorted(spec.fn(spark, str(d)).collect())
        drows = _norm_sorted(con.execute(spec.oracle).fetchall())
        assert srows == drows, f"{name} diverged on the full-key tie"


def test_kmv_setops_null_key_excluded(spark, nullts_dir, nullts_duck):
    """r10 COMPOUND find: a NULL user_id is not a set member (its NULL
    hash ranked NULLS-FIRST on Spark, NULLS-LAST on DuckDB, shifting
    the kth minimum once a NULL-keyed clicker exists)."""
    spec = load_all()["q_kmv_setops"]
    srows = _norm_sorted(spec.fn(spark, nullts_dir).collect())
    drows = _norm_sorted(nullts_duck.execute(spec.oracle).fetchall())
    assert srows == drows


def test_rfm_null_custkey_and_null_dates(spark, tmp_path):
    """r10 nullts@sf0.1 find: the NULL-custkey group and an
    all-NULL-date customer rank into the NULL (lowest) band of the
    two-phase NTILE — the oracle must pin NULLS FIRST on every rank
    key or the quintile cells shift by one at mass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    custkeys = [None if i == 0 else (100 + i % 13) for i in range(n)]
    dates = [
        None if i % 5 == 2 else (1_500_000_000_000_000 + i * 86_400_000_000)
        for i in range(n)
    ]
    rows = {
        "o_orderkey": list(range(1, n + 1)),
        "o_custkey": pa.array(custkeys, type=pa.int64()),
        "o_orderstatus": ["O"] * n,
        "o_totalprice": [100.0 + i for i in range(n)],
        "o_orderdate": pa.array(dates, type=pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * n,
    }
    d = tmp_path / "rfm"
    d.mkdir()
    pq.write_table(pa.table(rows), d / "orders.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet')"
    )
    spec = load_all()["q_customer_rfm"]
    srows = _norm_sorted(spec.fn(spark, str(d)).collect())
    drows = _norm_sorted(con.execute(spec.oracle).fetchall())
    assert srows == drows

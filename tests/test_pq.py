"""Product-quantization codebook invariants.

The exact value check lives in the DuckDB oracle (q_embed_pq_codes /
q_vector_pq_knn); these tests pin the structural properties that make
the operator a *correct PQ*, independent of any engine comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.vector import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    _pq_code_structs,
    _pq_codebook_df,
    _pq_train,
    _pq_u_col,
    q_embed_pq_codes,
    q_vector_pq_knn,
)
from scylla_pg_cdc_spark.sources.tables import load_table

from conftest import SF_SMALL


def test_codebook_shape_and_range(spark):
    cents = _pq_train(spark, SF_SMALL)
    assert set(cents) == {(s, j) for s in range(PQ_M) for j in range(PQ_K)}
    for comp in cents.values():
        assert len(comp) == PQ_SUBDIM
        # u in [0, 254] => milli centroids in [0, 254000]
        assert all(0 <= c <= 254_000 for c in comp)


def test_codes_in_range_and_full_coverage(spark):
    out = q_embed_pq_codes(spark, SF_SMALL).collect()
    n_vec = load_table(spark, SF_SMALL, "embeddings").count()
    assert len(out) == n_vec
    for r in out:
        parts = r["pq_code"].split("|")
        assert len(parts) == PQ_M
        assert all(0 <= int(p) < PQ_K for p in parts)
        assert r["recon_err"] >= 0


def test_lloyd_iterations_do_not_increase_recon_err(spark):
    """k-means monotonicity: total reconstruction error after training
    is <= the error under the seed (iteration-0) codebook.  Centroid
    rounding to milli-units can perturb a step by at most ~SUBDIM*1
    squared-milli per vector, far below the improvement on real data."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.select("vec_id", _pq_u_col().alias("u"))

    seed_rows = base.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= PQ_K)
    ).collect()
    cents0 = {}
    for r in seed_rows:
        for s in range(PQ_M):
            cents0[(s, int(r["vec_id"]) - 1)] = [
                1000 * int(x)
                for x in r["u"][s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            ]

    def total_err(cents):
        joined = base.crossJoin(F.broadcast(_pq_codebook_df(spark, cents)))
        asg = _pq_code_structs()
        err = sum((a["d"] for a in asg), F.lit(0).cast("long"))
        return joined.agg(F.sum(err)).head()[0]

    err0 = total_err(cents0)
    errN = total_err(_pq_train(spark, SF_SMALL))
    assert errN <= err0
    assert PQ_ITERS >= 1


def test_adc_topk_is_deterministic(spark):
    a = [tuple(r) for r in q_vector_pq_knn(spark, SF_SMALL).collect()]
    b = [tuple(r) for r in q_vector_pq_knn(spark, SF_SMALL).collect()]
    assert a == b
    assert len(a) == 10
    # ranked ascending by integer ADC distance, vec_id tiebreak
    dists = [r[2] for r in a]
    assert dists == sorted(dists)

"""Hybrid retrieval: lexical BM25 + dense cosine, fused by Reciprocal
Rank Fusion — the standard first-stage ranker of a modern RAG /
training-data-selection stack (sparse recall catches exact terms,
dense recall catches paraphrase; RRF combines them without score
calibration, using only ranks).

Reference anchor: the reference validates warehouse content with
aggregate SQL probes (``tests/validation/warehouse_checks.sql``); this
extends the corpus-selection layer (``operators/corpus.py`` BM25,
``operators/vector.py`` KNN) with the fusion step a retrieval pipeline
actually serves.

Numeric portability: RRF is rank-only, so the fusion itself is exact
integer arithmetic — ``1e6 DIV (60 + rank)`` summed over the lists a
document appears in (k=60, the constant from the original RRF paper,
Cormack et al., SIGIR 2009). Both input rankings are produced under
the repo's exact-integer policy (BM25 as all-integer rationals
micro-quantized per term; cosine micro-quantized before ranking), and
every ordering carries a doc_id tiebreak, so list membership and ranks
are bit-identical across engines.

Scale shape (100 TB): each arm is its own scale-safe retrieval (BM25:
token aggregations + broadcast joins; dense: one scan + TakeOrdered —
or the IVF/PQ variants for a real index); the fusion then touches only
2 x top-N ROWS (N=50), so the outer join and re-sort are constant-size
regardless of corpus size. vec_id keys embeddings 1:1 to doc_id
(TESTDATA.md), which is what makes cross-arm fusion well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.operators.corpus import BM25_CTES, bm25_scores
from scylla_pg_cdc_spark.operators.vector import (
    DIM,
    _query_vector,
    cosine,
)

_POOL = 50  # per-arm candidate pool
_TOPK = 20  # fused results returned
_RRF_K = 60  # Cormack et al. damping constant


@query(
    "q_hybrid_rrf",
    oracle="WITH " + BM25_CTES + f""",
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                   AS lex_rank
        FROM bm25 WHERE doc_id <> 0
    ),
    lex_top AS (SELECT * FROM lex WHERE lex_rank <= {_POOL}),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    s AS (
        SELECT e.vec_id AS doc_id,
               SUM(CAST(e.embedding[CAST(i AS INT) + 1] AS DOUBLE)
                   * CAST(q.qe[CAST(i AS INT) + 1] AS DOUBLE)) AS dp,
               SUM(CAST(e.embedding[CAST(i AS INT) + 1] AS DOUBLE)
                   * CAST(e.embedding[CAST(i AS INT) + 1] AS DOUBLE))
                   AS na,
               SUM(CAST(q.qe[CAST(i AS INT) + 1] AS DOUBLE)
                   * CAST(q.qe[CAST(i AS INT) + 1] AS DOUBLE)) AS nb
        FROM embeddings e, q, range(0, {DIM}) t(i)
        WHERE e.vec_id <> 0
        GROUP BY e.vec_id
    ),
    cosr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(FLOOR(dp / (sqrt(na) * sqrt(nb))
                                       * 1000000 + 0.5) AS BIGINT)
                            DESC,
                            doc_id
               ) AS dense_rank
        FROM s
    ),
    dense_top AS (SELECT * FROM cosr WHERE dense_rank <= {_POOL})
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(d.dense_rank, 0) AS BIGINT) AS dense_rank,
           CAST(COALESCE(1000000 // ({_RRF_K} + l.lex_rank), 0)
                + COALESCE(1000000 // ({_RRF_K} + d.dense_rank), 0)
                AS BIGINT) AS rrf_micro
    FROM lex_top l FULL OUTER JOIN dense_top d ON l.doc_id = d.doc_id
    ORDER BY rrf_micro DESC, doc_id
    LIMIT {_TOPK}
    """,
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: top-50 BM25 candidates and top-50 cosine
    candidates are fused with RRF(k=60) and the top-20 fused docs
    returned with both arm ranks (0 = absent from that arm's pool).

    Both arms exclude doc 0 (its embedding IS the query vector, and
    fusing the query with itself is meaningless). Ranks come from
    ROW_NUMBER over (score DESC, doc_id) — a total order, so the pool
    boundary at 50 is engine-stable. RRF contributions are integer
    floor divisions of positive numbers (Spark DIV == DuckDB // for
    positives; see ``analytics.floordiv_sql`` for the negative-case
    hazard this avoids). Plan: each arm is TakeOrdered(50) on its own
    scale-safe pipeline; the row_number windows, the full outer join
    and the final sort all run on <= 50-row frames — constant work at
    any corpus size."""
    lex = (
        bm25_scores(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(_POOL)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_micro").desc(), "doc_id")
            ),
        )
        .select("doc_id", "lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv]).cast("array<double>")
    v = F.col("embedding").cast("array<double>")
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.floor(cosine(v, q) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("cos_micro"),
        )
        .orderBy(F.col("cos_micro").desc(), "doc_id")
        .limit(_POOL)
        .withColumn(
            "dense_rank",
            F.row_number().over(
                Window.orderBy(F.col("cos_micro").desc(), "doc_id")
            ),
        )
        .select("doc_id", "dense_rank")
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce("dense_rank", F.lit(0))
        .cast("long")
        .alias("dense_rank"),
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + dense_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(_TOPK)

"""ANN tuning sweep: sign-LSH bucketing recall vs candidate-set cost.

For a sample of query vectors, compares LSH-bucketed candidate search
against brute-force ground truth at several hyperplane counts, printing
recall@10 and the average fraction of the corpus scanned — the
measured basis for choosing the plane count at scale (more planes =
smaller buckets = cheaper search, lower recall).

Usage: python tools/ann_recall.py [sf_dir] [--clustered [N]]

``--clustered`` swaps the uniform test corpus for a synthesized
CLUSTERED one (50 centroids + 0.15-amplitude noise, all deterministic
expressions — no stored data): real embedding spaces are clustered,
and LSH recall there is decided by whether buckets respect cluster
boundaries, not by uniform-random luck. The operating points measured
on the clustered corpus are the ones that transfer to production
(NEXT r2 #8).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from scylla_pg_cdc_spark.operators.vector import (  # noqa: E402
    DIM,
    _pseudo_planes,
    cosine,
    sign_lsh_bucket,
)
from scylla_pg_cdc_spark.session import get_session  # noqa: E402
from scylla_pg_cdc_spark.sources.tables import load_table  # noqa: E402

K = 10
N_QUERIES = 12


def clustered_corpus(spark, n: int, n_clusters: int = 50):
    """Deterministic clustered embeddings: vec = centroid(label) +
    0.15 * per-(id,dim) noise, both sin-hash expressions. Nearest
    neighbors are overwhelmingly same-cluster — the structure real
    embedding spaces have and uniform test data lacks."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            f"sin((id % {n_clusters}) * 131.0 + d * 17.0) "
            f"+ 0.15 * sin(id * 7919.0 + d * 101.0))"
        ).alias("vec"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    clustered = "--clustered" in args
    if clustered:
        i = args.index("--clustered")
        args.pop(i)
        n_clustered = int(args.pop(i)) if i < len(args) and args[i].isdigit() else 500
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_session("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    if clustered:
        emb = clustered_corpus(spark, n_clustered).persist()
    else:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("vec")
        ).persist()
    n_total = emb.count()
    queries = [
        (r["vec_id"], r["vec"])
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    def topk(df, qvec, k):
        q = F.array(*[F.lit(float(x)) for x in qvec])
        return [
            r["vec_id"]
            for r in df.select(
                "vec_id", cosine(F.col("vec"), q).alias("s")
            )
            .orderBy(F.col("s").desc(), "vec_id")
            .limit(k)
            .collect()
        ]

    truth = {
        qid: set(topk(emb.filter(F.col("vec_id") != qid), qvec, K))
        for qid, qvec in queries
    }

    print(f"{'planes':>6s} {'tables':>7s} {'recall@10':>10s} {'scanned%':>9s}")
    # single-table AND-amplification (more planes = cheaper, lower
    # recall) vs multi-table OR-amplification (union of candidates
    # from independent plane sets recovers recall, standard LSH):
    for n_planes, n_tables in ((2, 1), (4, 1), (6, 1), (4, 4), (6, 8)):
        tables = []
        for t in range(n_tables):
            # independent plane set per table: slice a longer sequence
            # (the generator is deterministic in the plane index)
            planes = _pseudo_planes(n_planes * (t + 1), DIM)[
                t * n_planes : (t + 1) * n_planes
            ]
            tables.append(
                emb.withColumn(
                    "bucket",
                    F.concat(
                        F.lit(f"t{t}:"),
                        sign_lsh_bucket(F.col("vec"), planes),
                    ),
                ).persist()
            )
        hits, scanned = 0, 0
        for qid, qvec in queries:
            cand = None
            for bt in tables:
                qb = bt.filter(F.col("vec_id") == qid).head()["bucket"]
                c = bt.filter(
                    (F.col("bucket") == qb) & (F.col("vec_id") != qid)
                ).select("vec_id", "vec")
                cand = c if cand is None else cand.unionByName(c)
            cand = cand.dropDuplicates(["vec_id"])
            scanned += cand.count()
            got = set(topk(cand, qvec, K))
            hits += len(got & truth[qid])
        for bt in tables:
            bt.unpersist()
        recall = hits / (len(queries) * K)
        frac = scanned / (len(queries) * n_total)
        print(
            f"{n_planes:6d} {n_tables:7d} {recall:10.2f} {100*frac:8.1f}%"
        )


if __name__ == "__main__":
    main()

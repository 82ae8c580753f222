"""Vector similarity-search operators over embedding columns.

LLM-pipeline extension (BASELINE.json north star): approximate-nearest-
neighbor over ``embeddings.embedding`` (array<float>, 64-dim).

Design for 100 TB:
- dot products / norms are higher-order array expressions
  (``aggregate`` + ``zip_with``) — JVM-side, codegen, no Python;
- brute-force top-k is the exactness baseline: one pass + TakeOrdered,
  fine for one query vector, O(n·d);
- the scale path is sign-LSH (random-hyperplane) bucketing: candidates
  meet only within buckets, turning the all-pairs O(n²) into
  per-bucket joins — the same shape MinHashLSH uses for text;
- IVF-style variant: coarse k-means-ish assignment to the nearest
  label centroid (labels play the coarse codebook) then search within
  the probe cell only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

DIM = 64


def dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """Deterministic query vector: the embedding of vec_id = 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]


@query("q_vector_knn", oracle=None)  # float accumulation order
def q_vector_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=10) against a fixed query vector —
    the exact ANN baseline. One scan; TakeOrdered avoids a full sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv]).cast("array<double>")
    v = F.col("embedding").cast("array<double>")
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            cosine(v, q).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query("q_vector_label_centroid", oracle=None)  # float accumulation order
def q_vector_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean vector per label via posexplode + (label, pos) aggregation —
    shuffle is by (label, dim), so it scales with executors regardless
    of vectors per label (no giant per-label arrays on one task)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("label", "pos", "val")
    return (
        exploded.groupBy("label", "pos")
        .agg(F.avg("val").alias("mean_val"), F.count(F.lit(1)).alias("n_vectors"))
    )


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH: concat of sign bits of <v, plane_i>."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def _pseudo_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state needed):
    plane[i][j] derived from a fixed integer hash — reproducible across
    runs and engines."""
    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = (1103515245 * (i * dim + j + 12345) + 54321) % (2**31)
            row.append((h / 2**31) * 2.0 - 1.0)
        planes.append(row)
    return planes


@query("q_vector_lsh_buckets", oracle=None)  # LSH construction
def q_vector_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing (the ANN scale path): 6 hyperplanes -> 64
    buckets; per-bucket membership counts + mean intra-bucket first
    component. Candidate search then joins within buckets only."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _pseudo_planes(6, DIM)
    v = F.col("embedding").cast("array<double>")
    return (
        emb.select(
            "vec_id", "label", sign_lsh_bucket(v, planes).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


@query("q_embed_neardup", oracle=None)  # float accumulation order
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: sign-LSH bucket
    self-join (never all-pairs), cosine on candidates, top-20 most
    similar pairs — the embedding analog of MinHash near-dup."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _pseudo_planes(4, DIM)
    v = F.col("embedding").cast("array<double>")
    bucketed = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("vec"),
        sign_lsh_bucket(v, planes).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cosine(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
    )
    return pairs.orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b").limit(20)


@query("q_vector_ivf_search", oracle=None)  # float accumulation order
def q_vector_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantization by label centroid (labels act
    as the codebook cells), probe the nearest cell to the query vector,
    exact search within that cell only — O(n/cells) per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv]).cast("array<double>")

    centroids = (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .toDF("label", "pos", "val")
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("mean_val"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pm"))
        .select(
            "label", F.expr("transform(pm, x -> x.mean_val)").alias("centroid")
        )
    )
    probe = (
        centroids.select("label", cosine(F.col("centroid"), q).alias("c"))
        .orderBy(F.col("c").desc(), "label")
        .limit(1)
    )
    probe_label = probe.head()["label"]
    cell = emb.filter(F.col("label") == F.lit(probe_label))
    v = F.col("embedding").cast("array<double>")
    return (
        cell.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine(v, q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query("q_vector_normalize", oracle=None)  # float fold order
def q_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalization of the embedding column — the standard prep
    before cosine ANN (cosine reduces to dot product on unit vectors,
    halving the per-candidate cost). Pure higher-order expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = l2_norm(v)
    return emb.select(
        "vec_id",
        "label",
        norm.alias("norm"),
        F.transform(v, lambda x: x / norm).alias("unit_vec"),
    ).select(
        "vec_id",
        "label",
        "norm",
        F.round(l2_norm(F.col("unit_vec")), 9).alias("unit_norm"),
    )

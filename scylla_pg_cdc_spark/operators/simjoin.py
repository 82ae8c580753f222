"""Exact set-similarity join with prefix filtering (PPJoin-style).

The MinHash/LSH dedup family in ``operators/text.py`` is probabilistic:
banding can miss pairs and surfaces false candidates that need a
confirm pass. This module adds the EXACT similarity join — every pair
of documents whose token-set Jaccard >= t, no misses, no extras —
using the prefix-filtering principle (Chaudhuri et al. ICDE'06,
Xiao et al. WWW'08 / PPJoin): order each document's tokens by global
rarity; if J(x, y) >= t then the first ``|x| - ceil(t*|x|) + 1``
tokens of x and the corresponding prefix of y must share at least one
token. So only documents sharing a PREFIX token ever meet in the
join — the frequent tokens that would blow up a naive token self-join
(every pair of English documents shares "the") are excluded from
blocking unless a document is short enough that they fall inside its
prefix.

Scale shape (100 TB): the candidate join is keyed by prefix token —
shuffle bounded by Σ prefix lengths ~ (1-t) * corpus token count, and
the rarity ordering makes prefix-token buckets SMALL by construction
(the rarest tokens of each doc); the verify step joins candidates to
per-doc token arrays (bounded by document length) and computes exact
intersections with no further shuffle fan-out. The per-doc rank
window partitions by doc_id — never a global vocabulary sort.

The whole pipeline is deterministic integer/string expressions, so the
DuckDB oracle runs the NAIVE exact join (all token-sharing pairs,
feasible at oracle scale) and must produce the identical pair set —
differentially proving the prefix filter is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.text import with_n_common
from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

# Jaccard threshold t = 0.9, kept as the exact fraction 9/10 so every
# filter is integer cross-multiplication (no float thresholds). The
# synthetic docs are template-generated with heavy token overlap, so
# 0.9 is the band that separates true near-dups; a higher t also means
# a SHORTER prefix (~(1-t)*n + 1 tokens), i.e. cheaper blocking.
_T_NUM, _T_DEN = 9, 10


@query(
    "q_jaccard_prefix_join",
    oracle=f"""
    WITH dtok AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE source = 'src0'
        ) WHERE length(token) > 0
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM dtok GROUP BY doc_id
    ), ov AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM dtok a JOIN dtok b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT ov.da AS doc_a, ov.db AS doc_b,
           sa.n AS n_a, sb.n AS n_b, ov.c AS n_common,
           CAST((1000000 * ov.c) // (sa.n + sb.n - ov.c) AS BIGINT)
               AS jaccard_ppm
    FROM ov
    JOIN sz sa ON ov.da = sa.doc_id
    JOIN sz sb ON ov.db = sb.doc_id
    WHERE {_T_DEN} * ov.c >= {_T_NUM} * (sa.n + sb.n - ov.c)
    """,
)
def q_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with token-set Jaccard >= 0.9 within one
    source shard, EXACT (the lossless counterpart of the MinHash/LSH
    near-dup path — see module docstring). Spark runs the
    prefix-filtered plan: (1) per-doc tokens ranked by global rarity
    (df ASC, token ASC — a per-doc window, not a global sort);
    (2) blocking join restricted to each doc's first
    ``n - ceil(t*n) + 1`` rarest tokens, pruned further by the
    lossless length + positional filters; (3) exact verify on per-doc
    token arrays with ``array_intersect``. The integer filter
    ``10*c >= 9*(n_a + n_b - c)`` and ppm score are exact in both
    engines; the DuckDB oracle runs the naive all-sharing-pairs join,
    so a hash match proves the whole filter stack lost nothing.

    Scoped to source='src0' because an exact similarity join's OUTPUT
    is inherently quadratic in near-dup cluster size, and this
    synthetic corpus is one giant cluster family (~1M true pairs at
    sf0.1 corpus-wide — verified, not a plan defect). Production
    dedup at 100 TB makes the same move: partition the corpus (by
    source/shard/LSH band), join within partitions, and pick cluster
    representatives rather than materializing every pair."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src0"
    )
    dtok = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.length("token") > 0)
        .distinct()
    )
    df_tok = dtok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = dtok.join(F.broadcast(df_tok), "token").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "token")
        ),
    )
    sz = dtok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # prefix length n - ceil(t*n) + 1, ceil via exact integer arithmetic
    plen = F.expr(
        f"n - (({_T_NUM} * n + {_T_DEN} - 1) DIV {_T_DEN}) + 1"
    )
    prefix = (
        ranked.join(F.broadcast(sz), "doc_id")
        .filter(F.col("pos") <= plen)
        .select("doc_id", "token", "pos", "n")
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "token",
        F.col("pos").alias("i"),
        F.col("n").alias("na"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "token",
        F.col("pos").alias("j"),
        F.col("n").alias("nb"),
    )
    # two further LOSSLESS prunes from the PPJoin family, applied at
    # candidate generation (this corpus defeats pure rarity blocking —
    # a small template vocabulary makes even "rare" tokens common, so
    # without these the candidate set goes quadratic):
    #  - length filter: J >= t forces t*max(|x|,|y|) <= min(|x|,|y|)
    #  - positional filter: a shared prefix token at ranks (i, j) caps
    #    the overlap at 1 + min(na-i, nb-j), which must reach the
    #    required overlap alpha = ceil(t/(1+t) * (na+nb)); valid for
    #    the pair's FIRST shared token, so keeping a pair when ANY
    #    occurrence passes is a superset of the true pair set
    alpha = F.expr(
        f"({_T_NUM} * (na + nb) + {_T_NUM + _T_DEN} - 1)"
        f" DIV {_T_NUM + _T_DEN}"
    )
    cand = (
        pa.join(pb, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.lit(_T_DEN) * F.least("na", "nb")
            >= F.lit(_T_NUM) * F.greatest("na", "nb")
        )
        .filter(
            F.lit(1)
            + F.least(F.col("na") - F.col("i"), F.col("nb") - F.col("j"))
            >= alpha
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrs = dtok.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("token")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    ab = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    verified = (
        cand.join(aa, "doc_a")
        .join(ab, "doc_b")
        .transform(with_n_common)
        .filter(
            F.lit(_T_DEN) * F.col("n_common")
            >= F.lit(_T_NUM) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "n_common",
        F.expr(
            "CAST((1000000 * n_common) DIV (n_a + n_b - n_common) AS BIGINT)"
        ).alias("jaccard_ppm"),
    )


_SNM_WINDOW = 8


@query(
    "q_sorted_neighborhood",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, substr(text, 1, 4) AS blk,
               ROW_NUMBER() OVER (
                   PARTITION BY substr(text, 1, 4)
                   ORDER BY substr(text, 1, 24), doc_id
               ) AS rk
        FROM documents
    ), cand AS (
        SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
               GREATEST(a.doc_id, b.doc_id) AS doc_b
        FROM r a JOIN r b
          ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {_SNM_WINDOW}
    ), dtok AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) WHERE length(token) > 0
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM dtok GROUP BY doc_id
    ), ov AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cand c
        JOIN dtok a ON a.doc_id = c.doc_a
        JOIN dtok b ON b.doc_id = c.doc_b AND b.token = a.token
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT ov.doc_a, ov.doc_b, sa.n AS n_a, sb.n AS n_b,
           ov.cnt AS n_common,
           CAST((1000000 * ov.cnt) // (sa.n + sb.n - ov.cnt) AS BIGINT)
               AS jaccard_ppm
    FROM ov
    JOIN sz sa ON ov.doc_a = sa.doc_id
    JOIN sz sb ON ov.doc_b = sb.doc_id
    WHERE {_T_DEN} * ov.cnt >= {_T_NUM} * (sa.n + sb.n - ov.cnt)
    """,
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernandez-Stolfo merge/
    purge): sort records by a domain key (first 24 chars of text),
    compare each record only against its next 8 neighbors in the
    sorted order, verify candidates with the exact token-set Jaccard
    filter. Unlike ``q_jaccard_prefix_join`` this is RECALL-BOUNDED
    by construction (a near-dup pair whose sort keys diverge in the
    first characters is never compared) — the trade the scheme makes
    for a candidate count that is strictly linear in corpus size
    (n * w pairs, no quadratic corner at all), which is why
    merge/purge pipelines run it in multiple passes with different
    keys. The sort is PARTITIONED by a 4-char block prefix, so at
    100 TB it is a hash-partitioned local sort (no global
    single-partition window); both engines compute the identical
    partitioned ranking, making the candidate set — and therefore
    the result — exactly checkable. Output matches the prefix-join
    schema for side-by-side comparison."""
    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        "doc_id",
        F.substring("text", 1, 4).alias("blk"),
        F.substring("text", 1, 24).alias("k24"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("blk").orderBy("k24", "doc_id")
        ),
    )
    a = r.select("blk", F.col("doc_id").alias("da"), F.col("rk").alias("ra"))
    b = r.select("blk", F.col("doc_id").alias("db"), F.col("rk").alias("rb"))
    cand = (
        a.join(b, "blk")
        .filter(
            (F.col("rb") > F.col("ra"))
            & (F.col("rb") <= F.col("ra") + _SNM_WINDOW)
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    )
    dtok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    arrs = dtok.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("token")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    ab = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    return (
        cand.join(aa, "doc_a")
        .join(ab, "doc_b")
        .transform(with_n_common)
        .filter(
            F.lit(_T_DEN) * F.col("n_common")
            >= F.lit(_T_NUM)
            * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) DIV (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


@query(
    "q_snm_multipass",
    oracle=f"""
    WITH r1 AS (
        SELECT doc_id, substr(text, 1, 4) AS blk,
               ROW_NUMBER() OVER (
                   PARTITION BY substr(text, 1, 4)
                   ORDER BY substr(text, 1, 24), doc_id
               ) AS rk
        FROM documents
    ), r2 AS (
        SELECT doc_id, substr(reverse(text), 1, 4) AS blk,
               ROW_NUMBER() OVER (
                   PARTITION BY substr(reverse(text), 1, 4)
                   ORDER BY substr(reverse(text), 1, 24), doc_id
               ) AS rk
        FROM documents
    ), r3 AS (
        SELECT doc_id,
               lang || '|' || CAST(n_chars // 64 AS VARCHAR) AS blk,
               ROW_NUMBER() OVER (
                   PARTITION BY lang || '|' || CAST(n_chars // 64 AS VARCHAR)
                   ORDER BY n_chars, doc_id
               ) AS rk
        FROM documents
    ), cand AS (
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
               GREATEST(a.doc_id, b.doc_id) AS doc_b
        FROM r1 a JOIN r1 b
          ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {_SNM_WINDOW}
        UNION
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id),
               GREATEST(a.doc_id, b.doc_id)
        FROM r2 a JOIN r2 b
          ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {_SNM_WINDOW}
        UNION
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id),
               GREATEST(a.doc_id, b.doc_id)
        FROM r3 a JOIN r3 b
          ON a.blk = b.blk AND b.rk > a.rk AND b.rk <= a.rk + {_SNM_WINDOW}
    ), dtok AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) WHERE length(token) > 0
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM dtok GROUP BY doc_id
    ), ov AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cand c
        JOIN dtok a ON a.doc_id = c.doc_a
        JOIN dtok b ON b.doc_id = c.doc_b AND b.token = a.token
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT ov.doc_a, ov.doc_b, sa.n AS n_a, sb.n AS n_b,
           ov.cnt AS n_common,
           CAST((1000000 * ov.cnt) // (sa.n + sb.n - ov.cnt) AS BIGINT)
               AS jaccard_ppm
    FROM ov
    JOIN sz sa ON ov.doc_a = sa.doc_id
    JOIN sz sb ON ov.doc_b = sb.doc_id
    WHERE {_T_DEN} * ov.cnt >= {_T_NUM} * (sa.n + sb.n - ov.cnt)
    """,
)
def q_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood (the form Hernandez-Stolfo
    actually recommend): a single sort key misses near-dups whose
    difference lands in the key, so run THREE independent passes — one
    keyed on the text's head, one on its reversed tail, and one on
    document metadata (lang, n_chars DIV 64) ordered by length, which
    catches prefix-divergent pairs whose edit lands at both ends of the
    text — and union the candidate pairs before the exact verify. Each
    pass stays linear (n * w candidates) and block-partitioned, so k
    passes cost k linear scans, the standard recall/cost dial; recall
    is strictly >= any single pass by construction (pinned in tests).
    Verify and output are identical to ``q_sorted_neighborhood``."""
    docs = load_table(spark, sf_dir, "documents")

    def pass_cands(key_col):
        r = docs.select(
            "doc_id",
            F.substring(key_col, 1, 4).alias("blk"),
            F.substring(key_col, 1, 24).alias("k24"),
        ).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("blk").orderBy("k24", "doc_id")
            ),
        )
        a = r.select(
            "blk", F.col("doc_id").alias("da"), F.col("rk").alias("ra")
        )
        b = r.select(
            "blk", F.col("doc_id").alias("db"), F.col("rk").alias("rb")
        )
        return (
            a.join(b, "blk")
            .filter(
                (F.col("rb") > F.col("ra"))
                & (F.col("rb") <= F.col("ra") + _SNM_WINDOW)
            )
            .select(
                F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
            )
        )

    meta = docs.select(
        "doc_id",
        "n_chars",
        # F.concat null-propagates like DuckDB's || (concat_ws would
        # silently skip a NULL lang and diverge from the oracle)
        F.concat(
            F.col("lang"),
            F.lit("|"),
            F.expr("n_chars DIV 64").cast("string"),
        ).alias("blk"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("blk").orderBy("n_chars", "doc_id")
        ),
    )
    ma = meta.select("blk", F.col("doc_id").alias("da"), F.col("rk").alias("ra"))
    mb = meta.select("blk", F.col("doc_id").alias("db"), F.col("rk").alias("rb"))
    meta_cands = (
        ma.join(mb, "blk")
        .filter(
            (F.col("rb") > F.col("ra"))
            & (F.col("rb") <= F.col("ra") + _SNM_WINDOW)
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    )
    cand = (
        pass_cands(F.col("text"))
        .unionAll(pass_cands(F.reverse(F.col("text"))))
        .unionAll(meta_cands)
        .distinct()
    )
    dtok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    arrs = dtok.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("token")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    )
    aa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    ab = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    return (
        cand.join(aa, "doc_a")
        .join(ab, "doc_b")
        .transform(with_n_common)
        .filter(
            F.lit(_T_DEN) * F.col("n_common")
            >= F.lit(_T_NUM)
            * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) DIV (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )

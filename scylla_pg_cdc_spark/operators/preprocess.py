"""Training-data preprocessing: chunking, PII scrubbing, stratified
sampling.

The steps between raw corpus and tokenizer input that a 100 TB
pipeline runs per document: split long docs into overlapping
token-window chunks (context-length packing), mask PII-shaped spans,
and rebalance the language/source mix by deterministic downsampling.
All are NARROW per-row projections (explode included) — zero shuffles,
full codegen, trivially linear at any scale — which is exactly why
they must never be written as Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.sampling import portable_bucket

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

CHUNK_W = 16  # tokens per chunk (window)
CHUNK_S = 12  # stride; W - S = 4 tokens of overlap between chunks


def chunk_documents(
    docs: DataFrame, window: int = CHUNK_W, stride: int = CHUNK_S
) -> DataFrame:
    """Overlapping token-window chunks per document. Chunk i covers
    tokens [i*stride, i*stride + window); the final chunk may be short
    (every token appears in >=1 chunk; none is silently dropped).
    One explode over ceil(n/stride) starts per doc — row count grows
    ~n/stride, bytes ~n*W/S; still a narrow map-side op."""
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") > 0)
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {stride}), "
                f"s -> concat_ws(' ', slice(toks, s + 1, {window})))"
            )
        ).alias("chunk_idx", "chunk_text"),
        F.size("toks").alias("n_doc_tokens"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("long").alias("chunk_start"),
        F.least(
            F.lit(window),
            F.col("n_doc_tokens") - F.col("chunk_idx") * stride,
        ).cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


@query(
    "q_doc_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE len(string_split(text, ' ')) > 0),
         st AS (SELECT doc_id, toks,
                       unnest(generate_series(0, len(toks) - 1, {CHUNK_S}))
                           AS s
                FROM t)
    SELECT doc_id,
           CAST(s / {CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(LEAST({CHUNK_W}, len(toks) - s) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[s + 1 : s + {CHUNK_W}], ' ') AS chunk_text
    FROM st
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking of the corpus: 16-token windows, stride
    12 (4-token overlap) — the packing step before tokenization."""
    return chunk_documents(load_table(spark, sf_dir, "documents"))


@query(
    "q_pii_scrub",
    oracle=r"""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_masked,
           CAST(length(props)
                - length(regexp_replace(props, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits_masked
    FROM events
    WHERE props IS NOT NULL
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped span masking: replace every digit run with a <NUM>
    sentinel and count masked characters (the audit metric). The
    character-class regex behaves identically in Java regex (Spark)
    and RE2 (DuckDB), so the masked text is engine-exact. At 100 TB:
    narrow projection, no shuffle; real deployments swap in the full
    pattern battery (emails, phones, SSNs) — same plan shape."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    return events.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_masked"),
        (
            F.length("props")
            - F.length(F.regexp_replace("props", "[0-9]", ""))
        ).cast("long").alias("n_digits_masked"),
    )


# per-language keep-rate (percent): downsample the dominant language,
# keep the long tail — the mix-rebalancing step of corpus curation
_LANG_RATES = {"en": 10, "de": 40, "es": 40, "fr": 40, "zh": 40}
_RATE_SQL = (
    "CASE lang " +
    " ".join(f"WHEN '{k}' THEN {v}" for k, v in _LANG_RATES.items()) +
    " ELSE 20 END"
)


@query(
    "q_stratified_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substring(md5('strata:' || CAST(doc_id AS VARCHAR)),
                                       1, 6)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, source, CAST(bucket AS BIGINT) AS bucket
    FROM b WHERE bucket < {_RATE_SQL}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates via
    the portable hash bucket (en keeps 10%, minority languages 40%).
    Membership is a pure function of (doc_id, lang) — reproducible
    across runs, engines, and shard orders; narrow, shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.expr(_RATE_SQL)
    return docs.select(
        "doc_id", "lang", "source", portable_bucket("doc_id", "strata")
    ).filter(F.col("bucket") < rate)


PACK_BUDGET = 64  # tokens per packed training sequence


@query(
    "q_doc_pack",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS cum_before
        FROM d
    )
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id
    order, per source shard) to fixed-budget training sequences by
    token-offset arithmetic — pack_id = floor(cumulative-tokens-before
    / budget). This is the streaming-concat packing used to build
    training batches: one window per shard, no shuffle beyond the
    source partition, and the assignment is a pure function of the
    ordered token counts (rerun-stable). Documents spanning a boundary
    start in pack_id at pack_offset and continue into the next — the
    consumer splits at read time, exactly like a tokenized-dataset
    loader."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        (cum_before / PACK_BUDGET).cast("long").alias("pack_id"),
        (cum_before % PACK_BUDGET).cast("long").alias("pack_offset"),
    )


@query(
    "q_curriculum_bins",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               NTILE(4) OVER (ORDER BY n_chars, doc_id) AS bin
        FROM documents
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_score,
           CAST(MAX(n_chars) AS BIGINT) AS max_score
    FROM scored GROUP BY bin
    """,
)
def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: rank documents easy-to-hard by a difficulty
    proxy (length) and split into 4 equal-population stages with
    NTILE — the stage boundaries and populations a curriculum-learning
    schedule consumes. The (score, doc_id) ordering is total, so bin
    assignment is deterministic and identical cross-engine (both
    implement standard NTILE: earlier buckets absorb the remainder).
    Scale: documents GROW with the corpus, so the NTILE runs as the
    two-phase banded rank decomposition
    (functions/sweep.py:two_phase_ntile — bit-identical to engine
    NTILE, no single-partition window over the document frame; wired
    round 9, an EXACT replacement for the approx-quantile swap this
    docstring used to promise)."""
    from scylla_pg_cdc_spark.functions.sweep import two_phase_ntile

    docs = load_table(spark, sf_dir, "documents")
    binned = two_phase_ntile(
        docs.select("doc_id", "n_chars"), "n_chars", "doc_id", 4, None,
        "bin",
    )
    return (
        binned.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_score"),
            F.max("n_chars").alias("max_score"),
        )
    )


@query(
    "q_impute_mean",
    oracle="""
    WITH m AS (
        SELECT event_type,
               SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                   // COUNT(value) AS mean_cents
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(COALESCE(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT),
                         m.mean_cents) AS BIGINT) AS value_cents,
           e.value IS NULL AS was_imputed
    FROM events e JOIN m ON e.event_type = m.event_type
    """,
)
def q_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null imputation with the per-group mean — the ML feature-prep
    step that precedes training on tabular event data. The imputed
    value is the exact truncated integer of the group's cent mean
    (plain DIV over non-null cents: DuckDB's integer // truncates
    toward zero exactly like Spark DIV — see floordiv_sql's CAUTION —
    so the engines match even if values go negative),
    which makes the fill value a pure function of the data rather
    than a float whose last ulp depends on aggregation order. An
    audit flag marks filled rows so downstream samplers can weight or
    exclude them. Plan: one group-mean aggregation broadcast back
    onto the scan — a narrow map over the fact table at any scale."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    m = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.expr(
            "CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))"
            " DIV COUNT(value) AS BIGINT)"
        ).alias("mean_cents"))
    )
    return ev.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        F.coalesce(vc, F.col("mean_cents")).cast("long").alias("value_cents"),
        F.col("value").isNull().alias("was_imputed"),
    )


@query(
    "q_length_band_filter",
    oracle="""
    WITH r AS (
        SELECT lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars
               ) AS rk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ), cuts AS (
        SELECT lang, MAX(n) AS n,
               MAX(CASE WHEN rk = (5 * n + 99) // 100
                   THEN n_chars END) AS lo_cut,
               MAX(CASE WHEN rk = (95 * n + 99) // 100
                   THEN n_chars END) AS hi_cut
        FROM r GROUP BY lang
    )
    SELECT c.lang,
           CAST(c.n AS BIGINT) AS n_docs,
           CAST(c.lo_cut AS BIGINT) AS lo_cut,
           CAST(c.hi_cut AS BIGINT) AS hi_cut,
           CAST(SUM(CASE WHEN d.n_chars >= c.lo_cut
                          AND d.n_chars <= c.hi_cut
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM cuts c JOIN documents d ON d.lang = c.lang
    GROUP BY c.lang, c.n, c.lo_cut, c.hi_cut
    """,
)
def q_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-band outlier filter: keep documents whose
    char length lies inside the language's exact [p5, p95] band — the
    truncation-and-boilerplate cut a corpus pipeline applies BEFORE
    quality scoring (extremely short docs are fragments, extremely
    long ones are concatenation accidents; a global cut is wrong
    because languages have different length distributions). The cuts
    are exact lower order statistics at ceil-form ranks
    (5n+99) DIV 100 / (95n+99) DIV 100, computed with the TWO-PHASE
    rank-select decomposition (`functions/percentiles.py`) — never a
    corpus-wide per-key sort window — then broadcast back onto the
    scan for the band count. Output: per lang, total docs, both cuts,
    and how many docs survive. The oracle recomputes the same ranks
    with a naive per-lang ROW_NUMBER (tie-order independent: the
    value at a global rank is a property of the sorted multiset)."""
    from scylla_pg_cdc_spark.functions.percentiles import (
        rank_select_percentiles,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    cuts = rank_select_percentiles(
        docs,
        "lang",
        "n_chars",
        [
            ("lo_cut", "(5 * n + 99) DIV 100"),
            ("hi_cut", "(95 * n + 99) DIV 100"),
        ],
        bucket_width=64,
        checkpoint=False,
    )
    return (
        docs.join(F.broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.max("lo_cut").cast("long").alias("lo_cut"),
            F.max("hi_cut").cast("long").alias("hi_cut"),
            F.sum(
                F.when(
                    (F.col("n_chars") >= F.col("lo_cut"))
                    & (F.col("n_chars") <= F.col("hi_cut")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


@query(
    "q_pack_efficiency",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS cum_before
        FROM d
    ), a AS (
        SELECT source, n_tokens,
               cum_before // {PACK_BUDGET} AS pack_id,
               cum_before % {PACK_BUDGET} AS pack_offset
        FROM c
    )
    SELECT source,
           CAST(MAX(pack_id) + 1 AS BIGINT) AS n_packs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST((MAX(pack_id) + 1) * {PACK_BUDGET} AS BIGINT)
               AS capacity_tokens,
           CAST((1000000 * SUM(n_tokens))
                // ((MAX(pack_id) + 1) * {PACK_BUDGET}) AS BIGINT)
               AS fill_ppm,
           CAST(SUM(CASE WHEN pack_offset + n_tokens > {PACK_BUDGET}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
    FROM a GROUP BY source
    """,
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency rollup per source shard: sequences used,
    token fill ratio against the fixed budget, and how many documents
    straddle a pack boundary — the batch-construction efficiency
    numbers a training-infra owner watches (fill below ~95% wastes
    accelerator steps; a high boundary-crossing share means the
    consumer splits documents constantly and attention masks
    fragment). Pure integer arithmetic over the same deterministic
    assignment as ``q_doc_pack``; one window + a 20-row rollup."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    a = d.select(
        "source",
        "n_tokens",
        (cum_before / PACK_BUDGET).cast("long").alias("pack_id"),
        (cum_before % PACK_BUDGET).cast("long").alias("pack_offset"),
    )
    return a.groupBy("source").agg(
        (F.max("pack_id") + 1).cast("long").alias("n_packs"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        ((F.max("pack_id") + 1) * PACK_BUDGET)
        .cast("long")
        .alias("capacity_tokens"),
        F.expr(
            f"CAST((1000000 * SUM(n_tokens))"
            f" DIV ((MAX(pack_id) + 1) * {PACK_BUDGET}) AS BIGINT)"
        ).alias("fill_ppm"),
        F.sum(
            F.when(
                F.col("pack_offset") + F.col("n_tokens") > PACK_BUDGET, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_boundary_docs"),
    )

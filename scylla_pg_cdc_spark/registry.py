"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its checkable queries here with the
``@query`` decorator; ``__spark_entry__.py`` is then a thin re-export.
Each entry pairs a DataFrame builder ``fn(spark, sf_dir)`` with the
equivalent DuckDB oracle SQL (or ``None`` for non-SQL-expressible ops,
which the driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the builder for query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


# The driver records CORRECTNESS rows for roughly the first 50 registered
# queries, in registration order (see VERDICT.md round 1, "What's wrong"
# #1).  To guarantee every query accumulates a driver-verified row across
# rounds, ``load_all`` re-orders the registry: queries with NO green row in
# CORRECTNESS_r01.json or CORRECTNESS_r02.json come first (after round 2
# that is the int8/PQ/feature family plus the TPC-H suite), then queries
# newly registered this round (so new work is always driver-checked in its
# first round), then the already-verified remainder.
_DRIVER_PRIORITY: list[str] = [
    # --- no CORRECTNESS_r01/r02 row: record these first in round 3 ----
    "q_embed_quantize",
    "q_vector_int8_knn",
    "q_event_ewma",
    "q_token_rarity",
    "q_group_sample",
    "q_window_range_interval",
    "q_embed_pq_codes",
    "q_vector_pq_knn",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration).

    Returns the registry re-ordered so driver-unverified queries are
    recorded first (see ``_DRIVER_PRIORITY``).
    """
    import scylla_pg_cdc_spark.operators.relational  # noqa: F401
    import scylla_pg_cdc_spark.operators.subqueries  # noqa: F401
    import scylla_pg_cdc_spark.operators.aggregates  # noqa: F401
    import scylla_pg_cdc_spark.operators.windows  # noqa: F401
    import scylla_pg_cdc_spark.operators.scalars  # noqa: F401
    import scylla_pg_cdc_spark.operators.reconcile  # noqa: F401
    import scylla_pg_cdc_spark.operators.cdc  # noqa: F401
    import scylla_pg_cdc_spark.operators.text  # noqa: F401
    import scylla_pg_cdc_spark.operators.vector  # noqa: F401
    import scylla_pg_cdc_spark.operators.multimodal  # noqa: F401
    import scylla_pg_cdc_spark.operators.tpch  # noqa: F401
    import scylla_pg_cdc_spark.operators.sampling  # noqa: F401
    import scylla_pg_cdc_spark.operators.preprocess  # noqa: F401
    import scylla_pg_cdc_spark.operators.features  # noqa: F401
    import scylla_pg_cdc_spark.operators.temporal  # noqa: F401
    import scylla_pg_cdc_spark.operators.analytics  # noqa: F401

    priority = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    listed = set(_DRIVER_PRIORITY)
    new = [n for n in REGISTRY if n not in listed and n not in _DRIVER_VERIFIED]
    tail = [n for n in REGISTRY if n in _DRIVER_VERIFIED and n not in listed]
    ordered = priority + new + tail
    return {n: REGISTRY[n] for n in ordered}


# Queries with a green rows/schema/hash row in CORRECTNESS_r01.json or
# CORRECTNESS_r02.json — already driver-verified, so they yield their slot
# to unverified work.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "q_agg_accuracy", "q_agg_approx_distinct", "q_agg_conditional",
        "q_agg_cube", "q_agg_daily_orders", "q_agg_distinct",
        "q_agg_dupes", "q_agg_grouping_sets", "q_agg_histogram",
        "q_agg_minmax_by", "q_agg_percentile", "q_agg_pivot",
        "q_agg_pricing_summary", "q_agg_rollup", "q_agg_stringagg",
        "q_array_ops", "q_asof_join", "q_audio_window_peaks",
        "q_cdc_delete_rewrite", "q_cdc_partial_update",
        "q_cdc_upsert_compact", "q_correlated_min", "q_decontaminate",
        "q_doc_chunk", "q_doc_pack", "q_embed_neardup", "q_except",
        "q_exists_subquery", "q_filter_like_in", "q_filter_pred",
        "q_funnel_conversion", "q_having_groups", "q_image_tile_sums",
        "q_in_subquery", "q_intersect", "q_join_anti", "q_join_broadcast",
        "q_join_composite", "q_join_inner", "q_join_left_agg",
        "q_join_multiway", "q_join_semi", "q_join_theta",
        "q_json_extract", "q_limit_offset_topk", "q_multimodal_stats",
        "q_pii_scrub", "q_range_join", "q_reconcile_composite",
        "q_reconcile_diff", "q_reconcile_fielddiff", "q_repair_actions",
        "q_retention_cohort", "q_sample_deterministic",
        "q_scalar_bitwise", "q_scalar_case_null", "q_scalar_date",
        "q_scalar_hash", "q_scalar_interval", "q_scalar_math",
        "q_scalar_string", "q_scalar_subquery", "q_scan_project",
        "q_schema_diff", "q_stratified_sample", "q_stream_dedup",
        "q_stream_dlq_split", "q_stream_session",
        "q_stream_session_native", "q_stream_sliding",
        "q_stream_tumbling", "q_supplier_balance", "q_text_exact_dedup",
        "q_text_fingerprint", "q_text_langid", "q_text_minhash_dedup",
        "q_text_neardup_dedup", "q_text_ngram_jaccard", "q_text_quality",
        "q_text_simhash", "q_text_stats", "q_text_tfidf",
        "q_text_token_count", "q_text_tokens", "q_train_test_split",
        "q_union_all", "q_validation_summary", "q_vector_ivf_search",
        "q_vector_knn", "q_vector_label_centroid", "q_vector_lsh_buckets",
        "q_vector_normalize", "q_window_first_last", "q_window_lag_gap",
        "q_window_latest_per_key", "q_window_moving_avg",
        "q_window_percentile_rank", "q_window_rank",
        "q_window_running_sum",
    }
)

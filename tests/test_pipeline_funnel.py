"""Invariant tests for the LLM curation funnel composer: populations
must be monotone non-increasing stage over stage, every stage row
must exist even when empty, and the funnel's per-stage numbers must
agree with the standalone stage queries it composes (langid count at
stage 1, quality-keep count at stage 2 computed on langid survivors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import load_all

SF_SMALL = "/root/testdata/sf0.001"


def _funnel_rows(spark):
    spec = load_all()["q_llm_pipeline_funnel"]
    rows = spec.fn(spark, SF_SMALL).collect()
    return sorted(rows, key=lambda r: r["stage_idx"])


def test_funnel_monotone_and_complete(spark):
    rows = _funnel_rows(spark)
    assert [r["stage_idx"] for r in rows] == list(range(6))
    assert rows[0]["stage"] == "ingest"
    assert rows[5]["stage"] == "decontaminated"
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_tokens"] <= prev["n_tokens"]
    # ppm retention is vs the immediately preceding stage
    for prev, cur in zip(rows, rows[1:]):
        if prev["n_docs"]:
            assert (
                cur["docs_kept_ppm"]
                == 1_000_000 * cur["n_docs"] // prev["n_docs"]
            )


def test_funnel_agrees_with_stage_queries(spark):
    rows = _funnel_rows(spark)
    specs = load_all()
    langid = specs["q_text_langid"].fn(spark, SF_SMALL)
    n_lang_ok = langid.filter(
        F.col("predicted_lang") == F.col("actual_lang")
    ).count()
    assert rows[1]["n_docs"] == n_lang_ok
    # stage 2 = quality keepers among langid survivors
    quality = specs["q_quality_filter"].fn(spark, SF_SMALL)
    keep_ids = {
        r["doc_id"]
        for r in quality.filter(F.col("verdict") == "keep").collect()
    }
    lang_ids = {
        r["doc_id"]
        for r in langid.filter(
            F.col("predicted_lang") == F.col("actual_lang")
        ).collect()
    }
    assert rows[2]["n_docs"] == len(keep_ids & lang_ids)

"""Round-5 final-batch operators: independent pure-Python
recomputations of span-level dedup, hybrid RRF retrieval, and the
robust-statistics family (Spearman, MAD, winsorized mean, HHI). The
DuckDB differential runs in tools/check_oracle.py; these prove the
algorithms against an imperative serial simulation, not a mirrored
expression tree."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.corpus import (
    _BM25_TERMS,
    _SPAN_K,
    q_span_dedup,
)
from scylla_pg_cdc_spark.operators.retrieval import (
    _POOL,
    _RRF_K,
    _TOPK,
    q_hybrid_rrf,
)
from scylla_pg_cdc_spark.operators.stats import (
    q_hhi_concentration,
    q_mad_value,
    q_spearman_trend,
    q_winsorized_mean,
)
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _docs(spark):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }


def _event_cents(spark):
    """(event_type, event_id, cents, ts_ms) mirroring stats._VC."""
    out = []
    for r in load_table(spark, SF_SMALL, "events").collect():
        if r["value"] is None:
            continue
        out.append(
            (
                r["event_type"],
                r["event_id"],
                math.floor(r["value"] * 100.0 + 0.5),
                int(r["ts"].timestamp() * 1000),
            )
        )
    return out


def test_span_dedup_matches_serial_recompute(spark):
    """Sliding 8-token span audit must equal a per-document Python
    loop building every span and a global span->distinct-docs map."""
    spans_by_doc: dict[int, list[str]] = {}
    for did, text in _docs(spark).items():
        toks = text.split(" ")  # keeps empties, like F.split
        if len(toks) < _SPAN_K:
            continue
        spans_by_doc[did] = [
            " ".join(toks[p : p + _SPAN_K])
            for p in range(0, len(toks) - _SPAN_K + 1)
        ]
    docs_per_span: dict[str, set] = defaultdict(set)
    for did, spans in spans_by_doc.items():
        for s in spans:
            docs_per_span[s].add(did)
    want = {}
    for did, spans in spans_by_doc.items():
        n_dup = sum(1 for s in spans if len(docs_per_span[s]) > 1)
        want[did] = (
            len(spans),
            n_dup,
            (1_000_000 * n_dup) // len(spans),
        )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ppm"])
        for r in q_span_dedup(spark, SF_SMALL).collect()
    }
    assert got == want


def _bm25_serial(spark):
    """doc_id -> bm25_micro, the round5b serial fold (same
    quantization rule as operators/corpus.bm25_scores)."""
    docs = {
        did: [t for t in text.split(" ") if t]
        for did, text in _docs(spark).items()
    }
    tt = sum(len(toks) for toks in docs.values())
    nd = len(docs)
    tf: dict[tuple, int] = defaultdict(int)
    for did, toks in docs.items():
        for t in toks:
            if t in _BM25_TERMS:
                tf[(did, t)] += 1
    df: dict[str, int] = defaultdict(int)
    for _did, t in tf:
        df[t] += 1
    scores: dict[int, int] = defaultdict(int)
    for (did, t), f in tf.items():
        dl = len(docs[did])
        odds = float(2 * nd - 2 * df[t] + 1) / float(2 * df[t] + 1)
        tfn = float(44 * tt * f) / float(
            20 * tt * f + 6 * tt + 18 * dl * nd
        )
        scores[did] += math.floor(1_000_000.0 * odds * tfn + 0.5)
    return dict(scores)


def _cosine_micro_serial(spark):
    """vec_id -> cos_sim_micro vs the vec_id=0 query, left-to-right
    folds mirroring vector.dot / l2_norm exactly."""
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    q = rows[0]
    out = {}
    for vid, v in rows.items():
        if vid == 0:
            continue
        dp = 0.0
        for x, y in zip(v, q):
            dp += x * y
        na = 0.0
        for x in v:
            na += x * x
        nb = 0.0
        for y in q:
            nb += y * y
        cos = dp / (math.sqrt(na) * math.sqrt(nb))
        out[vid] = math.floor(cos * 1_000_000 + 0.5)
    return out


def test_hybrid_rrf_matches_serial_fusion(spark):
    """RRF fusion must equal a serial recompute of both arms: BM25
    top-50 and cosine top-50, rank-fused with k=60."""
    lex_scores = _bm25_serial(spark)
    lex_sorted = sorted(
        ((d, s) for d, s in lex_scores.items() if d != 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:_POOL]
    lex_rank = {d: i + 1 for i, (d, _s) in enumerate(lex_sorted)}
    cos = _cosine_micro_serial(spark)
    dense_sorted = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_POOL
    ]
    dense_rank = {d: i + 1 for i, (d, _s) in enumerate(dense_sorted)}
    fused = []
    for d in set(lex_rank) | set(dense_rank):
        lr = lex_rank.get(d, 0)
        dr = dense_rank.get(d, 0)
        rrf = (1_000_000 // (_RRF_K + lr) if lr else 0) + (
            1_000_000 // (_RRF_K + dr) if dr else 0
        )
        fused.append((d, lr, dr, rrf))
    want = sorted(fused, key=lambda t: (-t[3], t[0]))[:_TOPK]
    got = [
        (r["doc_id"], r["lex_rank"], r["dense_rank"], r["rrf_micro"])
        for r in q_hybrid_rrf(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_spearman_matches_serial_ranks(spark):
    """Tie-broken Spearman must equal serially assigned ranks, and
    rho_ppm must stay within [-1e6, 1e6]."""
    by_type: dict[str, list] = defaultdict(list)
    for et, eid, vc, ts_ms in _event_cents(spark):
        by_type[et].append((eid, vc, ts_ms))
    want = {}
    for et, rows in by_type.items():
        rv = {
            eid: i + 1
            for i, (eid, _v, _t) in enumerate(
                sorted(rows, key=lambda r: (r[1], r[0]))
            )
        }
        rt = {
            eid: i + 1
            for i, (eid, _v, _t) in enumerate(
                sorted(rows, key=lambda r: (r[2], r[0]))
            )
        }
        n = len(rows)
        sum_d2 = sum((rv[e] - rt[e]) ** 2 for e, _v, _t in rows)
        rho_ppm = math.floor(
            (1.0 - 6.0 * sum_d2 / float(n**3 - n)) * 1_000_000 + 0.5
        )
        assert -1_000_000 <= rho_ppm <= 1_000_000
        want[et] = (n, sum_d2, rho_ppm)
    got = {
        r["event_type"]: (r["n"], r["sum_d2"], r["rho_ppm"])
        for r in q_spearman_trend(spark, SF_SMALL).collect()
    }
    assert got == want


def test_mad_matches_serial_sort(spark):
    """Two-phase rank-select MAD must equal a full serial sort: lower
    median of cents, then lower median of absolute deviations."""
    by_type: dict[str, list] = defaultdict(list)
    for et, _eid, vc, _ts in _event_cents(spark):
        by_type[et].append(vc)
    want = {}
    for et, vs in by_type.items():
        vs.sort()
        n = len(vs)
        med = vs[(n + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        want[et] = (n, med, devs[(n + 1) // 2 - 1])
    got = {
        r["event_type"]: (r["n"], r["median_cents"], r["mad_cents"])
        for r in q_mad_value(spark, SF_SMALL).collect()
    }
    assert got == want


def test_winsorized_mean_matches_serial_clamp(spark):
    """5/95 winsorized mean must equal serial percentile-rank lookup
    plus clamp-and-floor-divide, and must sit between the bounds."""
    by_prio: dict[str, list] = defaultdict(list)
    for r in load_table(spark, SF_SMALL, "orders").collect():
        by_prio[r["o_orderpriority"]].append(
            math.floor(r["o_totalprice"] * 100.0 + 0.5)
        )
    want = {}
    for prio, vs in by_prio.items():
        vs.sort()
        n = len(vs)
        p05 = vs[(5 * n + 99) // 100 - 1]
        p95 = vs[(95 * n + 99) // 100 - 1]
        wmean = sum(min(max(v, p05), p95) for v in vs) // n
        assert p05 <= wmean <= p95
        want[prio] = (n, p05, p95, wmean)
    got = {
        r["priority"]: (
            r["n"],
            r["p05_cents"],
            r["p95_cents"],
            r["wmean_cents"],
        )
        for r in q_winsorized_mean(spark, SF_SMALL).collect()
    }
    assert got == want


def test_hhi_matches_serial_and_bounds(spark):
    """HHI ppm must equal the serial share-of-squares recompute and
    sit in [1e6 / n_sources, 1e6]."""
    cells: dict[tuple, int] = defaultdict(int)
    for r in load_table(spark, SF_SMALL, "documents").collect():
        cells[(r["lang"], r["source"])] += 1
    per_lang: dict[str, list] = defaultdict(list)
    for (lang, _src), c in cells.items():
        per_lang[lang].append(c)
    want = {}
    for lang, cs in per_lang.items():
        n_docs = sum(cs)
        hhi = (1_000_000 * sum(c * c for c in cs)) // (n_docs * n_docs)
        assert 1_000_000 // len(cs) <= hhi <= 1_000_000
        want[lang] = (n_docs, len(cs), hhi)
    got = {
        r["lang"]: (r["n_docs"], r["n_sources"], r["hhi_ppm"])
        for r in q_hhi_concentration(spark, SF_SMALL).collect()
    }
    assert got == want


def test_heavy_hitters_matches_counter_replay(spark):
    from collections import Counter

    from scylla_pg_cdc_spark.operators.corpus import q_heavy_hitters

    rows = load_table(spark, SF_SMALL, "documents").select(
        "lang", "text"
    ).collect()
    counts: dict[str, Counter] = defaultdict(Counter)
    for r in rows:
        for t in r["text"].split(" "):
            if t:
                counts[r["lang"]][t] += 1
    want = set()
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for i, (tok, cnt) in enumerate(top, start=1):
            want.add((lang, i, tok, cnt))
    got = {
        (r["lang"], r["rnk"], r["token"], r["cnt"])
        for r in q_heavy_hitters(spark, SF_SMALL).collect()
    }
    assert got == want


def test_robust_outliers_matches_serial_replay(spark):
    from scylla_pg_cdc_spark.operators.stats import q_robust_outliers

    rows = (
        load_table(spark, SF_SMALL, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(
            math.floor(r["value"] * 100.0 + 0.5)
        )
    want = {}
    for et, vals in by_type.items():
        n = len(vals)
        med = sorted(vals)[(n + 1) // 2 - 1]  # lower median
        devs = [abs(v - med) for v in vals]
        mad = sorted(devs)[(n + 1) // 2 - 1]
        n_out = sum(1 for d in devs if 6745 * d > 35000 * mad)
        want[et] = (n, med, mad, n_out, max(devs))
    got = {
        r["event_type"]: (
            r["n"],
            r["median_cents"],
            r["mad_cents"],
            r["n_outliers"],
            r["max_dev_cents"],
        )
        for r in q_robust_outliers(spark, SF_SMALL).collect()
    }
    assert got == want
    assert any(v[3] > 0 for v in want.values()), (
        "no outliers anywhere - threshold path never exercised"
    )


def test_shingle_containment_matches_set_replay(spark):
    from scylla_pg_cdc_spark.operators.text import q_shingle_containment

    docs = _docs(spark)
    sets = {}
    for d, text in docs.items():
        toks = text.split(" ")
        sh = {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
            if " ".join(toks[i : i + 3])
        }
        if sh:
            sets[d] = sh
    inv = defaultdict(set)
    for d, sh in sets.items():
        for s in sh:
            inv[s].add(d)
    pair_common = defaultdict(int)
    for s, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_common[(ds[i], ds[j])] += 1
    want = {}
    for (a, b), nc in pair_common.items():
        na, nb = len(sets[a]), len(sets[b])
        if 5 * nc >= 4 * min(na, nb):
            want[(a, b)] = (nc, na, nb, 1_000_000 * nc // min(na, nb))
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"],
            r["n_a"],
            r["n_b"],
            r["containment_ppm"],
        )
        for r in q_shingle_containment(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "no containment pairs - replay vacuous"


def test_ivf_recall_curve_matches_bruteforce_replay(spark):
    from scylla_pg_cdc_spark.operators.vector import q_ivf_recall_curve

    rows = load_table(spark, SF_SMALL, "embeddings").collect()
    emb = {
        r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
        for r in rows
    }
    qv = emb[0][0]

    def cos_micro(v):
        dp = sum(a * b for a, b in zip(v, qv))
        na = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in qv))
        return math.floor(dp / (na * nb) * 1_000_000 + 0.5)

    # label centroids and micro-quantized cell ranks
    by_label = defaultdict(list)
    for vid, (v, lbl) in emb.items():
        by_label[lbl].append(v)
    cent = {
        lbl: [sum(col) / len(vs) for col in zip(*vs)]
        for lbl, vs in by_label.items()
    }
    ranked_cells = sorted(
        cent, key=lambda lbl: (-cos_micro(cent[lbl]), lbl)
    )
    cell_rank = {lbl: i + 1 for i, lbl in enumerate(ranked_cells)}

    sims = {
        vid: cos_micro(v) for vid, (v, _l) in emb.items() if vid != 0
    }
    exact10 = set(
        sorted(sims, key=lambda vid: (-sims[vid], vid))[:10]
    )
    want = {}
    for p in range(1, 6):
        cands = [
            vid
            for vid in sims
            if cell_rank[emb[vid][1]] <= p
        ]
        top10 = sorted(cands, key=lambda vid: (-sims[vid], vid))[:10]
        hits = len(set(top10) & exact10)
        want[p] = (len(cands), hits, 100 * hits // 10)
    got = {
        r["n_probes"]: (r["n_candidates"], r["hits"], r["recall_pct"])
        for r in q_ivf_recall_curve(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want[5][1] >= want[1][1], "recall curve not monotone"


def test_cumulative_uniques_matches_serial_replay(spark):
    from scylla_pg_cdc_spark.operators.analytics import (
        q_cumulative_uniques,
    )

    rows = load_table(spark, SF_SMALL, "events").select(
        "user_id", F.unix_millis("ts").alias("ts_ms")
    ).collect()
    per_day_events: dict[int, int] = defaultdict(int)
    first_day: dict[int, int] = {}
    for r in rows:
        day = r["ts_ms"] // 86400000
        per_day_events[day] += 1
        u = r["user_id"]
        if u not in first_day or day < first_day[u]:
            first_day[u] = day
    new_per_day: dict[int, int] = defaultdict(int)
    for d in first_day.values():
        new_per_day[d] += 1
    want = {}
    cum = 0
    for day in sorted(per_day_events):
        cum += new_per_day.get(day, 0)
        want[day] = (per_day_events[day], new_per_day.get(day, 0), cum)
    got = {
        r["day"]: (r["n_events"], r["n_new_users"], r["cum_unique_users"])
        for r in q_cumulative_uniques(spark, SF_SMALL).collect()
    }
    assert got == want
    assert max(v[2] for v in want.values()) == len(first_day)


def test_equidepth_bins_matches_sorted_replay(spark):
    from scylla_pg_cdc_spark.operators.stats import q_equidepth_bins

    rows = (
        load_table(spark, SF_SMALL, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(
            math.floor(r["value"] * 100.0 + 0.5)
        )
    want = {}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        want[et] = (n,) + tuple(
            vals[(k * n + 9) // 10 - 1] for k in range(1, 10)
        )
    got = {
        r["event_type"]: (r["n"],)
        + tuple(r[f"p{k}0_cents"] for k in range(1, 10))
        for r in q_equidepth_bins(spark, SF_SMALL).collect()
    }
    assert got == want
    for v in want.values():
        assert list(v[1:]) == sorted(v[1:]), "deciles not monotone"

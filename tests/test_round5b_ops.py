"""Round-5 continuation operators: independent pure-Python
recomputations of the sweep-line overlap, OHLC bars, KS drift, and
BM25 queries (the DuckDB differential runs in tools/check_oracle.py;
these prove the algorithms against a DIFFERENT formulation — an
imperative simulation — not just a mirrored expression tree)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.analytics import (
    _OVERLAP_TTL_MS,
    q_interval_overlap,
)
from scylla_pg_cdc_spark.operators.corpus import _BM25_TERMS, q_text_bm25
from scylla_pg_cdc_spark.operators.quality import q_drift_ks
from scylla_pg_cdc_spark.operators.temporal import q_ohlc_bars
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _events(spark):
    return [
        (
            r["event_type"],
            int(r["ts"].timestamp() * 1000),
            r["event_id"],
            r["value"],
        )
        for r in load_table(spark, SF_SMALL, "events").collect()
    ]


def test_interval_overlap_matches_serial_sweep(spark):
    """Two-phase distributed prefix sum must equal a serial
    event-by-event sweep over the sorted delta list."""
    deltas: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for et, ms, _eid, _v in _events(spark):
        deltas[et][ms] += 1
        deltas[et][ms + _OVERLAP_TTL_MS] -= 1
    want = {}
    for et, dd in deltas.items():
        conc, peak, first = 0, -(10**18), None
        for t in sorted(dd):
            conc += dd[t]
            if conc > peak:
                peak, first = conc, t
        want[et] = (peak, first, len(dd))
    got = {
        r["event_type"]: (
            r["peak_concurrency"],
            r["peak_first_ms"],
            r["n_timepoints"],
        )
        for r in q_interval_overlap(spark, SF_SMALL).collect()
    }
    assert got == want


def test_ohlc_bars_match_serial_recompute(spark):
    """Window+group OHLC must equal an imperative per-bucket fold."""
    bars: dict[tuple, list] = {}
    for et, ms, eid, v in _events(spark):
        if v is None:
            continue
        vc = math.floor(v * 100.0 + 0.5)
        hour = (ms // 3600000) * 3600000
        k = (et, hour)
        b = bars.get(k)
        if b is None:
            # [open_key, open, high, low, close_key, close, n, vol]
            bars[k] = [(ms, eid), vc, vc, vc, (ms, eid), vc, 1, vc]
        else:
            if (ms, eid) < b[0]:
                b[0], b[1] = (ms, eid), vc
            b[2] = max(b[2], vc)
            b[3] = min(b[3], vc)
            if (ms, eid) > b[4]:
                b[4], b[5] = (ms, eid), vc
            b[6] += 1
            b[7] += vc
    want = {
        k: (b[1], b[2], b[3], b[5], b[6], b[7]) for k, b in bars.items()
    }
    got = {
        (r["event_type"], r["hour_ms"]): (
            r["open_c"],
            r["high_c"],
            r["low_c"],
            r["close_c"],
            r["n_events"],
            r["vol_c"],
        )
        for r in q_ohlc_bars(spark, SF_SMALL).collect()
    }
    assert got == want


def test_drift_ks_matches_serial_ecdf(spark):
    """Distributed cumsum KS must equal the textbook two-sample ECDF
    scan, including the exact-integer argmax."""
    ev = [(et, ms, v) for et, ms, _e, v in _events(spark) if v is not None]
    mid = (min(ms for _, ms, _ in ev) + max(ms for _, ms, _ in ev)) // 2
    samples: dict[str, tuple[list, list]] = defaultdict(lambda: ([], []))
    for et, ms, v in ev:
        samples[et][0 if ms <= mid else 1].append(
            math.floor(v * 100.0 + 0.5)
        )
    want = {}
    for et, (s1, s2) in samples.items():
        s1.sort()
        s2.sort()
        n1, n2 = len(s1), len(s2)
        best = 0
        for x in sorted(set(s1) | set(s2)):
            c1 = sum(1 for v in s1 if v <= x)
            c2 = sum(1 for v in s2 if v <= x)
            best = max(best, abs(c1 * n2 - c2 * n1))
        want[et] = (
            n1,
            n2,
            math.floor(1000000.0 * float(best) / (float(n1) * float(n2)) + 0.5),
        )
    got = {
        r["event_type"]: (r["n_early"], r["n_late"], r["ks_ppm"])
        for r in q_drift_ks(spark, SF_SMALL).collect()
    }
    assert got == want


def test_bm25_matches_serial_recompute(spark):
    """Broadcast-join BM25 must equal a per-document Python fold using
    the same quantization rule (IEEE doubles agree bit-for-bit on the
    mirrored +-*/ expression)."""
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load_table(spark, SF_SMALL, "documents").collect()
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
    scores: dict[int, list] = defaultdict(lambda: [0, 0])
    for (did, t), f in tf.items():
        dl = len(docs[did])
        odds = float(2 * nd - 2 * df[t] + 1) / float(2 * df[t] + 1)
        tfn = float(44 * tt * f) / float(20 * tt * f + 6 * tt + 18 * dl * nd)
        scores[did][0] += 1
        scores[did][1] += math.floor(1000000.0 * odds * tfn + 0.5)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    want = [(did, s[0], s[1]) for did, s in top]
    got = [
        (r["doc_id"], r["n_terms"], r["bm25_micro"])
        for r in q_text_bm25(spark, SF_SMALL).collect()
    ]
    assert got == want


def test_capped_sessions_respect_cap_and_split(spark):
    """Every sub-session must span < cap ms; the cap must actually
    split at least one long session in the testdata; and re-grouping
    the sub-sessions must reproduce the uncapped sessions exactly."""
    from scylla_pg_cdc_spark.operators.cdc import (
        _SESSION_CAP_MS,
        q_stream_session,
        q_stream_session_capped,
    )

    rows = q_stream_session_capped(spark, SF_SMALL).collect()
    assert all(r["duration_ms"] < _SESSION_CAP_MS for r in rows)
    assert any(r["sub_session"] > 0 for r in rows), "cap never exercised"
    regroup = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        n, mn, mx = regroup.get(k, (0, None, None))
        regroup[k] = (
            n + r["n_events"],
            r["start_ms"] if mn is None else min(mn, r["start_ms"]),
            r["end_ms"] if mx is None else max(mx, r["end_ms"]),
        )
    want = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start_ms"],
            r["session_end_ms"],
        )
        for r in q_stream_session(spark, SF_SMALL).collect()
    }
    assert regroup == want


def test_event_lateness_buckets_match_serial_replay(spark):
    """Distributed running-max lateness must equal a per-user serial
    replay of the same injected arrival order, and the injected
    disorder must populate late buckets (non-degenerate)."""
    from scylla_pg_cdc_spark.operators.analytics import q_event_lateness

    per_user: dict[int, list] = defaultdict(list)
    for r in load_table(spark, SF_SMALL, "events").collect():
        eid = r["event_id"]
        pos = eid + (10 if eid % 7 == 0 else 0)
        per_user[r["user_id"]].append(
            (pos, eid, int(r["ts"].timestamp() * 1000), r["event_type"])
        )
    want: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for rows in per_user.values():
        rows.sort()
        seen = -(10**18)
        for _pos, _eid, ms, et in rows:
            seen = max(seen, ms)
            late = max(seen - ms, 0)
            b = (
                "on_time" if late == 0
                else "lt_1m" if late < 60000
                else "lt_5m" if late < 300000
                else "lt_30m" if late < 1800000
                else "ge_30m"
            )
            cell = want[(et, b)]
            cell[0] += 1
            cell[1] = max(cell[1], late)
    got = {
        (r["event_type"], r["bucket"]): [r["n"], r["max_late_ms"]]
        for r in q_event_lateness(spark, SF_SMALL).collect()
    }
    assert got == dict(want)
    assert any(b != "on_time" for _et, b in got), "disorder not injected"


def test_windowed_funnel_tighter_than_unbounded(spark):
    """The 24 h-window funnel can never count MORE conversions than
    the unbounded funnel, stage for stage, and stage counts must be
    monotone down the funnel."""
    from scylla_pg_cdc_spark.operators.analytics import (
        q_funnel_conversion,
        q_funnel_windowed,
    )

    w = q_funnel_windowed(spark, SF_SMALL).head()
    u = q_funnel_conversion(spark, SF_SMALL).head()
    assert w["n_signup"] == u["n_signup"]
    assert w["n_view_24h"] <= u["n_signup_view"]
    assert w["n_purchase_24h"] <= u["n_signup_view_purchase"]
    assert w["n_signup"] >= w["n_view_24h"] >= w["n_purchase_24h"]


def test_golden_record_consistent_with_clusters(spark):
    """One golden record per multi-member entity; canonical key = the
    entity id (cluster min); aggregates recomputable from members."""
    from scylla_pg_cdc_spark.operators.relational import (
        _er_labels,
        q_entity_resolution,
        q_er_golden_record,
    )

    golden = {r["entity_id"]: r for r in q_er_golden_record(spark, SF_SMALL).collect()}
    ents = {r["entity_id"]: r["n_members"] for r in q_entity_resolution(spark, SF_SMALL).collect()}
    assert set(golden) == set(ents)
    cust = {
        r["c_custkey"]: (r["c_name"], r["c_mktsegment"], math.floor(r["c_acctbal"] * 100.0 + 0.5))
        for r in load_table(spark, SF_SMALL, "customer").collect()
    }
    members: dict[int, list] = defaultdict(list)
    for r in _er_labels(spark, SF_SMALL).collect():
        members[r["lbl"]].append(r["n"])
    for eid, g in golden.items():
        ms = members[eid]
        assert g["n_members"] == ents[eid] == len(ms)
        assert g["canonical_key"] == min(ms) == eid
        assert g["canonical_name"] == cust[min(ms)][0]
        bals = sorted(((cust[m][2], m) for m in ms), key=lambda t: (-t[0], t[1]))
        assert g["trusted_segment"] == cust[bals[0][1]][1]
        assert g["max_bal_cents"] == bals[0][0]
        assert g["total_bal_cents"] == sum(b for b, _ in bals)


def test_neardup_incremental_agrees_with_serial_check(spark):
    """Incremental admission must equal a serial recompute over the
    same split: every batch doc's match set against the corpus via
    exact token Jaccard, restricted to LSH-candidate pairs recomputed
    independently in Python (md5 minhash + banding)."""
    import hashlib

    from scylla_pg_cdc_spark.operators.text import q_neardup_incremental

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }

    def sig(text):
        toks = text.split(" ")
        sh = {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
            if " ".join(toks[i : i + 3])
        }
        out = []
        for salt in ("0:", "1:"):
            digs = [
                hashlib.md5((salt + s).encode()).hexdigest() for s in sh
            ]
            for j in range(4):
                out.append(min(d[j * 8 : j * 8 + 8] for d in digs))
        return out

    sigs = {d: sig(t) for d, t in docs.items() if len(t.split(" ")) >= 3}
    buckets: dict[tuple, set] = defaultdict(set)
    for d, s in sigs.items():
        for b in range(4):
            key = hashlib.md5(
                (s[2 * b] + "|" + s[2 * b + 1]).encode()
            ).hexdigest()
            buckets[(b, key)].add(d)
    tok = {d: {t for t in txt.split(" ") if t} for d, txt in docs.items()}
    cands: dict[int, set] = defaultdict(set)
    for mates in buckets.values():
        for a in mates:
            if a % 20 == 0:
                cands[a] |= {b for b in mates if b % 20 != 0}
    want: dict[int, tuple] = {}
    for d in docs:
        if d % 20 == 0:
            want[d] = (0, -1, 0, True)
    for d in list(want):
        best = None
        n_matches = 0
        for c in sorted(cands.get(d, ())):
            ta, tc = tok[d], tok[c]
            inter = len(ta & tc)
            union = len(ta) + len(tc) - inter
            jac = (1000000 * inter) // union
            if 10 * inter >= 9 * union:
                n_matches += 1
            if best is None or (jac, -c) > (best[0], -best[1]):
                best = (jac, c)
        want[d] = (
            n_matches,
            best[1] if best else -1,
            best[0] if best else 0,
            n_matches == 0,
        )
    got = {
        r["doc_id"]: (
            r["n_matches"],
            r["best_match"],
            r["best_jac_ppm"],
            r["is_new"],
        )
        for r in q_neardup_incremental(spark, SF_SMALL).collect()
    }
    assert got == want


def test_dedup_state_greedy_admission_matches_serial(spark, tmp_path):
    """Three epochs through the persisted LSH dedup state must equal
    a serial greedy replay: each epoch checked only against previously
    ADMITTED docs, admitted docs extend the state for the next epoch."""
    import hashlib

    from scylla_pg_cdc_spark.streaming.dedup_state import admit_epoch

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }

    def features(text):
        toks = text.split(" ")
        sh = {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
            if " ".join(toks[i : i + 3])
        }
        tokset = {t for t in toks if t}
        if not sh:
            return set(), tokset
        sig = []
        for salt in ("0:", "1:"):
            digs = [
                hashlib.md5((salt + s).encode()).hexdigest() for s in sh
            ]
            for j in range(4):
                sig.append(min(d[j * 8 : j * 8 + 8] for d in digs))
        bkts = {
            (b, hashlib.md5((sig[2 * b] + "|" + sig[2 * b + 1]).encode()).hexdigest())
            for b in range(4)
        }
        return bkts, tokset

    feat = {d: features(t) for d, t in docs.items()}
    admitted: dict[int, tuple] = {}
    want: dict[int, tuple] = {}
    state_dir = str(tmp_path / "dedup_state")
    full = load_table(spark, SF_SMALL, "documents")
    for epoch in range(3):
        epoch_ids = sorted(d for d in docs if d % 3 == epoch)
        newly = []
        for d in epoch_ids:
            bk, tk = feat[d]
            n_matches = 0
            for c, (cbk, ctk) in admitted.items():
                if bk & cbk:
                    inter = len(tk & ctk)
                    union = len(tk) + len(ctk) - inter
                    if 10 * inter >= 9 * union:
                        n_matches += 1
            want[d] = (n_matches == 0, n_matches)
            if n_matches == 0:
                newly.append(d)
        batch = full.filter(F.col("doc_id") % 3 == epoch).select(
            "doc_id", "text"
        )
        got = {
            r["doc_id"]: (r["is_new"], r["n_matches"])
            for r in admit_epoch(spark, state_dir, batch).collect()
        }
        assert got == {d: want[d] for d in epoch_ids}, f"epoch {epoch}"
        for d in newly:
            admitted[d] = feat[d]
    assert any(not v[0] for v in want.values()), (
        "no rejections across epochs - greedy path never exercised"
    )


def test_mmr_matches_greedy_python_replay(spark):
    """The unrolled 3-step MMR plan must equal a serial greedy replay
    over the same integer-quantized pool."""
    import math

    from scylla_pg_cdc_spark.operators.vector import MMR_POOL, q_vector_mmr

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }

    def quant(v):
        m = max(max(abs(x) for x in v), 1e-12)
        return [int(math.floor(x * 127.0 / m)) for x in v]

    codes = {i: quant(v) for i, v in emb.items()}
    qq = codes[0]
    rel = {
        i: sum(a * b for a, b in zip(c, qq))
        for i, c in codes.items()
        if i != 0
    }
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_POOL]
    selected = []
    want = []
    for rank in range(1, 4):
        best = None
        for d in pool:
            if d in selected:
                continue
            max_sim = max(
                (
                    sum(a * b for a, b in zip(codes[d], codes[s]))
                    for s in selected
                ),
                default=0,
            )
            score = 2 * rel[d] - max_sim
            if best is None or (score, -d) > (best[0], -best[1]):
                best = (score, d, max_sim)
        selected.append(best[1])
        want.append((rank, best[1], rel[best[1]], best[0]))
    got = sorted(
        (r["rank"], r["vec_id"], r["rel"], r["mmr_score"])
        for r in q_vector_mmr(spark, SF_SMALL).collect()
    )
    assert got == want


def test_pareto_matches_serial_lorenz(spark):
    """Windowed k80/top-10 share must equal a serial Lorenz-curve
    fold over collected per-customer revenues."""
    from scylla_pg_cdc_spark.operators.aggregates import q_pareto_customers

    nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF_SMALL, "customer").collect()
    }
    rev: dict[int, int] = defaultdict(int)
    for r in load_table(spark, SF_SMALL, "orders").collect():
        rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100.0 + 0.5)
    per_nation: dict[int, list] = defaultdict(list)
    for ck, rc in rev.items():
        per_nation[nat[ck]].append((rc, ck))
    want = {}
    for nk, rows in per_nation.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        tot = sum(rc for rc, _ in rows)
        cum, k80 = 0, None
        for i, (rc, _ck) in enumerate(rows, 1):
            cum += rc
            if k80 is None and 5 * cum >= 4 * tot:
                k80 = i
        top10 = sum(rc for rc, _ in rows[:10])
        want[nk] = (len(rows), tot, k80, (1000000 * top10) // tot)
    got = {
        r["nationkey"]: (
            r["n_customers"],
            r["total_cents"],
            r["k80"],
            r["top10_share_ppm"],
        )
        for r in q_pareto_customers(spark, SF_SMALL).collect()
    }
    assert got == want


def test_rolling_wau_matches_serial_sets(spark):
    """Bounded-explode WAU must equal serial 7-day set unions."""
    from scylla_pg_cdc_spark.operators.analytics import q_rolling_active_users

    day_users: dict[tuple, set] = defaultdict(set)
    for r in load_table(spark, SF_SMALL, "events").collect():
        d = int(r["ts"].timestamp() * 1000) // 86400000
        day_users[(r["event_type"], d)].add(r["user_id"])
    want = {}
    for (et, d), users in day_users.items():
        wau = set()
        for back in range(7):
            wau |= day_users.get((et, d - back), set())
        want[(et, d)] = (len(users), len(wau))
    got = {
        (r["event_type"], r["day"]): (r["dau"], r["wau"])
        for r in q_rolling_active_users(spark, SF_SMALL).collect()
    }
    assert got == want


def test_filtered_knn_subset_of_predicate(spark):
    """Every filtered-KNN hit must satisfy the metadata predicate,
    and scores must match the unfiltered scorer on those ids."""
    from scylla_pg_cdc_spark.operators.vector import q_vector_filtered_knn

    ok_ids = {
        r["doc_id"]
        for r in load_table(spark, SF_SMALL, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .collect()
    }
    rows = q_vector_filtered_knn(spark, SF_SMALL).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] in ok_ids for r in rows)
    dots = [r["dot_q"] for r in rows]
    assert dots == sorted(dots, reverse=True)


def test_gap_percentile_two_phase_matches_serial_sort(spark):
    """Two-phase order statistics must equal a serial full-sort
    rank-select per type."""
    from scylla_pg_cdc_spark.operators.features import q_gap_percentile

    per_user: dict[int, list] = defaultdict(list)
    for r in load_table(spark, SF_SMALL, "events").collect():
        per_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1000), r["event_id"], r["event_type"])
        )
    gaps: dict[str, list] = defaultdict(list)
    for rows in per_user.values():
        rows.sort()
        for (a, _ea, _ta), (b, _eb, tb) in zip(rows, rows[1:]):
            gaps[tb].append(b - a)
    want = {}
    for et, gs in gaps.items():
        gs.sort()
        n = len(gs)
        want[et] = (
            n,
            gs[(n + 1) // 2 - 1],
            gs[(95 * n + 99) // 100 - 1],
            gs[(99 * n + 99) // 100 - 1],
        )
    got = {
        r["event_type"]: (r["n_gaps"], r["p50_ms"], r["p95_ms"], r["p99_ms"])
        for r in q_gap_percentile(spark, SF_SMALL).collect()
    }
    assert got == want


def test_drift_monitor_epochs_match_serial_ks(spark, tmp_path):
    """Three epochs through the drift state must produce, per epoch,
    the exact KS of (all prior epochs) vs (this epoch) — recomputed
    serially in Python — and the folded state must equal the total
    counts afterwards."""
    from scylla_pg_cdc_spark.streaming.drift_state import monitor_epoch

    rows = [
        (r["event_type"], int(r["ts"].timestamp() * 1000), r["value"], r["event_id"])
        for r in load_table(spark, SF_SMALL, "events").collect()
        if r["value"] is not None
    ]

    def ks(hist, cur):
        out = {}
        types = {et for et, _ in hist} | {et for et, _ in cur}
        for et in types:
            h = sorted(v for e, v in hist if e == et)
            c = sorted(v for e, v in cur if e == et)
            n1, n2 = len(h), len(c)
            if n1 == 0 or n2 == 0:
                continue
            best = 0
            for x in sorted(set(h) | set(c)):
                c1 = sum(1 for v in h if v <= x)
                c2 = sum(1 for v in c if v <= x)
                best = max(best, abs(c1 * n2 - c2 * n1))
            out[et] = (
                n1,
                n2,
                math.floor(1000000.0 * float(best) / (float(n1) * float(n2)) + 0.5),
            )
        return out

    state = str(tmp_path / "drift")
    full = load_table(spark, SF_SMALL, "events")
    hist: list = []
    for epoch in range(3):
        cur = [
            (et, math.floor(v * 100.0 + 0.5))
            for et, _ms, v, eid in rows
            if eid % 3 == epoch
        ]
        batch = full.filter(F.col("event_id") % 3 == epoch)
        got = {
            r["event_type"]: (r["n_hist"], r["n_epoch"], r["ks_ppm"])
            for r in monitor_epoch(spark, state, batch).collect()
        }
        want = ks(hist, cur) if epoch > 0 else {}
        assert got == want, f"epoch {epoch}"
        hist.extend(cur)
    final = {
        (r["event_type"], r["vc"]): r["cnt"]
        for r in spark.read.parquet(str(tmp_path / "drift" / "counts")).collect()
    }
    serial: dict[tuple, int] = defaultdict(int)
    for et, vc in hist:
        serial[(et, vc)] += 1
    assert final == dict(serial)

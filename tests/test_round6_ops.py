"""Round-6 operator tests: the scale-safe ER family (composite
nation x sorted-neighborhood blocking) checked against serial Python
recomputations, plus its containment contract vs the nation-block
originals."""

from __future__ import annotations

from collections import defaultdict

from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _serial_snm_pairs(rows, window):
    """(nk, a, b, dist) exactly as _er_snm_pairs defines them."""
    by_nation = defaultdict(list)
    for k, name, nk in rows:
        by_nation[nk].append((name, k))
    out = set()
    for nk, members in by_nation.items():
        members.sort()  # (name, custkey): the per-nation sort order
        for i, (na, ka) in enumerate(members):
            for j in range(i + 1, min(i + 1 + window, len(members))):
                nb, kb = members[j]
                d = _lev(na, nb)
                if d <= 2:
                    out.add((nk, min(ka, kb), max(ka, kb), d))
    return out


def test_er_snm_pairs_match_serial_recompute(spark):
    from scylla_pg_cdc_spark.operators.relational import (
        _ER_SNM_W,
        _er_snm_pairs,
    )

    rows = [
        (r["c_custkey"], r["c_name"], r["c_nationkey"])
        for r in load_table(spark, SF_SMALL, "customer").collect()
    ]
    want = _serial_snm_pairs(rows, _ER_SNM_W)
    got = {
        (r["nk"], r["a"], r["b"], r["dist"])
        for r in _er_snm_pairs(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_er_scaled_pairs_subset_of_nation_block(spark):
    """The composite block can only REMOVE candidates (the SNM recall
    contract): every scaled pair must be a lev<=2 same-nation pair."""
    from scylla_pg_cdc_spark.operators.relational import _er_snm_pairs

    name = {
        r["c_custkey"]: (r["c_name"], r["c_nationkey"])
        for r in load_table(spark, SF_SMALL, "customer").collect()
    }
    for r in _er_snm_pairs(spark, SF_SMALL).collect():
        na, nka = name[r["a"]]
        nb, nkb = name[r["b"]]
        assert nka == nkb == r["nk"]
        assert _lev(na, nb) == r["dist"] <= 2


def test_er_scaled_golden_consistent_with_scaled_clusters(spark):
    """Same survivorship invariants as the nation-block golden-record
    test, on the scaled label frame."""
    import math

    from scylla_pg_cdc_spark.operators.relational import (
        _er_labels_scaled,
        q_entity_resolution_scaled,
        q_er_golden_record_scaled,
    )

    golden = {
        r["entity_id"]: r
        for r in q_er_golden_record_scaled(spark, SF_SMALL).collect()
    }
    ents = {
        r["entity_id"]: r["n_members"]
        for r in q_entity_resolution_scaled(spark, SF_SMALL).collect()
    }
    assert set(golden) == set(ents) and len(ents) > 0
    cust = {
        r["c_custkey"]: (
            r["c_name"],
            r["c_mktsegment"],
            math.floor(r["c_acctbal"] * 100.0 + 0.5),
        )
        for r in load_table(spark, SF_SMALL, "customer").collect()
    }
    members: dict[int, list] = defaultdict(list)
    for r in _er_labels_scaled(spark, SF_SMALL).collect():
        members[r["lbl"]].append(r["n"])
    for eid, g in golden.items():
        ms = members[eid]
        assert g["n_members"] == ents[eid] == len(ms)
        assert g["canonical_key"] == min(ms) == eid
        assert g["canonical_name"] == cust[min(ms)][0]
        bals = sorted(
            ((cust[m][2], m) for m in ms), key=lambda t: (-t[0], t[1])
        )
        assert g["trusted_segment"] == cust[bals[0][1]][1]
        assert g["max_bal_cents"] == bals[0][0]
        assert g["total_bal_cents"] == sum(b for b, _ in bals)


def test_embed_collapse_is_duplication_invariant(spark, tmp_path):
    """Injecting k exact copies of every vector must leave the
    collapsed representative pairs IDENTICAL except for multiplicities
    (k x) and raw-pair counts (k^2 x) — the property that kept the
    100x degenerate corpus linear."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from scylla_pg_cdc_spark.operators.vector import (
        q_embed_neardup_collapsed,
    )

    src = "/root/testdata/sf0.001"
    base = {
        (r["vec_a"], r["vec_b"]): (
            r["cos_sim_micro"], r["mult_a"], r["mult_b"], r["n_raw_pairs"]
        )
        for r in q_embed_neardup_collapsed(spark, src).collect()
    }
    # build a k=3 duplicated copy of the embeddings table
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dup_dir, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    k = 3
    dups = emb
    for i in range(1, k):
        dups = dups.unionByName(
            emb.select(
                (F.col("vec_id") + F.lit(1_000_000 * i)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    dups.write.parquet(os.path.join(dup_dir, "embeddings.parquet"))
    got = {
        (r["vec_a"], r["vec_b"]): (
            r["cos_sim_micro"], r["mult_a"], r["mult_b"], r["n_raw_pairs"]
        )
        for r in q_embed_neardup_collapsed(spark, dup_dir).collect()
    }
    assert set(got) == set(base)  # same representative pairs
    for pair, (cos0, ma0, mb0, raw0) in base.items():
        cos1, ma1, mb1, raw1 = got[pair]
        assert cos1 == cos0
        assert (ma1, mb1) == (k * ma0, k * mb0)
        assert raw1 == k * k * raw0

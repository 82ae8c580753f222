"""Adversarial-DISTRIBUTION differential fuzzing for the oracle gate.

`tools/amplify.py` stresses the SCALE axis (row counts, integer
widths, plan shape); nothing stressed the DISTRIBUTION axis until this
tool. It derives fuzzed copies of a testdata directory — same schemas,
same referential integrity, deterministic key-derived rewrites, no RNG
— and the existing full differential (`tools/check_oracle.py`) runs
every registered query on Spark AND DuckDB over the fuzzed tables.
Any divergence is a real semantics bug of exactly the class round 9
found analytically (q_domain_tvd divide-by-zero: Spark NULL vs DuckDB
error on a degenerate single-source corpus).

    python tools/fuzz_oracle.py ties     /tmp/fuzz_ties     [src_sf_dir]
    python tools/fuzz_oracle.py sparse   /tmp/fuzz_sparse   [src_sf_dir]
    python tools/fuzz_oracle.py unicode  /tmp/fuzz_unicode  [src_sf_dir]
    python tools/fuzz_oracle.py nulls    /tmp/fuzz_nulls    [src_sf_dir]
    python tools/fuzz_oracle.py nullsdim /tmp/fuzz_nullsdim [src_sf_dir]
    python tools/fuzz_oracle.py nullts   /tmp/fuzz_nullts   [src_sf_dir]
    python tools/fuzz_oracle.py hostile  /tmp/fuzz_hostile  [src_sf_dir]
    python tools/check_oracle.py /tmp/fuzz_ties

Run `hostile` from BOTH sf0.001 and sf0.01 — the sf0.01 mass forms
degenerate groups (e.g. an all-empty-document source) that 500 docs
never produce; it found the tokenizer divide-by-zero the small pass
missed. Round-9 totals: 13 bugs across the seven sweeps.

Round-10 totals: `nullts` (NULL timestamps + NULL join keys, the axis
the generator contract forbids) found 27 bugs on its first sweep —
the project's largest single-profile haul — and the COMPOUND gate
(amplify a fuzzed dir, below) found 3 more that only exist at mass
(a NULL-keyed clicker entering a KMV top-64; full-sort-key ties with
different measures under a nulled tiebreak column). Run nullts from
sf0.01 too, then amplify it.

Profiles (all deterministic functions of the primary key — rerunning
reproduces the byte-identical dataset):

- **ties**: heavy value collisions and hot keys. Measures quantized to
  a handful of distinct values (ORDER BY ties → exposes any missing
  unique tiebreak), timestamps floored to month/minute (same-instant
  events per user), one hot customer owning ~30% of orders, one hot
  user owning ~25% of events, exact-duplicate and near-duplicate
  document families, duplicated embedding vectors, skewed lang/source
  marginals (single-source-dominant corpus → degenerate denominators).
- **sparse**: tiny tables. Facts cut to tens of rows with referential
  integrity preserved set-wise (orders ⊆ surviving customers, lineitem
  ⊆ surviving orders×parts×suppliers); some orders keep zero lineitems
  (left-join empties), some groups vanish (empty-aggregate paths),
  top-k asks for more rows than exist.
- **unicode**: multi-byte text. CJK / accented-latin / emoji /
  combining-codepoint suffixes on documents and names, an
  empty-string document, a whitespace-only document; n_chars is
  recomputed as CODEPOINTS (Python len == Spark length == DuckDB
  length), so the generator invariant n_chars = length(text) holds on
  both engines.

Schema fidelity: every table is written back through its ORIGINAL
Arrow schema (pa.Table.from_pandas(..., schema=orig)), so parquet
types are bit-identical to the driver's testdata.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# deterministic multi-byte suffixes keyed by doc_id % 5
_UNI = [
    " 数据 处理 引擎 数据",          # CJK, repeated token
    " café naïve résumé déjà",       # accented latin-1 range
    " 🚀🔥📊 🚀🔥📊",                  # emoji (astral plane)
    " école école",      # combining acute (2 codepoints/char)
    "",                               # untouched ASCII control group
]


def _read(src: Path, name: str) -> tuple[pd.DataFrame, pa.Schema]:
    t = pq.read_table(src / f"{name}.parquet")
    return t.to_pandas(), t.schema


def _write(dst: Path, name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    out = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(out, dst / f"{name}.parquet")


def _recount(df: pd.DataFrame) -> pd.DataFrame:
    # generator invariant: n_chars == length(text) in CODEPOINTS
    df["n_chars"] = df["text"].map(len).astype("int64")
    return df


# ---------------------------------------------------------------- ties

def fuzz_ties(src: Path, dst: Path) -> None:
    """Value collisions, hot keys, duplicate docs/vectors, skewed marginals."""
    for name in TABLES:
        df, schema = _read(src, name)
        if name == "customer":
            df["c_acctbal"] = (df["c_acctbal"] / 1000.0).round() * 1000.0
            seg0 = df["c_mktsegment"].iloc[0]
            df.loc[df["c_custkey"] % 5 < 2, "c_mktsegment"] = seg0
        elif name == "supplier":
            df["s_acctbal"] = (df["s_acctbal"] / 1000.0).round() * 1000.0
        elif name == "part":
            df["p_retailprice"] = (df["p_retailprice"] / 100.0).round() * 100.0
            df["p_size"] = (df["p_size"] % 3 + 1).astype(df["p_size"].dtype)
            b0 = df["p_brand"].iloc[0]
            df.loc[df["p_partkey"] % 5 < 4, "p_brand"] = b0
        elif name == "orders":
            df["o_totalprice"] = (df["o_totalprice"] / 100.0).round() * 100.0
            df["o_orderdate"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
            hot = df["o_custkey"].min()
            df.loc[df["o_orderkey"] % 10 < 3, "o_custkey"] = hot
            s0 = df["o_orderstatus"].iloc[0]
            df.loc[df["o_orderkey"] % 10 < 9, "o_orderstatus"] = s0
        elif name == "lineitem":
            df["l_quantity"] = ((df["l_orderkey"] + df["l_linenumber"]) % 3 + 1).astype("float64")
            df.loc[df["l_orderkey"] % 10 < 7, "l_discount"] = 0.0
            df["l_tax"] = 0.04
            df["l_shipdate"] = df["l_shipdate"].dt.to_period("M").dt.to_timestamp()
        elif name == "events":
            # half the events collapse to same-minute instants per user
            m = df["event_id"] % 2 == 0
            df.loc[m, "ts"] = df.loc[m, "ts"].dt.floor("min")
            hot = df["user_id"].min()
            df.loc[df["event_id"] % 4 == 0, "user_id"] = hot
            df["value"] = df["value"].round()
            df.loc[df["event_id"] % 10 < 7, "event_type"] = "view"
        elif name == "documents":
            txt = df.set_index("doc_id")["text"]
            canon = (df["doc_id"] // 7 * 7).clip(lower=int(df["doc_id"].min()))
            canon = canon.where(canon.isin(txt.index), df["doc_id"])
            # doc_id%7==3 → exact duplicate of its family canon;
            # %7==4 → near-duplicate (one appended token)
            exact = df["doc_id"] % 7 == 3
            near = df["doc_id"] % 7 == 4
            df.loc[exact, "text"] = canon[exact].map(txt).values
            df.loc[near, "text"] = canon[near].map(txt).values + " extra"
            df.loc[df["doc_id"] % 97 == 5, "text"] = ""
            df.loc[df["doc_id"] % 97 == 6, "text"] = "one"
            df.loc[df["doc_id"] % 3 < 2, "lang"] = "en"
            df.loc[df["doc_id"] % 2 == 0, "source"] = "src0"
            df = _recount(df)
        elif name == "embeddings":
            vec = df.set_index("vec_id")["embedding"]
            canon = (df["vec_id"] // 5 * 5).clip(lower=int(df["vec_id"].min()))
            canon = canon.where(canon.isin(vec.index), df["vec_id"])
            dup = df["vec_id"] % 5 == 4
            df.loc[dup, "embedding"] = canon[dup].map(vec).values
            df.loc[df["vec_id"] % 3 < 2, "label"] = int(df["label"].iloc[0])
        _write(dst, name, df, schema)


# -------------------------------------------------------------- sparse

def fuzz_sparse(src: Path, dst: Path) -> None:
    """Tens-of-rows facts; referential integrity preserved set-wise."""
    keep: dict[str, set] = {}
    for name in TABLES:
        df, schema = _read(src, name)
        if name == "customer":
            df = df[df["c_custkey"] % 13 == 0]
            keep["cust"] = set(df["c_custkey"])
        elif name == "supplier":
            df = df[df["s_suppkey"] % 3 == 0]
            keep["supp"] = set(df["s_suppkey"])
        elif name == "part":
            df = df[df["p_partkey"] % 13 == 0]
            keep["part"] = set(df["p_partkey"])
        elif name == "orders":
            df = df[df["o_custkey"].isin(keep["cust"]) & (df["o_orderkey"] % 3 == 0)]
            keep["ord"] = set(df["o_orderkey"])
        elif name == "lineitem":
            df = df[
                df["l_orderkey"].isin(keep["ord"])
                & df["l_partkey"].isin(keep["part"])
                & df["l_suppkey"].isin(keep["supp"])
            ]
        elif name == "events":
            df = df[df["event_id"] % 37 == 0]
        elif name == "documents":
            df = df[df["doc_id"] % 53 == 0].copy()
            if len(df) >= 2:  # one exact-dup pair so dedup finds work
                df.iloc[1, df.columns.get_loc("text")] = df.iloc[0]["text"]
                df = _recount(df)
        elif name == "embeddings":
            df = df[(df["vec_id"] % 53 == 0) | (df["vec_id"] == 0)]
        _write(dst, name, df, schema)


# ------------------------------------------------------------- unicode

def fuzz_unicode(src: Path, dst: Path) -> None:
    """Multi-byte text everywhere text flows."""
    for name in TABLES:
        df, schema = _read(src, name)
        if name == "documents":
            suf = (df["doc_id"] % 5).map(lambda i: _UNI[int(i)])
            df["text"] = df["text"] + suf
            df.loc[df["doc_id"] % 101 == 7, "text"] = ""
            df.loc[df["doc_id"] % 101 == 8, "text"] = "   "
            df = _recount(df)
        elif name == "customer":
            m = df["c_custkey"] % 4 == 0
            df.loc[m, "c_name"] = df.loc[m, "c_name"] + " 客户"
        elif name == "part":
            m = df["p_partkey"] % 4 == 0
            df.loc[m, "p_name"] = df.loc[m, "p_name"] + " naïve"
        _write(dst, name, df, schema)


# --------------------------------------------------------------- nulls

def fuzz_nulls(src: Path, dst: Path) -> None:
    """NULLs in MEASURE columns only (keys / dates / text stay non-null
    — those are NOT NULL by the generator contract; measures are where
    real 100 TB data grows holes).  ~1 row in 13 per column, keyed off
    the primary key so the hole pattern is deterministic and disjoint
    across columns."""
    holes = {
        "customer": [("c_custkey", 13, 0, "c_acctbal")],
        "supplier": [("s_suppkey", 13, 1, "s_acctbal")],
        "part": [("p_partkey", 13, 2, "p_retailprice")],
        "orders": [("o_orderkey", 13, 6, "o_totalprice")],
        "lineitem": [
            ("l_orderkey", 13, 3, "l_discount"),
            ("l_orderkey", 13, 4, "l_tax"),
            ("l_orderkey", 13, 7, "l_quantity"),
            ("l_orderkey", 13, 8, "l_extendedprice"),
        ],
        "events": [("event_id", 13, 5, "value")],
    }
    for name in TABLES:
        df, schema = _read(src, name)
        for key, mod, rem, col in holes.get(name, []):
            df.loc[df[key] % mod == rem, col] = np.nan
        _write(dst, name, df, schema)


def fuzz_nullsdim(src: Path, dst: Path) -> None:
    """NULLs in DIMENSION columns (group/join keys of the analytics
    families): documents.lang / documents.source, events.event_type,
    customer.c_mktsegment, part.p_brand.  Probes GROUP BY on NULL keys
    (both engines form one NULL group), join keys that never match,
    and window partitions keyed on NULL.  Entity keys and timestamps
    stay non-null (NOT NULL by generator contract)."""
    holes = {
        "documents": [("doc_id", 17, 3, "lang"), ("doc_id", 17, 9, "source")],
        "events": [("event_id", 17, 5, "event_type")],
        "customer": [("c_custkey", 17, 7, "c_mktsegment")],
        "part": [("p_partkey", 17, 11, "p_brand")],
    }
    for name in TABLES:
        df, schema = _read(src, name)
        for key, mod, rem, col in holes.get(name, []):
            df.loc[df[key] % mod == rem, col] = None
        _write(dst, name, df, schema)


def fuzz_nullts(src: Path, dst: Path) -> None:
    """NULL TIMESTAMPS and NULL JOIN KEYS — the axis the generator
    contract forbids (r9 VERDICT names it the top unfuzzed axis).
    Real CDC feeds and web crawls serve both: a tombstone with no
    commit time, an orphaned fact row with a NULL foreign key.
    Primary keys stay non-null (a NULL PK row is DLQ material, not a
    query input); everything else that queries sort, join, window, or
    sessionize on grows deterministic holes:

    - events.ts        (ORDER BY / window frames / sessionization)
    - events.user_id   (window partitions, session keys, funnels)
    - orders.o_orderdate, orders.o_custkey
    - lineitem.l_shipdate, l_suppkey, l_partkey
    - customer.c_nationkey, supplier.s_nationkey (TPC-H join spine)
    - embeddings.label (ANN group key)

    Divergence classes this reaches that `nulls`/`nullsdim` cannot:
    NULL sort keys inside window ORDER BY (Spark NULLS FIRST vs
    DuckDB NULLS LAST), NULL session boundaries, NULL join keys
    dropped by inner joins but kept by outer joins, date_trunc(NULL).
    """
    int_holes = {
        "events": [("event_id", 23, 3, "user_id")],
        "orders": [("o_orderkey", 23, 5, "o_custkey")],
        "lineitem": [
            ("l_orderkey", 23, 7, "l_suppkey"),
            ("l_orderkey", 23, 11, "l_partkey"),
        ],
        "customer": [("c_custkey", 29, 8, "c_nationkey")],
        "supplier": [("s_suppkey", 29, 9, "s_nationkey")],
        "embeddings": [("vec_id", 17, 5, "label")],
    }
    ts_holes = {
        "events": [("event_id", 19, 2, "ts")],
        "orders": [("o_orderkey", 19, 4, "o_orderdate")],
        "lineitem": [("l_orderkey", 19, 6, "l_shipdate")],
    }
    for name in TABLES:
        df, schema = _read(src, name)
        for key, mod, rem, col in int_holes.get(name, []):
            # pandas int64 cannot hold NULL; go through the nullable
            # Int64 extension dtype so from_pandas(schema=orig) maps
            # pd.NA -> parquet null without float round-tripping
            df[col] = df[col].astype("Int64")
            df.loc[df[key] % mod == rem, col] = pd.NA
        for key, mod, rem, col in ts_holes.get(name, []):
            df.loc[df[key] % mod == rem, col] = pd.NaT
        _write(dst, name, df, schema)


def fuzz_hostile(src: Path, dst: Path) -> None:
    """All three value profiles composed (nulls -> ties -> unicode):
    real corpora serve holes, collisions, and multi-byte text at the
    same time, and interactions (a NULL next to a tie inside one
    window frame, a duplicated unicode document) reach branch
    combinations the single-axis profiles cannot."""
    import tempfile

    with tempfile.TemporaryDirectory() as t1, tempfile.TemporaryDirectory() as t2:
        fuzz_nulls(src, Path(t1))
        fuzz_ties(Path(t1), Path(t2))
        fuzz_unicode(Path(t2), dst)


PROFILES = {
    "ties": fuzz_ties,
    "sparse": fuzz_sparse,
    "unicode": fuzz_unicode,
    "nulls": fuzz_nulls,
    "nullsdim": fuzz_nullsdim,
    "nullts": fuzz_nullts,
    "hostile": fuzz_hostile,
}

# Compound SCALE x DISTRIBUTION gate (round 10): amplify a fuzzed dir
# so hot NULL keys / ties / multi-byte text meet 10x mass —
#     python tools/fuzz_oracle.py hostile /tmp/fuzz_h  sf0.01_dir
#     python tools/amplify.py /tmp/fuzz_h /tmp/fuzz_amp10 10
#     python tools/check_oracle.py /tmp/fuzz_amp10
# (amplify's key offsets keep NULL keys NULL in every copy, so a
# NULL-keyed window partition grows 10x instead of staying toy-sized.)


def main() -> None:
    if len(sys.argv) < 3 or sys.argv[1] not in PROFILES:
        sys.exit(f"usage: fuzz_oracle.py {{{'|'.join(PROFILES)}}} dst_dir [src_sf_dir]")
    profile, dst = sys.argv[1], Path(sys.argv[2])
    src = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001")
    PROFILES[profile](src, dst)
    for name in TABLES:
        n = pq.read_metadata(dst / f"{name}.parquet").num_rows
        print(f"{name}: {n} rows")
    print(f"wrote {profile} profile -> {dst}")


if __name__ == "__main__":
    main()

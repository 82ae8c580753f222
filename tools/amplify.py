"""Build an N-times amplified copy of a testdata directory so the
FULL differential gate can run at amplified scale:

    python tools/amplify.py [src_sf_dir] [dst_dir] [n_copies] [tables]
    python tools/check_oracle.py /tmp/amp10            # 10x gate

``--boilerplate=P`` (anywhere on the command line) additionally
prepends a fixed 12-token header to P% of documents (deterministic:
``doc_id % 100 < P``; the header tokens are NOT per-copy suffixed, so
they are corpus-wide hot shingles). Synthetic amplification otherwise
has benign shingle document-frequency — real web corpora share
boilerplate headers/footers, and THAT is what makes naive
shared-shingle self-joins quadratic (VERDICT r6 "What's wrong #2").
The skewed set gates the prefix-filtered similarity family:

    python tools/amplify.py /root/testdata/sf0.1 /tmp/amp10z 10 \\
        documents --boilerplate=20

``tables`` (optional comma list) amplifies only those fact tables —
the 100x text/ANN sweep amplifies documents,embeddings alone and
borrows the rest from the 10x build, keeping the dataset buildable
in seconds instead of amplifying 60M lineitem rows nobody queries.

Why this exists: scale bugs that sf-growth testing cannot reach hide
in integer width and plan shape (round 5 example: q_spearman_trend
squared int32 row_number ranks — fine at sf0.1's 20k rows/key,
ANSI-mode abort at 10x). Running every registered query against 10x
data under Spark's ANSI mode turns silent envelope violations into
hard failures, and running the DuckDB oracle beside it checks that
results stay exact where row counts explode.

Amplification rules (referential integrity preserved):
- region/nation are FIXED dimensions (copied verbatim): nation keys
  are semantic (25 nations) and every fact row's nationkey must stay
  in range.
- customer/supplier/part/orders/lineitem/events/embeddings get key
  offsets consistent across tables (copy i adds i*OFF to each
  entity's key and to every foreign reference), so joins produce
  exactly N disjoint copies of the base join graph.
- documents get per-copy TOKEN suffixes — disjoint vocabularies, so
  text workloads scale data N-fold instead of collapsing into one
  giant near-dup cluster (use the neardup family's own adversarial
  runs for that case).
- events shift time by i*span so the time axis grows with the data;
  embeddings keep ONE vec_id-0 query vector (copy 0 only).
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scylla_pg_cdc_spark.session import get_session  # noqa: E402
from scylla_pg_cdc_spark.sources.tables import load_table  # noqa: E402

OFF = 100_000_000  # per-copy key offset, far above any base key


def _union(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


BOILER_TOKENS = 12


def amplify(
    src: str,
    dst: str,
    n: int,
    tables: set[str] | None = None,
    boiler_pct: int = 0,
) -> None:
    spark = get_session()
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)

    def wanted(name: str) -> bool:
        return tables is None or name in tables

    def write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )

    # fixed dims: copied verbatim
    for t in ("region", "nation"):
        write(load_table(spark, src, t), t)

    def off(col: str, i: int):
        return (F.col(col) + F.lit(i * OFF)).alias(col)

    cust = load_table(spark, src, "customer")
    if wanted("customer"):
        write(
            _union([
                cust.select(
                    off("c_custkey", i), "c_name", "c_nationkey",
                    "c_acctbal", "c_mktsegment",
                )
                for i in range(n)
            ]),
            "customer",
        )

    sup = load_table(spark, src, "supplier")
    if wanted("supplier"):
        write(
            _union([
                sup.select(
                    off("s_suppkey", i), "s_name", "s_nationkey", "s_acctbal"
                )
                for i in range(n)
            ]),
            "supplier",
        )

    part = load_table(spark, src, "part")
    if wanted("part"):
        write(
            _union([
                part.select(
                    off("p_partkey", i), "p_name", "p_brand", "p_type",
                    "p_size", "p_retailprice",
                )
                for i in range(n)
            ]),
            "part",
        )

    orders = load_table(spark, src, "orders")
    if wanted("orders"):
        write(
            _union([
                orders.select(
                    off("o_orderkey", i), off("o_custkey", i),
                    "o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority",
                )
                for i in range(n)
            ]),
            "orders",
        )

    li = load_table(spark, src, "lineitem")
    if wanted("lineitem"):
        write(
            _union([
                li.select(
                    off("l_orderkey", i), off("l_partkey", i),
                    off("l_suppkey", i), "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate",
                )
                for i in range(n)
            ]),
            "lineitem",
        )

    if wanted("events"):
        ev = load_table(spark, src, "events")
        span_ms = ev.agg(
            (
                F.max(F.unix_millis("ts")) - F.min(F.unix_millis("ts")) + 1
            ).alias("s")
        ).head()["s"]
        write(
            _union([
                ev.select(
                    off("event_id", i),
                    F.timestamp_millis(
                        F.unix_millis("ts") + F.lit(i * span_ms)
                    ).alias("ts"),
                    off("user_id", i),
                    "event_type", "value", "props",
                )
                for i in range(n)
            ]),
            "events",
        )

    if wanted("documents"):
        docs = load_table(spark, src, "documents")
        # n_chars is recomputed from the AMPLIFIED text in both modes
        # (ADVICE r7: the per-copy _c{i} suffixes lengthen the text,
        # so passing the base n_chars through broke the
        # n_chars == length(text) invariant in the plain path while
        # the boilerplate path preserved it — two amplified datasets
        # with different n_chars semantics)
        amp_docs = _union([
            docs.select(
                off("doc_id", i),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t, i=i: F.concat(t, F.lit(f"_c{i}")),
                    ),
                    " ",
                ).alias("text"),
                "lang", "source",
            )
            for i in range(n)
        ]).select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        )
        if boiler_pct:
            # corpus-wide hot shingles: the header is shared across
            # copies (NO per-copy suffix) and hits the same docs in
            # every copy (doc_id % 100 is offset-invariant: OFF % 100
            # == 0); n_chars keeps its length(text) invariant
            header = " ".join(f"bp{j}" for j in range(BOILER_TOKENS))
            hit = (F.col("doc_id") % 100) < boiler_pct
            amp_docs = amp_docs.select(
                "doc_id",
                F.when(
                    hit, F.concat(F.lit(header + " "), F.col("text"))
                )
                .otherwise(F.col("text"))
                .alias("text"),
                "lang",
                "source",
            ).select(
                "doc_id", "text", "lang", "source",
                F.length("text").cast("long").alias("n_chars"),
            )
        write(amp_docs, "documents")

    emb = load_table(spark, src, "embeddings")
    if wanted("embeddings"):
        write(
            _union([
                (emb if i == 0 else emb.filter(F.col("vec_id") != 0)).select(
                    (F.col("vec_id") + F.lit(i * OFF)).alias("vec_id")
                    if i > 0
                    else F.col("vec_id"),
                    "embedding",
                    (F.col("label") + F.lit(i * 100)).cast("int").alias(
                        "label"
                    ),
                )
                for i in range(n)
            ]),
            "embeddings",
        )
    print(f"amplified {src} x{n} -> {dst}")


if __name__ == "__main__":
    boiler_pct = 0
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--boilerplate="):
            boiler_pct = int(a.split("=", 1)[1])
        else:
            argv.append(a)
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/tmp/amp10"
    n = int(argv[2]) if len(argv) > 2 else 10
    tables = set(argv[3].split(",")) if len(argv) > 3 else None
    amplify(src, dst, n, tables, boiler_pct)

"""Z-order scan-pruning demo: measure (not assert) how many parquet
row groups a predicate can skip under two layouts of the SAME data:

  A. sorted by l_partkey only (the single-key clustering a plain
     ORDER BY write gives you);
  B. sorted by the Morton code of (l_partkey, l_suppkey)
     (``operators/layout.py`` — the OPTIMIZE ZORDER layout).

A predicate on the FIRST key prunes under both layouts; a predicate
on the SECOND key can only prune under Z-order, because layout A
scatters suppkey across every row group. Row-group min/max footer
stats are exactly what Spark/Trino/DuckDB use for skipping, so
counting row groups whose [min, max] interval admits the predicate is
an engine-independent measurement of scan pruning.

Usage: python tools/zorder_demo.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from scylla_pg_cdc_spark.operators.layout import _morton_spark  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402
from scylla_pg_cdc_spark.sources.tables import load_table  # noqa: E402


def _write(df, path: str) -> None:
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def _row_groups_admitting(path: str, col: str, lo: int, hi: int):
    """(admitted, total) row groups whose [min,max] intersects [lo,hi]."""
    admitted = total = 0
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                admitted += 1
    return admitted, total


def run(sf_dir: str) -> dict[str, tuple[int, int]]:
    spark = get_session("zorder-demo")
    spark.sparkContext.setLogLevel("ERROR")
    # small row groups so the file carries many prunable units
    # (256 KB blocks => ~55 groups at sf0.1); the Hadoop conf is
    # shared session state, so restore the previous value on exit
    # lest every later parquet write inherit tiny row groups
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(256 * 1024))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    mx = li.agg(
        (F.max("l_partkey") + 1).alias("mp"),
        (F.max("l_suppkey") + 1).alias("ms"),
    )
    coded = li.crossJoin(F.broadcast(mx)).withColumn(
        "z",
        _morton_spark(
            F.expr("(l_partkey * 65536) DIV mp"),
            F.expr("(l_suppkey * 65536) DIV ms"),
        ),
    )
    tmp = tempfile.mkdtemp(prefix="zorder_demo_")
    try:
        a_dir, b_dir = f"{tmp}/by_partkey", f"{tmp}/by_zorder"
        _write(coded.orderBy("l_partkey").drop("z", "mp", "ms"), a_dir)
        _write(coded.orderBy("z").drop("z", "mp", "ms"), b_dir)
        n_supp = mx.head()["ms"] - 1
        lo, hi = int(n_supp * 0.4), int(n_supp * 0.45)  # 5% suppkey band
        out = {
            "partkey_sort/suppkey_pred": _row_groups_admitting(
                a_dir, "l_suppkey", lo, hi
            ),
            "zorder/suppkey_pred": _row_groups_admitting(
                b_dir, "l_suppkey", lo, hi
            ),
            "partkey_sort/partkey_pred": _row_groups_admitting(
                a_dir, "l_partkey", lo * 20, hi * 20
            ),
            "zorder/partkey_pred": _row_groups_admitting(
                b_dir, "l_partkey", lo * 20, hi * 20
            ),
        }
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if prev_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev_block)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    for k, (adm, tot) in run(sf_dir).items():
        print(f"{k:28s} reads {adm}/{tot} row groups")

"""Z-order layout: the locality the checked query reports must
translate into actual row-group pruning (tools/zorder_demo.py), and
the Morton code itself must interleave correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MED


def test_morton_code_interleaves_bits(spark):
    from scylla_pg_cdc_spark.operators.layout import _morton_spark

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            _morton_spark(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = [morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]
    assert got == want


def test_zorder_prunes_second_dimension(spark):
    """Under a suppkey predicate, the Z-ordered file must admit
    strictly fewer row groups than the partkey-sorted file (which
    scatters suppkey everywhere and admits all of them). Needs sf0.01:
    at sf0.001 the whole table fits one row group and nothing can
    prune."""
    from tools.zorder_demo import run

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    block_before = hconf.get("parquet.block.size")
    out = run(SF_MED)
    # the demo shrinks parquet.block.size on the SHARED Hadoop conf;
    # it must restore it or every later write inherits 256 KB groups
    assert hconf.get("parquet.block.size") == block_before
    pk_adm, pk_tot = out["partkey_sort/suppkey_pred"]
    z_adm, z_tot = out["zorder/suppkey_pred"]
    assert pk_adm == pk_tot, "partkey sort should admit every row group"
    assert z_adm < z_tot, "z-order must skip at least one row group"
    assert z_adm / z_tot < pk_adm / pk_tot
    # and z-order must still prune on the FIRST key too
    zp_adm, zp_tot = out["zorder/partkey_pred"]
    assert zp_adm < zp_tot

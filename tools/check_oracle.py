"""Local differential checker mimicking the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison (sorted rows, exact equality after
light normalization). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402
from scylla_pg_cdc_spark.session import get_session  # noqa: E402
from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # round-trip through repr at 12 significant digits to absorb
        # float32->float64 printing noise while catching real drift
        return ("f", f"{v:.12g}")
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x) for x in v))
    return ("s", str(v))


def _norm_rows(rows):
    return sorted(tuple(_norm_cell(c) for c in row) for row in rows)


def _spark_kind(simple: str) -> str:
    if simple in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if simple in ("float", "double"):
        return "float"
    if simple == "boolean":
        return "bool"
    if simple.startswith(("timestamp", "date")):
        return "time"
    return "other"


def _pandas_kind(dtype: str) -> str:
    if dtype.startswith(("int", "uint")):
        return "int"
    if dtype.startswith("float"):
        return "float"
    if dtype == "bool":
        return "bool"
    if dtype.startswith("datetime"):
        return "time"
    return "other"


def _duck_declared_kind(type_name: str) -> str:
    """DuckDB DECLARED column type -> kind, for the all-NULL fallback.

    HUGEINT and DECIMAL map to 'other' on purpose: oracles routinely
    SUM into HUGEINT/DECIMAL while Spark declares decimal(38,x) —
    both land in 'other' so the widened-accumulator idiom never
    false-flags; genuine int-vs-float declared drift is still caught.
    """
    t = type_name.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith(("TIMESTAMP", "DATE")):
        return "time"
    return "other"


def check(sf_dir: str, only: list[str] | None = None) -> int:
    specs = load_all()
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # testdata ships single files; Spark-written dirs (e.g.
        # tools/amplify.py output) hold part files underneath
        path = f"{sf_dir}/{t}.parquet"
        if Path(path).is_dir():
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    failures = 0
    names = only or sorted(specs)
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            ok = len(spark_rows) > 0
            print(
                f"{'ok   ' if ok else 'FAIL '} {name}: rows-only "
                f"({len(spark_rows)} rows, {time.time()-t0:.1f}s)"
            )
            failures += 0 if ok else 1
            continue
        try:
            # Materialize ONCE: the dtype-kind check below needs a
            # pandas frame and the value compare needs native rows —
            # re-executing the oracle for each doubled gate wall-time
            # on the 100x replays where the oracle dominates (r8
            # VERDICT item 3: hard_negative 366 s / knn_margin 519 s
            # oracle sides). A temp table costs one execution and
            # both reads are then frontier-cheap.
            con.execute(
                "CREATE OR REPLACE TEMP TABLE _oracle_res AS "
                + spec.oracle
            )
            res = con.execute("SELECT * FROM _oracle_res")
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue

        problems = []
        # The driver canonicalizes with a pandas sort over every column;
        # unhashable cell types (list/dict from array/map/struct columns)
        # die there even though this tool's tuple-compare tolerates them
        # (round-3 lesson: q_embed_quantize passed locally, errored in
        # CORRECTNESS_r03).  Enforce driver-hashability here.
        unhashable = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
        ]
        if unhashable:
            problems.append(
                f"driver-unhashable output columns {unhashable} "
                "(emit as comma-joined string / to_json / checksum)"
            )
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        else:
            # dtype-kind parity: DuckDB HUGEINT->float64 via pandas is the
            # classic silent killer (int sums hashing as floats)
            duck_df = con.execute("SELECT * FROM _oracle_res").df()
            duck_kinds = {
                c.lower(): _pandas_kind(str(t))
                for c, t in duck_df.dtypes.items()
            }
            spark_kinds = {
                f.name.lower(): _spark_kind(f.dataType.simpleString())
                for f in sdf.schema.fields
            }
            # NULL-coercion parity: pandas has no NULL in int64/bool, so
            # a nullable BIGINT column with any NULL arrives as float64
            # (or object) from BOTH engines' pandas paths — the driver
            # sees the identical coercion on the Spark side via toPandas,
            # so declared-int vs floated-by-NULL is NOT drift.  Exempt
            # null-bearing columns from the kind check (round-9 fuzz:
            # empty-aggregate NULLs false-flagged 8 queries); genuine
            # int-vs-float drift with values present is still caught by
            # the exact value compare (_norm_cell tags ints and floats
            # differently).
            null_cols = {
                c
                for i, c in enumerate(spark_cols)
                if any(row[i] is None for row in spark_rows)
            } | {
                c.lower() for c in duck_df.columns if duck_df[c].isna().any()
            }
            # ADVICE r9: an ENTIRELY-null column (degenerate fuzz
            # corpora) would otherwise pass with declared type drift
            # unchecked — the value compare sees only ('null',) cells.
            # For those, compare DECLARED kinds (Spark schema vs the
            # DuckDB cursor description), which pandas NULL-coercion
            # cannot touch; partial-null columns keep the exemption
            # because the value compare still tags their non-null
            # int/float cells differently.
            duck_declared = {
                d[0].lower(): _duck_declared_kind(str(d[1]))
                for d in res.description
            }
            duck_by_lc = {c.lower(): c for c in duck_df.columns}
            all_null = {
                c
                for i, c in enumerate(spark_cols)
                if spark_rows
                and all(row[i] is None for row in spark_rows)
                and c in duck_by_lc
                and duck_df[duck_by_lc[c]].isna().all()
            }
            for c in null_cols:
                if c in all_null:
                    dk = duck_declared.get(c, "other")
                    sk = spark_kinds.get(c, "other")
                    if "other" not in (sk, dk):
                        duck_kinds[c] = dk  # keep: declared-vs-declared
                        continue
                spark_kinds.pop(c, None)
                duck_kinds.pop(c, None)
            kind_diffs = {
                c: (spark_kinds[c], duck_kinds[c])
                for c in spark_kinds
                if duck_kinds.get(c) and spark_kinds[c] != duck_kinds[c]
            }
            if kind_diffs:
                problems.append(f"dtype-kind mismatch {kind_diffs}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            # align duck columns to spark order
            idx = [duck_cols.index(c) for c in spark_cols]
            duck_aligned = [tuple(row[i] for i in idx) for row in duck_rows]
            a, b = _norm_rows(spark_rows), _norm_rows(duck_aligned)
            if a != b:
                diff_i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                problems.append(
                    f"values differ at sorted row {diff_i}:\n"
                    f"    spark={a[diff_i]}\n    duck ={b[diff_i]}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok    {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    raise SystemExit(1 if check(sf_dir, only) else 0)

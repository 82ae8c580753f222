"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its checkable queries here with the
``@query`` decorator; ``__spark_entry__.py`` is then a thin re-export.
Each entry pairs a DataFrame builder ``fn(spark, sf_dir)`` with the
equivalent DuckDB oracle SQL (or ``None`` for non-SQL-expressible ops,
which the driver checks rows-only).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => rows-only check


REGISTRY: dict[str, QuerySpec] = {}

_CTE_DEF = re.compile(r"\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE)
_OVER_NAME = re.compile(r"\bOVER\s+(\w+)", re.IGNORECASE)
_WINDOW_KW = re.compile(r"\bWINDOW\b", re.IGNORECASE)
_WINDOW_DEF = re.compile(r"\s*(\w+)\s+AS\s*\(", re.IGNORECASE)


def _window_clause_names(sql: str) -> set[str]:
    """Lower-cased names defined in any ``WINDOW a AS (...), b AS
    (...)`` clause — found by paren-balanced scanning from each WINDOW
    keyword, so a window referenced only by ANOTHER window definition
    (never via ``OVER name``) is still recognized as a window spec."""
    names: set[str] = set()
    for kw in _WINDOW_KW.finditer(sql):
        pos = kw.end()
        while True:
            m = _WINDOW_DEF.match(sql, pos)
            if not m:
                break
            names.add(m.group(1).lower())
            depth, i = 1, m.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            # another definition only if a comma chains it
            j = i
            while j < len(sql) and sql[j].isspace():
                j += 1
            if j < len(sql) and sql[j] == ",":
                pos = j + 1
            else:
                break
    return names


def materialize_shared_ctes(sql: str) -> str:
    """Rewrite every CTE referenced two or more times to
    ``AS MATERIALIZED`` for DuckDB.

    DuckDB 1.x INLINES common table expressions: a CTE referenced N
    times is re-evaluated N times, and a chain whose round CTE is
    referenced twice by the next round doubles the evaluated plan
    every round (2^k). Measured on this repo's oracles: the ER pair
    scan re-ran its blocked levenshtein join ~18x (23.7 s -> 5.2 s at
    sf0.1 once materialized) and the components oracle spilled 79 GB
    and aborted at 10x data; the LSH-family overlap CTEs (referenced
    ~10x) OOM-killed the 10x gate outright. Materialization changes
    evaluation strategy only — never results — so applying it to
    every multiply-referenced CTE at registration keeps the oracle
    semantics byte-for-byte while making evaluation linear.

    Names defined in a ``WINDOW w AS (...)`` clause are window specs,
    not CTEs, and are left alone — recognized either by appearing as
    ``OVER <name>`` somewhere in the query or by position inside a
    WINDOW clause (covers windows referenced only by other window
    definitions). Reference counting is case-insensitive (SQL
    identifiers are), and the rewrite is spliced at each regex match
    position — never a first-occurrence string replace, which could
    land on a same-shaped substring inside a comment or literal.
    """
    window_names = {m.group(1).lower() for m in _OVER_NAME.finditer(sql)}
    window_names |= _window_clause_names(sql)
    out = sql
    for m in reversed(list(_CTE_DEF.finditer(sql))):
        cte, already = m.group(1), m.group(2)
        if already or cte.lower() in window_names:
            continue
        refs = len(
            re.findall(rf"\b{re.escape(cte)}\b", sql, re.IGNORECASE)
        ) - 1
        if refs >= 2:
            out = out[: m.start()] + f"{cte} AS MATERIALIZED (" + out[m.end():]
    return out


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the builder for query ``name``.

    Registration checklist (every new ``@query`` ships, in the SAME
    commit, with):
      1. an exact DuckDB oracle (or a documented rows-only omission),
      2. ``python tools/check_oracle.py /root/testdata/sf{0.001,0.01,0.1} <name>``,
      3. a refreshed ``tests/query_schemas.json`` via
         ``python -c "from tests.test_contract_schemas import regenerate; regenerate()"``
         — ``test_query_schemas_unchanged`` fails deterministically on a
         stale snapshot (round-6 lesson: one missing entry made the
         whole suite red),
      4. an ``OPERATORS.md`` inventory line + count bump.
    """
    if oracle is not None:
        oracle = materialize_shared_ctes(oracle)

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


_REPO_ROOT = Path(__file__).resolve().parent.parent


def _correctness_status() -> dict[str, tuple[bool, int]]:
    """name -> (latest driver CORRECTNESS row is green, round recorded).

    Derived from the CORRECTNESS_r*.json files the driver drops in the
    repo root — no hand-maintained name lists to rot (round-3 lesson:
    a green row from an old round says nothing once the environment
    shifts, and a typo in a literal list is silently dropped).  Later
    rounds override earlier ones, so a query whose LATEST row errored
    is treated as unverified and jumps the queue.
    """
    status: dict[str, tuple[bool, int]] = {}
    for rnd, p in enumerate(sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")), 1):
        try:
            recorded = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in recorded.items():
            if not isinstance(row, dict):
                status[name] = (False, rnd)
                continue
            green = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            status[name] = (green, rnd)
    return status


# The driver records CORRECTNESS rows for roughly the first 50 registered
# queries, in registration order (see VERDICT.md round 1, "What's wrong"
# #1).  ``load_all`` therefore orders the registry:
#   1. queries whose latest driver row is NOT green (errors / regressions),
#   2. queries with no driver row yet (new work is checked in its first
#      round),
#   3. the already-green remainder, stalest first (round of latest row,
#      ascending) — re-recording a query pushes it to the back, so the
#      driver's window sweeps through every old green within a few rounds
#      (stale-green detection — round 3 proved r1/r2 greens can rot when
#      the environment moves).
def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the registry ordered for maximum driver-verification value."""
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
    import scylla_pg_cdc_spark.operators.corpus  # noqa: F401
    import scylla_pg_cdc_spark.operators.sketches  # noqa: F401
    import scylla_pg_cdc_spark.operators.simjoin  # noqa: F401
    import scylla_pg_cdc_spark.operators.graph  # noqa: F401
    import scylla_pg_cdc_spark.operators.layout  # noqa: F401
    import scylla_pg_cdc_spark.operators.quality  # noqa: F401
    import scylla_pg_cdc_spark.operators.retrieval  # noqa: F401
    import scylla_pg_cdc_spark.operators.stats  # noqa: F401

    status = _correctness_status()
    broken = [n for n in REGISTRY if n in status and not status[n][0]]
    new = [n for n in REGISTRY if n not in status]
    tail = sorted(
        (n for n in REGISTRY if n in status and status[n][0]),
        key=lambda n: (status[n][1], n),
    )
    ordered = dict.fromkeys(broken + new + tail)
    return {n: REGISTRY[n] for n in ordered}

"""Every REGISTRY query must match its DuckDB oracle at sf0.01 — emulating the
driver's comparison: row count + column names + PANDAS DTYPE KIND per column +
sorted-column value multiset equality.

The dtype check matters: the driver materializes both sides through pandas and
value-hashes, so DuckDB returning HUGEINT (→ float64 in pandas) where Spark
returns int64 is a driver-level mismatch even when every value is equal
(the round-1 q_sessionize_events red). Fetching through .df()/.toPandas() here
reproduces that failure mode locally.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pdf_extract_sys_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _multiset(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(v) for v in row) for row in df[cols].itertuples(index=False)),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, ddb):
    from pdf_extract_sys_spark.queries import resolve_sql

    fn, sql = REGISTRY[name]
    sql = resolve_sql(sql)
    assert sql is not None, f"{name} has no oracle"
    spdf = fn(spark, SF_DIR).toPandas()
    opdf = ddb.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column names differ: {list(spdf.columns)} vs {list(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), f"{name}: row count {len(spdf)} vs {len(opdf)}"
    # dtype-kind parity per column — this is what the driver's value hash sees
    for c in sorted(spdf.columns):
        sk, ok = spdf[c].dtype.kind, opdf[c].dtype.kind
        # unify signed/unsigned int; empty frames may degrade to object on one side
        if len(spdf) and {sk, ok} <= {"i", "u"}:
            continue
        assert not len(spdf) or sk == ok, (
            f"{name}.{c}: pandas dtype kind differs: spark={spdf[c].dtype} "
            f"oracle={opdf[c].dtype} — the driver's value hash will mismatch"
        )
    a, b = _multiset(spdf), _multiset(opdf)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")

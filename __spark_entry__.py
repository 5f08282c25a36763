"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``pdf_extract_sys_spark/`` (see SURVEY.md §2 / §7):
extraction kernels + pipeline + checkpointing, plus the training-data-pipeline
query registry in ``pdf_extract_sys_spark/queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pdf_extract_sys_spark.queries import REGISTRY, q_extract_sentences  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the REAL extraction pipeline (mapInArrow kernels — decode →
    classify → sessionize → order) over a corpus deterministically derived from
    the sf0.001 `documents` table; returns the exploded output spans."""
    return q_extract_sentences(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + the training-data ops)."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (column names match exactly).
    Lazy registry entries (callables) are resolved here, not at import."""
    from pdf_extract_sys_spark.queries import resolve_sql

    return {
        name: s
        for name, (_fn, sql) in REGISTRY.items()
        if (s := resolve_sql(sql)) is not None
    }

"""Driver contract adapter (thin shell over the engine's registry).

``entry(spark)`` runs the flagship settlement query; ``queries()`` and
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
with its DuckDB oracle.  All logic lives in ``event_stream_checkout_spark``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from event_stream_checkout_spark.registry import load_all  # noqa: E402
from event_stream_checkout_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch checkout settlement on sf0.001 (SURVEY.md §7 M0)."""
    configure(spark)
    registry = load_all()
    return registry["txn_settlement"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {key: q.fn for key, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {key: q.oracle for key, q in load_all().items() if q.oracle is not None}

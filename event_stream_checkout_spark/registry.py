"""Query registry: the single source of truth for the engine's surface.

Each operator from SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with the
equivalent ANSI SQL that DuckDB can run on the same parquet tables (the
driver's correctness oracle).  ``__spark_entry__.py`` is a thin adapter
over this registry.

Oracle-parity rules (learned the hard way, enforced by tests):
- Alias every computed column identically on both sides.
- Cast DuckDB integer aggregates to BIGINT (DuckDB sums to HUGEINT).
- Round floating aggregates on BOTH sides (summation order differs
  between engines; raw double reductions are not bit-stable).
- Give every LIMIT/top-k query a total deterministic ORDER BY
  (unique-key tiebreaker), or ties make the result set ambiguous.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(key: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = Query(key=key, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import every operator module so registrations run, then return."""
    from .operators import (  # noqa: F401
        checkout,
        llm,
        llm_advanced,
        multimodal,
        relational,
        relational2,
        relational3,
        scalar_fns,
        streaming_analogues,
        windows,
    )

    return QUERIES

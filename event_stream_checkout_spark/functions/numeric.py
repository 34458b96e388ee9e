"""Numeric reduction policy for cross-engine-stable aggregates.

IEEE-754 double addition is not associative: engines sum partitions in
different orders, so a raw ``SUM(double)`` differs in the last ulps
between runs/engines — enough to break exact value-hash checks.
Casting to decimal is ALSO not portable: Spark rounds the double's
shortest decimal representation (HALF_UP on the string) while DuckDB
rounds the binary value, and real data sits on half-boundaries often
enough to matter (~0.6% of TPC-H-style money values).

Policy (applied to every floating aggregate in the engine):
- Per-row arithmetic stays in DOUBLE — the same expression tree means
  the same IEEE operations, bit-identical on any engine.
- Reductions quantize each row with ``floor(x * 10000.0 + 0.5)`` —
  still pure double ops, bit-identical — then sum the resulting exact
  integers as DECIMAL(25,0) (order-independent), and rescale with one
  deterministic double division at the end.
- Averages are ``(sum / 10000.0) / count`` in that exact order; stddev
  expands to the closed form over the same exact sums.  Built-in
  AVG/STDDEV internals (engine-defined accumulation) are never used
  where an oracle watches.

The 1e-4 quantization is a documented semantic of the engine's money
aggregates; DECIMAL(25,0) keeps a 100 TB sum (≪ 10^25 units) exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000.0
DEC = "decimal(25,0)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quant(col: Column | str) -> Column:
    """Exact integral units: floor(x*10000 + 0.5) as DECIMAL(25,0)."""
    return F.floor(_c(col) * F.lit(SCALE) + F.lit(0.5)).cast(DEC)


def dsum(col: Column | str) -> Column:
    """Order-independent, engine-stable sum of a double column."""
    return F.sum(quant(col)).cast("double") / F.lit(SCALE)


def davg(col: Column | str) -> Column:
    """Engine-stable mean: (exact sum / 10000) / count."""
    c = _c(col)
    return F.sum(quant(c)).cast("double") / F.lit(SCALE) / F.count(c)


def dstddev(col: Column | str) -> Column:
    """Sample stddev via exact sums: sqrt((S2 - S1²/n)/(n-1)).
    NULL for n < 2 — the sample statistic is undefined on a single
    observation, stddev_samp's own convention; without the guard the
    (n-1) divisor throws DIVIDE_BY_ZERO under ANSI mode (found by the
    single-row degenerate sweep, r8)."""
    c = _c(col)
    n = F.count(c).cast("double")
    s1 = F.sum(quant(c)).cast("double") / F.lit(SCALE)
    s2 = F.sum(quant(c * c)).cast("double") / F.lit(SCALE)
    return F.when(
        n > 1.0, F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))
    )


# --- DuckDB-side textual equivalents (oracle SQL builders) ---------------


def sql_quant(expr: str) -> str:
    return f"CAST(floor(({expr}) * 10000.0 + 0.5) AS DECIMAL(25,0))"


def sql_dsum(expr: str) -> str:
    # Parenthesized: these strings get embedded in larger expressions,
    # and SQL's left-assoc '/' would otherwise change the float
    # evaluation order vs the Spark side.
    return f"(CAST(SUM({sql_quant(expr)}) AS DOUBLE) / 10000.0)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def sql_dstddev(expr: str) -> str:
    s1 = sql_dsum(expr)
    s2 = sql_dsum(f"({expr}) * ({expr})")
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 1.0 THEN "
        f"sqrt(({s2} - {s1} * {s1} / {n}) / ({n} - 1.0)) END"
    )

"""Relational surface, wave 10 (r13): per-group OLS trend regression.

Cross-engine policy (the ``agg_corr`` stance, relational3.py): built-in
``regr_slope``-family aggregates accumulate engine-specifically, so the
closed forms here are computed from EXACT integer power sums (day index
× whole-k$ daily revenue, both BIGINT) cast to double once — the
final arithmetic is a fixed sequence of IEEE ops over identical exact
integers, so the oracle hash is stable without rounding heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# ---------------------------------------------------------------------------
# A38: per-nation revenue trend (OLS slope / intercept / r2)
# ---------------------------------------------------------------------------

_TREND_EPOCH = "1992-01-01"  # TPC-H date floor: day indexes stay small

_TREND_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name AS nation,
         datediff('day', DATE '{_TREND_EPOCH}', o.o_orderdate) AS x,
         CAST(floor(CAST(SUM(CAST(floor(o.o_totalprice * 100.0) AS BIGINT))
              AS DOUBLE) / 100000.0) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), sums AS (
  SELECT nation,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY 1
)
SELECT nation, n_days,
  (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
  (CAST(sy AS DOUBLE)
     - ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
       * CAST(sx AS DOUBLE))
  / CAST(n_days AS DOUBLE) AS intercept,
  ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
   * (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
  / ((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
   * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
FROM sums ORDER BY nation
"""


@register(
    "agg_trend_regression",
    oracle=_TREND_ORACLE,
    doc="Per-nation revenue trend via OLS over daily points (A38, "
    "r13): is each nation's order revenue growing, and how fast?  "
    "Two map-side-combinable aggregations — orders to (nation, day, "
    "whole-k$ revenue) points, then per-nation integer power "
    "sums (n, Sx, Sy, Sxx, Sxy, Syy) — followed by the textbook "
    "closed forms slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²), intercept "
    "= (Sy − slope·Sx)/n, r² = num²/(den_x·den_y).  Built-in "
    "regr_slope/regr_r2 exist in both engines but accumulate "
    "engine-specifically (Welford vs naive); the power sums are "
    "BIGINT-exact (y = floor(cents/1e5) whole-k$ — sf10 measured "
    "whole-DOLLAR Syy past 2^63 on a hot nation-day, so the unit "
    "is thousands, safe through ~sf10000), so both engines "
    "evaluate the SAME closed form "
    "over the SAME integers — bit-stable with no rounding.  Scale: "
    "both aggregations shuffle on their group keys with partial "
    "aggregation; output is #nations rows; the nation dim joins "
    "broadcast.  Day index datediff-anchored at the TPC-H date "
    "floor so x² stays small.",
)
def q_agg_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "nation",
            F.datediff(F.col("o_orderdate"), F.lit(_TREND_EPOCH).cast("date"))
            .alias("x"),
        )
        .agg(
            F.floor(
                F.sum(
                    F.floor(F.col("o_totalprice") * F.lit(100.0)).cast(
                        "bigint"
                    )
                ).cast("double")
                / F.lit(100000.0)
            )
            .cast("bigint")
            .alias("y")
        )
    )
    sums = daily.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    num = nd * sxy - sx * sy
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    slope = num / den_x
    return sums.select(
        "nation",
        "n_days",
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"),
    ).orderBy("nation")

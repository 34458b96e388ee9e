"""Relational surface, wave 3: order statistics, argmin/argmax,
distribution window functions, bitwise scalars, and closed-form
correlation — rounding out the analytics function surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import sql_quant, quant
from ..registry import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "agg_percentiles",
    oracle="SELECT o_orderstatus, "
    "round(quantile_cont(o_totalprice, 0.5), 4) AS p50, "
    "round(quantile_cont(o_totalprice, 0.9), 4) AS p90, "
    "round(quantile_cont(o_totalprice, 0.99), 4) AS p99 "
    "FROM orders GROUP BY o_orderstatus",
    doc="Exact interpolated percentiles (A4): both engines use linear "
    "interpolation between closest ranks; rounded at 1e-4 to absorb "
    "last-ulp interpolation differences. At 100 TB prefer "
    "approx_percentile (t-digest style sketch, mergeable).",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "agg_min_max_by",
    oracle="SELECT o_orderstatus, "
    "arg_max(o_orderkey, o_totalprice) AS priciest_order, "
    "arg_min(o_orderkey, o_totalprice) AS cheapest_order, "
    "max(o_totalprice) AS max_price, min(o_totalprice) AS min_price "
    "FROM orders GROUP BY o_orderstatus",
    doc="argmax/argmin aggregation (A4): the key of the extreme row "
    "without a self-join; single-pass, mergeable. Deterministic here "
    "because o_totalprice values are distinct doubles.",
)
def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "agg_corr",
    oracle="SELECT "
    f"(CAST(count(*) AS DOUBLE) * (CAST(SUM({sql_quant('l_quantity * l_extendedprice')}) AS DOUBLE) / 10000.0) "
    f" - (CAST(SUM({sql_quant('l_quantity')}) AS DOUBLE) / 10000.0) "
    f" * (CAST(SUM({sql_quant('l_extendedprice')}) AS DOUBLE) / 10000.0)) / "
    f"(sqrt(CAST(count(*) AS DOUBLE) * (CAST(SUM({sql_quant('l_quantity * l_quantity')}) AS DOUBLE) / 10000.0) "
    f" - (CAST(SUM({sql_quant('l_quantity')}) AS DOUBLE) / 10000.0) "
    f" * (CAST(SUM({sql_quant('l_quantity')}) AS DOUBLE) / 10000.0)) * "
    f"sqrt(CAST(count(*) AS DOUBLE) * (CAST(SUM({sql_quant('l_extendedprice * l_extendedprice')}) AS DOUBLE) / 10000.0) "
    f" - (CAST(SUM({sql_quant('l_extendedprice')}) AS DOUBLE) / 10000.0) "
    f" * (CAST(SUM({sql_quant('l_extendedprice')}) AS DOUBLE) / 10000.0))) "
    "AS qty_price_corr, CAST(count(*) AS BIGINT) AS n FROM lineitem",
    doc="Pearson correlation via the closed form over exact quantized "
    "sums (A4): built-in corr() accumulates engine-specifically; this "
    "form is bit-stable and still single-pass/mergeable.",
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    def s(c):
        return F.sum(quant(c)).cast("double") / 10000.0

    n = F.count(F.lit(1)).cast("double")
    num = n * s(q * p) - s(q) * s(p)
    den = F.sqrt(n * s(q * q) - s(q) * s(q)) * F.sqrt(n * s(p * p) - s(p) * s(p))
    return l.agg(
        (num / den).alias("qty_price_corr"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "win_distribution",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal, "
    "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume "
    "FROM customer WINDOW w AS (PARTITION BY c_nationkey "
    "ORDER BY c_acctbal, c_custkey)",
    doc="Distribution window functions (W1): rational count-based "
    "values — engine-exact without rounding.",
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "fn_bitwise",
    oracle="SELECT o_orderkey, "
    "CAST(o_orderkey & 255 AS BIGINT) AS low_byte, "
    "CAST(o_orderkey | 4096 AS BIGINT) AS with_flag, "
    "CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored, "
    "CAST(o_orderkey << 2 AS BIGINT) AS shifted_l, "
    "CAST(o_orderkey >> 3 AS BIGINT) AS shifted_r, "
    "CAST(bit_count(o_orderkey) AS INTEGER) AS popcount "
    "FROM orders",
    doc="Bitwise scalar family (F9-adjacent): exact integer ops, used "
    "by the simhash/bucketing operators.",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "agg_correlated_subquery",
    # Both engines decorrelate the scalar subquery into an aggregate
    # join; sum/count of integral doubles keeps the threshold exact.
    oracle="SELECT l.l_partkey, "
    "CAST(count(*) AS BIGINT) AS n_small_lines, "
    "CAST(sum(l.l_quantity) AS DOUBLE) AS small_qty "
    "FROM lineitem l "
    "WHERE l.l_quantity < (SELECT 0.5 * (sum(l2.l_quantity) / count(*)) "
    "  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) "
    "GROUP BY l.l_partkey",
    doc="Correlated scalar subquery (TPC-H Q17 shape): lines below "
    "half the part's average quantity. Written as a genuine correlated "
    "subquery on both sides — Catalyst decorrelates it into an "
    "aggregate + join (no per-row re-execution); verify via "
    "EXPLAIN: no more than two exchanges.",
)
def q_agg_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_corr")
    return spark.sql(
        "SELECT l.l_partkey, "
        "count(*) AS n_small_lines, "
        "CAST(sum(l.l_quantity) AS DOUBLE) AS small_qty "
        "FROM _li_corr l "
        "WHERE l.l_quantity < (SELECT 0.5 * (sum(l2.l_quantity) / count(*)) "
        "  FROM _li_corr l2 WHERE l2.l_partkey = l.l_partkey) "
        "GROUP BY l.l_partkey"
    )

"""Relational surface, wave 9: the six remaining classic
decision-support shapes the corpus can express — Q4 (EXISTS
late-shipment priority check), Q7 (bilateral volume shipping), Q8
(national market share), Q9 (product-type profit by nation/year), Q10
(returned-item top customers), Q12 (delay-bucket priority counts;
the synthetic schema has no l_shipmode, so the bucket derives from
the ship delay itself — same conditional-aggregate access shape).
With relational7's wave these close out every TPC-H access pattern
expressible on the driver star schema.

These extend the reference's order-verification analytics
(/root/reference/src/order_processor/check_db.py:33-43) to the
shipping/market questions the same star schema answers.

Cross-engine policy (the relational7 stance): money reductions ride
the dsum fixed-point policy; date arithmetic stays on TIMESTAMP +
INTERVAL (identical on both engines — no datediff, whose day-boundary
conventions differ); share ratios divide two fixed-point doubles and
round 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import register
from ..tables import load_table

from ..scratch import scratch_dir


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REVENUE = "l.l_extendedprice * (1 - l.l_discount)"


def _rev(l=None):  # noqa: E741 - mirrors the SQL alias
    e = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return e


# ---------------------------------------------------------------------------
# A23: late-shipment order-priority check (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

_Q4_START = "TIMESTAMP '1997-01-01 00:00:00'"
_Q4_END = "TIMESTAMP '1997-07-01 00:00:00'"
_Q4_LATE_DAYS = 45


@register(
    "agg_priority_late",
    oracle="SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
    f"FROM orders o WHERE o.o_orderdate >= {_Q4_START} "
    f"AND o.o_orderdate < {_Q4_END} "
    "AND EXISTS (SELECT 1 FROM lineitem l "
    "WHERE l.l_orderkey = o.o_orderkey "
    f"AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY) "
    "GROUP BY 1 ORDER BY 1",
    doc="Late-shipment order-priority check (A23, TPC-H Q4 shape): "
    "for a 6-month order window, count orders per priority class "
    "having AT LEAST ONE lineitem shipped more than 45 days after "
    "the order date (the schema's stand-in for Q4's commit<receipt "
    "lateness — same correlated-EXISTS access shape). The EXISTS is "
    "a LEFT SEMI join on the natural l_orderkey key — never a "
    "per-order subquery — with the lateness predicate evaluated in "
    "the join condition (it references both sides, so it cannot "
    "prune either scan alone); what CAN prune is the derived bound "
    "l_shipdate > window_start + 45d, implied by the conjunction "
    "but invisible to Catalyst across the correlation — pushed by "
    "hand so the fact scan skips every early-shipped row group. "
    "Semi-join output is at most one row per order (no fan-out, no "
    "distinct), then a 5-group count. Deterministic ORDER BY "
    "priority.",
)
def q_agg_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr(_Q4_START))
            & (F.col("o_orderdate") < F.expr(_Q4_END))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .filter(
            # hand-derived pushdown: late wrt ANY in-window order date
            F.col("l_shipdate")
            > F.expr(f"{_Q4_START} + INTERVAL {_Q4_LATE_DAYS} DAY")
        )
        .select("l_orderkey", "l_shipdate")
    )
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (
            l.l_shipdate
            > o.o_orderdate + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAY")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J15: bilateral volume shipping (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_3"
_Q7_NATION_B = "NATION_7"
_Q7_START = "TIMESTAMP '1996-01-01 00:00:00'"
_Q7_END = "TIMESTAMP '1998-01-01 00:00:00'"


@register(
    "join_volume_shipping",
    oracle="SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
    "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
    f"{sql_dsum(_REVENUE)} AS revenue "
    "FROM lineitem l "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
    f"WHERE l.l_shipdate >= {_Q7_START} AND l.l_shipdate < {_Q7_END} "
    f"AND ((sn.n_name = '{_Q7_NATION_A}' AND cn.n_name = '{_Q7_NATION_B}') "
    f"OR (sn.n_name = '{_Q7_NATION_B}' AND cn.n_name = '{_Q7_NATION_A}')) "
    "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3",
    doc="Bilateral volume shipping (J15, TPC-H Q7 shape): revenue "
    "between two trading nations, both directions, by ship year — "
    "supplier nation from lineitem→supplier→nation, customer nation "
    "from lineitem→orders→customer→nation. Plan: the date range is "
    "the only fact predicate (pushed to the parquet scan); the "
    "nation pair disjunction lives on DIMENSION attributes, so both "
    "nation frames pre-filter to 2 rows and broadcast (hinted — the "
    "25-row nation domain is bounded at any SF) — supplier and "
    "customer shrink to the two-nation membership BEFORE touching "
    "the fact table, turning the pair predicate into two membership "
    "probes instead of a post-join filter. The membership frames "
    "themselves GROW with SF (a nation's suppliers are ~1/25 of all "
    "suppliers), so their fact-side joins carry no hint — AQE "
    "broadcasts them while they fit and degrades to shuffle joins "
    "when they don't (plan contract pins the hint inventory). The "
    "only guaranteed shuffle is lineitem→orders on the natural "
    "orderkey. 4-group output, deterministic total order.",
)
def q_join_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = (_Q7_NATION_A, _Q7_NATION_B)
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(list(pair)))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr(_Q7_START))
            & (F.col("l_shipdate") < F.expr(_Q7_END))
        )
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# A24: national market share (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_TYPE = "PROMO"
_Q8_NATION = "NATION_5"


@register(
    "agg_market_share",
    oracle="WITH base AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) "
    f"AS o_year, {_REVENUE} AS volume, sn.n_name AS supp_nation "
    "FROM lineitem l "
    "JOIN part p ON l.l_partkey = p.p_partkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
    "JOIN region r ON cn.n_regionkey = r.r_regionkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
    f"WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}') "
    "SELECT o_year, round("
    + sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume "
               "ELSE 0 END")
    + f" / {sql_dsum('volume')}, 6) AS mkt_share "
    "FROM base GROUP BY 1 ORDER BY 1",
    doc="National market share (A24, TPC-H Q8 shape): of all PROMO-"
    "part revenue sold into ASIA-region customers, what fraction "
    "came from NATION_5 suppliers, per order year. The numerator is "
    "a CONDITIONAL sum inside the same aggregate as the denominator "
    "— one pass, not two branches joined back. Plan: the bounded "
    "region/nation frames broadcast by hint (≤25 rows at any SF); "
    "the type-pruned part slice and the region-scoped customer and "
    "supplier membership frames GROW with SF, so their joins carry "
    "no hint — AQE broadcasts while they fit. The fact scan joins "
    "orders on the one natural-key shuffle; the supplier-nation "
    "attribute becomes a CASE flag BEFORE aggregation, so the share "
    "is a per-year two-measure hash aggregate. Both measures ride the fixed-point "
    "policy and divide once at the end (round 1e-6) — identical "
    "operand doubles on both engines.",
)
def q_agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    cn = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select("c_custkey")
    )
    sn = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("supp_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    l = _t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    base = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(
        F.col("supp_nation") == _Q8_NATION, F.col("volume")
    ).otherwise(F.lit(0))
    return (
        base.groupBy("o_year")
        .agg(
            (dsum(national) / dsum("volume")).alias("share_raw")
        )
        .select("o_year", F.round("share_raw", 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# A25: product-type profit by nation/year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

_Q9_NAME_FRAG = "red"
_Q9_COST_FRAC = 0.5  # unit-cost proxy: retail price x fraction


@register(
    "agg_product_profit",
    oracle="SELECT sn.n_name AS nation, "
    "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
    + sql_dsum(
        f"{_REVENUE} - {_Q9_COST_FRAC} * p.p_retailprice * l.l_quantity"
    )
    + " AS profit "
    "FROM lineitem l "
    "JOIN part p ON l.l_partkey = p.p_partkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
    f"WHERE p.p_name LIKE '%{_Q9_NAME_FRAG}%' "
    "GROUP BY 1, 2 ORDER BY 1, 2",
    doc="Product profit by supplier nation and year (A25, TPC-H Q9 "
    "shape): profit = revenue − cost for every lineitem of a part "
    "family (p_name LIKE '%red%'), rolled up by (supplier nation, "
    "order year). The schema has no partsupp, so unit cost is the "
    "retail-price proxy 0.5·p_retailprice — the access shape (fact "
    "× 4 dimensions with a measure mixing fact AND dimension "
    "columns) is Q9's exactly. Plan: the name-LIKE prunes part "
    "before it meets the fact (the one dimension whose attribute "
    "enters the MEASURE, not just a filter); supplier pre-joins the "
    "hinted 25-row nation broadcast; the part slice and the "
    "decorated supplier frame grow with SF, so their fact joins are "
    "AQE-owned (no hint); orders joins on the natural-key shuffle; the "
    "profit expression is a single fixed-point quantized term, so "
    "the (nation, year) hash aggregate is partial-aggregated "
    "map-side. ~25×7 output rows, deterministic total order.",
)
def q_agg_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{_Q9_NAME_FRAG}%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    l = _t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - F.lit(_Q9_COST_FRAC) * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(dsum(profit).alias("profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# O6: returned-item top customers (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

_Q10_START = "TIMESTAMP '1996-10-01 00:00:00'"
_Q10_END = "TIMESTAMP '1997-01-01 00:00:00'"
_Q10_TOPK = 20


@register(
    "topk_returned_customers",
    oracle="SELECT c.c_custkey, c.c_name, n.n_name AS nation, "
    f"{sql_dsum(_REVENUE)} AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    f"WHERE o.o_orderdate >= {_Q10_START} "
    f"AND o.o_orderdate < {_Q10_END} "
    "AND l.l_returnflag = 'R' "
    "GROUP BY 1, 2, 3 "
    f"ORDER BY revenue DESC, c_custkey LIMIT {_Q10_TOPK}",
    doc="Returned-item top customers (O6, TPC-H Q10 shape): which 20 "
    "customers generated the most returned revenue in a quarter — "
    "the churn-risk report. Plan: the quarter predicate prunes the "
    "orders scan and the returnflag predicate prunes lineitem "
    "(both reach parquet); the fact join is the one orderkey "
    "shuffle; the (custkey, name, nation) attributes join the "
    "customer⋈nation dimension AFTER the per-customer aggregate "
    "collapses the fact side (aggregate first, decorate later — "
    "decorating before the groupBy would drag two string columns "
    "through the shuffle). Only the 25-row nation frame carries a "
    "broadcast hint; customer GROWS with SF, so its decorate join "
    "is AQE-owned — broadcast while it fits, shuffle join beyond. Top-k is a TakeOrdered "
    "heap with the custkey tiebreak, never a global sort.",
)
def q_topk_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr(_Q10_START))
            & (F.col("o_orderdate") < F.expr(_Q10_END))
        )
        .select("o_orderkey", "o_custkey")
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(_rev()).alias("revenue"))
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "nation")
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "nation", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(_Q10_TOPK)
    )


# ---------------------------------------------------------------------------
# A26: delay-bucket priority counts (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

_Q12_START = "TIMESTAMP '1997-01-01 00:00:00'"
_Q12_END = "TIMESTAMP '1998-01-01 00:00:00'"
_Q12_SLOW_DAYS = 60
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "agg_shipmode_priority",
    oracle="SELECT CASE WHEN l.l_shipdate >= o.o_orderdate + "
    f"INTERVAL {_Q12_SLOW_DAYS} DAY THEN 'SLOW' ELSE 'FAST' END "
    "AS ship_bucket, "
    "CAST(sum(CASE WHEN o.o_orderpriority IN "
    f"{_Q12_HIGH} THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(sum(CASE WHEN o.o_orderpriority IN "
    f"{_Q12_HIGH} THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    f"WHERE l.l_shipdate >= {_Q12_START} AND l.l_shipdate < {_Q12_END} "
    "GROUP BY 1 ORDER BY 1",
    doc="Delay-bucket priority counts (A26, TPC-H Q12 shape): for "
    "lineitems shipped in 1997, how many belong to high-priority vs "
    "other orders, split by whether shipping was SLOW (≥60 days "
    "after order) or FAST — Q12's 'does cheap shipping delay "
    "critical orders' question with the ship delay itself standing "
    "in for the schema's missing l_shipmode. Plan: the ship-year "
    "predicate prunes the fact scan; ONE orderkey shuffle joins the "
    "priority attribute in; the bucket expression and both "
    "conditional counts are codegen'd case-sums in a 2-group hash "
    "aggregate — partial map-side, 2 rows out. The classic trap "
    "(join AFTER pre-aggregating per bucket) does not apply: the "
    "bucket needs o_orderdate, so the join must precede the "
    "aggregate; what keeps it cheap is projecting orders to "
    "(key, date, priority-flag) before the exchange.",
)
def q_agg_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr(_Q12_START))
            & (F.col("l_shipdate") < F.expr(_Q12_END))
        )
        .select("l_orderkey", "l_shipdate")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    bucket = F.when(
        F.col("l_shipdate")
        >= F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_SLOW_DAYS} DAY"),
        F.lit("SLOW"),
    ).otherwise(F.lit("FAST"))
    is_high = F.col("o_orderpriority").isin(list(_Q12_HIGH))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# A27: year-over-year revenue growth by customer nation
# ---------------------------------------------------------------------------


@register(
    "agg_yoy_growth",
    oracle="WITH rev AS (SELECT n.n_name AS nation, "
    "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
    f"{sql_dsum(_REVENUE)} AS revenue "
    "FROM lineitem l "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY 1, 2) "
    "SELECT nation, o_year, revenue, "
    "round(revenue / lag(revenue) OVER "
    "(PARTITION BY nation ORDER BY o_year) - 1, 6) AS yoy_growth "
    "FROM rev ORDER BY 1, 2",
    doc="Year-over-year revenue growth by customer nation (A27, the "
    "TPC-DS growth-report shape the TPC-H suite lacks): revenue per "
    "(nation, order year) with each year's growth ratio against the "
    "SAME nation's previous year — first years emit NULL growth "
    "(lag over an empty frame) identically on both engines.  Plan "
    "economics: the lag window runs over the AGGREGATED frame "
    "(#nations × #years rows — trivially partitioned by nation), "
    "never over the fact table; the fact side is one orderkey "
    "shuffle into the customer→nation attribute chain and a "
    "(nation, year) hash aggregate with map-side partials.  The "
    "growth ratio divides two fixed-point revenue doubles (the dsum "
    "policy: identical operands on both engines), round 1e-6; "
    "consecutive-year gaps are HONEST — lag is the previous "
    "OBSERVED year, the convention DuckDB and Spark share.",
)
def q_agg_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "nation")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    l = _t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(dsum(_rev()).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("o_year")
    return rev.select(
        "nation",
        "o_year",
        "revenue",
        F.round(
            F.col("revenue") / F.lag("revenue").over(w) - 1, 6
        ).alias("yoy_growth"),
    ).orderBy("nation", "o_year")


# ---------------------------------------------------------------------------
# S19: JSONL document ingest with declared schema + corrupt channel
# ---------------------------------------------------------------------------


@register(
    "src_jsonl_documents",
    oracle="SELECT lang, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(max(doc_id) AS BIGINT) AS max_doc_id, "
    "CAST(0 AS BIGINT) AS n_corrupt "
    "FROM documents GROUP BY 1",
    doc="JSONL document ingest (S19): the documents corpus "
    "round-trips through newline-delimited JSON — the interchange "
    "format every web-scale text pipeline actually lands (Common "
    "Crawl derivatives, chat logs, API exports) — written by the "
    "engine (JSON string escaping makes embedded newlines/quotes in "
    "text safe: every record stays one physical line, which is what "
    "keeps JSONL SPLITTABLE), read back with a DECLARED schema "
    "(never inferSchema: a 100 TB inference pass reads everything "
    "twice), PERMISSIVE mode, and a _corrupt_record channel so "
    "malformed lines land auditable instead of killing the job — "
    "the S18 CSV stance applied to the text-pipeline format. "
    "NULL-field round-trip is part of the grade: the writer DROPS "
    "null fields, the declared-schema reader restores them as "
    "NULLs, and the NULL-lang group must survive into the rollup "
    "identically on both engines (pinned by the NULL-injection "
    "sweep). Graded as per-lang counts + exact n_chars sums + max "
    "doc_id + the corrupt count (zero on a clean round-trip).",
)
def q_src_jsonl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{os.getpid()}"
    root = scratch_dir("ecs_jsonl", tag)
    shutil.rmtree(root, ignore_errors=True)

    d = _t(spark, sf_dir, "documents")
    d.write.mode("overwrite").json(root)
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(root)
    )
    agg = back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sum_chars"),
        F.max("doc_id").alias("max_doc_id"),
        F.count("_corrupt_record").alias("n_corrupt"),
    )
    # Pin the per-lang rollup (a handful of rows) in executor storage so
    # the corpus-sized JSONL staging dir can be removed NOW instead of
    # leaking one copy of the corpus per run (ADVICE r9) — the returned
    # frame no longer references files on disk, same stance as the BPE
    # staged-rounds cleanup (llm_retrieval.py).
    agg = agg.localCheckpoint()
    shutil.rmtree(root, ignore_errors=True)
    return agg


# ---------------------------------------------------------------------------
# A28: revenue-concentration Gini by customer nation
# ---------------------------------------------------------------------------


@register(
    "agg_revenue_concentration",
    oracle="WITH pc AS (SELECT c.c_nationkey, o.o_custkey, "
    "CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) "
    "* 10000.0 + 0.5) AS DECIMAL(25,0))) AS BIGINT) AS rev "
    "FROM lineitem l "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY 1, 2), "
    "d AS (SELECT n.n_name AS nation, pc.rev FROM pc "
    "JOIN nation n ON pc.c_nationkey = n.n_nationkey), "
    "r AS (SELECT nation, rev, CAST(row_number() OVER "
    "(PARTITION BY nation ORDER BY rev DESC, rev) AS BIGINT) AS rnk "
    "FROM d), "
    "g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_buyers, "
    "CAST(sum(rev) AS BIGINT) AS rev_total, "
    "sum(CAST(rnk AS DECIMAL(25,0)) * rev) AS s FROM r GROUP BY 1) "
    "SELECT nation, n_buyers, "
    "round(CAST(rev_total AS DOUBLE) / 10000.0, 4) AS revenue, "
    "CASE WHEN rev_total > 0 THEN "
    "round(CAST((n_buyers + 1) * CAST(rev_total AS DECIMAL(25,0)) "
    "- 2 * s AS DOUBLE) / "
    "CAST(CAST(n_buyers AS DECIMAL(25,0)) * rev_total AS DOUBLE), 6) "
    "END AS gini FROM g ORDER BY 1",
    doc="Revenue-concentration Gini by customer nation (A28): the "
    "Gini coefficient of per-customer revenue within each nation — "
    "the account-concentration number a sales org watches (a 0.9 "
    "Gini nation is three whale accounts wearing a market as a "
    "costume; churn risk is not diversified).  The CRM counterpart "
    "of E13's activity Gini: same closed form ((n+1)T − 2Σ rank·x)/"
    "(nT) on the DESC-ranked frame, but x here is MONEY — per-"
    "customer revenue as EXACT integer ten-thousandths (the dsum "
    "fixed-point policy applied at the unit level, so the Gini's "
    "integer protocol survives the currency domain), and the rank "
    "tiebreak needs no id column because tied integer revenues "
    "contribute x·Σi regardless of internal order.  Zero-revenue "
    "nations guard the division with NULL on both engines.  "
    "Distributed shape: the fact side collapses per (nation-key, "
    "customer) on one orderkey→custkey shuffle chain BEFORE any "
    "decoration (the Q10 aggregate-first stance), the 25-row nation "
    "frame broadcasts by hint, and the per-nation rank rides the "
    "two-pass quantile-bucketed prefix-sum — no data-sized single-"
    "partition stage at any corpus size.",
)
def q_agg_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: F401 (helper imports)

    from .llm_curate import _cumsum_from_buckets
    from .relational import quantile_bucketed

    l = _t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    unit = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 10000.0
        + 0.5
    ).cast("decimal(25,0)")
    pc = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(unit).cast("long").alias("rev"))
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    d = pc.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("nation", "rev")
    bucketed = quantile_bucketed(d, "rev", nb=32)
    ranked = _cumsum_from_buckets(
        bucketed,
        ["nation"],
        [F.col("rev").desc(), F.col("rev")],
        F.lit(1),
        "rnk",
    )
    g = ranked.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum(F.col("rev").cast("decimal(25,0)")).alias("_t"),
        F.sum(F.col("rnk").cast("decimal(25,0)") * F.col("rev")).alias(
            "_s"
        ),
    )
    num = (
        (F.col("n_buyers") + 1).cast("decimal(25,0)") * F.col("_t")
        - 2 * F.col("_s")
    )
    den = F.col("n_buyers").cast("decimal(25,0)") * F.col("_t")
    return g.select(
        "nation",
        "n_buyers",
        F.round(F.col("_t").cast("double") / 10000.0, 4).alias("revenue"),
        F.when(
            F.col("_t") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    ).orderBy("nation")

"""Relational surface, wave 8 (r8 completion): the four remaining
classic decision-support shapes — Q19 (disjunctive OR-of-conjunctions
revenue), Q2 (region-scoped min-cost supplier, the correlated-MIN
argmin), Q16 (supplier-count distribution with an exclusion anti-join),
and Q20 (the nested-semi-join promotable-excess chain).  With these the
§2 inventory covers every TPC-H access shape the corpus can express:
Q1/Q3/Q5/Q6/Q13/Q14/Q15/Q17/Q18/Q21/Q22/Q11 landed in earlier waves.

Each is DECORRELATED by construction (the correlated subquery is a join
in disguise — expressed as an explicit per-key aggregate it shuffles
once), dimensions broadcast, and derived disjunct-union bounds are
pushed to the scans by hand where Catalyst will not infer them across
OR branches.

These extend the reference's order-verification analytics
(/root/reference/src/order_processor/check_db.py:33-43) to the
catalog/supplier questions the same star schema answers.

Cross-engine policy: money reductions ride the dsum fixed-point policy;
unit costs and quantity sums are exact integer ten-thousandths
(BIGINT), so min/threshold comparisons are engine-exact; correlated
thresholds compare via integer cross-multiplication (2·a > b), never a
float ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, quant, sql_dsum, sql_quant
from ..registry import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A21: disjunctive-predicate revenue (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

# (brand, max_size, qty_lo, qty_hi) — three OR branches, each a
# conjunction over part attributes AND a lineitem measure.
_Q19_BRANCHES = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#24", 15, 20, 30),
)


def _q19_sql_pred() -> str:
    parts = [
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {ms} "
        f"AND l.l_quantity BETWEEN {lo} AND {hi})"
        for (b, ms, lo, hi) in _Q19_BRANCHES
    ]
    return " OR ".join(parts)


@register(
    "agg_disjunctive_revenue",
    oracle="SELECT "
    f"round({sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 4) "
    "AS revenue, CAST(count(*) AS BIGINT) AS n_items "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    f"WHERE {_q19_sql_pred()}",
    doc="Disjunctive-predicate revenue (A21, TPC-H Q19 shape): revenue "
    "from lineitems matching ANY of three (brand, size-range, "
    "quantity-range) conjunctions — the OR-of-conjunctions predicate "
    "that defeats naive pushdown: no single branch's conjunct holds "
    "for every row, so a scan cannot push the branches themselves. "
    "The scalable move is pushing the UNION BOUNDS of the branches as "
    "redundant conjuncts — Catalyst does not infer these across OR "
    "branches, so the engine adds them by hand: the part scan "
    "pre-filters to brand IN (the three brands) AND size <= 15 "
    "(dimension pruned BEFORE the broadcast), and the lineitem scan "
    "pre-filters to quantity in [1, 30] (pushed to parquet row-group "
    "stats — at 100 TB that skips the bulk of the fact scan). The "
    "exact disjunction then evaluates scan-local after a broadcast "
    "join on the pruned dimension; one 1-row aggregate, no shuffle "
    "of fact rows at all. The oracle states the raw disjunction only "
    "— the bounds are derived, so both forms are equivalent by "
    "construction.",
)
def q_agg_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    brands = [b for (b, _, _, _) in _Q19_BRANCHES]
    max_size = max(ms for (_, ms, _, _) in _Q19_BRANCHES)
    qty_lo = min(lo for (_, _, lo, _) in _Q19_BRANCHES)
    qty_hi = max(hi for (_, _, _, hi) in _Q19_BRANCHES)

    p = (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin(brands)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= max_size)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
        )
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    branch = None
    for b, ms, lo, hi in _Q19_BRANCHES:
        c = (
            (F.col("p_brand") == b)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= ms)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        branch = c if branch is None else (branch | c)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.round(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J13: region-scoped min-cost supplier (TPC-H Q2 shape)
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10
_Q2_TOPK = 100


@register(
    "join_min_cost_supplier",
    oracle="WITH cost AS (SELECT l_partkey, l_suppkey, "
    "CAST(min(CAST(floor(l_extendedprice / l_quantity * 10000.0 + 0.5) "
    "AS BIGINT)) AS BIGINT) AS ucost_units FROM lineitem GROUP BY 1, 2), "
    "scoped AS (SELECT c.*, s.s_name, s.s_acctbal, n.n_name "
    "FROM cost c JOIN supplier s ON c.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    f"JOIN region r ON n.n_regionkey = r.r_regionkey "
    f"AND r.r_name = '{_Q2_REGION}'), "
    "tgt AS (SELECT p_partkey FROM part "
    f"WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}), "
    "mn AS (SELECT l_partkey, min(ucost_units) AS m FROM scoped "
    "JOIN tgt ON l_partkey = p_partkey GROUP BY 1) "
    "SELECT s.s_acctbal, s.s_name, s.n_name, s.l_partkey AS p_partkey, "
    "round(s.ucost_units / 10000.0, 4) AS unit_cost "
    "FROM scoped s JOIN mn ON s.l_partkey = mn.l_partkey "
    "AND s.ucost_units = mn.m "
    f"ORDER BY s.s_acctbal DESC, s.s_name, p_partkey LIMIT {_Q2_TOPK}",
    doc="Region-scoped min-cost supplier (J13, TPC-H Q2 shape): for "
    "each target part, the European supplier(s) quoting the MINIMUM "
    "unit cost — Q2's correlated 'ps_supplycost = (SELECT min...)' "
    "subquery, DECORRELATED into an explicit per-part MIN joined "
    "back on (partkey, cost = min). The part-supplier cost relation "
    "derives from lineitem (this corpus carries no partsupp): unit "
    "cost = min observed extendedprice/quantity per (part, supplier) "
    "— quantized to exact integer ten-thousandths with the SAME "
    "expression tree on both engines, so the min and the equality "
    "join-back are engine-exact (Q2's min-equality is float-fragile "
    "done naively, same trap as Q15's max). Plan: ONE lineitem "
    "shuffle on its natural (partkey, suppkey) key collapses the "
    "cost relation; supplier⋈nation⋈region is a broadcast dim chain "
    "pruning to the region BEFORE the per-part min; the target-part "
    "dimension broadcasts; the scoped cost frame — DIMENSION-bounded "
    "at target-parts x regional-suppliers — is localCheckpoint-pinned "
    "because it feeds both the per-part min and the join-back "
    "(unpinned, each consumer re-runs the fact aggregate: 2 lineitem "
    "scans observed); the min frame and the join-back both key "
    "on partkey (AQE may broadcast the per-part min — it is "
    "target-parts-sized). Ties all surface (every supplier at the "
    "min), ranked by (acctbal DESC, name, partkey) — a total "
    "deterministic order — under a TakeOrdered heap.",
)
def q_join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 10000.0
                + 0.5
            ).cast("long")
        ).alias("ucost_units")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    tgt = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
        )
        .select("p_partkey")
    )
    # Pinned: the scoped cost frame feeds both the per-part min and the
    # join-back — unpinned, each consumer re-runs the full lineitem
    # (partkey, suppkey) aggregate (2 fact scans + 2 agg exchanges
    # observed); the frame itself is DIMENSION-bounded (target parts x
    # regional suppliers), so the checkpoint is trivially small.
    scoped = (
        cost.join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(tgt), cost.l_partkey == tgt.p_partkey)
        .localCheckpoint()
    )
    mn = (
        scoped.groupBy("l_partkey")
        .agg(F.min("ucost_units").alias("m"))
        .select(F.col("l_partkey").alias("mn_partkey"), "m")
    )
    return (
        scoped.join(
            # Explicit broadcast: mn is bounded by the target-part
            # dimension, but it hangs off a localCheckpoint whose size
            # stats are unknown to the planner — left to AQE it falls
            # back to a sort-merge join of two dimension-sized frames.
            F.broadcast(mn),
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("ucost_units") == F.col("m")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("ucost_units") / 10000.0, 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(_Q2_TOPK)
    )


# ---------------------------------------------------------------------------
# A22: supplier-count distribution with exclusion (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#5"
_Q16_EXCL_TYPE = "PROMO"
_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


@register(
    "agg_supplier_part_counts",
    oracle="WITH psl AS (SELECT DISTINCT l_partkey, l_suppkey "
    "FROM lineitem), "
    "ok AS (SELECT psl.* FROM psl WHERE NOT EXISTS "
    "(SELECT 1 FROM supplier s WHERE s.s_acctbal < 0 "
    "AND s.s_suppkey = psl.l_suppkey)) "
    "SELECT p.p_brand, p.p_type, p.p_size, "
    "CAST(count(DISTINCT ok.l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM ok JOIN part p ON ok.l_partkey = p.p_partkey "
    f"WHERE p.p_brand <> '{_Q16_EXCL_BRAND}' "
    f"AND p.p_type <> '{_Q16_EXCL_TYPE}' "
    f"AND p.p_size IN {_Q16_SIZES} "
    "GROUP BY 1, 2, 3 "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
    doc="Supplier-count distribution with exclusion (A22, TPC-H Q16 "
    "shape): how many DISTINCT suppliers can provide parts of each "
    "qualifying (brand, type, size), excluding suppliers in arrears "
    "(negative balance — standing in for Q16's complaint predicate; "
    "the part-supplier relation again derives from lineitem, no "
    "partsupp here). The exclusion subquery is the anti-join trap: "
    "done as a per-row probe it rescans suppliers; done right it "
    "is ONE left-anti against the filtered supplier keys — "
    "handful-sized, broadcast. The oracle spells it NOT EXISTS "
    "(not NOT IN) so both engines pin identical NULL-key semantics "
    "(ADVICE.md r8: NOT IN excludes NULL-key probe rows, anti-join "
    "keeps them), so the exclusion costs a scan-local "
    "hash probe. Plan: lineitem collapses to distinct (partkey, "
    "suppkey) on its natural key (one shuffle, map-side partial "
    "distinct), the exclusion anti-join and the pruned part "
    "dimension (brand/type/size predicates pushed to the part scan) "
    "both broadcast, and the final distinct-count groups by the "
    "attr triple — Spark's two-phase distinct aggregate, partial on "
    "the map side. Deterministic total order (cnt DESC, then the "
    "full attr triple).",
)
def q_agg_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    psl = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ok = psl.join(
        F.broadcast(bad), psl.l_suppkey == bad.s_suppkey, "left_anti"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != _Q16_EXCL_BRAND)
            & (F.col("p_type") != _Q16_EXCL_TYPE)
            & F.col("p_size").isin(list(_Q16_SIZES))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ok.join(F.broadcast(p), ok.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# J14: promotable-excess suppliers (TPC-H Q20 shape)
# ---------------------------------------------------------------------------

_Q20_NAME_PREFIX = "small"
_Q20_REGION = "ASIA"
_Q20_YEAR_START = "DATE '1996-01-01'"
_Q20_YEAR_END = "DATE '1997-01-01'"


@register(
    "join_promotable_suppliers",
    oracle="WITH tgt AS (SELECT p_partkey FROM part "
    f"WHERE p_name LIKE '{_Q20_NAME_PREFIX}%'), "
    "g AS (SELECT l_partkey, l_suppkey, "
    f"CAST(SUM({sql_quant('l_quantity')}) AS BIGINT) AS supp_units, "
    "CAST(SUM(CASE WHEN l_shipdate >= "
    f"{_Q20_YEAR_START} AND l_shipdate < {_Q20_YEAR_END} "
    f"THEN {sql_quant('l_quantity')} ELSE 0 END) AS BIGINT) AS y_units "
    "FROM lineitem JOIN tgt ON l_partkey = p_partkey GROUP BY 1, 2), "
    "yq AS (SELECT l_partkey, CAST(sum(y_units) AS BIGINT) AS year_units "
    "FROM g GROUP BY 1), "
    "qual AS (SELECT DISTINCT g.l_suppkey FROM g "
    "JOIN yq ON g.l_partkey = yq.l_partkey "
    "WHERE 2 * g.supp_units > yq.year_units) "
    "SELECT s.s_suppkey, s.s_name, n.n_name "
    "FROM qual q JOIN supplier s ON q.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    f"AND r.r_name = '{_Q20_REGION}' "
    "ORDER BY s_suppkey",
    doc="Promotable-excess suppliers (J14, TPC-H Q20 shape): Asian "
    "suppliers holding an excess position in a promotable part — "
    "their ALL-TIME shipped quantity of a 'small…' part exceeds half "
    "that part's one-year total demand (standing in for Q20's "
    "ps_availqty > 0.5·year-demand; availability derives from "
    "shipment history, no partsupp). Q20 is the nested-semi-join "
    "query — supplier IN (… part IN (…) AND qty > correlated "
    "half-demand) — DECORRELATED twice: the correlated year-demand "
    "subquery becomes a per-part aggregate, and the IN chains become "
    "one join + distinct collapse. Plan: the target-part dimension "
    "(name-prefix pushed to the part scan) broadcasts and prunes "
    "lineitem BEFORE its only shuffle; ONE pass collapses to per-"
    "(part, supplier) rows carrying BOTH the all-time and the "
    "conditional in-year quantity (exact integer units — no second "
    "lineitem scan for the year leg); the per-part year total is a "
    "window over the partkey re-exchange of that collapsed slim "
    "frame; the threshold is integer cross-multiplication "
    "(2·supp > year, never a float ratio — boundary suppliers "
    "qualify identically on any engine); qualifying suppliers "
    "collapse to distinct keys and join the broadcast "
    "supplier⋈nation⋈region chain. Deterministic order by supplier "
    "key.",
)
def q_join_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tgt = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_year = (F.col("l_shipdate") >= F.expr(_Q20_YEAR_START)) & (
        F.col("l_shipdate") < F.expr(_Q20_YEAR_END)
    )
    g = (
        li.join(F.broadcast(tgt), li.l_partkey == tgt.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(quant("l_quantity")).cast("long").alias("supp_units"),
            F.sum(
                F.when(in_year, quant("l_quantity")).otherwise(
                    F.lit(0).cast("decimal(25,0)")
                )
            )
            .cast("long")
            .alias("y_units"),
        )
    )
    wo = Window.partitionBy("l_partkey")
    qual = (
        g.withColumn("year_units", F.sum("y_units").over(wo))
        .filter(2 * F.col("supp_units") > F.col("year_units"))
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q20_REGION)
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        qual.join(F.broadcast(s), qual.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )

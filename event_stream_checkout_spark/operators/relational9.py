"""Relational surface, wave 10: the two classic decision-support
shapes relational7/8 left on the table — Q3 (shipping-priority top-k
over the customer→orders→lineitem chain) and Q5 (local-supplier
volume, the nation-equality join between the customer and supplier
legs).  With these the driver star schema has a graded key for every
TPC-H access pattern it can express.

Like relational8, these extend the reference's order-verification
analytics (/root/reference/src/order_processor/check_db.py:33-43) to
the revenue questions the same star schema answers.

Cross-engine policy (unchanged): money reductions ride the dsum
fixed-point policy (functions/numeric.py); top-k orders sort on the
EXACT integer quantized sum with a unique-key tiebreak, never on the
rescaled double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import quant, sql_quant
from ..registry import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


_REVENUE = "l.l_extendedprice * (1 - l.l_discount)"


# ---------------------------------------------------------------------------
# J16: shipping-priority top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "TIMESTAMP '1998-06-01 00:00:00'"


@register(
    "join_shipping_priority",
    oracle="SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority, "
    f"round(CAST(sum({sql_quant(_REVENUE)}) AS DOUBLE) / 10000.0, 4) "
    "AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    f"WHERE c.c_mktsegment = '{_Q3_SEGMENT}' "
    f"AND o.o_orderdate < {_Q3_DATE} AND l.l_shipdate > {_Q3_DATE} "
    "GROUP BY 1, 2, 3 "
    f"ORDER BY sum({sql_quant(_REVENUE)}) DESC, l.l_orderkey LIMIT 10",
    doc="Shipping-priority top-k (J16, TPC-H Q3 shape): the 10 "
    "highest-revenue orders from one market segment that were placed "
    "before the anchor date but still have lines shipping after it — "
    "the unshipped-backlog triage query.  Plan: both date predicates "
    "push to the parquet scans (orders and lineitem each arrive "
    "pre-pruned); the segment predicate prunes customer to ~1/5 "
    "before its join — customer GROWS with SF so the join carries no "
    "broadcast hint (AQE owns the strategy, degrading to shuffle "
    "when the segment leg outgrows the threshold); the only "
    "guaranteed shuffle is lineitem→orders on the natural orderkey. "
    "The top-k orders on the EXACT quantized integer revenue with "
    "the orderkey tiebreak (TakeOrderedAndProject — no global sort "
    "materializes), and only the final projection rescales to "
    "double.",
)
def q_join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.expr(_Q3_DATE))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.expr(_Q3_DATE))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(quant(_rev())).alias("_rq"))
        .orderBy(F.col("_rq").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("_rq").cast("double") / 10000.0, 4).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A29: local-supplier volume (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_START = "TIMESTAMP '1996-01-01 00:00:00'"
_Q5_END = "TIMESTAMP '1997-01-01 00:00:00'"


@register(
    "agg_local_supplier_volume",
    oracle="SELECT n.n_name, "
    f"round(CAST(sum({sql_quant(_REVENUE)}) AS DOUBLE) / 10000.0, 4) "
    "AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    f"WHERE r.r_name = '{_Q5_REGION}' "
    f"AND o.o_orderdate >= {_Q5_START} AND o.o_orderdate < {_Q5_END} "
    "GROUP BY 1 "
    f"ORDER BY sum({sql_quant(_REVENUE)}) DESC, n.n_name",
    doc="Local-supplier volume (A29, TPC-H Q5 shape): revenue per "
    "nation in one region and year, counting ONLY lines where the "
    "supplier and the ordering customer share the nation — the "
    "domestic-fulfilment slice, and the one classic shape whose join "
    "graph is cyclic (the c_nationkey = s_nationkey edge closes the "
    "customer and supplier legs into a cycle Catalyst must plan "
    "around).  Plan: region→nation is a 2-level bounded-dim chain "
    "(broadcast hinted, ≤25 rows at any SF) that prunes supplier to "
    "the region's nations BEFORE the fact joins; the year predicate "
    "pushes to the orders scan; orders⋈customer shuffles on custkey, "
    "then lineitem joins on the natural orderkey and the supplier "
    "probe carries the nation-equality edge as part of its join "
    "condition — the cycle resolves as a join predicate, never a "
    "post-join filter over the cross product.  Supplier and the "
    "segment-pruned customer GROW with SF, so their joins carry no "
    "hint (AQE owns them).  25-row output, deterministic order on "
    "the exact integer revenue.",
)
def q_agg_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q5_REGION)
        .select("r_regionkey")
    )
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr(_Q5_START))
            & (F.col("o_orderdate") < F.expr(_Q5_END))
        )
        .select("o_orderkey", "o_custkey")
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(quant(_rev())).alias("_rq"))
        .orderBy(F.col("_rq").desc(), F.col("n_name"))
        .select(
            "n_name",
            F.round(F.col("_rq").cast("double") / 10000.0, 4).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# G2: connected components over the support-capped co-purchase graph
# ---------------------------------------------------------------------------

_COPURCHASE_MIN_SUP = 2  # edge = parts co-purchased in >= 2 orders
_COPURCHASE_BASKET_CAP = 32  # skew guard (r12, the V15/A19 stance): an
                             # order with more distinct parts is a feed
                             # anomaly (TPC-H fan is <= 7), not a
                             # C(n,2) pair-expansion license — one
                             # degenerate 100k-item basket at 100 TB
                             # would emit ~5e9 pair rows unguarded


def copurchase_gate(pp0: DataFrame) -> DataFrame:
    """The basket gate alone: distinct (l_orderkey, l_partkey) rows of
    baskets within 2..CAP.  Split out of ``copurchase_edges`` (r13) so
    X72's CF can compute BOTH the gated per-item counts and the pair
    list from ONE pinned gated frame instead of re-running the gate
    per consumer."""
    ok = (
        pp0.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n").between(2, _COPURCHASE_BASKET_CAP))
        .select("l_orderkey")
    )
    # Gate BEFORE pair expansion: a basket outside 2..CAP never reaches
    # the self-join (1-part orders emit no pairs anyway; oversized
    # baskets are feed anomalies for V1-class gates, not a C(n,2)
    # license).
    return pp0.join(ok, "l_orderkey", "semi")


def copurchase_pairs(pp: DataFrame) -> DataFrame:
    """Pair expansion + support cap over an ALREADY-gated pp frame
    (the second half of ``copurchase_edges``)."""
    a, b = pp.alias("a"), pp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= _COPURCHASE_MIN_SUP)
    )


def copurchase_edges(pp0: DataFrame) -> DataFrame:
    """Support-capped co-purchase edge list over a distinct
    ``(l_orderkey, l_partkey)`` frame.

    Factored out of the registered query (the jaccard_pairs pattern)
    so property tests can drive it with an adversarial corpus: the
    BETWEEN-2-AND-CAP basket gate semi-joins the pair leg BEFORE the
    self-join, so one degenerate basket must contribute zero join
    INPUT rows — never a C(n,2) pair block (r12, the r11 verdict's
    robustness note on G2).

    NULL keys dropped up front, matching ``basket_copurchase_pairs``
    (ADVICE r15 item 1): without the filter the gate's count(*) sees
    NULL-part rows the pair self-join then drops, so the two builders
    would diverge at the 2..CAP boundary on dirty data — the
    byte-identity contract between them is pinned by
    tests/test_wave12.py on a null-key corpus."""
    return copurchase_pairs(
        copurchase_gate(
            pp0.filter(
                F.col("l_orderkey").isNotNull()
                & F.col("l_partkey").isNotNull()
            )
        )
    )



@register(
    "graph_copurchase_components",
    oracle="WITH RECURSIVE "
    # NULL-key exclusion mirrors _COPURCHASE_GATE_SQL (ADVICE r15
    # item 1) — this oracle inlines the gate because WITH RECURSIVE
    # needs its own CTE chain.
    "pp0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), "
    "ok AS (SELECT l_orderkey FROM pp0 GROUP BY 1 "
    f"HAVING count(*) BETWEEN 2 AND {_COPURCHASE_BASKET_CAP}), "
    "pp AS (SELECT pp0.* FROM pp0 JOIN ok USING (l_orderkey)), "
    "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
    "CAST(count(*) AS BIGINT) AS sup "
    "FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey "
    "AND a.l_partkey < b.l_partkey "
    f"GROUP BY 1, 2 HAVING count(*) >= {_COPURCHASE_MIN_SUP}), "
    "e2 AS (SELECT pa AS a, pb AS b FROM e "
    "UNION ALL SELECT pb, pa FROM e), "
    "nodes AS (SELECT DISTINCT a AS n FROM e2), "
    "cc(n, l) AS (SELECT n, n FROM nodes "
    "UNION SELECT e2.b, cc.l FROM cc JOIN e2 ON cc.n = e2.a), "
    "lab AS (SELECT n, min(l) AS label FROM cc GROUP BY 1), "
    "comp AS (SELECT label AS component, CAST(count(*) AS BIGINT) "
    "AS n_parts FROM lab GROUP BY 1), "
    "ce AS (SELECT lab.label AS component, CAST(count(*) AS BIGINT) "
    "AS n_edges FROM e JOIN lab ON e.pa = lab.n GROUP BY 1) "
    "SELECT comp.component, comp.n_parts, ce.n_edges "
    "FROM comp JOIN ce ON comp.component = ce.component "
    "ORDER BY comp.n_parts DESC, comp.component",
    doc="Connected components over the co-purchase graph (G2): parts "
    "co-purchased in ≥ 2 orders form edges (the A19 support "
    "threshold — below it the graph is one giant hairball of "
    "coincidences); components are the substitutable/bundled product "
    "families merchandising and recommendation backfills key on.  "
    "Engine: the X6 O(log diameter) machinery — min-label "
    "propagation with path halving to FIXPOINT (_connected_"
    "components; a 1000-link chain resolves in ~10 edge joins).  The "
    "oracle walks the same graph with WITH RECURSIVE min-label "
    "closure — a genuinely different algorithm (transitive closure "
    "then min), so agreement checks the COMPONENT STRUCTURE, not a "
    "shared implementation.  Scale: a BETWEEN-2-AND-32 basket gate "
    "semi-joins the pair leg BEFORE the self-join (r12, closing the "
    "r11 verdict's robustness note: previously one degenerate "
    "100k-item order would have formed its ~5e9-row quadratic block "
    "— now it contributes zero join input, the V15/A19 bounded-fan "
    "stance; TPC-H fan is ≤ 7, so driver results are unchanged, and "
    "the oracle carries the same gate), the edge list is "
    "support-capped and order-local, propagation shuffles slim "
    "(node, label) rows, and rounds are logarithmic in component "
    "diameter — with a fail-loud fixpoint guard instead of silent "
    "partial labels if the round cap is ever hit.",
)
def q_graph_copurchase_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .llm_advanced import _connected_components

    # Edge list via the basket-local shape (r15: one corpus-scale
    # exchange replaces distinct + gate shuffles + the pair self-join
    # — see basket_copurchase_pairs; byte-identical edges).
    pp0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    e = basket_copurchase_pairs(pp0).localCheckpoint()
    edges = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    # pin_edges stays True (r16 A/B): the edge union IS two narrow
    # selects over the pinned pair frame, but every fixpoint round
    # re-reads it — measured at sf0.1, re-deriving per round cost
    # ~1 s MORE than the one-time materialization it saves (5.4 s
    # pinned vs 6.4 s unpinned, matched calibration).
    labels = _connected_components(edges)
    comp = labels.groupBy(F.col("label").alias("component")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    ce = (
        e.join(labels, e.pa == labels.doc_id)
        .groupBy(F.col("label").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        comp.join(ce, "component")
        .select("component", "n_parts", "n_edges")
        .orderBy(F.col("n_parts").desc(), "component")
    )


# ---------------------------------------------------------------------------
# G3: triangle census over the co-purchase graph (r12)
# ---------------------------------------------------------------------------

_COPURCHASE_GATE_SQL = (
    # NULL keys excluded EXPLICITLY (ADVICE r15 item 1): the engine
    # filters them up front (basket_copurchase_pairs), and without
    # this WHERE the oracle's HAVING count(*) would count a NULL-part
    # row, shifting the 2..CAP gate at the boundary on dirty data.
    "pp0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), "
    "ok AS (SELECT l_orderkey FROM pp0 GROUP BY 1 "
    "HAVING count(*) BETWEEN 2 AND 32), "
    "pp AS (SELECT pp0.* FROM pp0 JOIN ok USING (l_orderkey)), "
    "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
    "CAST(count(*) AS BIGINT) AS sup "
    "FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey "
    "AND a.l_partkey < b.l_partkey "
    "GROUP BY 1, 2 HAVING count(*) >= 2)"
)


def edge_degrees(e: DataFrame) -> DataFrame:
    """Pinned (n, d) degree frame of a (pa, pb) edge list.  Node-
    dimension rows — the bounded-frame checkpoint stance.  Shared by
    the triangle enumeration and its callers so the union+aggregate
    over the edge frame runs ONCE per query instead of once per
    consumer (r13 code-review find: census and G4 each rebuilt it
    beside _closed_triangles' internal copy)."""
    und = e.select(F.col("pa").alias("n")).unionAll(
        e.select(F.col("pb").alias("n"))
    )
    return (
        und.groupBy("n").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    )


def _closed_triangles(e: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """One (u, v, w) row per triangle of a pinned (pa, pb) edge frame
    (pa < pb, one row per undirected edge), enumerated exactly once
    from its minimum-(degree, id) corner — the Schank-Wagner forward
    orientation shared by the G3 census and G4's per-node clustering
    coefficients (which need the corner IDENTITIES, not just the
    count).  The caller is expected to have localCheckpoint'ed ``e``
    and may pass its own pinned ``edge_degrees`` frame to avoid a
    duplicate aggregate."""
    if deg is None:
        deg = edge_degrees(e)
    # Orient each undirected edge from the lower (degree, id) endpoint.
    da = deg.select(F.col("n").alias("pa"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("pb"), F.col("d").alias("_db"))
    ed = e.join(da, "pa").join(db, "pb")
    ord_a = F.struct(
        F.col("_da").alias("d"), F.col("pa").alias("node")
    )
    ord_b = F.struct(
        F.col("_db").alias("d"), F.col("pb").alias("node")
    )
    a_first = ord_a < ord_b
    oriented = ed.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(a_first, ord_b).otherwise(ord_a).alias("_dord"),
    ).localCheckpoint()
    # Wedges rooted at the minimum-order vertex: out-neighbor pairs
    # (v, w) with ord(v) < ord(w); the triangle closes iff the oriented
    # edge v->w exists (orientation is a total order, so the closing
    # edge can only point that way).
    o1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col("_dord").alias("_ov"),
    )
    o2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"),
        F.col("_dord").alias("_ow"),
    )
    wedges = o1.join(o2, "u").filter(F.col("_ov") < F.col("_ow"))
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    return wedges.join(closing, ["v", "w"]).select("u", "v", "w")


def triangle_census(e: DataFrame) -> DataFrame:
    """Degree-ordered triangle census over a pinned (pa, pb) edge
    frame (pa < pb, one row per undirected edge).  Factored out of the
    registered query so property tests can drive it with a known graph
    (the copurchase_edges pattern); the enumeration itself lives in
    ``_closed_triangles`` (shared with G4's per-node coefficients)."""
    deg = edge_degrees(e)
    tri = _closed_triangles(e, deg).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("global_clustering"),
        )
    )



@register(
    "graph_copurchase_triangles",
    oracle="WITH " + _COPURCHASE_GATE_SQL + ", "
    "und AS (SELECT pa AS a, pb AS b FROM e "
    "UNION ALL SELECT pb, pa FROM e), "
    "deg AS (SELECT a AS n, CAST(count(*) AS BIGINT) AS d FROM und "
    "GROUP BY 1), "
    "tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM e ab "
    "JOIN e bc ON ab.pb = bc.pa "
    "JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb), "
    "wed AS (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) "
    "AS w FROM deg) "
    "SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes, "
    "CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges, "
    "tri.t AS n_triangles, wed.w AS n_wedges, "
    "CASE WHEN wed.w > 0 THEN round(3.0 * tri.t / wed.w, 6) "
    "ELSE 0.0 END AS global_clustering "
    "FROM tri, wed",
    doc="Triangle census over the co-purchase graph (G3, r12): count "
    "of part triples that are pairwise co-purchased (each pair in "
    "≥ 2 orders) plus the open-wedge count and the global clustering "
    "coefficient 3T/W — the graph-density diagnostic that separates "
    "a catalog of tight product bundles (high clustering) from "
    "hub-and-spoke accessory graphs (low), and the standard next "
    "question after G2's component census.  Engine: DEGREE-ORDERED "
    "orientation (each undirected edge points from its lower- "
    "(degree, id) endpoint), so every triangle is enumerated exactly "
    "once from its minimum-order vertex and a hot node of degree d "
    "contributes pairs only among its HIGHER-ordered neighbors — the "
    "classic O(m^1.5) bound (Schank-Wagner forward algorithm) "
    "instead of the O(sum d^2) a naive wedge join pays on skewed "
    "degree distributions.  The oracle counts the same triangles by "
    "plain id-ordered closure (ab ⋈ bc ⋈ ac on pa < pb) — a "
    "different enumeration order, so agreement checks the triangle "
    "SET, not a shared traversal.  Scale: rides the G2 edge list "
    "(basket-gated + support-capped, pinned once); the wedge join "
    "shuffles on node keys; wedge COUNT comes from the degree frame "
    "(sum C(d,2)), never from materialized wedges.",
)
def q_graph_copurchase_triangles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Basket-local edge build (see basket_copurchase_pairs, r15).
    pp0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    e = basket_copurchase_pairs(pp0).select("pa", "pb").localCheckpoint()
    return triangle_census(e)


# ---------------------------------------------------------------------------
# G4: per-node local clustering coefficients (r13)
# ---------------------------------------------------------------------------


@register(
    "graph_copurchase_local_clustering",
    oracle="WITH " + _COPURCHASE_GATE_SQL + ", "
    "tri AS (SELECT ab.pa AS a, ab.pb AS b, ac.pb AS c FROM e ab "
    "JOIN e bc ON ab.pb = bc.pa "
    "JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb), "
    "corners AS (SELECT a AS n FROM tri UNION ALL "
    "SELECT b FROM tri UNION ALL SELECT c FROM tri), "
    "tc AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM corners "
    "GROUP BY 1), "
    "und AS (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e), "
    "deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM und "
    "GROUP BY 1) "
    "SELECT deg.n AS node, deg.d AS degree, "
    "CAST(coalesce(tc.t, 0) AS BIGINT) AS n_triangles, "
    "round(2.0 * coalesce(tc.t, 0) / (deg.d * (deg.d - 1)), 6) "
    "AS local_clustering "
    "FROM deg LEFT JOIN tc ON deg.n = tc.n WHERE deg.d >= 2 "
    "ORDER BY local_clustering DESC, degree DESC, node LIMIT 20",
    doc="Per-node local clustering coefficients over the co-purchase "
    "graph (G4, r13): for each part with >= 2 co-purchase neighbors, "
    "the fraction of its neighbor PAIRS that are themselves "
    "co-purchased — 2t/(d(d-1)) — top 20 by coefficient (degree, "
    "node tiebreaks make the cut total).  This is the per-item form "
    "of G3's global census: a coefficient near 1 marks a part whose "
    "neighborhood is a closed bundle (accessories always bought as a "
    "kit — substitution candidates), near 0 a hub whose neighbors "
    "have nothing to do with each other.  Engine: the census's "
    "Schank-Wagner enumeration (_closed_triangles — each triangle "
    "once from its minimum-(degree,id) corner, O(m^1.5) wedge work) "
    "with the corner IDENTITIES kept: explode each (u,v,w) into its "
    "three corners, count per node, left-join onto the degree frame "
    "(zero-triangle nodes report coefficient 0 instead of "
    "disappearing).  The oracle enumerates by plain id-ordered "
    "closure and unnests corners — a different traversal, so "
    "agreement checks per-node triangle INCIDENCE, not a shared "
    "algorithm.  Scale: rides the G2 basket-gated support-capped "
    "edge list; corners are 3 rows per triangle (output-bounded); "
    "the final top-20 is a TakeOrdered over the node frame, no "
    "global sort.",
)
def q_graph_copurchase_local_clustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Basket-local edge build (see basket_copurchase_pairs, r15).
    pp0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    e = basket_copurchase_pairs(pp0).select("pa", "pb").localCheckpoint()
    deg = edge_degrees(e)  # shared with the enumeration below
    # Pinned: the corner union reads the triangle frame THREE times —
    # unpinned, the whole wedge+closure join would execute 3x (the
    # r13 first-cut plan measured exactly that: 18.8 s -> the pin is
    # most of the fix).  One row per triangle, output-bounded.
    tri = _closed_triangles(e, deg).localCheckpoint()
    corners = (
        tri.select(F.col("u").alias("n"))
        .unionAll(tri.select(F.col("v").alias("n")))
        .unionAll(tri.select(F.col("w").alias("n")))
    )
    tc = corners.groupBy("n").agg(F.count(F.lit(1)).alias("t"))
    return (
        deg.filter(F.col("d") >= 2)
        .join(tc, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("local_clustering"),
        )
        .orderBy(
            F.col("local_clustering").desc(),
            F.col("degree").desc(),
            "node",
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A34: exact ship-latency percentile profile per order priority (r12)
# ---------------------------------------------------------------------------


@register(
    "agg_ship_latency_profile",
    oracle="WITH lat AS (SELECT o.o_orderpriority, "
    "CAST(date_diff('day', CAST(o.o_orderdate AS DATE), "
    "CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), "
    "v AS (SELECT o_orderpriority, days, CAST(count(*) AS BIGINT) AS cnt "
    "FROM lat GROUP BY 1, 2), "
    "tot AS (SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS n "
    "FROM v GROUP BY 1), "
    "r AS (SELECT o_orderpriority, days, cnt, CAST(sum(cnt) OVER ("
    "PARTITION BY o_orderpriority ORDER BY days "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM v), "
    "p50 AS (SELECT r.o_orderpriority, min(days) AS p50_days FROM r "
    "JOIN tot USING (o_orderpriority) WHERE 2 * cw >= n GROUP BY 1), "
    "p90 AS (SELECT r.o_orderpriority, min(days) AS p90_days FROM r "
    "JOIN tot USING (o_orderpriority) WHERE 10 * cw >= 9 * n GROUP BY 1), "
    "mx AS (SELECT o_orderpriority, max(days) AS max_days FROM v GROUP BY 1) "
    "SELECT tot.o_orderpriority, tot.n AS n_lines, p50.p50_days, "
    "p90.p90_days, mx.max_days FROM tot "
    "JOIN p50 USING (o_orderpriority) JOIN p90 USING (o_orderpriority) "
    "JOIN mx USING (o_orderpriority) ORDER BY tot.o_orderpriority",
    doc="Exact ship-latency percentile profile per order priority (A34, "
    "r12): p50/p90/max of order-to-ship days per priority class — the fulfilment-SLA "
    "report A26's fixed delay buckets can only approximate, with "
    "EXACT order statistics (lower-median convention: smallest v "
    "whose cumulative count reaches the rank, identical arithmetic "
    "in both engines — no interpolation, no approx sketch).  Scale: "
    "latency is an INTEGER day count with a naturally tiny domain "
    "(~120 distinct values), so the fact join collapses to a "
    "(mode, days, cnt) frame of ≤ modes×days rows in one map-side-"
    "combined aggregate BEFORE any window runs — the cumulative "
    "count walks that collapsed frame (≤ ~900 rows, partitioned by "
    "mode), never the fact table, which is what makes exact "
    "percentiles affordable at 100 TB when the value domain is "
    "bounded (the same collapse-first discipline as E16/A31; for "
    "unbounded domains the bucketed-rank machinery takes over).  "
    "The only data-scale shuffle is lineitem⋈orders on the natural "
    "orderkey.",
)
def q_agg_ship_latency_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    v = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("days"),
        )
        .groupBy("o_orderpriority", "days")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()  # feeds the window, totals, and max branches
    )
    tot = v.groupBy("o_orderpriority").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = v.withColumn("cw", F.sum("cnt").over(w).cast("long")).join(
        F.broadcast(tot), "o_orderpriority"
    )
    p50 = (
        r.filter(F.lit(2) * F.col("cw") >= F.col("n"))
        .groupBy("o_orderpriority")
        .agg(F.min("days").alias("p50_days"))
    )
    p90 = (
        r.filter(F.lit(10) * F.col("cw") >= F.lit(9) * F.col("n"))
        .groupBy("o_orderpriority")
        .agg(F.min("days").alias("p90_days"))
    )
    mx = v.groupBy("o_orderpriority").agg(F.max("days").alias("max_days"))
    return (
        tot.select("o_orderpriority", F.col("n").alias("n_lines"))
        .join(p50, "o_orderpriority")
        .join(p90, "o_orderpriority")
        .join(mx, "o_orderpriority")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A36: monthly open-order backlog (sweep-line over opens/closes) (r12)
# ---------------------------------------------------------------------------


@register(
    "agg_order_backlog",
    oracle="WITH opens AS (SELECT CAST(date_trunc('month', o_orderdate) "
    "AS DATE) AS m, CAST(count(*) AS BIGINT) AS c FROM orders "
    "GROUP BY 1), "
    "done AS (SELECT l_orderkey, max(l_shipdate) AS fin FROM lineitem "
    "GROUP BY 1), "
    "closes AS (SELECT CAST(date_trunc('month', fin) AS DATE) AS m, "
    "CAST(count(*) AS BIGINT) AS c FROM done GROUP BY 1), "
    "months AS (SELECT m, CAST(coalesce(o.c, 0) AS BIGINT) AS opened, "
    "CAST(coalesce(cl.c, 0) AS BIGINT) AS closed "
    "FROM opens o FULL OUTER JOIN closes cl USING (m)) "
    "SELECT m AS month, opened, closed, "
    "CAST(sum(opened - closed) OVER (ORDER BY m "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog "
    "FROM months ORDER BY m",
    doc="Monthly open-order backlog (A36, r12): the sweep-line "
    "interval count — orders open at each month's end = cumulative "
    "(opened − closed), an order closing when its LAST line ships "
    "(max l_shipdate per order) — the WIP/fulfilment-debt series "
    "every ops dashboard carries, and the interval-overlap counting "
    "pattern (turn each interval into a +1/−1 event, prefix-sum the "
    "deltas) that generalizes to concurrent-session and "
    "inventory-in-transit questions.  Orders with no lines never "
    "close and correctly stay in the backlog forever.  Scale: one "
    "map-side month collapse per side bounds everything after by the "
    "CALENDAR (~84 rows here); the per-order max is the only "
    "orderkey-wide aggregate (map-side combined); the cumulative sum "
    "is a window over the calendar-bounded month frame — the "
    "V10/A34 collapsed-domain stance, never a data-scale window "
    "(an unbounded-domain variant would ride the bucketed prefix "
    "sum).",
)
def q_agg_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("m")
    )
    opens = o.groupBy("m").agg(F.count(F.lit(1)).alias("opened"))
    done = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("fin"))
        .select(F.trunc(F.col("fin").cast("date"), "month").alias("m"))
    )
    closes = done.groupBy("m").agg(F.count(F.lit(1)).alias("closed"))
    months = (
        opens.join(closes, "m", "full_outer")
        .select(
            "m",
            F.coalesce(F.col("opened"), F.lit(0)).cast("long").alias("opened"),
            F.coalesce(F.col("closed"), F.lit(0)).cast("long").alias("closed"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        months.withColumn(
            "backlog",
            F.sum(F.col("opened") - F.col("closed")).over(w).cast("long"),
        )
        .select(F.col("m").alias("month"), "opened", "closed", "backlog")
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# J17: PURE band join via banded bucketing (r12)
# ---------------------------------------------------------------------------

_BAND_US = 1_000_000        # +/- 1 s co-arrival band
_BAND_BUCKET_US = 2_000_000  # bucket width 2*delta: a qualifying pair
                             # spans at most adjacent buckets
_BAND_BUCKET_CAP = 16        # hot-bucket gate (the LSH bucket-cap /
                             # V15 stance): a 2-second slice holding
                             # more events is a burst, reported by
                             # E24 — not an O(B^2) pair license


def band_pairs(ev: DataFrame) -> DataFrame:
    """Banded-bucket pure band join over an (event_id, user_id,
    event_type, t) frame.  Factored out of the registered query (the
    copurchase_edges pattern) so property tests can drive it with a
    crafted burst: a hot 2δ slice must contribute ZERO pairs (the gate
    runs before any pair forms), never a quadratic block."""
    ev = ev.withColumn(
        "bkt", F.expr(f"t div {_BAND_BUCKET_US}").cast("long")
    )
    cold = (
        ev.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= _BAND_BUCKET_CAP)
        .select("bkt")
    )
    # Gate BOTH sides to cold buckets BEFORE pair expansion, then pin:
    # the slim gated frame feeds the exploded and plain legs.
    evc = ev.join(cold, "bkt", "semi").localCheckpoint()
    a = evc.select(
        F.col("event_id").alias("id_a"),
        F.col("user_id").alias("u_a"),
        F.col("event_type").alias("ty_a"),
        F.col("t").alias("t_a"),
        F.explode(
            F.array(
                F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1
            )
        ).alias("jb"),
    )
    b = evc.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("u_b"),
        F.col("event_type").alias("ty_b"),
        F.col("t").alias("t_b"),
        F.col("bkt").alias("jb"),
    )
    pairs = a.join(b, "jb").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("t_a") - F.col("t_b")) <= _BAND_US)
        & (F.col("u_a") != F.col("u_b"))
    )
    return (
        pairs.groupBy(
            F.least("ty_a", "ty_b").alias("type_a"),
            F.greatest("ty_a", "ty_b").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )



@register(
    "join_band_time_pairs",
    oracle="WITH ev AS (SELECT event_id, user_id, event_type, "
    "CAST(epoch_us(ts) AS BIGINT) AS t, "
    f"CAST(epoch_us(ts) // {_BAND_BUCKET_US} AS BIGINT) AS bkt "
    "FROM events), "
    "cold AS (SELECT bkt FROM ev GROUP BY 1 "
    f"HAVING count(*) <= {_BAND_BUCKET_CAP}), "
    "evc AS (SELECT ev.* FROM ev JOIN cold USING (bkt)) "
    "SELECT least(a.event_type, b.event_type) AS type_a, "
    "greatest(a.event_type, b.event_type) AS type_b, "
    "CAST(count(*) AS BIGINT) AS n_pairs "
    "FROM evc a JOIN evc b ON a.event_id < b.event_id "
    f"AND abs(a.t - b.t) <= {_BAND_US} "
    "AND a.user_id <> b.user_id "
    "GROUP BY 1, 2 ORDER BY 1, 2",
    doc="Pure band join via banded bucketing (J17, r12): cross-user "
    "event pairs arriving within ±1 s of each other, rolled up per "
    "(type, type) — the co-arrival census behind bot-ring and "
    "thundering-herd detection, and the BUCKETED-RANGE TECHNIQUE "
    "J6's docstring has pointed at since round 1 (J6's band rides "
    "an equi key; here there is NO equi key, the classic worst case "
    "for a distributed theta join).  Engine: time buckets of width "
    "2δ make the band an EQUI problem — a qualifying pair spans at "
    "most adjacent buckets, so one side explodes to its 3 "
    "neighboring bucket ids and the join runs as a plain hash "
    "equi-join on the bucket, with the exact |Δt| ≤ δ band and the "
    "id-order dedup as post-filters; output is correct because the "
    "explode side COVERS every bucket a qualifying partner can "
    "occupy.  Both sides gate to COLD buckets first (≤ 16 events "
    "per 2-second slice, applied BEFORE any pair forms — the "
    "V15/G2/LSH discipline), so a burst slice contributes zero "
    "join input instead of a quadratic block; the oracle carries "
    "the identical gate and computes the pairs by a direct theta "
    "join — a different join strategy, so agreement checks the "
    "PAIR SET.  Scale: shuffle keys are bucket ids (uniform by "
    "construction: the cap bounds every bucket), join output is "
    "O(n · cap), and the 3× explode touches only the slim "
    "(id, user, type, t, bkt) projection.",
)
def q_join_band_time_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        # tz-free NTZ epoch: identical arithmetic to DuckDB's
        # epoch_us(ts) regardless of session timezone
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("t"),
    )
    return band_pairs(ev)


# ---------------------------------------------------------------------------
# G5: common-neighbor link prediction (r13)
# ---------------------------------------------------------------------------

_LP_MID_DEG_CAP = 64
_LP_MIN_CN = 2
_LP_TOPK = 20


def basket_copurchase_pairs(pp0_raw: DataFrame) -> DataFrame:
    """Support-capped co-purchase edges via the BASKET-LOCAL shape
    (r15 second pass, the X72/X49 lesson): ONE corpus-scale exchange
    folds each order's DISTINCT parts into a sorted basket array
    (collect_set dedups raw rows AND feeds the 2..CAP gate in the
    same pass); ordered pairs expand INSIDE the basket row (<=
    C(CAP,2) structs) and aggregate to (pa, pb, sup).  Byte-identical
    output to ``copurchase_edges(distinct(pp0_raw))`` — the gate,
    order, and support semantics are unchanged — with the distinct
    exchange, the gate count shuffle, the gate semi-join, and the
    pair SELF-join all gone (X72 measured 300 s -> 80 s at sf100
    from this shape).  Raw EXPRESSION into explode (the
    InferFiltersFromGenerate alias trap, llm_curate._fp_gram_expr).

    NULL keys are dropped up front (ADVICE r15 item 1): the oracle's
    equi-joins and the old semi-join/self-join shape both discard
    NULL l_orderkey/l_partkey, but groupBy keeps a NULL-orderkey
    group as a basket and collect_set silently drops NULL parts while
    the oracle's HAVING count(*) would still count the row — so
    without the filter the 2..CAP gate shifts at the boundary on
    dirty data.  A no-op on clean keys (TPC-H lineitem keys are
    NOT NULL); pinned by the null-key case in tests/test_wave12.py."""
    baskets = (
        pp0_raw.filter(
            F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items").between(2, _COPURCHASE_BASKET_CAP))
        .select("items")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x: F.transform(
                F.filter(F.col("items"), lambda y: y > x),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= _COPURCHASE_MIN_SUP)
    )



@register(
    "graph_link_prediction",
    oracle="WITH " + _COPURCHASE_GATE_SQL + ", "
    "adj AS (SELECT pa AS n, pb AS nb FROM e "
    "UNION ALL SELECT pb, pa FROM e), "
    "deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj "
    "GROUP BY 1), "
    "mid AS (SELECT adj.n, adj.nb FROM adj JOIN deg "
    f"ON adj.nb = deg.n WHERE deg.d <= {_LP_MID_DEG_CAP}), "
    "w AS (SELECT a.n AS x, b.n AS y FROM mid a JOIN mid b "
    "ON a.nb = b.nb AND a.n < b.n), "
    "cn AS (SELECT x, y, CAST(count(*) AS BIGINT) AS common_neighbors "
    f"FROM w GROUP BY 1, 2 HAVING count(*) >= {_LP_MIN_CN}), "
    "nonedge AS (SELECT cn.* FROM cn LEFT JOIN e "
    "ON cn.x = e.pa AND cn.y = e.pb WHERE e.pa IS NULL) "
    "SELECT ne.x AS part_a, ne.y AS part_b, ne.common_neighbors, "
    "round(CAST(ne.common_neighbors AS DOUBLE) / "
    "(da.d + db.d - ne.common_neighbors), 6) AS jaccard "
    "FROM nonedge ne JOIN deg da ON ne.x = da.n "
    "JOIN deg db ON ne.y = db.n "
    "ORDER BY ne.common_neighbors DESC, jaccard DESC, part_a, part_b "
    f"LIMIT {_LP_TOPK}",
    doc="Common-neighbor link prediction over the co-purchase graph "
    "(G5, r13, Liben-Nowell/Kleinberg): part pairs that are NOT yet "
    f"co-purchased but share >= {_LP_MIN_CN} common neighbors — the "
    "'these will be bought together next' candidates that close "
    "G2/G3/G4's descriptive family with the predictive question "
    "merchandising actually asks; scored by common-neighbor count "
    "with neighborhood Jaccard as tiebreak.  Engine: the wedge join "
    "(adjacency self-joined on the shared MIDDLE node) with the "
    f"middle-degree cap {_LP_MID_DEG_CAP} semi-applied BEFORE the "
    "join — a hub's wedge block is C(deg,2), and a hub is also the "
    "least informative common neighbor (the reason Adamic-Adar "
    "downweights high-degree middles; this engine hard-gates them, "
    "keeping every middle's pair block <= C(64,2) — the G2 "
    "basket-gate stance on the second-order graph), then an "
    "anti-join against the existing edge list keeps only NEW pairs. "
    " Scoring stays in exact integers + one rounded division "
    "(Adamic-Adar's sum of 1/ln(deg) would hang cross-engine "
    "equality on transcendental rounding — the E23 ln lesson).  "
    "Scale: adjacency and degree ride the gated edge list; the wedge "
    "join shuffles on middle-node keys with capped fanout; the "
    f"top-{_LP_TOPK} is a TakeOrdered.",
)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pp0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # Edge list via the basket-local shape (no distinct, no gate
    # shuffles, no pair self-join — see basket_copurchase_pairs).
    # Pinned DISK_ONLY: link_prediction consumes e three times (two
    # adjacency unions + the anti-join), and fact-scale pins ride
    # disk (the llm_item_cf_topk heap lesson).
    from pyspark import StorageLevel

    e = (
        basket_copurchase_pairs(pp0)
        .select("pa", "pb")
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    return link_prediction(e)


def link_prediction(e: DataFrame) -> DataFrame:
    """G5 body over any pinned (pa, pb) edge frame — factored out so
    the semantics test can drive it with known graphs (squares, hubs
    above the middle-degree cap)."""
    adj = e.select(F.col("pa").alias("n"), F.col("pb").alias("nb")).unionAll(
        e.select(F.col("pb").alias("n"), F.col("pa").alias("nb"))
    )
    # Pinned (node-dimension rows): deg feeds the middle gate AND both
    # endpoint joins (da/db) — unpinned it shuffles adj three times.
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    low_mid = deg.filter(F.col("d") <= _LP_MID_DEG_CAP).select(
        F.col("n").alias("nb")
    )
    # Wedges expand MIDDLE-LOCALLY, not by self-join (r15 second pass
    # — the basket-local lesson from X72/X49): each gated middle's
    # neighbor list is bounded by the degree cap (<= 64 entries, so
    # <= C(64,2) = 2016 pair structs per row), so one groupBy(nb)
    # fold + an in-row ordered-pair transform replaces the a⋈b wedge
    # join that consumed the adjacency frame twice.  No mid pin
    # needed — the folded frame is consumed once.  Raw EXPRESSION
    # into explode (the InferFiltersFromGenerate alias trap,
    # llm_curate._fp_gram_expr).
    mids = (
        adj.join(low_mid, "nb", "semi")
        .groupBy("nb")
        .agg(F.sort_array(F.collect_set("n")).alias("ns"))
    )
    wedge_arr = F.flatten(
        F.transform(
            F.col("ns"),
            lambda u: F.transform(
                F.filter(F.col("ns"), lambda v: v > u),
                lambda v: F.struct(u.alias("x"), v.alias("y")),
            ),
        )
    )
    cn = (
        mids.select(F.explode(wedge_arr).alias("w"))
        .select("w.*")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= _LP_MIN_CN)
    )
    nonedge = cn.join(
        e,
        (cn.x == e.pa) & (cn.y == e.pb),
        "left_anti",
    )
    da = deg.select(F.col("n").alias("x"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("y"), F.col("d").alias("_db"))
    return (
        nonedge.join(da, "x")
        .join(db, "y")
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("_da") + F.col("_db") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("common_neighbors").desc(),
            F.col("jaccard").desc(),
            "part_a",
            "part_b",
        )
        .limit(_LP_TOPK)
    )

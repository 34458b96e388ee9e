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


# ---------------------------------------------------------------------------
# X72: item-item collaborative-filtering similarity (r13)
# ---------------------------------------------------------------------------

_CF_SEEDS = 20
_CF_NEIGHBORS = 3

# NOT-NULL guard on both key columns (declared on BOTH engines): the
# seed cut is a LIMIT over per-item counts, and a NULL part key would
# otherwise form its own count group whose position under ORDER BY
# differs between engines (Spark sorts NULLS FIRST ascending, DuckDB
# NULLS LAST) — the win_distribution lesson applied before the hazard
# ships instead of after.
_CF_ORACLE = f"""
WITH pp0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
ok AS (SELECT l_orderkey FROM pp0 GROUP BY 1
       HAVING count(*) BETWEEN 2 AND 32),
pp AS (SELECT pp0.* FROM pp0 JOIN ok USING (l_orderkey)),
cnt AS (SELECT l_partkey AS i, CAST(count(*) AS BIGINT) AS n
        FROM pp GROUP BY 1),
e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS sup
      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
sym AS (SELECT pa AS i, pb AS j, sup FROM e
        UNION ALL SELECT pb, pa, sup FROM e),
seeds AS (SELECT i FROM cnt ORDER BY n DESC, i LIMIT {_CF_SEEDS}),
sc AS (SELECT s.i, s.j, s.sup,
              CAST(s.sup AS DOUBLE) / sqrt(CAST(ci.n * cj.n AS DOUBLE))
              AS c
       FROM sym s JOIN cnt ci ON s.i = ci.i JOIN cnt cj ON s.j = cj.i),
r AS (SELECT i, j, sup, c,
             row_number() OVER (PARTITION BY i ORDER BY c DESC, j) AS rnk
      FROM sc)
SELECT r.i AS item, r.j AS neighbor, r.sup AS co_orders,
       round(r.c, 6) AS cosine, CAST(r.rnk AS BIGINT) AS rnk
FROM r JOIN seeds ON r.i = seeds.i WHERE r.rnk <= {_CF_NEIGHBORS}
ORDER BY item, rnk
"""


@register(
    "llm_item_cf_topk",
    oracle=_CF_ORACLE,
    doc="Item-item collaborative-filtering similarity (X72, r13): for "
    f"the {_CF_SEEDS} most-purchased parts, the top-{_CF_NEIGHBORS} "
    "'customers who bought this also bought' neighbors by co-"
    "occurrence cosine sim(i,j) = co(i,j)/sqrt(n_i·n_j) over gated "
    "order baskets — the Amazon-style item-based CF baseline "
    "(Sarwar et al. 2001; Linden et al. 2003) that turns the A19/G2 "
    "co-purchase machinery into a ranked recommender output.  "
    "Engine: the G2 edge list (basket BETWEEN-2-AND-32 gate semi-"
    "joined BEFORE pair expansion, support >= 2 cap) symmetrized, "
    "normalized by per-item gated basket counts, then a per-item "
    "row_number window cut to the top neighbors — rank filter k <= "
    f"{_CF_NEIGHBORS} is pushed into the shuffle as WindowGroupLimit "
    "(each partition retains k rows per item before the final sort, "
    "never an item's full neighbor list).  Cosine ordering compares "
    "the RAW double sup/sqrt(n_i·n_j) — a fixed IEEE tree over exact "
    "integers, identical both engines — with the neighbor id as "
    "total tiebreak; output cosine is rounded once.  Scale: no new "
    "shuffle shape beyond G2 (part-keyed count join + item-keyed "
    "window); the seed cut broadcasts 20 ids.",
)
def q_llm_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pp0 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .select("l_orderkey", "l_partkey")
        # No .distinct() and no pin: item_cf_topk's basket fold
        # (collect_set per order) dedups inside its one corpus-scale
        # exchange — a separate distinct would shuffle the 600M-row
        # frame once more for nothing (r15 second pass).
    )
    return item_cf_topk(pp0)


def item_cf_topk(pp0: DataFrame) -> DataFrame:
    """X72 body over any (l_orderkey, l_partkey) frame (duplicates
    tolerated — the basket fold dedups) — factored out so the
    semantics test can drive it with hand-built baskets of known
    cosine.

    Shape (r15 second pass — the X49 gram-local lesson applied to
    baskets): ONE corpus-scale exchange folds each order's DISTINCT
    parts into a sorted basket array (collect_set = the dedup AND the
    2..CAP gate input in one pass); ordered pairs then expand INSIDE
    the basket row by array transforms (<= C(32,2) structs, the gate
    bound), and per-item counts explode the same pinned basket frame.
    The previous shape (distinct -> gate count shuffle -> gate
    semi-join -> pair SELF-join) moved the 600M-row pair frame through
    ~6 corpus-scale exchanges and two disk stagings at sf100; it
    first OOM'd the 48g heap (fixed by DISK_ONLY pins), then still
    measured a 0.90 third-decade exponent — this form stages only the
    #orders-row basket frame."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from .relational9 import _COPURCHASE_BASKET_CAP, _COPURCHASE_MIN_SUP

    # Pinned (order-dimension rows, <= CAP-element arrays): the basket
    # frame feeds the per-item counts AND the pair expansion.
    # DISK_ONLY — the fact-scale pin discipline.
    baskets = (
        pp0.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items").between(2, _COPURCHASE_BASKET_CAP))
        .select("items")
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    # Pinned (part-dimension rows): cnt feeds ci, cj AND the seed cut —
    # unpinned, the count aggregate re-reads baskets per consumer.
    cnt = (
        baskets.select(F.explode("items").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    # Ordered pairs expand basket-locally; raw EXPRESSION into explode
    # (the InferFiltersFromGenerate alias trap, llm_curate._fp_gram_expr).
    pair_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x: F.transform(
                F.filter(F.col("items"), lambda y: y > x),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    e = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= _COPURCHASE_MIN_SUP)
    )
    sym = e.select(
        F.col("pa").alias("i"), F.col("pb").alias("j"), "sup"
    ).unionAll(
        e.select(F.col("pb").alias("i"), F.col("pa").alias("j"), "sup")
    )
    seeds = cnt.orderBy(F.col("n").desc(), "i").limit(_CF_SEEDS).select("i")
    ci = cnt.select(F.col("i"), F.col("n").alias("_ni"))
    cj = cnt.select(F.col("i").alias("j"), F.col("n").alias("_nj"))
    scored = (
        sym.join(ci, "i")
        .join(cj, "j")
        .withColumn(
            "c",
            F.col("sup").cast("double")
            / F.sqrt((F.col("_ni") * F.col("_nj")).cast("double")),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("c").desc(), "j")
    ranked = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _CF_NEIGHBORS
    )
    return (
        ranked.join(F.broadcast(seeds), "i", "semi")
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            F.col("sup").alias("co_orders"),
            F.round(F.col("c"), 6).alias("cosine"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("item", "rnk")
    )

"""Data-quality constraint checking (V1) and time-series anomaly
detection (E6) — the validation layer a production lake runs on every
ingest, generalizing the reference's single-payload validator
(``/root/reference/src/ingest_order/app.py:19-27``) to table-level
invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg, dstddev, sql_davg, sql_dstddev
from ..registry import register
from ..tables import load_table


@register(
    "dq_constraints",
    oracle="SELECT 'orders_pk_unique' AS constraint_name, "
    "CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) "
    "AS BIGINT) AS n_violations "
    "UNION ALL SELECT 'orders_custkey_not_null', "
    "CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT) "
    "UNION ALL SELECT 'orders_price_positive', "
    "CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT) "
    "UNION ALL SELECT 'orders_status_domain', "
    "CAST((SELECT count(*) FROM orders WHERE o_orderstatus NOT IN "
    "('O', 'F', 'P')) AS BIGINT) "
    "UNION ALL SELECT 'lineitem_orders_fk', "
    "CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) "
    "UNION ALL SELECT 'lineitem_qty_range', "
    "CAST((SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR "
    "l_quantity > 50) AS BIGINT)",
    doc="Table-level data-quality constraints (V1): primary-key "
    "uniqueness, NOT NULL, value-range, domain-membership, and "
    "referential integrity evaluated in one pass each, reported as "
    "(constraint, violation count) — the Delta-constraints/"
    "expectations layer every ingest gate needs, generalizing the "
    "reference's per-payload validate_input to set-level invariants. "
    "Scale shape: the four orders rules fuse into ONE scan (a single "
    "aggregate computes all four violation counts; the uniqueness "
    "rule is count-minus-distinct — no self-join), the FK rule is a "
    "left-anti count (hash semi-join, AQE-owned strategy), and each "
    "count crosses the network as one row. No rule materializes "
    "violating rows — counts gate, a quarantine sink (snk_dlq "
    "pattern) captures.",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # All four orders-side rules in ONE aggregate pass.
    o_agg = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "orders_pk_unique"
        ),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias(
            "orders_custkey_not_null"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "orders_price_positive"
        ),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("orders_status_domain"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_orders_fk"))
    )
    qty = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("lineitem_qty_range")
    )
    wide = o_agg.crossJoin(orphans).crossJoin(qty)
    return wide.unpivot(
        [],
        [
            "orders_pk_unique",
            "orders_custkey_not_null",
            "orders_price_positive",
            "orders_status_domain",
            "lineitem_orders_fk",
            "lineitem_qty_range",
        ],
        "constraint_name",
        "n_violations",
    )


# ---------------------------------------------------------------------------
# E6: per-series z-score anomaly detection
# ---------------------------------------------------------------------------

_Z_THRESHOLD = 2.0


@register(
    "evt_anomaly",
    oracle="WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "stats AS (SELECT event_type, "
    "(CAST(SUM(CAST(floor(n * 10000.0 + 0.5) AS DECIMAL(25,0))) AS DOUBLE) "
    "/ 10000.0 / COUNT(n)) AS mu, "
    f"{sql_dstddev('n')} AS sigma FROM daily GROUP BY 1) "
    "SELECT d.event_type, d.d AS day, d.n, "
    "round((d.n - s.mu) / s.sigma, 6) AS z "
    "FROM daily d JOIN stats s ON d.event_type = s.event_type "
    f"WHERE s.sigma > 0 AND abs((d.n - s.mu) / s.sigma) > {_Z_THRESHOLD}",
    doc="Per-series z-score anomaly detection (E6): daily event counts "
    "per type, flagged where |count − μ| > 2σ of that type's own "
    "series — the volume-anomaly monitor every event pipeline runs "
    "(ingestion drops, bot spikes). Two aggregation levels — "
    "(type, day) then type — both map-side-collapsing; the per-type "
    "stats frame is #types rows, broadcast back to the daily frame. "
    "μ and σ go through the engine's stable-sum policy so the z "
    "scores hash-match across engines; z is rounded at 1e-6 for the "
    "output (σ's sqrt is IEEE-exact, the division identical trees). "
    "Constant series (σ = 0) are excluded by construction in BOTH "
    "engines: Spark double x/0 yields ±Infinity (|z| > 2 would emit "
    "the row) while DuckDB returns NULL (filtered) — the σ > 0 guard "
    "removes that engine-divergent case before the division matters "
    "(advisor finding, ADVICE.md r7).",
)
def q_evt_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        davg("n").alias("mu"), dstddev("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) > _Z_THRESHOLD))
        .select("event_type", "day", "n", F.round(z, 6).alias("z"))
    )


# ---------------------------------------------------------------------------
# V2: schema/profile drift between ingest slices
# ---------------------------------------------------------------------------

_DRIFT_CUTOFF = "TIMESTAMP '2001-06-01 00:00:00'"


def _rate(num: str, den: str):
    """x/denominator with the ANSI zero-guard: an EMPTY slice has no
    rates — NULL, exactly what DuckDB's x/0 yields (so engine and
    oracle agree on degenerate slices without disabling ANSI)."""
    return F.when(
        F.col(den) != 0, F.round(F.col(num) / F.col(den), 6)
    )


@register(
    "dq_schema_drift",
    oracle="WITH w AS (SELECT "
    f"CAST(count(*) FILTER (o_orderdate < {_DRIFT_CUTOFF}) AS DOUBLE) "
    "AS rows_pre, "
    f"CAST(count(*) FILTER (o_orderdate >= {_DRIFT_CUTOFF}) AS DOUBLE) "
    "AS rows_post, "
    "CAST(count(*) FILTER (o_totalprice IS NULL AND "
    f"o_orderdate < {_DRIFT_CUTOFF}) AS DOUBLE) AS nulls_pre, "
    "CAST(count(*) FILTER (o_totalprice IS NULL AND "
    f"o_orderdate >= {_DRIFT_CUTOFF}) AS DOUBLE) AS nulls_post, "
    + "{pre_mean} AS mean_pre, {post_mean} AS mean_post, ".format(
        pre_mean=sql_davg(
            f"CASE WHEN o_orderdate < {_DRIFT_CUTOFF} "
            "THEN o_totalprice END"
        ),
        post_mean=sql_davg(
            f"CASE WHEN o_orderdate >= {_DRIFT_CUTOFF} "
            "THEN o_totalprice END"
        ),
    )
    + "CAST(count(*) FILTER (o_orderpriority = '1-URGENT' AND "
    f"o_orderdate < {_DRIFT_CUTOFF}) AS DOUBLE) AS urg_pre, "
    "CAST(count(*) FILTER (o_orderpriority = '1-URGENT' AND "
    f"o_orderdate >= {_DRIFT_CUTOFF}) AS DOUBLE) AS urg_post, "
    "CAST(count(*) FILTER (o_orderstatus = 'O' AND "
    f"o_orderdate < {_DRIFT_CUTOFF}) AS DOUBLE) AS open_pre, "
    "CAST(count(*) FILTER (o_orderstatus = 'O' AND "
    f"o_orderdate >= {_DRIFT_CUTOFF}) AS DOUBLE) AS open_post "
    "FROM orders), "
    "long AS ("
    "SELECT 'rows' AS metric, rows_pre AS pre, rows_post AS post FROM w "
    "UNION ALL SELECT 'totalprice_null_rate', "
    "round(nulls_pre / rows_pre, 6), round(nulls_post / rows_post, 6) FROM w "
    "UNION ALL SELECT 'totalprice_mean', round(mean_pre, 6), "
    "round(mean_post, 6) FROM w "
    "UNION ALL SELECT 'priority_urgent_share', "
    "round(urg_pre / rows_pre, 6), round(urg_post / rows_post, 6) FROM w "
    "UNION ALL SELECT 'status_open_share', "
    "round(open_pre / rows_pre, 6), round(open_post / rows_post, 6) FROM w) "
    "SELECT metric, pre, post, "
    "CASE WHEN pre <> 0 THEN round((post - pre) / pre, 6) END AS rel_change "
    "FROM long",
    doc="Schema/profile drift monitor (V2): compare the column "
    "profile of the post-cutoff ingest slice against the standing "
    "pre-cutoff profile — row volume, null rate, numeric mean, and "
    "two categorical shares — as (metric, pre, post, rel_change) "
    "long-form rows. This is the drift detection a lake runs before "
    "promoting a day's ingest (volume collapse, null explosion, "
    "distribution shift all surface as rel_change outliers), the "
    "table-level sibling of dq_constraints' invariant gate. Scale "
    "shape: ALL ten slice-measures fuse into ONE aggregate over ONE "
    "column-pruned scan (conditional aggregates, map-side partials, "
    "one row crosses the network) — never one scan per metric — and "
    "the long form is a scan-local unpivot of that single row. At "
    "100 TB the pre-slice profile would be a standing aggregate "
    "(incremental-MV pattern, agg_incremental_mv) and only the delta "
    "slice is scanned; the fused-single-pass shape is identical. "
    "Means use the engine-stable davg policy; shares are exact "
    "count ratios; rel_change guards pre=0 with NULL (engine/oracle "
    "identical).",
)
def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pre = F.expr(f"o_orderdate < {_DRIFT_CUTOFF}")
    post = F.expr(f"o_orderdate >= {_DRIFT_CUTOFF}")
    w = o.agg(
        F.count(F.when(pre, 1)).cast("double").alias("rows_pre"),
        F.count(F.when(post, 1)).cast("double").alias("rows_post"),
        F.count(F.when(pre & F.col("o_totalprice").isNull(), 1))
        .cast("double")
        .alias("nulls_pre"),
        F.count(F.when(post & F.col("o_totalprice").isNull(), 1))
        .cast("double")
        .alias("nulls_post"),
        davg(F.when(pre, F.col("o_totalprice"))).alias("mean_pre"),
        davg(F.when(post, F.col("o_totalprice"))).alias("mean_post"),
        F.count(F.when(pre & (F.col("o_orderpriority") == "1-URGENT"), 1))
        .cast("double")
        .alias("urg_pre"),
        F.count(F.when(post & (F.col("o_orderpriority") == "1-URGENT"), 1))
        .cast("double")
        .alias("urg_post"),
        F.count(F.when(pre & (F.col("o_orderstatus") == "O"), 1))
        .cast("double")
        .alias("open_pre"),
        F.count(F.when(post & (F.col("o_orderstatus") == "O"), 1))
        .cast("double")
        .alias("open_post"),
    )
    rows = F.array(
        F.struct(
            F.lit("rows").alias("metric"),
            F.col("rows_pre").alias("pre"),
            F.col("rows_post").alias("post"),
        ),
        F.struct(
            F.lit("totalprice_null_rate").alias("metric"),
            _rate("nulls_pre", "rows_pre").alias("pre"),
            _rate("nulls_post", "rows_post").alias("post"),
        ),
        F.struct(
            F.lit("totalprice_mean").alias("metric"),
            F.round(F.col("mean_pre"), 6).alias("pre"),
            F.round(F.col("mean_post"), 6).alias("post"),
        ),
        F.struct(
            F.lit("priority_urgent_share").alias("metric"),
            _rate("urg_pre", "rows_pre").alias("pre"),
            _rate("urg_post", "rows_post").alias("post"),
        ),
        F.struct(
            F.lit("status_open_share").alias("metric"),
            _rate("open_pre", "rows_pre").alias("pre"),
            _rate("open_post", "rows_post").alias("post"),
        ),
    )
    long = w.select(F.explode(rows).alias("m")).select(
        "m.metric", "m.pre", "m.post"
    )
    return long.select(
        "metric",
        "pre",
        "post",
        F.when(
            F.col("pre") != 0,
            F.round((F.col("post") - F.col("pre")) / F.col("pre"), 6),
        ).alias("rel_change"),
    )


# ---------------------------------------------------------------------------
# V3: two-sample Kolmogorov-Smirnov drift on a numeric column
# ---------------------------------------------------------------------------


@register(
    "dq_ks_drift",
    oracle="WITH vals AS (SELECT "
    "CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents, "
    f"CAST(count(*) FILTER (o_orderdate < {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_pre, "
    f"CAST(count(*) FILTER (o_orderdate >= {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_post FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1), "
    "tot AS (SELECT CAST(sum(n_pre) AS BIGINT) AS tp, "
    "CAST(sum(n_post) AS BIGINT) AS tq FROM vals), "
    "c AS (SELECT cents, "
    "CAST(sum(n_pre) OVER (ORDER BY cents) AS BIGINT) AS cum_pre, "
    "CAST(sum(n_post) OVER (ORDER BY cents) AS BIGINT) AS cum_post "
    "FROM vals), "
    "d AS (SELECT c.cents, c.cum_pre, c.cum_post, "
    "abs(CAST(c.cum_pre AS HUGEINT) * t.tq - "
    "CAST(c.cum_post AS HUGEINT) * t.tp) AS diff, t.tp, t.tq "
    "FROM c, tot t) "
    "SELECT CASE WHEN tp > 0 AND tq > 0 THEN "
    "round(CAST(diff AS DOUBLE) / (CAST(tp AS DOUBLE) * tq), 6) END "
    "AS d_stat, round(cents / 100.0, 2) AS at_value, tp AS n_pre, "
    "tq AS n_post FROM d ORDER BY diff DESC, cents LIMIT 1",
    doc="Two-sample Kolmogorov-Smirnov drift statistic (V3): the "
    "EXACT sup-distance between the pre- and post-cutoff empirical "
    "CDFs of o_totalprice (integer cents — the step function "
    "evaluated at every observed value), plus the value where the "
    "distributions diverge most. This is the distribution-shift "
    "test behind dq_schema_drift's point metrics: a mean can stay "
    "flat while the shape drifts; D catches it. Engine-exactness: "
    "the sup is an INTEGER argmax — |cum_pre·N_post − cum_post·"
    "N_pre| in DECIMAL cross-multiplication (no float CDFs until "
    "the final rounded report), ties broken toward the smallest "
    "value — so both engines agree bit-for-bit. Scale shape: one "
    "scan collapses to the distinct-cents frame (uniform groupBy); "
    "the running CDFs use the TWO-PASS bucketed prefix-sum "
    "(quantile-seeded buckets + _cumsum_from_buckets — the only "
    "partition-less window runs over O(#buckets) totals, never the "
    "value frame, same contract as sort_orders); the argmax is a "
    "TakeOrdered heap. The distinct-value frame is bounded by the "
    "value DOMAIN (cents), not row count — the reason KS-on-"
    "distinct-values scales where KS-on-sorted-rows would not.",
)
def q_dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_curate import _cumsum_from_buckets
    from .relational import quantile_bucketed

    # NULL prices are unobserved values: they belong to NEITHER
    # empirical CDF (and unguarded they would also sort NULLS FIRST on
    # Spark vs NULLS LAST on DuckDB inside the cumulative ordering —
    # the null-sweep divergence class).
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    pre = F.expr(f"o_orderdate < {_DRIFT_CUTOFF}")
    vals = (
        o.select(
            F.floor(F.col("o_totalprice") * 100.0)
            .cast("long")
            .alias("cents"),
            pre.alias("_pre"),
        )
        .groupBy("cents")
        .agg(
            F.count(F.when(F.col("_pre"), 1)).alias("n_pre"),
            F.count(F.when(~F.col("_pre"), 1)).alias("n_post"),
        )
    )
    tot = vals.agg(
        F.sum("n_pre").alias("tp"), F.sum("n_post").alias("tq")
    )
    # ASCENDING bucket ids: quantile_bucketed emits descending-quantile
    # ids (built for DESC sorts); flip so bucket order matches the
    # ascending cents ordering the CDF needs.
    bucketed = quantile_bucketed(vals, "cents", nb=32).withColumn(
        "_pid", F.lit(31) - F.col("_pid")
    )
    c1 = (
        _cumsum_from_buckets(
            bucketed, [], [F.col("cents")], F.col("n_pre"), "cum_pre"
        )
        .drop("_run", "_off")
        .localCheckpoint()
    )
    c2 = _cumsum_from_buckets(
        c1, [], [F.col("cents")], F.col("n_post"), "cum_post"
    )
    d = c2.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.abs(
            F.col("cum_pre").cast("decimal(19,0)") * F.col("tq")
            - F.col("cum_post").cast("decimal(19,0)") * F.col("tp")
        ).alias("diff"),
        "tp",
        "tq",
    )
    return (
        d.orderBy(F.col("diff").desc(), "cents")
        .limit(1)
        .select(
            # One-sided data (every row in a single slice): no
            # two-sample statistic exists — NULL in BOTH engines
            # (Spark NaN/Inf vs DuckDB NULL would otherwise diverge,
            # the evt_anomaly sigma=0 class).
            F.when(
                (F.col("tp") > 0) & (F.col("tq") > 0),
                F.round(
                    F.col("diff").cast("double")
                    / (F.col("tp").cast("double") * F.col("tq")),
                    6,
                ),
            ).alias("d_stat"),
            F.round(F.col("cents") / 100.0, 2).alias("at_value"),
            F.col("tp").alias("n_pre"),
            F.col("tq").alias("n_post"),
        )
    )


# ---------------------------------------------------------------------------
# V4: chi-square homogeneity drift on a categorical column
# ---------------------------------------------------------------------------


@register(
    "dq_chi2_drift",
    oracle="WITH cat AS (SELECT o_orderpriority AS category, "
    f"CAST(count(*) FILTER (o_orderdate < {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_pre, "
    f"CAST(count(*) FILTER (o_orderdate >= {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_post FROM orders GROUP BY 1), "
    "tot AS (SELECT CAST(sum(n_pre) AS BIGINT) AS tp, "
    "CAST(sum(n_post) AS BIGINT) AS tq FROM cat) "
    "SELECT c.category, c.n_pre, c.n_post, "
    "CASE WHEN t.tp > 0 AND t.tq > 0 THEN round(("
    "  (c.n_pre - CAST(c.n_pre + c.n_post AS DOUBLE) * t.tp / (t.tp + t.tq))"
    "  * (c.n_pre - CAST(c.n_pre + c.n_post AS DOUBLE) * t.tp / (t.tp + t.tq))"
    "  / (CAST(c.n_pre + c.n_post AS DOUBLE) * t.tp / (t.tp + t.tq))"
    "  + "
    "  (c.n_post - CAST(c.n_pre + c.n_post AS DOUBLE) * t.tq / (t.tp + t.tq))"
    "  * (c.n_post - CAST(c.n_pre + c.n_post AS DOUBLE) * t.tq / (t.tp + t.tq))"
    "  / (CAST(c.n_pre + c.n_post AS DOUBLE) * t.tq / (t.tp + t.tq))"
    "), 6) END AS contrib "
    "FROM cat c, tot t",
    doc="Chi-square homogeneity drift (V4): per-category contribution "
    "to the two-sample chi-square statistic over o_orderpriority's "
    "pre/post-cutoff distributions — expected counts from the pooled "
    "marginals (E_ij = row_i x col_j / N), contribution "
    "(O-E)^2/E summed over both slices per category. The categorical "
    "sibling of the KS test (V3): KS sees shape drift in numerics, "
    "chi-square sees share drift in categories, and per-category "
    "contributions localize WHICH category moved (the total "
    "statistic is their sum; df = #categories - 1). Scale: one scan "
    "collapses to the #categories-row frame with two conditional "
    "counts (map-side partials); the pooled totals are a broadcast "
    "1-row cross join; everything after is scan-local arithmetic on "
    "a dimension-sized frame. Determinism: counts are exact "
    "integers, the float expression is the IDENTICAL tree on both "
    "engines, rounded 1e-6.",
)
def q_dq_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pre = F.expr(f"o_orderdate < {_DRIFT_CUTOFF}")
    cat = (
        o.select(F.col("o_orderpriority").alias("category"), pre.alias("_p"))
        .groupBy("category")
        .agg(
            F.count(F.when(F.col("_p"), 1)).alias("n_pre"),
            F.count(F.when(~F.col("_p"), 1)).alias("n_post"),
        )
    )
    tot = cat.agg(F.sum("n_pre").alias("tp"), F.sum("n_post").alias("tq"))
    j = cat.crossJoin(F.broadcast(tot))
    row_tot = (F.col("n_pre") + F.col("n_post")).cast("double")
    n = F.col("tp") + F.col("tq")
    e_pre = row_tot * F.col("tp") / n
    e_post = row_tot * F.col("tq") / n
    contrib = (F.col("n_pre") - e_pre) * (
        F.col("n_pre") - e_pre
    ) / e_pre + (F.col("n_post") - e_post) * (
        F.col("n_post") - e_post
    ) / e_post
    return j.select(
        "category",
        "n_pre",
        "n_post",
        # Empty pre or post slice: expected counts are 0 and the
        # statistic is undefined — NULL in BOTH engines (same
        # divergence guard as the KS stat).
        F.when(
            (F.col("tp") > 0) & (F.col("tq") > 0), F.round(contrib, 6)
        ).alias("contrib"),
    )


# ---------------------------------------------------------------------------
# V5: population-stability-index drift on a numeric column
# ---------------------------------------------------------------------------

_PSI_BIN_W = 50_000  # fixed-width bins over o_totalprice's [0, 500k) domain
_PSI_NB = 10


@register(
    "dq_psi_drift",
    oracle="WITH b AS (SELECT "
    f"CAST(least(floor(o_totalprice / {_PSI_BIN_W}), {_PSI_NB - 1}) "
    "AS BIGINT) AS bin, "
    f"CAST(count(*) FILTER (o_orderdate < {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_pre, "
    f"CAST(count(*) FILTER (o_orderdate >= {_DRIFT_CUTOFF}) AS BIGINT) "
    "AS n_post FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1), "
    "tot AS (SELECT CAST(sum(n_pre) AS BIGINT) AS tp, "
    "CAST(sum(n_post) AS BIGINT) AS tq FROM b), "
    "c AS (SELECT b.bin, b.n_pre, b.n_post, "
    f"CAST(b.n_pre + 1 AS DOUBLE) / (t.tp + {_PSI_NB}) AS p, "
    f"CAST(b.n_post + 1 AS DOUBLE) / (t.tq + {_PSI_NB}) AS q, "
    "t.tp, t.tq FROM b, tot t), "
    "k AS (SELECT bin, n_pre, n_post, tp, tq, "
    "(p - q) * (floor(ln(p / q) * 1000000.0 + 0.5) / 1000000.0) "
    "AS contrib FROM c), "
    "s AS (SELECT CAST(sum(CAST(floor(contrib * 10000.0 + 0.5) "
    "AS DECIMAL(25,0))) AS DOUBLE) / 10000.0 AS psi FROM k) "
    "SELECT k.bin, k.n_pre, k.n_post, round(k.contrib, 6) AS contrib, "
    "CASE WHEN k.tp > 0 AND k.tq > 0 THEN round(s.psi, 6) END AS psi "
    "FROM k, s ORDER BY k.bin",
    doc="Population Stability Index drift (V5): the scorecard-"
    "monitoring standard that complements V3/V4 — KS is the sup of "
    "the CDF gap (one worst point), chi-square tests homogeneity in "
    "counts; PSI = Σ (p_b − q_b)·ln(p_b/q_b) weights EVERY bin's "
    "shift by its log odds, the number risk teams threshold at "
    "0.1/0.25. Pre/post populations split at the same cutoff as "
    "V2-V4; fixed-width bins over the price domain (bin edges are "
    "CONSTANTS — at 100 TB the binning is a pure map, no quantile "
    "pass, no coordination) with add-1 smoothing over the fixed "
    "10-bin domain so empty bins contribute finitely on both "
    "engines. Engine-exactness: p and q are integer-ratio doubles "
    "(identical operands), the log-odds term is ln-quantized 1e-6 "
    "(the perplexity stance), per-bin contribs round 1e-6, and the "
    "10-term total rides the fixed-point sum. One scan collapses to "
    "the 10-bin frame map-side; everything downstream is "
    "bin-domain-sized. Output: per-bin shift ledger + the total.",
)
def q_dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    pre = F.expr(f"o_orderdate < {_DRIFT_CUTOFF}")
    b = (
        o.select(
            F.least(
                F.floor(F.col("o_totalprice") / _PSI_BIN_W),
                F.lit(_PSI_NB - 1),
            )
            .cast("long")
            .alias("bin"),
            pre.alias("_pre"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("_pre"), 1)).alias("n_pre"),
            F.count(F.when(~F.col("_pre"), 1)).alias("n_post"),
        )
    )
    tot = b.agg(F.sum("n_pre").alias("tp"), F.sum("n_post").alias("tq"))
    c = b.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pre",
        "n_post",
        "tp",
        "tq",
        (
            (F.col("n_pre") + 1).cast("double")
            / (F.col("tp") + _PSI_NB)
        ).alias("p"),
        (
            (F.col("n_post") + 1).cast("double")
            / (F.col("tq") + _PSI_NB)
        ).alias("q"),
    )
    lr_q = (
        F.floor(F.log(F.col("p") / F.col("q")) * 1000000.0 + 0.5)
        / 1000000.0
    )
    k = c.select(
        "bin",
        "n_pre",
        "n_post",
        "tp",
        "tq",
        ((F.col("p") - F.col("q")) * lr_q).alias("contrib"),
    ).localCheckpoint()  # feeds both the total and the per-bin output
    s = k.agg(
        (
            F.sum(
                F.floor(F.col("contrib") * 10000.0 + 0.5).cast(
                    "decimal(25,0)"
                )
            ).cast("double")
            / 10000.0
        ).alias("psi")
    )
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "bin",
            "n_pre",
            "n_post",
            F.round("contrib", 6).alias("contrib"),
            F.when(
                (F.col("tp") > 0) & (F.col("tq") > 0),
                F.round("psi", 6),
            ).alias("psi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# V6: referential-integrity audit across the star schema's FK edges
# ---------------------------------------------------------------------------

_FK_EDGES = [
    # (child table, child key, parent table, parent key)
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _ri_oracle() -> str:
    legs = []
    for ct, ck, pt, pk in _FK_EDGES:
        legs.append(
            f"SELECT '{ct}.{ck}->{pt}.{pk}' AS fk, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(CASE WHEN {ck} IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_null_keys, "
            f"CAST(sum(CASE WHEN {ck} IS NOT NULL AND NOT EXISTS "
            f"(SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck}) "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans "
            f"FROM {ct} c"
        )
    return (
        "WITH legs AS (" + " UNION ALL ".join(legs) + ") "
        "SELECT fk, n_rows, n_null_keys, n_orphans, "
        "CASE WHEN n_rows - n_null_keys > 0 THEN "
        "round(CAST(n_orphans AS DOUBLE) / (n_rows - n_null_keys), 6) "
        "END AS orphan_rate FROM legs ORDER BY fk"
    )


@register(
    "dq_referential_integrity",
    oracle=_ri_oracle(),
    doc="Referential-integrity audit (V6): orphan counts for every "
    "foreign-key edge of the star schema — rows whose FK value has "
    "no parent — plus NULL-key counts (a NULL FK is UNKNOWN, not an "
    "orphan: the SQL-standard reading, identical CASE semantics on "
    "both engines) and the orphan rate over the non-NULL population. "
    "The structural complement of V1's value constraints and V2's "
    "profile drift: constraint checks validate COLUMNS, this "
    "validates the JOINABILITY the whole relational surface assumes "
    "(every J-family operator silently drops orphans; this op makes "
    "the drop observable and alertable — the first thing to run "
    "when a fact pipeline and a dimension pipeline deploy "
    "independently). Distributed shape (r9 verdict item 2 — the old "
    "per-edge loop scanned lineitem THREE times, once per FK "
    "column; at 100 TB the fact table is 90% of the bytes): every "
    "table is scanned exactly ONCE — a child carrying multiple "
    "edges emits (edge, key) pairs scan-locally via stack (so "
    "lineitem's three FK columns ride one column-pruned pass), "
    "parents emit (edge, key, parent-marker) the same way — and "
    "the existence test is NOT an anti-join at all: children and "
    "parents union into one frame, ONE (edge, key) hash aggregate "
    "computes per-key child counts alongside a has-parent flag "
    "(map-side partial combine collapses each scan before the "
    "single uniform shuffle), and the edge-level rollup reads "
    "orphan ROWS as Σ child-count over keys with no parent marker. "
    "No frame is consumed twice (nothing to checkpoint or rescan), "
    "both shuffles key on values the engine distributes uniformly, "
    "and the report is edge-count-sized.",
)
def q_dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections import defaultdict

    by_child: dict[str, list] = defaultdict(list)
    by_parent: dict[str, list] = defaultdict(list)
    for ct, ck, pt, pk in _FK_EDGES:
        fk = f"{ct}.{ck}->{pt}.{pk}"
        by_child[ct].append((fk, ck))
        by_parent[pt].append((fk, pk))

    def stacked(table: str, pairs: list, is_child: bool) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        args = ", ".join(
            f"'{fk}', CAST({col} AS BIGINT)" for fk, col in pairs
        )
        return t.selectExpr(
            f"stack({len(pairs)}, {args}) AS (fk, k)"
        ).select(
            "fk",
            "k",
            F.lit(1 if is_child else 0).alias("c"),
            F.lit(1 if is_child else 0).alias("is_child"),
        )

    legs = [stacked(ct, pairs, True) for ct, pairs in by_child.items()]
    legs += [stacked(pt, pairs, False) for pt, pairs in by_parent.items()]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    per_key = u.groupBy("fk", "k").agg(
        F.sum("c").alias("n_child"),
        F.max(F.lit(1) - F.col("is_child")).alias("has_parent"),
    )
    rep = per_key.groupBy("fk").agg(
        F.sum("n_child").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("n_child"))), F.lit(0)
        ).alias("n_null_keys"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("k").isNotNull() & (F.col("has_parent") == 0),
                    F.col("n_child"),
                )
            ),
            F.lit(0),
        ).alias("n_orphans"),
    )
    denom = F.col("n_rows") - F.col("n_null_keys")
    return rep.select(
        "fk",
        "n_rows",
        "n_null_keys",
        "n_orphans",
        F.when(
            denom > 0,
            F.round(F.col("n_orphans").cast("double") / denom, 6),
        ).alias("orphan_rate"),
    ).orderBy("fk")


# ---------------------------------------------------------------------------
# V7: primary-key uniqueness audit across every table
# ---------------------------------------------------------------------------

_PK_DECLS = [
    ("customer", ("c_custkey",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
    ("events", ("event_id",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("nation", ("n_nationkey",)),
    ("orders", ("o_orderkey",)),
    ("part", ("p_partkey",)),
    ("region", ("r_regionkey",)),
    ("supplier", ("s_suppkey",)),
]


def _pk_oracle() -> str:
    legs = []
    for t, keys in _PK_DECLS:
        kl = ", ".join(keys)
        nonnull = " AND ".join(f"{k} IS NOT NULL" for k in keys)
        anynull = " OR ".join(f"{k} IS NULL" for k in keys)
        legs.append(
            f"SELECT '{t}' AS tbl, '{kl}' AS pk, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(CASE WHEN {anynull} THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_null_keys, "
            "(SELECT CAST(count(*) AS BIGINT) FROM "
            f"(SELECT DISTINCT {kl} FROM {t} WHERE {nonnull})) "
            f"AS n_distinct FROM {t}"
        )
    return (
        "WITH legs AS (" + " UNION ALL ".join(legs) + ") "
        "SELECT tbl, pk, n_rows, n_null_keys, "
        "n_rows - n_null_keys - n_distinct AS n_dup_rows, "
        "CASE WHEN n_rows - n_null_keys > 0 THEN "
        "round(CAST(n_rows - n_null_keys - n_distinct AS DOUBLE) "
        "/ (n_rows - n_null_keys), 6) END AS dup_rate "
        "FROM legs ORDER BY tbl"
    )


@register(
    "dq_pk_uniqueness",
    oracle=_pk_oracle(),
    doc="Primary-key uniqueness audit (V7): for every table's "
    "declared key (lineitem's is the COMPOSITE (orderkey, "
    "linenumber) — the audit must treat multi-column keys as "
    "tuples, not columns), the duplicate-row count beyond the first "
    "occurrence per key, NULL-key rows (a NULL key part is UNKNOWN "
    "identity — excluded from both the distinct count and the "
    "dup-rate denominator, the V6 stance), and the dup rate.  The "
    "V6 sibling: referential integrity validates EDGES, this "
    "validates NODES — together they are the invariants every "
    "MERGE/upsert in the engine assumes (S6's dedup-before-MERGE "
    "exists precisely because ingest CAN violate this; the audit "
    "makes the violation measurable instead of assumed away).  "
    "Distributed shape per table: one uniform groupBy on the key "
    "tuple (map-side partials collapse duplicates early), then "
    "ONE-row aggregates — dup rows fall out as Σ(count) − "
    "#distinct-keys with no second scan; the ten 1-row legs union "
    "to a 10-row report.",
)
def q_dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, keys in _PK_DECLS:
        tbl = load_table(spark, sf_dir, t)
        nonnull = None
        for k in keys:
            c = F.col(k).isNotNull()
            nonnull = c if nonnull is None else (nonnull & c)
        kf = (
            tbl.filter(nonnull)
            .groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("n"))
        )
        kstats = kf.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_key_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        tot = tbl.agg(F.count(F.lit(1)).alias("n_rows"))
        leg = tot.crossJoin(kstats).select(
            F.lit(t).alias("tbl"),
            F.lit(", ".join(keys)).alias("pk"),
            "n_rows",
            (F.col("n_rows") - F.col("n_key_rows")).alias("n_null_keys"),
            (F.col("n_key_rows") - F.col("n_distinct")).alias(
                "n_dup_rows"
            ),
            F.when(
                F.col("n_key_rows") > 0,
                F.round(
                    (F.col("n_key_rows") - F.col("n_distinct")).cast(
                        "double"
                    )
                    / F.col("n_key_rows"),
                    6,
                ),
            ).alias("dup_rate"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("tbl")


# ---------------------------------------------------------------------------
# V8: order <-> lineitem financial reconciliation
# ---------------------------------------------------------------------------


@register(
    "dq_order_reconciliation",
    oracle="WITH ls AS (SELECT l_orderkey, "
    "CAST(count(*) AS BIGINT) AS n_lines, "
    "SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * "
    "(1.0 + l_tax) * 10000.0 + 0.5) AS DECIMAL(25,0))) AS line_q "
    "FROM lineitem GROUP BY 1), "
    "j AS (SELECT o.o_orderstatus, o.o_orderkey, ls.n_lines, "
    "CAST(floor(o.o_totalprice * 10000.0 + 0.5) AS DECIMAL(25,0)) "
    "AS total_q, ls.line_q "
    "FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey) "
    "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(sum(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_no_lines, "
    "CAST(sum(CASE WHEN n_lines IS NOT NULL AND "
    "abs(CAST(total_q - line_q AS DOUBLE)) > CAST(total_q AS DOUBLE) * 0.01 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_drift_gt_1pct, "
    "round(CAST(max(CASE WHEN n_lines IS NOT NULL "
    "THEN abs(total_q - line_q) END) AS DOUBLE) / 10000.0, 4) "
    "AS max_abs_drift, "
    "round(CAST(sum(CASE WHEN n_lines IS NOT NULL "
    "THEN total_q - line_q ELSE 0 END) AS DOUBLE) / 10000.0, 4) "
    "AS net_drift "
    "FROM j GROUP BY 1 ORDER BY 1",
    doc="Order/lineitem financial reconciliation (V8): per order "
    "status, how many header totals disagree with the recomputed "
    "sum of their lines (extendedprice x (1-discount) x (1+tax)), "
    "plus headers with no lines at all, the worst absolute drift, "
    "and the signed net drift — the close-of-books audit that "
    "catches partial writes, double-applied discounts, and lost "
    "line batches that per-table checks (V6 counts orphan KEYS; "
    "this reconciles AMOUNTS) cannot see.  Engine-exact by the "
    "repo's fixed-point money policy: the per-line expression tree "
    "is identical double IEEE ops on both engines, each line "
    "quantizes to 1e-4 units BEFORE the sum (functions/numeric.py), "
    "drifts are integer differences, and the 1% threshold compares "
    "against the exact header quantity.  Scale: ONE lineitem scan "
    "pre-collapsed to per-order (count, sum) with map-side partials "
    "before the uniform o_orderkey join; the status rollup is "
    "3 groups.  The left join keeps headerless detection free.",
)
def q_dq_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import quant

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_line = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    ls = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(quant(per_line)).alias("line_q"),
    )
    j = o.join(
        ls, o["o_orderkey"] == ls["l_orderkey"], "left"
    ).select(
        "o_orderstatus",
        "n_lines",
        quant("o_totalprice").alias("total_q"),
        "line_q",
    )
    has_lines = F.col("n_lines").isNotNull()
    drift = F.col("total_q") - F.col("line_q")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(has_lines, 0).otherwise(1))
            .cast("long")
            .alias("n_no_lines"),
            F.sum(
                F.when(
                    has_lines
                    & (
                        F.abs(drift.cast("double"))
                        > F.col("total_q").cast("double") * 0.01
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_drift_gt_1pct"),
            F.round(
                F.max(F.when(has_lines, F.abs(drift))).cast("double")
                / 10000.0,
                4,
            ).alias("max_abs_drift"),
            F.round(
                F.sum(F.when(has_lines, drift).otherwise(F.lit(0)))
                .cast("double")
                / 10000.0,
                4,
            ).alias("net_drift"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# V9: Benford first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_SHARE_SQL = "log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))"


@register(
    "dq_benford",
    oracle="WITH q AS (SELECT CAST(floor(o_totalprice * 10000.0 + 0.5) "
    "AS BIGINT) AS qp FROM orders), "
    "d AS (SELECT CAST(substr(CAST(qp AS VARCHAR), 1, 1) AS BIGINT) "
    "AS digit FROM q), "
    "g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d) "
    "SELECT g.digit, g.n, "
    "round(CAST(g.n AS DOUBLE) / t.n_total, 6) AS obs_share, "
    f"round({_BENFORD_SHARE_SQL}, 6) AS benford_share, "
    f"round(pow(CAST(g.n AS DOUBLE) - CAST(t.n_total AS DOUBLE) * "
    f"{_BENFORD_SHARE_SQL}, 2) / (CAST(t.n_total AS DOUBLE) * "
    f"{_BENFORD_SHARE_SQL}), 6) AS chi2_term "
    "FROM g, t ORDER BY 1",
    doc="Benford first-digit audit (V9): the distribution of the "
    "first significant digit of order totals against Benford's law — "
    "the classic fabricated-amounts screen (hand-typed or generated "
    "money values over-represent low leading digits differently than "
    "organic multiplicative processes; auditors chi-square the gap). "
    "The digit comes from the INTEGER quantized amount (the repo "
    "money policy: floor(x*1e4+0.5) as BIGINT, then the first "
    "character of the integer's decimal string) — never from "
    "formatting a double, whose shortest-representation rendering "
    "differs between engines.  Expected shares and chi-square terms "
    "are identical double expression trees on both engines, rounded "
    "1e-6.  Scale: one scan, one 9-group aggregate, a 1-row total "
    "broadcast — O(1) output at any corpus size.",
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    g = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = o.agg(F.count(F.lit(1)).alias("n_total"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    e = F.col("n_total").cast("double") * p
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias(
                "obs_share"
            ),
            F.round(p, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n").cast("double") - e, F.lit(2.0)) / e, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# V10: calendar-continuity audit (missing days / max gap)
# ---------------------------------------------------------------------------


@register(
    "dq_calendar_gaps",
    oracle="WITH d AS ("
    "SELECT DISTINCT 'events' AS table_name, CAST(ts AS DATE) AS day "
    "FROM events "
    "UNION ALL "
    "SELECT DISTINCT 'orders', CAST(o_orderdate AS DATE) FROM orders), "
    "e AS (SELECT table_name, day, day - DATE '1970-01-01' AS ed FROM d), "
    "g AS (SELECT table_name, day, ed, "
    "ed - lag(ed) OVER (PARTITION BY table_name ORDER BY ed) - 1 AS gap "
    "FROM e) "
    "SELECT table_name, min(day) AS first_day, max(day) AS last_day, "
    "CAST(max(ed) - min(ed) + 1 AS BIGINT) AS span_days, "
    "CAST(count(*) AS BIGINT) AS present_days, "
    "CAST(max(ed) - min(ed) + 1 - count(*) AS BIGINT) AS missing_days, "
    "CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days "
    "FROM g GROUP BY 1 ORDER BY 1",
    doc="Calendar-continuity audit (V10): for each time-bearing "
    "table, the span of its day domain, how many days actually have "
    "rows, and the longest run of silent days — the "
    "ingest-went-dark detector (a lost day of events keeps every "
    "row-level constraint green; only the calendar notices).  Day "
    "arithmetic is integer epoch days on both engines (no datediff "
    "on timestamps, whose boundary conventions differ).  Scale: "
    "each table collapses to DISTINCT (table, day) at the scan — "
    "the gap window then runs over calendar-bounded frames (a "
    "decade is ~3 653 rows per table) partitioned by table, so no "
    "corpus-sized data ever reaches a window; output is one row "
    "per audited table.",
)
def q_dq_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.lit("events").alias("table_name"),
            F.col("ts").cast("date").alias("day"),
        )
        .distinct()
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.lit("orders").alias("table_name"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .distinct()
    )
    d = ev.unionAll(od).withColumn(
        "ed", F.unix_date(F.col("day")).cast("long")
    )
    w = Window.partitionBy("table_name").orderBy("ed")
    g = d.withColumn(
        "gap", F.col("ed") - F.lag("ed").over(w) - F.lit(1)
    )
    return (
        g.groupBy("table_name")
        .agg(
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            (F.max("ed") - F.min("ed") + F.lit(1))
            .cast("long")
            .alias("span_days"),
            F.count(F.lit(1)).alias("present_days"),
            (F.max("ed") - F.min("ed") + F.lit(1) - F.count(F.lit(1)))
            .cast("long")
            .alias("missing_days"),
            F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias(
                "max_gap_days"
            ),
        )
        .orderBy("table_name")
    )


# ---------------------------------------------------------------------------
# V11: IQR outlier audit over the numeric measure columns
# ---------------------------------------------------------------------------

_IQR_COLS: tuple[tuple[str, str], ...] = (
    ("events", "value"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"),
)


def _sql_iqr_leg(i: int, table: str, col: str) -> str:
    lo = "q.q1 - 1.5 * (q.q3 - q.q1)"
    hi = "q.q3 + 1.5 * (q.q3 - q.q1)"
    return (
        f"r{i} AS (SELECT {col} AS v, "
        f"CAST(row_number() OVER (ORDER BY {col}) AS BIGINT) AS rnk, "
        f"CAST(count(*) OVER () AS BIGINT) AS n FROM {table} "
        f"WHERE {col} IS NOT NULL), "
        f"q{i} AS (SELECT max(n) AS n, "
        "max(CASE WHEN rnk = (n * 25 + 99) // 100 THEN v END) AS q1, "
        "max(CASE WHEN rnk = (n * 75 + 99) // 100 THEN v END) AS q3 "
        f"FROM r{i}), "
        f"o{i} AS (SELECT '{table}' AS table_name, "
        f"'{col}' AS column_name, q.n, q.q1, q.q3, q.q3 - q.q1 AS iqr, "
        f"CAST(sum(CASE WHEN t.{col} < {lo} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_below, "
        f"CAST(sum(CASE WHEN t.{col} > {hi} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_above, "
        f"round(CAST(sum(CASE WHEN t.{col} < {lo} OR t.{col} > {hi} "
        "THEN 1 ELSE 0 END) AS DOUBLE) / q.n, 6) AS outlier_rate "
        f"FROM {table} t, q{i} q WHERE t.{col} IS NOT NULL "
        "GROUP BY 1, 2, 3, 4, 5, 6)"
    )


@register(
    "dq_outlier_iqr",
    oracle="WITH "
    + ", ".join(_sql_iqr_leg(i, t, c) for i, (t, c) in enumerate(_IQR_COLS))
    + " "
    + " UNION ALL ".join(f"SELECT * FROM o{i}" for i in range(len(_IQR_COLS)))
    + " ORDER BY table_name, column_name",
    doc="IQR outlier audit (V11): for each numeric measure column, "
    "the EXACT first/third quartiles (rank-selected data values, "
    "ceil(n·q) integer arithmetic — not an approx sketch, whose "
    "engine-specific internals an oracle can't grade), the Tukey "
    "1.5·IQR fences, and the count/share outside them — the "
    "standard pre-model screen for corrupted feeds (a fat outlier "
    "tail in a money column usually means a unit or parser "
    "regression upstream; V1's static constraints can't see it "
    "because every row is individually plausible).  Scale: each "
    "column's rank is the TWO-PASS bucketed prefix sum (sampled "
    "boundaries + per-bucket row_number — the E16/O1 machinery; no "
    "single-partition sort ever sees the data), the fence frame is "
    "one broadcast row, and the outlier count is a second "
    "column-pruned scan.  Tie runs at a quartile boundary select "
    "the same VALUE under any tie order, so the pick is "
    "engine-exact without a unique tiebreak.",
)
def q_dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Histogram-locate quantile selection (r11 rewrite): the original
    # path ranked EVERY row through the bucketed prefix-sum window —
    # correct, but the full-corpus window made the audit the one
    # super-linear key in the sf10 suite (12.5 s sf1 → 211 s sf10,
    # four data-scale disk pins).  Exact quantiles don't need a full
    # ranking: per-bucket COUNTS locate which bucket holds each target
    # rank (a 32-row frame), and only the 1-2 target buckets' rows —
    # ~n/32 each — are ranked at all (broadcast semi-join pushes the
    # bucket filter to the scan).  Same desc-rank arithmetic, same
    # tie rule (ties share a value, so the picked VALUE is identical
    # under any tie order), no checkpoint, no window over the corpus.
    from .relational import quantile_bucketed, sampled_boundaries_multi

    # r16: the four per-column boundary probes run as ONE batched job
    # (sampled_boundaries_multi) instead of four serial sample+collect
    # actions — same exact quartiles under any boundary set (bucket id
    # is a pure function of the value; boundaries affect balance only).
    ts = [
        load_table(spark, sf_dir, table)
        .select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull())
        for table, col in _IQR_COLS
    ]
    all_bounds = sampled_boundaries_multi([(t, "v") for t in ts], nb=32)

    legs = []
    for (table, col), t, bnds in zip(_IQR_COLS, ts, all_bounds):
        bucketed = quantile_bucketed(
            t, "v", nb=32, pin=False, bounds_values=bnds
        )
        counts = bucketed.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("_c")
        )
        woff = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        # 32-row frame: per bucket, rows strictly before it (in desc
        # value order = ascending _pid order) and the total n.
        offs = counts.select(
            "_pid",
            F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
            F.col("_c"),
        ).crossJoin(
            F.broadcast(counts.agg(F.sum("_c").alias("n")))
        )
        # desc target ranks: rdesc(q) = n + 1 - ceil(n*q/100)
        targets = offs.select(
            "_pid",
            "_off",
            "n",
            *[
                (
                    (
                        F.expr(f"n + 1 - ((n * {q} + 99) div 100)")
                        > F.col("_off")
                    )
                    & (
                        F.expr(f"n + 1 - ((n * {q} + 99) div 100)")
                        <= F.col("_off") + F.col("_c")
                    )
                ).alias(f"has_q{q}")
                for q in (25, 75)
            ],
        ).filter(F.col("has_q25") | F.col("has_q75"))
        wrank = Window.partitionBy("_pid").orderBy(F.col("v").desc())
        ranked = (
            bucketed.join(F.broadcast(targets), "_pid")
            .withColumn("rnk", F.row_number().over(wrank) + F.col("_off"))
        )

        def pick(q: int):
            return F.max(
                F.when(
                    F.col("rnk")
                    == F.expr(f"n + 1 - ((n * {q} + 99) div 100)"),
                    F.col("v"),
                )
            )

        qrow = ranked.agg(
            F.max("n").alias("n"),
            pick(25).alias("q1"),
            pick(75).alias("q3"),
        )
        lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
        hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
        legs.append(
            t.crossJoin(F.broadcast(qrow))
            .agg(
                F.lit(table).alias("table_name"),
                F.lit(col).alias("column_name"),
                F.max("n").alias("n"),
                F.max("q1").alias("q1"),
                F.max("q3").alias("q3"),
                F.max(F.col("q3") - F.col("q1")).alias("iqr"),
                F.sum(F.when(F.col("v") < lo, 1).otherwise(0))
                .cast("long")
                .alias("n_below"),
                F.sum(F.when(F.col("v") > hi, 1).otherwise(0))
                .cast("long")
                .alias("n_above"),
                F.round(
                    F.sum(
                        F.when((F.col("v") < lo) | (F.col("v") > hi), 1)
                        .otherwise(0)
                    ).cast("double")
                    / F.max("n"),
                    6,
                ).alias("outlier_rate"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# V12: null-completeness profile across the star schema
# ---------------------------------------------------------------------------

_NULL_COLS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("customer", ("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                  "c_mktsegment")),
    ("documents", ("doc_id", "text", "lang", "source", "n_chars")),
    ("embeddings", ("vec_id", "embedding", "label")),
    ("events", ("event_id", "ts", "user_id", "event_type", "value",
                "props")),
    ("lineitem", ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                  "l_returnflag", "l_linestatus", "l_shipdate")),
    ("orders", ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority")),
    ("part", ("p_partkey", "p_name", "p_brand", "p_type", "p_size",
              "p_retailprice")),
    ("supplier", ("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
)


def _sql_null_leg(table: str, cols: tuple[str, ...]) -> tuple[str, str]:
    agg = (
        f"a_{table} AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        + ", ".join(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_{i}"
            for i, c in enumerate(cols)
        )
        + f" FROM {table})"
    )
    rows = " UNION ALL ".join(
        f"SELECT '{table}' AS table_name, '{c}' AS column_name, n_rows, "
        f"n_{i} AS n_null, "
        f"round(CAST(n_{i} AS DOUBLE) / n_rows, 6) AS null_rate "
        f"FROM a_{table}"
        for i, c in enumerate(cols)
    )
    return agg, rows


@register(
    "dq_null_profile",
    oracle="WITH "
    + ", ".join(_sql_null_leg(t, cs)[0] for t, cs in _NULL_COLS)
    + " "
    + " UNION ALL ".join(_sql_null_leg(t, cs)[1] for t, cs in _NULL_COLS)
    + " ORDER BY table_name, column_name",
    doc="Null-completeness profile (V12): per column of every star-"
    "schema table, the row count, NULL count, and NULL rate — the "
    "completeness ledger every ingest SLA is written against (V10 "
    "notices a missing DAY; this notices a field going dark inside "
    "rows that keep arriving, the classic symptom of an upstream "
    "schema change).  Scale: ONE column-pruned scan per table "
    "computes every column's NULL count as parallel aggregates "
    "(map-side partials), then the 1-row result explodes to the "
    "per-column report — the explode touches #columns rows, never "
    "data.  Output is bounded by the schema (46 rows), sorted "
    "deterministically.",
)
def q_dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    legs = []
    for table, cols in _NULL_COLS:
        t = load_table(spark, sf_dir, table)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_n_{i}")
                for i, c in enumerate(cols)
            ],
        )
        stacked = agg.select(
            "n_rows",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.col(f"_n_{i}").alias("n_null"),
                        )
                        for i, c in enumerate(cols)
                    ]
                )
            ).alias("_s"),
        )
        legs.append(
            stacked.select(
                F.lit(table).alias("table_name"),
                F.col("_s.column_name").alias("column_name"),
                "n_rows",
                F.col("_s.n_null").alias("n_null"),
                F.round(
                    F.col("_s.n_null").cast("double") / F.col("n_rows"), 6
                ).alias("null_rate"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# V9b: Benford decision row — one-glance χ² gate over all nine digits
# ---------------------------------------------------------------------------

# Upper 1% critical value of χ² with 8 degrees of freedom (standard
# table value; public constant).
_BENFORD_CHI2_CRIT_1PCT = 20.0902

_SQL_BENFORD_P = "log10(1.0 + 1.0 / CAST(ds.digit AS DOUBLE))"


@register(
    "dq_benford_decision",
    oracle="WITH q AS (SELECT CAST(floor(o_totalprice * 10000.0 + 0.5) "
    "AS BIGINT) AS qp FROM orders), "
    "d AS (SELECT CAST(substr(CAST(qp AS VARCHAR), 1, 1) AS BIGINT) "
    "AS digit FROM q), "
    "g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d), "
    "ds AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) "
    "AS digit), "
    "terms AS (SELECT "
    "pow(CAST(coalesce(g.n, 0) AS DOUBLE) - CAST(t.n_total AS DOUBLE) * "
    f"{_SQL_BENFORD_P}, 2) / (CAST(t.n_total AS DOUBLE) * "
    f"{_SQL_BENFORD_P}) AS term "
    "FROM ds LEFT JOIN g ON ds.digit = g.digit CROSS JOIN t) "
    "SELECT round(CAST(sum(CAST(floor(term * 10000.0 + 0.5) "
    "AS DECIMAL(25,0))) AS DOUBLE) / 10000.0, 4) AS chi2_total, "
    "CAST(8 AS BIGINT) AS df, "
    f"{_BENFORD_CHI2_CRIT_1PCT} AS critical_1pct, "
    "CAST(sum(CAST(floor(term * 10000.0 + 0.5) AS DECIMAL(25,0))) "
    f"AS DOUBLE) / 10000.0 > {_BENFORD_CHI2_CRIT_1PCT} AS reject "
    "FROM terms",
    doc="Benford decision row (V9b): V9's per-digit chi-square terms "
    "collapsed to the one-glance gate an auditor reads — total χ² "
    "over ALL NINE digit categories (a digit absent from the data "
    "still contributes its full expected mass, which the "
    "observed-digits-only V9 rows cannot show), df = 8, the standard "
    "1% critical value, and the reject verdict.  The term sum rides "
    "the fixed-point policy (each term quantized 1e-4, DECIMAL sum — "
    "9 doubles summed in engine-specific order would not be "
    "bit-stable).  Same one-scan shape as V9 plus a 9-row generated "
    "digit domain.",
)
def q_dq_benford_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    g = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = o.agg(F.count(F.lit(1)).alias("n_total"))
    ds = spark.range(1, 10).select(F.col("id").cast("long").alias("digit"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    e = F.col("n_total").cast("double") * p
    term = (
        F.pow(F.coalesce(F.col("n"), F.lit(0)).cast("double") - e, F.lit(2.0))
        / e
    )
    terms = (
        ds.join(g, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(term.alias("term"))
    )
    tq = F.sum(
        F.floor(F.col("term") * F.lit(10000.0) + F.lit(0.5)).cast(
            "decimal(25,0)"
        )
    )
    return terms.agg(
        F.round(tq.cast("double") / 10000.0, 4).alias("chi2_total"),
        F.lit(8).cast("long").alias("df"),
        F.lit(_BENFORD_CHI2_CRIT_1PCT).alias("critical_1pct"),
        (tq.cast("double") / 10000.0 > F.lit(_BENFORD_CHI2_CRIT_1PCT)).alias(
            "reject"
        ),
    )


# ---------------------------------------------------------------------------
# V13: functional-dependency audit
# ---------------------------------------------------------------------------

# Candidate FDs (determinant → dependent), chosen to mix a HELD
# dependency (nation's region assignment — a real schema invariant)
# with violated ones at very different group cardinalities, so the
# audit's output exercises both verdicts on every driver corpus.
_FD_CANDIDATES = (
    ("nation_region", "nation", "n_nationkey", "n_regionkey"),
    ("brand_type", "part", "p_brand", "p_type"),
    ("order_supplier", "lineitem", "l_orderkey", "l_suppkey"),
    ("customer_status", "orders", "o_custkey", "o_orderstatus"),
    ("user_event_type", "events", "user_id", "event_type"),
)


def _sql_fd_leg(name: str, tbl: str, det: str, dep: str) -> str:
    return (
        f"SELECT '{name}' AS fd, CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_violating, CAST(max(nd) AS BIGINT) AS max_distinct, "
        "round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*), 6) AS violation_rate "
        f"FROM (SELECT {det}, count(DISTINCT {dep}) AS nd FROM {tbl} "
        f"WHERE {det} IS NOT NULL GROUP BY 1)"
    )


@register(
    "dq_fd_violations",
    oracle=" UNION ALL ".join(
        _sql_fd_leg(*c) for c in _FD_CANDIDATES
    )
    + " ORDER BY fd",
    doc="Functional-dependency audit (V13): for each candidate FD "
    "det → dep, collapse the table to (det, distinct-dep-count) and "
    "report how many determinant groups carry more than one "
    "dependent value — the profiling primitive behind schema "
    "normalization checks, denormalization-drift detection (a "
    "column that USED to be derivable from another and silently "
    "stopped), and join-key safety (an FD that holds means the "
    "dependent can ride a dimension join instead of being carried "
    "on the fact).  The candidate set mixes a held invariant "
    "(nation → region, 0 violating groups on every corpus) with "
    "violated ones at 25-to-15k group cardinalities, so both "
    "verdicts carry oracle evidence.  NULL determinants are "
    "excluded on both engines (an FD is a statement about present "
    "keys).  Scale: each leg is one groupBy(det) count-distinct — "
    "a two-stage partial aggregate, no joins, no windows; legs on "
    "different tables are independent jobs.  Output is 5 rows.",
)
def q_dq_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, tbl, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        g = (
            t.filter(F.col(det).isNotNull())
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("nd"))
        )
        leg = g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("nd").cast("long").alias("max_distinct"),
            F.round(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("violation_rate"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("fd")


# ---------------------------------------------------------------------------
# V15: same-day duplicate-order audit (the idempotency-suspect report)
# ---------------------------------------------------------------------------

_DUP_GROUP_CAP = 8  # skew guard: a (customer, day) with more orders is
                    # a feed anomaly reported by V1-class gates, not a
                    # pair-expansion license


@register(
    "dq_duplicate_orders",
    oracle="WITH o AS (SELECT o_orderkey, o_custkey, "
    "CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders), "
    "g AS (SELECT o_custkey, day FROM o GROUP BY 1, 2 "
    f"HAVING count(*) BETWEEN 2 AND {_DUP_GROUP_CAP}) "
    "SELECT a.o_custkey, a.day, "
    "a.o_orderkey AS key_a, b.o_orderkey AS key_b, "
    "a.o_totalprice AS price_a, b.o_totalprice AS price_b, "
    "(a.o_totalprice = b.o_totalprice) AS same_price "
    "FROM o a JOIN o b ON a.o_custkey = b.o_custkey "
    "AND a.day = b.day AND a.o_orderkey < b.o_orderkey "
    "JOIN g ON g.o_custkey = a.o_custkey AND g.day = a.day "
    "ORDER BY a.o_custkey, a.day, key_a, key_b",
    doc="Same-day duplicate-order audit (V15): every pair of orders "
    "placed by one customer on one calendar day — the analytics-side "
    "mirror of the reference's ingest-time idempotency defense "
    "(src/ingest_order/app.py:30-32 derives the order id from the "
    "payload CONTENT hash precisely so a double-submitted payload "
    "collapses; this audit surfaces the near-misses that differ "
    "somewhere — a retry with a new timestamp, a double-click with a "
    "changed cart — which content hashing deliberately lets "
    "through).  same_price flags the highest-suspicion pairs.  "
    "Non-vacuous on every driver corpus (355 same-day pairs at "
    "sf0.1).  Scale: the self-join keys on (customer, day) — high-"
    "cardinality, uniform — and a BETWEEN-2-AND-8 group gate "
    "semi-joins BOTH self-join legs BEFORE pair expansion (r12: the "
    "r11 plan joined the gate aggregate ABOVE the self-join, so a "
    "poisoned customer-day still formed its quadratic block before "
    "being discarded; now each leg is filtered first and the "
    "poisoned key contributes zero join INPUT rows — plan contract "
    "in tests/test_plan_contracts.py pins the gate below the pair "
    "join); the gate itself is one map-side-combined count.",
)
def q_dq_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        "o_totalprice",
    )
    g = (
        o.groupBy("o_custkey", "day")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n").between(2, _DUP_GROUP_CAP))
        .select("o_custkey", "day")
    )
    # Gate each leg BEFORE the self-join: a (customer, day) outside the
    # 2..CAP band never reaches pair expansion, so the worst a poisoned
    # feed can do is shrink the join input.  (g has unique keys, so the
    # semi-join equals the old post-join inner gate row-for-row.)
    og = o.join(g, ["o_custkey", "day"], "semi")
    a = og.alias("a")
    b = og.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.day").alias("day"),
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            F.col("a.o_totalprice").alias("price_a"),
            F.col("b.o_totalprice").alias("price_b"),
            (F.col("a.o_totalprice") == F.col("b.o_totalprice")).alias(
                "same_price"
            ),
        )
        .orderBy("o_custkey", "day", "key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# V16: MAD robust-dispersion outlier audit (r12)
# ---------------------------------------------------------------------------

_MAD_K = 3  # flag |x - median| > K * MAD (the classic Hampel cut)


@register(
    "dq_outlier_mad",
    oracle="WITH lat AS (SELECT o.o_orderpriority AS g, "
    "CAST(date_diff('day', CAST(o.o_orderdate AS DATE), "
    "CAST(l.l_shipdate AS DATE)) AS BIGINT) AS v "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), "
    "w AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM lat "
    "GROUP BY 1, 2), "
    "tot AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM w GROUP BY 1), "
    "r AS (SELECT g, v, cnt, CAST(sum(cnt) OVER (PARTITION BY g "
    "ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM w), "
    "med AS (SELECT r.g, min(v) AS med FROM r JOIN tot USING (g) "
    "WHERE 2 * cw >= n GROUP BY 1), "
    "d AS (SELECT w.g, abs(w.v - med.med) AS dq, w.cnt "
    "FROM w JOIN med USING (g)), "
    "dv AS (SELECT g, dq, CAST(sum(cnt) AS BIGINT) AS cnt FROM d "
    "GROUP BY 1, 2), "
    "r2 AS (SELECT g, dq, cnt, CAST(sum(cnt) OVER (PARTITION BY g "
    "ORDER BY dq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM dv), "
    "mad AS (SELECT r2.g, min(dq) AS madq FROM r2 JOIN tot USING (g) "
    "WHERE 2 * cw >= n GROUP BY 1), "
    "outl AS (SELECT d.g, CAST(sum(CASE WHEN d.dq > "
    f"{_MAD_K} * mad.madq THEN d.cnt ELSE 0 END) AS BIGINT) "
    "AS n_outliers FROM d JOIN mad USING (g) GROUP BY 1) "
    "SELECT tot.g AS o_orderpriority, tot.n AS n_rows, "
    "med.med AS median_days, mad.madq AS mad_days, outl.n_outliers "
    "FROM tot JOIN med USING (g) JOIN mad USING (g) "
    "JOIN outl USING (g) ORDER BY 1",
    doc="MAD robust-dispersion outlier audit (V16, r12): per order "
    "priority, the EXACT median order-to-ship latency, the EXACT "
    "median absolute deviation, and the count of lines beyond "
    f"{_MAD_K}-MAD — the Hampel-filter stuck-order gate on the "
    "heavily right-skewed latency distribution (p90 is ~45x the "
    "median here), where a z-score gate is useless because the mean "
    "and stddev are themselves dragged by the tail, and MAD's 50% "
    "breakdown point (vs the IQR audit V11's 25%) keeps the estimate "
    "honest even when a third of the feed is stuck.  Both medians "
    "use the lower-median convention (smallest value whose "
    "cumulative count reaches half) and latency is an INTEGER day "
    "count, so every compare — median pick, MAD pick, K-MAD cut — is "
    "exact integer arithmetic in both engines.  Scale: both "
    "cumulative-count passes ride the bucketed-rank machinery "
    "(sampled literal boundaries + per-bucket windows + broadcast "
    "prefix offsets, the A31/O1 two-pass discipline), so no "
    "single-partition window ever sees the value domain even when "
    "it is unbounded; the per-group medians broadcast (<= #groups "
    "rows) into scan-local joins, and the only data-scale shuffle "
    "is lineitem-orders on the natural orderkey.",
)
def q_dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_curate import _cumsum_from_buckets
    from .relational import quantile_bucketed

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    w = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("g"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Pass 1: exact lower median of v per group (bucketed cumsum; the
    # _pid flip matches A31 — quantile_bucketed's id DESCENDS).
    b1 = quantile_bucketed(w, "v", nb=32).withColumn(
        "_pid", F.lit(31) - F.col("_pid")
    )
    r1 = _cumsum_from_buckets(b1, ["g"], [F.col("v").asc()], F.col("cnt"), "cw")
    tot = b1.groupBy("g").agg(F.sum("cnt").cast("long").alias("n"))
    med = (
        r1.join(F.broadcast(tot), "g")
        .filter(F.lit(2) * F.col("cw") >= F.col("n"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    # Pass 2: exact lower median of the integer deviations.
    d = (
        b1.select("g", "v", "cnt")
        .join(F.broadcast(med), "g")
        .select("g", F.abs(F.col("v") - F.col("med")).alias("dq"), "cnt")
    )
    dv = d.groupBy("g", "dq").agg(F.sum("cnt").cast("long").alias("cnt"))
    b2 = quantile_bucketed(dv, "dq", nb=32).withColumn(
        "_pid", F.lit(31) - F.col("_pid")
    )
    r2 = _cumsum_from_buckets(
        b2, ["g"], [F.col("dq").asc()], F.col("cnt"), "cw"
    )
    mad = (
        r2.join(F.broadcast(tot), "g")
        .filter(F.lit(2) * F.col("cw") >= F.col("n"))
        .groupBy("g")
        .agg(F.min("dq").alias("madq"))
    )
    outl = (
        d.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.col("dq") > F.lit(_MAD_K) * F.col("madq"), F.col("cnt")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return (
        tot.join(med, "g")
        .join(mad, "g")
        .join(outl, "g")
        .select(
            F.col("g").alias("o_orderpriority"),
            F.col("n").alias("n_rows"),
            F.col("med").alias("median_days"),
            F.col("madq").alias("mad_days"),
            "n_outliers",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# V17: pattern/format conformance audit (r13)
# ---------------------------------------------------------------------------

# (rule, table, column, anchored regex).  Patterns are lookaround-free
# and anchored: Java regex (Spark rlike) and RE2 (DuckDB
# regexp_matches) are both search-semantics engines, so the ^...$
# anchors are what make "conforms" mean the WHOLE value on both.
_FORMAT_RULES = (
    ("customer_name_format", "customer", "c_name", r"^Customer#[0-9]{9}$"),
    ("part_brand_format", "part", "p_brand", r"^Brand#[0-9]{1,2}$"),
    ("orders_priority_format", "orders", "o_orderpriority",
     r"^[1-5]-[A-Z ]+$"),
    ("documents_lang_format", "documents", "lang", r"^[a-z]{2}$"),
    ("documents_source_format", "documents", "source", r"^src[0-9]+$"),
)


@register(
    "dq_format_conformance",
    oracle="SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{rule}' AS rule_name, "
        f"CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) FILTER (WHERE {col} IS NULL) AS BIGINT) AS n_null, "
        f"CAST(count(*) FILTER (WHERE {col} IS NOT NULL AND NOT "
        f"regexp_matches({col}, '{pat}')) AS BIGINT) AS n_violations "
        f"FROM {tbl}"
        for rule, tbl, col, pat in _FORMAT_RULES
    )
    + ") ORDER BY rule_name",
    doc="Pattern/format-conformance audit (V17, r13; the Deequ "
    "hasPattern / Great-Expectations match_regex rule type V1's "
    "range/domain/null constraints don't cover): per rule, total "
    "rows, NULLs (reported separately — a missing value is a "
    "completeness problem, not a format one), and non-NULL values "
    "failing the anchored regex — the parser-drift tripwire for "
    "identifier-shaped strings (entity id formats, code domains, "
    "source tags).  Patterns are anchored and lookaround-free so "
    "Java regex and RE2 agree by construction (the E25 stance).  "
    "Scale: one column-pruned scan per distinct table with ALL of "
    "that table's rules fused into a single aggregate (the V1 "
    "fusion); each rule crosses the network as one row; regexes "
    "evaluate scan-local in codegen.",
)
def q_dq_format_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_table: dict[str, list[tuple[str, str, str]]] = {}
    for rule, tbl, col, pat in _FORMAT_RULES:
        by_table.setdefault(tbl, []).append((rule, col, pat))
    legs = []
    for tbl, rules in by_table.items():
        t = load_table(spark, sf_dir, tbl).select(
            *sorted({col for _, col, _ in rules})
        )
        # every rule over this table in ONE aggregate pass
        agg = t.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.count(F.when(F.col(col).isNull(), 1)).alias(f"{rule}__null")
                for rule, col, _ in rules
            ],
            *[
                F.count(
                    F.when(
                        F.col(col).isNotNull()
                        & ~F.col(col).rlike(pat),
                        1,
                    )
                ).alias(f"{rule}__bad")
                for rule, col, pat in rules
            ],
        )
        for rule, _col, _pat in rules:
            legs.append(
                agg.select(
                    F.lit(rule).alias("rule_name"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"{rule}__null").alias("n_null"),
                    F.col(f"{rule}__bad").alias("n_violations"),
                )
            )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("rule_name")


# ---------------------------------------------------------------------------
# V18: per-stream freshness / staleness audit (r13)
# ---------------------------------------------------------------------------

_FRESH_STALE_HOURS = 72
_FRESH_WINDOW_DAYS = 7


def _epoch_us_expr(col_name: str) -> str:
    """SQL text for exact tz-free micros-since-epoch of an NTZ
    timestamp column (the E8 stance: unix_micros wants TIMESTAMP and
    an NTZ→TZ cast would route through the session timezone; this is
    a pure function of the wall time)."""
    return (
        f"(CAST(unix_date(CAST({col_name} AS DATE)) AS BIGINT) * 86400 "
        f"+ CAST(hour({col_name}) AS BIGINT) * 3600 "
        f"+ CAST(minute({col_name}) AS BIGINT) * 60) * 1000000 "
        f"+ CAST(extract(second FROM {col_name}) * 1000000 AS BIGINT)"
    )


@register(
    "dq_freshness",
    oracle="WITH mx AS (SELECT max(ts) AS m FROM events), "
    "agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total, "
    "max(ts) AS last_ts, "
    "CAST(sum(CASE WHEN ts > (SELECT m FROM mx) - INTERVAL "
    f"{_FRESH_WINDOW_DAYS} DAY THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_last_7d, "
    "CAST(sum(CASE WHEN ts <= (SELECT m FROM mx) - INTERVAL "
    f"{_FRESH_WINDOW_DAYS} DAY AND ts > (SELECT m FROM mx) - INTERVAL "
    f"{2 * _FRESH_WINDOW_DAYS} DAY THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_prev_7d "
    "FROM events GROUP BY 1), "
    "a2 AS (SELECT *, CAST((epoch_us((SELECT m FROM mx)) - "
    "epoch_us(last_ts)) // 3600000000 AS BIGINT) AS age_hours "
    "FROM agg) "
    "SELECT event_type, n_total, age_hours, n_last_7d, n_prev_7d, "
    "CASE WHEN n_prev_7d > 0 THEN "
    "round(CAST(n_last_7d AS DOUBLE) / n_prev_7d, 6) END AS trend_ratio, "
    f"age_hours >= {_FRESH_STALE_HOURS} AS is_stale "
    "FROM a2 ORDER BY event_type NULLS FIRST",
    doc="Per-stream freshness audit (V18, r13): for each event type — "
    "each upstream producer, in the reference's terms each SQS "
    "feed — the hours since its last event relative to the corpus "
    "high-water mark, trailing-week volume vs the week before "
    "(NULL-guarded ratio), and a stale flag at "
    f"{_FRESH_STALE_HOURS}h — the pipeline-is-silently-down monitor "
    "that catches a dead producer BEFORE the drift audits (V2-V5) "
    "can see a distribution to compare: a feed that stops emitting "
    "drifts nothing, it just goes quiet.  Engine: two column-pruned "
    "scans — the 1-row high-water mark, then every measure fused "
    "into a single conditional aggregate (the V1 fusion stance) "
    "against that broadcast row; age is "
    "exact tz-free epoch-microsecond arithmetic floor-divided to "
    "hours (engine-neutral — timestampdiff/datediff hour semantics "
    "differ between engines, epoch arithmetic does not); NULLS FIRST "
    "declared on the type ordering (the win_distribution lesson).  "
    "Scale: aggregate output is one row per event type; the only "
    "exchange is the #types-row final merge.",
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    return freshness_report(e)


def freshness_report(e: DataFrame) -> DataFrame:
    """V18 body over any (event_type, ts) frame — factored out so the
    semantics test can drive it with hand-built streams of known
    staleness."""
    mx = e.agg(F.max("ts").alias("_mx"))
    win = F.expr(f"INTERVAL {_FRESH_WINDOW_DAYS} DAYS")
    win2 = F.expr(f"INTERVAL {2 * _FRESH_WINDOW_DAYS} DAYS")
    agg = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.max("ts").alias("_last"),
            F.max("_mx").alias("_m"),
            F.sum(
                F.when(F.col("ts") > F.col("_mx") - win, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_last_7d"),
            F.sum(
                F.when(
                    (F.col("ts") <= F.col("_mx") - win)
                    & (F.col("ts") > F.col("_mx") - win2),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_prev_7d"),
        )
        .withColumn(
            "age_hours",
            F.expr(
                f"(({_epoch_us_expr('_m')}) - ({_epoch_us_expr('_last')})) "
                "div 3600000000"
            ),
        )
    )
    return agg.select(
        "event_type",
        "n_total",
        "age_hours",
        "n_last_7d",
        "n_prev_7d",
        F.when(
            F.col("n_prev_7d") > 0,
            F.round(
                F.col("n_last_7d").cast("double") / F.col("n_prev_7d"), 6
            ),
        ).alias("trend_ratio"),
        (F.col("age_hours") >= _FRESH_STALE_HOURS).alias("is_stale"),
    ).orderBy(F.col("event_type").asc_nulls_first())

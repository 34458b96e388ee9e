"""Window functions (SURVEY.md §2.5, W1-W4).

All frames carry a deterministic total order (unique tiebreaker) so
results are engine-stable.  Windowed double sums follow the decimal
policy (frame accumulation order is engine-defined otherwise).

Scale note: every window here partitions by a real key (nation, user,
brand) — one shuffle per distinct partitioning, state bounded by
partition. No global (unpartitioned) windows on fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.core import epoch_seconds
from ..functions.numeric import quant, sql_quant
from ..registry import register
from ..tables import load_table


@register(
    "win_rank",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal, "
    "CAST(row_number() OVER w AS BIGINT) AS rn, "
    "CAST(rank() OVER w AS BIGINT) AS rnk, "
    "CAST(dense_rank() OVER w AS BIGINT) AS drnk, "
    "CAST(ntile(4) OVER w AS BIGINT) AS quartile "
    "FROM customer WINDOW w AS (PARTITION BY c_nationkey "
    "ORDER BY c_acctbal DESC, c_custkey)",
    doc="Ranking family (W1).",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="SELECT user_id, event_id, ts, "
    "lag(ts) OVER w AS prev_ts, lead(ts) OVER w AS next_ts, "
    "CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
    doc="Analytic lag/lead (W2): per-user event gaps in seconds.",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events").withColumn(
        "_es", epoch_seconds(F.col("ts"))
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.col("_es") - F.lag("_es").over(w)).alias("gap_s"),
    )


@register(
    "win_running_sum",
    oracle="SELECT user_id, event_id, ts, value, "
    f"CAST(sum({sql_quant('value')}) OVER (PARTITION BY user_id "
    "  ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  AS DOUBLE) / 10000.0 AS running_value, "
    f"CAST(sum({sql_quant('value')}) OVER (PARTITION BY user_id "
    "  ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) "
    "  / 10000.0 / CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg_5 "
    "FROM events",
    doc="Frame specs (W3): running sum + 5-row moving average.",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-4, Window.currentRow)
    e = load_table(spark, sf_dir, "events")
    vq = quant("value")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.sum(vq).over(run).cast("double") / 10000.0).alias("running_value"),
        (
            F.sum(vq).over(mov).cast("double")
            / 10000.0
            / F.count(F.lit(1)).over(mov).cast("double")
        ).alias("moving_avg_5"),
    )


@register(
    "win_topk_per_group",
    oracle="SELECT p_brand, p_partkey, p_name, p_retailprice FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY p_brand "
    "    ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part) "
    "WHERE rn <= 3",
    doc="Top-k per group (W4) — also the engine's upsert/'latest "
    "version' primitive (S6). At scale: partial per-partition top-k "
    "before the shuffle keeps state bounded.",
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        load_table(spark, sf_dir, "part")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "win_rolling_time",
    oracle="WITH e AS (SELECT user_id, event_id, ts, value, "
    "date_diff('second', TIMESTAMP '1970-01-01', ts) AS epoch_s "
    "FROM events) "
    "SELECT user_id, event_id, CAST(epoch_s AS BIGINT) AS epoch_s, "
    f"CAST(sum({sql_quant('value')}) OVER w AS DOUBLE) / 10000.0 "
    "AS value_7d, "
    "CAST(count(*) OVER w AS BIGINT) AS n_7d "
    "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s "
    "RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)",
    doc="Time-RANGE rolling window (W5): per-user trailing-7-day spend "
    "and event count — the frame is bounded by event TIME (RANGE over "
    "epoch seconds), not row count, so sparse and dense histories get "
    "the same semantics; this is the windowed form of the fraud/"
    "velocity checks a checkout pipeline runs per user. One uniform "
    "user_id shuffle; rows that share a second share a frame (RANGE "
    "semantics make the tie deterministic without an id tiebreak); "
    "sums via the decimal policy so frame accumulation order cannot "
    "leak engine differences.",
)
def q_win_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "epoch_s", epoch_seconds(F.col("ts")).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-604800, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "epoch_s",
        (F.sum(quant("value")).over(w).cast("double") / 10000.0).alias(
            "value_7d"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
    )


# ---------------------------------------------------------------------------
# W6: forward-fill / LOCF gap repair (r13)
# ---------------------------------------------------------------------------


@register(
    "win_gap_fill_locf",
    oracle="WITH m AS (SELECT user_id, event_id, ts, "
    "CAST(ts AS DATE) AS day, "
    "CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked "
    "FROM events), "
    "f AS (SELECT day, masked, "
    "last_value(masked IGNORE NULLS) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS filled FROM m) "
    "SELECT day, "
    "CAST(sum(CASE WHEN masked IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_readings, "
    "CAST(sum(CASE WHEN masked IS NULL AND filled IS NOT NULL "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_filled, "
    "CAST(sum(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_unfillable, "
    "round(CAST(sum(CAST(floor(filled * 10000.0 + 0.5) AS "
    "DECIMAL(25,0))) AS DOUBLE) / 10000.0, 4) AS sum_filled "
    "FROM f GROUP BY 1 ORDER BY 1",
    doc="Forward-fill / last-observation-carried-forward (W6, r13): "
    "the gap-repair window shape W1-W5 don't cover — `last(..., "
    "ignorenulls=True)` over a running frame, the standard repair "
    "for sensor feeds and slowly-changing attributes before "
    "aggregation.  Missingness is SYNTHESIZED deterministically "
    "(error events carry no usable reading — their value is masked "
    "NULL, then each user's stream fills forward from the previous "
    "good reading), because the pristine corpus has no NULL "
    "measures; the NULL-injection sweep then exercises the same path "
    "with REAL nulls.  Per day: surviving raw readings, repaired "
    "gaps, unfillable rows (an error before the user's first good "
    "reading stays NULL — LOCF never invents data), and the "
    "decimal-policy sum of the filled series.  Engine: ONE user_id "
    "shuffle serves the fill window; IGNORE NULLS semantics are "
    "declared identically on both engines (Spark last(ignorenulls) "
    "== DuckDB last_value(x IGNORE NULLS) over the same "
    "rows-unbounded-preceding frame, same (ts, event_id) total "
    "order); the day rollup is calendar-keyed.  Scale: window state "
    "is one scalar per user; no global window, no sort beyond the "
    "per-user frame.",
)
def q_win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return gap_fill_daily(e)


def gap_fill_daily(e: DataFrame) -> DataFrame:
    """W6 body over any (user_id, event_id, ts, event_type, value)
    frame — factored out so the semantics test can drive it with
    hand-built gap patterns (error-first users, repeated gaps)."""
    from ..functions.numeric import dsum

    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    f = e.select(
        F.col("ts").cast("date").alias("day"),
        masked.alias("masked"),
        F.last(masked, ignorenulls=True).over(w).alias("filled"),
    )
    return (
        f.groupBy("day")
        .agg(
            F.sum(F.when(F.col("masked").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_readings"),
            F.sum(
                F.when(
                    F.col("masked").isNull() & F.col("filled").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_filled"),
            F.sum(F.when(F.col("filled").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unfillable"),
            F.round(dsum("filled"), 4).alias("sum_filled"),
        )
        .orderBy("day")
    )

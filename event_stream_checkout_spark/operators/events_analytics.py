"""Product-analytics operators over the event stream (SURVEY.md §2
extension family E1-E3): ordered funnel, cohort retention, and
last-touch attribution.

The reference's event stream carries checkout lifecycle events
(OrderCreated → OrderProcessed, README.md golden scenarios); these
operators are the standard analytics a team runs OVER such a stream —
conversion funnels, cohort retention triangles, and attribution of a
terminal event to the preceding touchpoint.  They complete the
"event-stream analytics" story next to the windowed/sessionized
aggregations in streaming_analogues.

Scale stances:
- Everything keys on ``user_id`` — high-cardinality, uniform — so every
  shuffle here hash-partitions evenly; no global windows anywhere.
- Funnel stages are progressive per-user MIN-aggregations joined on
  user_id (each stage's frame is one slim row per surviving user),
  never a per-user sort of full histories.
- Attribution uses one per-user window pass (single shuffle); the
  carried state is one column, not the event list.
- All outputs are integers, timestamps, or dsum-stabilized doubles —
  engine-exact for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import register
from ..tables import load_table

# Funnel definition: entry → middle → terminal, each later stage
# strictly after the previous one and inside a 7-day window anchored
# at the user's funnel ENTRY (the first view).
_FUNNEL_STAGES = ("view", "click", "purchase")
_FUNNEL_WINDOW_DAYS = 7


@register(
    "evt_funnel",
    oracle="WITH s1 AS (SELECT user_id, min(ts) AS ts1 FROM events "
    f"WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, max(s1.ts1) AS ts1, min(e.ts) AS ts2 "
    "FROM events e JOIN s1 ON e.user_id = s1.user_id "
    f"WHERE e.event_type = '{_FUNNEL_STAGES[1]}' AND e.ts > s1.ts1 "
    f"AND e.ts <= s1.ts1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY GROUP BY 1), "
    "s3 AS (SELECT e.user_id, min(e.ts) AS ts3 "
    "FROM events e JOIN s2 ON e.user_id = s2.user_id "
    f"WHERE e.event_type = '{_FUNNEL_STAGES[2]}' AND e.ts > s2.ts2 "
    f"AND e.ts <= s2.ts1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY GROUP BY 1) "
    f"SELECT '1_{_FUNNEL_STAGES[0]}' AS stage, "
    "CAST(count(*) AS BIGINT) AS n_users FROM s1 "
    f"UNION ALL SELECT '2_{_FUNNEL_STAGES[1]}', CAST(count(*) AS BIGINT) "
    "FROM s2 "
    f"UNION ALL SELECT '3_{_FUNNEL_STAGES[2]}', CAST(count(*) AS BIGINT) "
    "FROM s3",
    doc="Ordered conversion funnel (E1): how many users did "
    "view → click → purchase IN ORDER, each step strictly after the "
    "previous and within 7 days of funnel entry. Computed as "
    "progressive per-user MIN aggregations — stage k's frame is one "
    "slim (user, ts) row per user still in the funnel, joined to the "
    "next stage's events on user_id — so no per-user event history is "
    "ever sorted or collected; every shuffle keys on the uniform "
    "user_id. The event scan is filtered to one stage's type per leg "
    "(predicate reaches the parquet scan). Timestamps are exact, so "
    "the whole funnel is hash-checkable.",
)
def q_evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    win = f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAY"
    s1 = (
        e.filter(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    s2 = (
        e.filter(F.col("event_type") == _FUNNEL_STAGES[1])
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("ts1"))
            & (F.col("ts") <= F.expr(f"ts1 + {win}"))
        )
        .groupBy("user_id")
        .agg(F.max("ts1").alias("ts1"), F.min("ts").alias("ts2"))
    )
    s3 = (
        e.filter(F.col("event_type") == _FUNNEL_STAGES[2])
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("ts2"))
            & (F.col("ts") <= F.expr(f"ts1 + {win}"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )

    def stage_count(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage_count(s1, f"1_{_FUNNEL_STAGES[0]}")
        .unionAll(stage_count(s2, f"2_{_FUNNEL_STAGES[1]}"))
        .unionAll(stage_count(s3, f"3_{_FUNNEL_STAGES[2]}"))
    )


@register(
    "evt_retention",
    oracle="WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS d0 "
    "FROM events GROUP BY 1), "
    "act AS (SELECT DISTINCT e.user_id, strftime(f.d0, '%Y-%m-%d') AS cohort, "
    "  date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS week_offset "
    "FROM events e JOIN f ON e.user_id = f.user_id) "
    "SELECT cohort, CAST(week_offset AS BIGINT) AS week_offset, "
    "CAST(count(*) AS BIGINT) AS n_users FROM act GROUP BY 1, 2",
    doc="Cohort retention triangle (E2): users are cohorted by their "
    "first-ever event date; for each (cohort, weeks-since-first) cell, "
    "count the distinct users still active — the standard retention "
    "matrix. Two uniform user_id shuffles (first-event min, then the "
    "distinct pre-collapse); the (user, cohort, offset) DISTINCT "
    "collapses each user's arbitrarily long event history to at most "
    "#weeks rows BEFORE the final small aggregate, so a power user "
    "with 10^6 events contributes the same rows as anyone else — the "
    "same pre-collapse-beats-skew pattern as llm_vocabulary. Day "
    "arithmetic on DATEs (integer), engine-exact.",
)
def q_evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    act = (
        e.join(f, "user_id")
        .select(
            "user_id",
            F.date_format("d0", "yyyy-MM-dd").alias("cohort"),
            F.expr("datediff(to_date(ts), d0) div 7").alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "evt_attribution",
    oracle="WITH w AS (SELECT user_id, event_type, ts, value, "
    "  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END "
    "    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_type "
    "  FROM events) "
    "SELECT coalesce(prev_type, 'none') AS channel, "
    "CAST(count(*) AS BIGINT) AS n_purchases, "
    f"{sql_dsum('value')} AS total_value "
    "FROM w WHERE event_type = 'purchase' GROUP BY 1",
    doc="Last-touch attribution (E3): every purchase is credited to "
    "the user's most recent PRECEDING non-purchase event type (the "
    "touchpoint), 'none' if the purchase opens the history — the "
    "as-of-join shape expressed as ONE per-user window pass: "
    "last_value(... IGNORE NULLS) over (user, time) carries exactly "
    "one column of state, so the whole op costs a single uniform "
    "user_id shuffle regardless of history length (vs a per-purchase "
    "range self-join, which would re-scan each user's history per "
    "purchase). Deterministic (event_id tiebreak); value totals via "
    "the engine's stable-sum policy.",
)
def q_evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("prev_type", prev)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("prev_type", F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# E4: sessionization + top navigation paths
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30
_PATH_TOPK = 30


@register(
    "evt_session_paths",
    oracle="WITH seq AS (SELECT user_id, event_id, event_type, ts, "
    "CASE WHEN lag(ts) OVER w IS NULL OR "
    f"ts > lag(ts) OVER w + INTERVAL {_SESSION_GAP_MIN} MINUTE "
    "THEN 1 ELSE 0 END AS new_sess FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM seq), "
    "paths AS (SELECT user_id, sess_id, "
    "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
    "FROM sess GROUP BY 1, 2) "
    "SELECT path, CAST(count(*) AS BIGINT) AS n_sessions, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM paths "
    f"GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}",
    doc="Sessionization + top navigation paths (E4): split each "
    "user's stream into sessions at 30-minute inactivity gaps "
    "(lag + running sum of boundary flags — the standard gap "
    "sessionizer), concatenate each session's event types in time "
    "order into a path string, and rank the most common paths — the "
    "'how do users actually move through checkout' query. ONE "
    "user_id shuffle serves the lag window, the session-id prefix "
    "sum AND the per-session fold (all three key on user_id or a "
    "superset); path assembly is array_sort(collect_list(struct)) — "
    "deterministic by (ts, event_id) — then a transform+array_join, "
    "never a per-event UDF; the final ranking is a TakeOrdered over "
    "the tiny distinct-path frame. Scale note: per-session arrays "
    "are bounded by session length (human-scale, ≤ hundreds), not "
    "history length — the gap sessionizer's whole point at 100 TB.",
)
def q_evt_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    paths = session_paths(e)
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOPK)
    )


def session_paths(e: DataFrame, with_start: bool = False) -> DataFrame:
    """(user_id, sess_id, path) gap-sessionized frame — factored out
    of the registered query so the streaming equivalence test can pin
    the batch sessionizer row-identical to its ``session_window``
    streaming twin (tests/test_streaming.py, the T9 pattern).
    Boundary semantics: an event at EXACTLY prev_ts + gap stays in
    the session here (strict > opens a new one), matching
    ``session_window``'s half-open [start, last+gap) eviction only up
    to that measure-zero boundary — the equivalence test runs on the
    microsecond-timestamped corpus where exact-gap collisions don't
    occur."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + gap),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = e.withColumn("sess_id", sess_id)
    aggs = [
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    ]
    if with_start:
        # session start for date-bucketed consumers (E25); opt-in so
        # E4's output and its streaming-equivalence pin are untouched
        aggs.append(F.min("ts").alias("sess_start"))
    return sessions.groupBy("user_id", "sess_id").agg(*aggs)


# ---------------------------------------------------------------------------
# E5: activity streaks (gaps-and-islands)
# ---------------------------------------------------------------------------

_STREAK_TOPK = 25


@register(
    "evt_activity_streaks",
    oracle="WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d "
    "FROM events), "
    "isl AS (SELECT user_id, d, d - CAST(row_number() OVER "
    "(PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp FROM days), "
    "streaks AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS "
    "streak_days, min(d) AS start_day FROM isl GROUP BY 1, 2), "
    "best AS (SELECT *, row_number() OVER (PARTITION BY user_id "
    "ORDER BY streak_days DESC, start_day) AS rn FROM streaks) "
    "SELECT user_id, streak_days, start_day FROM best WHERE rn = 1 "
    f"ORDER BY streak_days DESC, user_id LIMIT {_STREAK_TOPK}",
    doc="Longest activity streak per user (E5, gaps-and-islands): "
    "distinct active days per user, islands of consecutive dates via "
    "the classic date-minus-row_number grouping key, longest island "
    "per user, global top-25. Everything keys on user_id — the "
    "distinct-day collapse (map-side partial), the island window and "
    "the per-user argmax share ONE uniform shuffle — and the final "
    "ranking is a TakeOrdered over one row per user. The "
    "gaps-and-islands trick matters at scale precisely because it "
    "turns 'find consecutive runs' (a sequential scan per user) into "
    "a stateless per-row expression + groupBy.",
)
def q_evt_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    isl = days.withColumn(
        "grp", F.expr("date_sub(d, CAST(row_number() OVER "
                      "(PARTITION BY user_id ORDER BY d) AS INT))")
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("start_day"),
    )
    best = (
        streaks.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("streak_days").desc(), "start_day"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "start_day")
    )
    return best.orderBy(
        F.col("streak_days").desc(), "user_id"
    ).limit(_STREAK_TOPK)


# ---------------------------------------------------------------------------
# E7: first-order Markov transition matrix of event types
# ---------------------------------------------------------------------------


@register(
    "evt_markov_transitions",
    oracle="WITH seq AS (SELECT user_id, event_type AS cur_type, "
    "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS next_type FROM events), "
    "pairs AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n "
    "FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2), "
    "totals AS (SELECT cur_type, CAST(sum(n) AS BIGINT) AS total "
    "FROM pairs GROUP BY 1) "
    "SELECT p.cur_type, p.next_type, p.n, "
    "round(CAST(p.n AS DOUBLE) / t.total, 6) AS p "
    "FROM pairs p JOIN totals t ON p.cur_type = t.cur_type",
    doc="First-order Markov transition matrix (E7): for each user's "
    "time-ordered stream, count (current → next) event-type "
    "transitions and normalize per current state — the user-journey "
    "model behind next-action prediction and funnel leak analysis. "
    "One user_id window pass (lead carries one column), pair counts "
    "collapse map-side to ≤ #types² rows, and the normalizing totals "
    "join is #types rows broadcast. Probabilities are a single "
    "BIGINT/BIGINT double division — identical IEEE trees, rounded "
    "1e-6 for the hash.",
)
def q_evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("cur_type").agg(F.sum("n").alias("total"))
    return pairs.join(F.broadcast(totals), "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# E8: RFM (recency / frequency / monetary) user segmentation
# ---------------------------------------------------------------------------

_RFM_BUCKETS = 4


def _idiv(a, d):
    """Exact integer floor-division of two non-negative long Columns.
    Spark's `/` is always fractional; subtracting the remainder first
    makes the dividend an exact multiple, so the double division is
    exact for any quotient < 2^53 (no floor-of-.9999 off-by-one)."""
    return ((a - (a % d)) / d).cast("long")


def _ntile_from_rank(pos, n, k: int):
    """ntile(k) recovered scan-locally from a 1-based global rank:
    with q = n div k and r = n mod k, SQL ntile gives the first r
    tiles q+1 rows and the rest q rows.  Rows ranked <= r*(q+1) fall
    in tile 1 + (pos-1) div (q+1); the rest in
    r + 1 + (pos - r*(q+1) - 1) div q.  greatest(q, 1) guards the
    (never-taken) second branch when n < k.  Cast to int to match the
    engine/oracle ntile output type."""
    q = _idiv(n, F.lit(k))
    r = n % F.lit(k)
    cut = r * (q + F.lit(1))
    big = _idiv(pos - 1, q + F.lit(1)) + F.lit(1)
    small = r + _idiv(pos - cut - 1, F.greatest(q, F.lit(1))) + F.lit(1)
    return F.when(pos <= cut, big).otherwise(small).cast("int")


@register(
    "evt_rfm_segments",
    oracle="WITH base AS (SELECT user_id, max(ts) AS last_ts, "
    "CAST(count(*) AS BIGINT) AS frequency, "
    "(CAST(SUM(CAST(floor(value * 10000.0 + 0.5) AS DECIMAL(25,0))) "
    "AS DOUBLE) / 10000.0) AS monetary FROM events "
    "WHERE event_type = 'purchase' GROUP BY 1), "
    "scored AS (SELECT user_id, "
    f"ntile({_RFM_BUCKETS}) OVER (ORDER BY last_ts DESC, user_id) AS r, "
    f"ntile({_RFM_BUCKETS}) OVER (ORDER BY frequency DESC, user_id) AS f, "
    f"ntile({_RFM_BUCKETS}) OVER (ORDER BY monetary DESC, user_id) AS m "
    "FROM base) "
    "SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_users FROM scored "
    "GROUP BY 1, 2, 3",
    doc="RFM segmentation (E8): purchasing users quartiled on "
    "recency (last purchase), frequency (purchase count), and "
    "monetary (stable-sum spend), reported as (r, f, m) cell sizes — "
    "the classic customer-value grid. Determinism: each quartile "
    "orders by (measure, user_id) so ties split identically on any "
    "engine. Scale (r7 verdict item 1): the per-user frame is the "
    "column that grows with the business, so NO global ntile window "
    "touches it — each measure goes through the two-pass bucketed "
    "rank (quantile_bucketed sampled boundaries + rank_from_buckets, "
    "relational.py:516,539), and the EXACT ntile id is recovered "
    "scan-locally from the global rank via the closed form "
    "tile(rk, n, k): the first n%k tiles hold ceil(n/k) rows, the "
    "rest floor(n/k) — bit-identical to the oracle's ntile on any "
    "partitioning because the rank itself is exact. The only "
    "unpartitioned windows run over the O(#buckets) prefix-count "
    "frames; the three per-measure tile frames re-meet on user_id "
    "(uniform high-cardinality shuffle joins). recency ranks on "
    "unix_micros(last_ts) — a strictly monotone recode, so the DESC "
    "order is unchanged while percentile_approx gets a numeric "
    "column.",
)
def q_evt_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import quantile_bucketed, rank_from_buckets

    e = load_table(spark, sf_dir, "events")
    base = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("value").alias("monetary"),
        )
        # Exact tz-free micros-since-epoch for the NTZ timestamp
        # (unix_micros wants TIMESTAMP; an NTZ->TZ cast would route
        # through the session timezone and could collide across a DST
        # gap): days*86400 + wall-clock h/m + fractional-second
        # decimal, all pure functions of the wall time.
        .withColumn(
            "last_ts_us",
            (
                F.unix_date(F.col("last_ts").cast("date")).cast("long")
                * 86400
                + F.hour("last_ts").cast("long") * 3600
                + F.minute("last_ts").cast("long") * 60
            )
            * 1_000_000
            + (F.expr("extract(second from last_ts)") * 1_000_000).cast(
                "long"
            ),
        )
        # Pinned: feeds three bucketing passes + the n-count agg; the
        # events scan and the per-user aggregate execute exactly once.
        .localCheckpoint()
    )
    nf = base.agg(F.count(F.lit(1)).alias("_n"))

    def scored(col: str, tag: str) -> DataFrame:
        bucketed = quantile_bucketed(base.select("user_id", col), col, nb=32)
        ranked = rank_from_buckets(
            bucketed, [F.col(col).desc(), F.col("user_id")]
        )
        return ranked.crossJoin(F.broadcast(nf)).select(
            "user_id",
            _ntile_from_rank(
                F.col("pos"), F.col("_n"), _RFM_BUCKETS
            ).alias(tag),
        )

    grid = (
        scored("last_ts_us", "r")
        .join(scored("frequency", "f"), "user_id")
        .join(scored("monetary", "m"), "user_id")
    )
    return grid.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# E9: EWMA-smoothed daily series
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.2
_EWMA_DELEGATE_LEN = 1024  # observed days per type above which E9 delegates to E9b


@register(
    "evt_ewma_daily",
    oracle="WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type "
    "ORDER BY day) AS BIGINT) AS rn FROM daily), "
    "terms AS (SELECT a.event_type, a.day, a.n, a.rn, "
    "CASE WHEN b.rn = 1 THEN "
    f"pow({1 - _EWMA_ALPHA}, a.rn - 1) * b.n "
    f"ELSE {_EWMA_ALPHA} * pow({1 - _EWMA_ALPHA}, a.rn - b.rn) * b.n END "
    "AS term FROM ranked a JOIN ranked b "
    "ON a.event_type = b.event_type AND b.rn <= a.rn) "
    "SELECT event_type, day, n, "
    f"round({sql_dsum('term')}, 6) AS ewma "
    "FROM terms GROUP BY 1, 2, 3",
    doc="EWMA-smoothed daily event series (E9): the exponentially "
    "weighted moving average s_t = α·x_t + (1−α)·s_{t−1} (α=0.2, "
    "s_1 = x_1) over each event type's daily counts — the smoothed "
    "baseline ops teams alert against (the recursive complement of "
    "evt_anomaly's global z-score: EWMA adapts to level shifts, "
    "z-scores don't). The recursion is EXPANDED to its closed form "
    "— s_t = (1−α)^(t−1)·x_1 + α·Σ_j (1−α)^(t−j)·x_j — because SQL "
    "window frames cannot express feedback; each term is an "
    "identical pow()/multiply tree on both engines and the per-day "
    "sum goes through the fixed-point policy, so order of summation "
    "cannot break the hash. Shape: the daily rollup collapses "
    "map-side; the rank window partitions by event_type (never "
    "partition-less); the closed form joins the series to itself "
    "WITHIN each type — O(len²) pairs where len is bounded by the "
    "TIME DOMAIN (a decade is 3.6k days ⇒ ~13M slim pairs per "
    "type), not by event volume. The graded key is ALWAYS this "
    "closed form — engine and oracle cannot silently diverge "
    "(ADVICE r9: the old in-key delegation switched engines above "
    "1024 observed days while the oracle stayed closed-form, and "
    "paid an eager pre-action collect on every construction). "
    "Long-horizon callers use ewma_daily_auto() (explicit opt-in "
    "crossover to E9b's chunk-and-carry plan), and the delegation "
    "REGIME itself is graded under evt_ewma_long, whose synthesized "
    "1500-day domain makes the auto helper pick the chunked plan "
    "under the chunked oracle.",
)
def q_evt_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return _ewma_plain_from_daily(daily)


def ewma_daily_auto(
    daily: DataFrame, delegate_above: int = _EWMA_DELEGATE_LEN
) -> DataFrame:
    """Crossover EWMA over a (event_type, day, n) rollup: the
    closed-form plan (len² pairs per type) up to ``delegate_above``
    observed days per type, the E9b chunk-and-carry plan beyond it
    (r8 verdict item 5; crossover measured by tools/ewma_crossover.py).

    EXPLICIT opt-in, not the graded path (ADVICE r9): the two plans'
    quantization nesting differs at ~1e-3 (pinned by
    tests/test_variant_equivalence.py), so a key graded against the
    closed-form oracle must never silently switch engines.  The one
    slim pre-action below runs on the map-side-collapsed rollup
    (#types rows), a cost the caller accepts by calling this.
    """
    max_len = (
        daily.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("len"))
        .agg(F.max("len").alias("m"))
        .collect()[0]["m"]
    ) or 0
    if max_len > delegate_above:
        return _ewma_chunked_from_daily(daily)
    return _ewma_plain_from_daily(daily)


def _ewma_plain_from_daily(daily: DataFrame) -> DataFrame:
    """E9's direct closed-form plan (len² pairs per type) over a
    (event_type, day, n) rollup — factored so tools/ewma_crossover.py
    can time it beyond the delegation threshold."""
    w = Window.partitionBy("event_type").orderBy("day")
    ranked = daily.withColumn("rn", F.row_number().over(w).cast("long"))
    a = ranked.alias("a")
    b = ranked.alias("b")
    decay = F.lit(1.0 - _EWMA_ALPHA)
    term = F.when(
        F.col("b.rn") == 1,
        F.pow(decay, F.col("a.rn") - 1) * F.col("b.n"),
    ).otherwise(
        F.lit(_EWMA_ALPHA)
        * F.pow(decay, F.col("a.rn") - F.col("b.rn"))
        * F.col("b.n")
    )
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.rn") <= F.col("a.rn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("day"),
        F.col("a.n").alias("n"),
        term.alias("term"),
    )
    return pairs.groupBy("event_type", "day", "n").agg(
        F.round(dsum("term"), 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# E9b: chunk-and-carry EWMA (parallel linear-recurrence scan)
# ---------------------------------------------------------------------------

_EWMA_CHUNK = 16  # observed days per chunk


_EWMA_DAILY_SQL = (
    "SELECT event_type, CAST(ts AS DATE) AS day, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2"
)


def _sql_ewma_chunked_oracle(daily_sql: str = _EWMA_DAILY_SQL) -> str:
    a = _EWMA_ALPHA
    da = 1 - a
    return (
        f"WITH daily AS ({daily_sql}), "
        "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY "
        "event_type ORDER BY day) AS BIGINT) AS rn FROM daily), "
        f"ch AS (SELECT *, (rn - 1) // {_EWMA_CHUNK} AS g FROM ranked), "
        # within-chunk partial P_t (coef 1 for the global first point)
        "pt AS (SELECT a.event_type, a.day, a.n, a.rn, a.g, "
        + sql_dsum(
            f"(CASE WHEN b.rn = 1 THEN 1.0 ELSE {a} END) * "
            f"pow({da}, a.rn - b.rn) * b.n"
        )
        + " AS p FROM ch a JOIN ch b ON a.event_type = b.event_type "
        "AND a.g = b.g AND b.rn <= a.rn "
        "GROUP BY a.event_type, a.day, a.n, a.rn, a.g), "
        # chunk summary: end position and end partial
        "cs AS (SELECT event_type, g, max(rn) AS rnend, "
        "max(CASE WHEN rn = rnend2 THEN p END) AS b FROM ("
        "  SELECT *, max(rn) OVER (PARTITION BY event_type, g) AS rnend2 "
        "  FROM pt) GROUP BY 1, 2), "
        # boundary EWMA via the collapsed prefix (powers of one base):
        # s0_g = sum_{h<=g} B_h * (1-a)^(rnend_g - rnend_h)
        "s0 AS (SELECT x.event_type, x.g, "
        + sql_dsum(f"y.b * pow({da}, x.rnend - y.rnend)")
        + " AS s0, max(x.rnend) AS rnend "
        "FROM cs x JOIN cs y ON x.event_type = y.event_type "
        "AND y.g <= x.g GROUP BY x.event_type, x.g), "
        # carry INTO each chunk = previous chunk's boundary EWMA
        "carry AS (SELECT event_type, g + 1 AS g, s0 AS c, rnend AS crn "
        "FROM s0) "
        "SELECT pt.event_type, pt.day, pt.n, "
        f"round(COALESCE(pow({da}, pt.rn - carry.crn) * carry.c, 0.0) "
        "+ pt.p, 6) AS ewma "
        "FROM pt LEFT JOIN carry ON pt.event_type = carry.event_type "
        "AND pt.g = carry.g"
    )


@register(
    "evt_ewma_chunked",
    oracle=_sql_ewma_chunked_oracle(),
    doc="Chunk-and-carry EWMA (E9b — the r9-queue long-horizon "
    "upgrade of E9, closed early): the EWMA recursion is a linear "
    "recurrence s_t = a·x_t + (1−a)·s_{t−1}, and linear recurrences "
    "admit a PARALLEL PREFIX (Blelloch-scan) evaluation — cut each "
    "series into 16-observation chunks, compute within-chunk "
    "partials independently (pair joins of C² instead of len² — the "
    "whole point: E9's closed form is quadratic in series length, "
    "this is quadratic only in CHUNK length), then solve the "
    "chunk-boundary recurrence s0_g = A_g·s0_{g−1} + B_g in one "
    "pass over the #chunks-sized frame. The decisive algebra: every "
    "A_g is a power of the SAME base (1−a)^{m_g}, so the prefix "
    "PRODUCTS collapse to (1−a)^(rank difference) and the boundary "
    "solution is itself a small weighted prefix sum — no sequential "
    "scan anywhere, every stage is a bounded pair join or a "
    "per-(type, chunk) window. Fixed-point sums and identical pow "
    "trees keep both engines bit-equal; the variant-equivalence "
    "test pins chunked ≈ plain E9 to 1e-3 (they differ only in "
    "quantization nesting order).",
)
def q_evt_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return _ewma_chunked_from_daily(daily)


def _ewma_chunked_from_daily(daily: DataFrame) -> DataFrame:
    """Chunk-and-carry EWMA plan over a (event_type, day, n) rollup —
    shared by the registered E9b key and E9's long-horizon delegation
    (r8 verdict item 5)."""
    a, da = _EWMA_ALPHA, 1.0 - _EWMA_ALPHA
    w = Window.partitionBy("event_type").orderBy("day")
    # Pinned: the chunked frame feeds both pair-join legs and the
    # chunk-summary branch — unpinned, each consumer re-runs the
    # events scan (6 scans observed in the executed plan); the frame
    # itself is TIME-DOMAIN bounded (#days x #types rows), so the
    # checkpoint is trivially small.
    ch = (
        daily.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("g", ((F.col("rn") - 1) / _EWMA_CHUNK).cast("long"))
        .localCheckpoint()
    )

    ca, cb = ch.alias("a"), ch.alias("b")
    coef = F.when(F.col("b.rn") == 1, F.lit(1.0)).otherwise(F.lit(a))
    term = coef * F.pow(F.lit(da), F.col("a.rn") - F.col("b.rn")) * F.col("b.n")
    pt = (
        ca.join(
            cb,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("b.rn") <= F.col("a.rn")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day"),
            F.col("a.n").alias("n"),
            F.col("a.rn").alias("rn"),
            F.col("a.g").alias("g"),
        )
        .agg(dsum(term).alias("p"))
    )
    wg = Window.partitionBy("event_type", "g")
    cs = (
        pt.withColumn("rnend", F.max("rn").over(wg))
        .groupBy("event_type", "g")
        .agg(
            F.max("rnend").alias("rnend"),
            F.max(
                F.when(F.col("rn") == F.col("rnend"), F.col("p"))
            ).alias("b"),
        )
    )
    x, y = cs.alias("x"), cs.alias("y")
    s0 = (
        x.join(
            y,
            (F.col("x.event_type") == F.col("y.event_type"))
            & (F.col("y.g") <= F.col("x.g")),
        )
        .groupBy(
            F.col("x.event_type").alias("event_type"),
            F.col("x.g").alias("g"),
        )
        .agg(
            dsum(
                F.col("y.b")
                * F.pow(F.lit(da), F.col("x.rnend") - F.col("y.rnend"))
            ).alias("s0"),
            F.max(F.col("x.rnend")).alias("rnend"),
        )
    )
    carry = s0.select(
        "event_type",
        (F.col("g") + 1).alias("g"),
        F.col("s0").alias("c"),
        F.col("rnend").alias("crn"),
    )
    joined = pt.join(carry, ["event_type", "g"], "left")
    ewma = (
        F.coalesce(
            F.pow(F.lit(da), F.col("rn") - F.col("crn")) * F.col("c"),
            F.lit(0.0),
        )
        + F.col("p")
    )
    return joined.select(
        "event_type", "day", "n", F.round(ewma, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# E9c: long-horizon EWMA — the delegation regime under the oracle
# ---------------------------------------------------------------------------

_EWMA_LONG_DAYS = 1500  # synthesized day domain
# Explicit opt-in threshold for the graded long-horizon key: the
# OBSERVED day count per type is corpus-sized (the sf0.001 events
# table only populates ~190 of the 1500 residues per type; sf0.01
# ~1160; sf0.1 all 1500), so the graded branch decision must fire at
# EVERY SF the parity harness runs — 128 sits below the smallest
# corpus's coverage while the helper's production default stays 1024.
_EWMA_LONG_THRESHOLD = 128

_EWMA_LONG_DAILY_SQL = (
    "SELECT event_type, "
    f"DATE '1992-01-01' + CAST(event_id % {_EWMA_LONG_DAYS} AS INTEGER) "
    "AS day, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2"
)


@register(
    "evt_ewma_long",
    oracle=_sql_ewma_chunked_oracle(_EWMA_LONG_DAILY_SQL),
    doc="Long-horizon EWMA (E9c, r9 verdict item 8): the DELEGATION "
    "REGIME itself under the driver oracle.  The driver corpora span "
    "30 days at every SF, so E9's crossover branch could never carry "
    "oracle evidence on the natural day column; here the day domain "
    "is SYNTHESIZED to 1500 days (day = 1992-01-01 + event_id mod "
    "1500 — deterministic, engine-neutral arithmetic on a stable "
    "key), the engine path goes through the SAME ewma_daily_auto "
    "crossover users call with an explicit 128-day opt-in threshold "
    "(observed coverage is corpus-sized — ~190 residues per type at "
    "sf0.001, all 1500 at sf0.1 — and the graded branch decision "
    "must fire at EVERY SF; the helper's production default stays "
    "1024), forcing the chunk-and-carry plan.  The oracle is the "
    "CHUNKED protocol "
    "on the same synthesized rollup — if the delegation failed to "
    "fire and the closed form ran instead, the ~1e-3 quantization-"
    "nesting difference between the two plans would break the hash: "
    "the branch decision is part of what the driver grades.  Scale "
    "shape is E9b's: C²·(len/C) slim pairs per type instead of "
    "len², boundary recurrence collapsed to a powers-of-one-base "
    "prefix sum over the #chunks frame.",
)
def q_evt_ewma_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_add(
        F.to_date(F.lit("1992-01-01")),
        (F.col("event_id") % _EWMA_LONG_DAYS).cast("int"),
    )
    daily = e.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return ewma_daily_auto(daily, delegate_above=_EWMA_LONG_THRESHOLD)


# ---------------------------------------------------------------------------
# E10: DAU / WAU stickiness
# ---------------------------------------------------------------------------


@register(
    "evt_dau_wau",
    oracle="WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
    "FROM events), "
    "days AS (SELECT DISTINCT day FROM ud), "
    "dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud "
    "GROUP BY 1), "
    "wau AS (SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) "
    "AS wau FROM days d JOIN ud u "
    "ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day GROUP BY 1) "
    "SELECT dau.day, dau.dau, wau.wau, "
    "round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness "
    "FROM dau JOIN wau ON dau.day = wau.day",
    doc="DAU/WAU stickiness (E10): per day, the distinct daily "
    "actives, the distinct trailing-7-day actives, and their ratio — "
    "THE product-health metric (stickiness ~1 = users return daily; "
    "~1/7 = once a week). The expensive half is distinct-over-a-"
    "sliding-window, which plain windows cannot express (COUNT "
    "DISTINCT OVER RANGE is unsupported for good reason — per-frame "
    "dedup state); the scalable form: collapse the event stream to "
    "DISTINCT (user, day) FIRST (a power user's million events "
    "become ≤1 row/day — the retention-triangle pre-collapse), then "
    "range-join that slim frame against the DOMAIN-bounded day list "
    "(each user-day lands in exactly ≤7 day-windows — constant "
    "fan-out, linear total) and count distinct per day. WAU never "
    "touches raw events; the day list is broadcast-sized by the "
    "calendar. Integer counts, one rounded ratio of identical "
    "trees.",
)
def q_evt_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Pinned: the distinct user-day frame feeds the day list, DAU,
    # and the WAU range join — unpinned, each consumer re-scans raw
    # events; pinned, events are read once and the slim 2-column
    # frame (<= users x active-days rows, the thing that made the
    # pre-collapse worthwhile) serves all three.
    ud = (
        e.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .localCheckpoint()
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    u, d = ud.alias("u"), days.alias("d")
    wau = (
        d.join(
            u,
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("u.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau"), 6
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# E11: daily session bounce rate
# ---------------------------------------------------------------------------


@register(
    "evt_bounce_rate",
    oracle="WITH seq AS (SELECT user_id, event_id, ts, "
    "CASE WHEN lag(ts) OVER w IS NULL OR "
    f"ts > lag(ts) OVER w + INTERVAL {_SESSION_GAP_MIN} MINUTE "
    "THEN 1 ELSE 0 END AS new_sess FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id "
    "FROM seq), "
    "s AS (SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n, "
    "min(ts) AS t0 FROM sess GROUP BY 1, 2) "
    "SELECT CAST(t0 AS DATE) AS day, "
    "CAST(count(*) AS BIGINT) AS n_sessions, "
    "CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_bounced, "
    "round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
    "/ count(*), 6) AS bounce_rate "
    "FROM s GROUP BY 1 ORDER BY 1",
    doc="Daily session bounce rate (E11): share of sessions "
    "containing exactly ONE event, by session-start day — the "
    "engagement-health complement of E4's path ranking (a rising "
    "bounce rate is the first sign a funnel entry broke). Same "
    "30-minute gap sessionizer as E4/E5 — lag + running boundary "
    "sum, ONE user_id shuffle serving the lag window, the prefix "
    "sum AND the per-session count — then a (day)-keyed rollup of "
    "the session frame (bounded by sessions, not events). The "
    "bounce ratio divides two integers of the same aggregate "
    "(identical doubles both engines), round 1e-6.",
)
def q_evt_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + gap),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = (
        e.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("t0"))
    )
    bounced = F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long")
    return (
        s.groupBy(F.col("t0").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounced.alias("n_bounced"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounced",
            F.round(
                F.col("n_bounced").cast("double") / F.col("n_sessions"), 6
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# E12: view→purchase conversion lag by cohort day
# ---------------------------------------------------------------------------


@register(
    "evt_conversion_lag",
    oracle="WITH v AS (SELECT user_id, min(ts) AS tv FROM events "
    "WHERE event_type = 'view' GROUP BY 1), "
    "p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e "
    "JOIN v ON e.user_id = v.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts > v.tv GROUP BY 1), "
    "lag AS (SELECT v.user_id, CAST(v.tv AS DATE) AS cohort_day, "
    "(epoch_us(p.tp) - epoch_us(v.tv)) // 1000000 AS lag_s "
    "FROM v JOIN p ON v.user_id = p.user_id) "
    "SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted, "
    "round(CAST(sum(lag_s) AS DOUBLE) / count(*), 6) AS avg_lag_s, "
    "CAST(min(lag_s) AS BIGINT) AS min_lag_s, "
    "CAST(max(lag_s) AS BIGINT) AS max_lag_s "
    "FROM lag GROUP BY 1 ORDER BY 1",
    doc="View→purchase conversion lag (E12): for every user whose "
    "first purchase follows their first view, the time between the "
    "two — summarized per first-view cohort day (count, mean, "
    "min/max) — the 'how long does conversion take' companion to "
    "E1's how-many funnel. Two progressive per-user MIN aggregates "
    "(the E1 decorrelation: stage k joins only the slim survivor "
    "frame, never event×event), lag in INTEGER seconds via epoch-"
    "microsecond floor division (second-COUNTING conventions differ "
    "between engines on sub-second parts; epoch arithmetic does "
    "not — the mean then divides an integer sum by an integer "
    "count, identical doubles), one uniform "
    "user_id shuffle per stage, day-keyed rollup of the per-user "
    "frame.",
)
def q_evt_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    lag = v.join(p, "user_id").select(
        F.col("tv").cast("date").alias("cohort_day"),
        F.expr(
            "(unix_micros(cast(tp AS TIMESTAMP)) - "
            "unix_micros(cast(tv AS TIMESTAMP))) div 1000000"
        )
        .cast("long")
        .alias("lag_s"),
    )
    return (
        lag.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(
                F.sum("lag_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_lag_s"),
            F.min("lag_s").alias("min_lag_s"),
            F.max("lag_s").alias("max_lag_s"),
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# E13: Gini concentration of per-user activity
# ---------------------------------------------------------------------------


@register(
    "evt_gini",
    oracle="WITH pv AS (SELECT event_type, user_id, "
    "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "r AS (SELECT event_type, cnt, CAST(row_number() OVER "
    "(PARTITION BY event_type ORDER BY cnt DESC, user_id) AS BIGINT) "
    "AS rnk FROM pv), "
    "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(cnt) AS BIGINT) AS n_events, "
    "sum(CAST(rnk AS DECIMAL(25,0)) * cnt) AS s FROM r GROUP BY 1) "
    "SELECT event_type, n_users, n_events, "
    "round(CAST((n_users + 1) * CAST(n_events AS DECIMAL(25,0)) "
    "- 2 * s AS DOUBLE) / "
    "CAST(CAST(n_users AS DECIMAL(25,0)) * n_events AS DOUBLE), 6) "
    "AS gini FROM g ORDER BY 1",
    doc="Gini concentration of per-user activity (E13): for each "
    "event type, the Gini coefficient of the events-per-user "
    "distribution — 0 when every user contributes equally, →1 when "
    "a handful of power users generate everything.  The "
    "concentration complement of E10's stickiness ratio (DAU/WAU "
    "says how often users return; Gini says WHO the volume actually "
    "comes from — a rising Gini with flat DAU is a shrinking power-"
    "user core, the classic pre-churn signature), and the user-axis "
    "analogue of X43's Zipf slope over tokens.  Closed form on the "
    "DESC-ranked frame: G = ((n+1)·T − 2·Σ rank·x) / (n·T) — "
    "integer arithmetic end to end (ranks × counts summed in "
    "DECIMAL, one double division at the end), so both engines "
    "compute identical operands; rank ties (equal counts) cannot "
    "perturb the sum because tied blocks contribute x·Σi regardless "
    "of internal order, and the user_id tiebreak makes even the "
    "per-row ranks identical.  Scale: the per-user collapse is one "
    "uniform (type, user) shuffle; the global rank runs through the "
    "TWO-PASS quantile-bucketed prefix-sum (rank = running sum of "
    "1; the only partition-less window is the O(#groups·#buckets) "
    "offsets frame — the sort_orders contract), so no data-sized "
    "single-partition stage exists at any corpus size.",
)
def q_evt_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_curate import _cumsum_from_buckets
    from .relational import quantile_bucketed

    pv = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bucketed = quantile_bucketed(pv, "cnt", nb=32)
    ranked = _cumsum_from_buckets(
        bucketed,
        ["event_type"],
        [F.col("cnt").desc(), F.col("user_id")],
        F.lit(1),
        "rnk",
    )
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("cnt").cast("decimal(25,0)")).alias("_t"),
        F.sum(F.col("rnk").cast("decimal(25,0)") * F.col("cnt")).alias(
            "_s"
        ),
    )
    num = (
        (F.col("n_users") + 1).cast("decimal(25,0)") * F.col("_t")
        - 2 * F.col("_s")
    )
    den = F.col("n_users").cast("decimal(25,0)") * F.col("_t")
    return g.select(
        "event_type",
        "n_users",
        F.col("_t").cast("long").alias("n_events"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# E14: repeat-purchase cadence by ordinal
# ---------------------------------------------------------------------------

_CADENCE_MAX_ORDINAL = 10


@register(
    "evt_purchase_cadence",
    oracle="WITH p AS (SELECT user_id, ts, event_id, "
    "CAST(row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS BIGINT) AS n "
    "FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT p1.n AS ordinal, "
    "(epoch_us(p2.ts) - epoch_us(p1.ts)) // 1000000 AS gap_s "
    "FROM p p1 JOIN p p2 ON p1.user_id = p2.user_id "
    "AND p2.n = p1.n + 1 "
    f"WHERE p1.n <= {_CADENCE_MAX_ORDINAL}) "
    "SELECT ordinal, CAST(count(*) AS BIGINT) AS n_users, "
    "round(CAST(sum(gap_s) AS DOUBLE) / count(*), 6) AS avg_gap_s, "
    "CAST(min(gap_s) AS BIGINT) AS min_gap_s, "
    "CAST(max(gap_s) AS BIGINT) AS max_gap_s "
    "FROM g GROUP BY 1 ORDER BY 1",
    doc="Repeat-purchase cadence (E14): for each purchase ordinal n "
    "(capped at 10), the gap between a user's n-th and (n+1)-th "
    "purchase — count of users who made that transition plus "
    "mean/min/max gap in INTEGER seconds.  The 'how fast do repeat "
    "buyers come back' report: E2's retention says WHETHER users "
    "return by calendar offset, cadence says HOW LONG the n→n+1 "
    "transition takes — the curve flattening with n is the "
    "habituation signal subscription pricing is tuned against.  "
    "Engine-exactness: gaps are epoch-microsecond floor-divided to "
    "integer seconds (the E12 stance — second-counting conventions "
    "differ between engines, epoch arithmetic does not), the mean "
    "divides an integer sum by an integer count.  Distributed "
    "shape: ONE user_id shuffle serves the purchase ordinal window; "
    "consecutive pairs come from lead() on the SAME window "
    "partitioning (the oracle's self-join on (user, n+1) is the "
    "relational spelling of the same pairing — lead avoids "
    "re-shuffling the purchase frame), then an ordinal-keyed rollup "
    "of the ≤10-row-per-user pair frame.",
)
def q_evt_purchase_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(cast(ts AS TIMESTAMP))")
    seq = p.select(
        F.row_number().over(w).cast("long").alias("ordinal"),
        us.alias("t_us"),
        F.lead(us).over(w).alias("next_us"),
    )
    g = seq.filter(
        F.col("next_us").isNotNull()
        & (F.col("ordinal") <= _CADENCE_MAX_ORDINAL)
    ).select(
        "ordinal",
        F.expr("(next_us - t_us) div 1000000").cast("long").alias("gap_s"),
    )
    return (
        g.groupBy("ordinal")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("gap_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_gap_s"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("ordinal")
    )


# ---------------------------------------------------------------------------
# E15: cumulative unique users by day
# ---------------------------------------------------------------------------


@register(
    "evt_cumulative_users",
    oracle="WITH fs AS (SELECT user_id, CAST(min(ts) AS DATE) AS d0 "
    "FROM events GROUP BY 1), "
    "per AS (SELECT d0 AS day, CAST(count(*) AS BIGINT) AS new_users "
    "FROM fs GROUP BY 1) "
    "SELECT day, new_users, "
    "CAST(sum(new_users) OVER (ORDER BY day "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users "
    "FROM per ORDER BY day",
    doc="Cumulative unique users by day (E15): the total-audience "
    "growth curve — per day, how many users appeared for the FIRST "
    "time, and the running total of distinct users ever seen.  A "
    "running COUNT(DISTINCT) window over raw events is unbounded "
    "state and no engine's window machinery does it; the standard "
    "re-expression is exact and cheap: distinct-ness collapses to "
    "each user's FIRST-SEEN day (per-user MIN — one uniform "
    "user_id shuffle with map-side partials), the day rollup counts "
    "first-appearances, and the cumulative sum runs over the "
    "TIME-DOMAIN-bounded day frame (~hundreds of rows at any corpus "
    "size — the partition-less window never touches data, the E9 "
    "stance).  cum_users on the last day equals the corpus's total "
    "distinct users by construction.",
)
def q_evt_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    fs = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select(F.col("t0").cast("date").alias("day"))
    )
    per = fs.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# E16: session duration percentiles by day
# ---------------------------------------------------------------------------


@register(
    "evt_session_duration",
    oracle="WITH seq AS (SELECT user_id, event_id, ts, "
    "CASE WHEN lag(ts) OVER w IS NULL OR "
    f"ts > lag(ts) OVER w + INTERVAL {_SESSION_GAP_MIN} MINUTE "
    "THEN 1 ELSE 0 END AS new_sess FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id "
    "FROM seq), "
    "s AS (SELECT user_id, sess_id, min(ts) AS t0, "
    "(epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s "
    "FROM sess GROUP BY 1, 2), "
    "r AS (SELECT CAST(t0 AS DATE) AS day, user_id, sess_id, dur_s, "
    "CAST(row_number() OVER (PARTITION BY CAST(t0 AS DATE) "
    "ORDER BY dur_s, user_id, sess_id) AS BIGINT) AS rnk, "
    "CAST(count(*) OVER (PARTITION BY CAST(t0 AS DATE)) AS BIGINT) "
    "AS n FROM s) "
    "SELECT day, max(n) AS n_sessions, "
    "round(CAST(sum(dur_s) AS DOUBLE) / max(n), 6) AS mean_s, "
    "CAST(max(CASE WHEN rnk = (n * 50 + 99) // 100 THEN dur_s END) "
    "AS BIGINT) AS p50_s, "
    "CAST(max(CASE WHEN rnk = (n * 90 + 99) // 100 THEN dur_s END) "
    "AS BIGINT) AS p90_s, "
    "CAST(max(CASE WHEN rnk = (n * 99 + 99) // 100 THEN dur_s END) "
    "AS BIGINT) AS p99_s "
    "FROM r GROUP BY 1 ORDER BY 1",
    doc="Session duration percentiles by start day (E16): per day, "
    "the session count, mean duration, and EXACT p50/p90/p99 of "
    "session length in integer seconds — the latency-distribution "
    "view of engagement (E11's bounce rate counts one-event "
    "sessions; this says how long the surviving sessions actually "
    "hold attention, and a drifting p90 flags the tail first).  "
    "Same 30-minute gap sessionizer as E4/E5/E11 (one user_id "
    "shuffle), then the exact per-day quantiles WITHOUT a per-day "
    "sort window: rank = the TWO-PASS bucketed prefix sum "
    "(quantile_bucketed on duration + _cumsum_from_buckets keyed by "
    "day — per-(day,bucket) windows in parallel, O(#days·#buckets) "
    "broadcast offsets), and the q-th percentile is the row whose "
    "rank equals ceil(n·q) = (n·q + 99) div 100 — pure integer "
    "arithmetic, deterministic (dur, user, sess) tiebreak, "
    "bit-identical to the oracle's single-window form on any "
    "partitioning.  A billion-session day never funnels through one "
    "partition; the duration domain is integer seconds so the "
    "sampled boundaries bucket it well.",
)
def q_evt_session_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_curate import _cumsum_from_buckets
    from .relational import quantile_bucketed

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + gap),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = (
        e.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .select(
            F.col("t0").cast("date").alias("day"),
            "user_id",
            "sess_id",
            F.expr(
                "(unix_micros(cast(t1 AS TIMESTAMP)) - "
                "unix_micros(cast(t0 AS TIMESTAMP))) div 1000000"
            )
            .cast("long")
            .alias("dur_s"),
        )
    )
    # quantile_bucketed's bucket ids DESCEND in value (pid = nb-1 -
    # quantile index), so the two-pass rank must order DESC to match;
    # the ascending q-th percentile (the oracle's form) is then the
    # row at mirrored rank n + 1 - ceil(n*q/100) — an exact bijection
    # because the (dur, user, sess) tiebreak is total.
    bucketed = quantile_bucketed(s, "dur_s", nb=32)
    ranked = _cumsum_from_buckets(
        bucketed,
        ["day"],
        [
            F.col("dur_s").desc(),
            F.col("user_id").desc(),
            F.col("sess_id").desc(),
        ],
        F.lit(1),
        "rnk",
    )
    counts = ranked.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    j = ranked.join(counts, "day")

    def pick(q: int):
        # asc rank ceil(n*q/100) == desc rank n + 1 - (n*q + 99) div 100
        return F.max(
            F.when(
                F.col("rnk")
                == F.expr(f"n + 1 - ((n * {q} + 99) div 100)"),
                F.col("dur_s"),
            )
        ).cast("long")

    return (
        j.groupBy("day")
        .agg(
            F.max("n").alias("n_sessions"),
            F.round(
                F.sum("dur_s").cast("double") / F.max("n"), 6
            ).alias("mean_s"),
            pick(50).alias("p50_s"),
            pick(90).alias("p90_s"),
            pick(99).alias("p99_s"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# E17: weekly cohort LTV curve
# ---------------------------------------------------------------------------


@register(
    "evt_cohort_ltv",
    oracle="WITH p AS (SELECT user_id, "
    "(CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk, "
    "CAST(floor(value * 10000.0 + 0.5) AS DECIMAL(25,0)) AS rev_q "
    "FROM events WHERE event_type = 'purchase'), "
    "c AS (SELECT user_id, min(wk) AS cohort_w FROM p GROUP BY 1), "
    "sz AS (SELECT cohort_w, CAST(count(*) AS BIGINT) AS n_users "
    "FROM c GROUP BY 1), "
    "a AS (SELECT c.cohort_w, p.wk - c.cohort_w AS age_w, "
    "sum(p.rev_q) AS rev_q FROM p JOIN c ON p.user_id = c.user_id "
    "GROUP BY 1, 2), "
    "cum AS (SELECT cohort_w, age_w, "
    "sum(rev_q) OVER (PARTITION BY cohort_w ORDER BY age_w "
    "ROWS UNBOUNDED PRECEDING) AS cum_q FROM a) "
    "SELECT DATE '1970-01-01' + INTERVAL (cm.cohort_w * 7) DAY "
    "AS cohort_week, CAST(cm.age_w AS BIGINT) AS age_w, sz.n_users, "
    "round(CAST(cm.cum_q AS DOUBLE) / 10000.0, 4) AS cum_rev, "
    "round(CAST(cm.cum_q AS DOUBLE) / 10000.0 / sz.n_users, 6) "
    "AS ltv_per_user "
    "FROM cum cm JOIN sz ON cm.cohort_w = sz.cohort_w "
    "ORDER BY 1, 2",
    doc="Weekly cohort LTV curve (E17): users cohorted by FIRST "
    "purchase week, each cohort's cumulative revenue by age in weeks, "
    "per cohort user — the lifetime-value triangle that prices user "
    "acquisition (E2's retention triangle counts who comes back; "
    "this weighs what they spend when they do).  Weeks are integer "
    "epoch-day div 7 — engine-neutral calendar arithmetic, no "
    "locale-dependent week-of-year anywhere; revenue goes through "
    "the repo's fixed-point money policy (per-row 1e-4 quantize, "
    "DECIMAL sums — functions/numeric.py), so cohort sums are exact "
    "integers on both engines and the two divisions at the end are "
    "identical doubles.  Scale: purchases collapse to (cohort, age) "
    "BEFORE any window — the cumulative sum runs over the week² "
    "triangle (TIME-domain-bounded, ~thousands of rows at any "
    "corpus size), the per-user cohort map is one uniform user_id "
    "shuffle, and the cohort-size frame is calendar-bounded.",
)
def q_evt_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import quant

    e = load_table(spark, sf_dir, "events")
    # Epoch-day div 7: integer `div` keeps the week index exact
    # (epoch days are non-negative for this corpus, >= 1970).
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_date(cast(ts AS DATE)) div 7").cast("long").alias("wk"),
        quant("value").alias("rev_q"),
    )
    c = p.groupBy("user_id").agg(F.min("wk").alias("cohort_w"))
    sz = c.groupBy("cohort_w").agg(F.count(F.lit(1)).alias("n_users"))
    a = (
        p.join(c, "user_id")
        .groupBy("cohort_w", (F.col("wk") - F.col("cohort_w")).alias("age_w"))
        .agg(F.sum("rev_q").alias("rev_q"))
    )
    wcum = (
        Window.partitionBy("cohort_w")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = a.withColumn("cum_q", F.sum("rev_q").over(wcum))
    return (
        cum.join(sz, "cohort_w")
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("cohort_w") * 7).cast("int"),
            ).alias("cohort_week"),
            F.col("age_w").cast("long").alias("age_w"),
            "n_users",
            F.round(F.col("cum_q").cast("double") / 10000.0, 4).alias(
                "cum_rev"
            ),
            F.round(
                F.col("cum_q").cast("double") / 10000.0 / F.col("n_users"), 6
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_w")
    )


# ---------------------------------------------------------------------------
# E18: new-vs-returning daily active split
# ---------------------------------------------------------------------------


@register(
    "evt_new_vs_returning",
    oracle="WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) "
    "AS day FROM events), "
    "f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1) "
    "SELECT ud.day, CAST(count(*) AS BIGINT) AS n_active, "
    "CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_new, "
    "CAST(sum(CASE WHEN ud.day = f.first_day THEN 0 ELSE 1 END) "
    "AS BIGINT) AS n_returning, "
    "round(CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) "
    "AS DOUBLE) / count(*), 6) AS new_share "
    "FROM ud JOIN f ON ud.user_id = f.user_id GROUP BY 1 ORDER BY 1",
    doc="New-vs-returning daily split (E18): each day's distinct "
    "actives divided into first-seen-today and returning users — the "
    "growth-accounting complement of E10's stickiness (DAU/WAU says "
    "how often the base returns; this says whether today's DAU is "
    "acquisition or retention, the first split any growth review "
    "asks for, and the daily-grain companion of E15's cumulative "
    "curve).  Scale: events collapse to DISTINCT (user, day) first "
    "(the E10 pre-collapse — a power user is <=1 row/day), the "
    "first-seen map is a per-user MIN over that slim frame (one "
    "uniform user_id shuffle serving both the min and the join "
    "back), and the day rollup is calendar-bounded.  All-integer "
    "counts; one rounded ratio of identical operands.",
)
def q_evt_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    f = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        ud.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(is_new).cast("long").alias("n_new"),
            F.sum(1 - is_new).cast("long").alias("n_returning"),
            F.round(
                F.sum(is_new).cast("double") / F.count(F.lit(1)), 6
            ).alias("new_share"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# E19: inactivity (churn-risk) distribution
# ---------------------------------------------------------------------------


@register(
    "evt_churn_risk",
    oracle="WITH u AS (SELECT user_id, "
    "max(CAST(ts AS DATE) - DATE '1970-01-01') AS led "
    "FROM events GROUP BY 1), "
    "wm AS (SELECT max(led) AS m FROM u), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM u), "
    "g AS (SELECT CAST(wm.m - u.led AS BIGINT) AS days_inactive, "
    "CAST(count(*) AS BIGINT) AS n_users FROM u, wm GROUP BY 1) "
    "SELECT g.days_inactive, g.n_users, "
    "round(CAST(g.n_users AS DOUBLE) / t.n_total, 6) AS user_share, "
    "CAST(sum(g.n_users) OVER (ORDER BY g.days_inactive "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users, "
    "round(CAST(sum(g.n_users) OVER (ORDER BY g.days_inactive "
    "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.n_total, 6) AS cum_share "
    "FROM g, t ORDER BY 1",
    doc="Inactivity distribution (E19): users bucketed by days since "
    "their last event, against the corpus watermark — the churn-risk "
    "curve (cum_share at day d answers 'what fraction of the base "
    "has been silent ≤ d days'; the complement at the team's "
    "churn threshold is the at-risk mass).  E18 splits a DAY into "
    "new vs returning; this splits the USER BASE by recency — "
    "together they are the two halves of growth accounting.  Day "
    "arithmetic is integer epoch days (engine-neutral).  Scale: one "
    "per-user MAX collapse (uniform user_id shuffle), a 1-row "
    "watermark broadcast, then a calendar-bounded rollup — the "
    "cumulative window runs over at most span-many rows.",
)
def q_evt_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(F.unix_date(F.col("ts").cast("date")).cast("long")).alias("led")
    )
    wm = u.agg(F.max("led").alias("m"))
    t = u.agg(F.count(F.lit(1)).alias("n_total"))
    g = (
        u.crossJoin(F.broadcast(wm))
        .groupBy((F.col("m") - F.col("led")).cast("long").alias("days_inactive"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    wcum = Window.orderBy("days_inactive").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "days_inactive",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("n_total"), 6).alias(
                "user_share"
            ),
            F.sum("n_users").over(wcum).cast("long").alias("cum_users"),
            F.round(
                F.sum("n_users").over(wcum).cast("double") / F.col("n_total"), 6
            ).alias("cum_share"),
        )
        .orderBy("days_inactive")
    )


# ---------------------------------------------------------------------------
# E20: day-of-week × hour traffic profile
# ---------------------------------------------------------------------------


@register(
    "evt_traffic_profile",
    oracle="WITH b AS (SELECT "
    "CAST(((CAST(ts AS DATE) - DATE '1970-01-01') + 3) % 7 + 1 AS BIGINT) "
    "AS dow, CAST(hour(ts) AS BIGINT) AS hr FROM events), "
    "g AS (SELECT dow, hr, CAST(count(*) AS BIGINT) AS n FROM b "
    "GROUP BY 1, 2) "
    "SELECT dow, hr, n, "
    "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY dow), 6) "
    "AS dow_share "
    "FROM g ORDER BY 1, 2",
    doc="Traffic profile (E20): event volume by ISO day-of-week × "
    "hour with each cell's share of its weekday — the seasonality "
    "heatmap capacity planning and anomaly baselines start from "
    "(E6's z-score flags a day AGAINST this shape; this is the "
    "shape).  Weekday is pure integer arithmetic on epoch days "
    "((ed+3) mod 7 + 1 — 1970-01-01 was a Thursday), never a "
    "locale-dependent dayofweek(); the hour comes off the NTZ "
    "timestamp identically on both engines.  Scale: one scan "
    "collapsing straight to ≤168 cells with map-side partials; the "
    "share window runs over 24-row weekday partitions.",
)
def q_evt_traffic_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        (
            (F.unix_date(F.col("ts").cast("date")).cast("long") + F.lit(3))
            % F.lit(7)
            + F.lit(1)
        )
        .cast("long")
        .alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    )
    g = b.groupBy("dow", "hr").agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("dow")
    return g.select(
        "dow",
        "hr",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wd), 6).alias(
            "dow_share"
        ),
    ).orderBy("dow", "hr")


# ---------------------------------------------------------------------------
# E21: power-user concentration deciles
# ---------------------------------------------------------------------------


@register(
    "evt_power_users",
    oracle="WITH pv AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt "
    "FROM events GROUP BY 1), "
    "t AS (SELECT CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(cnt) AS BIGINT) AS n_events FROM pv), "
    "r AS (SELECT user_id, cnt, row_number() OVER "
    "(ORDER BY cnt DESC, user_id) AS pos FROM pv), "
    "d AS (SELECT CAST(((pos - 1) * 10) // t.n_users AS BIGINT) "
    "AS decile, cnt FROM r, t), "
    "g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users, "
    "CAST(sum(cnt) AS BIGINT) AS events FROM d GROUP BY 1) "
    "SELECT g.decile, g.n_users, g.events, "
    "round(CAST(g.events AS DOUBLE) / t.n_events, 6) AS event_share, "
    "round(CAST(sum(g.events) OVER (ORDER BY g.decile "
    "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.n_events, 6) "
    "AS cum_event_share "
    "FROM g, t ORDER BY 1",
    doc="Power-user deciles (E21): users ranked by activity and cut "
    "into tenths; each decile's share and cumulative share of total "
    "events — the concentration TABLE behind E13's Gini scalar (the "
    "'top decile is 40% of traffic' statement product reviews "
    "actually quote; a scalar can't say which decile).  Decile id "
    "is exact integer arithmetic on the global rank — "
    "((pos-1)*10) div n — not ntile, whose remainder-distribution "
    "convention would have to be trusted across engines.  Scale: "
    "the global rank is the TWO-PASS bucketed rank (quantile_"
    "bucketed sampled boundaries + rank_from_buckets per-bucket "
    "row_number — the O1 machinery), so no single-partition sort "
    "window ever sees the user frame; everything after is a "
    "10-row rollup.",
)
def q_evt_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import quantile_bucketed, rank_from_buckets

    e = load_table(spark, sf_dir, "events")
    pv = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    t = pv.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cnt").cast("long").alias("n_events"),
    )
    bucketed = quantile_bucketed(pv, "cnt", nb=32)
    ranked = rank_from_buckets(
        bucketed, [F.col("cnt").desc(), F.col("user_id")]
    )
    d = ranked.crossJoin(F.broadcast(t)).select(
        F.expr("((pos - 1) * 10) div n_users").cast("long").alias("decile"),
        "cnt",
        "n_events",
    )
    g = d.groupBy("decile", "n_events").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cnt").cast("long").alias("events"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "decile",
        "n_users",
        "events",
        F.round(F.col("events").cast("double") / F.col("n_events"), 6).alias(
            "event_share"
        ),
        F.round(
            F.sum("events").over(wcum).cast("double") / F.col("n_events"), 6
        ).alias("cum_event_share"),
    ).orderBy("decile")

# ---------------------------------------------------------------------------
# E22: seasonally-adjusted hourly anomaly (E20 baseline × E6 z-score)
# ---------------------------------------------------------------------------


@register(
    "evt_anomaly_seasonal",
    oracle="WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS eh, "
    "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "k AS (SELECT eh, cnt, "
    "CAST((eh // 24 + 3) % 7 + 1 AS BIGINT) AS dow, "
    "CAST(eh % 24 AS BIGINT) AS hr FROM hc), "
    "b AS (SELECT dow, hr, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(cnt) AS BIGINT) AS s1, "
    "CAST(sum(cnt * cnt) AS BIGINT) AS s2 FROM k GROUP BY 1, 2), "
    "j AS (SELECT k.eh, k.dow, k.hr, k.cnt, b.n, "
    "CAST(b.s1 AS DOUBLE) / b.n AS mu, "
    "CASE WHEN b.n > 1 THEN sqrt((CAST(b.s2 AS DOUBLE) - "
    "CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n) / (b.n - 1)) "
    "END AS sd "
    "FROM k JOIN b ON k.dow = b.dow AND k.hr = b.hr) "
    "SELECT eh AS epoch_hour, dow, hr, cnt, n, "
    "round(mu, 6) AS mean_cnt, "
    "round(CASE WHEN sd > 0 THEN (CAST(cnt AS DOUBLE) - mu) / sd END, 6) "
    "AS z, "
    "coalesce(abs(CASE WHEN sd > 0 THEN (CAST(cnt AS DOUBLE) - mu) / sd "
    "END) > 2.0, FALSE) AS is_anomaly "
    "FROM j ORDER BY 1",
    doc="Seasonally-adjusted hourly anomaly (E22): each hour's event "
    "count z-scored against the baseline of ITS OWN (weekday, hour) "
    "cell — the composition of E20's seasonality profile and E6's "
    "z-score that production alerting actually runs (a quiet Sunday "
    "03:00 is normal; the same count at Monday 14:00 is an outage — "
    "a per-series mean can't tell them apart).  All-integer inputs: "
    "hour id is epoch-microseconds div 3600e6 (session TZ pinned "
    "UTC; engine-neutral), weekday the E20 epoch arithmetic, and the "
    "baseline's mean/std expand from exact BIGINT Σcnt/Σcnt² in "
    "identical double trees (sample std, NULL-guarded for n<2 and "
    "flat cells — the E6/dstddev convention).  Scale: the corpus "
    "collapses to calendar-bounded hourly counts at the scan (one "
    "shuffle, map-side partials); the 168-cell baseline joins back "
    "broadcast-small; output is one row per corpus hour, "
    "calendar-bounded at any data size.",
)
def q_evt_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hc = (
        e.select(
            F.expr(
                "unix_micros(cast(ts AS TIMESTAMP)) div 3600000000"
            ).alias("eh")
        )
        .groupBy("eh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    k = hc.select(
        "eh",
        "cnt",
        F.expr("CAST((eh div 24 + 3) % 7 + 1 AS BIGINT)").alias("dow"),
        F.expr("CAST(eh % 24 AS BIGINT)").alias("hr"),
    )
    b = k.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    sd = F.when(
        F.col("n") > 1,
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ),
    )
    zraw = F.when(sd > 0, (F.col("cnt").cast("double") - mu) / sd)
    return (
        k.join(F.broadcast(b), ["dow", "hr"])
        .select(
            F.col("eh").alias("epoch_hour"),
            "dow",
            "hr",
            "cnt",
            "n",
            F.round(mu, 6).alias("mean_cnt"),
            F.round(zraw, 6).alias("z"),
            F.coalesce(F.abs(zraw) > F.lit(2.0), F.lit(False)).alias(
                "is_anomaly"
            ),
        )
        .orderBy("epoch_hour")
    )


# ---------------------------------------------------------------------------
# E23: Kaplan-Meier retention survival curve
# ---------------------------------------------------------------------------

_KM_PROD_GAP_DAYS = 7   # production default for survival_km callers
# Graded gap: the synthetic corpora have NO 7-day-silent users (max
# observed inactivity is 2 days at every SF — everyone stays active
# through the window), so the graded key uses the strictest gap:
# a user not active on the watermark day itself counts as churned.
# This makes the curve non-vacuous (real deaths, real censoring)
# while production callers pass their own gap to survival_km().
_KM_CHURN_GAP_DAYS = 0


def _sql_km(obs_ctes: str) -> str:
    """DuckDB Kaplan-Meier curve over an ``obs(t, churned)`` CTE chain
    (the argument must end by defining ``obs``) — factored so the
    natural-domain key (E23) and the synthesized censoring key (E23b)
    grade the SAME curve protocol over different observation frames."""
    return (
        "WITH " + obs_ctes + ", "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM obs), "
        "g AS (SELECT t, CAST(sum(churned) AS BIGINT) AS d, "
        "CAST(count(*) AS BIGINT) AS leave FROM obs GROUP BY 1), "
        "r AS (SELECT g.t, g.d, CAST(tot.n_users - "
        "coalesce(sum(g.leave) OVER (ORDER BY g.t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
        "AS n_risk FROM g, tot), "
        "k AS (SELECT t, d, n_risk, "
        "CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead, "
        "CASE WHEN d < n_risk THEN CAST(floor(ln(1.0 - "
        "CAST(d AS DOUBLE) / n_risk) * 1000000.0 + 0.5) AS BIGINT) "
        "ELSE 0 END AS lnq FROM r WHERE d > 0), "
        "c AS (SELECT t, d, n_risk, "
        "CAST(sum(lnq) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS slnq, "
        "max(dead) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS anydead "
        "FROM k) "
        "SELECT t AS duration_days, n_risk, d AS n_churned, "
        "round(1.0 - CAST(d AS DOUBLE) / n_risk, 6) AS factor, "
        "CASE WHEN anydead = 1 THEN 0.0 ELSE "
        "round(exp(CAST(slnq AS DOUBLE) / 1000000.0), 6) END AS survival "
        "FROM c ORDER BY 1"
    )


def _km_curve(obs: DataFrame) -> DataFrame:
    """Spark side of the KM protocol over an ``obs(t, churned)`` frame:
    fixed-point ln quantization BEFORE the cumulative sum, exact zero
    on a d = n step.  Everything here lives on the duration domain —
    the cumulative windows never see data-sized frames."""
    tot = obs.agg(F.count(F.lit(1)).alias("n_users"))
    g = obs.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).alias("leave"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    r = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (
                F.col("n_users")
                - F.coalesce(F.sum("leave").over(wprev), F.lit(0))
            ).cast("long"),
        )
        .filter(F.col("d") > 0)
    )
    lnq = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(
                F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    dead = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = r.select(
        "t",
        "d",
        "n_risk",
        F.sum(lnq).over(wcum).cast("long").alias("slnq"),
        F.max(dead).over(wcum).alias("anydead"),
    )
    return c.select(
        F.col("t").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_churned"),
        F.round(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"), 6
        ).alias("factor"),
        F.when(F.col("anydead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("slnq").cast("double") / F.lit(1000000.0)), 6)
        )
        .alias("survival"),
    ).orderBy("duration_days")


@register(
    "evt_survival_km",
    oracle=_sql_km(
        "u AS (SELECT user_id, "
        "min(CAST(ts AS DATE) - DATE '1970-01-01') AS f, "
        "max(CAST(ts AS DATE) - DATE '1970-01-01') AS l "
        "FROM events GROUP BY 1), "
        "wm AS (SELECT max(l) AS w FROM u), "
        "obs AS (SELECT CAST(u.l - u.f AS BIGINT) AS t, "
        f"CASE WHEN wm.w - u.l > {_KM_CHURN_GAP_DAYS} THEN 1 ELSE 0 END "
        "AS churned FROM u, wm)"
    ),
    doc="Kaplan-Meier retention survival (E23): S(t) = Π (1 − dᵢ/nᵢ) "
    "over observed churn durations — the censoring-aware lifetime "
    "curve (E19's recency histogram can't distinguish a user who "
    "churned at day 3 from one who JOINED 3 days ago; KM counts the "
    "latter as at-risk until their observation ends).  Protocol: a "
    "user's duration is last−first epoch day; churned if silent "
    "longer than the churn gap against the corpus watermark, else "
    "censored at their observed duration (production default 7 "
    "days; the GRADED key pins gap=0 — the synthetic corpora have "
    "no 7-day-silent users, so the strictest gap is the one that "
    "makes the curve non-vacuous; see _KM_CHURN_GAP_DAYS).  Cross-engine exactness "
    "rides the perplexity-family ln protocol: each factor's "
    "ln(1−d/n) — an identical double tree over exact integers — "
    "quantizes to 1e-6 BEFORE the cumulative sum (order-free integer "
    "adds), and S(t) = exp of the rescaled sum, rounded 1e-6; a "
    "d = n step (everyone at risk churns) zeroes the curve exactly "
    "rather than feeding ln(0).  Scale: one per-user collapse "
    "(uniform user_id shuffle), then everything lives on the "
    "calendar-bounded duration domain — the cumulative windows never "
    "see data-sized frames.",
)
def q_evt_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ed = F.unix_date(F.col("ts").cast("date")).cast("long")
    u = e.groupBy("user_id").agg(
        F.min(ed).alias("f"), F.max(ed).alias("l")
    )
    wm = u.agg(F.max("l").alias("w"))
    obs = u.crossJoin(F.broadcast(wm)).select(
        (F.col("l") - F.col("f")).cast("long").alias("t"),
        F.when(
            F.col("w") - F.col("l") > _KM_CHURN_GAP_DAYS, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    return _km_curve(obs)


# ---------------------------------------------------------------------------
# E23b: KM with the censoring branch actually firing (synthesized domain)
# ---------------------------------------------------------------------------

_KM_SYN_MOD = 997    # synthesized day modulus (event_id % mod)
_KM_SYN_BUCKET = 64  # duration discretization (forces shared-t rows)


@register(
    "evt_survival_km_censored",
    oracle=_sql_km(
        "u AS (SELECT user_id, "
        f"min(event_id % {_KM_SYN_MOD}) AS f, "
        f"max(event_id % {_KM_SYN_MOD}) AS l "
        "FROM events GROUP BY 1), "
        "wm AS (SELECT max(l) AS w FROM u), "
        f"obs AS (SELECT CAST((u.l - u.f) // {_KM_SYN_BUCKET} AS BIGINT) "
        f"AS t, CASE WHEN wm.w - u.l > {_KM_PROD_GAP_DAYS} THEN 1 ELSE 0 "
        "END AS churned FROM u, wm)"
    ),
    doc="KM survival with REAL censoring under the oracle (E23b, r10 "
    "verdict item 2): E23's graded censoring gap is pinned at 0 "
    "because no driver corpus contains a 7-day-silent user — the "
    "gap>0 branch carried test evidence only.  Here the day domain "
    "is SYNTHESIZED (day = event_id mod 997 — deterministic, "
    "engine-neutral integer arithmetic on a stable key, the "
    "evt_ewma_long precedent) so per-user last-activity days spread "
    "across the modulus and the PRODUCTION gap=7 genuinely "
    "partitions users into churned (silent > 7 synthesized days "
    "before the watermark) and censored; durations discretize by 64 "
    "so churned and censored users SHARE duration rows — the "
    "at-risk denominators the curve divides by now shrink from "
    "censoring, not only from deaths (n_churned < leavers on shared "
    "rows, pinned by tests/test_wave10b.py).  Same fixed-point ln "
    "protocol and curve plan as E23 (shared _km_curve/_sql_km); "
    "same scale shape — one per-user collapse, then the bounded "
    "duration domain.",
)
def q_evt_survival_km_censored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sd = (F.col("event_id") % _KM_SYN_MOD).cast("long")
    u = e.groupBy("user_id").agg(
        F.min(sd).alias("f"), F.max(sd).alias("l")
    )
    wm = u.agg(F.max("l").alias("w"))
    obs = u.crossJoin(F.broadcast(wm)).select(
        F.expr(f"CAST((l - f) div {_KM_SYN_BUCKET} AS BIGINT)").alias("t"),
        F.when(
            F.col("w") - F.col("l") > _KM_PROD_GAP_DAYS, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    return _km_curve(obs)


# ---------------------------------------------------------------------------
# E24: daily arrival-burst dispersion index (r12)
# ---------------------------------------------------------------------------

# burst when dispersion > 1.5, compared as integers:
# (24*ss - n^2) / (24*n) > 3/2  <=>  2*(24*ss - n^2) > 3*(24*n)
_BURST_NUM, _BURST_DEN = 3, 2


@register(
    "evt_burst_dispersion",
    oracle="WITH h AS (SELECT CAST(ts AS DATE) AS day, "
    "date_part('hour', ts) AS hh, CAST(count(*) AS BIGINT) AS c "
    "FROM events GROUP BY 1, 2), "
    "p AS (SELECT day, CAST(sum(c) AS BIGINT) AS n, "
    "CAST(sum(c * c) AS BIGINT) AS ss FROM h GROUP BY 1) "
    "SELECT day, n AS n_events, "
    "round((24.0 * ss - n * n) / (24.0 * n), 6) AS dispersion, "
    f"(CAST({_BURST_DEN} AS BIGINT) * (24 * ss - n * n) > "
    f"CAST({_BURST_NUM} AS BIGINT) * (24 * n)) AS burst "
    "FROM p ORDER BY day",
    doc="Daily arrival-burst dispersion index (E24, r12): per day, "
    "the index of dispersion (variance-to-mean ratio) of the 24 "
    "hourly event counts — the classic Poisson-ness test (Cox-Lewis) "
    "that separates organic traffic (D ≈ 1) from bursty days (bot "
    "storms, retry floods, batch replays: D ≫ 1) and "
    "over-smoothed/throttled days (D < 1); E22's seasonal z-score "
    "finds which HOUR is anomalous, this scores the day's SHAPE.  "
    "Engine-exact: missing hours count as zero via the fixed k=24 "
    "denominator (never count-of-present-hours, which would hide "
    "bursts on sparse days), D = (24·Σc² − n²)/(24·n) stays integer "
    "until one final division, and the burst flag compares INTEGERS "
    "cross-multiplied against the 3/2 threshold — no float compare "
    "at the decision boundary.  Scale: one map-side (day, hour) "
    "collapse bounds every later frame by the calendar (≤ 24 rows "
    "per day), the day rollup is a second map-side-combined "
    "aggregate, and nothing after the first collapse touches event "
    "rows.",
)
def q_evt_burst_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("ts")
    h = (
        e.select(
            F.col("ts").cast("date").alias("day"),
            F.hour("ts").alias("hh"),
        )
        .groupBy("day", "hh")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p = h.groupBy("day").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    num = F.lit(24) * F.col("ss") - F.col("n") * F.col("n")
    return p.select(
        "day",
        F.col("n").alias("n_events"),
        F.round(
            (F.lit(24.0) * F.col("ss") - F.col("n") * F.col("n"))
            / (F.lit(24.0) * F.col("n")),
            6,
        ).alias("dispersion"),
        (
            F.lit(_BURST_DEN).cast("long") * num
            > F.lit(_BURST_NUM).cast("long") * (F.lit(24) * F.col("n"))
        ).alias("burst"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# E25: CEP-style sequence pattern match over sessions (r13)
# ---------------------------------------------------------------------------

# Flink-CEP / MATCH_RECOGNIZE shape without the engine extension: the
# gap sessionizer (E4's session_paths) already folds each session into
# an ordered '>'-joined type string, so sequence patterns become plain
# regexes over bounded strings.  Patterns deliberately avoid lookarounds
# (DuckDB's RE2 has none; Java regex does — a lookahead would be a
# silent engine divergence): "no error in between" is the POSITIVE
# alternation of every other type.
_CEP_PATTERNS = {
    # a view that reaches purchase without an error on the way
    "n_clean_funnel": r"(^|>)view(>(click|view|signup))*>purchase(>|$)",
    # two errors within one session (retry storm)
    "n_double_error": r"(^|>)error(>[a-z]+)*>error(>|$)",
    # signup later followed by a purchase in the same session
    "n_signup_purchase": r"(^|>)signup(>[a-z]+)*>purchase(>|$)",
}


@register(
    "evt_pattern_match",
    oracle="WITH seq AS (SELECT user_id, event_id, event_type, ts, "
    "CASE WHEN lag(ts) OVER w IS NULL OR "
    f"ts > lag(ts) OVER w + INTERVAL {_SESSION_GAP_MIN} MINUTE "
    "THEN 1 ELSE 0 END AS new_sess FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM seq), "
    "paths AS (SELECT user_id, sess_id, CAST(min(ts) AS DATE) AS day, "
    "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
    "FROM sess GROUP BY 1, 2) "
    "SELECT day, CAST(count(*) AS BIGINT) AS n_sessions, "
    # SQL string-escape = double single-quotes ONLY: DuckDB standard
    # single-quoted literals do not process backslash escapes, so the
    # earlier backslash-doubling would have corrupted the first
    # pattern to use e.g. \b — Spark would match \b while DuckDB got
    # a literal backslash + b, the silent divergence class this key's
    # own docstring warns about (r13 code-review find; a no-op for
    # the current backslash-free patterns).
    + ", ".join(
        "CAST(SUM(CASE WHEN regexp_matches(path, '"
        + pat.replace("'", "''")
        + "') THEN 1 ELSE 0 END) AS BIGINT) AS "
        + name
        for name, pat in _CEP_PATTERNS.items()
    )
    + " FROM paths GROUP BY 1 ORDER BY 1",
    doc="CEP-style sequence pattern match over sessions (E25, r13, "
    "Flink-CEP / SQL MATCH_RECOGNIZE shape): per session-start day, "
    "how many sessions exhibit each behavioral sequence — a clean "
    "view→purchase funnel (no error between), an error retry storm, "
    "signup-then-purchase.  Reuses E4's gap sessionizer verbatim "
    "(ONE user_id shuffle; per-session path strings are bounded by "
    "human session length), then each pattern is a regexp_like over "
    "the bounded string — no lookarounds, so Java regex and RE2 "
    "agree by construction.  Scale: sessionize → regex flags → one "
    "day-keyed aggregate; output ≤ #days rows; patterns evaluate "
    "scan-local in whole-stage codegen, no extra shuffle beyond the "
    "sessionizer's.",
)
def q_evt_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    paths = session_paths(e, with_start=True).select(
        F.to_date("sess_start").alias("day"), "path"
    )
    return (
        paths.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            *[
                F.sum(
                    F.when(F.regexp_like("path", F.lit(pat)), F.lit(1))
                    .otherwise(F.lit(0))
                ).alias(name)
                for name, pat in _CEP_PATTERNS.items()
            ],
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# E26: daily peak concurrent sessions (r13)
# ---------------------------------------------------------------------------

# E4's gap-sessionizer CTE, reduced to session bounds — the oracle twin
# of ``session_bounds`` below.
_CONCURRENCY_SESS_SQL = (
    "seq AS (SELECT user_id, event_id, ts, "
    "CASE WHEN lag(ts) OVER w IS NULL OR "
    f"ts > lag(ts) OVER w + INTERVAL {_SESSION_GAP_MIN} MINUTE "
    "THEN 1 ELSE 0 END AS new_sess FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id "
    "FROM seq), "
    "s AS (SELECT user_id, sess_id, min(ts) AS st, max(ts) AS en "
    "FROM sess GROUP BY 1, 2)"
)


def session_bounds(e: DataFrame) -> DataFrame:
    """(user_id, sess_id, start_ts, end_ts) via the E4 gap sessionizer
    — the interval frame E26's sweep line runs over.  Factored out so
    the concurrency property test can drive it with hand-built
    streams; boundary semantics identical to ``session_paths`` (an
    event at EXACTLY prev_ts + gap stays in the session)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + gap),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )


@register(
    "evt_peak_concurrency",
    oracle="WITH " + _CONCURRENCY_SESS_SQL + ", "
    "b AS (SELECT st AS t, 1 AS delta, user_id, sess_id FROM s "
    "UNION ALL SELECT en, -1, user_id, sess_id FROM s), "
    "r AS (SELECT CAST(t AS DATE) AS day, delta, "
    "sum(delta) OVER (ORDER BY t, delta DESC, user_id, sess_id) AS run "
    "FROM b) "
    "SELECT day, "
    "CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_started, "
    "CAST(max(run) AS BIGINT) AS peak_concurrency "
    "FROM r GROUP BY 1 ORDER BY 1",
    doc="Daily peak concurrent sessions (E26, r13): the +1/−1 sweep "
    "line A36's backlog docstring promises generalizes to concurrent-"
    "session counting, delivered — per day, how many gap-sessions "
    "started and the maximum number simultaneously open, THE "
    "capacity-planning number (connection pools, websocket fleets, "
    "live-ops dashboards all key on peak concurrency, not event "
    "volume).  Each E4 gap-session becomes a closed interval "
    "[first_ts, last_ts]; interval ends become +1/−1 boundary events "
    "(+1 sorts before −1 at equal timestamps, so a back-to-back "
    "handoff counts as overlapping — declared identically on both "
    "engines); peak = max of the boundary prefix sum within the day. "
    " Engine: CHUNK-AND-CARRY (the E9b linear-recurrence stance) — "
    "day-partitioned running sums in parallel, then per-day net "
    "changes cumulated over the ≤calendar-bounded day frame into "
    "carry-ins, peak = carry + intra-day max; the oracle computes "
    "the same prefix sum as ONE global running sum (fine at oracle "
    "scale, single-threaded at 100 TB — which is why the engine "
    "decomposes it), so agreement checks the decomposition algebra. "
    " Permuting equal-(t,delta) boundary ties cannot change "
    "n_started, net, or the running max (identical deltas commute), "
    "so the user_id/sess_id tiebreak is for determinism of the SCAN "
    "order only.  A session spanning midnight contributes its "
    "still-open count to later days through the carry, and a peak "
    "PLATEAU inherited at midnight is attributed to the day whose "
    "+1 boundary raised it (both engines sample the sum at boundary "
    "rows — the documented semantic).  Scale: sessions are one "
    "user_id shuffle (E4), boundaries two rows per session, the only "
    "non-day-parallel step is the #days-row carry cumsum.",
)
def q_evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    return daily_peak_concurrency(e)


def daily_peak_concurrency(e: DataFrame) -> DataFrame:
    """E26 body over any (user_id, event_id, ts) frame — factored out
    so the semantics test can drive it with hand-built streams
    (midnight-spanning sessions, back-to-back handoffs)."""
    s = session_bounds(e)
    b = (
        s.select(
            F.col("start_ts").alias("t"),
            F.lit(1).alias("delta"),
            "user_id",
            "sess_id",
        )
        .unionAll(
            s.select(
                F.col("end_ts").alias("t"),
                F.lit(-1).alias("delta"),
                "user_id",
                "sess_id",
            )
        )
        .withColumn("day", F.col("t").cast("date"))
    )
    wd = Window.partitionBy("day").orderBy(
        F.col("t").asc(), F.col("delta").desc(), "user_id", "sess_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per_day = (
        b.withColumn("run", F.sum("delta").over(wd))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_started"),
            F.max("run").alias("peak_local"),
            F.sum("delta").alias("net"),
        )
    )
    # Calendar-bounded carry (the A36 collapsed-domain stance): one
    # ordered pass over <= #days rows turns per-day net changes into
    # the open-session count inherited at each midnight.
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_day.withColumn(
            "carry", F.coalesce(F.sum("net").over(wc), F.lit(0))
        )
        .select(
            "day",
            "n_started",
            (F.col("carry") + F.col("peak_local"))
            .cast("long")
            .alias("peak_concurrency"),
        )
        .orderBy("day")
    )

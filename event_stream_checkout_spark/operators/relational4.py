"""Relational surface, wave 4: the frequent-items sketch verdict and
unpivot/melt — closing two remaining gaps in the analytics function
surface (A5c completes the sketch family next to HLL and
approx-percentile; fn_unpivot is the inverse of agg_pivot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import register
from ..tables import load_table

# Frequent-items support: items with frequency > n/_FI_K are "heavy
# hitters".  With 5 event types at ~n/5 each, k=6 makes all five
# frequent at every SF — a stable exact side for the verdict.
_FI_K = 6


@register(
    "agg_freq_items",
    # As with the HLL and approx-percentile verdicts, the sketch
    # content itself is engine-internal (freqItems is partition-order
    # sensitive in which EXTRA items it returns); what is deterministic
    # — and what the algorithm guarantees — is that every item with
    # true frequency > n/k IS in the sketch.  The query emits the
    # exact heavy hitters with an in-sketch boolean; the oracle
    # computes the identical exact side and asserts TRUE.
    oracle="WITH n AS (SELECT count(*) AS n_rows FROM events), "
    "exact AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt "
    "FROM events GROUP BY 1) "
    f"SELECT e.event_type, e.cnt, TRUE AS in_sketch "
    f"FROM exact e, n WHERE e.cnt * {_FI_K} > n.n_rows",
    doc="Frequent-items sketch with exact-side verdict (A5c): "
    "df.stat.freqItems — a merge-able one-pass heavy-hitter sketch "
    "(Karp et al.), THE way to find hot keys at 100 TB before "
    "deciding a skew strategy, where an exact group-count of a "
    "high-cardinality column is itself the expensive thing. The "
    "sketch's guarantee (every item with freq > n/k is returned; "
    "extras possible) is exactly what the query grades: the exact "
    "heavy hitters join the sketch array and must all be present. "
    "Same verdict pattern as agg_approx_distinct (HLL bound) and "
    "agg_approx_percentile (rank bound).",
)
def q_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type")
    sketch = e.stat.freqItems(["event_type"], support=1.0 / _FI_K).select(
        F.col("event_type_freqItems").alias("_items")
    )
    n = e.agg(F.count(F.lit(1)).alias("_n"))
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * _FI_K > F.col("_n"))
        .crossJoin(F.broadcast(sketch))
        .select(
            "event_type",
            "cnt",
            F.array_contains(F.col("_items"), F.col("event_type")).alias(
                "in_sketch"
            ),
        )
    )


_UNPIVOT_MEASURES = ("n_orders", "sum_price", "max_price")


@register(
    "fn_unpivot",
    oracle="WITH w AS (SELECT o_orderstatus, "
    "CAST(count(*) AS DOUBLE) AS n_orders, "
    f"{sql_dsum('o_totalprice')} AS sum_price, "
    "max(o_totalprice) AS max_price FROM orders GROUP BY 1) "
    "SELECT o_orderstatus, measure, value FROM w "
    f"UNPIVOT (value FOR measure IN ({', '.join(_UNPIVOT_MEASURES)}))",
    doc="Unpivot / melt (O5, the inverse of agg_pivot): a wide "
    "per-status measure row becomes (status, measure, value) long "
    "form — the reshaping every metrics export needs. Spark's "
    "native unpivot is a scan-local flatMap (1 row → #measures rows, "
    "no shuffle beyond the feeding aggregate); measures are cast to a "
    "common double type, sums via the stable-sum policy so the long "
    "form hash-matches across engines.",
)
def q_fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"], list(_UNPIVOT_MEASURES), "measure", "value"
    )

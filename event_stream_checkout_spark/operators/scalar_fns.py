"""Scalar function surface (SURVEY.md §2.7, F1-F12).

Every reference scalar behavior (JSON parse/serialize, MD5 content
hash, hex→UUID formatting, ISO timestamps, latency derivation) as
native Catalyst expressions, plus the EXT string/date/math/array/map
families the oracle harness exercises.  Zero Python UDFs — all of this
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.core import epoch_seconds, uuid_from_hex
from ..registry import register
from ..tables import load_table


@register(
    "fn_json_parse",
    oracle="SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
    "AS k_val FROM events",
    doc="JSON field extraction (F1; ref json.loads src/ingest_order/"
    "app.py:19). get_json_object is JVM-side — no Python in the path.",
)
def q_fn_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "fn_map",
    oracle="SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
    "AS k_val, CAST(len(json_keys(props)) AS INTEGER) AS n_keys FROM events",
    doc="Map-typed access (F11): props parsed to MapType, element_at + "
    "cardinality.",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@register(
    "fn_json_serialize",
    oracle="SELECT c_custkey, to_json(struct_pack(c_custkey := c_custkey, "
    "c_name := c_name)) AS payload FROM customer",
    doc="Canonical JSON serialization (F2; ref json.dumps sort_keys "
    "src/ingest_order/app.py:30): field order fixed by struct "
    "construction.",
)
def q_fn_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.to_json(F.struct("c_custkey", "c_name")).alias("payload"),
    )


@register(
    "fn_md5",
    oracle="SELECT c_custkey, md5(c_name || ':' || CAST(c_custkey AS VARCHAR)) "
    "AS content_hash FROM customer",
    doc="MD5 content hash (F3; ref hashlib.md5 src/ingest_order/app.py:31).",
)
def q_fn_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(
            F.concat(F.col("c_name"), F.lit(":"), F.col("c_custkey").cast("string"))
        ).alias("content_hash"),
    )


@register(
    "fn_uuid_format",
    oracle="WITH h AS (SELECT c_custkey, md5(c_name) AS hex FROM customer) "
    "SELECT c_custkey, substring(hex, 1, 8) || '-' || substring(hex, 9, 4) "
    "|| '-' || substring(hex, 13, 4) || '-' || substring(hex, 17, 4) || '-' "
    "|| substring(hex, 21, 12) AS content_uuid FROM h",
    doc="Hex digest → UUID string (F4; ref str(uuid.UUID(hash)) "
    "src/ingest_order/app.py:32): the content-addressed identity "
    "used for idempotent order ids.",
)
def q_fn_uuid_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        uuid_from_hex(F.md5(F.col("c_name"))).alias("content_uuid"),
    )


@register(
    "fn_timestamps",
    oracle="SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso_ts, "
    "CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, "
    "CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m, "
    "CAST(hour(ts) AS INTEGER) AS h FROM events",
    doc="ISO-8601 wire format without TZ suffix (F5; ref "
    "datetime.utcnow().isoformat() src/ingest_order/app.py:39) + epoch "
    "and component extraction.",
)
def q_fn_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("iso_ts"),
        epoch_seconds(F.col("ts")).alias("epoch_s"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.hour("ts").alias("h"),
    )


@register(
    "fn_string",
    oracle="SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg, "
    "substring(c_name, 1, 8) AS prefix, CAST(length(c_name) AS INTEGER) AS name_len, "
    "lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key, "
    "split_part(c_name, '#', 2) AS name_num, "
    "replace(c_name, 'Customer', 'Cust') AS short_name, "
    "(c_name LIKE '%7') AS ends_in_7, "
    "regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_masked "
    "FROM customer",
    doc="String function family (F7).",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.col("c_name").like("%7").alias("ends_in_7"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("digits_masked"),
    )


@register(
    "fn_date",
    oracle="SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, "
    "CAST(month(o_orderdate) AS INTEGER) AS m, "
    "CAST(day(o_orderdate) AS INTEGER) AS d, "
    "date_trunc('month', o_orderdate) AS month_start, "
    "strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date, "
    "CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS INTEGER)"
    " AS days_to_98, "
    "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end "
    "FROM orders",
    doc="Date/time function family (F8).",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE values serialize as strings: engine-stable across
        # client libraries (date objects canonicalize differently).
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(
            F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_98"),
        F.date_format(
            F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd"
        ).alias("month_end"),
    )


@register(
    "fn_math",
    oracle="SELECT o_orderkey, abs(o_totalprice - 100000.0) AS dist, "
    "floor(o_totalprice) AS fl, ceil(o_totalprice) AS cl, "
    "sqrt(o_totalprice) AS rt, o_totalprice * o_totalprice AS sq, "
    "CAST(o_orderkey % 7 AS BIGINT) AS bucket, "
    "round(ln(o_totalprice), 6) AS log_price, "
    "CAST(sign(o_totalprice - 100000.0) AS DOUBLE) AS above "
    "FROM orders",
    doc="Math function family (F9). sqrt is IEEE-correctly-rounded "
    "(engine-stable); ln rounded to 6 (libm implementations may differ "
    "in the last ulp).",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000.0).alias("dist"),
        F.floor(p).cast("double").alias("fl"),
        F.ceil(p).cast("double").alias("cl"),
        F.sqrt(p).alias("rt"),
        (p * p).alias("sq"),
        (F.col("o_orderkey") % 7).alias("bucket"),
        F.round(F.log(p), 6).alias("log_price"),
        F.signum(p - 100000.0).alias("above"),
    )


@register(
    "fn_array",
    oracle="SELECT l_orderkey, CAST(count(*) AS INTEGER) AS n_items, "
    "CAST(sum(l_quantity) AS DOUBLE) AS total_qty, "
    "max(l_quantity) AS max_qty, min(l_quantity) AS min_qty, "
    "CAST(count(*) FILTER (WHERE l_quantity >= 25) AS INTEGER) AS n_big, "
    "bool_or(l_quantity = 1) AS has_single "
    "FROM lineitem GROUP BY l_orderkey",
    doc="Array function family (F10): per-order quantity vector built "
    "with collect_list, then size/aggregate/filter/array_max/exists — "
    "all expression-level (no UDF). Oracle states the same semantics "
    "relationally.",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    qtys = F.col("qtys")
    return (
        l.groupBy("l_orderkey")
        .agg(F.collect_list("l_quantity").alias("qtys"))
        .select(
            "l_orderkey",
            F.size(qtys).alias("n_items"),
            F.aggregate(qtys, F.lit(0.0), lambda acc, x: acc + x).alias("total_qty"),
            F.array_max(qtys).alias("max_qty"),
            F.array_min(qtys).alias("min_qty"),
            F.size(F.filter(qtys, lambda x: x >= 25)).alias("n_big"),
            F.exists(qtys, lambda x: x == 1).alias("has_single"),
        )
    )


@register(
    "fn_latency",
    oracle="SELECT l.l_orderkey, l.l_linenumber, "
    "CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INTEGER) AS latency_days, "
    "CAST(floor(epoch(l.l_shipdate)) - floor(epoch(o.o_orderdate)) AS BIGINT) "
    "AS latency_s FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey",
    doc="Latency derivation processed_at - created_at (F12; ref "
    "db/init_schema.sql:22-23).",
)
def q_fn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("latency_days"),
        (
            epoch_seconds(F.col("l_shipdate")) - epoch_seconds(F.col("o_orderdate"))
        ).alias("latency_s"),
    )

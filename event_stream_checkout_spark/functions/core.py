"""Scalar-function building blocks (SURVEY.md §2.7), all native Columns.

Reproduces the reference's hand-written Python scalar logic as Catalyst
expressions — zero Python UDFs:

- content-addressed order identity: ``UUID(md5(canonical_json))``
  (reference: src/ingest_order/app.py:30-32)
- canonical JSON with sorted keys (``json.dumps(..., sort_keys=True)``,
  src/ingest_order/app.py:30) — field order fixed by struct construction
- payload validation predicate (src/ingest_order/app.py:76-92)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(c: Column) -> Column:
    """Whole seconds since epoch for a TIMESTAMP_NTZ column,
    timezone-independent (floor semantics for positive timestamps —
    matches DuckDB's floor(epoch(ts)))."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("SECOND", epoch, c)


def uuid_from_hex(hex_col: Column) -> Column:
    """Format a 32-char hex digest as 8-4-4-4-12 UUID (app.py:32)."""
    return F.concat_ws(
        "-",
        F.substring(hex_col, 1, 8),
        F.substring(hex_col, 9, 4),
        F.substring(hex_col, 13, 4),
        F.substring(hex_col, 17, 4),
        F.substring(hex_col, 21, 12),
    )


def content_order_id(customer_id: Column, items_json: Column) -> Column:
    """Deterministic content-addressed order id.

    Mirrors ``uuid.UUID(hashlib.md5(json.dumps({"c":..., "i":...},
    sort_keys=True)).hexdigest())`` (src/ingest_order/app.py:30-32):
    same payload → same id, forever.  Canonical form here is the
    sorted-key JSON of (customer_id, items).
    """
    canonical = F.concat(
        F.lit('{"c": "'), customer_id, F.lit('", "i": '), items_json, F.lit("}")
    )
    return uuid_from_hex(F.md5(canonical))


def valid_order_predicate(
    customer_id: str = "customer_id", items: str = "items"
) -> Column:
    """The reference's payload validation as one boolean Column.

    Rules (src/ingest_order/app.py:76-92): customer_id present and a
    string; items present, a non-empty list; every item has product_id
    and an integer quantity > 0.
    """
    c = F.col(customer_id)
    it = F.col(items)
    return (
        c.isNotNull()
        & it.isNotNull()
        & (F.size(it) > 0)
        & F.forall(
            it,
            lambda x: x["product_id"].isNotNull()
            & x["quantity"].isNotNull()
            & (x["quantity"] > 0),
        )
    )

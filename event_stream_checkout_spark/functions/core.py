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


def canonical_items_json(items: Column) -> Column:
    """Items array serialized EXACTLY as Python's
    ``json.dumps(items, sort_keys=True)`` would emit it for the wire
    schema — ``", "`` element separator, ``": "`` after keys, item keys
    in sorted order (product_id < quantity):

        [{"product_id": "p1", "quantity": 2}, {...}]

    Spark's ``to_json`` is compact (no spaces), so the string is built
    by expression instead.  Not modeled (same caveats as the reference,
    whose payloads are plain ids): JSON string escaping inside
    product/customer ids, and item fields beyond the wire schema.
    """
    item = lambda x: F.concat(  # noqa: E731
        F.lit('{"product_id": "'),
        x["product_id"],
        F.lit('", "quantity": '),
        x["quantity"].cast("string"),
        F.lit("}"),
    )
    return F.concat(F.lit("["), F.array_join(F.transform(items, item), ", "), F.lit("]"))


def content_order_id(customer_id: Column, items: Column) -> Column:
    """Deterministic content-addressed order id, byte-compatible with
    the reference.

    Mirrors ``uuid.UUID(hashlib.md5(json.dumps({"c":..., "i":...},
    sort_keys=True).encode()).hexdigest())`` (src/ingest_order/
    app.py:30-32) — the digest input reproduces Python's default
    ``json.dumps`` separators exactly, so the same payload yields the
    SAME order_id the reference system would generate
    (verified against hashlib in tests/test_checkout_golden.py).

    ``items`` is the typed items array column (not pre-serialized
    JSON — serialization is part of the identity contract).
    """
    canonical = F.concat(
        F.lit('{"c": "'),
        customer_id,
        F.lit('", "i": '),
        canonical_items_json(items),
        F.lit("}"),
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

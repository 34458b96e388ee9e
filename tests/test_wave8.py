"""Wave-8 decision-support semantics: Q19's no-cross-branch-mixing
disjunction, Q2's region-scoped min with all ties surfacing, Q16's
exclusion anti-join, and Q20's strict half-demand threshold — on
crafted inputs where the right answer is computed by hand.  Oracle
parity (tests/test_parity.py) pins cross-engine equality; these pin
the SEMANTIC claims the docstrings make.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from event_stream_checkout_spark.operators.relational7 import (
    q_agg_disjunctive_revenue,
    q_agg_supplier_part_counts,
    q_join_min_cost_supplier,
    q_join_promotable_suppliers,
)


def _write(tmp_path, name, pdf):
    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir, exist_ok=True)
    pdf.to_parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def test_disjunctive_revenue_no_cross_branch_mixing(spark, tmp_path):
    """Q19's trap: a row must satisfy ONE branch in full — a Brand#12
    part with a branch-3 quantity (25) matches no branch even though
    both the brand and the quantity appear somewhere in the predicate."""
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_brand": ["Brand#12", "Brand#24"],
            "p_size": [3, 15],
        }
    )
    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 2, 2],
            # part 1 (Brand#12, qty<=11): qty 25 mixes branches -> out;
            # qty 11 is the branch-1 boundary -> in.
            # part 2 (Brand#24, qty 20..30): qty 30 boundary -> in;
            # qty 31 -> out.
            "l_quantity": [25.0, 11.0, 30.0, 31.0],
            "l_extendedprice": [100.0, 100.0, 100.0, 100.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    )
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    row = q_agg_disjunctive_revenue(spark, sf).collect()[0]
    assert row["n_items"] == 2
    assert row["revenue"] == 200.0


def test_min_cost_supplier_region_scope_and_ties(spark, tmp_path):
    """Q2's two subtleties: the min is taken over the REGION-scoped
    suppliers only (a cheaper out-of-region quote must not suppress
    the regional winners), and ALL suppliers at the min surface."""
    region = pd.DataFrame(
        {"r_regionkey": [0, 3], "r_name": ["ASIA", "EUROPE"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": [10, 11, 20],
            "n_name": ["NATION_A", "NATION_B", "NATION_X"],
            "n_regionkey": [3, 3, 0],  # A, B in EUROPE; X in ASIA
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3],
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": [10, 11, 20],
            "s_acctbal": [50.0, 40.0, 99.0],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [7], "p_type": ["STANDARD"], "p_size": [5]}
    )
    li = pd.DataFrame(
        {
            "l_partkey": [7, 7, 7],
            "l_suppkey": [1, 2, 3],
            # unit costs: S1 = 20/2 = 10, S2 = 30/3 = 10 (tie),
            # S3 = 1/1 = 1 — cheapest, but out of region.
            "l_extendedprice": [20.0, 30.0, 1.0],
            "l_quantity": [2.0, 3.0, 1.0],
        }
    )
    sf = _write(tmp_path, "region", region)
    _write(tmp_path, "nation", nation)
    _write(tmp_path, "supplier", supplier)
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    rows = q_join_min_cost_supplier(spark, sf).collect()
    assert [(r["s_name"], r["unit_cost"]) for r in rows] == [
        ("S1", 10.0),
        ("S2", 10.0),
    ]


def test_supplier_part_counts_exclusion_and_distinct(spark, tmp_path):
    """Q16: the in-arrears supplier is excluded by the anti-join,
    duplicate lineitems collapse to one supplier, and a disqualified
    part type yields no group at all."""
    supplier = pd.DataFrame(
        {"s_suppkey": [1, 2], "s_acctbal": [5.0, -1.0]}
    )
    part = pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_brand": ["Brand#1", "Brand#2"],
            "p_type": ["SMALL", "PROMO"],  # PROMO is excluded
            "p_size": [4, 4],
        }
    )
    li = pd.DataFrame(
        {
            # part 1: supp 1 twice (dup), supp 2 (excluded);
            # part 2: supp 1 — but the part's type disqualifies it.
            "l_partkey": [1, 1, 1, 2],
            "l_suppkey": [1, 1, 2, 1],
        }
    )
    sf = _write(tmp_path, "supplier", supplier)
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)
    rows = q_agg_supplier_part_counts(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_brand"], r["p_size"], r["supplier_cnt"]) == ("Brand#1", 4, 1)


def test_promotable_suppliers_strict_threshold_and_scopes(spark, tmp_path):
    """Q20's boundary: exactly half the year's demand does NOT qualify
    (strict >), an excess position in a non-target part counts for
    nothing, and an out-of-region supplier never surfaces."""
    part = pd.DataFrame(
        {"p_partkey": [1, 2], "p_name": ["small widget", "red bolt"]}
    )
    region = pd.DataFrame(
        {"r_regionkey": [2, 3], "r_name": ["ASIA", "EUROPE"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": [7, 8],
            "n_name": ["NATION_7", "NATION_8"],
            "n_regionkey": [2, 3],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3, 4],
            "s_name": ["S1", "S2", "S3", "S4"],
            # S1, S2, S4 in ASIA; S3 in EUROPE
            "s_nationkey": [7, 7, 8, 7],
        }
    )
    y = dt.datetime(1996, 6, 1)
    outside = dt.datetime(1995, 6, 1)
    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 1, 2],
            "l_suppkey": [1, 2, 2, 3, 4],
            # part 1 year total = 6 + 6 = 12.
            # S1: all-time 6 -> 2*6 == 12, NOT > -> out (boundary).
            # S2: 6 in-year + 1 outside = 7 -> 14 > 12 -> in.
            # S3: all-time 20 > half, but EUROPE -> out.
            "l_quantity": [6.0, 6.0, 1.0, 20.0, 50.0],
            "l_shipdate": [y, y, outside, outside, y],
        }
    )
    # µs precision: pandas' default ns timestamps read back as BIGINT
    # under the session's nanosAsLong conf (events-table compat).
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    sf = _write(tmp_path, "part", part)
    _write(tmp_path, "region", region)
    _write(tmp_path, "nation", nation)
    _write(tmp_path, "supplier", supplier)
    _write(tmp_path, "lineitem", li)
    rows = q_join_promotable_suppliers(spark, sf).collect()
    assert [r["s_name"] for r in rows] == ["S2"]

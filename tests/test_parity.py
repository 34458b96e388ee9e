"""Oracle-parity harness: mirrors the driver's correctness gate.

For every registered query with an oracle, run the Spark DataFrame and
the DuckDB SQL on the same parquet tables and require *exact* equality:
same columns, same row count, same values (order-insensitive).  The
engine's numeric policy (functions/numeric.py) is what makes exact
float equality achievable across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from event_stream_checkout_spark.registry import load_all

QUERIES = load_all()
from tests.conftest import SF_DIR  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by stringified
    values, datetimes normalized to datetime64[us]."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            # normalize date/decimal objects to strings for stable compare
            df[col] = df[col].map(lambda v: None if v is None else str(v))
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return df


def assert_frames_equal(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, key: str):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{key}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{key}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s, o = canon(spark_df), canon(oracle_df)
    for col in s.columns:
        sv, ov = s[col].values, o[col].values
        if pd.api.types.is_float_dtype(s[col]) and pd.api.types.is_float_dtype(o[col]):
            both_nan = pd.isna(sv) & pd.isna(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = np.where(~eq)[0][:5]
                diffs = [(i, sv[i], ov[i]) for i in bad]
                raise AssertionError(
                    f"{key}.{col}: {int((~eq).sum())}/{len(eq)} float mismatches, "
                    f"max abs diff={np.nanmax(np.abs(sv - ov))}, sample={diffs}"
                )
        else:
            sv2 = pd.Series(sv).where(pd.Series(sv).notna(), None)
            ov2 = pd.Series(ov).where(pd.Series(ov).notna(), None)
            neq = ~(sv2.eq(ov2) | (sv2.isna() & ov2.isna()))
            if neq.any():
                bad = np.where(neq.values)[0][:5]
                diffs = [(i, sv2.iloc[i], ov2.iloc[i]) for i in bad]
                raise AssertionError(
                    f"{key}.{col}: {int(neq.sum())}/{len(neq)} mismatches, "
                    f"sample={diffs} (spark dtype={s[col].dtype}, "
                    f"oracle dtype={o[col].dtype})"
                )


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_parity(key, spark, duck):
    q = QUERIES[key]
    sdf = q.fn(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke, mirrors driver's weak check
        return
    odf = duck.sql(q.oracle).df()
    assert_frames_equal(sdf, odf, key)


def test_approx_distinct_error_bound(spark, duck):
    """agg_approx_distinct has no value oracle by design — HLL sketches
    are engine-internal and not portable — but the sketch IS
    quantitatively checked: per group, the HLL++ estimate must be
    within 2% relative error of DuckDB's exact distinct count."""
    sdf = (
        QUERIES["agg_approx_distinct"].fn(spark, SF_DIR)
        .toPandas()
        .set_index("o_orderstatus")
    )
    exact = duck.sql(
        "SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n "
        "FROM orders GROUP BY o_orderstatus"
    ).df().set_index("o_orderstatus")
    assert set(sdf.index) == set(exact.index)
    for status, n in exact["n"].items():
        approx = int(sdf.loc[status, "approx_customers"])
        rel_err = abs(approx - int(n)) / max(int(n), 1)
        assert rel_err <= 0.02, (status, approx, int(n), rel_err)
        # The Spark-side exact column must agree with DuckDB exactly.
        assert int(sdf.loc[status, "exact_customers"]) == int(n)


def test_approx_percentile_rank_error_bound(spark, duck):
    """agg_approx_percentile has no value oracle by design — quantile
    sketches are engine-internal — but each estimate must fall between
    the exact quantiles at the ±0.5% neighboring ranks (accuracy=10000
    guarantees 1/10000 rank error; 0.005 leaves comfortable margin
    while still failing on any real regression)."""
    sdf = (
        QUERIES["agg_approx_percentile"].fn(spark, SF_DIR)
        .toPandas()
        .set_index("o_orderstatus")
    )
    eps = 0.005
    for q, col in ((0.5, "ap50"), (0.9, "ap90"), (0.99, "ap99")):
        exact = duck.sql(
            f"SELECT o_orderstatus, "
            f"quantile_cont(o_totalprice, {max(q - eps, 0)}) AS lo, "
            f"quantile_cont(o_totalprice, {min(q + eps, 1)}) AS hi "
            "FROM orders GROUP BY o_orderstatus"
        ).df().set_index("o_orderstatus")
        assert set(sdf.index) == set(exact.index)
        for status in exact.index:
            v = float(sdf.loc[status, col])
            lo, hi = float(exact.loc[status, "lo"]), float(exact.loc[status, "hi"])
            assert lo <= v <= hi, (status, col, v, lo, hi)

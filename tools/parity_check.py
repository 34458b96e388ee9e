"""Quick oracle-parity spot check for a subset of registry keys.

Usage: python tools/parity_check.py key1 key2 ... [--sf /root/testdata/sf0.01]

Mirrors tests/test_parity.py's compare (column set, row count, canonical
values) without the pytest fixtures — for fast iteration on new ops.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from event_stream_checkout_spark.registry import load_all  # noqa: E402
from event_stream_checkout_spark.session import configure  # noqa: E402
from event_stream_checkout_spark.tables import TABLE_NAMES  # noqa: E402


from tools.null_sweep import canon  # noqa: E402  (single shared impl)


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    configure(spark)
    duck = duckdb.connect()
    for name in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"parquet_scan('{sf}/{name}.parquet')"
        )
    queries = load_all()
    failures = 0
    for key in args:
        q = queries[key]
        try:
            sdf = q.fn(spark, sf).toPandas()
            if q.oracle is None:
                print(f"{key}: rows-only, spark={len(sdf)}")
                continue
            odf = duck.sql(q.oracle).df()
            assert sorted(sdf.columns) == sorted(odf.columns), (
                f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
            assert len(sdf) == len(odf), f"rows spark={len(sdf)} oracle={len(odf)}"
            s, o = canon(sdf), canon(odf)
            for col in s.columns:
                sv, ov = s[col].values, o[col].values
                if pd.api.types.is_float_dtype(s[col]):
                    eq = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
                else:
                    eq = pd.Series(sv).eq(pd.Series(ov)) | (
                        pd.Series(sv).isna() & pd.Series(ov).isna()
                    )
                    eq = eq.values
                if not eq.all():
                    bad = np.where(~eq)[0][:3]
                    raise AssertionError(
                        f"{col}: {(~eq).sum()}/{len(eq)} mismatch, "
                        f"sample={[(i, sv[i], ov[i]) for i in bad]}"
                    )
            print(f"{key}: OK rows={len(sdf)}")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{key}: FAIL — {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

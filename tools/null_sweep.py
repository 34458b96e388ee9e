"""NULL-injection parity sweep: re-run the engine-vs-DuckDB oracle
compare on a copy of the testdata with NULLs deterministically injected
into nullable non-key columns — the failure surface the per-SF parity
gate never exercises (the driver corpus carries no NULL measures, so a
Spark-vs-DuckDB divergence in NULL arithmetic, NULL group keys, or
NULL ordering inside a window would pass every existing gate and still
misfire on real data; the r7 advisor's sigma=0 find was exactly this
class).

Usage: python tools/null_sweep.py [base_sf_dir] [out_dir]
       (defaults: /root/testdata/sf0.001  /tmp/ecs_nulled)

Injection policy (deterministic — id-hash-derived, no randomness):
- measures → NULL on ~1/7 of rows: lineitem.l_discount/l_tax,
  orders.o_totalprice, customer.c_acctbal, supplier.s_acctbal,
  part.p_retailprice, events.value, embeddings.label
- attributes → NULL on ~1/11 of rows: documents.lang,
  events.props, part.p_type
- keys, timestamps, event_type, text, embedding vectors stay intact
  (nulling identity/time would make every query degenerate rather
  than NULL-exercised; a NULL text sweep is a separate, stricter
  pass).

For every registered key WITH an oracle, runs the same compare as
tools/parity_check.py (column set, row count, canonical values) and
prints one line per key; exits nonzero if any key diverges or throws
on one engine only.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from event_stream_checkout_spark.registry import load_all  # noqa: E402
from event_stream_checkout_spark.session import get_session  # noqa: E402
from event_stream_checkout_spark.tables import TABLE_NAMES  # noqa: E402

# (table, column, modulus): null rows where id_col % modulus == 0.
# Carries BOTH injection families of the documented policy — measures
# (1/7 moduli) and attributes (1/11 moduli) — hence INJECTIONS, not
# MEASURES (ADVICE.md r8 naming finding).
INJECTIONS = {
    "lineitem": [("l_discount", "l_orderkey", 7), ("l_tax", "l_orderkey", 5)],
    "orders": [("o_totalprice", "o_orderkey", 7)],
    "customer": [("c_acctbal", "c_custkey", 7)],
    "supplier": [("s_acctbal", "s_suppkey", 7)],
    "part": [("p_retailprice", "p_partkey", 7), ("p_type", "p_partkey", 11)],
    "events": [("value", "event_id", 7), ("props", "event_id", 11)],
    "documents": [("lang", "doc_id", 11)],
    "embeddings": [("label", "vec_id", 7)],
}


def build_nulled(base: str, out: str, null_text: bool = False) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLE_NAMES:
        tbl = pq.read_table(os.path.join(base, f"{t}.parquet"))
        plan = list(INJECTIONS.get(t, []))
        if null_text and t == "documents":
            # Stricter pass: NULL document text too (1/13 of docs) —
            # every tokenizer/decode path must treat a NULL document
            # as an absent observation on both engines.
            plan.append(("text", "doc_id", 13))
        for col, idc, mod in plan:
            ids = tbl.column(idc).to_numpy(zero_copy_only=False)
            mask = pa.array((ids % mod) == 0)
            i = tbl.schema.get_field_index(col)
            nulled = pc.if_else(
                mask, pa.scalar(None, tbl.schema.field(col).type), tbl.column(col)
            )
            tbl = tbl.set_column(i, tbl.schema.field(col), nulled)
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Engine-neutral canonical form: sorted columns, us-precision
    timestamps, stringified objects, stable row order by joined row
    string.  SINGLE implementation shared with tests/test_null_parity.py
    (ADVICE.md r8: a fix applied to one copy must reach the gate too).
    """
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif df[col].dtype == object:
            df[col] = df[col].map(lambda v: None if v is None else str(v))
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return df


def canon_rows(df: pd.DataFrame) -> list[str]:
    """Canonical sorted row-string list — the value-compare payload."""
    df = canon(df)
    return list(df.astype(str).agg("|".join, axis=1)) if len(df) else []


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out = args[1] if len(args) > 1 else "/tmp/ecs_nulled"
    build_nulled(base, out, null_text="--text" in sys.argv)
    print(f"nulled replica at {out}")

    spark = get_session("null-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{out}/{name}.parquet')"
        )

    queries = load_all()
    failures: dict[str, str] = {}
    n_checked = 0
    for key, q in queries.items():
        if q.oracle is None:
            continue
        try:
            sdf = canon(q.fn(spark, out).toPandas())
        except Exception as e:  # noqa: BLE001
            failures[key] = f"ENGINE THREW: {str(e).splitlines()[0][:160]}"
            continue
        try:
            odf = canon(con.sql(q.oracle).df())
        except Exception as e:  # noqa: BLE001
            failures[key] = f"ORACLE THREW: {str(e).splitlines()[0][:160]}"
            continue
        n_checked += 1
        if sorted(sdf.columns) != sorted(odf.columns):
            failures[key] = f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
        elif len(sdf) != len(odf):
            failures[key] = f"rows {len(sdf)} != {len(odf)}"
        else:
            a = sorted(sdf.astype(str).agg("|".join, axis=1)) if len(sdf) else []
            b = sorted(odf.astype(str).agg("|".join, axis=1)) if len(odf) else []
            if a != b:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1
                )
                failures[key] = (
                    f"values diverge (first at sorted row {diff}): "
                    f"spark={a[diff][:120]!r} oracle={b[diff][:120]!r}"
                    if diff >= 0
                    else "values diverge"
                )
        status = "FAIL" if key in failures else "ok"
        print(f"{key}: {status}" + (f" — {failures[key]}" if key in failures else ""))

    print(f"\nchecked {n_checked} oracle keys; {len(failures)} divergent")
    for k, v in failures.items():
        print(f"  {k}: {v}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local mimic of the driver's correctness gate: run every ``queries()``
entry at sf0.01 and compare against ``oracle_sql()`` via DuckDB —
row count, column names, and order-insensitive exact values.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return (f"SCHEMA mismatch: ray={sorted(ray_df.columns)} "
                f"sql={sorted(sql_df.columns)}")
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT mismatch: ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype != bv.dtype:
            # the driver's value hash is type/bit-sensitive (lang_summary
            # r1 failed on int64 vs float64 with equal numbers) — mirror it
            return (f"DTYPE mismatch col={c}: ray={av.dtype} sql={bv.dtype}")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
        else:
            eq = av == bv
        if not np.all(eq):
            i = int(np.flatnonzero(~eq)[0])
            return (f"VALUE mismatch col={c} row={i}: "
                    f"ray={av[i]!r} sql={bv[i]!r}")
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:24s} RAY ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(ray_df)} rows "
                  f"cols={list(ray_df.columns)}  [{dt:.1f}s]")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} SQL ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = verdict if verdict == "OK" else f"FAIL {verdict}"
        if verdict != "OK":
            failures += 1
        print(f"{name:24s} {status}  ({len(ray_df)} rows) [{dt:.1f}s]")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out_dir]

Runs each oracle SQL from verify_out/oracle_sql.json in DuckDB over the
testdata tables, loads the Spark parquet dump for the same query name,
canonicalizes both (columns sorted by name, rows sorted by all columns),
and diffs exactly. Dev tool only — the shipped Scala library does not
depend on it.
"""
import json
import sys

import glob

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def load_spark_dump(path: str) -> pd.DataFrame:
    """Read the Spark parquet dump via pyarrow, NOT DuckDB.

    The driver reads Spark's parquet natively, so its hash sees the exact
    written types (DECIMAL(38,0) stays an exact decimal). Loading through
    DuckDB's pandas bridge flattens decimals to approximate float64 on BOTH
    sides of the local compare, hiding exactly the bug class the driver
    catches (r4's q95). pyarrow keeps decimals as exact `object` values, so
    an exact-decimal-vs-float64 divergence now fails locally first.
    """
    files = sorted(glob.glob(f"{path}/*.parquet"))
    parts = [pq.read_table(f).to_pandas(date_as_object=False) for f in files]
    return pd.concat(parts, ignore_index=True)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in oracle.items():
        import os
        if not os.path.isdir(f"{out}/{name}"):  # filtered SPARK_GRAFT_ONLY dump
            continue
        try:
            got = canon(load_spark_dump(f"{out}/{name}"))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        # Driver parity: its hash is dtype-sensitive (e.g. a DuckDB HUGEINT
        # window sum lands as float64 while Spark writes int64 — values equal,
        # hash differs). Fail on dtype-kind mismatch; width-only differences
        # (int32 vs int64) stringify identically and pass the driver hash.
        kind = lambda s: {"u": "i"}.get(s.dtype.kind, s.dtype.kind)
        dtype_cols = [f"{c} (spark={got[c].dtype} oracle={exp[c].dtype})"
                      for c in got.columns if kind(got[c]) != kind(exp[c])]
        if dtype_cols:
            print(f"FAIL {name}: dtype mismatch: {'; '.join(dtype_cols)}")
            n_fail += 1
            continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                eq = (a.values == b.values) | (np.isnan(a.values) & np.isnan(b.values))
                if not eq.all():
                    mad = np.nanmax(np.abs(a.values - b.values))
                    diff_cols.append(f"{c} ({int((~eq).sum())} rows, maxabsdiff={mad:.3e})")
            else:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                if not eq.all():
                    i = int(np.argmax(~eq))
                    diff_cols.append(f"{c} ({int((~eq).sum())} rows, first@{i}: "
                                     f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r})")
        if diff_cols:
            print(f"FAIL {name}: value diffs: {'; '.join(diff_cols)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

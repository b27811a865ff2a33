#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture tables and compare against the parquet written by
graft.Verify. Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, exp: pd.DataFrame, got: pd.DataFrame) -> str:
    if sorted(exp.columns) != sorted(got.columns):
        return f"COLS oracle={sorted(exp.columns)} spark={sorted(got.columns)}"
    if len(exp) != len(got):
        return f"ROWS oracle={len(exp)} spark={len(got)}"
    exp, got = norm(exp), norm(got)
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            ev, gv = e.astype(float).values, g.astype(float).values
            if not np.array_equal(ev, gv, equal_nan=True):
                bad = np.where(~((ev == gv) | (pd.isna(ev) & pd.isna(gv))))[0][:3]
                return (f"VAL col={c} rows={bad.tolist()} "
                        f"oracle={ev[bad].tolist()} spark={gv[bad].tolist()} "
                        f"maxdiff={np.nanmax(np.abs(ev - gv))}")
            # byte-level -0.0 check (driver may hash raw bytes)
            if not np.array_equal(np.signbit(ev), np.signbit(gv)):
                return f"VAL col={c} signed-zero mismatch"
        else:
            es = e.astype(str).values
            gs = g.astype(str).values
            if not (es == gs).all():
                bad = np.where(es != gs)[0][:3]
                return (f"VAL col={c} rows={bad.tolist()} "
                        f"oracle={es[bad].tolist()} spark={gs[bad].tolist()}")
    return ""


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional: restrict to named queries
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    fails = 0
    for name in sorted(oracle):
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ORACLE ERROR {e}")
            fails += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        msg = compare(name, exp, got)
        if msg:
            print(f"FAIL {name}: {msg}")
            fails += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

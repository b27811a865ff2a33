#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture tables and compare against the parquet written by
graft.Verify. Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

# GRAFT_DUCKDB_MEMLIMIT (e.g. "500MB"): pin DuckDB's memory_limit with
# spill-to-disk disabled, so the gate proves each oracle fits the margin
# locally instead of discovering a squeeze in the driver's run (the r12
# lesson: 3 green oracles went red from driver-side cumulative memory).
# GRAFT_DUCKDB_MEMSTATS=1: report DuckDB's resident buffer bytes after
# each oracle, naming the hogs before a squeeze does.
MEMLIMIT = os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "")
MEMSTATS = os.environ.get("GRAFT_DUCKDB_MEMSTATS", "") == "1"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Driver-faithful dtype gate. The driver hashes each side's pandas frame
# dtype-aware (DuckDB result via .df(), Spark result via read_parquet), so
# the gate compares the same post-coercion dtype CLASSES. r9 evidence pins
# the semantics: an uncast SUM(CASE...) arrives as HUGEINT -> pandas float64
# against Spark's int64 and the driver FAILED it, while a DECIMAL(2,1)
# oracle column against Spark's double both coerce to float64 and PASSED,
# and date32-vs-DATE (object vs datetime64) also PASSED. So: int-vs-float
# (or any numeric/bool class split) fails; object-vs-datetime is tolerated.
def dtype_class(dtype) -> str:
    if dtype.kind in "iu":
        return "int"
    if dtype.kind == "f":
        return "float"
    if dtype.kind == "b":
        return "bool"
    return "timeish-or-object"  # dates/timestamps/strings/lists


def dtype_gate(rel, exp: pd.DataFrame, got: pd.DataFrame) -> str:
    if not len(exp) or not len(got):
        return ""  # empty frames carry no reliable coerced dtypes
    duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    for c in exp.columns:
        if c not in got.columns:
            continue  # column-set mismatch reported by compare()
        ec, gc = dtype_class(exp[c].dtype), dtype_class(got[c].dtype)
        if ec != gc:
            return (f"DTYPE col={c} oracle={exp[c].dtype} ({duck_types.get(c)}) "
                    f"spark={got[c].dtype} — driver's dtype-aware hash fails "
                    f"this even when values match (cast the oracle column)")
        if duck_types.get(c) == "HUGEINT":
            print(f"warn {c}: oracle column is HUGEINT (bare SUM?) — "
                  f"CAST it to BIGINT per the house discipline")
    return ""


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
    if MEMLIMIT:
        con.sql(f"SET memory_limit='{MEMLIMIT}'")
        con.sql("SET temp_directory=''")  # no spill: the limit is the limit
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional: restrict to named queries
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    fails = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            exp = rel.df()
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
        msg = dtype_gate(rel, exp, got) or compare(name, exp, got)
        mem = ""
        if MEMSTATS:
            b = con.sql("SELECT CAST(COALESCE(SUM(memory_usage_bytes),0) AS BIGINT)"
                        " FROM duckdb_memory()").fetchone()[0]
            mem = f" mem={b // (1 << 20)}MB"
        if msg:
            print(f"FAIL {name}: {msg}")
            fails += 1
        else:
            print(f"ok   {name} ({len(got)} rows){mem}")
    print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify parquet output.

Mimics the driver's t2 gate: for each query, run the oracle SQL in DuckDB
against the sf tables, load the Spark parquet result, sort columns by
name, sort rows, and compare values (exact for non-floats, tiny-eps for
floats to surface rounding-boundary hits distinctly from real bugs).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        r = compare(exp, got)
        results[name] = r
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL'} {name}: {v}")
    print(f"\n{ok}/{len(results)} queries match")
    return 0 if ok == len(results) else 1

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def compare(exp, got):
    if sorted(exp.columns) != sorted(got.columns):
        return f"SCHEMA: oracle={sorted(exp.columns)} spark={sorted(got.columns)}"
    if len(exp) != len(got):
        return f"ROWS: oracle={len(exp)} spark={len(got)}"
    exp, got = normalize(exp), normalize(got)
    # Dtype-kind mismatches FAIL: the driver hashes raw values, so a
    # float64 441.0 (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64)
    # vs Spark int64 441 is a driver-red even when every value is
    # numerically equal. Exception: a DuckDB float column whose values
    # are ALL exactly integral AND whose Spark twin is integer is still
    # a FAIL (that is precisely the q_trend trap) -- report it as DTYPE
    # so the oracle SQL gets an explicit CAST.
    dtype_bad = []
    for c in exp.columns:
        ek, gk = exp[c].dtype.kind, got[c].dtype.kind
        if ek == gk:
            continue
        num = set("iuf")
        if ek in num and gk in num:
            dtype_bad.append(
                f"{c}: oracle {exp[c].dtype} vs spark {got[c].dtype}"
                " (add an explicit CAST in the oracle SQL)")
        else:
            dtype_bad.append(f"{c}: oracle {exp[c].dtype} vs spark {got[c].dtype}")
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            e = e.astype(float); g = g.astype(float)
            mism = ~((e.isna() & g.isna()) | (e - g).abs().le(1e-12)
                     | (e == g))
            # Signed zero: IEEE says -0.0 == 0.0, but the driver hashes
            # raw bytes, so a DuckDB -0.0 vs Spark +0.0 is a driver-red
            # (the r12 q_salted trap). Flag exact zeros whose sign bit
            # differs -> fix with `+ 0.0` after the final round in the
            # oracle SQL, or integer-pin the output.
            zsign = ((e == 0.0) & (g == 0.0)
                     & (np.signbit(e.to_numpy()) != np.signbit(g.to_numpy())))
            mism = mism | zsign
        else:
            mism = ~((e.isna() & g.isna()) | (e.astype(str) == g.astype(str)))
        n = int(mism.sum())
        if n:
            i = mism.idxmax()
            bad.append(f"{c}: {n} mismatches e.g. oracle={e[i]} spark={g[i]}")
    if bad:
        return "VALUES: " + "; ".join(bad[:3])
    if dtype_bad:
        return "DTYPE: " + "; ".join(dtype_bad[:3])
    return "OK"

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

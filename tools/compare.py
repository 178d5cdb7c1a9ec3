#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [query ...]
(argument order is auto-detected: the sf dir is the one holding
lineitem.parquet)

For each query with an oracle in oracle_sql.json: run the oracle in DuckDB
over the sf parquet tables, load the Spark parquet dump, sort columns by
name, sort rows, and hash-compare values. Exits non-zero on any failure
and prints an "== N ok, M failed ==" summary.
"""
import json, os, sys, glob, hashlib
import duckdb
import pandas as pd

if len(sys.argv) < 3:
    sys.exit(f"usage: {sys.argv[0]} <verify_out_dir> <sf_dir> [query ...]")
a, b = sys.argv[1], sys.argv[2]
if os.path.exists(f"{a}/lineitem.parquet"):
    sf_dir, out_dir = a, b
else:
    out_dir, sf_dir = a, b
# fail loudly on a typo'd path instead of an opaque DuckDB IO traceback
# at view-creation time (the order heuristic above would otherwise
# silently misassign both)
if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
    sys.exit(f"sf dir not found (no lineitem.parquet): {sf_dir}")
if not os.path.exists(f"{out_dir}/oracle_sql.json"):
    sys.exit(f"verify out dir not found (no oracle_sql.json): {out_dir}")
only = set(sys.argv[3:])

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
unknown = only - set(oracles)
if unknown:
    sys.exit(f"unknown query name(s): {sorted(unknown)}")

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # type-tagged rendering: a bare "<NULL>" sentinel collided
            # with a genuine string value "<NULL>", so a real
            # NULL-vs-string divergence hashed as OK. "S:"/"N:" prefixes
            # keep NULL distinct from every possible string.
            df[c] = df[c].map(
                lambda v: "N:" if v is None or
                (isinstance(v, float) and v != v) else "S:" + str(v))
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()

fails = 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        ora_df = con.execute(oracles[name]).fetchdf()
        s, o = norm(spark_df), norm(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        # STRICT hash, exactly like the driver: no dtype normalization.
        # pandas hash_pandas_object is dtype-sensitive across int/float
        # (int64 != float64 even for equal values), so a DuckDB HUGEINT
        # column rendered as float64 must be CAST in the oracle SQL, not
        # papered over here.
        match = rows and schema and h(s) == h(o)
        status = "OK" if match else "MISMATCH"
        if not match:
            fails += 1
            print(f"{name}: {status} rows={len(s)}/{len(o)} "
                  f"schema={list(s.columns)}/{list(o.columns)}")
            if rows and schema:
                dtype_diff = {c: (str(s[c].dtype), str(o[c].dtype))
                              for c in s.columns
                              if str(s[c].dtype) != str(o[c].dtype)}
                if dtype_diff:
                    print(f"  dtype diff (spark, oracle): {dtype_diff}")
                cmp = s.compare(o) if s.shape == o.shape else None
                if cmp is not None and not cmp.empty:
                    print(cmp.head(5))
        else:
            print(f"{name}: OK ({len(s)} rows)")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {type(e).__name__}: {e}")
total = len(only) if only else len(oracles)
print(f"== {total - fails} ok, {fails} failed ==")
sys.exit(1 if fails else 0)

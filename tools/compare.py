#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not engine code).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same parquet
tables, sorts columns by name and rows by all columns, and reports
match/mismatch per query.
"""
import json
import sys

import duckdb


def canon(rel):
    cols = sorted(rel.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    return rel.project(quoted).order(quoted).fetchall(), cols


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got, gcols = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            want, wcols = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_bad += 1
        elif got != want:
            n_bad += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w]
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}; "
                  f"first diffs: {diff[:3]}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(got)} rows)")
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

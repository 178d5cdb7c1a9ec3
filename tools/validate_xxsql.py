#!/usr/bin/env python3
"""Validate the Scala-generated DuckDB XXH64 CTE chain (XxHash64Sql)
against a pure-python XXH64 reference (xx64_ref.py, itself validated
against Spark's xxhash64 seed-42 output — see ProbeXx).

Usage:
  sbt "runMain graft.operators.ProbeXxSql /tmp/xx_ctes.sql"
  python3 tools/validate_xxsql.py /tmp/xx_ctes.sql
Covers 1-31 byte ASCII inputs (multi-chunk paths the corpus' <=8-byte
tokens never exercise). Dev-side only, like compare.py.
"""
import sys, os, duckdb
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xx64_ref import xxh64

raw = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xx_ctes.sql").read()
ctes, last = raw.rsplit("\n-- LAST=", 1)
toks = (["", "a", "ab", "abcd", "abcdefgh", "abcdefghi", "zebra777"]
        + [c * n for c, n in zip("xyqwert", (31, 24, 9, 13, 17, 20, 28))]
        + ["0123456789012345", "0123456789012345678901234567890"])
vals = ", ".join(f"('{t}')" for t in toks)
sql = f"WITH v(t) AS (VALUES {vals}),\n{ctes}\nSELECT t, h FROM {last}"
bad = [(t, int(h), xxh64(t.encode())) for t, h in duckdb.sql(sql).fetchall()
       if int(h) != xxh64(t.encode())]
print("ALL MATCH" if not bad else f"MISMATCHES: {bad}")
sys.exit(1 if bad else 0)

#!/usr/bin/env python3
"""Dev-only check that the DuckDB lshBits twin (Similarity.lshBitsSql)
agrees with the Scala integer formula at every boundary.

The Scala side picks the smallest b in [6, 24] with (1 << b) * 32 >= n,
else 24; the oracle replays it as
  coalesce((SELECT min(b) FROM range(6, 25) t(b)
            WHERE (CAST(1 AS BIGINT) << b) * 32 >= n), 24).
CORRECTNESS only exercises one corpus count per round, so this sweeps
the cutover boundaries (2^b * 32 and +/-1 for every b) plus the clamps.

  python3 tools/validate_lshbits.py   # prints OK or the mismatches
"""
import duckdb

MIN_B, MAX_B, TARGET = 6, 24, 32


def scala_lsh_bits(n: int) -> int:
    for b in range(MIN_B, MAX_B + 1):
        if (1 << b) * TARGET >= n:
            return b
    return MAX_B


ns = [1, 2, TARGET, TARGET + 1]
for b in range(MIN_B, MAX_B + 1):
    edge = (1 << b) * TARGET
    ns += [edge - 1, edge, edge + 1]
ns += [2**62, 2**63 - 1]

con = duckdb.connect()
bad = []
for n in ns:
    sql = (f"SELECT coalesce((SELECT min(b) FROM range({MIN_B}, {MAX_B + 1}) t(b) "
           f"WHERE (CAST(1 AS BIGINT) << b) * {TARGET} >= {n}), {MAX_B})")
    got = con.execute(sql).fetchone()[0]
    want = scala_lsh_bits(n)
    if got != want:
        bad.append((n, got, want))

if bad:
    for n, got, want in bad:
        print(f"MISMATCH n={n}: duckdb={got} scala={want}")
    raise SystemExit(1)
print(f"OK: {len(ns)} boundary counts agree (bits {MIN_B}..{MAX_B}, target {TARGET})")

#!/usr/bin/env python3
"""Gate replica for the ADAPTIVE-LSH BIT FLIP (dev-side, like compare.py).

Every shipped testdata scale factor yields lshBits = MinLshBits = 6, so
the driver's own gate never executes the `b < nb` plane-gating SQL (or
the Scala side) at any HIGHER bit count — the flip the r10 adaptive-bits
change exists for. This tool plants a synthetic embeddings table large
enough to force the flip and runs the REAL contract end to end: Verify
dumps ann_lsh_bucketed / knn_label / dedup_embedding over the planted
dir, then compare.py hash-checks them against their own DuckDB oracles
(which replay lshBitsSql over the same table, so both engines derive the
flipped bit count independently).

Usage: python3 tools/validate_lshflip.py [N ...]   (default: 4096 9000)
  N=4096 -> nb=7 for the ANN queries, exactly ON the 2^7*32 boundary,
            and nb=8 for dedup_embedding's doubled corpus;
  N=9000 -> nb=9 (a non-boundary interior value).

Synthetic vectors are seeded gaussians: pairwise cosines concentrate
near 0 at dim=64, so dedup_embedding's >=0.9 pairs are exactly its own
planted identical copies (recall for identical vectors is bit-count
invariant) and the exact-all-pairs oracle stays the right answer on
either side of the flip.

The default sweep also runs one SKEW case (n=2048 with vectors 0..599
all identical): dedup_embedding's doubled corpus puts 1200 identical
vectors in one level-1 bucket, past the 1024 maxBucketSize cap, so the
skewSafeBuckets banded-refinement path executes INSIDE the gate at a
flipped bit count — identical vectors collide in every band, so the
exact all-pairs oracle (719,400 within-group pairs) still holds.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"
QUERIES = ["ann_lsh_bucketed", "knn_label", "dedup_embedding"]
OTHERS = ("region nation customer supplier part orders lineitem "
          "events documents").split()

failed = False
cases = ([(int(a), 0) for a in sys.argv[1:]]
         or [(4096, 0), (9000, 0), (2048, 600)])
for n, skew in cases:
    d, out = f"/tmp/lshflip_{n}_{skew}", f"/tmp/lshflip_{n}_{skew}_out"
    for p in (d, out):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(d)
    for t in OTHERS:  # compare.py binds views for every table
        os.symlink(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    rng = np.random.default_rng(1234 + n)
    emb = rng.standard_normal((n, 64)).astype("float32")
    if skew:  # one identical group -> a dense bucket past the cap
        emb[:skew] = emb[0]
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype="int64")),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 7).astype("int32")),
    }), f"{d}/embeddings.parquet")
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(QUERIES), SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {d} {out}"],
        cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        sys.exit(f"Verify failed at n={n}")
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/compare.py", out, d] + QUERIES)
    print(f"-- n={n} skew={skew}: {'FAILED' if r.returncode else 'ok'}")
    failed = failed or bool(r.returncode)

sys.exit("FLIP GATE FAILED" if failed else print("FLIP GATE OK"))

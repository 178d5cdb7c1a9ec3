#!/usr/bin/env python3
"""Degenerate-fixture pre-flight: mutate a scratch copy of an sf dir
through the documented divergence classes, then run the REAL gate
(graft.Verify + tools/compare.py) over the mutated copy.

This institutionalizes the r13/r14 ad-hoc probes (BASELINE.md
"Degenerate-fixture probes"): the classes that historically forked the
cross-engine hash — or silently dropped queries from the gate (the r8
events.ts regeneration incident) — are planted on EVERY run, so a
fixture regeneration or a new rounding/NULL-handling divergence fails
one command instead of a round.

Planted classes (all deterministic — same input dir, same mutation):
  events.props   malformed / empty / fractional-$.k / bare-string /
                 NULL JSON (events_json_extract lockstep: DuckDB
                 json_extract_string hard-errors on malformed JSON)
  events.value   91 planted full-precision HALF-ENDING doubles (the
                 round/cast divergence class ExactNum closed) plus a
                 NULL sweep (~1/7 of rows; count(expr) twins must
                 ignore NULLs symmetrically)
  customer       two NULL-custkey rows (REPLACE displacement: NULL
                 unique keys never displace, executor/replace.go);
                 three acctbal rewrites whose cents land EXACTLY on
                 the MEDIUMINT declared boundaries (+-8388607/8)
                 through sql_dml_lifecycle's strict INSERT and
                 REPLACE entry points (r16 verdict item 5: the
                 strict-1264 check's pass side and the half-away-
                 from-zero double->int rounding under the
                 cross-engine gate — the rounding divergence this
                 plant class caught live on its first run)
  documents      one 20000-token doc whose mean_tok_len is EXACTLY
                 2.00005 (a 4-dp half — the ExactNum.round4 witness),
                 and a prefix-overlap doc pair whose 3-gram Jaccard is
                 EXACTLY 18001/20000 = 0.90005 (the same half class on
                 the similarity outputs, planted above the 0.9 banding
                 recall knee so MinHash/LSH candidate recall is
                 deterministic-certain)

Usage:
  python3 tools/degenerate.py [sf_dir] [work_dir] [query ...]
    sf_dir   source fixture dir   (default /root/testdata/sf0.001)
    work_dir scratch dir, WIPED   (default /tmp/degen_<sfname>)
    query... optional scope for Verify+compare (default: full suite)

  python3 tools/degenerate.py --ceiling [sf_dir] [work_dir]
    The units4 magnitude-ceiling witness (r15 verdict item 4), an
    EXPECTED-FAILURE run kept behind a flag so the default pre-flight
    stays green: plants one events.value row at 1e15 (> the ~9.2e14
    ceiling where |x*10000| exceeds 2^63) and demonstrates the
    ExactNum.scala scaladoc claim — BOTH engines abort LOUDLY on the
    exact-sum queries (Spark's ANSI long cast, DuckDB's BIGINT cast)
    rather than forking a hash. Also plants one customer row whose
    cents exceed the MEDIUMINT declared max: the strict-1264 raise
    side of the boundary class above, Spark-only by design (the
    declared range is MySQL metadata the oracle never declares — the
    oracle running clean is itself asserted). Exits 0 iff both engines
    aborted on both events queries AND Spark alone raised 1264 on
    sql_dml_lifecycle.

Driver-side python only (pyarrow/pandas/duckdb) — never part of the
engine.
"""
import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def rewrite(path, fn):
    """Read a parquet table, mutate via pandas, write back under the
    ORIGINAL arrow schema (a silently widened/retyped column — the r8
    events.ts incident — is exactly what this tool exists to catch, so
    it must never introduce one itself)."""
    orig = pq.read_table(path)
    df = fn(orig.to_pandas())
    pq.write_table(pa.Table.from_pandas(df, schema=orig.schema,
                                        preserve_index=False), path)


def mutate_events(df):
    n = len(df)
    assert n >= 20, "events fixture too small for the planted classes"
    # --- props: the five JSON degeneracy shapes, on fixed positions ---
    props = df["props"].copy()
    shapes = ['{oops', '', '{"k": 2.5}', '"str"', None,
              '[]', '{"k": null}', '{"k": "x"}']
    for i, v in enumerate(shapes):
        props.iloc[i * 2] = v
    df["props"] = props
    # --- value: 91 half-ending doubles + a NULL sweep ---
    value = df["value"].astype("float64").copy()
    planted_at = []
    for i in range(n):
        if len(planted_at) >= 91:
            break
        v = value.iloc[i]
        if pd.notna(v):
            # nearest double to the exact 4-dp half just above |v|:
            # (2k+1)/20000 — the class the old round/cast forked on
            k = int(abs(v) * 10000)
            value.iloc[i] = (2 * k + 1) / 20000.0 * (1 if v >= 0 else -1)
            planted_at.append(i)
    assert len(planted_at) == 91, \
        f"only {len(planted_at)} half-ending values planted"
    nulled = 0
    planted_set = set(planted_at)
    for i in range(n):
        # deterministic ~1/7 sweep, skipping the ACTUAL plant positions
        # (plants land on the first 91 NON-NULL rows, which need not be
        # indices 0..90 if the source fixture carries early NULLs)
        if i not in planted_set and i % 7 == 3:
            value.iloc[i] = float("nan")
            nulled += 1
    df["value"] = value
    print(f"[degenerate] events: {len(shapes)} props shapes, "
          f"{len(planted_at)} half-ending values, {nulled} NULL values")
    return df


def lifecycle_rows(df, lo, hi, n):
    """Customer rows that reach sql_dml_lifecycle's write path (custkey
    in [lo, hi] — [51, 200] lands in the INSERT entry point only,
    [1, 50] in the REPLACE displacement) and survive its DELETE
    (custkey % 10 != 0). The ONE definition shared by the pass-side
    boundary plants and the --ceiling raise witness, so a change to
    the lifecycle's WHERE bounds or DELETE modulus cannot leave one
    copy planting rows the query never sees."""
    return df.index[(df["c_custkey"] >= lo) & (df["c_custkey"] <= hi)
                    & (df["c_custkey"] % 10 != 0)][:n]


def mutate_customer(df):
    # --- declared-range boundary plants (r16 verdict item 5) ---
    # sql_dml_lifecycle stores c_acctbal*100 into a MEDIUMINT cents
    # column under STRICT sql_mode, so the strict-1264 check's PASS
    # side and the round-half-away-from-zero double->int coercion run
    # under the cross-engine hash gate. Three rows are rewritten so
    # the coerced cents land EXACTLY on the declared boundaries:
    #   max  8388607 via the INSERT entry point  (custkey 51..200)
    #   min -8388608 via the INSERT entry point  (custkey 51..200)
    #   max  8388607 via the REPLACE entry point (custkey <= 50 gets
    #                 +1000 before the cents conversion)
    # custkey % 10 != 0 keeps them alive past the lifecycle's DELETE.
    # (The RAISE side cannot be green by definition; --ceiling plants
    # it as an expected failure, and CoercionPropertySpec property-
    # tests it in-process.)
    bal = df["c_acctbal"].astype("float64").copy()
    ins = lifecycle_rows(df, 51, 200, 2)
    rep = lifecycle_rows(df, 1, 50, 1)
    assert len(ins) == 2 and len(rep) == 1, \
        "customer fixture too small for the boundary plants"
    bal.loc[ins[0]] = 83886.07    # *100 -> rounds to  8388607
    bal.loc[ins[1]] = -83886.08   # *100 -> rounds to -8388608
    bal.loc[rep[0]] = 82886.07    # (+1000)*100 -> rounds to 8388607
    df["c_acctbal"] = bal
    # --- NULL unique keys (REPLACE displacement) ---
    # the key column must be NULLABLE pandas-side before the concat, or
    # pandas silently promotes the mix to object/float
    df = df.assign(c_custkey=df["c_custkey"].astype("Int64"))
    two = df.iloc[:2].copy()
    two["c_custkey"] = pd.array([pd.NA, pd.NA], dtype="Int64")
    two["c_name"] = ["null-key-a", "null-key-b"]
    out = pd.concat([df, two], ignore_index=True)
    print("[degenerate] customer: +2 NULL-custkey rows, 3 MEDIUMINT-"
          "boundary cents plants (custkeys "
          f"{int(df['c_custkey'].loc[ins[0]])}/"
          f"{int(df['c_custkey'].loc[ins[1]])} insert, "
          f"{int(df['c_custkey'].loc[rep[0]])} replace)")
    return out


def mutate_documents(df):
    next_id = int(df["doc_id"].max()) + 1
    lang = df["lang"].iloc[0]
    source = df["source"].iloc[0]

    # mean_tok_len == 40001/20000 == 2.00005 exactly: 19999 two-char
    # tokens + one three-char token (lowercase — Dedup.corpus lowers)
    mean_doc = " ".join(["aa"] * 19999 + ["aaa"])
    # jaccard == 18001/20000 == 0.90005 exactly: doc A has 18502
    # distinct tokens (18500 shingles); doc B = A's first 18003 tokens
    # (18001 shared shingles) + 1500 fresh tokens (1502 fresh
    # shingles): union = 18500 + 19501 - 18001 = 20000
    a_toks = [f"q{i}x" for i in range(18502)]
    j_toks = [f"j{i}x" for i in range(1500)]
    doc_a = " ".join(a_toks)
    doc_b = " ".join(a_toks[:18003] + j_toks)

    rows = pd.DataFrame({
        "doc_id": [next_id, next_id + 1, next_id + 2],
        "text": [mean_doc, doc_a, doc_b],
        "lang": [lang] * 3,
        "source": [source] * 3,
        "n_chars": [len(mean_doc), len(doc_a), len(doc_b)],
    })
    out = pd.concat([df, rows], ignore_index=True)
    print(f"[degenerate] documents: +1 half-ending mean_tok_len doc, "
          f"+2 jaccard=0.90005 pair docs (ids {next_id}..{next_id + 2})")
    return out


CEILING_QUERIES = ["events_rollup", "events_window_agg"]
# the strict-1264 raise witness (r16 verdict item 5, the side the
# default pre-flight cannot gate green): one customer row whose cents
# exceed the MEDIUMINT declared max must abort sql_dml_lifecycle's
# strict INSERT Spark-side. SPARK-ONLY by design: the declared range
# is MySQL table metadata the DuckDB oracle never declares (its SELECT
# computes the same cents into a plain INTEGER), so the oracle running
# CLEAN on the same fixture is the expected shape, asserted below.
RANGE_QUERY = "sql_dml_lifecycle"


def run_ceiling_witness(work, repo):
    """Expected-failure run: one |value| > 9.2e14 row must abort BOTH
    engines loudly on the units4 exact-sum queries (the ExactNum
    lockstep-ceiling claim), never fork a hash; one out-of-declared-
    range customer row must raise 1264 on the strict DML path."""
    def plant(df):
        v = df["value"].astype("float64").copy()
        assert pd.notna(v.iloc[0]) and pd.notna(df["ts"].iloc[0]), \
            "row 0 must survive the queries' NULL filters"
        v.iloc[0] = 1.0e15  # |x*10000| = 1e19 > 2^63 ~ 9.22e18
        df["value"] = v
        print("[degenerate] events: planted value=1e15 at row 0 "
              "(above the ~9.2e14 units4 ceiling)")
        return df
    rewrite(f"{work}/events.parquet", plant)

    def plant_range(df):
        bal = df["c_acctbal"].astype("float64").copy()
        at = lifecycle_rows(df, 51, 200, 1)
        assert len(at) == 1, "no customer row reaches the lifecycle insert"
        bal.loc[at[0]] = 90000.0  # cents 9000000 > MEDIUMINT max 8388607
        df["c_acctbal"] = bal
        print(f"[degenerate] customer: planted acctbal=90000 at custkey "
              f"{int(df['c_custkey'].loc[at[0]])} (cents above the "
              "MEDIUMINT declared max)")
        return df
    rewrite(f"{work}/customer.parquet", plant_range)

    out = f"{work}_out"
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"))
    cmd = ["sbt", "-batch", "runMain graft.Verify " +
           " ".join([work, out] + CEILING_QUERIES + [RANGE_QUERY])]
    print(f"[degenerate] {' '.join(cmd)}  (EXPECTING per-query failures)")
    r = subprocess.run(cmd, cwd=repo, env=env,
                       stderr=subprocess.PIPE, text=True)
    sys.stderr.write(r.stderr)
    # Verify exits 0 even when individual queries fail (per-query
    # failures are `[verify] ... failed:` stderr lines) — a NONZERO exit
    # means sbt never launched or the build broke, which must read as
    # its own diagnostic, not a FileNotFoundError on the oracle dump
    # below (ADVICE r16)
    if r.returncode != 0:
        sys.exit(f"[degenerate] Verify did not run (sbt exit "
                 f"{r.returncode}) — the witness proves nothing")
    if not os.path.exists(f"{out}/oracle_sql.json"):
        sys.exit(f"[degenerate] Verify left no {out}/oracle_sql.json — "
                 "the run aborted before the oracle dump; witness void")
    bad = []
    for q in CEILING_QUERIES:
        if f"[verify] {q} failed:" not in r.stderr:
            bad.append(f"Spark did NOT abort on {q}")
        if os.path.exists(f"{out}/{q}"):
            bad.append(f"Spark left output for {q} despite the plant")
    if "overflow" not in r.stderr.lower():
        bad.append("Spark failures do not mention an overflow/cast abort")

    # the strict-1264 witness: the lifecycle's strict INSERT must have
    # raised the declared-range error, leaving no output
    if f"[verify] {RANGE_QUERY} failed:" not in r.stderr:
        bad.append(f"Spark did NOT abort on {RANGE_QUERY}")
    if "out of range" not in r.stderr.lower() or "1264" not in r.stderr:
        bad.append(f"{RANGE_QUERY} abort is not the 1264 declared-range "
                   "raise")
    if os.path.exists(f"{out}/{RANGE_QUERY}"):
        bad.append(f"Spark left output for {RANGE_QUERY} despite the plant")

    # the DuckDB twin: the SAME oracle SQL must abort too (oracle_sql
    # .json is written after the per-query loop, failures notwithstanding)
    import duckdb
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{work}/{t}.parquet')")
    for q in CEILING_QUERIES:
        try:
            con.execute(oracles[q]).fetchall()
            bad.append(f"DuckDB did NOT abort on {q}")
        except Exception as e:
            msg = str(e)
            print(f"[degenerate] duckdb {q} aborted as expected: "
                  f"{msg.splitlines()[0]}")
            if not any(w in msg.lower()
                       for w in ("conversion", "range", "cast")):
                bad.append(f"DuckDB abort on {q} is not a cast/range "
                           f"error: {msg.splitlines()[0]}")
    # the 1264 class has NO DuckDB twin abort (see RANGE_QUERY note):
    # the oracle must run CLEAN on the planted fixture — if it ever
    # starts aborting, the witness's asymmetry claim is stale
    rows = None
    try:
        rows = con.execute(oracles[RANGE_QUERY]).fetchall()
    except Exception as e:
        bad.append(f"DuckDB unexpectedly aborted on {RANGE_QUERY}: "
                   f"{str(e).splitlines()[0]}")
    # checked OUTSIDE the try: an empty result is a fixture problem
    # (no row survived the lifecycle filters), not an engine abort —
    # folding it into the except above would misdiagnose it as one
    if rows is not None:
        if rows:
            print(f"[degenerate] duckdb {RANGE_QUERY} ran clean as "
                  "expected (declared range is MySQL metadata the "
                  "oracle never sees)")
        else:
            bad.append(f"{RANGE_QUERY} oracle returned no rows — the "
                       "planted fixture never reached the lifecycle "
                       "SELECT; fixture regression, not an abort")
    if bad:
        sys.exit("[degenerate] CEILING WITNESS FAILED:\n  " +
                 "\n  ".join(bad))
    print("[degenerate] ceiling witness OK: both engines aborted loudly "
          f"on {CEILING_QUERIES}, Spark alone raised 1264 on "
          f"{RANGE_QUERY} — no hash fork possible above the units4 "
          "ceiling or outside a declared range")


def main():
    args = [a for a in sys.argv[1:] if a != "--ceiling"]
    ceiling = len(args) != len(sys.argv) - 1
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    work = (args[1] if len(args) > 1
            else f"/tmp/degen_{os.path.basename(os.path.normpath(sf))}" +
                 ("_ceil" if ceiling else ""))
    queries = args[2:]
    if ceiling and queries:
        sys.exit("--ceiling runs its own fixed query scope")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(f"{sf}/lineitem.parquet"):
        sys.exit(f"sf dir not found (no lineitem.parquet): {sf}")
    # the work dir AND the derived output dir are WIPED below — both
    # must be disjoint from the source tree (equal, ancestor, or
    # descendant would delete real fixtures; `<work>_out` can collide
    # with a source dir on its own, e.g. reusing a prior run's output
    # as the new source)
    sfr = os.path.realpath(sf)
    for label, d in (("work", work), ("output", work + "_out")):
        dr = os.path.realpath(d)
        if (dr == sfr or sfr.startswith(dr + os.sep)
                or dr.startswith(sfr + os.sep)):
            sys.exit(f"{label} dir {dr} overlaps the source dir {sfr}")

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for t in TABLES:
        shutil.copy(f"{sf}/{t}.parquet", f"{work}/{t}.parquet")
    print(f"[degenerate] copied {sf} -> {work}")

    if ceiling:
        run_ceiling_witness(work, repo)
        return

    rewrite(f"{work}/events.parquet", mutate_events)
    rewrite(f"{work}/customer.parquet", mutate_customer)
    rewrite(f"{work}/documents.parquet", mutate_documents)

    out = f"{work}_out"
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"))
    cmd = ["sbt", "-batch",
           "runMain graft.Verify " + " ".join([work, out] + queries)]
    print(f"[degenerate] {' '.join(cmd)}")
    r = subprocess.run(cmd, cwd=repo, env=env)
    if r.returncode != 0:
        sys.exit(f"[degenerate] Verify failed (exit {r.returncode})")

    cmd = [sys.executable, f"{repo}/tools/compare.py", out, work] + queries
    print(f"[degenerate] {' '.join(cmd)}")
    sys.exit(subprocess.run(cmd).returncode)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Transcribe a committed BENCH_LOCAL_r*.json into the BenchRef.scala
`committed` map body, so re-recording the comparator is mechanical.

The map has always been hand-transcribed; BenchFormatSpec pins file<->map
value-for-value, so a typo cannot ship — but it still costs a failed test
cycle to find. This emits the exact Scala lines (artifact-literal values,
alpha order, the same order Bench renders) plus the `source`/`sourceFile`
lines to update alongside, per BenchRef's own scaladoc contract.

Usage:
    python3 tools/gen_benchref.py BENCH_LOCAL_r17.json [cpus]
    python3 tools/gen_benchref.py --median OUT.json RUN1.json RUN2.json RUN3.json

Prints to stdout; paste over the `val committed` body (and the FOUR
provenance vals: source, sourceFile, sfDirSuffix, cpus) in
src/main/scala/graft/BenchRef.scala, then run
`sbt testOnly graft.BenchFormatSpec` — the pin test is the receipt.

The cpus regime comes from the record's own "cpus" field (written by
Bench since r17); for an older record that lacks it, pass the core
count the run used as the second argument. It matters: BenchRef.cpus
gates refArmed, so a wrong value silently disarms (or mis-arms) the
outlier trigger for every future run.

--median (r17 verdict item 5 + ADVICE): single-window recording puts
fast sub-2 s queries at whichever edge of their band that ONE window
hit (the r15 fast-edge / r17 top-of-band recalibration churn, both
directions). This mode merges THREE healthy-window first-read records
into one per-query-median artifact written to OUT.json — a synthetic
record with a `median_of` provenance field listing its sources, which
becomes BenchRef.sourceFile so the BenchFormatSpec value pin holds
against it — then prints the transcription from the merged artifact.
All three records must be distinct files (and distinct from OUT) that
agree on the key set, sf, and cpus, and carry fails:0 + armed:true;
each query's median is the middle LITERAL of the three %.3f values
(no re-formatting). The per-query gc_ms/io_mb/alloc_mb volume maps are
medianed into the merged artifact too — it becomes the committed
comparator source, so it must keep the baselines the five-axis
hit-adjudication rule reads.

Driver-side python only — never part of the engine.
"""
import hashlib
import json
import os
import re
import sys


def parse_record(path):
    """One Bench file record -> (pairs, sfname, sf_raw, cpus_or_None).

    pairs keep the artifact's literal value text (fmt renders %.3f —
    "5.630" stays "5.630"): re-formatting through float would drop the
    style the existing map uses and invite diff noise.
    """
    src = open(path, encoding="utf-8").read()
    m = re.search(r'"queries":\{([^}]*)\}', src)
    if not m:
        sys.exit(f"{path}: no queries map found")
    pairs = []
    for kv in m.group(1).split(","):
        k, v = kv.split(":")
        k = k.strip().strip('"')
        v = v.strip()
        float(v)  # fail loudly on a malformed artifact, never emit junk
        pairs.append((k, v))
    if len(pairs) < 100:
        sys.exit(f"{path}: only {len(pairs)} queries — not a full-suite "
                 "record; refusing to emit a partial comparator")
    if [k for k, _ in pairs] != sorted(k for k, _ in pairs):
        sys.exit(f"{path}: queries not in alpha order — not a Bench-"
                 "rendered record")
    sf = re.search(r'"sf":"([^"]*)"', src)
    sfname = os.path.basename(sf.group(1)) if sf else "sf0.1"
    cm = re.search(r'"cpus":"(\d+)"', src)
    fm = re.search(r'"fails":(\d+)', src)
    if fm and fm.group(1) != "0":
        sys.exit(f"{path}: fails={fm.group(1)} — a record with mid-run "
                 "query failures cannot nominate comparator levels")
    return pairs, sfname, (sf.group(1) if sf else ""), \
        (cm.group(1) if cm else None)


def parse_volume_map(path, src, name, keys, required=True):
    """One per-query volume map ("gc_ms"/"io_mb"/"alloc_mb"/"tasks"/
    "in_rows") -> dict, or None when an OPTIONAL map is absent (the
    tasks/in_rows axes landed in r19; pre-r19 records lack them).

    The maps carry the committed levels the five/seven-axis adjudication
    rule compares against (BASELINE.md backstop (b)); a merged comparator
    artifact that dropped them would silently regress the volume-axis
    baseline to hunting through superseded run files.
    """
    m = re.search(r'"%s":\{([^}]*)\}' % name, src)
    if not m:
        if required:
            sys.exit(f"{path}: no {name} map — not a full five-axis "
                     "record; a comparator source must carry the volume "
                     "baselines")
        return None
    # an empty map body is a missing axis, not a parse crash (ADVICE
    # r18: '' .split(':') raised a bare ValueError here) — Bench
    # legitimately renders {} for an empty suite, but such a record can
    # never nominate comparator levels. For an OPTIONAL axis (ADVICE
    # r19) an empty body means the axis is absent, same as no map at
    # all — hard-exiting with the required-axis message would abort the
    # merge of a legitimate pre-r19-style record with a misleading
    # error; the all-or-none check upstream reports the real condition.
    if not m.group(1).strip():
        if required:
            sys.exit(f"{path}: empty {name} map — not a full-suite "
                     "five-axis record")
        return None
    out = {}
    for kv in m.group(1).split(","):
        k, v = kv.split(":")
        out[k.strip().strip('"')] = int(v)
    if set(out) != set(keys):
        sys.exit(f"{path}: {name} keys do not match the queries map")
    return out


def merge_median(out_path, run_paths):
    """Write the per-query-median merged artifact and return its path."""
    real = [os.path.realpath(p) for p in run_paths]
    if len(set(real)) != len(real):
        sys.exit("--median run paths must be three DISTINCT records — "
                 "a repeated file degenerates the median to a single "
                 "window, the exact failure mode this flag exists to "
                 "prevent")
    if os.path.realpath(out_path) in real:
        sys.exit("--median OUT must not be one of the input records — "
                 "refusing to overwrite a committed run file")
    # content identity too (ADVICE r18): a byte-identical COPY under a
    # different name passes the realpath guard and still degenerates
    # the median to a single window
    bodies = [open(p, "rb").read() for p in run_paths]
    if len({hashlib.sha256(b).hexdigest() for b in bodies}) != len(bodies):
        sys.exit("--median run records must be three DISTINCT windows — "
                 "two inputs are byte-identical copies of one run")
    # provenance (ADVICE r18): a previously MERGED artifact carries
    # fails:0/armed:true/cpus and all volume maps, so it passes every
    # input check — but median-of-medians silently compounds and
    # dilutes the three-certified-first-read-windows contract
    for p, b in zip(run_paths, bodies):
        if b'"median_of"' in b:
            sys.exit(f"{p}: carries a median_of field — inputs must be "
                     "raw Bench run records, never a merged artifact")
    # one decode reused below — parse_record opens the file itself, but
    # the volume-map and armed checks all read from these strings
    srcs = [b.decode("utf-8") for b in bodies]
    runs = [parse_record(p) for p in run_paths]
    keysets = [tuple(k for k, _ in pairs) for pairs, _, _, _ in runs]
    if len(set(keysets)) != 1:
        sys.exit("the three records do not cover the same query set — "
                 "not same-suite runs")
    sfnames = {sfname for _, sfname, _, _ in runs}
    cpuses = {cpus for _, _, _, cpus in runs}
    if len(sfnames) != 1 or len(cpuses) != 1 or None in cpuses:
        sys.exit(f"regime disagreement across records (sf={sfnames}, "
                 f"cpus={cpuses}) — refusing to merge across regimes; "
                 "--median requires the self-describing cpus field")
    for p, s in zip(run_paths, srcs):
        if '"armed":true' not in s:
            sys.exit(f"{p}: armed is not true — an unarmed run never "
                     "compared against the committed trigger and cannot "
                     "nominate comparator levels")
        # within-record consistency (own-diff review, r19): Bench has
        # never emitted one deterministic-volume map without the other,
        # so a record carrying tasks XOR in_rows is corrupt/hand-edited
        # — and the per-axis all-or-none check below would merge it
        # into a half-axis comparator no real run produces
        if ('"tasks":{' in s) != ('"in_rows":{' in s):
            sys.exit(f"{p}: carries one of tasks/in_rows without the "
                     "other — not a Bench-rendered record")
        # same pairing rule for the r20 memory-pressure axes
        if ('"spill_mb":{' in s) != ('"peak_mb":{' in s):
            sys.exit(f"{p}: carries one of spill_mb/peak_mb without "
                     "the other — not a Bench-rendered record")
        # unquiesced-window taint (own-diff review, r20): a record
        # whose vol_dirty list is non-empty declared some of its own
        # tasks/in_rows approximate — mediansing straggler-shifted
        # counts into the committed volume baselines corrupts exactly
        # the "identical counts = same work" adjudication backstop the
        # merge exists to feed. A record with NO vol_dirty field is a
        # pre-r20 format and carries no such self-declaration (the
        # volume-axis all-or-none check below governs it).
        m = re.search(r'"vol_dirty":\[([^\]]*)\]', s)
        if m and m.group(1).strip():
            sys.exit(f"{p}: vol_dirty is non-empty ([{m.group(1)}]) — "
                     "its volume readings are self-declared approximate "
                     "and cannot nominate committed baselines; re-record "
                     "from a fully-quiesced window")
    merged = []
    for i, k in enumerate(keysets[0]):
        vals = sorted((pairs[i][1] for pairs, _, _, _ in runs), key=float)
        merged.append((k, vals[1]))  # middle literal of three
    total = sum(float(v) for _, v in merged)
    qbody = ",".join(f'"{k}":{v}' for k, v in merged)
    # per-query median of each volume axis too: the merged artifact is
    # the committed comparator SOURCE, so it must keep the gc/io/alloc
    # baselines the hit-adjudication rule reads (sched/sched_mid/
    # sched_hit are window-specific probe state — a median of probes
    # is not a measurement, so those are deliberately omitted)
    keys = [k for k, _ in merged]
    vol_bodies = {}
    for name in ("gc_ms", "io_mb", "alloc_mb"):
        maps = [parse_volume_map(p, s, name, keys)
                for p, s in zip(run_paths, srcs)]
        vol_bodies[name] = ",".join(
            f'"{k}":{sorted(m[k] for m in maps)[1]}' for k in keys)
    # the deterministic volume axes (r19) and the memory-pressure axes
    # (r20): required of every record from their landing round on, but
    # three older records may legitimately all lack them — all-or-none,
    # never a mixed merge whose median silently drops to two windows on
    # one axis
    for name in ("tasks", "in_rows", "spill_mb", "peak_mb"):
        maps = [parse_volume_map(p, s, name, keys, required=False)
                for p, s in zip(run_paths, srcs)]
        have = [m for m in maps if m is not None]
        if have and len(have) != len(maps):
            sys.exit(f"some but not all records carry a {name} map — "
                     "refusing a mixed-format merge")
        if have:
            vol_bodies[name] = ",".join(
                f'"{k}":{sorted(m[k] for m in have)[1]}' for k in keys)
    sources = json.dumps([os.path.basename(p) for p in run_paths])
    sf_raw = runs[0][2]
    # same field shapes Bench renders (cpus before queries, volume maps
    # after it, sf last) so the BenchFormatSpec pin parser and the
    # adjudication tooling read the merged artifact unchanged
    vols = "".join(f',"{name}":{{{vol_bodies[name]}}}'
                   for name in ("gc_ms", "io_mb", "alloc_mb",
                                "tasks", "in_rows", "spill_mb",
                                "peak_mb")
                   if name in vol_bodies)
    line = (f'{{"metric":"total","value":{total:.3f},"unit":"sec",'
            f'"fails":0,"armed":true,"median_of":{sources},'
            f'"cpus":"{runs[0][3]}","queries":{{{qbody}}}'
            f'{vols},'
            f'"sf":"{sf_raw}"}}')
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(line + "\n")
    print(f"# wrote {out_path} (median of {len(run_paths)} records, "
          f"total {total:.3f}s)", file=sys.stderr)
    return out_path


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--median":
        if len(sys.argv) != 6:
            sys.exit("--median needs exactly: OUT.json RUN1 RUN2 RUN3")
        path = merge_median(sys.argv[2], sys.argv[3:6])
        sys.argv = [sys.argv[0], path]  # fall through to transcription
    if len(sys.argv) not in (2, 3):
        sys.exit(__doc__)
    path = sys.argv[1]
    # provenance lines: sf/cpus are what refArmed matches — sf from the
    # record; cpus from the record's own field (Bench writes it since
    # r17) or, for older records, the explicit second argument. Never
    # guessed: a wrong cpus silently disarms the outlier trigger.
    pairs, sfname, _, rec_cpus = parse_record(path)
    if rec_cpus is not None:
        cpus = rec_cpus
        if len(sys.argv) == 3 and sys.argv[2] != cpus:
            sys.exit(f"{path}: record says cpus={cpus} but the argument "
                     f"says {sys.argv[2]} — refusing to emit a comparator "
                     "whose regime is in dispute")
    elif len(sys.argv) == 3:
        # a malformed argument must not fall through to the "no cpus
        # field" message and send the operator hunting in the record
        # instead of their own command line
        if not sys.argv[2].isdigit():
            sys.exit(f"cpus argument must be a number, got "
                     f"'{sys.argv[2]}'")
        cpus = sys.argv[2]
    else:
        sys.exit(f"{path}: no \"cpus\" field in the record (pre-r17 "
                 "format) — pass the run's core count as the second "
                 "argument; refArmed matches it exactly")
    base = os.path.basename(path)
    print(f'  val source = "{base} ({sfname}, cpus={cpus})"')
    print()
    print(f'  val sourceFile = "{base}"')
    print()
    print(f'  val sfDirSuffix = "{sfname}"')
    print(f'  val cpus = "{cpus}"')
    print()
    print("  val committed: Map[String, Double] = Map(")
    body = ",\n".join(f'    "{k}" -> {v}' for k, v in pairs)
    print(body + ")")


if __name__ == "__main__":
    main()

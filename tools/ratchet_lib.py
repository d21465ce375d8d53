"""Shared band-ratchet engine (VERDICT r16 #8): one manifest format
(`query<TAB>value`), one band rule (new must lie within
[old/TOL - SLACK, old*TOL + SLACK]), one NEW/ABSENT discipline (both are
explicit failures that must be banked with --regen in the same diff —
never inferred from a band that happens to contain 0).
tools/shuffle_ratchet.py and tools/time_ratchet.py are thin adapters
that extract the fresh per-query values from their capture format and
phrase the units/hints; a third ratchet starts here, not from a copy.
"""
import os


def load_manifest(path, parse):
    """Read a `query<TAB>value` manifest; exit loudly on malformed lines."""
    old = {}
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            try:
                if len(parts) != 2:
                    raise ValueError(line)
                old[parts[0]] = parse(parts[1])
            except ValueError:
                print(f"FAIL: malformed manifest line {lineno} in {path}: "
                      f"{line!r} (expected 'query<TAB>value')")
                raise SystemExit(2)
    return old


def regen_manifest(path, fresh, fmt):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for q in sorted(fresh):
            f.write(f"{q}\t{fmt(fresh[q])}\n")
    print(f"manifest regenerated: {len(fresh)} entries -> {path}")


def band_failures(old, fresh, tol, slack, describe,
                  up_word="GREW", down_word="SHRANK",
                  absent_hint="retired query; bank it (--regen) in the "
                              "same diff"):
    """Every deviation is a message: NEW (not in manifest), ABSENT (in
    manifest, not in capture), or out of band. Returns the list."""
    failures = []
    for q in sorted(set(old) | set(fresh)):
        if q not in old:
            failures.append(f"{q}: NEW query at {describe(fresh[q])} — "
                            "bank it (--regen) in the same diff")
            continue
        if q not in fresh:
            failures.append(f"{q}: in manifest (was {describe(old[q])}) "
                            f"but ABSENT from the capture — {absent_hint}")
            continue
        lo = old[q] / tol - slack
        hi = old[q] * tol + slack
        if not (lo <= fresh[q] <= hi):
            word = up_word if fresh[q] > hi else down_word
            failures.append(
                f"{q}: {word} {describe(old[q])} -> {describe(fresh[q])} "
                f"(band [{describe(max(lo, 0))}, {describe(hi)}]) — "
                "fix, attribute, or bank (--regen)")
    return failures


def report(failures, n_fresh, what, band_desc):
    if failures:
        print(f"{len(failures)} {what} failure(s):")
        for msg in failures:
            print("  " + msg)
        raise SystemExit(1)
    print(f"{what} holds: {n_fresh} queries within {band_desc} of the "
          "committed manifest")

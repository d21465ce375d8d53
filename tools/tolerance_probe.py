#!/usr/bin/env python3
"""Cross-engine half of the ulp-boundary tolerance gate (VERDICT r13 #7).

PropertySpec's "ulp-boundary quantization golden" test pins the ENGINE's
decimal-grid quantization of a boundary-hunting value set into
src/test/resources/ulp_quant_golden.tsv (probes keyed by exact IEEE-754
bits). This tool replays the SAME doubles — reconstructed from the bits
column, so bit-identity is by construction, not by re-deriving the
arithmetic — through DuckDB's CAST(x AS DECIMAL(38,9)) and round(x, 6),
and measures the divergence in units of the last published digit.

The accepted tolerance class (BASELINE.md round-11 audit) is AT MOST one
last-digit unit, only at half-grid boundaries; this gate turns that
prose into a per-round measurement:

    python3 tools/tolerance_probe.py

exit 0 = max divergence <= 1 unit; prints the measured histogram.
"""
import struct
import sys
from decimal import Decimal

import duckdb

GOLDEN = "src/test/resources/ulp_quant_golden.tsv"


def main():
    rows = []
    with open(GOLDEN) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            name, bits, dec9, round6 = line.rstrip("\n").split("\t")
            x = struct.unpack(">d", bytes.fromhex(bits))[0]
            rows.append((name, x, dec9, round6))
    if not rows:
        print("tolerance_probe: empty golden")
        sys.exit(2)
    con = duckdb.connect()
    hist = {}
    worst = []
    for name, x, dec9, round6 in rows:
        d_dec9, d_round6 = con.execute(
            "SELECT CAST(CAST(? AS DOUBLE) AS DECIMAL(38,9))::VARCHAR, "
            "round(CAST(? AS DOUBLE), 6)::VARCHAR", [x, x]).fetchone()
        # divergence in last-digit units on each grid
        for grid, spark_s, duck_s, q in (
                ("dec9", dec9, d_dec9, Decimal("1e-9")),
                ("round6", round6, d_round6, Decimal("1e-6"))):
            diff = abs((Decimal(spark_s) - Decimal(duck_s)) / q)
            units = int(diff)
            assert diff == units, f"{name}/{grid}: non-grid diff {diff}"
            hist[units] = hist.get(units, 0) + 1
            if units > 0:
                worst.append((units, name, grid, spark_s, duck_s))
    total = sum(hist.values())
    print(f"probes: {len(rows)} values x 2 grids = {total} comparisons")
    for u in sorted(hist):
        print(f"  divergence {u} last-digit unit(s): {hist[u]}")
    worst.sort(reverse=True)
    for u, name, grid, s, d in worst[:10]:
        print(f"  {name} [{grid}]: spark={s} duckdb={d} ({u} unit)")
    mx = max(hist)
    if mx > 1:
        print(f"FAIL max divergence {mx} > 1 last-digit unit — the "
              "accepted tolerance class is violated")
        sys.exit(1)
    print(f"max divergence {mx} <= 1 last-digit unit — tolerance holds")


if __name__ == "__main__":
    main()

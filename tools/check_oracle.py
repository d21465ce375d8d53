#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB over the same sf directory and reports per-query match. Not part of
the shipped engine (the engine is Scala/Spark); this mirrors the driver's
DuckDB oracle so oracle SQL bugs surface before the round gate runs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    return df


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            got = canon(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            failures.append((name, f"spark output missing: {e}"))
            continue
        if list(want.columns) != list(got.columns):
            failures.append(
                (name, f"columns differ: oracle={list(want.columns)} "
                       f"spark={list(got.columns)}"))
            continue
        # Dtype-strict, mirroring the driver's typed hash: int64 vs float64
        # with equal values (e.g. DuckDB HUGEINT -> float64) must FAIL here
        # too, or this mimic passes what the driver rejects.
        dtype_diff = [
            (c, str(want[c].dtype), str(got[c].dtype))
            for c in want.columns if str(want[c].dtype) != str(got[c].dtype)
        ]
        if dtype_diff:
            failures.append(
                (name, "dtypes differ (oracle vs spark): " + ", ".join(
                    f"{c}: {w} vs {g}" for c, w, g in dtype_diff)))
            continue
        if len(want) != len(got):
            failures.append((name, f"rows differ: oracle={len(want)} "
                                   f"spark={len(got)}"))
            continue
        diff = None
        for col_name in want.columns:
            wv, gv = list(want[col_name]), list(got[col_name])
            for i, (w, g) in enumerate(zip(wv, gv)):
                try:
                    nw = w.item() if hasattr(w, "item") else w
                    ng = g.item() if hasattr(g, "item") else g
                except Exception:
                    nw, ng = w, g
                if not values_equal(nw, ng) and str(nw) != str(ng):
                    diff = f"row {i} col {col_name}: oracle={w!r} spark={g!r}"
                    break
            if diff:
                break
        if diff:
            failures.append((name, diff))
        else:
            print(f"PASS {name} ({len(want)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

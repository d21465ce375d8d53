#!/usr/bin/env python3
"""Build the 8x-replicated scale-smoke corpus under /tmp/scale8.

Dev-side tool (python + duckdb, like check_oracle.py) — reproduces the
inputs behind BASELINE.md's "Scale-smoke: 8x corpus replication" section.
Documents get distinct contents (a per-replica tag) so the smoke measures
pure scaling on a HIGH-OVERLAP corpus (every original doc gains 7
near-copies sharing most shingles); embeddings get a small per-replica
perturbation so vectors are distinct.

Usage:
    python3 tools/scale_smoke.py [sf_dir] [out_dir] [replicas]

Then time any query subset at 1x vs Nx with the Bench subset arg:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java ... graft.Bench "q1,q2"
    SPARK_GRAFT_SF_DIR=/tmp/scale8        java ... graft.Bench "q1,q2"

(Bench subset runs never overwrite bench_detail.json.)
"""
import shutil
import sys

import duckdb

if "--help" in sys.argv or "-h" in sys.argv:
    print(__doc__)
    sys.exit(0)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale8"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8
# --boiler: append a 30-word semi-boilerplate paragraph shared by the
# doc_id%50 group to every document — at 8x (40k docs) each boiler
# shingle has df ~= 800: UNDER the constant MaxShingleDf=1000 (so the
# fixed-cap audit pays C(800,2) pair events per junk shingle) but over
# any sane corpus-derived cap. The regime dd_jaccard_capped's budget
# rule exists for.
BOILER = "--boiler" in sys.argv[4:]

UNCHANGED = ["region", "nation"]
# customer replicates with the SAME user offset as events (below), so
# events→customer referential integrity survives replication — without
# it, 7/8 of replicated fact rows dangle and any events⋈customer smoke
# (j13) measures a mostly-discarded probe instead of a scaled join.
#
# Round 13 extends the same discipline to the relational family:
# orders/lineitem replicate by (orderkey, custkey) offset — the custkey
# offset MATCHES customer's replica offset, so orders→customer stays
# fully covered, and lineitem's l_orderkey matches its replica's orders.
# l_partkey/l_suppkey stay put (part replica 0 == the original rows, see
# below; supplier is unchanged), so lineitem→part/supplier also hold.
# part replicates with offset keys AND a per-replica p_type tag (replica
# 0 untagged == original) so distinct-(brand,type) workloads (a9) scale
# instead of collapsing onto the 1x distinct set.


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    for t in UNCHANGED:
        shutil.copy(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")
    con = duckdb.connect()
    boiler = ("""
         || ' ' || (SELECT string_agg('bp' || CAST((doc_id + r.i * 10000000)
              % 50 AS VARCHAR) || 'w' || CAST(j AS VARCHAR), ' ')
            FROM (SELECT unnest(generate_series(1, 30)) AS j))"""
              if BOILER else "")
    con.execute(f"""
COPY (
  SELECT doc_id + r.i * 10000000 AS doc_id,
         text || ' rep' || CAST(r.i AS VARCHAR){boiler} AS text,
         lang, source, n_chars + 5 AS n_chars
  FROM '{SF}/documents.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT vec_id + r.i * 10000000 AS vec_id,
         list_transform(embedding, x -> CAST(x + r.i * 0.001 AS FLOAT))
           AS embedding,
         label
  FROM '{SF}/embeddings.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")
    # events replicate by USER offset: each replica is a fresh user
    # population with the original per-user volume distribution, so the
    # user_id-keyed shuffles scale in group COUNT (the realistic axis —
    # more users, same behavior), event_ids stay unique, timestamps stay
    # put (the day-partitioned layout keeps the same day count).
    # Offsets only keep replicas disjoint while the SOURCE ids fit under
    # them — chaining a run on an already-scaled output (or a much
    # larger SF) would silently merge user populations; fail fast.
    max_ev, max_user = con.execute(
        f"SELECT MAX(event_id), MAX(user_id) FROM '{SF}/events.parquet'"
    ).fetchone()
    assert max_ev < 100000000 and max_user < 10000000, (
        f"source ids exceed replication offsets "
        f"(max event_id={max_ev}, max user_id={max_user}) — "
        f"replicas would collide; use a raw sf dir as input")
    con.execute(f"""
COPY (
  SELECT event_id + r.i * 100000000 AS event_id, ts,
         user_id + r.i * 10000000 AS user_id,
         event_type, value, props
  FROM '{SF}/events.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT c_custkey + r.i * 10000000 AS c_custkey,
         c_name || ' rep' || CAST(r.i AS VARCHAR) AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SF}/customer.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")
    max_ord, max_part = con.execute(
        f"SELECT (SELECT MAX(o_orderkey) FROM '{SF}/orders.parquet'), "
        f"(SELECT MAX(p_partkey) FROM '{SF}/part.parquet')").fetchone()
    assert max_ord < 10000000 and max_part < 10000000, (
        f"source ids exceed replication offsets (max o_orderkey={max_ord}, "
        f"max p_partkey={max_part}) — use a raw sf dir as input")
    con.execute(f"""
COPY (
  SELECT * REPLACE (o_orderkey + r.i * 10000000 AS o_orderkey,
                    o_custkey + r.i * 10000000 AS o_custkey)
  FROM '{SF}/orders.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
""")
    # l_partkey/l_suppkey offsets match the part/supplier replicas below,
    # so lineitem->part/supplier coverage holds AND the (part, supplier)
    # bipartite pair GRAPH (GraphPack.edges) scales in node count — with
    # unchanged dim keys the 64x graph would be IDENTICAL to 1x (distinct
    # pairs dedup the replicas away) and any graph smoke vacuous.
    con.execute(f"""
COPY (
  SELECT * REPLACE (l_orderkey + r.i * 10000000 AS l_orderkey,
                    l_partkey + r.i * 10000000 AS l_partkey,
                    l_suppkey + r.i * 10000000 AS l_suppkey)
  FROM '{SF}/lineitem.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * REPLACE (s_suppkey + r.i * 10000000 AS s_suppkey,
    s_name || CASE WHEN r.i = 0 THEN '' ELSE ' rep' || CAST(r.i AS VARCHAR)
      END AS s_name)
  FROM '{SF}/supplier.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * REPLACE (p_partkey + r.i * 10000000 AS p_partkey,
    CASE WHEN r.i = 0 THEN p_type
         ELSE p_type || ' rep' || CAST(r.i AS VARCHAR) END AS p_type)
  FROM '{SF}/part.parquet'
  CROSS JOIN (SELECT unnest(generate_series(0, {N - 1})) AS i) r
) TO '{OUT}/part.parquet' (FORMAT PARQUET)
""")
    docs = con.execute(
        f"SELECT COUNT(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    emb = con.execute(
        f"SELECT COUNT(*) FROM '{OUT}/embeddings.parquet'").fetchone()[0]
    print(f"{OUT}: documents={docs} embeddings={emb} (x{N} from {SF})")


if __name__ == "__main__":
    main()

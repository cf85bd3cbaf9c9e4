#!/usr/bin/env python3
"""Deterministic corpus scale-up for scaling-evidence runs (round-9 ask #1).

Replicates the heavy-family tables of a source SF dir by an integer factor
with structure-preserving perturbations, so the d_*/v_*/g_* families can be
gated and benched at ~sf1 without touching the read-only driver testdata:

  - embeddings: ids stay DENSE (vec_id*f + r), replica 0 is byte-identical
    to the source (original near-dup structure preserved), replicas r>0 get
    a deterministic per-(vec,dim,replica) float jitter;
  - documents: doc_id*f + r; replica 0 identical, replicas r>0 get a ' v<r>'
    suffix — every exact-dup group is reproduced once per replica (10x
    groups, same group sizes: linear dedup scaling shape);
  - lineitem: all keys *f + r → the supplier–part graph becomes f disjoint
    copies (block-diagonal: linear node/edge scaling, no cross-replica
    densification);
  - events: event_id/user_id *f + r, ts shifted by r hours per replica so
    time-window self-joins stay within-replica;
  - remaining small tables are copied through unchanged.

Usage: python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import os
import shutil
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
f = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT unnest(range({f})) AS r")


def copy_per_replica(table, select_sql, order=""):
    """One parquet file per replica under <dst>/<table>.parquet/ — the
    multi-file layout a real corpus has, so Spark scan stages parallelize
    instead of serializing per-row work into one task."""
    d = f"{dst}/{table}.parquet"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for i in range(f):
        con.execute(f"""COPY ({select_sql.replace('reps', f'(SELECT {i} AS r)')}
          {order}) TO '{d}/part-{i:03d}.parquet' (FORMAT PARQUET)""")


copy_per_replica("embeddings", f"""
  SELECT e.vec_id * {f} + r AS vec_id,
         CASE WHEN r = 0 THEN e.embedding ELSE
           list_transform(list_zip(e.embedding, range(1, len(e.embedding) + 1)),
             p -> CAST(p[1] + ((p[2] * 37 + e.vec_id * 13 + r * 7) % 41 - 20)
                       * 0.001 AS FLOAT))
         END AS embedding,
         e.label AS label
  FROM '{src}/embeddings.parquet' e, reps""", "ORDER BY vec_id")

# Replicas must be textually DISTANT from each other: a shared-suffix
# replica is a near-duplicate of all its siblings, which makes the true
# near-dup pair count grow QUADRATICALLY in the factor (corpus
# densification) — any engine would super-linearly slow on that, so it is
# useless as engine-scaling evidence. A per-replica rotation of 10 common
# letters rewrites most words (cross-replica Jaccard collapses) while
# preserving in-replica duplicate structure exactly (identical texts map
# to identical texts), so dup GROUPS scale linearly with the factor.
ALPHA = "aeiousrtln"
rot = lambda r: ALPHA[r % len(ALPHA):] + ALPHA[:r % len(ALPHA)]
doc_case = "CASE\n" + "\n".join(
    f"    WHEN r = {i} THEN translate(d.text, '{ALPHA}', '{rot(i)}') || ' v{i}'"
    for i in range(1, f)) + "\n    ELSE d.text END"
copy_per_replica("documents", f"""
  SELECT d.doc_id * {f} + r AS doc_id,
         {doc_case} AS text,
         d.lang, d.source,
         CASE WHEN r = 0 THEN d.n_chars
              ELSE length(d.text || ' vX') END AS n_chars
  FROM '{src}/documents.parquet' d, reps""", "ORDER BY doc_id")

copy_per_replica("lineitem", f"""
  SELECT l.l_orderkey * {f} + r AS l_orderkey,
         l.l_partkey * {f} + r AS l_partkey,
         l.l_suppkey * {f} + r AS l_suppkey,
         l.l_linenumber, l.l_quantity, l.l_extendedprice, l.l_discount,
         l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM '{src}/lineitem.parquet' l, reps""")

copy_per_replica("events", f"""
  SELECT e.event_id * {f} + r AS event_id,
         e.ts + INTERVAL 1 HOUR * r AS ts,
         e.user_id * {f} + r AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e, reps""")

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

for t in ["embeddings", "documents", "lineitem", "events"]:
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet/*.parquet'").fetchone()[0]
    print(f"[gen_scale] {t}: {n} rows")
print(f"[gen_scale] wrote {dst} at factor {f}")

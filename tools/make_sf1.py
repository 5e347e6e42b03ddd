"""Synthesize an sf1 decade for the scale sweep (round 12, r11-verdict
#5): /root/testdata holds sf0.001/0.01/0.1 (driver-generated,
read-only); the sweep needs one more decade, so this script builds
sf1 ≈ 6M lineitem rows under .sf1/ (gitignored) by 10x replication of
the DRIVER's sf0.1 tables with key offsets — distribution-preserving
and deterministic.

Replication rules (chosen so per-entry work scales LINEARLY in the
replica count, i.e. the sweep measures the OPERATOR's growth, not an
artifact of cloned data):

* lineitem: l_orderkey offset per replica (distinct orders), part/
  supplier keys unchanged — 10x facts over constant dims, the real
  warehouse growth shape (group-by cardinality fixed, probe side 10x).
* orders: o_orderkey/o_custkey offset per replica — joins stay 1:N.
* events: user_id and event_id offset per replica — 10x users, so
  sessionization/windows grow in users, never in per-key state.
* documents: doc_id offset AND every token suffixed "~r" in replica
  r>0 — within-replica duplicate structure replicates exactly, while
  CROSS-replica verbatim overlap is impossible (cloned text would
  make every dup window 10x hot and pair counts ~100x — a quadratic
  artifact of cloning, not of the operator).
* embeddings: vec_id offset per replica AND the vector ROTATED by r
  positions in replica r (round 13, for the ANN sweep entries):
  rotation preserves the norm and the coordinate distribution while
  making each replica a distinct direction — verbatim clones would
  put 10 identical points at every location, an artificial worst case
  for bucket occupancy and tie handling that measures cloning, not
  the operator.
* dims (region nation customer supplier part): copied unscaled (the
  swept entries treat them as dims or don't read them).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
DST = Path(__file__).resolve().parent.parent / ".sf1"
R = 10


def main() -> None:
    DST.mkdir(exist_ok=True)
    con = duckdb.connect()
    con.sql("SET preserve_insertion_order=false")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    reps = f"(SELECT unnest(range({R})) AS r)"

    # one shared order-key offset covering BOTH tables: offsetting by
    # max(l_orderkey) alone would collide replicas whenever an order
    # has no lineitems (max(o_orderkey) > max(l_orderkey)) — today the
    # two maxima coincide, but the generator must not depend on that
    maxok = con.sql(
        f"SELECT greatest((SELECT max(l_orderkey) FROM {src('lineitem')}),"
        f" (SELECT max(o_orderkey) FROM {src('orders')})) + 1"
    ).fetchone()[0]
    con.sql(f"""
        COPY (SELECT l_orderkey + r*{maxok} AS l_orderkey,
                     l_partkey, l_suppkey, l_linenumber, l_quantity,
                     l_extendedprice, l_discount, l_tax, l_returnflag,
                     l_linestatus, l_shipdate
              FROM {src('lineitem')}, {reps})
        TO '{DST}/lineitem.parquet' (FORMAT parquet)
    """)
    maxck = con.sql(f"SELECT max(o_custkey)+1 FROM {src('orders')}").fetchone()[0]
    cols = [c for c in con.sql(f"SELECT * FROM {src('orders')} LIMIT 0").columns]
    rest = ", ".join(c for c in cols if c not in ("o_orderkey", "o_custkey"))
    con.sql(f"""
        COPY (SELECT o_orderkey + r*{maxok} AS o_orderkey,
                     o_custkey + r*{maxck} AS o_custkey, {rest}
              FROM {src('orders')}, {reps})
        TO '{DST}/orders.parquet' (FORMAT parquet)
    """)
    maxu = con.sql(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
    maxe = con.sql(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
    ecols = [c for c in con.sql(f"SELECT * FROM {src('events')} LIMIT 0").columns]
    erest = ", ".join(c for c in ecols if c not in ("user_id", "event_id"))
    con.sql(f"""
        COPY (SELECT user_id + r*{maxu} AS user_id,
                     event_id + r*{maxe} AS event_id, {erest}
              FROM {src('events')}, {reps})
        TO '{DST}/events.parquet' (FORMAT parquet)
    """)
    maxd = con.sql(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
    con.sql(f"""
        COPY (SELECT doc_id + r*{maxd} AS doc_id,
                     CASE WHEN r = 0 THEN text
                          ELSE regexp_replace(text, '(\\S+)',
                                              '\\1~' || r, 'g')
                     END AS text,
                     lang, source, n_chars
              FROM {src('documents')}, {reps})
        TO '{DST}/documents.parquet' (FORMAT parquet)
    """)
    maxv = con.sql(
        f"SELECT max(vec_id)+1 FROM {src('embeddings')}"
    ).fetchone()[0]
    con.sql(f"""
        COPY (SELECT vec_id + r*{maxv} AS vec_id,
                     CAST(list_concat(embedding[r+1:],
                                      embedding[1:r]) AS FLOAT[])
                         AS embedding,
                     label
              FROM {src('embeddings')}, {reps})
        TO '{DST}/embeddings.parquet' (FORMAT parquet)
    """)
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(t, n)
    print("sf1 at", DST)


if __name__ == "__main__":
    sys.exit(main())

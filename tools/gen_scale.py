#!/usr/bin/env python3
"""Deterministic scale-up replicator for the driver's testdata (harness
tooling, like check.py — NOT part of the Spark library).

Usage: python3 tools/gen_scale.py <srcSfDir> <dstDir> <factor>

Replicates every table <factor> times. Replica i offsets each key family
by i * stride (stride = max(key)+1 of the source), applied consistently
to primary AND foreign keys, so referential integrity and per-entity
history shapes are preserved exactly:

- region / nation / supplier: copied as-is (bounded dims — scale-factor
  independent, matching the broadcast-discipline assumption).
- customer, part: PK offset.
- orders: o_orderkey offset; o_custkey offset by the customer stride.
- lineitem: l_orderkey / l_partkey offset by their parents' strides;
  l_suppkey untouched (supplier is fixed).
- events: event_id / user_id offset (each replica is a fresh entity
  population with an identical change history; the event_id%50 truncate
  slice shifts per replica, which the oracle recomputes anyway).
- documents / embeddings: doc_id / vec_id offset, content identical —
  every document gains factor-1 exact duplicates, a deliberate worst-ish
  case for the dedup family.
- events.ts is written at microsecond precision (DuckDB's native
  timestamp) — the engine truncates to micros on read anyway, and
  graft.Tables.events accepts both the NANOS and MICROS encodings.

Row order is ORDER BY (replica, pk): deterministic output files.
"""
import sys
import duckdb

def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def t(name):
        return f"'{src}/{name}.parquet'"

    def stride(name, key):
        return con.execute(f"SELECT max({key}) + 1 FROM {t(name)}").fetchone()[0]

    CK = stride("customer", "c_custkey")
    PK = stride("part", "p_partkey")
    OK = stride("orders", "o_orderkey")
    EK = stride("events", "event_id")
    UK = stride("events", "user_id")
    DK = stride("documents", "doc_id")
    VK = stride("embeddings", "vec_id")

    def copy(name, select):
        con.execute(
            f"COPY ({select}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation", "supplier"):
        copy(dim, f"SELECT * FROM {t(dim)}")

    rep = f"range({factor}) AS r(i)"
    copy("customer", f"""SELECT * EXCLUDE (i) REPLACE (c_custkey + i * {CK} AS c_custkey)
        FROM {t('customer')}, {rep} ORDER BY i, c_custkey""")
    copy("part", f"""SELECT * EXCLUDE (i) REPLACE (p_partkey + i * {PK} AS p_partkey)
        FROM {t('part')}, {rep} ORDER BY i, p_partkey""")
    copy("orders", f"""SELECT * EXCLUDE (i) REPLACE (
          o_orderkey + i * {OK} AS o_orderkey, o_custkey + i * {CK} AS o_custkey)
        FROM {t('orders')}, {rep} ORDER BY i, o_orderkey""")
    copy("lineitem", f"""SELECT * EXCLUDE (i) REPLACE (
          l_orderkey + i * {OK} AS l_orderkey, l_partkey + i * {PK} AS l_partkey)
        FROM {t('lineitem')}, {rep} ORDER BY i, l_orderkey, l_linenumber""")
    copy("events", f"""SELECT * EXCLUDE (i) REPLACE (
          event_id + i * {EK} AS event_id, user_id + i * {UK} AS user_id)
        FROM {t('events')}, {rep} ORDER BY i, event_id""")
    copy("documents", f"""SELECT * EXCLUDE (i) REPLACE (doc_id + i * {DK} AS doc_id)
        FROM {t('documents')}, {rep} ORDER BY i, doc_id""")
    copy("embeddings", f"""SELECT * EXCLUDE (i) REPLACE (vec_id + i * {VK} AS vec_id)
        FROM {t('embeddings')}, {rep} ORDER BY i, vec_id""")

if __name__ == "__main__":
    main()

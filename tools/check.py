#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads oracle_sql.json written by graft.Verify, runs each oracle in DuckDB
against the sfDir parquet tables, and compares with the Spark-written
parquet in <verifyOutDir>/<name>/. Columns are sorted by name; values are
compared exactly (with a diagnostic near-match pass for floats).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        s = v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None, None
    t = pq.read_table(f"{outdir}/{name}")
    cols = sorted(t.column_names)
    rows = [tuple(norm(r[c]) for c in cols) for r in t.to_pylist()]
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = set(sys.argv[3:])
    for name, osql in sorted(oracles.items()):
        if only and name not in only:
            continue
        scols, srows = load_spark(outdir, name)
        if scols is None:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            res = con.execute(osql)
            ocols_raw = [d[0] for d in res.description]
            orows_raw = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}");  n_fail += 1;  continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(norm(r[i]) for i in order) for r in orows_raw]
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1;  continue
        if srows == orows:
            print(f"PASS {name} ({len(srows)} rows)");  n_pass += 1;  continue
        n_fail += 1
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                break
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local driver-mimic correctness check.

Usage: python3 tools/check.py [sf_dir] [out_dir]
  1. assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran
  2. loads each <out_dir>/<name> parquet (Spark result)
  3. runs oracle_sql.json's SQL in DuckDB with views named per table
  4. compares schema (column names), row count, and values (rows sorted by
     all columns, col order normalized by name) — prints per-query verdict.
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v!r}"
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

fails = 0
for name in sorted(oracle):
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {str(e)[:120]}"); fails += 1; continue
    try:
        ora = con.sql(oracle[name])
        ocols, orows = ora.columns, ora.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle errored: {str(e)[:200]}"); fails += 1; continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: columns differ spark={sc} oracle={oc}"); fails += 1; continue
    if len(sr) != len(orr):
        print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}"); fails += 1; continue
    if sr != orr:
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        print(f"FAIL {name}: values differ in {len(bad)}/{len(sr)} rows; first diffs (spark vs oracle):")
        for a, b in bad[:3]:
            print(f"   spark : {a}\n   oracle: {b}")
        # localize: which columns diverge, and how often (cols are sorted
        # by name in canon(), so index i of a row tuple is sc[i])
        percol = {}
        for a, b in bad:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y: percol[sc[i]] = percol.get(sc[i], 0) + 1
        print(f"   per-column diff counts: {dict(sorted(percol.items()))}")
        fails += 1; continue
    print(f"PASS {name} ({len(sr)} rows)")

# rows-only queries (no oracle): check non-empty
import os
for name in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, name)
    if os.path.isdir(p) and name not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{name}/*.parquet')").fetchone()[0]
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
            if n == 0: fails += 1
        except Exception as e:
            print(f"FAIL {name} (rows-only unreadable: {str(e)[:120]})"); fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

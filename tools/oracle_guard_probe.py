#!/usr/bin/env python3
"""Prove the oracle mirrors' input guards fail LOUDLY, not as hash drift.

Two oracle templates carry in-SQL asserts (error()) on fixture invariants
they depend on:
  - q93_cdc_cycle: props must contain no control char outside the
    \b \t \n \f \r short-escape set (Spark renders others as \\u00XX,
    the mirror's escape chain does not);
  - q92_multimodal: the corrupt-video stub text must be pure ASCII (the
    JVM stub hashes signed UTF-8 bytes, the mirror hashes code points —
    they agree only on ASCII).

This probe DOCTORS a copy of the smallest fixture — one props gains a
\\x01, one stubbed doc's text gains a 'é' — and asserts both oracles
raise their named error instead of silently diverging. It also re-runs
both on the clean fixture to show the guards pass there.

Usage: python3 tools/oracle_guard_probe.py [sf_dir] [oracle_sql.json]
Exit 0 = all four checks behave as designed.
"""
import json, shutil, sys, tempfile
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_v2/oracle_sql.json"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

oracle = json.load(open(ORACLE))
tmp = tempfile.mkdtemp(prefix="graft_guard_probe_")

con = duckdb.connect()

def load_views(events_path, documents_path):
    for t in TABLES:
        con.sql(f"DROP VIEW IF EXISTS {t}")
        path = {"events": events_path, "documents": documents_path}.get(
            t, f"{SF}/{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

def expect_error(name, needle):
    try:
        con.sql(oracle[name]).fetchall()
    except Exception as e:
        msg = str(e)
        assert needle in msg, f"{name}: guard fired but with the wrong message: {msg[:200]}"
        print(f"PASS {name}: doctored fixture fails loudly: {msg.splitlines()[-1][:110]}")
        return
    raise AssertionError(f"{name}: doctored fixture did NOT trip the guard (silent hash-drift hazard)")

def expect_ok(name):
    con.sql(oracle[name]).fetchall()
    print(f"PASS {name}: clean fixture passes the guard")

# --- clean baseline ---------------------------------------------------------
load_views(f"{SF}/events.parquet", f"{SF}/documents.parquet")
expect_ok("q93_cdc_cycle")
expect_ok("q92_multimodal")

# --- doctored events: one props gains a \x01 (outside the escape set) -------
ev = f"{tmp}/events.parquet"
con.sql(f"""COPY (
  SELECT * REPLACE (CASE WHEN event_id = (SELECT min(event_id) FROM read_parquet('{SF}/events.parquet'))
                         THEN props || chr(1) ELSE props END AS props)
  FROM read_parquet('{SF}/events.parquet')) TO '{ev}' (FORMAT parquet)""")
load_views(ev, f"{SF}/documents.parquet")
expect_error("q93_cdc_cycle", "control char outside")

# --- doctored documents: one corrupt-video stub doc goes non-ASCII ----------
# the stub population is doc_id % 3 == 2 (video) AND doc_id % 9 == 2
doc = f"{tmp}/documents.parquet"
con.sql(f"""COPY (
  SELECT * REPLACE (CASE WHEN doc_id = (SELECT min(doc_id) FROM read_parquet('{SF}/documents.parquet')
                                        WHERE doc_id % 3 = 2 AND doc_id % 9 = 2 AND doc_id < 500)
                         THEN text || 'é' ELSE text END AS text)
  FROM read_parquet('{SF}/documents.parquet')) TO '{doc}' (FORMAT parquet)""")
load_views(f"{SF}/events.parquet", doc)
expect_error("q92_multimodal", "pure-ASCII")

shutil.rmtree(tmp, ignore_errors=True)
print("ALL GUARDS LOUD")

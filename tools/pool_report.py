#!/usr/bin/env python3
"""Pooled per-query bench minima at one code fingerprint.

The box's bench totals are load-hostage (hypervisor CPU steal, see
BASELINE.md r13 protocol notes); the honest figure for a code state is
the per-query MINIMUM across every run at that state's fingerprint
(src/main + build.sbt hash — the `code` field bench_history.jsonl
records). This prints that pool, its total, and the heaviest entries.

Usage: tools/pool_report.py [fingerprint-prefix] [sf-substring]
Defaults: the newest entry's fingerprint, sf "0.1".
"""
import json
import sys


def main() -> None:
    rows = [json.loads(l) for l in open("bench_history.jsonl")]
    sf_sub = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    rows = [r for r in rows if sf_sub in r.get("sf", "")]
    if not rows:
        sys.exit(f"no entries for sf~{sf_sub}")
    code = sys.argv[1] if len(sys.argv) > 1 else rows[-1].get("code", "")
    if not code:
        # startswith("") matches EVERY run — pooling minima across code
        # fingerprints, the exact cross-code leak this tool exists to
        # prevent (ADVICE r13). An unfingerprinted newest entry is a bug
        # in how it was recorded, not a pooling request.
        sys.exit("resolved fingerprint is empty (newest entry has no 'code' "
                 "field) — pass one explicitly")
    runs = [r for r in rows if (r.get("code") or "").startswith(code)]
    if not runs:
        sys.exit(f"no entries for fingerprint {code}")
    pool: dict[str, float] = {}
    for r in runs:
        for q, s in r["queries"].items():
            pool[q] = min(pool.get(q, float("inf")), s)
    total = sum(pool.values())
    raws = ", ".join(f"{r['total']:.1f}" for r in runs)
    print(f"fingerprint {code[:12]}…  runs={len(runs)}  raw totals: {raws}")
    print(f"pooled per-query min total: {total:.2f}s over {len(pool)} queries")
    print("heaviest pooled minima:")
    for q, s in sorted(pool.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {q:34s} {s:6.2f}")


if __name__ == "__main__":
    main()

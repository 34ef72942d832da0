#!/usr/bin/env python3
"""Timed per-query oracle sweep: runs tools/check.py once per query
(so one hung/heavy DuckDB oracle cannot stall the rest), collects
OK/FAIL/TIMEOUT/SKIP per query, and writes a JSON summary.

Usage: python3 tools/sweep.py <sfDir> <outDir> <summary.json>
           [--timeout SEC] [--skip name,name,...] [--allow-partial]

Queries are the UNION of <outDir>'s dump directories and the
oracle_sql.json keys: an oracle key with no dump dir means Verify
failed on that query and is recorded as MISSING (a failure), so a
broken dump cannot read as all-green. --skip names are recorded as
SKIP with no attempt (checked FIRST, so a skip also silences a
missing dump). --allow-partial downgrades MISSING to SKIP — for spot
sweeps over a prefix-restricted Verify run, whose oracle_sql.json
still lists every query.
"""
import glob
import json
import os
import subprocess
import sys
import time

sfdir, outdir, summary_path = sys.argv[1], sys.argv[2], sys.argv[3]
timeout = 600
skip = set()
allow_partial = False
args = sys.argv[4:]
while args:
    if args[0] == "--timeout":
        timeout = int(args[1]); args = args[2:]
    elif args[0] == "--skip":
        skip = set(args[1].split(",")); args = args[2:]
    elif args[0] == "--allow-partial":
        allow_partial = True; args = args[1:]
    else:
        raise SystemExit(f"unknown arg {args[0]}")

dumped = set(d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
             if os.path.isdir(d))
# Union with oracle_sql.json keys: a query Verify failed to dump (it
# prints to stderr and writes no dir) must surface as MISSING here, not
# silently vanish from the sweep — full check.py catches this class via
# the same union ("FAIL: no spark output"), so the timed sweep must too.
oracle_keys = set()
oracle_json = os.path.join(outdir, "oracle_sql.json")
if os.path.exists(oracle_json):
    oracle_keys = set(json.load(open(oracle_json)).keys())
names = sorted(dumped | oracle_keys)
here = os.path.dirname(os.path.abspath(__file__))
results = {}
for name in names:
    if name in skip:
        results[name] = {"status": "SKIP", "sec": 0.0}
        print(f"SKIP {name}", flush=True)
        continue
    if name not in dumped:
        if allow_partial:
            results[name] = {"status": "SKIP", "sec": 0.0,
                             "detail": "not dumped (partial sweep)"}
            print(f"SKIP {name}: not dumped (partial sweep)", flush=True)
        else:
            results[name] = {"status": "MISSING", "sec": 0.0,
                             "detail": "no Verify dump dir for oracle key"}
            print(f"MISSING {name}: no Verify dump dir", flush=True)
        continue
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check.py"),
             sfdir, outdir, name],
            capture_output=True, text=True, timeout=timeout)
        sec = time.time() - t0
        tail = (p.stdout.strip().splitlines() or ["<no output>"])
        status = "OK" if p.returncode == 0 else "FAIL"
        results[name] = {"status": status, "sec": round(sec, 1),
                         "detail": tail[0][:400]}
        print(f"{status:4s} {name} ({sec:.1f} s): {tail[0][:200]}",
              flush=True)
    except subprocess.TimeoutExpired:
        sec = time.time() - t0
        results[name] = {"status": "TIMEOUT", "sec": round(sec, 1)}
        print(f"TIMEOUT {name} ({sec:.0f} s)", flush=True)

counts = {}
for r in results.values():
    counts[r["status"]] = counts.get(r["status"], 0) + 1
summary = {"sf": sfdir, "out": outdir, "timeout_sec": timeout,
           "counts": counts, "queries": results}
with open(summary_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
print(json.dumps({"sweep": counts, "n": len(results)}))
sys.exit(0 if counts.get("FAIL", 0) == 0 and counts.get("TIMEOUT", 0) == 0
         and counts.get("MISSING", 0) == 0 else 1)

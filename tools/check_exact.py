#!/usr/bin/env python3
"""Strict variant of check.py: NO float rounding — values must match on
exact repr, emulating the driver's hash-based gate.
Usage: python3 tools/check_exact.py <sfDir> <outDir> [query...]"""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            rr.append(repr(v))
        out.append("|".join(rr))
    return sorted(out)

fail = 0
names = sorted(set(list(oracle.keys()) +
        [d.split("/")[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith(".json")]))
if only:
    names = [n for n in names if n in only]
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    grows, gcols = got.fetchall(), [d[0] for d in got.description]
    if name not in oracle:
        print(f"rows-only {name}: {len(grows)} rows"); continue
    try:
        want = con.execute(oracle[name])
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    if sorted(gcols) != sorted(wcols):
        print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
        fail += 1; continue
    g, w = norm(grows, gcols), norm(wrows, wcols)
    if g == w:
        print(f"OK   {name}: {len(g)} rows")
    else:
        fail += 1
        diff = [(a, b) for a, b in zip(g, w) if a != b]
        print(f"FAIL {name}: {len(g)} vs {len(w)} rows; {len(diff)} differing; first diffs:")
        for a, b in diff[:3]:
            print(f"  spark:  {a}\n  oracle: {b}")
        if len(g) != len(w):
            only_g = set(g) - set(w); only_w = set(w) - set(g)
            for x in list(only_g)[:2]: print(f"  only-spark: {x}")
            for x in list(only_w)[:2]: print(f"  only-oracle: {x}")
print(("ALL OK" if fail == 0 else f"{fail} FAILURES"))
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Consolidate the slope records into one committed per-query file
(r14 verdict item 5: no query's scaling may rest on sub-floor-only
evidence).

Inputs (each a SlopeBench JSON line):
  target/slope.json          three-decade graded-SF record (mid sf0.01 -> big sf0.1)
  target/slope_decade4.json  heavy-tier sf1 -> sf10 decade
  <partial...>               r15 sf0.1 -> sf1 runs for the sub-floor tail

Output: one JSON object with, per query, every measured SF time, the
ratio of the LARGEST decade whose big-side time clears the 1 s floor
(the decade that actually carries evidence), and a verdict:
  linear_ok        above-floor decade exists, ratio <= data_ratio * slack
  annotated        flagged but output/saturation-bound with recorded evidence
  subfloor_at_max  no measured scale pushes the query over the floor --
                   overhead-dominated even at its largest measured SF
                   (itself a scaling verdict: 10-100x data, still <1 s)
  no_evidence      the query appears in the records but every run
                   FAILED (negative time) -- no measurement at all
Exits 1 if any query is superlinear-above-floor and unannotated, or
has a no_evidence verdict, or (with --inventory) is expected but
absent from every input record.

Usage: python3 tools/slope_merge.py OUT [extra_partial.json ...]
                [--inventory FILE.json]
--inventory names the expected query set (any JSON object whose
"queries" field -- dict or list -- lists the graded inventory, e.g. a
Bench record or a SlopeBench record from a full sweep); queries in it
but in NO input record fail the gate instead of silently vanishing.
"""
import json, sys

FLOOR, SLACK, DATA_RATIO = 1.0, 1.5, 10.0

# Retired from the graded inventory (r15) — historical records only.
RETIRED = {"q189_decimal_probe"}

# Records written before r15's `annotated_all` field carry only the
# annotated∩flagged entries of THAT run; flags first appearing in a
# different decade need their evidence seeded here. Newer records ship
# the full SlopeBench.Annotated map as `annotated_all`, which
# supersedes this fallback (and wins on key collisions below).
ANNOTATED_EXTRA = {
    "q97_hard_negatives":
        "exact band-scan anchor: query set (vec_id % 50) and corpus both "
        "grow 10x - inherent n^2/50 like q27 (measured sf1->sf10 21.6x, "
        "sub-floor below sf1); web-scale path composes ivfTopK's cell "
        "probe or a hash-sampled pool (Similarity.hardNegatives doc)",
}

args = sys.argv[1:]
inventory_path = None
if "--inventory" in args:
    i = args.index("--inventory")
    inventory_path = args[i + 1]
    args = args[:i] + args[i + 2:]
out_path = args[0]
paths = ["target/slope.json", "target/slope_decade4.json"] + args[1:]

# per query: {sf_label: seconds}; later files win on duplicate labels.
# `seen` also tracks queries whose every run failed (negative time) —
# those must surface as no_evidence, not silently classify as
# subfloor_at_max (a failed query is the OPPOSITE of a fast one).
times, seen = {}, set()
legacy_annotated, all_annotated_all = {}, {}
for p in paths:
    rec = json.load(open(p))
    legacy_annotated.update(rec.get("annotated", {}))
    all_annotated_all.update(rec.get("annotated_all", {}))
    for q, row in rec["queries"].items():
        if q in RETIRED:
            continue
        seen.add(q)
        times.setdefault(q, {}).update(
            {k: v for k, v in row.items() if k.startswith("sf") and v is not None and v >= 0})

# Precedence: any record's full `annotated_all` map beats any old-format
# record's `annotated` subset, regardless of input order (r15 advice: a
# later old-format record must not resurrect stale annotation text over
# an earlier record's full map), and both beat the seeded fallback.
annotated = {**ANNOTATED_EXTRA, **legacy_annotated, **all_annotated_all}

missing = []
if inventory_path:
    obj = json.load(open(inventory_path))
    # accept a record with a "queries" field (Bench/SlopeBench line) or
    # a flat name->anything object (Verify's oracle_sql.json)
    inv = obj.get("queries", obj)
    expected = set(inv if isinstance(inv, list) else inv.keys()) - RETIRED
    missing = sorted(expected - seen)

def sf_of(label):
    return float(label[2:])

queries, bad, subfloor, no_evidence = {}, [], [], []
for q in sorted(seen):
    row = times.get(q, {})
    pts = sorted(((sf_of(k), v) for k, v in row.items()))
    if not pts:
        queries[q] = {"verdict": "no_evidence"}
        no_evidence.append(q)
        continue
    # largest decade (consecutive measured scales, ratio of sfs ~10)
    # whose big time clears the floor
    best = None
    for (s1, t1), (s2, t2) in zip(pts, pts[1:]):
        if t1 > 0 and t2 >= FLOOR:
            best = {"decade": f"sf{s1:g}->sf{s2:g}", "ratio": round(t2 / t1, 3),
                    "data_ratio": round(s2 / s1, 3)}
    entry = {f"sf{s:g}": t for s, t in pts}
    if best:
        entry.update(best)
        flagged = best["ratio"] > best["data_ratio"] * SLACK
        if flagged and q in annotated:
            entry["verdict"] = "annotated"
            entry["why"] = annotated[q]
        elif flagged:
            entry["verdict"] = "superlinear"
            bad.append(q)
        else:
            entry["verdict"] = "linear_ok"
    else:
        entry["verdict"] = "subfloor_at_max"
        entry["max_sf_time"] = pts[-1][1]
        subfloor.append(q)
    queries[q] = entry

summary = {
    "metric": "slope_merged",
    "floor_sec": FLOOR, "slack": SLACK,
    "n_queries": len(queries),
    "superlinear": bad,
    "annotated": sorted(q for q in annotated if q in queries
                        and queries[q]["verdict"] == "annotated"),
    "subfloor_at_max": subfloor,
    "no_evidence": no_evidence,
    "missing_from_inventory": missing,
    "queries": queries,
}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=False)
print(f"{len(queries)} queries; superlinear={bad}; "
      f"annotated={len(summary['annotated'])}; subfloor_at_max={subfloor}; "
      f"no_evidence={no_evidence}; missing={missing}")
sys.exit(1 if (bad or no_evidence or missing) else 0)

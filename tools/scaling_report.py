#!/usr/bin/env python3
"""Derive the per-query scaling table from a tri-SF record triplet.

Usage: tools/scaling_report.py <tag>   (reads tools/bench_sf{01,1,3}_checksum_<tag>.json)
Prints totals, 10x/30x ratios, medians, and the slowest/worst-scaling
queries, so SURVEY'S published numbers are one command from the raw
records (the r9 verdict re-derived these by hand).
"""
import json, sys, statistics

tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
recs = {}
# sf10 (the 100x column, r15) is optional: present only for rounds that
# pinned one (tools/bench_sf10_checksum_<tag>.json)
OPTIONAL = {"sf10"}
for sf, name in [("sf0.1", "01"), ("sf1", "1"), ("sf3", "3"), ("sf10", "10")]:
    # checksum_<tag> = a pin that cleared the steal bar; best_<tag> = the
    # lowest-steal attempt of a round whose windows never cleared it (r12 sf1/
    # sf3) — fall back so every round's tag resolves to its honest record.
    for pattern in (f"tools/bench_sf{name}_checksum_{tag}.json",
                    f"tools/bench_sf{name}_{tag}.json",
                    f"tools/bench_sf{name}_best_{tag}.json"):
        try:
            with open(pattern) as f:
                recs[sf] = json.load(f)
            break
        except FileNotFoundError:
            continue
    else:
        if sf in OPTIONAL:
            continue
        sys.exit(f"no record for {sf} under tag {tag}")

q01, q1, q3 = (recs[s]["queries"] for s in ("sf0.1", "sf1", "sf3"))
shared = sorted(set(q01) & set(q1) & set(q3))
print(f"queries: {len(shared)} shared "
      f"({len(q01)}/{len(q1)}/{len(q3)} per record)")
for sf in recs:
    r = recs[sf]
    print(f"  {sf}: total {r['value']:.2f}s steal {r['cpu_steal_sec']:.2f}s "
          f"runs {r['runs']} n {len(r['queries'])}")

t01 = sum(q01[k] for k in shared)
t1 = sum(q1[k] for k in shared)
t3 = sum(q3[k] for k in shared)
r10 = [q1[k] / q01[k] for k in shared]
r30 = [q3[k] / q01[k] for k in shared]
print(f"\nshared-query totals: {t01:.2f} / {t1:.2f} / {t3:.2f} s")
print(f"10x data: total {t1/t01:.2f}x, per-query median {statistics.median(r10):.2f}x, "
      f"max {max(r10):.2f}x ({shared[r10.index(max(r10))]}), >=10x: {sum(r >= 10 for r in r10)}")
print(f"30x data: total {t3/t01:.2f}x, per-query median {statistics.median(r30):.2f}x, "
      f"max {max(r30):.2f}x ({shared[r30.index(max(r30))]}), >=30x: {sum(r >= 30 for r in r30)}")

if "sf10" in recs:
    q10 = recs["sf10"]["queries"]
    shared100 = sorted(set(shared) & set(q10))
    t01b = sum(q01[k] for k in shared100)
    t10 = sum(q10[k] for k in shared100)
    r100 = [q10[k] / q01[k] for k in shared100]
    print(f"100x data ({len(shared100)} shared): total {t10/t01b:.2f}x "
          f"({t01b:.2f} -> {t10:.2f} s), per-query median {statistics.median(r100):.2f}x, "
          f"max {max(r100):.2f}x ({shared100[r100.index(max(r100))]}), "
          f">=100x: {sum(r >= 100 for r in r100)}")
    print("worst 100x ratios:")
    for k in sorted(shared100, key=lambda k: -(q10[k] / q01[k]))[:10]:
        print(f"  {k:24s} {q01[k]:7.2f} {q10[k]:8.2f} s   {q10[k]/q01[k]:6.2f}x")

print("\nslowest at sf3:")
for k in sorted(shared, key=lambda k: -q3[k])[:10]:
    print(f"  {k:24s} {q01[k]:7.2f} {q1[k]:7.2f} {q3[k]:7.2f} s   {q3[k]/q01[k]:5.2f}x")
print("\nworst 30x ratios:")
for k in sorted(shared, key=lambda k: -(q3[k] / q01[k]))[:10]:
    print(f"  {k:24s} {q01[k]:7.2f} {q1[k]:7.2f} {q3[k]:7.2f} s   {q3[k]/q01[k]:5.2f}x")

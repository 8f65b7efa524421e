#!/usr/bin/env python3
"""Generate BASELINE.md's gate table from the committed bench artifacts —
the table's numbers are produced FROM the files, never typed alongside them
(VERDICT r14 items 1-2).

Usage: python3 tools/gen_bench_table.py r15
"""
import glob
import json
import os
import sys

ROUND = sys.argv[1] if len(sys.argv) > 1 else "r16"
SCALES = [("sf0.1", "600 k", "local"), ("sf1", "6 M", "sf1"),
          ("sf2", "12 M", "sf2"), ("sf5", "30 M", "sf5"),
          ("sf10", "60 M", "sf10")]

print("| scale | rows (lineitem) | total sec | pipeline_rps | artifact |")
print("|---|---|---|---|---|")
per_query = {}
for scale, rows, tag in SCALES:
    name = f"BENCH_{ROUND}_{tag}.json"
    if not os.path.exists(name):
        continue  # a round may not have produced every scale (e.g. r15 sf10)
    m = json.load(open(name))
    side = json.load(open(f"bench_details_{ROUND}_{tag}.json"))
    per_query[scale] = side["queries"]
    assert abs(sum(v for v in side["queries"].values() if v >= 0)
               - m["value"]) < 0.05, name
    print(f"| {scale} | {rows} | {m['value']:.1f} | "
          f"{m['pipeline_rps'] // 1000} k | `{name}` |")

# Targeted quiet-window repricings are FIRST-CLASS artifacts (round 16,
# VERDICT r15 ask #1): a gate row contaminated by box contention is
# superseded by a committed `bench_targeted_{round}_{scale}.json` (written
# by graft.Bench under SPARK_GRAFT_QUERIES), and the footnote lines below
# are generated FROM those files — check_artifacts.py verifies every
# "superseded:" line in BASELINE.md against its artifact.
overrides = {}  # scale -> {query: (sec, artifact)}
for path in sorted(glob.glob(f"bench_targeted_{ROUND}_*.json")):
    t = json.load(open(path))
    assert t.get("query_filter"), f"{path}: not a targeted run"
    scale = os.path.basename(path)[len(f"bench_targeted_{ROUND}_"):-len(".json")]
    scale = {"local": "sf0.1"}.get(scale, scale)  # artifact tag -> table key
    for q, v in t["queries"].items():
        if v >= 0:
            overrides.setdefault(scale, {})[q] = (v, os.path.basename(path))
for scale, qs in sorted(overrides.items()):
    for q, (v, art) in sorted(qs.items()):
        full = per_query.get(scale, {}).get(q)
        note = f" (gate row had {full:.2f} s)" if full is not None else ""
        print(f"> superseded: {q} {scale} {v:.2f} s — targeted quiet run "
              f"`{art}`{note}")
# ratio lines below use the EFFECTIVE per-query numbers (targeted quiet
# runs replacing their contaminated gate rows)
for scale, qs in overrides.items():
    if scale in per_query:
        for q, (v, _) in qs.items():
            if q in per_query[scale]:
                per_query[scale][q] = v

def growth(lo_name, hi_name, factor, bar):
    lo, hi = per_query.get(lo_name), per_query.get(hi_name)
    if not lo or not hi:
        return
    # membership-checked: a query present in one scale's sidecar but not
    # the other (added/failed mid-round) must not KeyError (ADVICE r15)
    ratios = sorted((hi[q] / lo[q], q)
                    for q in lo if q in hi and lo[q] > 0.0 and hi[q] > 0)
    mid = ratios[len(ratios) // 2]
    tot_lo = sum(v for v in lo.values() if v >= 0)
    tot_hi = sum(v for v in hi.values() if v >= 0)
    print(f"\n{lo_name}->{hi_name}: total {tot_hi / tot_lo:.2f}x for "
          f"{factor}x data; median per-query {mid[0]:.2f}x; "
          f"worst {ratios[-1][0]:.2f}x ({ratios[-1][1]}); "
          f"queries above the {bar}x bar: "
          f"{[q for r, q in ratios if r > bar]}")


growth("sf1", "sf5", 5, 5.0)
growth("sf5", "sf10", 2, 2.5)
if "sf5" in per_query:
    print("top sf5:", sorted(
        ((v, q) for q, v in per_query["sf5"].items()), reverse=True)[:5])
if "sf10" in per_query:
    print("top sf10:", sorted(
        ((v, q) for q, v in per_query["sf10"].items()), reverse=True)[:5])

#!/usr/bin/env python3
"""Generate BASELINE.md's gate table from the committed bench artifacts —
the table's numbers are produced FROM the files, never typed alongside them
(VERDICT r14 items 1-2).

Usage: python3 tools/gen_bench_table.py r15
"""
import json
import sys

ROUND = sys.argv[1] if len(sys.argv) > 1 else "r15"
SCALES = [("sf0.1", "600 k", "local"), ("sf1", "6 M", "sf1"),
          ("sf2", "12 M", "sf2"), ("sf5", "30 M", "sf5")]

print("| scale | rows (lineitem) | total sec | pipeline_rps | artifact |")
print("|---|---|---|---|---|")
per_query = {}
for scale, rows, tag in SCALES:
    name = f"BENCH_{ROUND}_{tag}.json"
    m = json.load(open(name))
    side = json.load(open(f"bench_details_{ROUND}_{tag}.json"))
    per_query[scale] = side["queries"]
    assert abs(sum(v for v in side["queries"].values() if v >= 0)
               - m["value"]) < 0.05, name
    print(f"| {scale} | {rows} | {m['value']:.1f} | "
          f"{m['pipeline_rps'] // 1000} k | `{name}` |")

sf1, sf5 = per_query["sf1"], per_query["sf5"]
# membership-checked: a query present in one scale's sidecar but not the
# other (added/failed mid-round) must not KeyError the table (ADVICE r15)
ratios = sorted((sf5[q] / sf1[q], q)
                for q in sf1 if q in sf5 and sf1[q] > 0.0 and sf5[q] > 0)
mid = ratios[len(ratios) // 2]
tot1 = sum(v for v in sf1.values() if v >= 0)
tot5 = sum(v for v in sf5.values() if v >= 0)
print(f"\nsf1->sf5: total {tot5 / tot1:.2f}x for 5x data; "
      f"median per-query {mid[0]:.2f}x; "
      f"worst {ratios[-1][0]:.2f}x ({ratios[-1][1]}); "
      f"queries above the 5x bar: "
      f"{[q for r, q in ratios if r > 5.0]}")
print("top sf5:", sorted(((v, q) for q, v in sf5.items()), reverse=True)[:5])

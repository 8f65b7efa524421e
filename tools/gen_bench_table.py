#!/usr/bin/env python3
"""Generate BASELINE.md's gate table from the committed bench artifacts —
the table's numbers are produced FROM the files, never typed alongside them
(VERDICT r14 items 1-2).

Usage: python3 tools/gen_bench_table.py r17 [r16]

With the optional previous-round argument it also computes the CROSS-ROUND
per-query 2x gate at sf1 (round 17, VERDICT r16 ask #5): sf1 is the scale
whose per-query regression gate the round is judged on — the sf0.1 stage
(~99 s) is dominated by fixed per-query overheads and the box's documented
+-20% regime shifts (r16 burned three full runs adjudicating an sf0.1
level shift that the sf5 totals disproved in one line). sf0.1 stays in the
growth table as the correctness-scale anchor; it no longer gates.

Steal footnotes (round 17, VERDICT r16 ask #2): any gate row whose
EFFECTIVE committed min (targeted override if one exists, else the
full-suite sidecar) was measured in a window with >STEAL_PCT_GATE
hypervisor steal gets a "> steal:" footnote generated from the sidecar —
the instrument r16 built (Bench.scala steal_pct), wired to the decision it
was built for. check_artifacts.py verifies every footnote against its
sidecar, exactly like the "superseded:" lines.
"""
import glob
import json
import os
import sys

from bench_gate import (ANCHOR_GATE, HEAVY_TOP_N, LOADAVG_QUIET,
                        STEAL_PCT_GATE, TAG_BY_SCALE, WATCH_RATIO,
                        anchored_rows, gate_line, heavy_rows,
                        min_run_steal, round_history, sf1_gate)

ROUND = sys.argv[1] if len(sys.argv) > 1 else "r17"
PREV = sys.argv[2] if len(sys.argv) > 2 else None
SCALES = [("sf0.1", "600 k", "local"), ("sf1", "6 M", "sf1"),
          ("sf2", "12 M", "sf2"), ("sf5", "30 M", "sf5"),
          ("sf10", "60 M", "sf10")]


def load_round(round_tag):
    """(per_query mins, per_query (min-run steal, source artifact)) per
    scale, with targeted overrides applied — the EFFECTIVE numbers. The
    steal source is tracked per entry so the generated footnote cites the
    file the number was actually computed FROM: a targeted override's
    steal lives in bench_targeted_details_..., and citing the detail-less
    bench_targeted_... summary made check_artifacts reject the footnote
    it simultaneously demanded (ADVICE r17 medium)."""
    per_query, per_steal, rows = {}, {}, []
    for scale, rowcount, tag in SCALES:
        name = f"BENCH_{round_tag}_{tag}.json"
        if not os.path.exists(name):
            continue  # a round may not have produced every scale
        m = json.load(open(name))
        side_name = f"bench_details_{round_tag}_{tag}.json"
        side = json.load(open(side_name))
        per_query[scale] = dict(side["queries"])
        per_steal[scale] = {q: (min_run_steal(d), side_name)
                            for q, d in side.get("details", {}).items()}
        assert abs(sum(v for v in side["queries"].values() if v >= 0)
                   - m["value"]) < 0.05, name
        rows.append((scale, rowcount, m, name))
    overrides = {}  # scale -> {query: (sec, artifact)}
    for path in sorted(glob.glob(f"bench_targeted_{round_tag}_*.json")):
        t = json.load(open(path))
        assert t.get("query_filter"), f"{path}: not a targeted run"
        scale = os.path.basename(path)[
            len(f"bench_targeted_{round_tag}_"):-len(".json")]
        scale = {"local": "sf0.1"}.get(scale, scale)  # artifact tag -> key
        det_path = path.replace("bench_targeted_", "bench_targeted_details_")
        det = json.load(open(det_path))["details"] if os.path.exists(det_path) else {}
        for q, v in t["queries"].items():
            if v >= 0:
                overrides.setdefault(scale, {})[q] = (v, os.path.basename(path))
                if q in det:
                    per_steal.setdefault(scale, {})[q] = (
                        min_run_steal(det[q]), os.path.basename(det_path))
    # effective per-query numbers: targeted quiet runs replace their
    # contaminated gate rows
    for scale, qs in overrides.items():
        if scale in per_query:
            for q, (v, _) in qs.items():
                if q in per_query[scale]:
                    per_query[scale][q] = v
    return per_query, per_steal, overrides, rows


per_query, per_steal, overrides, rows = load_round(ROUND)

print("| scale | rows (lineitem) | total sec | pipeline_rps | artifact |")
print("|---|---|---|---|---|")
for scale, rowcount, m, name in rows:
    print(f"| {scale} | {rowcount} | {m['value']:.1f} | "
          f"{m['pipeline_rps'] // 1000} k | `{name}` |")

# Targeted quiet-window repricings are FIRST-CLASS artifacts (round 16,
# VERDICT r15 ask #1): a gate row contaminated by box contention is
# superseded by a committed `bench_targeted_{round}_{scale}.json`, and the
# footnote lines below are generated FROM those files — check_artifacts.py
# verifies every "superseded:" line in BASELINE.md against its artifact.
raw = {}
for scale, _, tag in SCALES:
    p = f"bench_details_{ROUND}_{tag}.json"
    if os.path.exists(p):
        raw[scale] = json.load(open(p))["queries"]
for scale, qs in sorted(overrides.items()):
    for q, (v, art) in sorted(qs.items()):
        full = raw.get(scale, {}).get(q)
        note = f" (gate row had {full:.2f} s)" if full is not None else ""
        print(f"> superseded: {q} {scale} {v:.2f} s — targeted quiet run "
              f"`{art}`{note}")

# steal footnotes: effective committed mins measured under a dirty window.
# Iterates the STEAL map (every details entry, including the pipeline_rps
# provenance row from round 18 on), not the queries map — this is the same
# set check_artifacts.py recomputes its completeness expectation from, so
# the two tools cannot disagree about which rows need a footnote.
qualified = 0
for scale in [s for s, _, _ in SCALES]:
    for q in sorted(per_steal.get(scale, {})):
        s, src = per_steal[scale][q]
        if s is not None and s > STEAL_PCT_GATE:
            print(f"> steal: {q} {scale} committed min under {s:.1f}% "
                  f"hypervisor steal (gate {STEAL_PCT_GATE:g}%) — `{src}`")
            qualified += 1
if qualified == 0:
    print(f"> steal: no gate row's committed min exceeded the "
          f"{STEAL_PCT_GATE:g}% window-steal gate this round")

# anchored cross-round ratchet (round 19, VERDICT r18 asks #2/#3/#5): every
# sf1/sf5 gate row is compared to its best committed clean-window effective
# time across ALL prior rounds, so a <=2x/round slow boil (q142 r16->r18)
# trips the gate mechanically. Rows past ANCHOR_GATE print as "> anchored:"
# flags — and one whose committed min ran above the LOADAVG_QUIET own-load
# allowance MUST be repriced through the bench_targeted quiet mechanism
# (check_artifacts enforces both the footnotes and the repricing rule from
# the same bench_gate.anchored_rows computation). Floor-clearing rows in
# (WATCH_RATIO, ANCHOR_GATE] with a strictly-rising last-3-rounds history
# print as the COMPUTED watch-list with that history — monotone-vs-noisy
# is computed, never hand-typed (see bench_gate.py for the floor/band
# rationale).
anchored = anchored_rows(".", ROUND)
cur_num = int(ROUND[1:])
for scale, q, cur, best, src, ratio, la, targeted in anchored:
    if ratio > ANCHOR_GATE:
        if targeted:
            load_note = " — quiet-repriced (targeted artifact)"
        elif la is not None and la > LOADAVG_QUIET:
            load_note = (f" — min-run loadavg {la:.1f} > {LOADAVG_QUIET:g} "
                         f"quiet bar: REQUIRES a bench_targeted quiet "
                         f"repricing")
        elif la is None:
            # a load-blind window is UNRESOLVED, not quiet: labeling it
            # "(quiet window)" was fail-open on exactly the gap the
            # LOADAVG_QUIET rule closes (ADVICE r19 low #2) —
            # check_artifacts demands the repricing either way
            load_note = (" — min-run loadavg UNKNOWN (load-blind "
                         "window): REQUIRES a bench_targeted quiet "
                         "repricing")
        else:
            load_note = f" — min-run loadavg {la:.1f} (quiet window)"
        print(f"> anchored: {q} {scale} {cur:.2f} s vs best {best:.2f} s "
              f"({src}) = {ratio:.2f}x (gate {ANCHOR_GATE:g}x){load_note}")
for scale, q, cur, best, src, ratio, la, targeted in anchored:
    if ratio <= ANCHOR_GATE:
        hist = round_history(".", TAG_BY_SCALE[scale], q, cur_num)
        hist_s = " -> ".join(f"{r} {v:.2f}" for r, v in hist[-4:])
        print(f"> watch: {q} {scale} {ratio:.2f}x of best {best:.2f} s "
              f"({src}); monotone climb, history {hist_s}")
if not any(r[5] > ANCHOR_GATE for r in anchored):
    print(f"> anchored: no sf1/sf5 gate row exceeded the {ANCHOR_GATE:g}x "
          f"anchored ratchet this round")

# standing heavy-row quiet repricing (round 20, VERDICT r19 #3/#5): the
# top-N sf1 rows by RAW full-suite committed min are repriced in a
# targeted quiet batch each round and the quiet price is what the
# effective numbers (anchor + watch history) record. The footnote lists
# the COMPUTED set; check_artifacts.py recomputes it and requires each
# row to carry a quiet bench_targeted override.
heavy = heavy_rows(".", ROUND)
if heavy:
    print(f"> heavy: top-{HEAVY_TOP_N} sf1 rows by committed time "
          f"(standing quiet repricing): {', '.join(heavy)}")


def growth(lo_name, hi_name, factor, bar):
    lo, hi = per_query.get(lo_name), per_query.get(hi_name)
    if not lo or not hi:
        return
    # membership-checked: a query present in one scale's sidecar but not
    # the other (added/failed mid-round) must not KeyError (ADVICE r15)
    ratios = sorted((hi[q] / lo[q], q)
                    for q in lo if q in hi and lo[q] > 0.0 and hi[q] > 0)
    if not ratios:
        # two scales sharing no positive-timed queries must not crash the
        # table generation (ADVICE r16)
        print(f"\n{lo_name}->{hi_name}: no shared positive-timed queries")
        return
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

# ---- the driver-facing gate scale: sf1 (VERDICT r16 ask #5) ------------
# The summary sentence is GENERATED by bench_gate.sf1_gate/gate_line —
# the same shared computation check_artifacts.py verifies any "> gate:"
# line in BASELINE.md's current section against, so the median/worst/
# total absolutes in the gate paragraph can no longer drift from the
# sidecars by hand-typing (VERDICT r19 ask #2: the q76 "0.51 s" error).
if PREV:
    g = sf1_gate(".", ROUND, PREV)
    if g is None:
        print(f"\nsf1 gate vs {PREV}: sf1 artifacts missing for one side")
    else:
        print()
        print(gate_line(g))
        cur, old = per_query.get("sf1", {}), {}
        for q, r in g["flagged"]:
            s = per_steal.get("sf1", {}).get(q, (None, None))[0]
            steal_note = (f"min-run steal {s:.1f}%" if s is not None
                          else "steal unknown")
            print(f"  - {q}: {r:.2f}x, {steal_note}")

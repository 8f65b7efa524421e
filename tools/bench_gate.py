"""Shared bench-gate constants and helpers (round 18, ADVICE r17 low #4).

STEAL_PCT_GATE and min_run_steal were previously hand-duplicated across
Bench.scala, gen_bench_table.py, and check_artifacts.py with only "keep in
sync" comments — a drift in any copy would make the checker validate
against a different gate/selection than the generator used, silently
weakening the footnote check. Both Python tools now import THIS module,
and check_artifacts.py asserts STEAL_PCT_GATE against the literal in
Bench.scala (the remaining cross-language copy), so a drift anywhere
fails the round instead of passing it quietly.
"""
import glob
import json
import os
import re

# a sample window is "high-steal" above this %: the hypervisor took enough
# of the window that the measurement is suspect regardless of run
# agreement (= Bench.StealPctGate, asserted by check_artifacts.py)
STEAL_PCT_GATE = 3.0

# ---- anchored cross-round ratchet (round 19, VERDICT r18 asks #2/#5) ----
# The per-round 2x gate compares only to the PREVIOUS round, so a <=2x/round
# slow boil never trips it (q142_chunk_scrub ran 1.71 -> 2.54 -> 4.53 s at
# sf5 across r16-r18 with code and fixtures unchanged). The anchored gate
# compares each judged-scale row to its best committed CLEAN-WINDOW
# effective time across ALL prior rounds; cumulative drift past ANCHOR_GATE
# flags the row like a gate row.
ANCHOR_GATE = 2.0
# scales the anchored ratchet covers: the judged gate scale (sf1) plus the
# growth-bar scale where the q142 boil actually lived (sf5)
ANCHOR_SCALES = ("sf1", "sf5")
# rows whose CURRENT effective min is below this many seconds are outside
# the anchored mechanism entirely: the anchor is a min over 10+ rounds of
# noisy samples (an extreme-value statistic, biased low), so a sub-second
# judged-scale row trips 2x-of-best on pure noise (measured: 9 of r18's
# 21 raw flags were rows under 1 s, e.g. q126 0.35 s vs best 0.14 s) while
# never being a bottleneck anything needs to adjudicate. Step regressions
# on small rows remain covered by the per-round 2x gate.
ANCHOR_FLOOR_SEC = 1.0
# rows with cumulative drift past this (but under ANCHOR_GATE) AND a
# strictly-increasing effective time over the last three rounds — the
# slow-boil signature (q142 ran 1.71 -> 2.54 -> 4.53 s at sf5 r16-r18) —
# print as a computed watch-list entry with their per-round history,
# replacing the hand-written watch-list prose (VERDICT r18 ask #3 — the
# r18 text mislabeled two monotone sequences as "neither monotone").
WATCH_RATIO = 1.5

# The standing heavy-row quiet repricing (round 20, VERDICT r19 What's
# wrong #3 / ask #5): the committed sf1 numbers for the suite's heaviest
# rows carry ~1.5-1.8x own-load inflation from the full-suite run's own
# 32-thread work (r19 measured: q150 committed 12.78 s vs quiet 7.07,
# q116 5.23 vs 2.62, q88 2.19 vs 1.18), so the anchored ratchet's history
# for heavy rows drifts upward on box regime alone and the watch-list
# refills every round. The rule: the top-HEAVY_TOP_N sf1 rows by RAW
# full-suite committed min (raw, so the ranking cannot be gamed by the
# repricing itself) are repriced in a targeted quiet batch each round,
# and the QUIET price is what the effective numbers — and therefore the
# anchor and watch history — record. check_artifacts.py enforces it.
HEAVY_TOP_N = 5

# The own-load allowance (VERDICT r18 ask #5, the load-blind gap): the
# suite's own local[32] work routinely drives mid-suite 1-min loadavg to
# ~20-27 on this 32-cpu box (r16-r18 sidecars: p90 ~19-21, max ~25-28), so
# mid-suite loadavg alone cannot adjudicate contention — q142's poisoned
# r17/r18 sf5 mins ran at 14.9/19.8, BELOW p90. A targeted single-query
# quiet run, by contrast, starts below ~2 and peaks ~6-7 from its own
# work. The rule therefore couples load to the anchored flag: an
# anchored-flagged row whose committed min ran above LOADAVG_QUIET cannot
# close the round as-is — it must be repriced through the standing
# bench_targeted quiet-window mechanism (check_artifacts enforces this).
LOADAVG_QUIET = 8.0

# full-suite sidecar tag per scale key (gen_bench_table's SCALES mirror)
TAG_BY_SCALE = {"sf0.1": "local", "sf1": "sf1", "sf2": "sf2",
                "sf5": "sf5", "sf10": "sf10"}


def min_run_steal(detail):
    """steal_pct of the run that produced the committed min, or None.

    Failed runs (-1.0) are skipped; sidecars written before the r16 steal
    instrument carry no steal_pct array and degrade to unknown.
    """
    runs = detail.get("runs", [])
    steals = detail.get("steal_pct")
    if not runs or steals is None or len(steals) != len(runs):
        return None
    good = [(v, i) for i, v in enumerate(runs) if v >= 0]
    if not good:
        return None
    _, idx = min(good)
    s = steals[idx]
    return None if s < 0 else s


def min_run_loadavg(detail):
    """1-min loadavg at the start of the run that produced the committed
    min, or None — the load twin of min_run_steal (VERDICT r18 ask #5).
    """
    runs = detail.get("runs", [])
    las = detail.get("loadavg")
    if not runs or las is None or len(las) != len(runs):
        return None
    good = [(v, i) for i, v in enumerate(runs) if v >= 0]
    if not good:
        return None
    _, idx = min(good)
    la = las[idx]
    return None if la < 0 else la


def effective_round(root, round_tag, tag, apply_targeted=True):
    """query -> (sec, min_run_steal, min_run_loadavg, targeted?) for one
    round + scale tag, with targeted quiet-window overrides applied — the
    same EFFECTIVE numbers gen_bench_table's load_round produces, shared
    here so the generator and the checker compute anchors identically.
    Missing artifacts degrade to an empty map. apply_targeted=False
    returns the RAW full-suite numbers (check_artifacts uses it to count
    how many rows the LOADAVG_QUIET rule actually forced to reprice —
    VERDICT r19 ask #7).
    """
    out = {}
    side_p = os.path.join(root, f"bench_details_{round_tag}_{tag}.json")
    try:
        with open(side_p) as f:
            side = json.load(f)
    except (OSError, ValueError):
        return out
    # legacy (r13-era) sidecars carry only runs arrays: derive per-query
    # mins over NON-NEGATIVE runs only — min(d["runs"]) would let a -1.0
    # failure marker win and erase the query's anchor candidate, and an
    # empty runs list would raise (ADVICE r19 low #1)
    qmins = side.get("queries") or {
        q: min([r for r in d.get("runs", []) if r >= 0], default=-1.0)
        for q, d in side.get("details", {}).items()}
    for q, v in qmins.items():
        if not isinstance(v, (int, float)) or v < 0:
            continue
        d = side.get("details", {}).get(q, {})
        out[q] = (v, min_run_steal(d), min_run_loadavg(d), False)
    if not apply_targeted:
        return out
    try:
        with open(os.path.join(
                root, f"bench_targeted_{round_tag}_{tag}.json")) as f:
            t = json.load(f)
    except (OSError, ValueError):
        return out
    tdet = {}
    try:
        with open(os.path.join(
                root, f"bench_targeted_details_{round_tag}_{tag}.json")) as f:
            tdet = json.load(f).get("details", {})
    except (OSError, ValueError):
        pass
    for q, v in (t.get("queries") or {}).items():
        if isinstance(v, (int, float)) and v >= 0 and q in out:
            d = tdet.get(q, {})
            out[q] = (v, min_run_steal(d), min_run_loadavg(d), True)
    return out


def anchors(root, tag, before_round):
    """query -> (best clean-window effective sec, source round tag) across
    every committed round strictly before `before_round` (an int). A
    window is an anchor candidate when its min-run steal is <= the gate or
    unknown (pre-r16 sidecars predate the instrument; contention only
    INFLATES a time, so an unknown window can never fake a too-fast
    anchor). Load is deliberately not filtered here: a fast time under
    load is still a genuine price, and the LOADAVG_QUIET rule gates the
    CURRENT row's evidence, not the anchor's.
    """
    best = {}
    pat = re.compile(rf"bench_details_(r(\d+))_{re.escape(tag)}\.json$")
    for p in glob.glob(os.path.join(root, f"bench_details_r*_{tag}.json")):
        m = pat.match(os.path.basename(p))
        if not m or int(m.group(2)) >= before_round:
            continue
        for q, (v, steal, _, _) in effective_round(root, m.group(1), tag).items():
            if steal is not None and steal > STEAL_PCT_GATE:
                continue
            if q not in best or v < best[q][0]:
                best[q] = (v, m.group(1))
    return best


def anchored_rows(root, round_tag, apply_targeted=True):
    """[(scale, query, cur_sec, best_sec, best_round, ratio, min_run_la,
    targeted?)] for every ANCHOR_SCALES row of `round_tag` that the
    anchored mechanism selects, sorted worst-first per scale. Rows at or
    above ANCHOR_FLOOR_SEC with ratio past ANCHOR_GATE are the flagged
    set; floor-clearing rows in (WATCH_RATIO, ANCHOR_GATE] whose
    effective time rose strictly over the last three rounds (the
    slow-boil signature) are the computed watch-list. One shared
    implementation so gen_bench_table.py (which prints the footnotes) and
    check_artifacts.py (which enforces them) can never disagree.
    apply_targeted=False evaluates the CURRENT round's rows from the raw
    full-suite sidecar (anchors stay effective) — the pre-repricing view
    check_artifacts uses to count LOADAVG_QUIET-rule firings.
    """
    m = re.match(r"r(\d+)$", round_tag)
    if not m:
        return []
    cur_num = int(m.group(1))
    rows = []
    for scale in ANCHOR_SCALES:
        tag = TAG_BY_SCALE[scale]
        eff = effective_round(root, round_tag, tag, apply_targeted)
        anc = anchors(root, tag, cur_num)
        scale_rows = []
        for q, (v, _, la, targeted) in eff.items():
            if q not in anc or anc[q][0] <= 0 or v < ANCHOR_FLOOR_SEC:
                continue
            ratio = v / anc[q][0]
            if ratio > ANCHOR_GATE:
                scale_rows.append((scale, q, v, anc[q][0], anc[q][1],
                                   ratio, la, targeted))
            elif ratio > WATCH_RATIO:
                h = round_history(root, tag, q, cur_num)[-3:]
                if len(h) == 3 and all(b[1] > a[1] for a, b in zip(h, h[1:])):
                    scale_rows.append((scale, q, v, anc[q][0], anc[q][1],
                                       ratio, la, targeted))
        rows.extend(sorted(scale_rows, key=lambda r: -r[5]))
    return rows


def round_history(root, tag, query, upto_round):
    """[(round tag, effective sec)] for one query at one scale tag across
    all committed rounds <= upto_round, ascending — the computed
    per-round history the watch-list prints instead of hand-written
    trend prose (VERDICT r18 ask #3)."""
    pat = re.compile(rf"bench_details_(r(\d+))_{re.escape(tag)}\.json$")
    hist = []
    for p in glob.glob(os.path.join(root, f"bench_details_r*_{tag}.json")):
        m = pat.match(os.path.basename(p))
        if not m or int(m.group(2)) > upto_round:
            continue
        eff = effective_round(root, m.group(1), tag)
        if query in eff:
            hist.append((int(m.group(2)), eff[query][0]))
    return [(f"r{n}", v) for n, v in sorted(hist)]


def sf1_gate(root, round_tag, prev_tag):
    """The judged cross-round sf1 gate, computed from the same EFFECTIVE
    per-query numbers as the anchored ratchet, plus the two rounds'
    full-suite BENCH totals — shared so gen_bench_table.py (which prints
    the "> gate:" summary line) and check_artifacts.py (which verifies
    any absolute quoted in BASELINE.md's gate paragraph) can never
    disagree (VERDICT r19 ask #2: two rounds running, the only factual
    errors in this repo were hand-typed prose numbers). Returns None
    when either side's sf1 sidecar is missing or they share no
    positive-timed queries.
    """
    cur = effective_round(root, round_tag, "sf1")
    old = effective_round(root, prev_tag, "sf1")
    if not cur or not old:
        return None
    ratios = sorted((cur[q][0] / old[q][0], q) for q in old
                    if q in cur and old[q][0] > 0 and cur[q][0] > 0)
    if not ratios:
        return None
    worst_r, worst_q = ratios[-1]

    def total(tag):
        try:
            with open(os.path.join(root, f"BENCH_{tag}_sf1.json")) as f:
                d = json.load(f)
        except (OSError, ValueError):
            return None
        m = d if "value" in d else (d.get("parsed") or {})
        return m.get("value")

    return {
        "prev": prev_tag, "shared": len(ratios),
        "median": ratios[len(ratios) // 2][0],
        "worst_ratio": worst_r, "worst_query": worst_q,
        "worst_prev": old[worst_q][0], "worst_cur": cur[worst_q][0],
        "flagged": [(q, r) for r, q in ratios if r > 2.0],
        "total_cur": total(round_tag), "total_prev": total(prev_tag),
    }


def gate_line(g):
    """The canonical "> gate:" footnote for an sf1_gate result — ONE
    formatter used by the generator (prints it) and mirrored by the
    checker's regex (verifies it), so the sentence in BASELINE.md is
    generated, never hand-typed."""
    flagged = (", ".join(f"{q} {r:.2f}x" for q, r in g["flagged"])
               or "none")
    tot = ""
    if g["total_cur"] is not None and g["total_prev"] is not None:
        tot = (f"; totals {g['total_cur']:.1f} vs "
               f"{g['total_prev']:.1f} s")
    return (f"> gate: sf1 vs {g['prev']}: {g['shared']} shared queries, "
            f"median {g['median']:.2f}x, worst {g['worst_ratio']:.2f}x "
            f"{g['worst_query']} ({g['worst_prev']:.2f} -> "
            f"{g['worst_cur']:.2f} s){tot}; rows above 2x: {flagged}")


def heavy_rows(root, round_tag):
    """The top-HEAVY_TOP_N sf1 queries by RAW full-suite committed min —
    the standing quiet-reprice set (see the HEAVY_TOP_N comment). Raw
    (pre-override) mins rank the rows so the set cannot be changed by
    the repricing it mandates. Empty when the round has no sf1 sidecar.
    """
    raw = effective_round(root, round_tag, "sf1", apply_targeted=False)
    ranked = sorted(((v, q) for q, (v, _, _, _) in raw.items()),
                    reverse=True)
    return [q for _, q in ranked[:HEAVY_TOP_N]]


def scala_steal_gate(root):
    """The StealPctGate literal committed in Bench.scala, or None if the
    declaration cannot be found (the caller should treat that as an
    error, not a pass)."""
    path = os.path.join(root, "src", "main", "scala", "graft", "Bench.scala")
    try:
        with open(path) as f:
            src = f.read()
    except OSError:
        return None
    m = re.search(r"val\s+StealPctGate\s*=\s*([\d.]+)", src)
    return float(m.group(1)) if m else None

#!/usr/bin/env python3
"""Evidence-chain guard (round 15, VERDICT r14 ask #5).

Fails (exit 1) if the committed bench evidence is internally inconsistent:

  1. any BENCH_*.json or bench_details_*.json at the repo root is empty
     or unparseable;
  2. any BENCH summary disagrees with its details sidecar (total != sum of
     per-query mins, or query counts differ);
  3. any BASELINE.md gate-table row that cites an existing BENCH artifact
     disagrees with that artifact (total sec to 0.1, pipeline_rps to 1k);
  4. (round 16) any bench_targeted_*.json is not a self-consistent targeted
     run (query_filter null, or total != sum of per-query mins);
  5. (round 16) any BASELINE.md "> superseded:" footnote disagrees with the
     targeted artifact it cites (query missing, or seconds off by >0.005);
  6. (round 16) any "N ScalaTest specs" claim in README.md/BASELINE.md
     disagrees with the committed SPECCOUNT.txt (itself regenerated from
     `sbt test` output each round);
  7. (round 17) any BASELINE.md "> steal:" footnote disagrees with the
     sidecar it cites (the committed min's window steal recomputed from
     the file), or the CURRENT round's qualifying rows (>3% min-run
     steal) are missing their footnotes;
  8. (round 17) the current round's ORACLE_SF1_r<N>.json is missing, not
     green, or stale — its recorded commit must have NO src/main or
     oracle-tool diff against HEAD, so the sf1 gate claim is always
     file-backed at the code it was run on (VERDICT r16 ask #1);
  9. (round 18) the checkers themselves are inside the drift surface
     (VERDICT r17 ask #5): ORACLE_SF1_r<N>.json records the sha256 of
     every enforcement tool (this file, gen_bench_table.py, the oracle
     tools, bench_gate.py), and this check fails if any recorded hash
     disagrees with the file on disk — editing an enforcement tool after
     the artifact was generated invalidates the artifact until it is
     regenerated. The STEAL_PCT_GATE constant is also asserted against
     the Bench.scala literal (ADVICE r17 low #4) so the Python and Scala
     copies cannot drift apart.
 10. (round 19, VERDICT r18 asks #2/#3/#5) the anchored cross-round
     ratchet: every sf1/sf5 gate row is compared to its best committed
     clean-window effective time across ALL prior rounds
     (bench_gate.anchored_rows — shared with gen_bench_table.py).
     Flagged rows (> ANCHOR_GATE cumulative) must carry a matching
     "> anchored:" footnote; watch-band rows a computed "> watch:" line;
     and a flagged row whose committed min ran above the LOADAVG_QUIET
     own-load allowance must have been repriced through the
     bench_targeted quiet-window mechanism.

Run it before every end-of-round commit:  python3 tools/check_artifacts.py
"""
import glob
import hashlib
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_gate import (ANCHOR_GATE, ANCHOR_SCALES, HEAVY_TOP_N,  # noqa: E402
                        LOADAVG_QUIET, STEAL_PCT_GATE, TAG_BY_SCALE,
                        anchored_rows, gate_line, heavy_rows,
                        min_run_loadavg, min_run_steal, scala_steal_gate,
                        sf1_gate)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
errors = []

# the enforcement tools whose identity the sf1 oracle artifact pins —
# keep in sync with check_oracle_sf1.TOOL_HASH_FILES (it writes what this
# file verifies; a mismatch in the LIST shows up as a missing/extra key)
TOOL_HASH_FILES = [
    "tools/bench_gate.py", "tools/check_artifacts.py",
    "tools/check_oracle.py", "tools/check_oracle_sf1.py",
    "tools/gen_bench_table.py",
]

# a markdown HEADING is #'s followed by whitespace — a naive
# startswith("#") also matches prose lines that wrap onto a leading
# "#4," (a VERDICT-ask reference did exactly that in round 17) and
# silently truncates the "(current)" section scope
HEADING = re.compile(r"#{1,6}\s")


def err(msg):
    errors.append(msg)
    print(f"FAIL: {msg}")


def load(path):
    if os.path.getsize(path) == 0:
        err(f"{os.path.basename(path)} is EMPTY (0 bytes)")
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception as e:  # noqa: BLE001 - report any parse failure
        err(f"{os.path.basename(path)} does not parse as JSON: {e}")
        return None


# ---- 1. every bench artifact parses -----------------------------------
summaries, sidecars = {}, {}
for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_*.json"))):
    d = load(path)
    if d is not None:
        summaries[os.path.basename(path)] = d
for path in sorted(glob.glob(os.path.join(ROOT, "bench_details_*.json"))):
    d = load(path)
    if d is not None:
        sidecars[os.path.basename(path)] = d

# ---- 2. summary <-> sidecar agreement ---------------------------------
# BENCH_r{N}_{scale}.json pairs with bench_details_r{N}_{scale}.json.
for name, summ in summaries.items():
    m = re.match(r"BENCH_(r\d+(?:_\w+)?)\.json", name)
    if not m:
        continue
    side_name = f"bench_details_{m.group(1)}.json"
    if side_name not in sidecars:
        continue  # driver-written BENCH_r{N}.json has no committed sidecar
    side = sidecars[side_name]
    # summaries are either the raw metric line or the driver's {tail,parsed}
    metric = summ if "value" in summ else summ.get("parsed")
    if metric is None:
        err(f"{name}: no parsable metric object (parsed is null)")
        continue
    # r13-era sidecars carry only {details, stdout_line}; derive per-query
    # mins from the runs arrays in that case — over NON-NEGATIVE runs
    # only, mirroring bench_gate.effective_round (ADVICE r19 low #1)
    qmins = side.get("queries") or {
        q: min([r for r in d.get("runs", []) if r >= 0], default=-1.0)
        for q, d in side["details"].items()}
    mins = [v for v in qmins.values() if v >= 0]
    if len(qmins) != metric.get("queries_selected"):
        err(f"{name}: queries_selected={metric.get('queries_selected')} but "
            f"sidecar has {len(qmins)} queries")
    if abs(sum(mins) - metric["value"]) > 0.05:
        err(f"{name}: total {metric['value']:.2f} != sidecar sum of mins "
            f"{sum(mins):.2f}")

# ---- 3. BASELINE.md gate-table rows match their artifacts -------------
ROW = re.compile(
    r"^\|\s*sf[\d.]+\s*\|[^|]*\|\s*([\d.,]+)\s*\|\s*([\d,]+)\s*k\s*\|\s*"
    r"`(BENCH_[A-Za-z0-9_]+\.json)`\s*\|")
with open(os.path.join(ROOT, "BASELINE.md")) as f:
    for lineno, line in enumerate(f, 1):
        m = ROW.match(line.strip())
        if not m:
            continue
        total_s, rps_k, artifact = m.groups()
        if artifact not in summaries:
            err(f"BASELINE.md:{lineno} cites {artifact}, which is missing "
                f"or unparseable")
            continue
        summ = summaries[artifact]
        metric = summ if "value" in summ else summ.get("parsed")
        if metric is None:
            err(f"BASELINE.md:{lineno} cites {artifact}, whose parsed "
                f"metric is null")
            continue
        want_total = float(total_s.replace(",", ""))
        if abs(metric["value"] - want_total) > 0.051:
            err(f"BASELINE.md:{lineno}: table says {want_total} s but "
                f"{artifact} records {metric['value']:.2f} s")
        want_rps = int(rps_k.replace(",", "")) * 1000
        if abs(metric.get("pipeline_rps", -1) - want_rps) > 1000:
            err(f"BASELINE.md:{lineno}: table says {want_rps} rps but "
                f"{artifact} records {metric.get('pipeline_rps')}")

# ---- 4. targeted quiet-window artifacts are self-consistent -----------
targeted = {}
for path in sorted(glob.glob(os.path.join(ROOT, "bench_targeted_*.json"))):
    name = os.path.basename(path)
    if name.startswith("bench_targeted_details_"):
        load(path)  # provenance sidecar must at least parse
        continue
    d = load(path)
    if d is None:
        continue
    targeted[name] = d
    if not d.get("query_filter"):
        err(f"{name}: query_filter is null — not a targeted run")
        continue
    # guarded like the section-2 summaries: a malformed targeted JSON is a
    # counted err(), not a traceback (ADVICE r16)
    total = d.get("value")
    if not isinstance(total, (int, float)):
        err(f"{name}: no numeric 'value' field")
        continue
    vals = d.get("queries", {}).values()
    if not all(isinstance(v, (int, float)) for v in vals):
        err(f"{name}: non-numeric per-query entry in 'queries'")
        continue
    mins = [v for v in vals if v >= 0]
    if abs(sum(mins) - total) > 0.05:
        err(f"{name}: total {total:.2f} != sum of per-query mins "
            f"{sum(mins):.2f}")

# ---- 5. BASELINE.md "superseded" footnotes match their artifacts ------
SUP = re.compile(
    r"^>\s*superseded:\s*(\S+)\s+(sf[\d.]+)\s+([\d.]+)\s*s\b.*"
    r"`(bench_targeted_[A-Za-z0-9_.]+\.json)`")
with open(os.path.join(ROOT, "BASELINE.md")) as f:
    for lineno, line in enumerate(f, 1):
        m = SUP.match(line.strip())
        if not m:
            continue
        q, scale, sec_s, artifact = m.groups()
        if artifact not in targeted:
            err(f"BASELINE.md:{lineno} supersedes via {artifact}, which is "
                f"missing or unparseable")
            continue
        qs = targeted[artifact].get("queries", {})
        if q not in qs:
            err(f"BASELINE.md:{lineno}: {artifact} has no query {q}")
        elif abs(qs[q] - float(sec_s)) > 0.005:
            err(f"BASELINE.md:{lineno}: footnote says {sec_s} s but "
                f"{artifact} records {qs[q]:.4f} s for {q}")

# ---- 6. spec-count claims match the committed sbt-test record ---------
spec_path = os.path.join(ROOT, "SPECCOUNT.txt")
if os.path.exists(spec_path):
    with open(spec_path) as f:
        first = f.readline().strip()
    try:
        want_specs = int(first)
    except ValueError:
        want_specs = None
        err(f"SPECCOUNT.txt first line is not an integer: {first!r}")
    if want_specs is not None:
        claim = re.compile(r"(\d+)\s+ScalaTest specs")
        for doc in ("README.md", "BASELINE.md"):
            # BASELINE.md keeps older rounds' sections verbatim as history
            # (their spec counts were correct THEN); only the section
            # headed "(current)" makes a claim about HEAD.
            in_scope = doc != "BASELINE.md"
            with open(os.path.join(ROOT, doc)) as f:
                for lineno, line in enumerate(f, 1):
                    if doc == "BASELINE.md" and HEADING.match(line):
                        in_scope = "(current)" in line
                    if not in_scope:
                        continue
                    for m in claim.finditer(line):
                        if int(m.group(1)) != want_specs:
                            err(f"{doc}:{lineno} claims {m.group(1)} "
                                f"ScalaTest specs; SPECCOUNT.txt records "
                                f"{want_specs}")
else:
    err("SPECCOUNT.txt missing — regenerate it from `sbt test` output "
        "(Tests: succeeded N)")

# ---- 7. "> steal:" footnotes match their sidecars, and the current ----
# ----    round's qualifying rows all carry one (VERDICT r16 ask #2) ----
# STEAL_PCT_GATE / min_run_steal come from the shared bench_gate module
# (ADVICE r17 low #4); the Scala literal is the one remaining copy:
_scala_gate = scala_steal_gate(ROOT)
if _scala_gate is None:
    err("Bench.scala StealPctGate declaration not found — bench_gate."
        "scala_steal_gate cannot verify the cross-language constant")
elif _scala_gate != STEAL_PCT_GATE:
    err(f"STEAL_PCT_GATE drift: bench_gate.py says {STEAL_PCT_GATE} but "
        f"Bench.scala declares {_scala_gate}")


def current_round():
    """Round number claimed by BASELINE.md's '(current)' section header."""
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        for line in f:
            m = re.match(r"#+\s*Round\s+(\d+)\s*\(current\)", line)
            if m:
                return int(m.group(1))
    return None


CUR = current_round()
if CUR is None:
    err("BASELINE.md has no '### Round N (current)' header")

# current-section lines (same scoping rule as the spec-count check)
cur_lines = []
with open(os.path.join(ROOT, "BASELINE.md")) as f:
    in_scope = False
    for line in f:
        if HEADING.match(line):
            in_scope = "(current)" in line
            continue
        if in_scope:
            cur_lines.append(line.strip())

STEAL = re.compile(
    r"^>\s*steal:\s*(\S+)\s+(sf[\d.]+)\s+committed min under\s+([\d.]+)%\s+"
    r"hypervisor steal \(gate\s+([\d.]+)%\)\s+—\s+`([A-Za-z0-9_.]+\.json)`")
stated = set()  # (query, scale) pairs footnoted in the current section
stated_none = any(l.startswith("> steal: no gate row") for l in cur_lines)
for lineno_line in cur_lines:
    m = STEAL.match(lineno_line)
    if not m:
        continue
    q, scale, pct_s, gate_s, artifact = m.groups()
    stated.add((q, scale))
    path = os.path.join(ROOT, artifact)
    if not os.path.exists(path):
        err(f"steal footnote for {q} {scale} cites missing {artifact}")
        continue
    side = load(path)
    if side is None:
        continue
    detail = side.get("details", {}).get(q)
    if detail is None:
        err(f"steal footnote: {artifact} has no details for {q}")
        continue
    got = min_run_steal(detail)
    if got is None:
        err(f"steal footnote: {artifact} records no usable steal for {q}")
    elif abs(got - float(pct_s)) > 0.051:
        err(f"steal footnote says {pct_s}% for {q} {scale} but {artifact} "
            f"records {got:.2f}%")

# completeness for the current round: recompute the qualifying set from
# the committed sidecars (effective mins: targeted overrides first)
if CUR is not None:
    tag2scale = {"local": "sf0.1", "sf1": "sf1", "sf2": "sf2",
                 "sf5": "sf5", "sf10": "sf10"}
    expect = {}
    for tag, scale in tag2scale.items():
        side = sidecars.get(f"bench_details_r{CUR}_{tag}.json")
        if side is None:
            continue
        overridden = set()
        tname = f"bench_targeted_r{CUR}_{tag}.json"
        tdet_path = os.path.join(
            ROOT, f"bench_targeted_details_r{CUR}_{tag}.json")
        if tname in targeted and os.path.exists(tdet_path):
            tside = load(tdet_path) or {}
            # only entries the targeted SUMMARY's queries map actually
            # overrides: the sidecar also carries an incidental
            # pipeline_rps provenance row, but the gate table's rps
            # column cites the full-suite artifact, so that row must not
            # demand a footnote the generator (rightly) never emits
            t_queries = targeted[tname].get("queries", {})
            for q, d in tside.get("details", {}).items():
                # mirror gen_bench_table's v >= 0 guard exactly: a FAILED
                # targeted rerun (-1 summary value) does not override the
                # gate row there, so it must not claim the override here
                # either — or the checker demands a footnote the generator
                # can never emit (the ADVICE r17 deadlock class)
                v = t_queries.get(q)
                if not isinstance(v, (int, float)) or v < 0:
                    continue
                overridden.add(q)
                s = min_run_steal(d)
                if s is not None and s > STEAL_PCT_GATE:
                    expect[(q, scale)] = s
        for q, d in side.get("details", {}).items():
            if q in overridden:
                continue
            s = min_run_steal(d)
            if s is not None and s > STEAL_PCT_GATE:
                expect[(q, scale)] = s
    missing_notes = sorted(set(expect) - stated)
    for q, scale in missing_notes:
        err(f"{q} {scale}: committed min ran under "
            f"{expect[(q, scale)]:.1f}% steal but BASELINE.md's current "
            f"section has no steal footnote for it")
    if not expect and not stated and not stated_none and \
            any(f"bench_details_r{CUR}_{t}.json" in sidecars
                for t in tag2scale):
        err("current round has bench sidecars but BASELINE.md carries "
            "neither a steal footnote nor the no-row-qualified note")

quiet_forced = 0   # LOADAVG_QUIET-rule firings (set in section 10)
heavy = []         # the standing heavy-row set (set in section 11)
heavy_done = 0     # how many of them carry a quiet targeted repricing

# ---- 10. anchored cross-round ratchet (round 19, VERDICT r18 #2/#5) ----
# Recompute the anchored flags and computed watch-list from the committed
# sidecars via the SAME bench_gate.anchored_rows the generator prints from,
# then require: every flagged row carries its "> anchored:" footnote with
# matching numbers (and none is stale), every watch row likewise, and any
# flagged row whose committed min ran above the LOADAVG_QUIET own-load
# allowance was repriced through the bench_targeted quiet mechanism — the
# rule that closes the load-blind gap (q142's r17/r18 sf5 mins at loadavg
# 14.9/19.8 passed the steal gate while 1.66x inflated).
if CUR is not None:
    arows = anchored_rows(ROOT, f"r{CUR}")
    expect_anch = {(q, s): (cur, best, src, ratio, la, targeted)
                   for s, q, cur, best, src, ratio, la, targeted in arows
                   if ratio > ANCHOR_GATE}
    expect_watch = {(q, s): (cur, best, src, ratio)
                    for s, q, cur, best, src, ratio, _, _ in arows
                    if ratio <= ANCHOR_GATE}
    ANCH = re.compile(
        r"^>\s*anchored:\s*(\S+)\s+(sf[\d.]+)\s+([\d.]+)\s*s\s+vs best\s+"
        r"([\d.]+)\s*s\s+\((r\d+)\)\s*=\s*([\d.]+)x")
    WATCHLN = re.compile(
        r"^>\s*watch:\s*(\S+)\s+(sf[\d.]+)\s+([\d.]+)x of best\s+"
        r"([\d.]+)\s*s\s+\((r\d+)\)")
    stated_anch, stated_watch = {}, {}
    anch_none = any(line.startswith("> anchored: no sf1/sf5 gate row")
                    for line in cur_lines)
    for line in cur_lines:
        m = ANCH.match(line)
        if m:
            stated_anch[(m.group(1), m.group(2))] = (
                float(m.group(3)), float(m.group(4)), m.group(5),
                float(m.group(6)))
        m = WATCHLN.match(line)
        if m:
            stated_watch[(m.group(1), m.group(2))] = (
                float(m.group(3)), float(m.group(4)), m.group(5))
    for q, s in sorted(set(expect_anch) - set(stated_anch)):
        err(f"{q} {s}: {expect_anch[(q, s)][3]:.2f}x over its anchored best "
            f"but BASELINE.md's current section has no anchored footnote")
    for q, s in sorted(set(stated_anch) - set(expect_anch)):
        err(f"anchored footnote for {q} {s} does not match any recomputed "
            f">={ANCHOR_GATE:g}x row — stale or hand-typed")
    for key in sorted(set(stated_anch) & set(expect_anch)):
        cur_v, best_v, src, ratio = stated_anch[key]
        e_cur, e_best, e_src, e_ratio, _, _ = expect_anch[key]
        if (abs(cur_v - e_cur) > 0.006 or abs(best_v - e_best) > 0.006
                or src != e_src or abs(ratio - e_ratio) > 0.011):
            err(f"anchored footnote for {key[0]} {key[1]} says "
                f"{cur_v}/{best_v} s ({src}) {ratio}x but sidecars recompute "
                f"{e_cur:.2f}/{e_best:.2f} s ({e_src}) {e_ratio:.2f}x")
    for q, s in sorted(set(expect_watch) - set(stated_watch)):
        err(f"{q} {s}: {expect_watch[(q, s)][3]:.2f}x over its anchored "
            f"best (watch band) but BASELINE.md has no computed watch line")
    for q, s in sorted(set(stated_watch) - set(expect_watch)):
        err(f"watch line for {q} {s} does not match any recomputed "
            f"watch-band row — stale or hand-typed")
    for key in sorted(set(stated_watch) & set(expect_watch)):
        ratio, best_v, src = stated_watch[key]
        e_cur, e_best, e_src, e_ratio = expect_watch[key]
        if (abs(best_v - e_best) > 0.006 or src != e_src
                or abs(ratio - e_ratio) > 0.011):
            err(f"watch line for {key[0]} {key[1]} says {ratio}x of "
                f"{best_v} s ({src}) but sidecars recompute {e_ratio:.2f}x "
                f"of {e_best:.2f} s ({e_src})")
    for (q, s), (_, _, _, ratio, la, was_targeted) in sorted(
            expect_anch.items()):
        if was_targeted:
            continue
        if la is None:
            # a flagged row with no loadavg instrument is UNRESOLVED, not
            # exempt — silently passing it was fail-open on exactly the
            # load-blind gap the rule closes (ADVICE r19 low #2)
            err(f"{q} {s}: anchored-flagged at {ratio:.2f}x with its "
                f"committed min's loadavg UNKNOWN (load-blind window) — "
                f"record a bench_targeted_r{CUR}_{TAG_BY_SCALE[s]}.json "
                f"quiet repricing before closing the round")
        elif la > LOADAVG_QUIET:
            err(f"{q} {s}: anchored-flagged at {ratio:.2f}x with its "
                f"committed min measured at loadavg {la:.1f} > the "
                f"{LOADAVG_QUIET:g} quiet allowance — record a "
                f"bench_targeted_r{CUR}_{TAG_BY_SCALE[s]}.json quiet "
                f"repricing before closing the round")
    # LOADAVG_QUIET-rule coverage (VERDICT r19 ask #7): count the rows
    # the rule fired on this round — flagged in the RAW (pre-override)
    # view with a loud-or-unknown min-run loadavg, i.e. each demanded a
    # quiet repricing (done = the override exists; not done = an error
    # above). Reported on the OK line so a round where the rule fired
    # zero times reads differently from one where it was bypassed.
    raw_rows = anchored_rows(ROOT, f"r{CUR}", apply_targeted=False)
    quiet_forced = sum(
        1 for _, _, _, _, _, ratio, la, _ in raw_rows
        if ratio > ANCHOR_GATE and (la is None or la > LOADAVG_QUIET))
    if (not arows and not stated_anch and not stated_watch and not anch_none
            and any(f"bench_details_r{CUR}_{TAG_BY_SCALE[s]}.json" in sidecars
                    for s in ANCHOR_SCALES)):
        err("current round has anchor-scale sidecars but BASELINE.md "
            "carries neither an anchored/watch footnote nor the "
            "no-row-exceeded note")

# ---- 11. the generated sf1-gate line and the standing heavy-row rule ---
# (round 20, VERDICT r19 asks #2/#5.) The "> gate:" summary sentence in
# BASELINE.md's current section must byte-match bench_gate.gate_line over
# the recomputed sf1_gate result — two rounds running, the only factual
# errors in this repo were hand-typed prose numbers (r18's finding #1,
# r19's q76 "0.51 s"). And the top-HEAVY_TOP_N sf1 rows by RAW committed
# min must each carry a QUIET bench_targeted repricing, so the anchored
# ratchet's history for heavy rows records quiet prices instead of
# drifting upward on the suite's own load.
if CUR is not None:
    prev_tag = f"r{CUR - 1}"
    g = sf1_gate(ROOT, f"r{CUR}", prev_tag)
    stated_gate = [l for l in cur_lines if l.startswith("> gate:")]
    if g is not None:
        want_line = gate_line(g)
        if not stated_gate:
            err(f"current round has sf1 sidecars for r{CUR} and "
                f"{prev_tag} but BASELINE.md's current section carries "
                f"no generated '> gate:' line — paste gen_bench_table's "
                f"output verbatim")
        else:
            for line in stated_gate:
                if line != want_line:
                    err(f"'> gate:' line does not match the recomputed "
                        f"sentence.\n  stated:   {line}\n  computed: "
                        f"{want_line}")
    elif stated_gate:
        err(f"BASELINE.md's current section has a '> gate:' line but the "
            f"r{CUR}/{prev_tag} sf1 sidecars cannot reproduce it")
    heavy = heavy_rows(ROOT, f"r{CUR}")
    if heavy:
        tname = f"bench_targeted_r{CUR}_sf1.json"
        t_q = targeted.get(tname, {}).get("queries", {})
        tdet_p = os.path.join(ROOT, f"bench_targeted_details_r{CUR}_sf1.json")
        tdet = (load(tdet_p) or {}).get("details", {}) \
            if os.path.exists(tdet_p) else {}
        for q in heavy:
            v = t_q.get(q)
            if not isinstance(v, (int, float)) or v < 0:
                err(f"{q}: in the top-{HEAVY_TOP_N} sf1 rows by committed "
                    f"time but has no quiet repricing in {tname} — the "
                    f"standing heavy-row rule (VERDICT r19 #3/#5) requires "
                    f"one before closing the round")
                continue
            la = min_run_loadavg(tdet.get(q, {}))
            if la is not None and la > LOADAVG_QUIET:
                err(f"{q}: heavy-row repricing in {tname} ran at loadavg "
                    f"{la:.1f} > the {LOADAVG_QUIET:g} quiet allowance — "
                    f"not a quiet price; re-run the targeted batch")
                continue
            heavy_done += 1
        HEAVYLN = re.compile(r"^>\s*heavy:.*:\s*(.+)$")
        stated_heavy = None
        for line in cur_lines:
            m = HEAVYLN.match(line)
            if m:
                stated_heavy = [q.strip() for q in m.group(1).split(",")]
        if stated_heavy is None:
            err(f"current round has an sf1 sidecar but BASELINE.md's "
                f"current section has no '> heavy:' footnote listing the "
                f"top-{HEAVY_TOP_N} standing-repricing rows")
        elif sorted(stated_heavy) != sorted(heavy):
            err(f"'> heavy:' footnote lists {stated_heavy} but the sidecar "
                f"recomputes {heavy}")

# ---- 8. the sf1 oracle gate is file-backed at HEAD's code --------------
if CUR is not None:
    gate_path = os.path.join(ROOT, f"ORACLE_SF1_r{CUR}.json")
    if not os.path.exists(gate_path):
        err(f"ORACLE_SF1_r{CUR}.json missing — run tools/check_oracle_sf1.py "
            f"(it writes the artifact) before closing the round")
    else:
        g = load(gate_path)
        if g is not None:
            if g.get("dirty"):
                err(f"ORACLE_SF1_r{CUR}.json was generated from a dirty "
                    f"tree — re-run on committed code")
            qs = g.get("queries", {})
            # round 18 format: one "pass" boolean per query (check_oracle's
            # compare gates on rows+schema+hash jointly; the r17 artifact's
            # three booleans were three copies of that single bit and
            # overstated the granularity — ADVICE r17 low #3). Pre-r18
            # artifacts with the triple format stay readable.
            def green(r):
                if "pass" in r:
                    return bool(r["pass"])
                return bool(r.get("rows") and r.get("schema") and r.get("hash"))
            bad = [q for q, r in qs.items() if not green(r)]
            if bad:
                err(f"ORACLE_SF1_r{CUR}.json: not green for {bad}")
            if not qs:
                err(f"ORACLE_SF1_r{CUR}.json records no queries")
            # 9. enforcement-tool drift surface (VERDICT r17 ask #5): the
            # artifact pins the sha256 of every checker/generator; any
            # post-artifact edit to one — committed or not — invalidates
            # the artifact until the sweep is re-run.
            tool_sha = g.get("tool_sha256")
            if tool_sha is None:
                if CUR >= 18:  # the manifest exists from round 18 on
                    err(f"ORACLE_SF1_r{CUR}.json records no tool_sha256 "
                        f"manifest — regenerate with tools/check_oracle_sf1.py")
            else:
                for rel in TOOL_HASH_FILES:
                    want = tool_sha.get(rel)
                    if want is None:
                        err(f"ORACLE_SF1_r{CUR}.json tool_sha256 missing "
                            f"entry for {rel}")
                        continue
                    try:
                        with open(os.path.join(ROOT, rel), "rb") as fh:
                            got = hashlib.sha256(fh.read()).hexdigest()
                    except OSError as e:
                        err(f"tool_sha256: cannot hash {rel}: {e}")
                        continue
                    if got != want:
                        err(f"{rel} changed since ORACLE_SF1_r{CUR}.json "
                            f"was generated (sha256 {got[:12]} != recorded "
                            f"{want[:12]}) — re-run the sf1 sweep")
                for rel in sorted(set(tool_sha) - set(TOOL_HASH_FILES)):
                    err(f"ORACLE_SF1_r{CUR}.json tool_sha256 lists {rel}, "
                        f"which this checker does not enforce — sync "
                        f"TOOL_HASH_FILES in both tools")
            sha = g.get("head_sha", "")
            if not sha:
                err(f"ORACLE_SF1_r{CUR}.json records no head_sha")
            else:
                # stale iff the oracle-relevant code changed since the gate
                # ran: any src/main or oracle-tool diff sha..HEAD forces a
                # re-run (doc/artifact commits after the gate are fine)
                try:
                    d = subprocess.run(
                        ["git", "diff", "--name-only", sha, "HEAD", "--",
                         "src/main", "tools/check_oracle.py",
                         "tools/check_oracle_sf1.py"],
                        cwd=ROOT, capture_output=True, text=True, timeout=30)
                    if d.returncode != 0:
                        err(f"ORACLE_SF1_r{CUR}.json head_sha {sha[:12]} not "
                            f"resolvable in this repo: {d.stderr.strip()}")
                    elif d.stdout.strip():
                        err(f"ORACLE_SF1_r{CUR}.json is STALE: src/main or "
                            f"oracle tools changed since {sha[:12]}: "
                            f"{d.stdout.split()}")
                except Exception as e:  # noqa: BLE001
                    err(f"ORACLE_SF1_r{CUR}.json SHA check failed: {e}")

if errors:
    print(f"\n{len(errors)} artifact-consistency error(s)")
    sys.exit(1)
print(f"OK: {len(summaries)} summaries, {len(sidecars)} sidecars, "
      f"{len(targeted)} targeted, gate table + footnotes + steal notes + "
      f"gate line + sf1 oracle artifact + spec count consistent; "
      f"loadavg-quiet rule fired on {quiet_forced} row(s); heavy-row rule "
      f"{heavy_done}/{len(heavy)} quiet-repriced")

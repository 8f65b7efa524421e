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
     `sbt test` output each round).

Run it before every end-of-round commit:  python3 tools/check_artifacts.py
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
errors = []


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
    # mins from the runs arrays in that case
    qmins = side.get("queries") or {
        q: min(d["runs"]) for q, d in side["details"].items()}
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
    mins = [v for v in d.get("queries", {}).values() if v >= 0]
    if abs(sum(mins) - d["value"]) > 0.05:
        err(f"{name}: total {d['value']:.2f} != sum of per-query mins "
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
                    if doc == "BASELINE.md" and line.startswith("#"):
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

if errors:
    print(f"\n{len(errors)} artifact-consistency error(s)")
    sys.exit(1)
print(f"OK: {len(summaries)} summaries, {len(sidecars)} sidecars, "
      f"{len(targeted)} targeted, gate table + footnotes + spec count "
      f"consistent")

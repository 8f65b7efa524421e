#!/usr/bin/env python3
"""Evidence-chain guard (round 15, VERDICT r14 ask #5).

Fails (exit 1) if the committed bench evidence is internally inconsistent:

  1. any BENCH_*.json or bench_details_*.json at the repo root is empty
     or unparseable;
  2. any BENCH summary disagrees with its details sidecar (total != sum of
     per-query mins, or query counts differ);
  3. any BASELINE.md gate-table row that cites an existing BENCH artifact
     disagrees with that artifact (total sec to 0.1, pipeline_rps to 1k).

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

if errors:
    print(f"\n{len(errors)} artifact-consistency error(s)")
    sys.exit(1)
print(f"OK: {len(summaries)} summaries, {len(sidecars)} sidecars, "
      f"gate table consistent")

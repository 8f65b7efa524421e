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
import os
import re

# a sample window is "high-steal" above this %: the hypervisor took enough
# of the window that the measurement is suspect regardless of run
# agreement (= Bench.StealPctGate, asserted by check_artifacts.py)
STEAL_PCT_GATE = 3.0


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

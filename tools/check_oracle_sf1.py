#!/usr/bin/env python3
"""Standing sf1 oracle-parity gate (round 16, VERDICT r15 ask #8).

Round 15 ran a 51-query sweep at sf1 (10x the driver's oracle scale) by
hand; this pins it as ONE command so oracle-adjacent changes in future
rounds cannot skip it:

    python3 tools/check_oracle_sf1.py            # full pinned sweep
    python3 tools/check_oracle_sf1.py q150_stupid_backoff_cms ...  # subset

It runs `graft.Verify` over the PINNED query list against benchdata/sf1
(the ScaleData-derived 10x corpus with real duplication density), then the
check_oracle.py DuckDB replica, and exits non-zero unless every pinned
query is rows+schema+hash green.

The pin covers: every query round 15/16 touched, the dedup family, the
heavy LLM kernels, and a relational sample. Three oracles are EXCLUDED as
replica-capacity-bound at sf1 (documented in BASELINE.md, each hash-green
at sf0.001/0.01/0.1): q116/q117's embedding-LSH transitive closures OOM
DuckDB and q123's closure exhausts spill disk — recursive-SQL oracle
limits, not engine divergence.
"""
import os
import subprocess
import sys

PINNED = [
    # relational sample
    "q1_pricing_summary", "q3_top_revenue", "q9_top_customers_by_nation",
    "q13_topk_lineitems", "q21_math_funcs",
    # round-touched (r15: q31/q95/q98/q100/q104/q142; r16: q95/q98/q100/
    # q124/q150 + the q131 kernel refactor)
    "q31_zlib_roundtrip", "q95_mixture_rebalance", "q98_vocab_stats",
    "q100_mixture_apply", "q104_training_order", "q124_vocab_coverage",
    "q142_chunk_scrub",
    # dedup family
    "q40_exact_dedup", "q42_lsh_neardup", "q87_dedup_cc",
    "q103_quality_keep", "q125_cluster_size_histogram",
    "q133_containment_dedup", "q138_chunk_dedup",
    # heavy LLM kernels
    "q111_bigram_lm_score", "q112_bigram_lm_cms", "q113_decontaminate_bloom",
    "q114_dsir_select", "q115_boilerplate_scrub",
    "q131_stupid_backoff", "q150_stupid_backoff_cms",
    "q132_heavy_hitters", "q134_dup_pagerank", "q136_dup_triangles",
    "q137_bpe_merges", "q141_bpe_encode",
    "q139_minhash_calibration", "q140_jl_projection", "q143_lang_consistency",
]

EXCLUDED = {
    "q116_semdedup_resolve": "recursive-closure oracle OOMs DuckDB at sf1",
    "q117_semdedup_keep_best": "recursive-closure oracle OOMs DuckDB at sf1",
    "q123_kmeans_semdedup": "closure oracle exhausts spill disk at sf1",
}

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "benchdata", "sf1")
OUT = "/tmp/verify_sf1_gate"


def main() -> int:
    queries = sys.argv[1:] or PINNED
    bad = [q for q in queries if q in EXCLUDED]
    if bad:
        print(f"refusing excluded queries (replica-capacity-bound): {bad}")
        return 2
    if not os.path.isdir(SF1):
        print(f"FAIL: {SF1} missing — run graft.ScaleData first")
        return 1
    print(f"[sf1-gate] Verify over {len(queries)} pinned queries ...")
    r = subprocess.run(
        ["sbt", "-batch",
         "runMain graft.Verify " + SF1 + " " + OUT + " " + " ".join(queries)],
        cwd=ROOT, env={**os.environ, "SPARK_GRAFT_CPUS":
                       os.environ.get("SPARK_GRAFT_CPUS", "32")},
        capture_output=True, text=True, timeout=3600)
    fails = [ln for ln in r.stderr.splitlines() + r.stdout.splitlines()
             if "[verify]" in ln]
    for ln in fails:
        print(ln)
    if r.returncode != 0:
        print(f"FAIL: Verify exited {r.returncode}")
        return 1
    print("[sf1-gate] DuckDB replica compare ...")
    r2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "check_oracle.py"),
         SF1, OUT], capture_output=True, text=True, timeout=5400)
    passed = set()
    for ln in r2.stdout.splitlines():
        if ln.startswith("PASS "):
            passed.add(ln.split()[1])
        elif ln.startswith("FAIL ") and \
                ln.split()[1].rstrip(":") in queries:
            print(ln)
    missing = [q for q in queries if q not in passed]
    if missing:
        print(f"\nFAIL: {len(missing)} pinned queries not green at sf1: "
              f"{missing}")
        return 1
    print(f"OK: {len(queries)} pinned queries rows+schema+hash green at sf1")
    return 0


if __name__ == "__main__":
    sys.exit(main())

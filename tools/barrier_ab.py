"""Reliable-barrier overhead A/B (r13 verdict item 5).

Reliable mode (SPARK_GRAFT_BARRIER=reliable) swaps the funnel/iterative
operators' lineage barriers from localCheckpoint to reliable
checkpoint files — the fault-tolerant posture a 1000-executor run
would use (a lost executor replays from the checkpoint instead of
recomputing the whole lineage). Correctness at that mode has
whole-registry evidence (r13 certify: 251/0/47); this tool prices it:
each query runs in BOTH modes in separate subprocesses (barrier mode
is read per session), same box back-to-back, and the table goes to
SCALING.md so the 100 TB fault-tolerance cost is a number, not a mode.

Usage: python tools/barrier_ab.py [sf_dir] [query ...] [--reps N]
       (default /tmp/rds_scale_x10 and the funnel family + the
        heaviest barrier users)

Publish rows taken with --reps >= 2: each (query, mode) pair is a
fresh subprocess, and this host swings single readings up to ~4× —
with one rep per side, an overhead column can be pure noise (the r14
t3 first-pair reading of 1.65× was external load; its idle pair read
0.64×). --reps N reports the MIN of N subprocess runs per side, the
bench.py protocol.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_QUERIES = [
    # funnel family (barrier() at every funnel stage)
    "pipe1_corpus_curation",
    "pipe2_export_manifest",
    "pipe3_span_excision",
    "pipe4_gated_funnel",
    "pipe5_clean_export",
    # heaviest remaining barrier users (sweep-tail ranks)
    "t3_reduction_sweep",
    "dd12_incremental_dedup",
    "dd13_two_tier_dedup",
    "x1_mda_importance",
    "dsir1_importance_resample",
]

# parameters arrive via argv (r14 ADVICE: the old str.format template
# would break the day someone adds a literal brace to the child code)
CHILD = r"""
import sys, time
repo, sf_dir, name = sys.argv[1:4]
sys.path.insert(0, repo)
import __spark_entry__ as e
from reduction_dask_spark.session import get_spark
from reduction_dask_spark.caching import release_pinned

spark = get_spark("barrier_ab")
qs = e.queries()
qs["m1_spearman_by_era"](spark, sf_dir).collect()  # warm-up
t0 = time.perf_counter()
qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
print("ELAPSED", time.perf_counter() - t0, flush=True)
release_pinned()
spark.stop()
"""


def run_one(name: str, sf_dir: str, mode: str) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_BARRIER"] = mode
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, str(REPO), sf_dir, name],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("ELAPSED "):
            return float(ln.split()[1])
    raise RuntimeError(f"{name} [{mode}] produced no timing:\n{r.stderr[-2000:]}")


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 1
    if "--reps" in argv:
        i = argv.index("--reps")
        try:
            reps = max(1, int(argv[i + 1]))
        except (IndexError, ValueError):
            raise SystemExit("usage: --reps N  (N = positive integer)")
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/tmp/rds_scale_x10"
    queries = argv[1:] or DEFAULT_QUERIES

    rows = []
    for name in queries:
        t_def = min(run_one(name, sf_dir, "local") for _ in range(reps))
        t_rel = min(run_one(name, sf_dir, "reliable") for _ in range(reps))
        rows.append((name, t_def, t_rel))
        print(f"{name:32s} default {t_def:7.2f}s  reliable {t_rel:7.2f}s "
              f"({t_rel / t_def:.2f}x)", flush=True)

    print()
    print("| query | default | reliable | overhead |")
    print("|---|---|---|---|")
    for name, a, b in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}× |")


if __name__ == "__main__":
    main()

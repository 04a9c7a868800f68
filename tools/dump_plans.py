"""Dump .explain("formatted") for bench queries to plans/$PLANS_ROUND/
(default r17).

Usage: python tools/dump_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' — file becomes
          plans/<round>/<name>_<suffix>.txt
  names : default = the full bench set (HEADLINE + bench-tagged extras)

The optimization judge reads these files to check plan claims (guide
§1: capture Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython nodes) — they are the before/after evidence for every
query the round touches.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Full-plan visibility: barrier() normally truncates lineage at the
# funnel hubs (the executed plan shows LogicalRDD leaves there), which
# would hide the interior Exchanges/joins/PushedFilters these dumps
# exist to evidence. noop mode returns the DataFrame unchanged — the
# dump shows the COMPLETE logical composition and never executes it
# (same choice as tools/plan_audit.py, for the same reason).
os.environ.setdefault("SPARK_GRAFT_BARRIER", "noop")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as e
    from bench import HEADLINE
    from reduction_dask_spark.registry import REGISTRY
    from reduction_dask_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = e.queries()
    if not names:
        names = [n for n in HEADLINE if n in qs]
        names += [n for n, s in REGISTRY.items() if "bench" in s.tags and n not in names]

    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r17")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"

    from reduction_dask_spark.caching import release_pinned

    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {len(plan)} chars", flush=True)
        release_pinned()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

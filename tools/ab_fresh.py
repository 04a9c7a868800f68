"""Fresh-session A/B of specific registered queries between two
checkouts (e.g. current HEAD vs a git-worktree of a prior round).

Each invocation is ONE fresh python/Spark session measuring the named
queries with bench.py's protocol (noop-sink materialization, N reps,
min reported — the work is deterministic, so min is the least-noise
plan-cost estimate). Run it once per checkout and diff the lines:

  python tools/ab_fresh.py /root/repo dd12_incremental_dedup ss1b_cosine_topk_blas
  python tools/ab_fresh.py /tmp/r11_checkout dd12_incremental_dedup ss1b_cosine_topk_blas

The repo path goes FIRST on sys.path so the named checkout's package
is the one imported (r12 verdict item 3: confirm whether bench movers
are noise or a code interaction — same box, same protocol, back to
back)."""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    repo = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: ab_fresh.py REPO_PATH QUERY [QUERY ...]")
    sys.path.insert(0, repo)
    # Executors must resolve the SAME checkout: sys.path only affects
    # the driver, while pyspark.daemon workers build their own path
    # from PYTHONPATH + cwd — so module-level functions pickled BY
    # REFERENCE into UDFs would otherwise import from whatever
    # checkout the tool was launched from. (Closures are pickled by
    # value and JVM-expression queries ship no Python at all, so the
    # r13 A/B conclusions were unaffected — but pin it anyway.)
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    from reduction_dask_spark.caching import release_pinned
    from reduction_dask_spark.registry import REGISTRY, load_all_operators
    from reduction_dask_spark.session import get_spark

    load_all_operators()
    spark = get_spark("ab_fresh")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    # warm-up: session + file listing, like bench.py
    spark.read.parquet(f"{sf}/region.parquet").count()

    print(f"checkout={repo} sf={sf} reps={reps} load={os.getloadavg()[0]:.2f}")
    for name in names:
        fn = REGISTRY[name].fn
        times = []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            release_pinned()
            spark.catalog.clearCache()
        ts = sorted(times)
        print(
            f"{name} min={ts[0]:.2f} med={ts[len(ts) // 2]:.2f} "
            f"all={[round(t, 2) for t in times]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

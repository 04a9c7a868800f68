"""Phase profile of x1c_mda_importance_gbt (r17, verdict item 4).

x1c has been flat at ~4.4 s for two rounds; before touching it, split
the wall-clock into its phases (guide §1: measure first):

  1. barrier build      — kfold_era(supervised_frame) localCheckpoint
  2. feature_bounds     — one melt + groupBy + toPandas
  3. GBT fit            — GBT_ROUNDS × (mapInPandas hist + tiny groupBy
                          + toPandas + driver stump fit), timed per round
  4. scoring            — applyInPandas MDA block + mda_table windows
                          (timed as the remaining noop-sink run)

Usage: python tools/profile_x1c.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from reduction_dask_spark.caching import barrier, release_pinned
    from reduction_dask_spark.ml import (
        ERA_DOMAIN,
        feature_bounds,
        fit_gbt_fold_models,
        supervised_frame,
    )
    from reduction_dask_spark.operators.cv import kfold_era
    from reduction_dask_spark.operators.importance import (
        K_FOLDS,
        SEED,
        _mda_gbt_mapper,
        mda_table,
    )
    from reduction_dask_spark.session import get_spark

    spark = get_spark("profile_x1c")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm session

    for rep in range(reps):
        t0 = time.perf_counter()
        df = barrier(
            kfold_era(supervised_frame(spark, sf_dir), "era", k=K_FOLDS, eras=list(ERA_DOMAIN))
        )
        t1 = time.perf_counter()

        # --- inline fit_gbt_fold_models with per-round timing
        from reduction_dask_spark.ml import (
            DIM,
            GBT_BINS,
            GBT_LR,
            GBT_ROUNDS,
            _best_stump_with_bin,
            _gbt_bins_expr,
            _gbt_hist_mapper_arrow,
        )
        from pyspark.sql import functions as F

        tb0 = time.perf_counter()
        mn, mx = feature_bounds(df, DIM)
        tb1 = time.perf_counter()
        fit_in = df.select(
            F.col("fold").cast("int").alias("fold"),
            F.col("y").cast("double").alias("y"),
            _gbt_bins_expr(mn, mx, GBT_BINS).alias("bins"),
        )
        models: dict[int, list] = {m: [] for m in range(K_FOLDS)}
        bin_models: dict[int, list] = {m: [] for m in range(K_FOLDS)}
        collect_partials = fit_in.rdd.getNumPartitions() <= 256
        round_times = []
        for _ in range(GBT_ROUNDS):
            r0 = time.perf_counter()
            rows = fit_in.mapInArrow(
                _gbt_hist_mapper_arrow(bin_models, GBT_BINS, DIM),
                schema="fold int, feature int, bin int, sr double, cnt double",
            )
            if not collect_partials:
                rows = rows.groupBy("fold", "feature", "bin").agg(
                    F.sum("sr").alias("sr"), F.sum("cnt").alias("cnt")
                )
            pdf = rows.toPandas()
            r1 = time.perf_counter()
            for m in models:
                sub = pdf[pdf["fold"] == m]
                hist = np.zeros((DIM, GBT_BINS))
                counts = np.zeros((DIM, GBT_BINS))
                np.add.at(hist, (sub["feature"].to_numpy(), sub["bin"].to_numpy()), sub["sr"].to_numpy())
                np.add.at(counts, (sub["feature"].to_numpy(), sub["bin"].to_numpy()), sub["cnt"].to_numpy())
                f, b, thr, vl, vr = _best_stump_with_bin(hist, counts, mn, mx, GBT_LR)
                models[m].append((f, thr, vl, vr))
                bin_models[m].append((f, b, vl, vr))
            r2 = time.perf_counter()
            round_times.append((r1 - r0, r2 - r1))
        t2 = time.perf_counter()

        preds = df.groupBy("fold", "era").applyInPandas(
            _mda_gbt_mapper(models, SEED),
            schema="feature int, fold int, era int, vec_id long, y double, pred double",
        )
        out = mda_table(preds)
        out.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()

        print(f"rep {rep}: total={t3 - t0:.2f}s")
        print(f"  barrier build : {t1 - t0:.2f}s")
        print(f"  feature_bounds: {tb1 - tb0:.2f}s")
        print(f"  fit {GBT_ROUNDS} rounds : {t2 - tb1:.2f}s "
              f"(spark+toPandas {sum(a for a, _ in round_times):.2f}s, "
              f"driver fit {sum(b for _, b in round_times):.2f}s; "
              f"per-round {[round(a, 2) for a, _ in round_times]})")
        print(f"  scoring+table : {t3 - t2:.2f}s", flush=True)
        release_pinned()
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()

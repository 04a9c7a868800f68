"""Z-order layout: Morton-code parity vs numpy, 2-D locality of curve
buckets, and the actual data-skipping payoff measured from parquet
footer min-max statistics (pyarrow) on a z-clustered vs x-sorted
write of the same table."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from reduction_dask_spark.operators.layout import (
    event_zkey_cols,
    zorder_write,
)

from .conftest import SF_MED


def _np_morton(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    def spread(v):
        v = v.astype(np.uint64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return (spread(x) | (spread(y) << np.uint64(1))).astype(np.int64)


@pytest.fixture(scope="module")
def zkeys(spark):
    d = spark.read.parquet(f"{SF_MED}/events.parquet")
    return event_zkey_cols(d).toPandas()


def test_morton_parity_with_numpy(zkeys):
    z = _np_morton(zkeys.x16.to_numpy(), zkeys.y16.to_numpy())
    assert (z == zkeys.z.to_numpy()).all()


def test_zorder_buckets_bound_both_dims(zkeys):
    """Each top-6-bit curve bucket confines BOTH dimensions to a
    quarter of their global range (an x-sort would leave y unbounded:
    normalized y-extent ~1 per bucket)."""
    df = zkeys
    gx = df.x16.max() - df.x16.min() or 1
    gy = df.y16.max() - df.y16.min() or 1
    by = df.groupby(df.z.to_numpy() >> 26)
    ext_x = ((by.x16.max() - by.x16.min()) / gx).mean()
    ext_y = ((by.y16.max() - by.y16.min()) / gy).mean()
    assert ext_x <= 0.26 and ext_y <= 0.26


def _files_touched(path: str, x_rng, y_rng) -> tuple[int, int]:
    """(files whose footer min-max overlaps the rectangle, total)."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        stats = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in ("x16", "y16") and col.statistics is not None:
                    lo, hi = stats.get(name, (np.inf, -np.inf))
                    stats[name] = (
                        min(lo, col.statistics.min),
                        max(hi, col.statistics.max),
                    )
        if (
            stats["x16"][0] <= x_rng[1]
            and stats["x16"][1] >= x_rng[0]
            and stats["y16"][0] <= y_rng[1]
            and stats["y16"][1] >= y_rng[0]
        ):
            hit += 1
    return hit, len(files)


def test_zorder_write_skips_files_on_2d_predicate(spark, tmp_path):
    d = spark.read.parquet(f"{SF_MED}/events.parquet")
    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    zorder_write(d, zpath, n_files=16)
    (
        event_zkey_cols(d)
        .repartitionByRange(16, "x16")
        .sortWithinPartitions("x16")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    # rectangle selective in BOTH dims: mid-range x slice × low-y slice
    # (dims are min-max scaled to [0, 65535] by event_zkey_cols)
    x_rng, y_rng = (16384, 32767), (0, 4095)
    z_hit, z_tot = _files_touched(zpath, x_rng, y_rng)
    assert z_tot >= 8
    # z-layout skips most files on a 2-D rectangle
    assert z_hit <= z_tot // 2
    # the 1-D sort's blind spot: a y-only predicate skips nothing
    # there, while the z-layout still prunes
    zy_hit, _ = _files_touched(zpath, (0, 65535), y_rng)
    xy_hit, x_tot = _files_touched(xpath, (0, 65535), y_rng)
    assert zy_hit < xy_hit == x_tot
    # and the clustered read returns exactly the right rows
    got = (
        spark.read.parquet(zpath)
        .filter(
            (F.col("x16").between(*x_rng)) & (F.col("y16").between(*y_rng))
        )
        .count()
    )
    want = (
        event_zkey_cols(d)
        .filter((F.col("x16").between(*x_rng)) & (F.col("y16").between(*y_rng)))
        .count()
    )
    assert got == want > 0


def test_stride_permute_invariants():
    """--nodup control permutation (tools/scale_probe): token multiset
    preserved exactly (quality/token statistics invariant), replica 0
    is the identity, and replicas produce distinct strings for
    realistically-sized docs (cross-replica exact/shingle dups die)."""
    from collections import Counter

    from tools.scale_probe import _stride_permute

    text = " ".join(f"w{i % 37}" for i in range(150))
    assert _stride_permute(text, 0) == text
    seen = set()
    for rep in range(1, 100):
        p = _stride_permute(text, rep)
        assert Counter(p.split(" ")) == Counter(text.split(" "))
        seen.add(p)
    # seeded position permutation: every rep distinct
    assert len(seen) == 99
    # degenerate docs pass through unchanged rather than erroring
    assert _stride_permute("one two", 7) == "one two"
    assert _stride_permute("", 7) == ""

"""The driver's testdata has shipped timestamps two ways across
generations — parquet TIMESTAMP(NANOS) (surfaced as nanosecond longs
under the legacy conf) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
(TIMESTAMP_NTZ under default NTZ inference). Round 2's only two
correctness failures were this flip; these tests pin that load_table
normalizes BOTH flavors to the same UTC-instant TIMESTAMP."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from reduction_dask_spark.sources import load_table

_US = [1704067200_000000, 1704070800_500000]  # 2024-01-01T00/01h UTC


def _write_events(tmpdir: str, unit: str) -> str:
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [u * (1000 if unit == "ns" else 1) for u in _US],
                pa.timestamp(unit),
            ),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, os.path.join(tmpdir, "events.parquet"),
                   version="2.6", coerce_timestamps=None)
    return tmpdir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_both_parquet_timestamp_flavors(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.us for r in df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()]
    assert got == _US  # naive wall time interpreted as UTC instant, µs-exact


def test_streaming_schema_tracks_file_flavor(spark, tmp_path):
    from reduction_dask_spark.streaming import read_event_stream

    sf_dir = _write_events(str(tmp_path), "us")
    stream = read_event_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"

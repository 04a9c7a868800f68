"""Sources: loaders for the test star schema + generic readers.

Reference mapping (SURVEY.md §2.1): the reference's only source is a
headered CSV read with inferred dtypes (S1, nb cell 4) plus CSV/pickle
round-trips of intermediates (S2/S3). Here the primary format is
parquet (columnar, predicate pushdown, column pruning); CSV/JSON
readers are provided for parity.

Scale note: loaders return *lazy* DataFrames — no driver
materialization. At 100 TB these reads are partition-parallel scans
whose filters/projections Catalyst pushes into the parquet footers.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp columns whose parquet physical type has varied across
# testdata generations: TIMESTAMP(NANOS) (read as nanosecond longs via
# session.NANOS_CONF) or TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (read as TIMESTAMP_NTZ when a foreign session has NTZ inference on).
# Both are normalized here to plain UTC-instant TIMESTAMP — the same
# epoch interpretation DuckDB applies — so every downstream operator
# sees one stable dtype.
_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def normalize_ts(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Normalize a timestamp column to UTC-instant TIMESTAMP regardless
    of which physical flavor the parquet reader surfaced."""
    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            # integer division: ts/1000 via `/` is DOUBLE and loses
            # sub-µs precision at 2024-epoch nano magnitudes (1.7e18
            # exceeds the 53-bit mantissa)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dt == "timestamp_ntz":
            # session tz is pinned to UTC (ensure_engine_confs), so the
            # cast treats the naive wall time as a UTC instant —
            # matching DuckDB's epoch_us on the same file
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``sf_dir`` as a lazy DataFrame."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_ts(df, _TS_COLS.get(name, ()))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread_scan(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Input-parallelism guard for heavy per-row expression work over
    a scan (r16; guide §2.5's unsplittable-input remedy): when the
    scan yields FEWER partitions than the cluster's parallelism — a
    small single-row-group parquet file cannot split, so tens of
    cores sit idle while one task pays all the per-row compute, and
    every broadcast-join consumer downstream inherits that single
    partition — hash-repartition on ``key`` so per-row work uses
    every core. Decision is derived from the actual scan layout, not
    a constant: at 100 TB the scan has far more splits than cores and
    this returns ``df`` unchanged (zero added exchanges). The
    repartition is by a deterministic key, never round-robin
    (SPARK-38388 retry hazard + sort-before-repartition cost), and
    uses an explicit partition count so AQE cannot coalesce the tiny
    exchange back down to one partition (which would undo the spread
    exactly where it matters). Branches sharing the returned
    DataFrame reuse ONE exchange (ReusedExchange), so the cost at
    small scale is a single KB-size shuffle.

    Requirements and costs (r16 ADVICE): ``key`` must exist in ``df``
    (validated here so a bad caller fails at call site, not at use)
    and must be HIGH-CARDINALITY — the spread hashes it into
    ``defaultParallelism`` partitions, so a low-cardinality key would
    leave most of them empty. Probing the partition count goes
    through ``df.rdd`` (one driver-side DataFrame→RDD plan
    conversion per call — cheap for scan-rooted inputs, which is the
    only place this guard belongs; do not wrap deep plans in it)."""
    if key not in df.columns:
        raise ValueError(
            f"spread_scan key {key!r} not in DataFrame columns {df.columns}"
        )
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))


@functools.lru_cache(maxsize=256)
def parquet_row_count(sf_dir: str, name: str) -> int:
    """Table row count from parquet FOOTER metadata — zero Spark jobs
    (r15, r14 verdict item 6: dsir1's pin-vs-recompute gate used to run
    an eager ``d.count()`` inside the timed region on every
    invocation). Footers carry exact row counts, so this is the same
    number a count() job would return for an unfiltered scan; cached
    per (sf_dir, table) because the testdata is immutable within a
    session. Handles both single-file and directory-of-parts layouts,
    skipping hidden/_temporary entries the way Spark's reader does
    (a crashed write's _temporary parts must not inflate the count).
    LOCAL paths only — raises for URIs Spark could read but pyarrow's
    local Path can't (hdfs://, s3a://); callers gating an optimization
    should catch and fall back to a count() job."""
    from pathlib import Path

    import pyarrow.parquet as pq

    path = Path(sf_dir) / f"{name}.parquet"
    if path.is_dir():
        parts = [
            p
            for p in sorted(path.rglob("*.parquet"))
            # Spark's hiddenFileFilter: any path component starting
            # with '_' or '.' is invisible to the reader
            if not any(
                seg.startswith(("_", "."))
                for seg in p.relative_to(path).parts
            )
        ]
        return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    return pq.ParquetFile(path).metadata.num_rows


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """S1: headered CSV scan (nb cell 4). Explicit schema preferred;
    inferSchema kept for parity with the reference's ``pd.read_csv``."""
    reader = spark.read.option("header", header)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_append(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S2: append sink (results-log pattern, nb cells 22/54/67/...)."""
    df.write.mode("append").format(fmt).save(path)


def write_overwrite(df: DataFrame, path: str, fmt: str = "parquet", partition_by: tuple[str, ...] = ()) -> None:
    """S3: intermediate-result round-trip (CSV/pickle caches in the
    reference, nb cells 27-28) — parquet here, optionally partitioned."""
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def compact_files(
    spark: SparkSession,
    path: str,
    target_records_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction — the maintenance pass every long-lived
    100 TB table needs: streaming/append sinks accrete thousands of
    KB-sized files, and scan cost becomes dominated by file-open and
    footer-read overhead rather than bytes. Rewrites the table into
    ceil(rows / target_records_per_file) files via one range-free
    repartition (coalesce can't grow file counts and skews when
    shrinking hard) + maxRecordsPerFile as the hard cap. Returns the
    new file count. Write is to a temp dir then swapped in, so a
    failed compaction never corrupts the table (the poor man's
    transactional rewrite; table formats do this with metadata)."""
    import math
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_records_per_file))
    tmp = tempfile.mkdtemp(prefix="rds_compact_")
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .parquet(tmp)
    )
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files

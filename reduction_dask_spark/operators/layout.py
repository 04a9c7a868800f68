"""Physical-layout operators: Z-order (Morton-curve) clustering for
multi-dimensional data skipping.

The reference never thinks about storage layout (its whole dataset is
one in-memory pandas frame, nb cell 4); at 100 TB the dominant cost of
every selective query is the scan, and the lever is file/row-group
skipping on min-max statistics. A sort on one column gives perfect
skipping on that column and none on any other; interleaving the bits
of two (or more) quantized key columns into a single Morton code and
range-partition-sorting on it bounds EVERY keyed dimension's min-max
extent per file — the technique behind Delta's OPTIMIZE ZORDER BY and
query engines' space-filling-curve clustering.

Everything here is pure JVM-side integer bit arithmetic (shiftleft /
bitwiseAND / bitwiseOR — whole-stage-codegen'd, no UDF), and the same
unrolled spread-bits ladder is emitted as ANSI SQL for the DuckDB
oracle, so the curve itself is value-hash-checked end to end.

Scale design: computing z is a per-row map (no shuffle); clustering =
``repartitionByRange(z)`` (one range shuffle, the same cost as any
global sort) + ``sortWithinPartitions``; the skipping payoff is
measured in tests/test_layout.py with real parquet footer min-max
stats via pyarrow — the z-ordered layout touches a fraction of the
files an x-sorted layout touches for a 2-D rectangle predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources import load_table

# spread-bits ladder masks: 16 data bits -> even bit positions of 32
_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

Z_BUCKET_SHIFT = 26  # top 6 bits of the 32-bit code -> 64 buckets


def spread16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit
    word (the classic Morton 'part1by1' ladder, unrolled)."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _MASKS:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(mask))
    return c


def zvalue(x16: Column, y16: Column) -> Column:
    """32-bit Morton code: x on even bits, y on odd bits."""
    return spread16(x16).bitwiseOR(F.shiftleft(spread16(y16), 1))


def event_zkey_cols(d: DataFrame) -> DataFrame:
    """events + quantized (x16, y16) dims and their Morton code z.

    Both dims are min-max scaled onto the FULL 16-bit domain before
    interleaving — without this the curve degenerates: a dim whose
    data range covers only the low bits (user_id spans 0..1.5k here)
    contributes nothing to the code's high bits and the 'curve' is
    just a sort on the other dim. The extent scan is a 1-row agg
    broadcast into a per-row map (no data shuffle)."""
    stats = d.agg(
        F.min("user_id").alias("xmin"),
        F.max("user_id").alias("xmax"),
        F.min("value").alias("ymin"),
        F.max("value").alias("ymax"),
    )
    x16 = F.least(
        F.floor(
            (F.col("user_id") - F.col("xmin"))
            * 65535.0
            / F.greatest(F.col("xmax") - F.col("xmin"), F.lit(1))
        ),
        F.lit(65535),
    )
    y16 = F.least(
        F.floor(
            (F.col("value") - F.col("ymin"))
            * 65535.0
            / F.greatest(F.col("ymax") - F.col("ymin"), F.lit(1e-9))
        ),
        F.lit(65535),
    )
    return (
        d.crossJoin(F.broadcast(stats))
        .select("event_id", x16.alias("x16"), y16.alias("y16"))
        .withColumn("z", zvalue(F.col("x16"), F.col("y16")))
    )


def zorder_write(d: DataFrame, path: str, n_files: int) -> None:
    """Cluster by Morton code and write: one range shuffle + local
    sort, producing files whose min-max footer stats are tight in
    BOTH dimensions (maxRecordsPerFile keeps one file per partition)."""
    (
        event_zkey_cols(d)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _spread_sql_steps(col0: str, out: str) -> list[str]:
    """The same ladder as :func:`spread16`, one SQL expression per
    rung (CTE steps avoid the 2^5 textual blow-up of inlining)."""
    steps = [f"({col0} & 65535) AS {out}0"]
    prev = f"{out}0"
    for i, (sh, mask) in enumerate(_MASKS, start=1):
        steps.append(f"(({prev} | ({prev} << {sh})) & {mask}) AS {out}{i}")
        prev = f"{out}{i}"
    return steps


def _zcurve_sql() -> str:
    xs = _spread_sql_steps("x16", "xs")
    ys = _spread_sql_steps("y16", "ys")
    ladder = ""
    for i in range(len(xs)):
        ladder += f", s{i} AS (SELECT event_id, x16, y16, {xs[i]}, {ys[i]} FROM {'zq' if i == 0 else f's{i-1}'})\n"
    return f"""
    WITH st AS (
        SELECT min(user_id) AS xmin, max(user_id) AS xmax,
               min(value) AS ymin, max(value) AS ymax
        FROM events
    ),
    zq AS (
        SELECT event_id,
               least(CAST(floor((user_id - xmin) * 65535.0
                                / greatest(xmax - xmin, 1)) AS BIGINT),
                     65535) AS x16,
               least(CAST(floor((value - ymin) * 65535.0
                                / greatest(ymax - ymin, 1e-9)) AS BIGINT),
                     65535) AS y16
        FROM events, st
    ){ladder},
    zfin AS (
        SELECT event_id, x16, y16, (xs4 | (ys4 << 1)) AS z FROM s4
    )
    SELECT (z >> {Z_BUCKET_SHIFT}) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           min(x16) AS x_min, max(x16) AS x_max,
           min(y16) AS y_min, max(y16) AS y_max,
           min(z) AS z_min, max(z) AS z_max
    FROM zfin GROUP BY 1
    """


@query(
    "zo1_zorder_curve",
    oracle=_zcurve_sql(),
    doc="zo1 Morton/Z-order curve: interleave quantized (user_id, "
        "value) into a 32-bit code with a codegen'd spread-bits "
        "ladder (no UDF), then summarize each curve bucket's 2-D "
        "min-max envelope — the per-file footer stats a z-clustered "
        "write would produce, value-hash-checked against the "
        "identical integer ladder in DuckDB. Clustered write path: "
        "layout.zorder_write (repartitionByRange(z) + local sort); "
        "skipping payoff measured with real parquet footers in "
        "tests/test_layout.py.",
    tags=("layout",),
)
def zo1_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "events")
    return (
        event_zkey_cols(d)
        .groupBy(F.shiftright("z", Z_BUCKET_SHIFT).alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("x16").alias("x_min"),
            F.max("x16").alias("x_max"),
            F.min("y16").alias("y_min"),
            F.max("y16").alias("y_max"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
    )

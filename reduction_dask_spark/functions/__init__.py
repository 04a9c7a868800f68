"""Portable expression helpers: each helper has a Spark Column form and
an SQL-text form that evaluates *identically* in Spark SQL and DuckDB.

Why: the driver's correctness gate compares a Spark result against a
DuckDB oracle by value hash. Engine-native `rand()`, `hash()`,
`sample()` and approximate aggregates differ across engines (and, for
Spark's rand, across partitionings/retries — SURVEY.md §4 determinism
rule). All pseudo-randomness is therefore derived from:

- ``phash(key)``  — Knuth multiplicative hash on an integer key,
  pure int64 arithmetic. The key is reduced mod the target first
  (congruent, so values are identical), which keeps the product under
  2^63 for ANY int64 key — Spark 4's ANSI mode turns overflow into a
  runtime error, so this must hold at corpus-scale key ranges.
- ``md5i(expr)``  — first 8 hex chars of md5 of a string, as a bigint.
  Both engines implement RFC-1321 md5 → identical everywhere.

Float aggregates whose summation order is engine-dependent are rounded
(``round(x, n)``) in BOTH engines before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

KNUTH = 2654435761  # Knuth's multiplicative hash constant (2^32 * phi)


# ---------- portable integer hash (Spark Column / SQL text) ----------

def phash(col: Column | str, mod: int) -> Column:
    # (key % mod) * KNUTH % mod ≡ key * KNUTH % mod, but the product is
    # bounded by (mod-1)*KNUTH — overflow-free for mod < ~3.4e9 instead
    # of key < ~3.4e9 (ANSI mode makes int64 overflow a runtime error).
    assert mod < 3_400_000_000, "phash mod too large for overflow-free int64"
    c = F.col(col) if isinstance(col, str) else col
    return ((c % F.lit(mod)) * F.lit(KNUTH)) % F.lit(mod)


def phash_sql(expr: str, mod: int) -> str:
    return f"((({expr}) % {mod}) * {KNUTH}) % {mod}"


# ---------- portable string hash ----------

def md5i(col: Column | str) -> Column:
    """First 32 bits of md5(expr) as a non-negative bigint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def md5i_sql(expr: str) -> str:
    return f"(('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 8))::BIGINT)"


def md5h60(col: Column | str) -> Column:
    """First 60 bits of md5(expr) as a non-negative bigint — the
    portable content-key hash: wide enough that collisions are
    negligible at corpus scale, and identical in DuckDB (md5h60_sql),
    so even a collision would collide in BOTH engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5h60_sql(expr: str) -> str:
    return f"(('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 15))::BIGINT)"


# ---------- era derivation (the reference's time bucket) ----------
# Reference: era is a static int time bucket ("eras represent a unit of
# time", /root/reference/utils.py:18). Driver data carries real
# timestamps; the canonical mapping (FIXTURES.md §3) is a calendar
# bucket. events span one month → day-of-month; orders span years →
# year*12+month.

def era_events(ts: Column | str = "ts") -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.dayofmonth(c).cast("int")


ERA_EVENTS_SQL = "CAST(day(ts) AS INTEGER)"


def era_orders(ts: Column | str = "o_orderdate") -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(c) * 12 + F.month(c)).cast("int")


ERA_ORDERS_SQL = "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER)"


# ---------- synthetic prediction column ----------
# The reference scores (y_true, y_pred) pairs produced by a fitted
# model (metrics.py:34-42). For oracle-checked metric queries the
# "prediction" must be a deterministic portable expression: true value
# plus hash-noise (FIXTURES.md §3).

def pred_events(value: str = "value", key: str = "event_id") -> Column:
    return F.col(value) + phash(key, 1000) / F.lit(1000.0) - F.lit(0.5)


PRED_EVENTS_SQL = f"(value + {phash_sql('event_id', 1000)} / 1000.0 - 0.5)"


# ---------- misc ----------

def clip(col: Column, lo: float, hi: float) -> Column:
    """P10 / M4 clamp (utils.py:51-55)."""
    return F.least(F.lit(hi), F.greatest(F.lit(lo), col))


def corr_safe(x: Column | str, y: Column | str) -> Column:
    """Sample Pearson correlation that returns NULL on zero variance.

    Spark 4 runs ANSI mode by default and the built-in `corr` THROWS
    DIVIDE_BY_ZERO when either side is constant; covar/stddev with
    try_divide reproduces corr's value exactly and degrades to NULL
    (matching DuckDB's corr and the reference's np.corrcoef nan).
    """
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return F.try_divide(F.covar_samp(cx, cy), F.stddev_samp(cx) * F.stddev_samp(cy))

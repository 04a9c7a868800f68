"""Every registered oracle-checked query must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (it runs sf0.01; sf0.001 keeps the
suite fast — tools/compare.py covers sf0.01 pre-commit).
"""

from __future__ import annotations

import pytest

from tools.compare import compare

import __spark_entry__ as entrymod

from .conftest import SF_SMALL

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    errs = compare(name, sdf, ddf)
    assert not errs, f"{name}: {errs}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["spearman_era_corr"] is not None


def test_all_queries_run(spark):
    """Rows-only queries (no oracle) must at least execute."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name

"""Query/oracle registry backing the driver contract.

Every operator from SURVEY.md §2 that is implemented registers a
``QuerySpec`` here: a callable ``(spark, sf_dir) -> DataFrame`` plus,
when the semantics are ANSI-SQL-expressible, an equivalent DuckDB SQL
string run against the same parquet tables. ``__spark_entry__.py``
re-exports the registry as ``queries()`` / ``oracle_sql()``.

Design rule (FIXTURES.md §4): oracle-checked queries never rely on
engine-native randomness, engine hash functions, approximate
aggregates, or unstable float summation — pseudo-randomness comes from
portable arithmetic/md5 hashes and float aggregates are rounded in
BOTH engines so value hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering an operator query under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return wrap


def load_all_operators() -> None:
    """Import every operator module so its @query decorators run."""
    from . import operators, streaming  # noqa: F401

    operators.load_all()

"""Query registry plumbing shared by the declared-query submodules.

The driver contract (``__spark_entry__.py``) needs, per query name, a
Spark callable ``(spark, sf_dir) -> DataFrame`` and — where the
semantics are ANSI-SQL-expressible — an equivalent DuckDB SQL string
run against the same parquet tables. Registration happens at import
time via the :func:`query` decorator; ``__init__`` re-exports the
collected :data:`REGISTRY`.

Column-name discipline: the driver sorts result columns by NAME
before hashing, so every computed column is aliased identically in
the Spark plan and the oracle SQL. Floating-point aggregates are
rounded on BOTH sides (sum order differs between engines; rounding
makes the hash deterministic).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from trendengine_spark.tables import load_table


@dataclass(frozen=True)
class Query:
    """One declared query: Spark implementation + optional oracle SQL."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, sql: str | None, doc: str = ""):
    """Decorator: register ``fn`` as declared query ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:  # pragma: no cover - authoring guard
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table (parquet scan, SURVEY S1)."""
    return load_table(spark, sf_dir, name)

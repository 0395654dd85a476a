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

Output-type discipline (round-5 lesson): the driver canonicalizes
both engines' results through pandas, so every oracle SQL must
DESCRIBE to scalar, non-HUGEINT columns. DuckDB ``SUM(BIGINT)``
returns HUGEINT, which ``.df()`` converts to float64 (``"60012.0"``
vs Spark's ``"60012"`` → hash mismatch): wrap every integer SUM —
window sums included — in ``CAST(... AS BIGINT)``. List/struct/map
output columns crash the driver's ``sort_values`` canonicalizer
outright: explode vectors to one scalar row per element or
``concat_ws``-stringify them. ``tests/test_oracle_types.py``
DESCRIBE-sweeps every registered oracle SQL and fails the suite on
any offender; ``tools/check_oracle.py`` applies the same guard.
DECIMAL oracle outputs are tolerated (DuckDB ``.df()`` flattens them
to float64) but only safe when the SPARK side emits DOUBLE with the
same shortest-repr values — never return Decimal-typed columns from
the Spark side of an oracle-checked query.
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

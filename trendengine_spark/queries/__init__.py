"""Declared query registry — the driver-facing catalogue.

Every implemented operator from SURVEY.md §2 (and the §2.6 declared
relational closure plus the LLM-pipeline extensions) is declared here
as a named :class:`~trendengine_spark.queries.base.Query`: a Spark
callable ``(spark, sf_dir) -> DataFrame`` paired, where
SQL-expressible, with the equivalent ANSI SQL for the DuckDB oracle.

Submodules group the surface:

- :mod:`.timeseries`  — the reference's own operator spine (F*, A*, U*, D*)
  mapped onto the driver's ``events``/``lineitem`` tables.
- :mod:`.relational`  — SURVEY §2.6 closure: joins, windows, sort/top-k,
  set ops, grouped analytics, scalar functions, approx aggs.
- :mod:`.streaming_batch` — batch-equivalent window queries (tumbling /
  sliding / session) whose streaming twins live in
  :mod:`trendengine_spark.streaming`.
- :mod:`.llm` — training-data-pipeline operators: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search, text
  analysis, multimodal plumbing.
"""

from __future__ import annotations

from trendengine_spark.queries import (  # noqa: F401
    llm,
    relational,
    relational2,
    streaming_batch,
    timeseries,
)
from trendengine_spark.queries.base import REGISTRY, Query

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracle_sql"]


def all_queries():
    """name → (spark, sf_dir) -> DataFrame for every declared query."""
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracle_sql():
    """name → DuckDB SQL for every SQL-expressible declared query."""
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}

"""Driver-contract smoke: every declared query runs at sf0.001 and
returns a well-formed DataFrame; oracle keys align. (Full value-level
oracle comparison is tools/check_oracle.py — run separately.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from trendengine_spark.queries import REGISTRY, all_oracle_sql, all_queries


def test_registry_shape():
    qs, osql = all_queries(), all_oracle_sql()
    assert len(qs) >= 60
    assert set(osql) <= set(qs)
    # most of the surface must be oracle-checkable
    assert len(osql) >= 0.8 * len(qs) - 10


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_at_smoke_sf(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    cols = df.columns
    assert cols, name
    n = df.count()
    assert n >= 0


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema.fields

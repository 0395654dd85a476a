"""Authoring guard: every registered oracle SQL must produce only
scalar, non-HUGEINT output columns.

The driver's correctness harness canonicalizes DuckDB results through
pandas (``.df()``): HUGEINT columns silently become float64 and
hash-mismatch Spark's int64 (``"60012.0"`` vs ``"60012"``), and
list/struct/map columns crash its ``sort_values`` canonicalization
with ``TypeError: unhashable type``. Round 5 shipped four such
queries; this sweep fails the suite the moment a new one is declared.

Runs pure DuckDB (no Spark session) — ~1 s for the whole registry.
"""

import duckdb
import pytest

from trendengine_spark.queries import REGISTRY

from tools.check_oracle import describe_offenders

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _oracle_names():
    return sorted(n for n, q in REGISTRY.items() if q.sql is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_sql_emits_driver_safe_types(con, name):
    offenders = describe_offenders(con, REGISTRY[name].sql)
    assert not offenders, (
        f"{name}: oracle SQL emits driver-hostile output columns {offenders} — "
        "CAST integer sums to BIGINT and explode/stringify any array column "
        "(the driver's pandas canonicalizer turns HUGEINT into float64 and "
        "crashes on lists)"
    )

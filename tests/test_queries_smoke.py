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
    """The driver's only smoke path (VERDICT r2 item 8): entry() must
    produce non-empty rows with the flagship's pinned schema — a
    refactor that silently empties or reshapes it must fail here, not
    in the driver."""
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.columns == [
        "l_returnflag",
        "trend_type",
        "direction",
        "significance",
        "degree",
        "n_points",
        "slope_r",
    ]
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["n_points"] > 0 for r in rows)


def test_queries_and_oracle_sql_contract():
    """queries() names must cover every oracle_sql() name, and both
    dicts must be non-trivially populated (driver walks them)."""
    import __spark_entry__ as m

    qs, sqls = m.queries(), m.oracle_sql()
    assert len(qs) >= 90
    assert set(sqls) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in sqls.values())


def test_scale_oracle_matches_naive():
    """Every scale-capable DuckDB twin (queries/scale_oracle.py, used
    by the sf10 sweeps instead of the registry's naive cross-paradigm
    text) must stay ROW-IDENTICAL to its naive sibling at sf0.01 —
    the two texts may differ in plan class, never in semantics."""
    import duckdb

    from trendengine_spark.queries import REGISTRY
    from trendengine_spark.queries.scale_oracle import SCALE_ORACLE_SQL

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.01/{t}.parquet'"
        )
    assert SCALE_ORACLE_SQL, "scale twin registry unexpectedly empty"
    for name, sql in SCALE_ORACLE_SQL.items():
        naive = REGISTRY[name].sql
        assert naive is not None, name
        a = con.execute(
            f"SELECT * FROM ({naive}) ORDER BY ALL"
        ).fetchall()
        b = con.execute(
            f"SELECT * FROM ({sql}) ORDER BY ALL"
        ).fetchall()
        assert a == b, f"{name}: scale twin diverged from naive oracle"
